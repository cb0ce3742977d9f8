"""ViewFusion-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
composable-diffusion novel view synthesis.

Re-implements the full capability surface of the ViewFusion reference
(arXiv 2402.02906): a DDPM whose denoiser is a shared UNet applied to an
arbitrary, unordered, pose-free set of conditioning views, with learned
per-pixel softmax weighting composing per-view noise predictions at every
denoising step.

Design is TPU-first, not a port:
  * static-shape masked ``(B, N_max)`` view layout instead of ragged
    concatenation (reference: model/view_fusion.py:244-287),
  * the reverse diffusion chain is one ``lax.scan`` inside jit
    (reference: Python loop at model/view_fusion.py:196-206),
  * data/view parallelism via ``jax.sharding`` mesh + XLA collectives
    (reference: torch DDP/NCCL, utils/dist.py),
  * Pallas TPU kernels for hot ops with XLA fallback on CPU.
"""

__version__ = "0.1.0"

from viewfusion_tpu.config import Config, load_config  # noqa: F401
