"""LPIPS perceptual metric (VGG16 backbone) in pure JAX.

The reference computes LPIPS only in its offline metric script via the
``lpips`` package with the VGG backbone (utils/compute_metrics.py:34-45),
feeding images rescaled to [-1, 1].  This is the same computation
TPU-natively: VGG16 conv features at relu1_2/relu2_2/relu3_3/relu4_3/
relu5_3, channel-unit-normalized, squared difference, 1x1 linear layers,
spatial mean, summed over stages (Zhang et al. 2018).

Pretrained weights cannot ship in this zero-egress image; load them from
an .npz produced by ``scripts/convert_lpips_weights.py`` (run anywhere
with torchvision+lpips installed).  Without a weights file, ``lpips_fn``
raises with instructions — PSNR/SSIM (viewfusion_tpu.ops.metrics) remain
the in-training metrics, matching the reference, which likewise never
uses LPIPS during training.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["load_lpips", "LPIPS_STAGES", "vgg16_features"]

# VGG16 conv layout: (#convs, channels) per stage; LPIPS taps the relu
# after the last conv of each stage.
_VGG_STAGES: List[Tuple[int, int]] = [
    (2, 64), (2, 128), (3, 256), (3, 512), (3, 512)
]
LPIPS_STAGES = len(_VGG_STAGES)

# ImageNet normalization applied by lpips.ScalingLayer to [-1,1] inputs.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def vgg16_features(params: Dict[str, np.ndarray],
                   x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (B, H, W, 3) in [-1, 1] -> list of 5 stage feature maps."""
    h = (x - _SHIFT) / _SCALE
    feats = []
    conv_idx = 0
    for stage, (n_convs, _ch) in enumerate(_VGG_STAGES):
        for _ in range(n_convs):
            w = params[f"conv{conv_idx}_w"]
            b = params[f"conv{conv_idx}_b"]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            h = jax.nn.relu(h)
            conv_idx += 1
        feats.append(h)
        if stage != len(_VGG_STAGES) - 1:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
    return feats


def load_lpips(weights_path: str = "~/.cache/viewfusion_tpu/lpips_vgg.npz"
               ) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Return lpips(x, y) -> (B,) distances; x/y NHWC in [-1, 1].

    ``weights_path`` must hold conv{i}_w/conv{i}_b (VGG16, HWIO) and
    lin{s}_w ((1,1,C,1) LPIPS linear heads) — see
    scripts/convert_lpips_weights.py.
    """
    weights_path = os.path.expanduser(weights_path)
    if not os.path.exists(weights_path):
        raise FileNotFoundError(
            f"LPIPS weights not found at {weights_path}. Generate them "
            "with scripts/convert_lpips_weights.py on a machine with "
            "torchvision+lpips, or pass weights_path explicitly. "
            "(PSNR/SSIM need no weights.)"
        )
    params = {k: jnp.asarray(v) for k, v in np.load(weights_path).items()}

    @jax.jit
    def lpips_fn(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        fx = vgg16_features(params, x)
        fy = vgg16_features(params, y)
        total = jnp.zeros((x.shape[0],), jnp.float32)
        for s, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a**2, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b**2, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            lin = params[f"lin{s}_w"]  # (1, 1, C, 1), non-negative
            d = jax.lax.conv_general_dilated(
                d, lin, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            total = total + jnp.mean(d, axis=(1, 2, 3))
        return total

    return lpips_fn
