"""ViewFusion composable diffusion: training loss + reverse sampling.

Capability parity with the reference ``ViewFusion`` nn.Module
(model/view_fusion.py:12-300): WaveGrad-style continuous noise-level
training, per-view noise prediction through ONE shared UNet, learned
per-pixel softmax weighting composing the per-view predictions, full
T-step ancestral reverse sampling with intermediate frame capture, and
the no-weighting (mean) ablation.

TPU-native design (NOT a translation):
  * The reference flattens a ragged ``(B, N, ...) -> (sum(v_i), ...)``
    batch via per-sample slicing + ``repeat_interleave``
    (model/view_fusion.py:244-256) and re-pads with -inf for the softmax
    (model/view_fusion.py:269-287).  Ragged shapes cannot be jitted; we
    instead keep a static ``(B, N_max, ...)`` layout and compose with a
    boolean view mask: masked logits are -inf so masked views get exactly
    zero weight and zero gradient — bit-identical composition semantics
    (verified in tests/test_composition.py against a ragged numpy oracle).
  * The reverse chain is a single ``lax.scan`` over T timesteps inside
    jit (reference: Python tqdm loop, model/view_fusion.py:196-206), with
    intermediate frames written into preallocated scan-carry buffers
    instead of a T-long output stack.
  * RNG is explicit ``jax.random`` key threading.

All image tensors are NHWC (TPU-native layout): y_0 (B, H, W, 3),
y_cond (B, N_max, H, W, Cc), view_count (B,), angle (B,).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from viewfusion_tpu.config import Config
from viewfusion_tpu.models.unet import UNet
from viewfusion_tpu.ops.schedules import DiffusionSchedule

__all__ = ["ViewFusion", "GenerateOutput"]

Params = Any


class GenerateOutput(NamedTuple):
    """Reverse-sampling outputs, mirroring the reference 5-tuple
    (model/view_fusion.py:208-214)."""

    y_t: jnp.ndarray          # final sample (B, H, W, 3)
    ret_arr: jnp.ndarray      # (B, frames+1, H, W, 3) incl. initial noise
    logit_arr: Optional[jnp.ndarray]   # (B, frames, N, H, W, 3) or None
    weight_arr: Optional[jnp.ndarray]  # (B, frames, N, H, W, 3) or None
    generated_samples: jnp.ndarray     # == ret_arr[:, -1]


def view_mask(view_count: jnp.ndarray, n_max: int) -> jnp.ndarray:
    """(B,) counts -> (B, N_max) boolean validity mask."""
    return jnp.arange(n_max)[None, :] < view_count[:, None]


def _pack_barrier() -> bool:
    """Trace-time knob: materialize the packed UNet input behind an
    optimization barrier (see the packed branch of _denoise_views)."""
    import os

    return os.environ.get("VF_PACK_BARRIER", "0") == "1"


def _chain_bf16() -> bool:
    """Trace-time knob: cast the UNet's image inputs (y_cond + noisy
    target) to the model compute dtype BEFORE the per-view gather/concat
    instead of at the first conv.  The UNet sees bit-identical values
    (flax casts its op inputs to ``dtype`` anyway); what changes is the
    HBM traffic of the gather/broadcast/concat feeding it — at bf16 it
    is half the bytes, which matters inside a T-step sampling scan that
    re-reads y_cond every step.  Posterior arithmetic (y_0_hat, mean,
    clamp) stays float32: bf16 cancellation there is exactly the
    SSIM=-2.11 failure mode root-caused in round 5 (ops/metrics.py).
    Off by default until the on-chip A/B (scripts/chain_ledger.py /
    ab_step_env.py --knob VF_CHAIN_BF16); read at trace time — set
    before process start."""
    import os

    return os.environ.get("VF_CHAIN_BF16", "0") == "1"


@dataclass(frozen=True)
class ViewFusion:
    """Functional ViewFusion model.

    Construct with :meth:`from_config`; all methods are pure and take
    ``params`` explicitly so they compose with jit/grad/shard_map.
    """

    denoise_fn: Any  # UNet or DiT flax module (same call contract)
    schedule: DiffusionSchedule
    weighting_train: bool = True
    weighting_inference: bool = True

    @classmethod
    def from_config(cls, cfg: Config, dtype=None) -> "ViewFusion":
        import jax.numpy as _jnp

        if dtype is None:
            dtype = getattr(_jnp, cfg.train.compute_dtype)
        # denoiser registry (reference factory: experiment.py:91-95)
        if cfg.denoise_net == "unet":
            unet = UNet(config=cfg.denoiser, dtype=dtype,
                        remat=cfg.train.remat)
        elif cfg.denoise_net == "dit":
            from viewfusion_tpu.models.dit import DiT

            unet = DiT(config=cfg.denoiser, dtype=dtype,
                       remat=cfg.train.remat)
        else:
            raise ValueError(
                "Provided denoising function is not supported!"
            )
        # The reference installs the *train* schedule unconditionally,
        # even for eval/inference (experiment.py:102).
        sched = DiffusionSchedule.create(
            cfg.diffusion.phases[cfg.diffusion.active_phase]
        )
        return cls(
            denoise_fn=unet,
            schedule=sched,
            weighting_train=cfg.diffusion.weighting_train,
            weighting_inference=cfg.diffusion.weighting_inference,
        )

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------
    def init(self, rng: jax.Array, y_cond: jnp.ndarray,
             y_0: jnp.ndarray) -> Params:
        """Initialize UNet params from example (single-sample ok) data."""
        b, n, h, w, cc = y_cond.shape
        x = jnp.concatenate(
            [y_cond[:, 0], y_0], axis=-1
        )  # (B, H, W, Cc+3)
        angle = jnp.zeros((b,), jnp.float32)
        level = jnp.ones((b,), jnp.float32)
        return self.denoise_fn.init(rng, x, angle, level)

    # ------------------------------------------------------------------
    # forward diffusion
    # ------------------------------------------------------------------
    def q_sample(self, y_0: jnp.ndarray, sample_gammas: jnp.ndarray,
                 noise: jnp.ndarray) -> jnp.ndarray:
        """sqrt(g)*y0 + sqrt(1-g)*eps (reference: model/view_fusion.py:162-164).
        ``sample_gammas`` broadcasts against y_0 ((B,1,1,1) or scalar)."""
        return (
            jnp.sqrt(sample_gammas) * y_0
            + jnp.sqrt(1.0 - sample_gammas) * noise
        )

    # ------------------------------------------------------------------
    # shared per-view denoise + composition
    # ------------------------------------------------------------------
    def _denoise_views(
        self,
        params: Params,
        y_cond: jnp.ndarray,      # (B, N, H, W, Cc)
        y_target: jnp.ndarray,    # (B, H, W, 3) noisy target
        noise_level: jnp.ndarray,  # (B,)
        angle: jnp.ndarray,        # (B,)
        deterministic: bool = True,
        rngs=None,
        packed_idx=None,           # optional (sample_idx, view_idx) (R,)
    ) -> jnp.ndarray:
        """Run the shared UNet on the view rows.

        Dense mode replaces the reference's ragged flatten +
        repeat_interleave (model/view_fusion.py:244-263) with a static
        reshape: the whole (B*N_max) batch feeds the MXU in one pass.
        Packed mode (``packed_idx`` given) gathers exactly the valid
        rows into a static (R, ...) buffer and scatters the outputs back
        to the dense layout — zero masked-row FLOPs.  Both return
        (B, N, H, W, out_ch); untouched packed slots are 0 and must be
        masked downstream (compose() does)."""
        b, n, h, w, cc = y_cond.shape
        angle = angle.reshape(-1)
        kwargs = {}
        if rngs is not None:
            kwargs["rngs"] = rngs

        if _chain_bf16():
            # cast before gather/concat: same values reach the first
            # conv (which casts to self.denoise_fn.dtype regardless),
            # half the bytes through the view-assembly ops
            net_dtype = getattr(self.denoise_fn, "dtype", None)
            if net_dtype is not None and net_dtype != jnp.float32:
                y_cond = y_cond.astype(net_dtype)
                y_target = y_target.astype(net_dtype)

        if packed_idx is not None:
            sample_idx, view_idx = packed_idx
            cond_rows = y_cond[sample_idx, view_idx]
            x = jnp.concatenate(
                [cond_rows, y_target[sample_idx]], axis=-1
            )
            if _pack_barrier():
                # Pin the packed input: without this, XLA duplicates the
                # y_target row-gather into ~13-16 consumer fusions of x
                # (RESIDUAL_r04.json: >=13.4 ms/step of identical
                # bf16[98,64,64,3] gather fusions, each 0.6-1.2 ms).
                # The barrier materializes x once; its linear transpose
                # keeps the vjp exact.  Measured on-chip
                # (PACK_BARRIER_AB_r05.json, fresh process per variant):
                # 1.0014x — within restart noise.  The duplicated gather
                # fusions are bandwidth the step was already paying
                # elsewhere; materializing x trades gather time for an
                # extra HBM round-trip of the same bytes.  Stays off by
                # default; set VF_PACK_BARRIER=1 BEFORE process start
                # (read at trace time) to re-measure on other topologies.
                x = jax.lax.optimization_barrier(x)
            out_rows = self.denoise_fn.apply(
                params, x, angle[sample_idx], noise_level[sample_idx],
                deterministic=deterministic, **kwargs,
            )
            oc = out_rows.shape[-1]
            dense = jnp.zeros((b * n, h, w, oc), out_rows.dtype)
            dense = dense.at[sample_idx * n + view_idx].set(out_rows)
            return dense.reshape(b, n, h, w, oc)

        y_rep = jnp.broadcast_to(y_target[:, None], (b, n, h, w, y_target.shape[-1]))
        x = jnp.concatenate([y_cond, y_rep], axis=-1).reshape(b * n, h, w, -1)
        level_rep = jnp.broadcast_to(noise_level[:, None], (b, n)).reshape(-1)
        angle_rep = jnp.broadcast_to(angle[:, None], (b, n)).reshape(-1)
        out = self.denoise_fn.apply(
            params, x, angle_rep, level_rep, deterministic=deterministic,
            **kwargs,
        )
        return out.reshape(b, n, h, w, -1)

    def compose(
        self,
        unet_out: jnp.ndarray,   # (B, N, H, W, out_ch)
        mask: jnp.ndarray,       # (B, N) bool
        weighting: bool,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
        """Compose per-view noise predictions into one estimate.

        Weighted path == reference -inf pad_sequence + softmax over the
        view axis + weighted sum (model/view_fusion.py:265-287); mean
        ablation == model/view_fusion.py:289-296.  Masked views receive
        exactly zero weight AND zero gradient.
        """
        noise_all = unet_out[..., :3]
        m = mask[:, :, None, None, None]
        if weighting:
            logits = unet_out[..., 3:].astype(jnp.float32)
            masked_logits = jnp.where(m, logits, -jnp.inf)
            zmax = jnp.max(masked_logits, axis=1, keepdims=True)
            unnorm = jnp.where(m, jnp.exp(masked_logits - zmax), 0.0)
            weights = unnorm / jnp.sum(unnorm, axis=1, keepdims=True)
            noise_hat = jnp.sum(noise_all * weights, axis=1)
            return noise_hat, logits, weights
        counts = jnp.sum(m, axis=1, dtype=jnp.float32)
        noise_hat = jnp.sum(jnp.where(m, noise_all, 0.0), axis=1) / counts
        return noise_hat, None, None

    # ------------------------------------------------------------------
    # training loss
    # ------------------------------------------------------------------
    def loss(
        self,
        params: Params,
        rng: jax.Array,
        y_0: jnp.ndarray,         # (B, H, W, 3)
        y_cond: jnp.ndarray,      # (B, N, H, W, Cc)
        view_count: jnp.ndarray,  # (B,) int
        angle: jnp.ndarray,       # (B,)
        noise: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        sample_gammas: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """MSE between true noise and composed prediction
        (reference: model/view_fusion.py:216-300).

        t ~ U{1..T-1}; gamma sampled uniformly in [gamma_{t-1}, gamma_t)
        per sample (WaveGrad continuous noise level,
        model/view_fusion.py:230-237).  ``sample_gammas`` (B,) overrides
        the t/u draws — used with ``noise`` by the training-dynamics
        parity harness (scripts/train_parity.py) to feed BOTH stacks
        identical randomness."""
        sched = self.schedule
        b = y_0.shape[0]
        k_t, k_u, k_noise, k_drop = jax.random.split(rng, 4)

        if sample_gammas is None:
            t = jax.random.randint(k_t, (b,), 1, sched.num_timesteps)
            gamma_t1 = jnp.take(sched.gammas, t - 1)
            gamma_t2 = jnp.take(sched.gammas, t)
            u = jax.random.uniform(k_u, (b,))
            sample_gammas = (gamma_t2 - gamma_t1) * u + gamma_t1  # (B,)

        if noise is None:
            noise = jax.random.normal(k_noise, y_0.shape, y_0.dtype)
        y_noisy = self.q_sample(
            y_0, sample_gammas[:, None, None, None], noise
        )

        unet_out = self._denoise_views(
            params, y_cond, y_noisy, sample_gammas, angle,
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": k_drop},
        )
        mask = view_mask(view_count, y_cond.shape[1])
        noise_hat, _, _ = self.compose(unet_out, mask, self.weighting_train)
        return jnp.mean((noise - noise_hat) ** 2)

    # ------------------------------------------------------------------
    # packed training loss (TPU extension — zero masked-row waste)
    # ------------------------------------------------------------------
    def loss_packed(
        self,
        params: Params,
        rng: jax.Array,
        y_0: jnp.ndarray,          # (B, H, W, 3)
        y_cond: jnp.ndarray,       # (B, N, H, W, Cc)
        view_count: jnp.ndarray,   # (B,)
        angle: jnp.ndarray,        # (B,)
        sample_idx: jnp.ndarray,   # (R,) packed row -> sample
        view_idx: jnp.ndarray,     # (R,) packed row -> view within sample
        noise: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Same objective as :meth:`loss` but the UNet runs on exactly the
        sum(view_count) valid rows, gathered into a static (R, ...) buffer
        and scattered back to the dense (B, N) layout for composition.

        The dense path (SURVEY.md §7 item 1) wastes (1 - mean(v)/N_max)
        of its UNet FLOPs on masked rows (~42% at max_views=6); packing
        removes that while keeping every shape static.  Identical math to
        :meth:`loss` given the same rng — verified in tests/test_packed.py.
        ``sample_idx``/``view_idx`` must enumerate exactly the valid
        (sample, view<view_count) pairs (host-side, see
        trainer._packed_indices); R is static because the per-batch
        view-count multiset is fixed (stratified sampling).
        """
        sched = self.schedule
        b, n = y_cond.shape[:2]
        k_t, k_u, k_noise, k_drop = jax.random.split(rng, 4)

        t = jax.random.randint(k_t, (b,), 1, sched.num_timesteps)
        gamma_t1 = jnp.take(sched.gammas, t - 1)
        gamma_t2 = jnp.take(sched.gammas, t)
        u = jax.random.uniform(k_u, (b,))
        sample_gammas = (gamma_t2 - gamma_t1) * u + gamma_t1

        if noise is None:
            noise = jax.random.normal(k_noise, y_0.shape, y_0.dtype)
        y_noisy = self.q_sample(
            y_0, sample_gammas[:, None, None, None], noise
        )

        dense = self._denoise_views(
            params, y_cond, y_noisy, sample_gammas, angle,
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": k_drop},
            packed_idx=(sample_idx, view_idx),
        )
        mask = view_mask(view_count, n)
        noise_hat, _, _ = self.compose(dense, mask, self.weighting_train)
        return jnp.mean((noise - noise_hat) ** 2)

    # ------------------------------------------------------------------
    # reverse sampling
    # ------------------------------------------------------------------
    def p_mean_variance(
        self,
        params: Params,
        y_t: jnp.ndarray,
        y_cond: jnp.ndarray,
        mask: jnp.ndarray,
        angle: jnp.ndarray,
        t: jnp.ndarray,  # scalar int32 timestep (shared across batch)
        packed_idx=None,
    ):
        """One denoising step's posterior mean/logvar
        (reference: model/view_fusion.py:86-160)."""
        sched = self.schedule
        b = y_t.shape[0]
        noise_level = jnp.full((b,), jnp.take(sched.gammas, t), jnp.float32)
        unet_out = self._denoise_views(params, y_cond, y_t, noise_level,
                                       angle, packed_idx=packed_idx)
        noise, logits, weights = self.compose(
            unet_out, mask, self.weighting_inference
        )
        y_0_hat = (
            jnp.take(sched.sqrt_recip_gammas, t) * y_t
            - jnp.take(sched.sqrt_recipm1_gammas, t) * noise
        )
        y_0_hat = jnp.clip(y_0_hat, -1.0, 1.0)  # model/view_fusion.py:154-155
        model_mean = (
            jnp.take(sched.posterior_mean_coef1, t) * y_0_hat
            + jnp.take(sched.posterior_mean_coef2, t) * y_t
        )
        return (model_mean, jnp.take(sched.posterior_log_variance_clipped, t),
                logits, weights)

    def p_sample(
        self,
        params: Params,
        rng: jax.Array,
        y_t: jnp.ndarray,
        y_cond: jnp.ndarray,
        mask: jnp.ndarray,
        angle: jnp.ndarray,
        t: jnp.ndarray,
        packed_idx=None,
    ):
        """Ancestral sampling step: mean + exp(0.5*logvar) * eps, eps=0 at
        t=0 (reference: model/view_fusion.py:166-177)."""
        mean, log_var, logits, weights = self.p_mean_variance(
            params, y_t, y_cond, mask, angle, t, packed_idx=packed_idx
        )
        eps = jnp.where(
            t > 0, jax.random.normal(rng, y_t.shape, y_t.dtype), 0.0
        )
        return mean + eps * jnp.exp(0.5 * log_var), logits, weights

    def generate(
        self,
        params: Params,
        rng: jax.Array,
        y_cond: jnp.ndarray,      # (B, N, H, W, Cc)
        view_count: jnp.ndarray,  # (B,)
        angle: jnp.ndarray,       # (B,)
        y_t: Optional[jnp.ndarray] = None,
        sample_num: int = 8,
        packed_idx=None,
        capture_aux: bool = True,
    ) -> GenerateOutput:
        """Full T-step reverse chain as one ``lax.scan``
        (reference: Python loop, model/view_fusion.py:179-214).

        Keeps every ``T // sample_num``-th intermediate frame plus the
        corresponding logit/weight maps, written into preallocated
        carry buffers via ``dynamic_update_slice`` — NOT a T-long scan
        output (SURVEY.md §7 "hard parts").

        ``packed_idx`` (static (sample_idx, view_idx) pair) switches the
        per-step UNet to packed rows — zero masked-view FLOPs across the
        whole chain.  ``capture_aux=False`` skips the (frames, B, N, ...)
        logit/weight capture buffers entirely — metric eval only reads
        ``generated_samples``, and at B=112/64px those buffers are ~1 GB
        of pure waste.
        """
        sched = self.schedule
        T = sched.num_timesteps
        assert T > sample_num, "num_timesteps must be greater than sample_num"
        sample_inter = T // sample_num
        # Number of captured frames: i in [0, T) with i % sample_inter == 0,
        # visited in descending order (largest multiple first, 0 last).
        n_frames = (T - 1) // sample_inter + 1

        b, n, h, w, cc = y_cond.shape
        k_init, k_scan = jax.random.split(rng)
        if y_t is None:
            y_t = jax.random.normal(k_init, (b, h, w, 3), jnp.float32)
        mask = view_mask(view_count, n)
        angle = angle.reshape(-1)

        keep_aux = self.weighting_inference and capture_aux
        init = self._init_chain_carry(y_t, k_scan, b, n, h, w, n_frames,
                                      keep_aux)
        step = self._make_chain_step(params, y_cond, mask, angle,
                                     packed_idx, sample_inter, keep_aux)
        carry, _ = jax.lax.scan(step, init, jnp.arange(T - 1, -1, -1))
        return self._finalize_chain(carry, keep_aux)

    # -- chain internals (shared by generate and chain_segment) --------
    @staticmethod
    def _init_chain_carry(y_t, key, b, n, h, w, n_frames, keep_aux):
        ret_arr = jnp.zeros((n_frames + 1, b, h, w, 3), jnp.float32)
        ret_arr = ret_arr.at[0].set(y_t)
        if keep_aux:
            logit_arr = jnp.zeros((n_frames, b, n, h, w, 3), jnp.float32)
            weight_arr = jnp.zeros((n_frames, b, n, h, w, 3), jnp.float32)
        else:
            logit_arr = jnp.zeros((0,), jnp.float32)
            weight_arr = jnp.zeros((0,), jnp.float32)
        return (y_t, ret_arr, logit_arr, weight_arr, jnp.int32(0), key)

    def _make_chain_step(self, params, y_cond, mask, angle, packed_idx,
                         sample_inter, keep_aux):
        def step(carry, i):
            y_t, ret_arr, logit_arr, weight_arr, frame_idx, key = carry
            key, sub = jax.random.split(key)
            y_t, logits, weights = self.p_sample(
                params, sub, y_t, y_cond, mask, angle, i,
                packed_idx=packed_idx,
            )
            capture = (i % sample_inter) == 0

            def do_capture(args):
                ret_arr, logit_arr, weight_arr, frame_idx = args
                ret_arr = jax.lax.dynamic_update_index_in_dim(
                    ret_arr, y_t, frame_idx + 1, axis=0
                )
                if keep_aux:
                    logit_arr = jax.lax.dynamic_update_index_in_dim(
                        logit_arr, logits, frame_idx, axis=0
                    )
                    weight_arr = jax.lax.dynamic_update_index_in_dim(
                        weight_arr, weights.astype(jnp.float32), frame_idx,
                        axis=0,
                    )
                return ret_arr, logit_arr, weight_arr, frame_idx + 1

            ret_arr, logit_arr, weight_arr, frame_idx = jax.lax.cond(
                capture,
                do_capture,
                lambda args: args,
                (ret_arr, logit_arr, weight_arr, frame_idx),
            )
            return (y_t, ret_arr, logit_arr, weight_arr, frame_idx, key), None

        return step

    @staticmethod
    def _finalize_chain(carry, keep_aux):
        y_t, ret_arr, logit_arr, weight_arr, _, _ = carry
        # Frame axes -> batch-major, matching the reference return contract
        # (B, frames, ...) (model/view_fusion.py:208-214).
        ret_arr = jnp.moveaxis(ret_arr, 0, 1)
        generated_samples = ret_arr[:, -1]
        if keep_aux:
            logit_arr = jnp.moveaxis(logit_arr, 0, 1)
            weight_arr = jnp.moveaxis(weight_arr, 0, 1)
            return GenerateOutput(y_t, ret_arr, logit_arr, weight_arr,
                                  generated_samples)
        return GenerateOutput(y_t, ret_arr, None, None, generated_samples)

    def init_chain(self, rng, y_cond, view_count, sample_num=8,
                   y_t=None, capture_aux=True):
        """Initial carry for a SEGMENTED reverse chain (see
        :meth:`chain_segment`).  Identical rng handling to
        :meth:`generate`: same (k_init, k_scan) split, same per-step
        splits inside the scan — a chain run in segments is bit-identical
        to a single generate() call with the same key (pinned by
        tests/test_view_fusion.py::test_segmented_chain_matches_generate).
        """
        sched = self.schedule
        T = sched.num_timesteps
        # same validation as generate(): T <= sample_num would divide
        # by zero (or silently diverge from the unsegmented path)
        assert T > sample_num, "num_timesteps must be greater than sample_num"
        sample_inter = T // sample_num
        n_frames = (T - 1) // sample_inter + 1
        b, n, h, w, _ = y_cond.shape
        k_init, k_scan = jax.random.split(rng)
        if y_t is None:
            y_t = jax.random.normal(k_init, (b, h, w, 3), jnp.float32)
        keep_aux = self.weighting_inference and capture_aux
        return self._init_chain_carry(y_t, k_scan, b, n, h, w, n_frames,
                                      keep_aux)

    def chain_segment(self, params, carry, ts, y_cond, view_count, angle,
                      sample_num=8, packed_idx=None, capture_aux=True):
        """Run the reverse chain over the timestep array ``ts``
        (descending), threading ``carry`` from :meth:`init_chain` or a
        previous segment.  Jittable; lets a T=2000 chain run as K
        dispatches of T/K steps each — same math and RNG stream as one
        :meth:`generate` call, but each device execution stays short
        (preemption windows, per-execution runtime limits).  Finish with
        :meth:`finalize_chain`."""
        sched = self.schedule
        sample_inter = sched.num_timesteps // sample_num
        keep_aux = self.weighting_inference and capture_aux
        mask = view_mask(view_count, y_cond.shape[1])
        step = self._make_chain_step(params, y_cond, mask,
                                     angle.reshape(-1), packed_idx,
                                     sample_inter, keep_aux)
        carry, _ = jax.lax.scan(step, carry, ts)
        return carry

    def finalize_chain(self, carry, capture_aux=True) -> GenerateOutput:
        keep_aux = self.weighting_inference and capture_aux
        return self._finalize_chain(carry, keep_aux)

    # ------------------------------------------------------------------
    # fast sampling (TPU extension — no reference equivalent)
    # ------------------------------------------------------------------
    def generate_ddim(
        self,
        params: Params,
        rng: jax.Array,
        y_cond: jnp.ndarray,
        view_count: jnp.ndarray,
        angle: jnp.ndarray,
        num_steps: int = 50,
        eta: float = 1.0,
        y_t: Optional[jnp.ndarray] = None,
        packed_idx=None,
    ) -> jnp.ndarray:
        """DDIM sampling (Song et al. 2021) over a strided subset of the
        trained schedule — 4-40x fewer UNet passes than the reference's
        full ancestral chain (model/view_fusion.py:196-206), using the
        SAME trained model and gammas buffer.

        eta=1 (default) injects DDPM-scale noise per step; measured on a
        trained model it MATCHES the full ancestral chain's PSNR/SSIM at
        50 steps (20.7 vs 20.3 dB at T=200) and reproduces it exactly at
        num_steps=T.  eta=0 is deterministic DDIM (faster convergence on
        smooth data, weaker on stochastic texture).
        Returns the generated samples (B, H, W, 3).  This is a pure
        extension: reference-parity sampling remains :meth:`generate`.
        """
        sched = self.schedule
        T = sched.num_timesteps
        assert 1 <= num_steps <= T
        # strided timestep subsequence, descending, always ending at 0
        ts = jnp.linspace(0, T - 1, num_steps).round().astype(jnp.int32)[::-1]
        ts_prev = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])

        b, n, h, w, _ = y_cond.shape
        k_init, k_scan = jax.random.split(rng)
        if y_t is None:
            y_t = jax.random.normal(k_init, (b, h, w, 3), jnp.float32)
        mask = view_mask(view_count, n)
        angle = angle.reshape(-1)

        def step(carry, t_pair):
            y_t, key = carry
            t, t_prev = t_pair
            key, sub = jax.random.split(key)
            gamma_t = jnp.take(sched.gammas, t)
            gamma_prev = jnp.where(t_prev >= 0,
                                   jnp.take(sched.gammas, t_prev), 1.0)

            noise_level = jnp.full((b,), gamma_t, jnp.float32)
            unet_out = self._denoise_views(
                params, y_cond, y_t, noise_level, angle,
                packed_idx=packed_idx,
            )
            eps, _, _ = self.compose(unet_out, mask,
                                     self.weighting_inference)
            y0_hat = (
                jnp.take(sched.sqrt_recip_gammas, t) * y_t
                - jnp.take(sched.sqrt_recipm1_gammas, t) * eps
            )
            y0_hat = jnp.clip(y0_hat, -1.0, 1.0)
            # re-derive eps from the clipped y0 (keeps the update
            # consistent with the clamp, as ancestral sampling does)
            eps = (y_t - jnp.sqrt(gamma_t) * y0_hat) / jnp.sqrt(
                1.0 - gamma_t
            )
            sigma = eta * jnp.sqrt(
                (1.0 - gamma_prev) / (1.0 - gamma_t)
                * (1.0 - gamma_t / gamma_prev)
            )
            dir_term = jnp.sqrt(
                jnp.maximum(1.0 - gamma_prev - sigma**2, 0.0)
            ) * eps
            z = jnp.where(
                t_prev >= 0,
                jax.random.normal(sub, y_t.shape, y_t.dtype),
                0.0,
            )
            y_next = jnp.sqrt(gamma_prev) * y0_hat + dir_term + sigma * z
            return (y_next, key), None

        (y_t, _), _ = jax.lax.scan(step, (y_t, k_scan),
                                   (ts, ts_prev))
        return y_t

    def generate_dpm(
        self,
        params: Params,
        rng: jax.Array,
        y_cond: jnp.ndarray,
        view_count: jnp.ndarray,
        angle: jnp.ndarray,
        num_steps: int = 20,
        y_t: Optional[jnp.ndarray] = None,
        packed_idx=None,
        grid: str = "lambda",
        sde: bool = False,
    ) -> jnp.ndarray:
        """DPM-Solver++(2M) (Lu et al. 2022): second-order multistep
        solver in the data-prediction (x0) parameterization — one UNet
        pass per step, second-order accuracy in the half-log-SNR step
        (convergence order pinned analytically by tests/test_dpm.py).

        ``sde=False``: probability-flow ODE (deterministic; equals
        DDIM-eta-0 quality class).  ``sde=True``: the SDE variant
        (diffusers' "sde-dpmsolver++"): per-step noise injection with
        the exponential-integrator coefficients — measured on real
        (especially undertrained) models the stochastic path
        self-corrects model error the way DDIM eta=1 does, while
        keeping the 2M correction.

        Same trained model, gammas buffer, x0 clamp, and
        denoise-to-x0 final step as :meth:`generate_ddim`; like DDIM it
        is a pure extension — reference-parity sampling remains
        :meth:`generate` (model/view_fusion.py:179-214).
        """
        sched = self.schedule
        T = sched.num_timesteps
        assert 2 <= num_steps <= T
        # Uniform-in-lambda (half-log-SNR) step grid, as the DPM-Solver
        # paper prescribes: uniform-in-t spacing makes the final steps
        # huge in lambda (the 2M extrapolation coefficient h/2h_prev
        # blows up and convergence degrades — measured on the analytic
        # oracle in tests/test_dpm.py).  Schedule buffers are concrete,
        # so the grid is computed host-side at trace time; duplicate
        # nearest-index hits collapse (num_steps is an upper bound when
        # it approaches T).
        import numpy as _np

        if grid == "time":
            # uniform-in-t grid (the DDIM spacing; diffusers' multistep
            # default) — kept as an option for schedules whose lambda
            # ladder is well-conditioned near t=0
            idx = _np.linspace(0, T - 1, num_steps).round().astype(int)
        elif grid == "lambda":
            g_np = _np.asarray(sched.gammas, _np.float64)
            lam_np = 0.5 * (_np.log(g_np) - _np.log1p(-g_np))
            targets = _np.linspace(lam_np[-1], lam_np[0], num_steps)
            idx = _np.abs(lam_np[None, :] - targets[:, None]).argmin(axis=1)
        else:
            raise ValueError(f"grid must be 'lambda' or 'time': {grid!r}")
        ts = jnp.asarray(_np.unique(idx)[::-1].copy(), jnp.int32)
        ts_next = jnp.concatenate([ts[1:], jnp.array([-1], jnp.int32)])

        b, n, h, w, _ = y_cond.shape
        if y_t is None:
            y_t = jax.random.normal(rng, (b, h, w, 3), jnp.float32)
        mask = view_mask(view_count, n)
        angle = angle.reshape(-1)
        gammas = sched.gammas

        def x0_pred(y, t):
            noise_level = jnp.full((b,), jnp.take(gammas, t), jnp.float32)
            unet_out = self._denoise_views(
                params, y_cond, y, noise_level, angle,
                packed_idx=packed_idx,
            )
            eps, _, _ = self.compose(unet_out, mask,
                                     self.weighting_inference)
            x0 = (
                jnp.take(sched.sqrt_recip_gammas, t) * y
                - jnp.take(sched.sqrt_recipm1_gammas, t) * eps
            )
            return jnp.clip(x0, -1.0, 1.0)

        def lam(g):  # half-log-SNR: log(alpha/sigma), alpha^2 = gamma
            return 0.5 * (jnp.log(g) - jnp.log1p(-g))

        def step(carry, t_pair):
            y, x0_prev, h_prev, first, key = carry
            t, t_next = t_pair
            key, sub = jax.random.split(key)
            x0 = x0_pred(y, t)
            g_cur = jnp.take(gammas, t)
            g_next = jnp.take(gammas, jnp.maximum(t_next, 0))  # guarded by where
            hh = lam(g_next) - lam(g_cur)
            # 2M correction: extrapolate x0 through the previous
            # evaluation; first step falls back to first order.  The
            # placeholder h_prev=1 on step 0 keeps c finite (the where
            # still evaluates both branches).
            c = hh / (2.0 * h_prev)
            d = jnp.where(first, x0, (1.0 + c) * x0 - c * x0_prev)
            sigma_cur = jnp.sqrt(1.0 - g_cur)
            sigma_next = jnp.sqrt(1.0 - g_next)
            alpha_next = jnp.sqrt(g_next)
            if sde:
                # exponential integrator of the reverse SDE with x0
                # held piecewise-constant: exact conditional Gaussian
                # per step given a perfect x0 (h -> inf recovers
                # alpha*x0 + sigma*z, h -> 0 recovers y)
                decay = jnp.exp(-hh)
                mix = -jnp.expm1(-2.0 * hh)  # 1 - e^{-2h}
                z = jax.random.normal(sub, y.shape, y.dtype)
                y_upd = (
                    (sigma_next / sigma_cur) * decay * y
                    + alpha_next * mix * d
                    + sigma_next * jnp.sqrt(mix) * z
                )
            else:
                y_upd = (
                    (sigma_next / sigma_cur) * y
                    - alpha_next * jnp.expm1(-hh) * d
                )
            # final step (t_next == -1): jump to the clean prediction,
            # the gamma_prev = 1 limit — same convention as generate_ddim
            y_next = jnp.where(t_next >= 0, y_upd, x0)
            return (y_next, x0, hh, jnp.zeros((), bool), key), None

        k_scan = jax.random.fold_in(rng, 1)
        init = (y_t, jnp.zeros_like(y_t), jnp.ones(()),
                jnp.ones((), bool), k_scan)
        (y_t, _, _, _, _), _ = jax.lax.scan(step, init, (ts, ts_next))
        return y_t
