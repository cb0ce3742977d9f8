"""DDPM beta schedules and derived schedule buffers.

Numerics replicate the reference exactly (model/view_fusion.py:304-362 for
the 7 schedule variants; model/view_fusion.py:35-68 for the derived
buffers), computed in float64 then cast to float32, as the reference does
(np.float64 schedules -> torch.float32 buffers).

TPU-native differences: buffers live in a frozen pytree-compatible
dataclass (closed over by jitted functions as constants or passed as
arguments), not torch module buffers; ``extract`` is a pure gather.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from viewfusion_tpu.config import BetaScheduleConfig

__all__ = ["make_beta_schedule", "DiffusionSchedule", "extract"]


def _warmup_beta(
    linear_start: float, linear_end: float, num_timesteps: int, warmup_frac: float
) -> np.ndarray:
    """Constant schedule with a linear warmup prefix
    (reference: model/view_fusion.py:321-327)."""
    betas = linear_end * np.ones(num_timesteps, dtype=np.float64)
    warmup_time = int(num_timesteps * warmup_frac)
    betas[:warmup_time] = np.linspace(
        linear_start, linear_end, warmup_time, dtype=np.float64
    )
    return betas


def make_beta_schedule(
    schedule: str,
    num_timesteps: int,
    linear_start: float = 1e-6,
    linear_end: float = 1e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """All 7 schedule variants of the reference
    (model/view_fusion.py:330-362), as float64 numpy."""
    if schedule == "quad":
        betas = (
            np.linspace(
                linear_start**0.5, linear_end**0.5, num_timesteps, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "linear":
        betas = np.linspace(linear_start, linear_end, num_timesteps, dtype=np.float64)
    elif schedule == "warmup10":
        betas = _warmup_beta(linear_start, linear_end, num_timesteps, 0.1)
    elif schedule == "warmup50":
        betas = _warmup_beta(linear_start, linear_end, num_timesteps, 0.5)
    elif schedule == "const":
        betas = linear_end * np.ones(num_timesteps, dtype=np.float64)
    elif schedule == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(num_timesteps, 1, num_timesteps, dtype=np.float64)
    elif schedule == "cosine":
        timesteps = (
            np.arange(num_timesteps + 1, dtype=np.float64) / num_timesteps + cosine_s
        )
        alphas = timesteps / (1 + cosine_s) * math.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1.0 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, a_min=None, a_max=0.999)
    else:
        raise NotImplementedError(schedule)
    return betas


@dataclass(frozen=True)
class DiffusionSchedule:
    """Derived DDPM buffers (reference: model/view_fusion.py:35-68).

    gamma == cumulative alpha-bar product; the reference calls it
    ``gammas`` and conditions the UNet on this *continuous* noise level.
    All arrays have shape (T,) float32.
    """

    num_timesteps: int
    betas: jnp.ndarray
    gammas: jnp.ndarray
    gammas_prev: jnp.ndarray
    sqrt_recip_gammas: jnp.ndarray
    sqrt_recipm1_gammas: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @classmethod
    def create(cls, cfg: BetaScheduleConfig) -> "DiffusionSchedule":
        betas = make_beta_schedule(
            schedule=cfg.schedule,
            num_timesteps=cfg.num_timesteps,
            linear_start=cfg.linear_start,
            linear_end=cfg.linear_end,
            cosine_s=cfg.cosine_s,
        )
        alphas = 1.0 - betas
        gammas = np.cumprod(alphas, axis=0)
        gammas_prev = np.append(1.0, gammas[:-1])
        posterior_variance = betas * (1.0 - gammas_prev) / (1.0 - gammas)
        # HOST-resident (numpy) constants, not jnp device arrays: the
        # tables are closed over by every jitted loss/sampler, and MLIR
        # lowering embeds closed-over arrays as literal constants — for
        # a committed DEVICE array that embed is a device->host fetch
        # per lowering (observed live as a lowering-time hang when the
        # tunneled chip's D2H path wedged).  numpy closures embed
        # directly, lower without a live chip (AOT-friendly), and
        # compile to the identical HLO constant.
        f32 = lambda a: np.asarray(a, dtype=np.float32)  # noqa: E731
        return cls(
            num_timesteps=int(betas.shape[0]),
            betas=f32(betas),
            gammas=f32(gammas),
            gammas_prev=f32(gammas_prev),
            sqrt_recip_gammas=f32(np.sqrt(1.0 / gammas)),
            sqrt_recipm1_gammas=f32(np.sqrt(1.0 / gammas - 1.0)),
            posterior_log_variance_clipped=f32(
                np.log(np.maximum(posterior_variance, 1e-20))
            ),
            posterior_mean_coef1=f32(betas * np.sqrt(gammas_prev) / (1.0 - gammas)),
            posterior_mean_coef2=f32(
                (1.0 - gammas_prev) * np.sqrt(alphas) / (1.0 - gammas)
            ),
        )


def extract(a: jnp.ndarray, t: jnp.ndarray, ndim: int = 4) -> jnp.ndarray:
    """Gather schedule values at integer timesteps ``t`` (shape (B,)) and
    reshape to (B, 1, ..., 1) with ``ndim`` total dims for broadcasting
    (reference: model/view_fusion.py:314-317)."""
    out = jnp.take(a, t, axis=-1)
    return out.reshape(t.shape[0], *((1,) * (ndim - 1)))
