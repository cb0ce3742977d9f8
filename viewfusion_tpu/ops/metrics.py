"""Image quality metrics: PSNR and SSIM in pure JAX.

Replaces the reference's torch metric stack (utils/metrics.py:6-12:
PSNR = 20*log10(1/sqrt(MSE)) per image; SSIM via pytorch_msssim with
data_range=1.0, size_average=False).  The SSIM here follows the same
algorithm pytorch_msssim implements (Wang et al. 2004): 11-tap separable
Gaussian window (sigma 1.5), VALID padding, K=(0.01, 0.03), mean over
spatial dims then channels -> one scalar per image.

All images are NHWC float in [0, data_range].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["compute_psnr", "compute_ssim", "gaussian_window"]


def compute_psnr(generated: jnp.ndarray, target: jnp.ndarray,
                 data_range: float = 1.0) -> jnp.ndarray:
    """Per-image PSNR over all pixels/channels
    (reference: utils/metrics.py:6-8)."""
    axes = tuple(range(1, generated.ndim))
    mse = jnp.mean((generated - target) ** 2, axis=axes)
    return 20.0 * jnp.log10(data_range / jnp.sqrt(mse))


def gaussian_window(win_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Normalized 1-D Gaussian window (pytorch_msssim _fspecial_gauss_1d)."""
    coords = np.arange(win_size, dtype=np.float64) - win_size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_blur(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian filter, VALID padding, NHWC.

    Precision is pinned to HIGHEST: on TPU, f32 convolutions default to
    bf16 multiplies (~4e-3 relative error), and the variance estimator
    below subtracts two blurred quantities whose true difference can be
    ~0 on flat image regions — the bf16 error then exceeds the c2=9e-4
    stabilizer, flips the cs denominator negative, and SSIM leaves its
    mathematical [-1, 1] range (the SSIM = -2.11 artifact of
    SAMPLER_QUALITY_r04.json, produced by the over-smoothed ddim0-50
    batch).  HIGHEST makes the blur exact-f32; metrics are negligible
    FLOPs, so there is no perf tradeoff."""
    c = x.shape[-1]
    k = win.shape[0]
    kern_h = jnp.tile(win.reshape(k, 1, 1, 1), (1, 1, 1, c))
    kern_w = jnp.tile(win.reshape(1, k, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, c),
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kern_h, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, k, 1, c),
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kern_w, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("data_range", "win_size",
                                             "win_sigma"))
def compute_ssim(
    generated: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    win_size: int = 11,
    win_sigma: float = 1.5,
) -> jnp.ndarray:
    """Per-image SSIM, NHWC, matching pytorch_msssim defaults
    (reference call: utils/metrics.py:11-12)."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    # Auto-shrink the window for images smaller than 11px (pytorch_msssim
    # would assert); identical to the reference at the 64x64 data size.
    min_dim = min(generated.shape[1], generated.shape[2])
    if win_size > min_dim:
        win_size = min_dim if min_dim % 2 == 1 else min_dim - 1
    win = jnp.asarray(gaussian_window(win_size, win_sigma))

    x = generated.astype(jnp.float32)
    y = target.astype(jnp.float32)
    mu1 = _depthwise_blur(x, win)
    mu2 = _depthwise_blur(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_blur(x * x, win) - mu1_sq
    sigma2_sq = _depthwise_blur(y * y, win) - mu2_sq
    sigma12 = _depthwise_blur(x * y, win) - mu1_mu2

    # In exact arithmetic sigma1_sq, sigma2_sq >= 0 and
    # |sigma12| <= sqrt(sigma1_sq * sigma2_sq) (Cauchy-Schwarz), which
    # is what bounds SSIM to [-1, 1].  The E[x^2]-E[x]^2 form loses
    # those properties to float cancellation on large-magnitude inputs;
    # projecting back onto them only ever corrects toward the exact
    # value, is a no-op on well-conditioned inputs (the torch-parity
    # pins in PARITY_METRICS.json are unchanged), and restores the
    # mathematical range for any input
    # (tests/test_metrics.py::test_ssim_bounded_*).
    sigma1_sq = jnp.maximum(sigma1_sq, 0.0)
    sigma2_sq = jnp.maximum(sigma2_sq, 0.0)
    bound = jnp.sqrt(sigma1_sq * sigma2_sq)
    sigma12 = jnp.clip(sigma12, -bound, bound)

    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return jnp.mean(ssim_map, axis=(1, 2, 3))
