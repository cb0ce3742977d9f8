"""PSNR/SSIM tests against closed-form values and an independent numpy
oracle of the pytorch_msssim algorithm (reference: utils/metrics.py)."""

import numpy as np
import jax.numpy as jnp

from viewfusion_tpu.ops.metrics import compute_psnr, compute_ssim, gaussian_window


def test_psnr_closed_form():
    gen = np.zeros((2, 8, 8, 3), np.float32)
    tgt = np.zeros((2, 8, 8, 3), np.float32)
    tgt[0] += 0.1  # mse = 0.01 -> psnr = 20
    tgt[1] += 0.5  # mse = 0.25 -> psnr = 20*log10(2) ~ 6.0206
    psnr = np.asarray(compute_psnr(jnp.asarray(gen), jnp.asarray(tgt)))
    np.testing.assert_allclose(psnr, [20.0, 20 * np.log10(2.0)], rtol=1e-5)


def test_psnr_identical_is_inf():
    x = np.random.default_rng(0).uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    psnr = np.asarray(compute_psnr(jnp.asarray(x), jnp.asarray(x)))
    assert np.isinf(psnr[0])


def test_gaussian_window_normalized():
    w = gaussian_window(11, 1.5)
    assert w.shape == (11,)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-6)
    assert np.argmax(w) == 5


def _ssim_oracle(x, y, data_range=1.0, win_size=11, sigma=1.5):
    """Independent numpy implementation of SSIM with valid-mode separable
    Gaussian filtering (Wang et al. 2004, pytorch_msssim algorithm)."""
    coords = np.arange(win_size) - win_size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()

    def blur(img):  # img: (H, W)
        tmp = np.apply_along_axis(
            lambda r: np.convolve(r, g, mode="valid"), 0, img
        )
        return np.apply_along_axis(
            lambda r: np.convolve(r, g, mode="valid"), 1, tmp
        )

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for b in range(x.shape[0]):
        per_c = []
        for c in range(x.shape[-1]):
            xx, yy = x[b, :, :, c], y[b, :, :, c]
            mu1, mu2 = blur(xx), blur(yy)
            s1 = blur(xx * xx) - mu1**2
            s2 = blur(yy * yy) - mu2**2
            s12 = blur(xx * yy) - mu1 * mu2
            ssim_map = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
                (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
            )
            per_c.append(ssim_map.mean())
        vals.append(np.mean(per_c))
    return np.asarray(vals)


def test_ssim_identical_is_one():
    x = np.random.default_rng(0).uniform(0, 1, (2, 16, 16, 3)).astype(
        np.float32
    )
    ssim = np.asarray(compute_ssim(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(ssim, 1.0, atol=1e-5)


def test_ssim_matches_numpy_oracle():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, (3, 20, 20, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
    ours = np.asarray(compute_ssim(jnp.asarray(x), jnp.asarray(y)))
    oracle = _ssim_oracle(x, y)
    # float32 E[x^2]-E[x]^2 cancellation vs the float64 oracle bounds the
    # achievable agreement (~5e-4); pytorch_msssim has the same f32 error.
    np.testing.assert_allclose(ours, oracle, atol=2e-3)
    assert np.all(ours < 1.0)


def test_ssim_monotonic_in_noise():
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (1, 20, 20, 3)).astype(np.float32)
    prev = 1.0
    for amp in (0.02, 0.1, 0.3):
        y = np.clip(x + rng.normal(0, amp, x.shape), 0, 1).astype(np.float32)
        cur = float(compute_ssim(jnp.asarray(x), jnp.asarray(y))[0])
        assert cur < prev
        prev = cur


# ---------------------------------------------------------------------
# Bounds: SSIM is mathematically confined to [-1, 1]; the float32
# E[x^2]-E[x]^2 variance form loses that under cancellation (the
# SSIM = -2.11 of SAMPLER_QUALITY_r04.json came from exactly this, via
# TPU's default-bf16 conv precision on an over-smoothed ddim0 batch).
# compute_ssim now pins conv precision and projects the moments back
# onto their exact-arithmetic constraints; these tests are the guard.
# ---------------------------------------------------------------------
_TOL = 1e-5


def _assert_bounded(ssim):
    ssim = np.asarray(ssim)
    assert np.all(np.isfinite(ssim)), ssim
    assert np.all(ssim >= -1.0 - _TOL), ssim
    assert np.all(ssim <= 1.0 + _TOL), ssim


def test_ssim_bounded_huge_values():
    # 1e4-offset images: blur(x^2) ~ 1e8, so f32 cancellation noise in
    # the variances (~+-6) dwarfs c2 = 9e-4 -- the raw formula divides
    # by a near-zero/negative denominator here
    rng = np.random.default_rng(3)
    x = (1e4 + rng.standard_normal((4, 32, 32, 3)) * 1e-2).astype(np.float32)
    y = (1e4 + rng.standard_normal((4, 32, 32, 3)) * 1e-2).astype(np.float32)
    _assert_bounded(compute_ssim(jnp.asarray(x), jnp.asarray(y),
                                 data_range=1.0))


def test_ssim_bounded_anticorrelated_huge():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    x = (1e3 + a).astype(np.float32)
    y = (1e3 - a).astype(np.float32)
    _assert_bounded(compute_ssim(jnp.asarray(x), jnp.asarray(y)))


def test_ssim_bounded_constant_patches():
    # exactly flat regions: true sigma = 0, denominator = c2 only
    x = np.zeros((2, 32, 32, 3), np.float32)
    y = np.ones((2, 32, 32, 3), np.float32) * 0.5
    _assert_bounded(compute_ssim(jnp.asarray(x), jnp.asarray(y)))
    x[:, :16] = 0.7  # half-flat, step edge
    _assert_bounded(compute_ssim(jnp.asarray(x), jnp.asarray(y)))


def test_ssim_bounded_bf16_inputs():
    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    out = compute_ssim(jnp.asarray(x, jnp.bfloat16),
                       jnp.asarray(y, jnp.bfloat16))
    _assert_bounded(out)


def test_ssim_bounded_under_bf16_matmul_precision():
    # the TPU failure mode: under default-bf16 conv precision, flat
    # [0,1] images used to leave the range; the explicit
    # Precision.HIGHEST on the blur must override the context
    import jax

    rng = np.random.default_rng(6)
    x = rng.uniform(0.4, 0.6, (2, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 1e-3, x.shape), 0, 1).astype(np.float32)
    with jax.default_matmul_precision("bfloat16"):
        ours = compute_ssim.__wrapped__(jnp.asarray(x), jnp.asarray(y))
    _assert_bounded(ours)
    oracle = _ssim_oracle(x, y)
    np.testing.assert_allclose(np.asarray(ours), oracle, atol=2e-3)


def test_ssim_near_identical_not_above_one():
    # pre-fix this measured 1.0013 even in plain f32 on CPU
    rng = np.random.default_rng(7)
    x = rng.uniform(0.4, 0.6, (2, 64, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 1e-3, x.shape), 0, 1).astype(np.float32)
    _assert_bounded(compute_ssim(jnp.asarray(x), jnp.asarray(y)))
