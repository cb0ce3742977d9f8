"""Closed-form unit tests for beta schedules and derived DDPM buffers
(reference semantics: model/view_fusion.py:304-362, 35-68)."""

import math

import numpy as np
import pytest

from viewfusion_tpu.config import BetaScheduleConfig
from viewfusion_tpu.ops.schedules import (
    DiffusionSchedule,
    extract,
    make_beta_schedule,
)

T = 100
START, END = 1e-6, 1e-2


def test_linear():
    betas = make_beta_schedule("linear", T, START, END)
    assert betas.dtype == np.float64
    np.testing.assert_allclose(betas, np.linspace(START, END, T))


def test_quad():
    betas = make_beta_schedule("quad", T, START, END)
    expected = np.linspace(START**0.5, END**0.5, T) ** 2
    np.testing.assert_allclose(betas, expected)
    assert abs(betas[0] - START) < 1e-12 and abs(betas[-1] - END) < 1e-12


@pytest.mark.parametrize("name,frac", [("warmup10", 0.1), ("warmup50", 0.5)])
def test_warmup(name, frac):
    betas = make_beta_schedule(name, T, START, END)
    warm = int(T * frac)
    np.testing.assert_allclose(betas[:warm], np.linspace(START, END, warm))
    np.testing.assert_allclose(betas[warm:], END)


def test_const():
    np.testing.assert_allclose(make_beta_schedule("const", T, START, END), END)


def test_jsd():
    betas = make_beta_schedule("jsd", T)
    np.testing.assert_allclose(betas, 1.0 / np.linspace(T, 1, T))
    assert betas[-1] == 1.0


def test_cosine():
    s = 8e-3
    betas = make_beta_schedule("cosine", T, cosine_s=s)
    ts = np.arange(T + 1, dtype=np.float64) / T + s
    alphas = np.cos(ts / (1 + s) * math.pi / 2) ** 2
    alphas = alphas / alphas[0]
    expected = np.clip(1 - alphas[1:] / alphas[:-1], None, 0.999)
    np.testing.assert_allclose(betas, expected)
    assert np.all(betas <= 0.999)


def test_unknown_schedule_raises():
    with pytest.raises(NotImplementedError):
        make_beta_schedule("nope", T)


def test_derived_buffers_closed_form():
    cfg = BetaScheduleConfig("linear", T, START, END)
    sched = DiffusionSchedule.create(cfg)
    betas = np.linspace(START, END, T)
    alphas = 1 - betas
    gammas = np.cumprod(alphas)
    gammas_prev = np.append(1.0, gammas[:-1])

    np.testing.assert_allclose(np.asarray(sched.gammas), gammas, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_recip_gammas), np.sqrt(1 / gammas), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_recipm1_gammas), np.sqrt(1 / gammas - 1),
        rtol=1e-5, atol=1e-8,
    )
    post_var = betas * (1 - gammas_prev) / (1 - gammas)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_log_variance_clipped),
        np.log(np.maximum(post_var, 1e-20)),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef1),
        betas * np.sqrt(gammas_prev) / (1 - gammas),
        rtol=1e-5, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef2),
        (1 - gammas_prev) * np.sqrt(alphas) / (1 - gammas),
        rtol=1e-5,
    )
    # Posterior variance is clipped at t=0 where it is exactly 0.
    np.testing.assert_allclose(
        np.asarray(sched.posterior_log_variance_clipped)[0],
        np.log(1e-20), rtol=1e-6,
    )
    assert sched.num_timesteps == T


def test_extract():
    import jax.numpy as jnp

    a = jnp.arange(10.0)
    t = jnp.array([0, 3, 9])
    out = extract(a, t, ndim=4)
    assert out.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [0, 3, 9])
    out2 = extract(a, t, ndim=2)
    assert out2.shape == (3, 1)
