"""DDIM fast-sampler tests (TPU extension beyond reference parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viewfusion_tpu.models.view_fusion import ViewFusion


def _setup(tiny_config, rng, b=2, n=3, hw=8):
    model = ViewFusion.from_config(tiny_config)
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(
        rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(np.float32)
    )
    vc = jnp.asarray(rng.integers(1, n + 1, (b,)).astype(np.int32))
    angle = jnp.asarray(rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    return model, params, cond, vc, angle


def test_ddim_shapes_and_finite(tiny_config, rng):
    model, params, cond, vc, angle = _setup(tiny_config, rng)
    out = jax.jit(
        lambda p, k: model.generate_ddim(p, k, cond, vc, angle,
                                         num_steps=4)
    )(params, jax.random.PRNGKey(1))
    assert out.shape == (2, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_deterministic_at_eta_zero(tiny_config, rng):
    model, params, cond, vc, angle = _setup(tiny_config, rng)
    y_init = jnp.asarray(
        rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    )
    a = model.generate_ddim(params, jax.random.PRNGKey(1), cond, vc,
                            angle, num_steps=4, eta=0.0, y_t=y_init)
    b = model.generate_ddim(params, jax.random.PRNGKey(2), cond, vc,
                            angle, num_steps=4, eta=0.0, y_t=y_init)
    # eta=0: no injected noise, so the rng key must not matter
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ddim_full_steps_close_to_ancestral_mean(tiny_config, rng):
    """With num_steps == T and eta=1, DDIM visits every timestep with
    DDPM-scale noise; results should land in the same range as
    ancestral sampling (sanity, not equality)."""
    model, params, cond, vc, angle = _setup(tiny_config, rng)
    out = model.generate_ddim(params, jax.random.PRNGKey(1), cond, vc,
                              angle,
                              num_steps=model.schedule.num_timesteps,
                              eta=1.0)
    anc = model.generate(params, jax.random.PRNGKey(1), cond, vc, angle,
                         sample_num=4).generated_samples
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.abs(np.asarray(out)).max() < 3.0
    assert np.abs(np.asarray(anc)).max() < 3.0


def test_ddim_bad_steps_raises(tiny_config, rng):
    model, params, cond, vc, angle = _setup(tiny_config, rng)
    with pytest.raises(AssertionError):
        model.generate_ddim(params, jax.random.PRNGKey(1), cond, vc,
                            angle, num_steps=0)
