"""DiT denoiser family tests: shape/conditioning contract matches the
UNet, composes with ViewFusion, trains."""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from tests.conftest import TINY_CONFIG
from viewfusion_tpu.config import Config
from viewfusion_tpu.models.dit import DiT, DiTConfig
from viewfusion_tpu.models.view_fusion import ViewFusion

CFG = DiTConfig(image_size=8, in_channel=6, out_channel=6, patch_size=2,
                hidden_size=32, depth=2, num_heads=2)


def _dit_tiny_config():
    raw = copy.deepcopy(TINY_CONFIG)
    raw["model"]["denoise_net"] = "dit"
    raw["model"]["denoise_net_params"] = {
        "image_size": 8, "in_channel": 6, "out_channel": 6,
        "patch_size": 2, "hidden_size": 32, "depth": 2, "num_heads": 2,
    }
    return Config.from_dict(raw)


def test_dit_shapes_and_conditioning():
    net = DiT(config=CFG, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 6))
    params = net.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)),
                      jnp.ones((2,)))
    out = net.apply(params, x, jnp.zeros((2,)), jnp.ones((2,)) * 0.5)
    assert out.shape == (2, 8, 8, 6)
    # adaLN-Zero: blocks and head are zero-init, so the network starts
    # as the zero map — by design (stable diffusion-transformer init).
    np.testing.assert_array_equal(np.asarray(out), 0.0)

    # conditioning must flow once the zero-init gates are perturbed
    key = jax.random.PRNGKey(7)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    params_rnd = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    out1 = net.apply(params_rnd, x, jnp.zeros((2,)), jnp.ones((2,)) * 0.5)
    out2 = net.apply(params_rnd, x, jnp.zeros((2,)), jnp.ones((2,)) * 0.1)
    out3 = net.apply(params_rnd, x, jnp.ones((2,)) * 2.0,
                     jnp.ones((2,)) * 0.5)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_dit_in_view_fusion_loss_and_generate(rng):
    cfg = _dit_tiny_config()
    model = ViewFusion.from_config(cfg)
    assert isinstance(model.denoise_fn, DiT)
    b, n, hw = 2, 3, 8
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(
        np.float32))
    vc = jnp.asarray([1, 3])
    angle = jnp.zeros((b,))
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    loss = model.loss(params, jax.random.PRNGKey(1), y0, cond, vc, angle)
    assert np.isfinite(float(loss))
    out = model.generate(params, jax.random.PRNGKey(2), cond, vc, angle,
                         sample_num=4)
    assert out.y_t.shape == (b, hw, hw, 3)
    assert np.all(np.isfinite(np.asarray(out.y_t)))


def test_dit_learns(rng):
    """A few Adam steps on a fixed batch must reduce the loss."""
    import optax

    cfg = _dit_tiny_config()
    model = ViewFusion.from_config(cfg)
    b, n, hw = 4, 3, 8
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(
        np.float32))
    vc = jnp.asarray([2, 1, 3, 2])
    angle = jnp.zeros((b,))
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, key):
        loss, g = jax.value_and_grad(
            lambda q: model.loss(q, key, y0, cond, vc, angle)
        )(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(30):
        params, opt, loss = step(params, opt, jax.random.fold_in(key, i % 3))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_unknown_denoiser_raises():
    raw = copy.deepcopy(TINY_CONFIG)
    raw["model"]["denoise_net"] = "mlp"
    import pytest

    with pytest.raises(ValueError):
        ViewFusion.from_config(Config.from_dict(raw))
