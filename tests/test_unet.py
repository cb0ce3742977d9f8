"""UNet shape parity and conditioning-encoding tests
(reference: model/unet.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viewfusion_tpu.config import UNetConfig
from viewfusion_tpu.models.unet import UNet, positional_encoding


def test_positional_encoding_closed_form():
    """Matches the WaveGrad formula (model/unet.py:142-157)."""
    dim = 32
    level = np.array([0.0, 0.5, 1.0, 3.7], np.float32)
    enc = np.asarray(positional_encoding(jnp.asarray(level), dim))
    assert enc.shape == (4, dim)
    count = dim // 2
    step = np.arange(count) / count
    inner = level[:, None] * np.exp(-math.log(1e4) * step[None])
    np.testing.assert_allclose(enc[:, :count], np.sin(inner), atol=1e-5)
    np.testing.assert_allclose(enc[:, count:], np.cos(inner), atol=1e-5)


def _run_unet(cfg: UNetConfig, batch=2):
    unet = UNet(config=cfg, dtype=jnp.float32)
    x = jnp.zeros((batch, cfg.image_size, cfg.image_size, cfg.in_channel))
    angle = jnp.zeros((batch,))
    level = jnp.ones((batch,))
    params = unet.init(jax.random.PRNGKey(0), x, angle, level)
    out = unet.apply(params, x, angle, level)
    return out, params


@pytest.mark.parametrize(
    "in_ch,out_ch",
    [(6, 6), (9, 6), (6, 3)],  # paper / relative / no-weighting variants
)
def test_unet_shapes_variants(in_ch, out_ch):
    cfg = UNetConfig(
        image_size=16, in_channel=in_ch, out_channel=out_ch,
        inner_channel=8, norm_groups=4, channel_mults=(1, 2),
        attn_res=(8,), res_blocks=1,
    )
    out, _ = _run_unet(cfg)
    assert out.shape == (2, 16, 16, out_ch)
    assert out.dtype == jnp.float32


def test_unet_paper_topology_small():
    """Paper config topology scaled to 16px: mults (1,2,3,5), res_blocks 3,
    attention at 16 (configs/small-v100-4.yaml:20-30)."""
    cfg = UNetConfig(
        image_size=16, in_channel=6, out_channel=6, inner_channel=8,
        norm_groups=4, channel_mults=(1, 2, 3, 5), attn_res=(4,),
        res_blocks=3,
    )
    unet = UNet(config=cfg, dtype=jnp.float32)
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channel))
    params = jax.eval_shape(
        lambda: unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                          jnp.ones((1,)))
    )
    # 4 scales * 3 blocks down, 4 scales * 4 blocks up, 2 mid, 3 down/up-samples
    modules = set(params["params"].keys())
    downs = [m for m in modules if m.startswith("down_")]
    ups = [m for m in modules if m.startswith("up_")]
    assert len(downs) == 12
    assert len(ups) == 16
    assert {"mid_0", "mid_1", "stem", "final_conv"} <= modules
    assert len([m for m in modules if m.startswith("downsample_")]) == 3
    assert len([m for m in modules if m.startswith("upsample_")]) == 3


def test_unet_depends_on_conditioning():
    cfg = UNetConfig(
        image_size=8, in_channel=6, out_channel=6, inner_channel=8,
        norm_groups=4, channel_mults=(1, 2), attn_res=(4,), res_blocks=1,
    )
    unet = UNet(config=cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 6))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)),
                       jnp.ones((2,)))
    out_a = unet.apply(params, x, jnp.zeros((2,)), jnp.ones((2,)) * 0.1)
    out_b = unet.apply(params, x, jnp.zeros((2,)), jnp.ones((2,)) * 0.9)
    out_c = unet.apply(params, x, jnp.ones((2,)) * 2.0, jnp.ones((2,)) * 0.1)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_c))


def test_unet_jit_and_grad():
    cfg = UNetConfig(
        image_size=8, in_channel=6, out_channel=6, inner_channel=8,
        norm_groups=4, channel_mults=(1, 2), attn_res=(4,), res_blocks=1,
    )
    unet = UNet(config=cfg, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 6))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)),
                       jnp.ones((2,)))

    @jax.jit
    def loss(p):
        out = unet.apply(p, x, jnp.zeros((2,)), jnp.ones((2,)))
        return jnp.mean(out**2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)
