"""Remat (activation checkpointing) must not change numerics."""


import jax
import jax.numpy as jnp
import numpy as np

from viewfusion_tpu.config import UNetConfig
from viewfusion_tpu.models.unet import UNet

CFG = UNetConfig(
    image_size=8, in_channel=6, out_channel=6, inner_channel=8,
    norm_groups=4, channel_mults=(1, 2), attn_res=(4,), res_blocks=1,
)


def test_remat_same_outputs_and_grads():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 6))
    angle = jnp.zeros((2,))
    level = jnp.ones((2,))

    base = UNet(config=CFG, dtype=jnp.float32, remat=False)
    rematted = UNet(config=CFG, dtype=jnp.float32, remat=True)
    params = base.init(jax.random.PRNGKey(0), x, angle, level)

    out_a = base.apply(params, x, angle, level)
    out_b = rematted.apply(params, x, angle, level)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-6)

    def loss(net, p):
        return jnp.mean(net.apply(p, x, angle, level) ** 2)

    g_a = jax.grad(lambda p: loss(base, p))(params)
    g_b = jax.grad(lambda p: loss(rematted, p))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_a),
                    jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
