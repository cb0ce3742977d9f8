"""Distributed tests on the virtual 8-device CPU mesh: sharded training
steps must be numerically equivalent to single-device execution, and the
mesh/sharding utilities must behave (replaces what the reference never
tested: DDP correctness, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from viewfusion_tpu.models.view_fusion import ViewFusion
from viewfusion_tpu.parallel.mesh import (
    MeshSpec,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def test_eight_cpu_devices_available():
    assert len(jax.devices()) == 8


def _setup(tiny_config, rng, b=8, n=4):
    model = ViewFusion.from_config(tiny_config)
    hw = 8
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(
        rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(np.float32)
    )
    vc = jnp.asarray(rng.integers(1, n + 1, (b,)).astype(np.int32))
    angle = jnp.asarray(
        rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    return model, params, {"target": y0, "cond": cond, "view_count": vc,
                           "angle": angle}


def _loss_and_grads(model, params, batch, key):
    def loss_fn(p):
        return model.loss(p, key, batch["target"], batch["cond"],
                          batch["view_count"], batch["angle"])
    return jax.value_and_grad(loss_fn)(params)


@pytest.mark.parametrize("spec", [MeshSpec(data=8, view=1),
                                  MeshSpec(data=4, view=2),
                                  MeshSpec(data=2, view=4)])
def test_sharded_loss_and_grads_match_single_device(tiny_config, rng, spec):
    model, params, batch = _setup(tiny_config, rng)
    key = jax.random.PRNGKey(5)

    loss_ref, grads_ref = jax.jit(
        lambda p, b: _loss_and_grads(model, p, b, key)
    )(params, batch)

    mesh = make_mesh(spec)
    np_batch = {k: np.asarray(v) for k, v in batch.items()}
    sharded = shard_batch(np_batch, mesh)
    params_r = replicate(params, mesh)
    loss_sh, grads_sh = jax.jit(
        lambda p, b: _loss_and_grads(model, p, b, key)
    )(params_r, sharded)

    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=2e-5)
    flat_ref = jax.tree_util.tree_leaves(grads_ref)
    flat_sh = jax.tree_util.tree_leaves(grads_sh)
    for a, b_ in zip(flat_ref, flat_sh):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=1e-5
        )


def test_full_train_step_on_mesh(tiny_config, rng):
    """Adam update over the mesh: params stay replicated and in sync."""
    model, params, batch = _setup(tiny_config, rng)
    tx = optax.adam(1e-3)
    mesh = make_mesh(MeshSpec(data=4, view=2))
    params = replicate(params, mesh)
    opt_state = replicate(tx.init(params), mesh)
    sharded = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)

    @jax.jit
    def step(p, o, b):
        loss, grads = _loss_and_grads(model, p, b, jax.random.PRNGKey(1))
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    for _ in range(2):
        params, opt_state, loss = step(params, opt_state, sharded)
    assert np.isfinite(float(loss))
    # every leaf remains fully replicated (single logical value)
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.sharding.is_fully_replicated


def test_generate_on_mesh(tiny_config, rng):
    model, params, batch = _setup(tiny_config, rng)
    mesh = make_mesh(MeshSpec(data=8, view=1))
    sharded = shard_batch({k: np.asarray(v) for k, v in batch.items()}, mesh)
    params = replicate(params, mesh)
    out = jax.jit(
        lambda p, k: model.generate(p, k, sharded["cond"],
                                    sharded["view_count"], sharded["angle"],
                                    sample_num=4)
    )(params, jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(out.generated_samples)))


def test_batch_sharding_specs():
    mesh = make_mesh(MeshSpec(data=4, view=2))
    s_cond = batch_sharding(mesh, "cond")
    s_target = batch_sharding(mesh, "target")
    assert s_cond.spec == jax.sharding.PartitionSpec("data", "view")
    assert s_target.spec == jax.sharding.PartitionSpec("data")


def test_make_mesh_validates():
    with pytest.raises(ValueError):
        make_mesh(MeshSpec(data=3, view=2))


def test_dpm_samplers_on_mesh_match_single_device(tiny_config, rng):
    """generate_dpm (ODE and SDE) under data-axis sharding reproduces
    the single-device result — the solver introduces no cross-sample
    coupling, so GSPMD must partition it cleanly."""
    from viewfusion_tpu.parallel.mesh import replicate

    model, params, batch = _setup(tiny_config, rng)
    y_init = jnp.asarray(
        rng.standard_normal((8, 8, 8, 3)).astype(np.float32)
    )
    key = jax.random.PRNGKey(7)

    for sde in (False, True):
        ref = jax.jit(
            lambda p, k: model.generate_dpm(
                p, k, batch["cond"], batch["view_count"], batch["angle"],
                num_steps=4, y_t=y_init, sde=sde)
        )(params, key)

        mesh = make_mesh(MeshSpec(data=4, view=2))
        sharded = shard_batch(
            {k: np.asarray(v) for k, v in batch.items()}, mesh
        )
        params_r = replicate(params, mesh)
        out = jax.jit(
            lambda p, k: model.generate_dpm(
                p, k, sharded["cond"], sharded["view_count"],
                sharded["angle"], num_steps=4, y_t=y_init, sde=sde)
        )(params_r, key)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)
