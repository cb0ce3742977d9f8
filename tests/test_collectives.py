"""Collective helper tests on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from viewfusion_tpu.parallel.collectives import (
    all_gather,
    gather_all,
    get_rank,
    get_world_size,
    psum_dict,
    reduce_dict,
)
from viewfusion_tpu.parallel.mesh import MeshSpec, make_mesh


def test_rank_world():
    assert get_rank() == 0
    assert get_world_size() == 1


def test_reduce_dict_on_sharded_array():
    mesh = make_mesh(MeshSpec(data=8, view=1))
    x = np.arange(16, dtype=np.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = reduce_dict({"m": xs, "s": xs}, average=True)
    np.testing.assert_allclose(float(out["m"]), x.mean())
    out2 = reduce_dict({"m": xs}, average=False)
    np.testing.assert_allclose(float(out2["m"]), x.sum())


def test_gather_all_shards():
    mesh = make_mesh(MeshSpec(data=8, view=1))
    x = np.arange(16, dtype=np.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    parts = gather_all(xs)
    assert len(parts) == 8
    np.testing.assert_allclose(
        np.concatenate([np.asarray(p) for p in parts]), x
    )


def test_psum_dict_inside_shard_map():
    mesh = make_mesh(MeshSpec(data=8, view=1))
    x = np.arange(8, dtype=np.float32)

    @jax.jit
    def f(x):
        def inner(xs):
            local = {"v": jnp.sum(xs)}
            return psum_dict(local, "data", average=True)["v"]

        return shard_map(
            inner, mesh=mesh, in_specs=P("data"), out_specs=P()
        )(x)

    np.testing.assert_allclose(float(f(x)), x.sum() / 8)


def test_all_gather_inside_shard_map():
    mesh = make_mesh(MeshSpec(data=8, view=1))
    x = np.arange(8, dtype=np.float32)

    @jax.jit
    def f(x):
        def inner(xs):
            return all_gather(xs, "data").reshape(-1)

        return shard_map(
            inner, mesh=mesh, in_specs=P("data"), out_specs=P(None),
            check_rep=False,
        )(x)

    np.testing.assert_allclose(np.asarray(f(x)), x)


def test_gather_all_non_leading_axis_sharding():
    """gather_all must return the ACTUAL per-device shards, not assume
    contiguous leading-axis slices: shard along axis 1 and check each
    returned piece is the true device-local block."""
    mesh = make_mesh(MeshSpec(data=4, view=2))
    x = np.arange(4 * 8, dtype=np.float32).reshape(4, 8)
    xs = jax.device_put(x, NamedSharding(mesh, P("view", "data")))
    parts = gather_all(xs)
    assert len(parts) == 8
    assert all(p.shape == (2, 2) for p in parts)
    # every element appears exactly once across the shards
    flat = np.sort(np.concatenate([np.asarray(p).ravel() for p in parts]))
    np.testing.assert_allclose(flat, np.arange(32, dtype=np.float32))


def test_gather_all_replicated_and_unsharded():
    mesh = make_mesh(MeshSpec(data=8, view=1))
    x = np.arange(4, dtype=np.float32)
    xr = jax.device_put(x, NamedSharding(mesh, P()))  # replicated
    parts = gather_all(xr)
    assert len(parts) == 8
    for p in parts:
        np.testing.assert_allclose(np.asarray(p), x)
    assert len(gather_all(jnp.asarray(x))) == 1  # single device
