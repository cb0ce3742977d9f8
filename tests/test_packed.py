"""Packed training path must be numerically identical to the dense
masked path given the same rng/view counts."""

import jax
import jax.numpy as jnp
import numpy as np

from viewfusion_tpu.models.view_fusion import ViewFusion
from viewfusion_tpu.training.trainer import Experiment


def _packed_indices(view_count):
    sample_idx = np.repeat(np.arange(len(view_count)), view_count)
    view_idx = np.concatenate([np.arange(v) for v in view_count])
    return sample_idx.astype(np.int32), view_idx.astype(np.int32)


def test_packed_loss_equals_dense(tiny_config, rng):
    model = ViewFusion.from_config(tiny_config)
    b, n, hw = 4, 3, 8
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(
        np.float32))
    vc = np.array([1, 3, 2, 3])
    angle = jnp.asarray(rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    key = jax.random.PRNGKey(11)

    dense = model.loss(params, key, y0, cond, jnp.asarray(vc), angle)
    si, vi = _packed_indices(vc)
    packed = model.loss_packed(params, key, y0, cond, jnp.asarray(vc),
                               angle, jnp.asarray(si), jnp.asarray(vi))
    np.testing.assert_allclose(float(dense), float(packed), rtol=1e-5)

    # gradients must match too
    g_dense = jax.grad(
        lambda p: model.loss(p, key, y0, cond, jnp.asarray(vc), angle)
    )(params)
    g_packed = jax.grad(
        lambda p: model.loss_packed(p, key, y0, cond, jnp.asarray(vc),
                                    angle, jnp.asarray(si),
                                    jnp.asarray(vi))
    )(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_dense),
                     jax.tree_util.tree_leaves(g_packed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_stratified_multiset_work_matched():
    """sum(counts) matches the reference's expected per-step row count
    b*(max_views+1)/2 (experiment.py:277-279) to within 0.5 rows."""
    from viewfusion_tpu.training.trainer import stratified_count_multiset

    for b, n in [(28, 6), (8, 6), (12, 6), (7, 6), (28, 4), (5, 3),
                 (112, 6), (1, 6), (9, 6)]:
        c = stratified_count_multiset(b, n)
        assert len(c) == b and c.min() >= 1 and c.max() <= n
        assert abs(int(c.sum()) - b * (n + 1) / 2) <= 0.5
        if (b % n) % 2 == 0:  # even remainder pairs exactly
            assert int(c.sum()) * 2 == b * (n + 1)


def test_stratified_counts_static_sum():
    class FakeExp:
        max_views = 6
        rng = np.random.default_rng(0)

    sums = set()
    for _ in range(10):
        counts = Experiment._sample_view_count_stratified(FakeExp, 12)
        assert counts.min() >= 1 and counts.max() <= 6
        sums.add(int(counts.sum()))
    assert len(sums) == 1  # static row budget across steps


def test_packed_mesh_execution(tiny_config, rng):
    """Packed loss under sharding-annotated jit on the 8-device mesh."""
    from viewfusion_tpu.parallel.mesh import (
        MeshSpec, make_mesh, replicate, shard_batch,
    )

    model = ViewFusion.from_config(tiny_config)
    b, n, hw = 8, 4, 8
    y0 = rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32)
    cond = rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(np.float32)
    vc = np.resize(np.arange(1, 5), b)
    si, vi = _packed_indices(vc)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(cond),
                        jnp.asarray(y0))

    mesh = make_mesh(MeshSpec(data=8, view=1))
    batch = shard_batch(
        {"target": y0, "cond": cond, "view_count": vc.astype(np.int32),
         "angle": np.zeros(b, np.float32), "sample_idx": si,
         "view_idx": vi},
        mesh,
    )
    params_r = replicate(params, mesh)
    loss = jax.jit(
        lambda p, bt: model.loss_packed(
            p, jax.random.PRNGKey(1), bt["target"], bt["cond"],
            bt["view_count"], bt["angle"], bt["sample_idx"],
            bt["view_idx"],
        )
    )(params_r, batch)
    assert np.isfinite(float(loss))


def test_packed_generate_matches_dense(tiny_config, rng):
    """Packed per-step UNet rows must not change sampling results."""
    model = ViewFusion.from_config(tiny_config)
    b, n, hw = 3, 3, 8
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(
        np.float32))
    vc = np.array([1, 3, 2])
    angle = jnp.asarray(rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    si, vi = _packed_indices(vc)
    key = jax.random.PRNGKey(5)

    dense = model.generate(params, key, cond, jnp.asarray(vc), angle,
                           sample_num=4)
    packed = model.generate(params, key, cond, jnp.asarray(vc), angle,
                            sample_num=4,
                            packed_idx=(jnp.asarray(si), jnp.asarray(vi)))
    np.testing.assert_allclose(np.asarray(dense.y_t),
                               np.asarray(packed.y_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dense.weight_arr),
                               np.asarray(packed.weight_arr), atol=1e-5)

    d_ddim = model.generate_ddim(params, key, cond, jnp.asarray(vc),
                                 angle, num_steps=4)
    p_ddim = model.generate_ddim(params, key, cond, jnp.asarray(vc),
                                 angle, num_steps=4,
                                 packed_idx=(jnp.asarray(si),
                                             jnp.asarray(vi)))
    np.testing.assert_allclose(np.asarray(d_ddim), np.asarray(p_ddim),
                               atol=1e-5)


def test_packed_mesh_data_x_view(tiny_config, rng):
    """Packed train step on a data=4 x view=2 mesh — the SHIPPED
    configuration (tpu.packed_views with mesh_view > 1).  The packed
    gather (view_fusion.py _denoise_views) reads (data, view)-sharded
    cond with replicated index vectors; this pins that XLA's resharding
    of that program is numerically exact vs the unsharded dense loss,
    gradients included."""
    import optax

    from viewfusion_tpu.parallel.mesh import (
        MeshSpec, make_mesh, replicate, shard_batch,
    )
    from viewfusion_tpu.training.trainer import stratified_count_multiset

    model = ViewFusion.from_config(tiny_config)
    b, n, hw = 8, 4, 8
    y0 = rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32)
    cond = rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(np.float32)
    vc = stratified_count_multiset(b, n)
    si, vi = _packed_indices(vc)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(cond),
                        jnp.asarray(y0))
    tx = optax.adam(1e-3)
    key = jax.random.PRNGKey(3)

    def step(p, opt, bt):
        def loss_fn(q):
            return model.loss_packed(
                q, key, bt["target"], bt["cond"], bt["view_count"],
                bt["angle"], bt["sample_idx"], bt["view_idx"],
            )

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt = tx.update(grads, opt, p)
        return optax.apply_updates(p, updates), opt, loss, grads

    # single-device dense reference
    ref_loss = model.loss(
        params, key, jnp.asarray(y0), jnp.asarray(cond),
        jnp.asarray(vc.astype(np.int32)),
        jnp.zeros(b, jnp.float32),
    )

    mesh = make_mesh(MeshSpec(data=4, view=2))
    batch = shard_batch(
        {"target": y0, "cond": cond,
         "view_count": vc.astype(np.int32),
         "angle": np.zeros(b, np.float32),
         "sample_idx": si, "view_idx": vi},
        mesh,
    )
    params_r = replicate(params, mesh)
    opt_r = replicate(tx.init(params), mesh)
    p2, _, loss, grads = jax.jit(step)(params_r, opt_r, batch)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)

    # gradients on the mesh == single-device packed gradients
    g_ref = jax.grad(
        lambda p: model.loss_packed(
            p, key, jnp.asarray(y0), jnp.asarray(cond),
            jnp.asarray(vc.astype(np.int32)), jnp.zeros(b, jnp.float32),
            jnp.asarray(si), jnp.asarray(vi),
        )
    )(params)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_ref),
                     jax.tree_util.tree_leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_device_feed_salt_alignment(tmp_path):
    """The packed path preps batches on a feeder thread
    (trainer._device_feed); the stratified count salt must track
    self.it exactly — fresh start salts are 1..max_it and a resume
    continues at it+1 (an off-by-one would silently train on different
    counts than the checkpoint label claims)."""
    import copy
    import os

    import yaml

    from tests.conftest import TINY_CONFIG
    from viewfusion_tpu.data.synthetic import make_synthetic_shards
    from viewfusion_tpu.training.trainer import ExperimentArgs

    data_dir = str(tmp_path / "data")
    make_synthetic_shards(data_dir, "train", num_objects=8, image_size=8)
    make_synthetic_shards(data_dir, "test", num_objects=8, image_size=8)
    raw = copy.deepcopy(TINY_CONFIG)
    for split in ("train", "test"):
        raw["data"]["params"][split]["params"]["path"] = data_dir
    raw["data"]["params"]["test"]["params"]["size"] = 8
    raw["data"]["params"]["batch_size"] = 4
    raw["model"]["max_it"] = 4
    raw["model"]["checkpoint_every"] = 2
    raw["model"]["validate_every"] = 0
    raw.setdefault("tpu", {})["packed_views"] = True
    raw["tpu"]["native_loader"] = False
    config_path = str(tmp_path / "packed.yaml")
    with open(config_path, "w") as f:
        yaml.dump(raw, f)

    salts = []
    orig = Experiment._global_packed_counts

    def spy(self, salt, **kw):
        salts.append(salt)
        return orig(self, salt, **kw)

    Experiment._global_packed_counts = spy
    try:
        exp = Experiment(ExperimentArgs(config=config_path, train=True),
                         log_root=str(tmp_path / "logs"))
        exp.train()
        assert exp.it == 4
        # fresh start: it goes -1 -> 0 on the first step (reference
        # counts from 0); feeder may prep a couple past max_it
        assert salts[:5] == [0, 1, 2, 3, 4], salts[:7]
        with open(os.path.join(exp.out_dir, "metrics.jsonl")) as f:
            assert any("loss" in line for line in f)

        salts.clear()
        # resume reads the RUN DIR's config.yaml (reference --src
        # precedence, experiment.py:34-41) — extend max_it there
        raw["model"]["max_it"] = 7
        with open(os.path.join(exp.out_dir, "config.yaml"), "w") as f:
            yaml.dump(raw, f)
        exp2 = Experiment(
            ExperimentArgs(config=config_path, train=True, resume=True,
                           src=exp.out_dir),
            log_root=str(tmp_path / "logs2"),
        )
        assert exp2.it == 4
        exp2.train()
        assert exp2.it == 7
        assert salts[:3] == [5, 6, 7], salts[:5]
    finally:
        Experiment._global_packed_counts = orig


def test_packed_loss_equals_dense_relative_mode(tiny_config, rng):
    """Packed gather is channel-count agnostic: the relative variant
    (6-channel cond -> in_channel 9, reference
    configs/relative-small-v100-4.yaml:22) must match dense too."""
    import dataclasses

    cfg = dataclasses.replace(
        tiny_config, unet=dataclasses.replace(tiny_config.unet,
                                              in_channel=9),
    )
    model = ViewFusion.from_config(cfg)
    b, n, hw = 4, 3, 8
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(
        rng.uniform(0, 1, (b, n, hw, hw, 6)).astype(np.float32)
    )
    vc = np.array([2, 3, 1, 3])
    angle = jnp.asarray(rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    key = jax.random.PRNGKey(11)

    dense = model.loss(params, key, y0, cond, jnp.asarray(vc), angle)
    si, vi = _packed_indices(vc)
    packed = model.loss_packed(params, key, y0, cond, jnp.asarray(vc),
                               angle, jnp.asarray(si), jnp.asarray(vi))
    np.testing.assert_allclose(float(dense), float(packed), rtol=1e-5)


def test_pack_barrier_identical(tiny_config, rng, monkeypatch):
    """VF_PACK_BARRIER=1 (optimization_barrier on the packed UNet input,
    an XLA fusion hint) must leave loss AND gradients bit-meaningfully
    identical — the barrier is semantically the identity."""
    model = ViewFusion.from_config(tiny_config)
    b, n, hw = 4, 3, 8
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(
        np.float32))
    vc = np.array([1, 3, 2, 3])
    angle = jnp.asarray(rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    key = jax.random.PRNGKey(11)
    si, vi = _packed_indices(vc)

    def run():
        loss, grads = jax.value_and_grad(
            lambda p: model.loss_packed(p, key, y0, cond, jnp.asarray(vc),
                                        angle, jnp.asarray(si),
                                        jnp.asarray(vi))
        )(params)
        return float(loss), grads

    monkeypatch.delenv("VF_PACK_BARRIER", raising=False)
    loss_off, g_off = run()
    monkeypatch.setenv("VF_PACK_BARRIER", "1")
    loss_on, g_on = run()
    np.testing.assert_allclose(loss_on, loss_off, rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_off),
                     jax.tree_util.tree_leaves(g_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-7)
