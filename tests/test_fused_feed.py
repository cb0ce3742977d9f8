"""Fused device feed (training/fused_feed.py, tpu.fused_feed): one
image buffer + two int32 metadata arrays instead of six device puts,
with numerics identical to the split feed."""

import copy
import json
import os

import numpy as np
import pytest
import yaml

from tests.test_trainer import tiny_run  # noqa: F401 — fixture
from viewfusion_tpu.training.fused_feed import pack_batch, unpack_batch
from viewfusion_tpu.training.trainer import Experiment, ExperimentArgs


def _prepped(dtype, b=4, n=3, hw=8, rows=7):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (b, 1 + n, hw, hw, 3)).astype(dtype)
    return {
        "target": img[:, 0].copy(),
        "cond": img[:, 1:].copy(),
        # negative / tiny / large floats all survive the i32 bitcast
        "angle": np.asarray([-1.5, 0.0, 3.14159, 1e-30], np.float32)[:b],
        "view_count": rng.integers(1, n + 1, (b,)).astype(np.int32),
        "sample_idx": rng.integers(0, b, (rows,)).astype(np.int32),
        "view_idx": rng.integers(0, n, (rows,)).astype(np.int32),
    }


@pytest.mark.parametrize("dtype", [np.uint8, np.float32])
def test_pack_unpack_roundtrip(dtype):
    prepped = _prepped(dtype)
    fused = pack_batch(prepped)
    assert set(fused) == {"img", "meta_b", "meta_r"}
    assert fused["img"].dtype == dtype
    out = unpack_batch(fused)
    for k in ("target", "cond", "view_count", "sample_idx", "view_idx"):
        np.testing.assert_array_equal(np.asarray(out[k]), prepped[k], err_msg=k)
    # same-size f32<->i32 bitcasts are exact, bit for bit
    np.testing.assert_array_equal(np.asarray(out["angle"]), prepped["angle"])


def test_pack_rejects_relative_channels():
    prepped = _prepped(np.float32)
    prepped["cond"] = np.concatenate([prepped["cond"]] * 2, axis=-1)  # 6ch
    with pytest.raises(ValueError, match="absolute"):
        pack_batch(prepped)


def test_fused_feed_requires_packed(tiny_run):  # noqa: F811
    tmp_path, config_path, raw = tiny_run
    cfg = copy.deepcopy(raw)
    cfg.setdefault("tpu", {})["fused_feed"] = True
    cfg["tpu"]["packed_views"] = False
    path = str(tmp_path / "fused_bad.yaml")
    with open(path, "w") as f:
        yaml.dump(cfg, f)
    with pytest.raises(ValueError, match="fused_feed"):
        Experiment(ExperimentArgs(config=path, train=True),
                   log_root=str(tmp_path / "logs_bad"))


def test_fused_feed_loss_trajectory_matches(tiny_run):  # noqa: F811
    """Fused vs split feed: identical packed train trajectory (same
    caveat as the u8-feed test — XLA may fuse the unpack slices into
    consumers with different intermediate rounding, so ulp-level rtol
    rather than bitwise equality).  native_loader off so both runs see
    identical shuffle-buffer contents."""
    tmp_path, config_path, raw = tiny_run

    def run(fused, tag):
        cfg = copy.deepcopy(raw)
        cfg["model"]["max_it"] = 6
        cfg["model"]["log_every"] = 1
        cfg["model"]["checkpoint_every"] = 0
        tpu = cfg.setdefault("tpu", {})
        tpu.update(packed_views=True, fused_feed=fused,
                   native_loader=False)
        path = str(tmp_path / f"fused_{tag}.yaml")
        with open(path, "w") as f:
            yaml.dump(cfg, f)
        exp = Experiment(ExperimentArgs(config=path, train=True),
                         log_root=str(tmp_path / f"logs_fused_{tag}"))
        exp.train()
        with open(os.path.join(exp.out_dir, "metrics.jsonl")) as f:
            return [json.loads(l)["loss"] for l in f if "loss" in l]

    on, off = run(True, "on"), run(False, "off")
    assert len(on) == len(off) > 0
    np.testing.assert_allclose(on, off, rtol=2e-6)


def test_fused_batch_on_mesh():
    """Fused keys carry the documented shardings through
    make_global_batch on a data x view mesh and the packed loss runs on
    the resulting global arrays (mirrors test_packed_mesh_execution)."""
    import jax
    import jax.numpy as jnp

    from tests.conftest import TINY_CONFIG
    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion
    from viewfusion_tpu.parallel.mesh import (
        MeshSpec, make_global_batch, make_mesh, replicate,
    )
    from viewfusion_tpu.training.trainer import Experiment

    model = ViewFusion.from_config(Config.from_dict(TINY_CONFIG))
    rng = np.random.default_rng(3)
    b, n, hw = 8, 4, 8
    prepped = {
        "target": rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32),
        "cond": rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(np.float32),
        "angle": rng.uniform(0, 6.28, (b,)).astype(np.float32),
        "view_count": np.resize(np.arange(1, 5), b).astype(np.int32),
    }
    si, vi = Experiment._packed_indices(prepped["view_count"])
    prepped["sample_idx"], prepped["view_idx"] = si, vi
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(prepped["cond"]),
                        jnp.asarray(prepped["target"]))

    mesh = make_mesh(MeshSpec(data=4, view=2))
    batch = make_global_batch(pack_batch(prepped), mesh)
    assert set(batch) == {"img", "meta_b", "meta_r"}

    def step(p, bt):
        u = unpack_batch(bt)
        return model.loss_packed(
            p, jax.random.PRNGKey(1), u["target"], u["cond"],
            u["view_count"], u["angle"], u["sample_idx"], u["view_idx"],
        )

    loss = jax.jit(step)(replicate(params, mesh), batch)
    assert np.isfinite(float(loss))
