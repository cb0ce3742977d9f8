"""EMA (tpu.ema_decay) tests: shadow update math, inference selection,
checkpoint round-trip including legacy checkpoints without the field."""

import copy

import jax
import numpy as np
import pytest
import yaml

from tests.conftest import TINY_CONFIG
from viewfusion_tpu.data.synthetic import make_synthetic_shards
from viewfusion_tpu.training.trainer import Experiment, ExperimentArgs


@pytest.fixture
def ema_run(tmp_path):
    data_dir = str(tmp_path / "data")
    make_synthetic_shards(data_dir, "train", num_objects=4, image_size=8)
    make_synthetic_shards(data_dir, "test", num_objects=4, image_size=8)
    raw = copy.deepcopy(TINY_CONFIG)
    for split in ("train", "test"):
        raw["data"]["params"][split]["params"]["path"] = data_dir
    raw["data"]["params"]["batch_size"] = 4
    raw["data"]["params"]["test"]["params"]["size"] = 4
    raw["model"]["max_it"] = 6
    raw["model"]["checkpoint_every"] = 3
    raw["model"]["validate_every"] = 0
    raw["tpu"]["ema_decay"] = 0.9
    cfg_path = str(tmp_path / "c.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(raw, f)
    return tmp_path, cfg_path


def test_ema_tracks_and_lags_params(ema_run):
    tmp_path, cfg_path = ema_run
    exp = Experiment(ExperimentArgs(config=cfg_path, train=True),
                     log_root=str(tmp_path / "logs"))
    p0 = jax.tree_util.tree_leaves(exp.state.params)[0].copy()
    exp.train()
    params = jax.tree_util.tree_leaves(exp.state.params)
    ema = jax.tree_util.tree_leaves(exp.state.ema_params)
    assert len(params) == len(ema)
    # EMA must have moved from init but lag behind the live params
    moved = sum(
        float(np.abs(np.asarray(e)).sum()) for e in ema
    )
    assert moved > 0
    diffs = [np.abs(np.asarray(p) - np.asarray(e)).max()
             for p, e in zip(params, ema)]
    assert max(diffs) > 0  # they differ (EMA lags)

    # inference uses the EMA weights
    assert exp._infer_params is exp.state.ema_params

    # round-trip through the checkpoint
    exp2 = Experiment(
        ExperimentArgs(src=exp.out_dir, train=True, resume=True),
        log_root=str(tmp_path / "logs"),
    )
    for a, b in zip(jax.tree_util.tree_leaves(exp.state.ema_params),
                    jax.tree_util.tree_leaves(exp2.state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_legacy_checkpoint_without_ema_loads(ema_run):
    """Checkpoints written before the EMA field restore with a fresh
    shadow instead of crashing."""
    tmp_path, cfg_path = ema_run
    exp = Experiment(ExperimentArgs(config=cfg_path, train=True),
                     log_root=str(tmp_path / "logs2"))
    legacy = {
        "params": exp.state.params,
        "opt_state": exp.state.opt_state,
        "step": exp.state.step,
    }
    exp.checkpoint.save("model.msgpack", legacy, it=5)
    exp2 = Experiment(
        ExperimentArgs(src=exp.out_dir, train=True, resume=True),
        log_root=str(tmp_path / "logs2"),
    )
    assert exp2.it == 5
    assert jax.tree_util.tree_leaves(exp2.state.ema_params)  # fresh shadow


def test_ema_disabled_keeps_empty_shadow(tmp_path):
    raw = copy.deepcopy(TINY_CONFIG)
    data_dir = str(tmp_path / "data")
    make_synthetic_shards(data_dir, "train", num_objects=4, image_size=8)
    make_synthetic_shards(data_dir, "test", num_objects=4, image_size=8)
    for split in ("train", "test"):
        raw["data"]["params"][split]["params"]["path"] = data_dir
    raw["data"]["params"]["batch_size"] = 4
    raw["model"]["max_it"] = 2
    raw["model"]["validate_every"] = 0
    cfg_path = str(tmp_path / "c.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(raw, f)
    exp = Experiment(ExperimentArgs(config=cfg_path, train=True),
                     log_root=str(tmp_path / "logs"))
    exp.train()
    assert exp.state.ema_params == {}
    assert exp._infer_params is exp.state.params
