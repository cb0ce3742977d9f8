"""Robustness regressions from review: prefetch error propagation, mesh
auto-sizing, missing-checkpoint errors."""

import numpy as np
import pytest

from viewfusion_tpu.data.nmr import prefetch


def test_prefetch_propagates_worker_exception():
    def boom():
        yield 1
        raise RuntimeError("decode failed")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="decode failed"):
        list(it)


def test_mesh_autosize_largest_divisor(tiny_config):
    """batch 12 on 8 devices: largest divisor <= 8 is 6 (gcd would
    wrongly pick 4)."""
    import dataclasses

    from viewfusion_tpu.training.trainer import Experiment

    class Fake:
        config = dataclasses.replace(
            tiny_config,
            data=dataclasses.replace(tiny_config.data, batch_size=12),
        )
        is_host0 = True

    mesh = Experiment._make_mesh(Fake())
    assert mesh.shape["data"] == 6
    assert mesh.shape["view"] == 1


def test_eval_missing_checkpoint_raises(tmp_path, tiny_config):
    import yaml

    from viewfusion_tpu.training.trainer import Experiment, ExperimentArgs

    src = tmp_path / "run"
    src.mkdir()
    with open(src / "config.yaml", "w") as f:
        yaml.dump(tiny_config.raw, f)
    with pytest.raises(FileNotFoundError, match="best_model_all"):
        Experiment(ExperimentArgs(src=str(src), eval=True))


def test_sigterm_checkpoints_and_exits(tmp_path, tiny_config):
    """A stop request makes the train loop checkpoint and return
    (preemption safety)."""
    import copy
    import os

    import yaml

    from tests.conftest import TINY_CONFIG
    from viewfusion_tpu.data.synthetic import make_synthetic_shards
    from viewfusion_tpu.training.trainer import Experiment, ExperimentArgs

    data_dir = str(tmp_path / "data")
    make_synthetic_shards(data_dir, "train", num_objects=4, image_size=8)
    make_synthetic_shards(data_dir, "test", num_objects=4, image_size=8)
    raw = copy.deepcopy(TINY_CONFIG)
    for split in ("train", "test"):
        raw["data"]["params"][split]["params"]["path"] = data_dir
    raw["data"]["params"]["batch_size"] = 4
    raw["model"]["validate_every"] = 0
    cfg_path = str(tmp_path / "c.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(raw, f)

    exp = Experiment(ExperimentArgs(config=cfg_path, train=True),
                     log_root=str(tmp_path / "logs"))
    exp._stop_requested = False

    # request stop after 3 completed steps via the checkpoint hook
    orig_prep = exp._prep_batch

    def prep(batch, vc, packed_idx=None):
        if exp.it >= 3:
            exp._stop_requested = True
        return orig_prep(batch, vc, packed_idx)

    exp._prep_batch = prep
    exp.train()
    assert 3 <= exp.it <= 5
    _, extra = exp.checkpoint.load("model.msgpack", exp.state)
    assert extra["it"] == exp.it - 1  # labels last COMPLETED step


def test_crash_flushes_queued_checkpoints(tmp_path, tiny_config):
    """An exception out of the train loop must still land queued async
    saves on disk (the writer is a daemon thread; train()'s finally
    drains it), so resume loses at most checkpoint_every steps."""
    import copy

    import yaml

    from tests.conftest import TINY_CONFIG
    from viewfusion_tpu.data.synthetic import make_synthetic_shards
    from viewfusion_tpu.training.trainer import Experiment, ExperimentArgs

    data_dir = str(tmp_path / "data")
    make_synthetic_shards(data_dir, "train", num_objects=4, image_size=8)
    make_synthetic_shards(data_dir, "test", num_objects=4, image_size=8)
    raw = copy.deepcopy(TINY_CONFIG)
    for split in ("train", "test"):
        raw["data"]["params"][split]["params"]["path"] = data_dir
    raw["data"]["params"]["batch_size"] = 4
    raw["model"]["validate_every"] = 0
    raw["model"]["checkpoint_every"] = 2
    cfg_path = str(tmp_path / "c.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(raw, f)

    exp = Experiment(ExperimentArgs(config=cfg_path, train=True),
                     log_root=str(tmp_path / "logs"))
    orig_prep = exp._prep_batch

    def prep(batch, vc, packed_idx=None):
        if exp.it >= 3:  # after the it=2 rolling save is queued
            raise RuntimeError("simulated data-pipeline crash")
        return orig_prep(batch, vc, packed_idx)

    exp._prep_batch = prep
    with pytest.raises(RuntimeError, match="simulated"):
        exp.train()
    # the it=2 async save must be on disk despite the crash
    _, extra = exp.checkpoint.load("model.msgpack", exp.state)
    assert extra["it"] == 2


def test_packed_dropout_active(rng):
    """loss_packed must apply dropout when configured (review fix)."""
    import copy

    import jax
    import jax.numpy as jnp

    from tests.conftest import TINY_CONFIG
    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion

    raw = copy.deepcopy(TINY_CONFIG)
    raw["model"]["denoise_net_params"]["dropout"] = 0.5
    model = ViewFusion.from_config(Config.from_dict(raw))
    b, n, hw = 2, 3, 8
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(
        np.float32))
    vc = jnp.asarray([2, 3])
    si = jnp.asarray(np.array([0, 0, 1, 1, 1], np.int32))
    vi = jnp.asarray(np.array([0, 1, 0, 1, 2], np.int32))
    angle = jnp.zeros((b,))
    params = model.init(jax.random.PRNGKey(0), cond, y0)

    args = (params, jax.random.PRNGKey(1), y0, cond, vc, angle, si, vi)
    l_det = model.loss_packed(*args, deterministic=True)
    l_drop = model.loss_packed(*args, deterministic=False)
    assert float(l_det) != float(l_drop)


def test_global_packed_counts_deterministic(tiny_config):
    """Every host must derive identical packed indices for the same step
    (multi-host consistency is by deterministic construction)."""
    import dataclasses

    from viewfusion_tpu.training.trainer import Experiment

    class Fake:
        config = tiny_config
        max_views = tiny_config.data.max_views
        local_batch_size = 8
        _packed_indices = staticmethod(Experiment._packed_indices)

    a = Experiment._global_packed_counts(Fake(), salt=42)
    b = Experiment._global_packed_counts(Fake(), salt=42)
    c = Experiment._global_packed_counts(Fake(), salt=43)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    np.testing.assert_array_equal(a[2], b[2])
    assert not np.array_equal(a[0], c[0])  # varies per step
    # static row budget
    assert a[1].shape == c[1].shape
    # indices consistent with counts
    counts = a[0]
    si, vi = a[1], a[2]
    for s in range(len(counts)):
        assert np.sum(si == s) == counts[s]
    assert np.all(vi < tiny_config.data.max_views)


def test_writer_error_surfaces_on_clean_exit():
    """train()'s exit flush must RAISE a writer error when no other
    exception is unwinding (advisor medium, round 2: the old check ran
    inside the except handler where exc_info always saw the flush's own
    error, so failures were always swallowed)."""
    from types import SimpleNamespace

    import pytest

    from viewfusion_tpu.training.trainer import Experiment

    def make_exp(loop):
        exp = object.__new__(Experiment)
        exp.config = SimpleNamespace(train=SimpleNamespace())
        exp.logger = SimpleNamespace(best_metric_summary=lambda: None)
        exp.best_metrics = {}
        exp._train_loop = loop

        class FailingCk:
            def flush(self):
                raise RuntimeError("async checkpoint save failed")

        exp.checkpoint = FailingCk()
        return exp

    # clean loop exit -> the flush failure must propagate
    exp = make_exp(lambda cfg, acc: None)
    with pytest.raises(RuntimeError, match="async checkpoint"):
        exp.train()

    # already unwinding a loop exception -> the ORIGINAL error wins,
    # the flush failure is swallowed
    def crashing_loop(cfg, acc):
        raise ValueError("original crash")

    exp = make_exp(crashing_loop)
    with pytest.raises(ValueError, match="original crash"):
        exp.train()
