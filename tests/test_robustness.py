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
