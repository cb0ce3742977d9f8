"""End-to-end integration: train on the synthetic micro-dataset, eval,
checkpoint round-trip, resume, inference modes (SURVEY.md §4/§7 item 5:
the minimum end-to-end slice)."""

import copy
import json
import os

import numpy as np
import pytest
import yaml

from tests.conftest import TINY_CONFIG
from viewfusion_tpu.data.synthetic import make_synthetic_shards
from viewfusion_tpu.training.trainer import Experiment, ExperimentArgs


@pytest.fixture
def tiny_run(tmp_path):
    data_dir = str(tmp_path / "data")
    make_synthetic_shards(data_dir, "train", num_objects=8, image_size=8)
    make_synthetic_shards(data_dir, "test", num_objects=8, image_size=8)

    raw = copy.deepcopy(TINY_CONFIG)
    for split in ("train", "test"):
        raw["data"]["params"][split]["params"]["path"] = data_dir
    raw["data"]["params"]["test"]["params"]["size"] = 8
    raw["data"]["params"]["batch_size"] = 4
    raw["model"]["max_it"] = 12
    raw["model"]["checkpoint_every"] = 5
    raw["model"]["log_every"] = 4
    raw["model"]["validate_every"] = 0
    config_path = str(tmp_path / "tiny.yaml")
    with open(config_path, "w") as f:
        yaml.dump(raw, f)
    return tmp_path, config_path, raw


def test_train_eval_checkpoint_resume(tiny_run):
    tmp_path, config_path, raw = tiny_run
    log_root = str(tmp_path / "logs")

    args = ExperimentArgs(config=config_path, train=True)
    exp = Experiment(args, log_root=log_root)
    exp.train()

    assert exp.it == 12
    out_dir = exp.out_dir
    assert os.path.exists(os.path.join(out_dir, "model.msgpack"))
    assert os.path.exists(os.path.join(out_dir, "config.yaml"))
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f]
    assert any("loss" in r for r in records)
    losses = [r["loss"] for r in records if "loss" in r]
    assert all(np.isfinite(l) for l in losses)

    # eval runs full generation + metrics and saves best checkpoints
    exp.args.train = True
    exp.eval()
    assert "ssim" in exp.log_dict and "psnr" in exp.log_dict
    assert -1.0 <= exp.log_dict["ssim"] <= 1.0
    assert os.path.exists(os.path.join(out_dir, "best_model_all.msgpack"))

    # resume restores the iteration counter (experiment.py:147-156)
    args2 = ExperimentArgs(src=out_dir, train=True, resume=True)
    exp2 = Experiment(args2, log_root=log_root)
    assert exp2.it >= 10  # last rolling checkpoint

    # the best checkpoint's scalar sidecar carries the eval metrics
    _, extra = exp2.checkpoint.load("best_model_all.msgpack", exp2.state)
    assert extra["ssim"] == pytest.approx(exp.best_metrics["ssim"])
    assert extra["psnr"] == pytest.approx(exp.best_metrics["psnr"])


def test_train_loss_decreases(tiny_run):
    """Loss on the synthetic dataset must trend down within 60 steps."""
    tmp_path, config_path, raw = tiny_run
    raw = copy.deepcopy(raw)
    raw["model"]["max_it"] = 60
    raw["model"]["log_every"] = 10
    raw["model"]["checkpoint_every"] = 0
    raw["lr_warmup"] = 10
    config_path2 = str(tmp_path / "tiny2.yaml")
    with open(config_path2, "w") as f:
        yaml.dump(raw, f)
    exp = Experiment(ExperimentArgs(config=config_path2, train=True),
                     log_root=str(tmp_path / "logs2"))
    exp.train()
    with open(os.path.join(exp.out_dir, "metrics.jsonl")) as f:
        losses = [json.loads(l)["loss"] for l in f if "loss" in l]
    assert len(losses) >= 4
    assert np.mean(losses[-2:]) < np.mean(losses[:2])


def test_inference_modes(tiny_run):
    """Extrapolate / autoregressive / gif modes produce artifacts
    (experiment.py:458-466)."""
    tmp_path, config_path, raw = tiny_run
    log_root = str(tmp_path / "logs3")
    exp = Experiment(ExperimentArgs(config=config_path, train=True),
                     log_root=log_root)
    # pretend training finished; exercise vis grid
    exp.args.train = True
    exp.inference()
    outs = os.listdir(exp.out_dir)
    assert any(f.startswith("output-") and f.endswith(".png") for f in outs)

    exp.args.train = False
    exp.args.inference = True
    exp.args.extrapolate = True
    exp.args.autoregressive = True
    exp.args.generate_gifs = True
    exp.inference()
    outs = os.listdir(exp.out_dir)
    assert any(f.startswith("extrapolate-") for f in outs)
    assert any(f.startswith("autoregressive_single-") for f in outs)
    assert any(f.startswith("autoregressive_animated-") and
               f.endswith(".gif") for f in outs)
    assert any(f.startswith("weights_animated-") and f.endswith(".gif")
               for f in outs)


def test_eval_dump_images(tiny_run):
    """tpu.eval_dump_images writes generated/target folders consumable by
    the offline metric CLI."""
    tmp_path, config_path, raw = tiny_run
    raw = copy.deepcopy(raw)
    raw["model"]["max_it"] = 2
    raw["tpu"]["eval_dump_images"] = True
    cfg2 = str(tmp_path / "dump.yaml")
    with open(cfg2, "w") as f:
        yaml.dump(raw, f)
    exp = Experiment(ExperimentArgs(config=cfg2, train=True),
                     log_root=str(tmp_path / "logs4"))
    exp.train()
    exp.eval()
    root = os.path.join(exp.out_dir, f"images-{exp.it}")
    gen = sorted(os.listdir(os.path.join(root, "generated")))
    tgt = sorted(os.listdir(os.path.join(root, "target")))
    assert gen == tgt and len(gen) == 8  # test.size samples

    from viewfusion_tpu.utils.compute_metrics import compute_folder_metrics

    m = compute_folder_metrics(os.path.join(root, "generated"),
                               os.path.join(root, "target"))
    assert m["count"] == 8 and np.isfinite(m["psnr"])


def test_relative_conditioning_mode(tiny_run):
    """Relative variant: 9-channel cond (reference view tiled), relative
    angles (reference: data/nmr_dataset.py:31-40, experiment.py:151,
    271-284)."""
    tmp_path, config_path, raw = tiny_run
    raw = copy.deepcopy(raw)
    raw["model"]["relative"] = True
    raw["model"]["denoise_net_params"]["in_channel"] = 9
    raw["model"]["max_it"] = 4
    cfg2 = str(tmp_path / "rel.yaml")
    with open(cfg2, "w") as f:
        yaml.dump(raw, f)
    exp = Experiment(ExperimentArgs(config=cfg2, train=True),
                     log_root=str(tmp_path / "logs_rel"))
    assert exp.cond_key == "relative_cond"
    assert exp.angle_key == "relative_angle"
    exp.train()
    exp.eval()
    assert np.isfinite(exp.log_dict["psnr"])
    # vis grid renders the view part (last 3 channels) of relative cond
    exp.args.train = True
    exp.inference()
    assert any(f.startswith("output-") for f in os.listdir(exp.out_dir))
