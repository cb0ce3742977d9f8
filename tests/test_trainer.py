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


def test_eval_train_split_logs_both_curves(tiny_run):
    """tpu.eval_train_split runs a second metric pass over the TRAIN
    shards (test-time sample semantics) at every gated eval and logs
    ssim_train/psnr_train beside the test metrics — the overfitting
    diagnostic.  Best-model policy must still key on test metrics."""
    tmp_path, config_path, raw = tiny_run
    raw = copy.deepcopy(raw)
    raw["model"]["max_it"] = 6
    raw["model"]["validate_from"] = 3
    raw["model"]["validate_every"] = 3
    raw.setdefault("tpu", {})["eval_train_split"] = True
    cfg_path = str(tmp_path / "split.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(raw, f)
    exp = Experiment(ExperimentArgs(config=cfg_path, train=True),
                     log_root=str(tmp_path / "logs2"))
    assert exp.train_eval_loader is not None
    exp.train()
    with open(os.path.join(exp.out_dir, "metrics.jsonl")) as f:
        evals = [json.loads(l) for l in f if "psnr" in l]
    evals = [r for r in evals if "psnr" in r]
    assert [r["it"] for r in evals] == [3, 6]
    for r in evals:
        assert {"ssim", "psnr", "ssim_train", "psnr_train"} <= set(r)
        assert np.isfinite(r["ssim_train"]) and np.isfinite(r["psnr_train"])
    # best-metric state tracks the TEST curve
    assert exp.best_metrics["ssim"] == pytest.approx(
        max(r["ssim"] for r in evals)
    )


def test_stream_process_mode_disables_train_leak(tmp_path):
    """NMRStream(process_mode="test") reads train-named shards but
    applies test-time sample semantics: the 10% target-into-cond leak
    must never fire (P(no leak in 120 train-mode draws) ~ 3e-6)."""
    from viewfusion_tpu.data.nmr import NMRStream

    make_synthetic_shards(str(tmp_path), "train", num_objects=8,
                          image_size=8)
    stream = NMRStream([str(tmp_path / "NMR-train-00.tar")], "train",
                       shuffle_buffer=0, seed=11, native=False,
                       process_mode="test")
    it = iter(stream)
    for _ in range(120):
        s = next(it)
        leaks = [v for v in range(s["cond"].shape[0])
                 if np.allclose(s["cond"][v], s["target"])]
        assert not leaks


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


def test_extrapolate_count_bounds():
    """Extrapolate view counts are U{max_views+1 .. 23}: same support as
    the reference torch.randint(max_views+1, 24) (experiment.py:477) —
    23 == all stored cond views (the 24 NMR views minus the target)."""
    exp = Experiment.__new__(Experiment)
    exp.rng = np.random.default_rng(0)
    exp.max_views = 6
    counts = exp._sample_extrapolate_counts(20_000, total=23)
    assert counts.min() == 7
    assert counts.max() == 23
    # roughly uniform over the 17 values
    hist = np.bincount(counts, minlength=24)[7:24]
    assert (hist > 0).all()
    assert hist.max() / hist.min() < 1.35


def test_wandb_summary_best_metric_precedence(tmp_path, tiny_config):
    """With wandb enabled, run-summary max metrics overwrite the
    checkpoint-sidecar best_metrics on resume (experiment.py:226-232);
    without wandb the sidecar values stand."""
    from viewfusion_tpu.training.logging import MetricLogger

    logger = MetricLogger(str(tmp_path))
    assert logger.best_metric_summary() is None  # wandb off

    class _Run:
        summary = {"ssim": {"max": 0.77}, "psnr": None}

    class _W:
        run = _Run()

    logger.wandb = _W()
    assert logger.best_metric_summary() == {
        "ssim": 0.77, "psnr": float("-inf")
    }

    # trainer precedence: train() applies the summary over the sidecar
    exp = Experiment.__new__(Experiment)
    exp.config = tiny_config
    exp.logger = logger
    exp.best_metrics = {"ssim": 0.1, "psnr": 11.0}
    exp._train_loop = lambda cfg, acc: None
    exp.train()
    assert exp.best_metrics["ssim"] == 0.77
    assert exp.best_metrics["psnr"] == float("-inf")

    logger.wandb = None  # wandb off: sidecar untouched
    exp.best_metrics = {"ssim": 0.1, "psnr": 11.0}
    exp.train()
    assert exp.best_metrics == {"ssim": 0.1, "psnr": 11.0}


def test_exact_epoch_eval_counts_each_sample_once(tiny_run):
    """tpu.eval_exact_epoch drains the test shards exactly once: with 8
    test samples and batch 3 the final batch is padded+masked and the
    weighted metric count is exactly 8 (VERDICT r1: the resampled default
    cannot guarantee per-sample uniqueness)."""
    tmp_path, config_path, raw = tiny_run
    raw = copy.deepcopy(raw)
    raw["data"]["params"]["batch_size"] = 3
    raw["model"]["max_it"] = 1
    raw["tpu"]["eval_exact_epoch"] = True
    cfg2 = str(tmp_path / "tiny-exact.yaml")
    with open(cfg2, "w") as f:
        yaml.dump(raw, f)
    exp = Experiment(ExperimentArgs(config=cfg2, train=True),
                     log_root=str(tmp_path / "logs-exact"))
    exp.eval()
    assert exp.last_eval_count == 8.0
    assert np.isfinite(exp.log_dict["psnr"])


def test_batcher_pad_final():
    from viewfusion_tpu.data.nmr import Batcher

    samples = [
        {"target": np.full((2, 2, 3), i, np.float32), "scene_hash": str(i)}
        for i in range(5)
    ]
    batches = list(Batcher(iter(samples), 2, pad_final=True))
    assert len(batches) == 3
    np.testing.assert_allclose(batches[0]["eval_mask"], [1.0, 1.0])
    np.testing.assert_allclose(batches[2]["eval_mask"], [1.0, 0.0])
    # pad row repeats the last real sample; shapes stay static
    assert batches[2]["target"].shape == batches[0]["target"].shape
    np.testing.assert_allclose(batches[2]["target"][1],
                               batches[2]["target"][0])
    # default behavior unchanged: partial batch dropped, no mask key
    batches = list(Batcher(iter(samples), 2))
    assert len(batches) == 2 and "eval_mask" not in batches[0]


def test_trainer_segmented_generation_matches(tiny_run):
    """tpu.chain_segments > 1 must produce byte-identical visualization
    outputs through the trainer path (_generate_np -> chain_segment)."""
    import dataclasses

    import numpy as np

    tmp_path, config_path, raw = tiny_run
    exp = Experiment(ExperimentArgs(config=config_path, train=True),
                     log_root=str(tmp_path / "logs_seg"))
    target, cond, angle = exp._vis_inputs(exp.max_views)
    vc = np.full((target.shape[0],), exp.max_views)

    one = exp._generate_np(cond, vc, angle, key_salt=9)
    exp.config = dataclasses.replace(
        exp.config,
        train=dataclasses.replace(exp.config.train, chain_segments=3),
    )
    seg = exp._generate_np(cond, vc, angle, key_salt=9)
    np.testing.assert_array_equal(one.ret_arr, seg.ret_arr)
    np.testing.assert_array_equal(one.generated_samples,
                                  seg.generated_samples)
    if one.weight_arr is not None:
        np.testing.assert_array_equal(one.weight_arr, seg.weight_arr)


def test_segmented_eval_matches_unsegmented(tiny_run):
    """tpu.chain_segments > 1 in the ancestral EVAL path
    (_eval_samples -> _generate_segmented with packed rows, no frame
    capture) must produce bit-identical samples to the single-dispatch
    program — this is what lets the full-T quality anchor run on rigs
    with per-execution runtime limits."""
    import dataclasses

    tmp_path, config_path, raw = tiny_run
    raw = copy.deepcopy(raw)
    raw.setdefault("tpu", {})["packed_views"] = True
    # float feed: under u8_feed the single-dispatch program fuses the
    # /255 normalize into consumers while the segmented path normalizes
    # eagerly — a documented ~1-ulp divergence (test_u8_feed_matches_
    # float_feed); bit-exactness is the claim HERE, so feed float.
    raw["tpu"]["u8_feed"] = False
    cfg_path = str(tmp_path / "segeval.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(raw, f)
    exp = Experiment(ExperimentArgs(config=cfg_path, train=True),
                     log_root=str(tmp_path / "logs_segeval"))
    batch = next(iter(exp.val_loader()))
    vc, si, vi = exp._global_packed_counts(77)
    device_batch = exp._prep_batch(batch, vc, packed_idx=(si, vi))
    import jax

    key = jax.random.PRNGKey(4)
    one = np.asarray(exp._eval_samples(key, device_batch))
    exp.config = dataclasses.replace(
        exp.config,
        train=dataclasses.replace(exp.config.train, chain_segments=4),
    )
    seg = np.asarray(exp._eval_samples(key, device_batch))
    np.testing.assert_array_equal(one, seg)


def test_u8_feed_matches_float_feed(tiny_run):
    """tpu.u8_feed ships uint8 batches + normalizes inside the jitted
    step.  The u8->f32 cast is exact and the /255 divide is the same
    IEEE op the host pipeline runs, but INSIDE jit XLA may fuse the
    divide into downstream consumers (q_sample FMA, conv input) with
    different intermediate rounding — so the guarantee is ulp-level
    agreement of the loss trajectory, not bitwise equality (measured
    max rel delta ~1e-7 over 6 steps).

    native_loader is forced off: the C++ decode threads yield samples
    in completion order (documented in NativeShardReader), so two runs
    would see different shuffle-buffer contents and the trajectories
    could not be compared at all."""
    tmp_path, config_path, raw = tiny_run

    def run(u8, tag):
        cfg = copy.deepcopy(raw)
        cfg["model"]["max_it"] = 6
        cfg["model"]["log_every"] = 1
        cfg["model"]["checkpoint_every"] = 0
        cfg.setdefault("tpu", {})["u8_feed"] = u8
        cfg["tpu"]["native_loader"] = False
        path = str(tmp_path / f"u8_{tag}.yaml")
        with open(path, "w") as f:
            yaml.dump(cfg, f)
        exp = Experiment(ExperimentArgs(config=path, train=True),
                         log_root=str(tmp_path / f"logs_u8_{tag}"))
        exp.train()
        with open(os.path.join(exp.out_dir, "metrics.jsonl")) as f:
            return [json.loads(l)["loss"] for l in f if "loss" in l]

    on, off = run(True, "on"), run(False, "off")
    assert len(on) == len(off) > 0
    np.testing.assert_allclose(on, off, rtol=2e-6)


def test_eval_with_dpm_sampler(tiny_run):
    """tpu.sampler: dpm drives eval through DPM-Solver++(2M); an
    unknown sampler name fails loudly instead of silently falling back
    to the ancestral chain."""
    tmp_path, config_path, raw = tiny_run
    cfg = copy.deepcopy(raw)
    cfg["model"]["max_it"] = 4
    cfg["model"]["validate_every"] = 4
    cfg["model"]["validate_from"] = 4
    cfg.setdefault("tpu", {})["sampler"] = "dpm"
    cfg["tpu"]["dpm_steps"] = 4
    path = str(tmp_path / "dpm.yaml")
    with open(path, "w") as f:
        yaml.dump(cfg, f)
    exp = Experiment(ExperimentArgs(config=path, train=True),
                     log_root=str(tmp_path / "logs_dpm"))
    exp.train()
    with open(os.path.join(exp.out_dir, "metrics.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    assert any("psnr" in r for r in recs)

    cfg["tpu"]["sampler"] = "plms"
    bad = str(tmp_path / "bad_sampler.yaml")
    with open(bad, "w") as f:
        yaml.dump(cfg, f)
    # a typo'd sampler fails at CONFIG LOAD, not hours into training
    # at the first validation gate (TrainConfig.__post_init__)
    with pytest.raises(ValueError, match="unknown tpu.sampler"):
        Experiment(ExperimentArgs(config=bad, train=True),
                   log_root=str(tmp_path / "logs_bad"))


def test_autoregressive_uses_configured_fast_sampler(tiny_run):
    """-ar honors tpu.sampler: the 24-chain orbit runs through the fast
    sampler instead of the ancestral chain (default ddpm keeps exact
    reference behavior — covered by test_inference_modes)."""
    tmp_path, config_path, raw = tiny_run
    cfg = copy.deepcopy(raw)
    cfg["model"]["max_it"] = 2
    cfg["model"]["validate_every"] = 0
    cfg.setdefault("tpu", {})["sampler"] = "ddim"
    cfg["tpu"]["ddim_steps"] = 4
    path = str(tmp_path / "ar_fast.yaml")
    with open(path, "w") as f:
        yaml.dump(cfg, f)
    exp = Experiment(ExperimentArgs(config=path, train=True),
                     log_root=str(tmp_path / "logs_ar"))
    exp.train()

    calls = []
    orig = Experiment._generate_np

    def spy(self, *a, **k):
        calls.append(1)
        return orig(self, *a, **k)

    Experiment._generate_np = spy
    try:
        exp.autoregressive()
    finally:
        Experiment._generate_np = orig
    # the fast path must not touch the ancestral frame-capture chain
    assert not calls
    out = os.path.join(exp.out_dir, f"autoregressive_animated-{exp.it}.gif")
    assert os.path.exists(out)
