"""Two-process FULL-Experiment test (VERDICT r3 next #1).

tests/test_multiprocess.py covers the multi-host primitives; this file
runs the PRODUCTION ``Experiment`` across two real JAX processes —
train with gated eval + best-model saves, then resume and continue —
with ``tpu.shard_opt_state`` (ZeRO-1 partitioned across the process
boundary) and ``tpu.async_checkpoint`` on, so the collective
gather-on-save (checkpoint._gather_partitioned) and save_async's
non-addressable sync fallback (checkpoint.py) execute for real, as do
the multi-host eval metric reductions (reference contract:
experiment.py:347-391).

Kept in its own file (two concurrent CPU compiles of train + sampler +
vis programs take minutes); deselect with `-k "not multiprocess"`.
"""

import json
import os
import socket
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_experiment_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(run_dir: str):
    port = _free_port()
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
           "PYTHONPATH": REPO}
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port), run_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("full-experiment workers timed out:\n" + "\n".join(
            o[-2000:] for o in outs))
    results = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-4000:]}"
        _, pid, resumed, it, ssim, psnr, digest = lines[-1].split()
        results[int(pid)] = (resumed, it, ssim, psnr, digest)
    assert set(results) == {0, 1}
    return results


@pytest.mark.skipif(sys.platform not in ("linux", "darwin"),
                    reason="needs POSIX subprocesses + localhost sockets")
def test_two_process_full_experiment_train_eval_resume(tmp_path):
    data_dir = str(tmp_path / "data")
    from viewfusion_tpu.data.synthetic import make_synthetic_shards

    # 2 shards per split: the per-host split (urls % num_hosts == 0)
    # gives each process its own shard
    make_synthetic_shards(data_dir, "train", num_objects=8, num_shards=2,
                          image_size=8)
    make_synthetic_shards(data_dir, "test", num_objects=8, num_shards=2,
                          image_size=8, seed=5)

    raw = {
        "model": {
            "denoise_net": "unet",
            "view_fusion_params": {"beta_schedule": {
                "train": {"schedule": "linear", "num_timesteps": 8,
                          "linear_start": 1e-4, "linear_end": 0.09},
                "test": {"schedule": "linear", "num_timesteps": 8,
                         "linear_start": 1e-4, "linear_end": 0.09},
            }},
            "denoise_net_params": {
                "image_size": 8, "in_channel": 6, "out_channel": 6,
                "inner_channel": 8, "norm_groups": 4, "res_blocks": 1,
                "attn_res": [4], "channel_mults": [1, 2],
            },
            "max_it": 20,
            "validate_from": 10,
            "validate_every": 10,
            "checkpoint_every": 5,
            "log_every": 5,
        },
        "data": {"params": {
            "max_views": 2, "batch_size": 4, "num_workers": 1,
            "train": {"params": {"path": data_dir, "mode": "train",
                                 "start_shard": 0, "end_shard": 1}},
            "test": {"params": {"path": data_dir, "mode": "test",
                                "start_shard": 0, "end_shard": 1,
                                "size": 4}},
        }},
        "tpu": {
            "compute_dtype": "float32",
            "packed_views": True,
            "shard_opt_state": True,
            "async_checkpoint": True,
            "mesh_data": 2,
            "mesh_view": 2,
            "sample_num": 4,
        },
    }
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    with open(run_dir / "config.yaml", "w") as f:
        yaml.dump(raw, f)

    # --- phase 1: cold start, train 20 steps with evals at 10 and 20 ---
    res = _launch(str(run_dir))
    assert res[0] == res[1], res  # SPMD: identical across processes
    resumed, it, ssim, psnr, digest = res[0]
    assert resumed == "-1" and it == "20"
    assert float(ssim) > -1.0 and float(psnr) == float(psnr)
    for name in ("model.msgpack", "best_model_ssim.msgpack",
                 "best_model_psnr.msgpack", "best_model_all.msgpack"):
        assert (run_dir / name).exists(), name

    # host-0's metrics log has the eval records
    evals = []
    with open(run_dir / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "psnr" in rec:
                evals.append(rec["it"])
    assert evals == [10, 20], evals
    digest1 = digest
    mtime1 = (run_dir / "model.msgpack").stat().st_mtime

    # --- phase 2: resume from it=20, continue to 30 with an eval ------
    raw["model"]["max_it"] = 30
    with open(run_dir / "config.yaml", "w") as f:
        yaml.dump(raw, f)
    res = _launch(str(run_dir))
    assert res[0] == res[1], res
    resumed, it, ssim, psnr, digest = res[0]
    assert resumed == "20" and it == "30"
    assert digest != digest1  # training actually continued
    assert (run_dir / "model.msgpack").stat().st_mtime > mtime1

    evals = []
    with open(run_dir / "metrics.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if "psnr" in rec:
                evals.append(rec["it"])
    assert evals == [10, 20, 30], evals
