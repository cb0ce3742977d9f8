#!/usr/bin/env python
"""A/B: packed-stratified view counts vs the reference's iid draw.

Round-1/2 open question: packed training replaces the reference's iid
``view_count ~ U{1..max_views}`` per-sample draw (experiment.py:277-279)
with a per-batch stratified multiset (zero variance in sum(view_count);
that is what keeps packed shapes static under jit).  The marginal
distribution matches and the packed math is proven identical at equal
counts (tests/test_packed.py) — so any training-dynamics difference must
come from the count DISTRIBUTION.  This script measures it:

  arm A: packed_views=true  (stratified counts), seed 0   [shipped]
  arm B: packed_views=false (iid counts),        seed 0   [reference]
  arm C: packed_views=false (iid counts),        seed 1   [noise floor]

Each arm trains N steps through the full CLI path on identical synthetic
shards; afterwards every final checkpoint is evaluated by ONE fixed
evaluator (same batches, same counts, same sampler noise) so the metric
comparison has no draw luck in it.  Verdict: A-vs-B differences are
material only if they exceed the B-vs-C (pure seed) spread.

Usage:  python scripts/ab_packed.py --steps 600 --out PACKED_AB_r03.json
        (runs on whatever jax.devices() offers; TPU ~5 min, CPU hours)
"""

import argparse
import copy
import json
import os
import subprocess
import sys
import tempfile

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

TOPOLOGY = {
    "model": {
        "denoise_net": "unet",
        "view_fusion_params": {
            "beta_schedule": {
                "train": {"schedule": "linear", "num_timesteps": 2000,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "test": {"schedule": "linear", "num_timesteps": 1000,
                         "linear_start": 1e-4, "linear_end": 0.09},
            }
        },
        "denoise_net_params": {
            "image_size": 64, "in_channel": 6, "out_channel": 6,
            "inner_channel": 64, "res_blocks": 3, "attn_res": [16],
            "channel_mults": [1, 2, 3, 5],
        },
        "validate_every": 0,
        "checkpoint_every": 200,
        "log_every": 25,
    },
    "data": {"params": {"max_views": 6, "batch_size": 28,
                        "num_workers": 1}},
    "tpu": {"compute_dtype": "bfloat16"},
}


def run_arm(name, data_dir, root, steps, packed, seed):
    raw = copy.deepcopy(TOPOLOGY)
    raw["model"]["max_it"] = steps
    for split in ("train", "test"):
        raw["data"]["params"][split] = {
            "params": {"path": data_dir, "mode": split if split == "train"
                       else "test", "start_shard": 0, "end_shard": 0,
                       "size": 16}
        }
    raw["tpu"]["packed_views"] = packed
    raw["tpu"]["seed"] = seed
    cfg_path = os.path.join(root, f"{name}.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(raw, f)
    arm_cwd = os.path.join(root, f"arm_{name}")
    os.makedirs(arm_cwd, exist_ok=True)
    print(f"=== arm {name}: packed={packed} seed={seed} "
          f"steps={steps}", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"), "-c", cfg_path,
         "-t"],
        check=True, cwd=arm_cwd,
    )
    log_root = os.path.join(arm_cwd, "logs")
    run_dir = os.path.join(
        log_root, sorted(os.listdir(log_root))[-1]
    )
    losses = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                losses.append((rec["it"], rec["loss"]))
    return run_dir, losses


def fixed_eval(run_dir, eval_batch, counts, si, vi):
    """One shared evaluator: same batch, same counts, same noise key for
    every arm's checkpoint."""
    import jax
    import jax.numpy as jnp

    from viewfusion_tpu.config import load_config
    from viewfusion_tpu.models.view_fusion import ViewFusion
    from viewfusion_tpu.ops.metrics import compute_psnr, compute_ssim
    from viewfusion_tpu.training.checkpoint import Checkpoint

    cfg = load_config(os.path.join(run_dir, "config.yaml"))
    model = ViewFusion.from_config(cfg)
    hw = cfg.denoiser.image_size
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, hw, hw, 3), jnp.float32),
        jnp.zeros((1, hw, hw, 3), jnp.float32),
    )
    restored, _ = Checkpoint(run_dir).load("model.msgpack",
                                           {"params": params})
    params = restored["params"]
    gen = jax.jit(model.generate_ddim, static_argnames=("num_steps",))(
        params, jax.random.PRNGKey(777),
        jnp.asarray(eval_batch["cond"]), jnp.asarray(counts),
        jnp.asarray(eval_batch["angle"]), num_steps=50,
        packed_idx=(si, vi),  # host np (lowering embeds directly)
    )
    tgt = jnp.asarray(eval_batch["target"])
    return (float(jnp.mean(compute_psnr(gen, tgt))),
            float(jnp.mean(compute_ssim(gen, tgt))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from viewfusion_tpu.data.synthetic import make_synthetic_shards

    root = tempfile.mkdtemp(prefix="vf_ab_")
    data_dir = os.path.join(root, "data")
    make_synthetic_shards(data_dir, "train", num_objects=64, image_size=64)
    make_synthetic_shards(data_dir, "test", num_objects=16, image_size=64)

    arms = {}
    for name, packed, seed in [("packed_s0", True, 0),
                               ("dense_s0", False, 0),
                               ("dense_s1", False, 1)]:
        run_dir, losses = run_arm(name, data_dir, root, args.steps,
                                  packed, seed)
        arms[name] = {"run_dir": run_dir, "losses": losses}

    # one fixed evaluator for every checkpoint
    from viewfusion_tpu.config import SplitConfig
    from viewfusion_tpu.data.nmr import Batcher, create_nmr_stream
    from viewfusion_tpu.training.trainer import stratified_count_multiset

    stream = create_nmr_stream(
        SplitConfig(path=data_dir, mode="test", start_shard=0,
                    end_shard=0),
        shuffle_buffer=0, seed=99, resample=True,
    )
    batch = next(iter(Batcher(stream, 16, n_cond_views=6,
                              keys=["target", "cond", "angle"])))
    batch["angle"] = np.asarray(batch["angle"]).reshape(-1)
    counts = stratified_count_multiset(16, 6).astype(np.int32)
    from viewfusion_tpu.training.trainer import Experiment
    si, vi = Experiment._packed_indices(counts)

    for name, arm in arms.items():
        psnr, ssim = fixed_eval(arm["run_dir"], batch, counts, si, vi)
        arm["fixed_eval_psnr"] = round(psnr, 3)
        arm["fixed_eval_ssim"] = round(ssim, 4)
        print(f"{name}: fixed-eval psnr={psnr:.3f} ssim={ssim:.4f}")

    def tail_mean(losses, k=8):
        return float(np.mean([v for _, v in losses[-k:]]))

    ab = abs(tail_mean(arms["packed_s0"]["losses"])
             - tail_mean(arms["dense_s0"]["losses"]))
    bc = abs(tail_mean(arms["dense_s0"]["losses"])
             - tail_mean(arms["dense_s1"]["losses"]))
    psnr_ab = abs(arms["packed_s0"]["fixed_eval_psnr"]
                  - arms["dense_s0"]["fixed_eval_psnr"])
    psnr_bc = abs(arms["dense_s0"]["fixed_eval_psnr"]
                  - arms["dense_s1"]["fixed_eval_psnr"])

    import jax

    result = {
        "what": ("stratified-packed (shipped) vs iid-dense (reference) "
                 "count distribution, plus an iid-dense seed-variation "
                 "arm as the noise floor; identical data/topology; one "
                 "fixed evaluator for all checkpoints"),
        "platform": jax.devices()[0].device_kind,
        "steps": args.steps,
        "arms": {
            k: {
                "final_loss_tail_mean": round(tail_mean(v["losses"]), 5),
                "fixed_eval_psnr": v["fixed_eval_psnr"],
                "fixed_eval_ssim": v["fixed_eval_ssim"],
                "loss_curve": v["losses"],
            }
            for k, v in arms.items()
        },
        "loss_delta_packed_vs_iid": round(ab, 5),
        "loss_delta_seed_noise_floor": round(bc, 5),
        "psnr_delta_packed_vs_iid": round(psnr_ab, 3),
        "psnr_delta_seed_noise_floor": round(psnr_bc, 3),
        "material": bool(ab > 2 * bc and psnr_ab > 2 * psnr_bc),
    }
    print(json.dumps({k: v for k, v in result.items() if k != "arms"},
                     indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
