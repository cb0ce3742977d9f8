#!/usr/bin/env python
"""Long eval-gated production training run on the real chip.

Runs the full reference training loop (experiment.py:218-312 semantics:
gated eval -> inference grid -> best-model checkpoints) for thousands
of steps in ONE process on the TPU, through the production CLI
(`main.py -c cfg -t`), on synthetic NMR-format shards:

  - packed train step (shipped default), async checkpointing, rawrec
    zero-decode data path, JSONL metrics;
  - validation every `--validate-every` steps from `--validate-from`,
    each eval running the configured sampler chain over the test split
    and updating best_model_{ssim,psnr,all} files;
  - round-4 knobs: `--family shaded` picks the high-headroom synthetic
    family, `--ema D` turns on the EMA shadow (tpu.ema_decay), and
    `--eval-train-split` logs held-in ssim_train/psnr_train curves
    beside the held-out metrics at every gate (the LONGRUN_r03 eval
    collapse diagnosis: generalization gap vs eval-path bug);
  - afterwards the run dir's metrics.jsonl is distilled into a JSON
    artifact: loss trajectory, per-gate metrics (both splits), steps/s,
    wall time, which best-model files the gates produced.

Usage: python scripts/longrun_tpu.py --steps 5000 --out LONGRUN_A.json
"""

import argparse
import copy
import json
import os
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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
        "checkpoint_every": 500,
        "log_every": 50,
    },
    "data": {"params": {"max_views": 6, "batch_size": 28,
                        "num_workers": 1}},
    "tpu": {
        "compute_dtype": "bfloat16",
        "packed_views": True,       # shipped default
        "async_checkpoint": True,   # shipped default
        # dpm_sde-50: measured-best quality per step on this chip
        # (SAMPLER_QUALITY_r03.json); keeps each gated eval ~seconds
        # instead of the T=2000 reference chain.
        "sampler": "dpm_sde",
        "dpm_steps": 50,
        # the dev rig kills any single device execution at ~73 s; the
        # 12-sample inference grid after each eval runs its chain as 8
        # short dispatches (bit-identical, test_segmented_chain_*).
        "chain_segments": 8,
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--validate-from", type=int, default=1000)
    ap.add_argument("--validate-every", type=int, default=1000)
    ap.add_argument("--train-objects", type=int, default=128)
    ap.add_argument("--test-objects", type=int, default=56)
    ap.add_argument("--family", default="squares",
                    choices=["squares", "shaded"])
    ap.add_argument("--ema", type=float, default=0.0,
                    help="tpu.ema_decay (0 = off)")
    ap.add_argument("--decay-it", type=int, default=0,
                    help="LR decay horizon (0 = reference 4M-step "
                         "schedule, i.e. effectively constant at peak "
                         "over a 20k run); set ~= steps-warmup for a "
                         "horizon-matched decay (VERDICT r4 item 3)")
    ap.add_argument("--decay-rate", type=float, default=0.0,
                    help="LR decay rate at the horizon (0 = reference "
                         "0.16)")
    ap.add_argument("--eval-train-split", action="store_true",
                    help="log held-in ssim_train/psnr_train per gate")
    ap.add_argument("--root", default="/tmp/vf_longrun")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from viewfusion_tpu.data.rawrec import convert_shard_dir
    from viewfusion_tpu.data.synthetic import make_synthetic_shards

    data_dir = os.path.join(args.root, f"data-{args.family}")
    if not os.path.exists(os.path.join(data_dir, "NMR-train-00.tar")):
        print(f"rendering synthetic shards ({args.family}) ...",
              flush=True)
        make_synthetic_shards(data_dir, "train",
                              num_objects=args.train_objects,
                              image_size=64, family=args.family)
        make_synthetic_shards(data_dir, "test",
                              num_objects=args.test_objects,
                              image_size=64, seed=10_000,
                              family=args.family)
    convert_shard_dir(data_dir)  # .rec twins: zero-decode mmap reads

    raw = copy.deepcopy(TOPOLOGY)
    # validate gate runs BEFORE the max_it stop check in the same
    # iteration (trainer._train_loop), so the final gate fires AT
    # max_it — no +1 extra step (advisor r3).
    raw["model"]["max_it"] = args.steps
    raw["model"]["validate_from"] = args.validate_from
    raw["model"]["validate_every"] = args.validate_every
    if args.ema > 0:
        raw["tpu"]["ema_decay"] = args.ema
    if args.decay_it > 0:
        raw["tpu"]["decay_it"] = args.decay_it
    if args.decay_rate > 0:
        raw["tpu"]["decay_rate"] = args.decay_rate
    if args.eval_train_split:
        raw["tpu"]["eval_train_split"] = True
    for split, mode, size in (("train", "train", None),
                              ("test", "test", args.test_objects)):
        p = {"path": data_dir, "mode": mode,
             "start_shard": 0, "end_shard": 0}
        if size:
            p["size"] = size
        raw["data"]["params"][split] = {"params": p}
    cfg_name = (f"longrun-{args.family}"
                + (f"-ema{args.ema}" if args.ema else "")
                + (f"-decay{args.decay_it}" if args.decay_it else ""))
    cfg_path = os.path.join(args.root, cfg_name + ".yaml")
    os.makedirs(args.root, exist_ok=True)
    with open(cfg_path, "w") as f:
        yaml.dump(raw, f)

    work = os.path.join(args.root, "work")
    os.makedirs(work, exist_ok=True)
    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"), "-c", cfg_path,
         "-t"],
        check=True, cwd=work,
    )
    wall = time.perf_counter() - t0

    log_root = os.path.join(work, "logs")
    run_dir = os.path.join(log_root, sorted(os.listdir(log_root))[-1])
    losses, evals, last_it = [], [], 0
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            last_it = max(last_it, rec.get("it", 0))
            if "loss" in rec:
                losses.append((rec["it"], rec["loss"]))
            if "psnr" in rec:
                ev = {"it": rec["it"],
                      "psnr": round(rec["psnr"], 3),
                      "ssim": round(rec["ssim"], 4)}
                if "psnr_train" in rec:
                    ev["psnr_train"] = round(rec["psnr_train"], 3)
                    ev["ssim_train"] = round(rec["ssim_train"], 4)
                evals.append(ev)
    tail = [v for _, v in losses[-5:]]
    best_files = sorted(
        n for n in os.listdir(run_dir) if n.startswith("best_model")
    )
    out = {
        "what": ("eval-gated production training on the real chip in one "
                 "process: packed train step + async checkpointing + "
                 "rawrec data path + gated dpm_sde-50 eval/vis + "
                 "best-model checkpoint policy, through `main.py -t`"),
        "device": None,
        "family": args.family,
        "ema_decay": args.ema,
        "decay_it": args.decay_it or 4_000_000,
        "decay_rate": args.decay_rate or 0.16,
        "eval_train_split": bool(args.eval_train_split),
        "steps": last_it,
        "wall_seconds": round(wall, 1),
        "steps_per_sec_incl_evals": round(last_it / wall, 3),
        "loss_first": round(losses[0][1], 4),
        "loss_tail_mean": round(sum(tail) / len(tail), 5),
        "evals": evals,
        "best_model_files": best_files,
        "loss_curve_every_250": [
            [it, round(v, 4)] for it, v in losses if it % 250 == 0
        ],
        "run_dir": run_dir,
    }
    try:
        import jax

        out["device"] = str(jax.devices()[0].device_kind)
    except Exception:
        pass
    dest = args.out or os.path.join(REPO, "LONGRUN_r04.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k != "loss_curve_every_250"}, indent=1))


if __name__ == "__main__":
    main()
