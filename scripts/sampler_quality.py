#!/usr/bin/env python
"""Quality-vs-steps curve for the fast samplers on the real chip.

Drives standalone eval (`main.py -s <run> -e`) from a trained run dir
once per (sampler, steps) setting and records PSNR/SSIM + wall time
into a JSON artifact.  This turns the "DPM-Solver++ reaches DDIM
quality in fewer steps" claim into a measured curve on the same
checkpoint, data, and eval code path the trainer ships.

Round 4: the ancestral full-T chain IS in the table — the eval path
honors tpu.chain_segments (trainer._eval_samples), so the T=2000
reference chain runs as 8 short dispatches under this rig's ~73 s
per-execution kill, bit-identical to one generate() call
(test_segmented_eval_matches_unsegmented).

Round 5 (VERDICT r4 item 6): per-setting error bars.  ``--seeds``
re-runs each setting with different eval sampling keys (tpu.seed feeds
trainer._eval_pass's PRNGKey(seed+17) and the generation prologue's
PRNGKey(seed+23)); ``--test-data-dir`` points the eval at a larger
freshly-rendered test split than the training run used; the artifact
then reports mean +- (max-min)/2 per setting so sampler deltas can be
read against seed noise.  ``--settings`` restricts the sweep.

Usage:
  python scripts/sampler_quality.py /tmp/vf_longrun/work/logs/<run> \
      --out SAMPLER_QUALITY_r04.json
  python scripts/sampler_quality.py <run> --seeds 0,1,2 --test-size 256 \
      --test-data-dir /tmp/vf_eval_data --settings \
      ancestral-2000,ddim-250,dpm-50,dpm_sde-50 --out SAMPLER_QUALITY_r05.json
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETTINGS = [
    ("ancestral", 2000),  # reference chain: the quality anchor
    ("ddim", 250),    # longest practical strided chain
    ("ddim", 50),     # shipped default (eta=1, stochastic)
    ("ddim", 25),
    ("ddim0", 250),   # eta=0: deterministic ODE — the apples-to-apples
    ("ddim0", 50),    #        baseline for the (deterministic) solver
    ("ddim0", 25),
    ("dpm", 50),
    ("dpm", 20),      # default dpm_steps
    ("dpm_sde", 50),  # 2nd-order + per-step noise (self-correcting)
    ("dpm_sde", 20),
    ("dpm_sde", 10),
]


def run_eval(src_run, workdir, sampler, steps, test_size, seed=0,
             test_data_dir=None):
    """Copy the run dir, patch sampler config, run `-e`, parse metrics."""
    run = os.path.join(workdir, f"{sampler}-{steps}-s{seed}")
    row_cache = os.path.join(run, "row.json")
    cache_key = {"src_run": os.path.abspath(src_run),
                 "test_size": test_size, "seed": seed,
                 "test_data_dir": test_data_dir}
    if os.path.exists(row_cache):
        cached = json.load(open(row_cache))
        # rows cached for a DIFFERENT checkpoint or test size must not
        # leak into this artifact
        if all(cached.get(k) == v for k, v in cache_key.items()):
            return cached
    os.makedirs(run, exist_ok=True)
    for f in ("config.yaml", "best_model_all.msgpack", "model.msgpack"):
        src = os.path.join(src_run, f)
        if os.path.exists(src):
            shutil.copy(src, run)
    cfg_path = os.path.join(run, "config.yaml")
    cfg = yaml.safe_load(open(cfg_path))
    tpu = cfg.setdefault("tpu", {})
    if sampler == "ancestral":
        # reference T-step chain; segmented into short dispatches so the
        # rig's per-execution kill never fires (steps is informational —
        # the chain length is the installed train schedule's T)
        tpu["sampler"] = "ddpm"
        tpu["chain_segments"] = 16
    elif sampler in ("dpm", "dpm_sde"):
        tpu["sampler"] = sampler
        tpu["dpm_steps"] = steps
    else:  # "ddim" (eta=1, shipped default) or "ddim0" (eta=0, ODE)
        tpu["sampler"] = "ddim"
        tpu["ddim_steps"] = steps
        tpu["ddim_eta"] = 0.0 if sampler == "ddim0" else 1.0
    cfg["data"]["params"]["test"]["params"]["size"] = test_size
    if test_data_dir:
        cfg["data"]["params"]["test"]["params"]["path"] = test_data_dir
    if seed:
        tpu["seed"] = seed
    yaml.dump(cfg, open(cfg_path, "w"))

    metrics = os.path.join(run, "metrics.jsonl")
    if os.path.exists(metrics):
        os.remove(metrics)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"), "-s", run + "/",
         "-e"],
        capture_output=True, text=True, timeout=7200,
    )
    wall = time.time() - t0
    if proc.returncode != 0:
        print(proc.stdout[-2000:], file=sys.stderr)
        print(proc.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"{sampler}-{steps} eval failed")
    rec = {}
    with open(metrics) as f:
        for line in f:
            d = json.loads(line)
            if "psnr" in d:
                rec = d
    if "psnr" not in rec:
        raise RuntimeError(
            f"{sampler}-{steps}: eval exited 0 but wrote no psnr record "
            f"to {metrics}"
        )
    row = {
        "sampler": sampler, "steps": steps,
        "psnr": round(float(rec["psnr"]), 3),
        "ssim": round(float(rec["ssim"]), 4),
        "wall_s_incl_compile": round(wall, 1),
        **cache_key,
    }
    with open(row_cache, "w") as f:
        json.dump(row, f)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--out", default="SAMPLER_QUALITY.json")
    ap.add_argument("--test-size", type=int, default=56)
    ap.add_argument("--workdir", default="/tmp/vf_sampler_quality")
    ap.add_argument("--seeds", default="0",
                    help="comma list; >1 adds mean+-spread per setting")
    ap.add_argument("--settings", default=None,
                    help="comma list like ancestral-2000,dpm_sde-50 "
                         "(default: the full table)")
    ap.add_argument("--test-data-dir", default=None,
                    help="shard dir for the eval test split (e.g. a "
                         "larger freshly-rendered set)")
    args = ap.parse_args()

    seeds = [int(s) for s in args.seeds.split(",")]
    settings = SETTINGS
    if args.settings:
        settings = []
        for tok in args.settings.split(","):
            name, steps = tok.rsplit("-", 1)
            settings.append((name, int(steps)))

    os.makedirs(args.workdir, exist_ok=True)
    rows, summary = [], []
    for sampler, steps in settings:
        per_seed = []
        for seed in seeds:
            row = run_eval(args.run_dir, args.workdir, sampler, steps,
                           args.test_size, seed=seed,
                           test_data_dir=args.test_data_dir)
            print(row, flush=True)
            rows.append(row)
            per_seed.append(row)
        if len(seeds) > 1:
            ps = [r["psnr"] for r in per_seed]
            ss = [r["ssim"] for r in per_seed]
            summary.append({
                "sampler": sampler, "steps": steps, "n_seeds": len(seeds),
                "psnr_mean": round(sum(ps) / len(ps), 3),
                "psnr_spread": round((max(ps) - min(ps)) / 2, 3),
                "ssim_mean": round(sum(ss) / len(ss), 4),
                "ssim_spread": round((max(ss) - min(ss)) / 2, 4),
            })
            print(summary[-1], flush=True)

    out = {
        "what": ("eval PSNR/SSIM per (sampler, steps) on one trained "
                 "checkpoint through the production eval path; "
                 "wall includes per-setting jit compile"),
        "src_run": os.path.abspath(args.run_dir),
        "test_size": args.test_size,
        "seeds": seeds,
        "test_data_dir": args.test_data_dir,
        "note": ("checkpoint is the run dir's best_model_all (quality-"
                 "gated peak of the training run) on synthetic NMR-"
                 "format data — absolute PSNR is synthetic-bounded; the "
                 "SAMPLER DELTA at matched checkpoint is the "
                 "measurement"),
        "rows": rows,
    }
    if summary:
        out["summary"] = summary
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
