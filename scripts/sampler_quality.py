#!/usr/bin/env python
"""Quality-vs-steps curve for the fast samplers on the real chip.

Drives standalone eval (`main.py -s <run> -e`) from a trained run dir
once per (sampler, steps) setting and records PSNR/SSIM + wall time
into a JSON artifact.  This turns the "DPM-Solver++ reaches DDIM
quality in fewer steps" claim into a measured curve on the same
checkpoint, data, and eval code path the trainer ships.

The ancestral T=2000 chain is NOT rerun here: the eval path dispatches
one whole-chain program (no chain segmentation) and the tunneled dev
rig kills executions at ~73 s; its throughput/quality evidence lives in
BENCH_DETAIL_r03.json and README (measured via segmented generate).
The longest DDIM setting below (250 steps) serves as the quality
anchor instead.

Usage:
  python scripts/sampler_quality.py /tmp/vf_tpu/logs/<run> \
      --out SAMPLER_QUALITY_r03.json
"""

import argparse
import copy
import json
import os
import shutil
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SETTINGS = [
    ("ddim", 250),   # quality anchor: longest practical strided chain
    ("ddim", 50),    # shipped default
    ("ddim", 25),
    ("dpm", 20),     # shipped default dpm_steps
    ("dpm", 10),
    ("dpm", 5),
]


def run_eval(src_run, workdir, sampler, steps, test_size):
    """Copy the run dir, patch sampler config, run `-e`, parse metrics."""
    run = os.path.join(workdir, f"{sampler}-{steps}")
    os.makedirs(run, exist_ok=True)
    for f in ("config.yaml", "best_model_all.msgpack", "model.msgpack"):
        src = os.path.join(src_run, f)
        if os.path.exists(src):
            shutil.copy(src, run)
    cfg_path = os.path.join(run, "config.yaml")
    cfg = yaml.safe_load(open(cfg_path))
    tpu = cfg.setdefault("tpu", {})
    tpu["sampler"] = sampler
    if sampler == "ddim":
        tpu["ddim_steps"] = steps
    else:
        tpu["dpm_steps"] = steps
    cfg["data"]["params"]["test"]["params"]["size"] = test_size
    yaml.dump(cfg, open(cfg_path, "w"))

    metrics = os.path.join(run, "metrics.jsonl")
    if os.path.exists(metrics):
        os.remove(metrics)
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "main.py"), "-s", run + "/",
         "-e"],
        capture_output=True, text=True, timeout=1800,
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
    return {
        "sampler": sampler, "steps": steps,
        "psnr": round(float(rec["psnr"]), 3),
        "ssim": round(float(rec["ssim"]), 4),
        "wall_s_incl_compile": round(wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--out", default="SAMPLER_QUALITY.json")
    ap.add_argument("--test-size", type=int, default=56)
    ap.add_argument("--workdir", default="/tmp/vf_sampler_quality")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    rows = []
    for sampler, steps in SETTINGS:
        row = run_eval(args.run_dir, args.workdir, sampler, steps,
                       args.test_size)
        print(row, flush=True)
        rows.append(row)

    import numpy as np  # platform check only after runs

    out = {
        "what": ("eval PSNR/SSIM per (sampler, steps) on one trained "
                 "checkpoint through the production eval path; "
                 "wall includes per-setting jit compile"),
        "src_run": os.path.abspath(args.run_dir),
        "test_size": args.test_size,
        "note": ("checkpoint trained 600 steps on synthetic NMR-format "
                 "data — absolute PSNR is low; the SAMPLER DELTA at "
                 "matched checkpoint is the measurement"),
        "rows": rows,
    }
    _ = np
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
