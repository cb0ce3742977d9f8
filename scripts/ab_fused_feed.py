#!/usr/bin/env python
"""Trainer-integrated A/B of tpu.fused_feed (3 vs 6 device puts/step).

Runs the REAL production path twice (main.py -t on a scaled-down copy
of the given config, fused off / on), reads steady-state
steps_per_sec from each run's metrics.jsonl, and writes
FUSED_AB_r03.json.  This measures what bench.py's synthetic feeder
cannot: the trainer's own _device_feed with its 6-put split batch vs
the fused 3-put layout, through the same data pipeline.

Usage: python scripts/ab_fused_feed.py <config.yaml> [--steps 120]
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

import yaml


def run_arm(base_cfg: dict, fused: bool, steps: int, workdir: str) -> dict:
    cfg = json.loads(json.dumps(base_cfg))  # deep copy
    cfg["model"].update(
        max_it=steps, log_every=5, checkpoint_every=0, validate_every=0,
    )
    tpu = cfg.setdefault("tpu", {})
    tpu.update(packed_views=True, fused_feed=fused)
    tag = "fused" if fused else "split"
    cfg_path = os.path.join(workdir, f"ab_{tag}.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(cfg, f)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "main.py"),
         "-c", cfg_path, "-t"],
        cwd=workdir, capture_output=True, text=True, timeout=1800,
    )
    if r.returncode != 0:
        return {"error": (r.stderr.strip().splitlines() or ["?"])[-1][:300]}
    runs = sorted(
        (os.path.join(workdir, "logs", d)
         for d in os.listdir(os.path.join(workdir, "logs"))),
        key=os.path.getmtime,
    )
    rates = []
    with open(os.path.join(runs[-1], "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "steps_per_sec" in rec:
                rates.append(rec["steps_per_sec"])
    # drop the first half (compile + warmup windows), keep the steady tail
    tail = rates[len(rates) // 2:]
    return {
        "steady_steps_per_sec": round(statistics.median(tail), 4),
        "windows": [round(x, 3) for x in rates],
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--out", default="FUSED_AB_r03.json")
    args = p.parse_args()

    base = yaml.safe_load(open(args.config))
    workdir = tempfile.mkdtemp(prefix="vf_ab_fused_")
    out = {"what": "trainer-integrated data-fed steps/s, split (6-put) "
                   "vs fused (3-put) device feed; same config/data",
           "config": args.config, "steps": args.steps, "arms": {}}
    for fused in (False, True):
        tag = "fused" if fused else "split"
        out["arms"][tag] = run_arm(base, fused, args.steps, workdir)
        print(f"[{tag}] {out['arms'][tag]}", file=sys.stderr, flush=True)
    s = out["arms"].get("split", {}).get("steady_steps_per_sec")
    f_ = out["arms"].get("fused", {}).get("steady_steps_per_sec")
    if s and f_:
        out["fused_vs_split"] = round(f_ / s, 4)
    with open(args.out, "w") as fo:
        json.dump(out, fo, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
