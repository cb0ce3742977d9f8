#!/usr/bin/env python
"""Execute every inference mode (-e, -ex, -ar, -gif) on the real chip
from a trained run dir, recording wall times and output hashes.

Round-2 gap: the four modes were integration-tested on CPU only.  This
driver runs each through the production CLI (`main.py -s <run> ...`) as
a separate process on the TPU and writes RUN_TPU_r03-style evidence.

The tunneled dev rig enforces a per-execution runtime limit (~73 s), so
the run dir's config is amended with `tpu.chain_segments` (the T=2000
visualization chains run as K short dispatches — bit-identical math,
tests/test_view_fusion.py::test_segmented_chain_matches_generate) and
DDIM-50 eval.  `best_model_all.msgpack` is seeded from the final rolling
checkpoint when absent (the source run trained without eval gates).

Usage: python scripts/run_tpu_modes.py <run_dir> --out RUN_TPU_r03.json
"""

import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import time

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sha(path):
    h = hashlib.sha256()
    with open(path, "rb") as f:
        h.update(f.read())
    return h.hexdigest()[:16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/vf_run_modes",
                    help="the SOURCE run dir is copied here and never "
                         "mutated (config patches + best-seeding happen "
                         "on the copy)")
    args = ap.parse_args()
    src = os.path.abspath(args.run_dir)

    # Work on a copy: patching config.yaml / seeding best_model in the
    # real run dir would silently change later resumes and evals.
    run = os.path.join(args.workdir, os.path.basename(src.rstrip("/")))
    os.makedirs(run, exist_ok=True)
    for f in ("config.yaml", "model.msgpack", "best_model_all.msgpack",
              "best_model_ssim.msgpack", "best_model_psnr.msgpack"):
        p = os.path.join(src, f)
        if os.path.exists(p):
            shutil.copy(p, run)

    cfg_path = os.path.join(run, "config.yaml")
    with open(cfg_path) as f:
        raw = yaml.safe_load(f)
    tpu = raw.setdefault("tpu", {})
    tpu["chain_segments"] = args.segments
    tpu["sampler"] = "ddim"  # eval: full ancestral chain at batch 28
    tpu["ddim_steps"] = 50   # exceeds the rig's per-execution limit
    with open(cfg_path, "w") as f:
        yaml.dump(raw, f)

    best = os.path.join(run, "best_model_all.msgpack")
    seeded_best = False
    if not os.path.exists(best):
        shutil.copy(os.path.join(run, "model.msgpack"), best)
        seeded_best = True

    modes = [
        ("eval", ["-e"]),
        ("extrapolate", ["-i", "-ex"]),
        ("autoregressive", ["-i", "-ar"]),
        ("gif", ["-i", "-gif"]),
    ]
    result = {
        "what": ("all four inference modes executed on the real chip "
                 "through the production CLI from a 600-step trained "
                 "checkpoint; chains segmented (tpu.chain_segments="
                 f"{args.segments}) to fit the rig's per-execution "
                 "limit — segmented == single-call bit-identical "
                 "(test_segmented_chain_matches_generate)"),
        "run_dir_config": {k: raw["tpu"].get(k) for k in
                           ("packed_views", "chain_segments", "sampler")},
        "seeded_best_from_rolling": seeded_best,
        "modes": {},
    }
    for name, flags in modes:
        before = set(os.listdir(run))
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "main.py"), "-s", run]
            + flags,
            capture_output=True, text=True, timeout=3000,
        )
        wall = time.perf_counter() - t0
        new = sorted(set(os.listdir(run)) - before)
        entry = {
            "ok": proc.returncode == 0,
            "wall_seconds": round(wall, 1),
            "new_files": {f: sha(os.path.join(run, f)) for f in new},
        }
        if proc.returncode != 0:
            entry["stderr_tail"] = proc.stderr[-2000:]
        if name == "eval":
            # standalone -e prints metrics to stdout (the JSONL sink is
            # written by the train-loop/inference log flush)
            for line in proc.stdout.splitlines():
                if line.startswith("eval:"):
                    parts = dict(
                        kv.split("=") for kv in line.split()[1:]
                        if "=" in kv
                    )
                    entry["ssim"] = float(parts.get("ssim", "nan"))
                    entry["psnr"] = float(parts.get("psnr", "nan"))
        result["modes"][name] = entry
        print(f"{name}: ok={entry['ok']} {wall:.1f}s files={new}",
              flush=True)
        if not entry["ok"]:
            print(proc.stderr[-3000:], file=sys.stderr)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
