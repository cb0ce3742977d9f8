#!/usr/bin/env python
"""A/B the GroupNorm custom-vjp boundary: 4-D layout-native vs 3-D.

Round 4 shipped `_gn_act_hybrid4` (groupnorm.py `_use_4d_boundary`) ON
BY DEFAULT without an on-chip measurement, and the round-4 driver bench
recorded 8.57 steps/s against the pre-boundary 9.88 A/B headline
(GN_BWD_AB_r04.json) — an unexplained 13% spread.  This script settles
both questions:

  1. 4-D vs 3-D boundary on the EXACT flagship packed train step
     (bench.py construction via bench_mfu_ledger.build_train_step);
  2. process-restart variance: every measurement runs in a FRESH
     subprocess (VF_GN_BOUNDARY is read at trace time, so flipping it
     inside one process would silently reuse the previously traced
     variant — ADVICE r4), interleaved 4d/3d/4d/3d so rig drift hits
     both arms equally, each reporting all 30-step windows.

The winner becomes the shipped default of `_use_4d_boundary`
(groupnorm.py); the per-process spread is the variance bound quoted in
DESIGN.md for the r4 8.57-vs-9.88 discrepancy.

Reference scope: the step measured implements one training update of
/root/reference/model/view_fusion.py:216-298 + experiment.py:286-293.

Usage (on the chip):
  python scripts/ab_gn_boundary.py --out GN_BOUNDARY_AB_r05.json
"""

import argparse
import importlib.util
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_ledger_mod():
    spec = importlib.util.spec_from_file_location(
        "bench_mfu_ledger", os.path.join(REPO, "scripts",
                                         "bench_mfu_ledger.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def worker(windows, steps_per_window):
    """Measure the flagship step in THIS process; print one JSON line."""
    import bench
    import jax

    from viewfusion_tpu.cli import _honor_platform_env
    from viewfusion_tpu.utils.cache import enable_compilation_cache

    _honor_platform_env()
    bench.wait_for_chip(float(os.environ.get("VF_BENCH_WAIT_CHIP_S",
                                             "1800")))
    enable_compilation_cache()

    led = _load_ledger_mod()
    train_step, shapes, tx, args = led.build_train_step()

    params = jax.jit(lambda k: jax.tree_util.tree_map(
        lambda s: jax.random.normal(k, s.shape, s.dtype) * 0.02
        if s.dtype.name.startswith(("float", "bfloat")) else
        jax.numpy.zeros(s.shape, s.dtype), shapes))(jax.random.PRNGKey(1))
    opt_state = jax.jit(tx.init)(params)
    step = jax.jit(train_step, donate_argnums=(0, 1))

    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, **args)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, **args)
    jax.block_until_ready(loss)

    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps_per_window):
            params, opt_state, loss = step(params, opt_state, **args)
        float(loss)
        rates.append(round(steps_per_window / (time.perf_counter() - t0),
                           4))
    print(json.dumps({
        "variant": os.environ.get("VF_GN_BOUNDARY", "4d"),
        "device": jax.devices()[0].device_kind,
        "compile_s": round(compile_s, 1),
        "window_steps_per_sec": rates,
        "best": max(rates),
        "loss": float(loss),
    }))


def spawn(variant, windows, steps_per_window):
    env = dict(os.environ)
    env["VF_GN_BOUNDARY"] = variant
    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           "--windows", str(windows), "--steps", str(steps_per_window)]
    p = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=3600)
    if p.returncode != 0:
        print(p.stdout, file=sys.stderr)
        print(p.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"worker {variant} rc={p.returncode}")
    line = p.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    print(f"  {variant}: windows={rec['window_steps_per_sec']} "
          f"best={rec['best']} compile={rec['compile_s']}s",
          file=sys.stderr)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3,
                    help="fresh processes per variant (interleaved)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.worker:
        worker(args.windows, args.steps)
        return

    runs = {"4d": [], "3d": []}
    for rep in range(args.reps):
        for variant in ("4d", "3d"):
            print(f"rep {rep} {variant}:", file=sys.stderr)
            runs[variant].append(spawn(variant, args.windows, args.steps))

    summary = {}
    for variant, recs in runs.items():
        allw = [w for r in recs for w in r["window_steps_per_sec"]]
        bests = [r["best"] for r in recs]
        summary[variant] = {
            "per_process_best": bests,
            "all_windows_min": min(allw),
            "all_windows_max": max(allw),
            "mean": round(sum(allw) / len(allw), 4),
            "best": max(bests),
        }
    s4, s3 = summary["4d"], summary["3d"]
    doc = {
        "what": ("GroupNorm custom-vjp boundary 4-D (layout-native) vs "
                 "3-D on the flagship packed train step; each row one "
                 "FRESH process (env read at trace time), interleaved"),
        "device": runs["4d"][0]["device"],
        "windows_per_process": args.windows,
        "steps_per_window": args.steps,
        "summary": summary,
        "speedup_4d_over_3d_best": round(s4["best"] / s3["best"], 4),
        "speedup_4d_over_3d_mean": round(s4["mean"] / s3["mean"], 4),
        "process_restart_spread_4d": round(
            max(s4["per_process_best"]) - min(s4["per_process_best"]), 4),
        "process_restart_spread_3d": round(
            max(s3["per_process_best"]) - min(s3["per_process_best"]), 4),
        "runs": runs,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print("wrote", args.out, file=sys.stderr)
    print(json.dumps({k: v for k, v in doc.items() if k != "runs"},
                     indent=1))


if __name__ == "__main__":
    main()
