#!/usr/bin/env python
"""Generic fresh-process A/B of the flagship packed train step under an
environment knob.

All of this repo's trace-time knobs (VF_GN_BOUNDARY, VF_PACK_BARRIER,
VF_GN_IMPL, ...) are read when the step is first traced, so flipping
them inside one process silently reuses the previously compiled variant
(ADVICE r4).  This harness spawns one FRESH subprocess per measurement,
interleaving the arms so rig drift cancels, and reports per-process
window rates + the restart spread — the same protocol that settled the
GN boundary question (scripts/ab_gn_boundary.py / GN_BOUNDARY_AB_r05).

The measured step is the exact flagship construction
(scripts/bench_mfu_ledger.build_train_step — one training update of
/root/reference/model/view_fusion.py:216-298 + experiment.py:286-293).

Usage (on the chip):
  python scripts/ab_step_env.py --knob VF_PACK_BARRIER --values 0,1 \
      --out PACK_BARRIER_AB_r05.json
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


def worker(windows, steps_per_window, knob):
    import bench
    import jax

    from viewfusion_tpu.cli import _honor_platform_env
    from viewfusion_tpu.utils.cache import enable_compilation_cache

    _honor_platform_env()
    bench.wait_for_chip(float(os.environ.get("VF_BENCH_WAIT_CHIP_S",
                                             "1800")))
    enable_compilation_cache()

    spec = importlib.util.spec_from_file_location(
        "bench_mfu_ledger", os.path.join(REPO, "scripts",
                                         "bench_mfu_ledger.py"))
    led = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(led)
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
        "value": os.environ.get(knob, ""),
        "device": jax.devices()[0].device_kind,
        "compile_s": round(compile_s, 1),
        "window_steps_per_sec": rates,
        "best": max(rates),
        "loss": float(loss),
    }))


def spawn(knob, value, windows, steps_per_window, timeout=900,
          attempts=3):
    """One fresh-process measurement, bounded and retried.

    The tunneled chip can swallow a single RPC response (observed live:
    the worker's epoll thread waits forever on a dispatch the server
    already dropped, while NEW client connections work fine).  An
    unbounded worker would stall the whole A/B on that one lost packet,
    so each attempt gets a hard timeout and a stuck worker is killed
    and re-spawned — the compile cache makes retries cheap."""
    env = dict(os.environ)
    env[knob] = value
    cmd = [sys.executable, os.path.abspath(__file__), "--worker",
           "--knob", knob, "--windows", str(windows),
           "--steps", str(steps_per_window)]
    p = None
    for attempt in range(attempts):
        try:
            p = subprocess.run(cmd, cwd=REPO, env=env,
                               capture_output=True, text=True,
                               timeout=timeout)
        except subprocess.TimeoutExpired:
            print(f"  {knob}={value}: worker stuck >{timeout}s "
                  f"(attempt {attempt + 1}/{attempts}), re-spawning",
                  file=sys.stderr)
            continue
        if p.returncode == 0:
            break
        print(p.stdout, file=sys.stderr)
        print(p.stderr[-4000:], file=sys.stderr)
    if p is None or p.returncode != 0:
        raise RuntimeError(f"worker {knob}={value} failed "
                           f"{attempts} attempts")
    rec = json.loads(p.stdout.strip().splitlines()[-1])
    print(f"  {knob}={value}: windows={rec['window_steps_per_sec']} "
          f"best={rec['best']} compile={rec['compile_s']}s",
          file=sys.stderr)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--knob", required=True)
    ap.add_argument("--values", default=None,
                    help="comma-separated arm values (driver mode)")
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--reps", type=int, default=2,
                    help="fresh processes per arm (interleaved)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.worker:
        worker(args.windows, args.steps, args.knob)
        return

    values = args.values.split(",")
    runs = {v: [] for v in values}
    for rep in range(args.reps):
        for v in values:
            print(f"rep {rep} {args.knob}={v}:", file=sys.stderr)
            runs[v].append(spawn(args.knob, v, args.windows, args.steps))

    summary = {}
    for v, recs in runs.items():
        allw = [w for r in recs for w in r["window_steps_per_sec"]]
        bests = [r["best"] for r in recs]
        summary[v] = {
            "per_process_best": bests,
            "mean": round(sum(allw) / len(allw), 4),
            "best": max(bests),
            "restart_spread": round(max(bests) - min(bests), 4),
        }
    base = summary[values[0]]["best"]
    doc = {
        "what": (f"flagship packed train step under {args.knob}="
                 f"{'/'.join(values)}; one FRESH process per row "
                 "(trace-time env), interleaved"),
        "knob": args.knob,
        "device": runs[values[0]][0]["device"],
        "windows_per_process": args.windows,
        "steps_per_window": args.steps,
        "summary": summary,
        "speedup_vs_first": {
            v: round(summary[v]["best"] / base, 4) for v in values
        },
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
