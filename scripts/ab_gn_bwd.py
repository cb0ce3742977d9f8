#!/usr/bin/env python
"""A/B the GroupNorm Pallas backward: r3 kernel (v1) vs the r4 rewrite
(v2: multi-sample blocks, derived a/b reductions, VMEM scratch).

Driven by MFU_LEDGER_r04.json, which measured v1 as the step's largest
category (22.9 ms, 21% of the 107 ms step, 95-315 GB/s vs the ~819 GB/s
HBM roofline).  Two measurements:

  1. per-shape isolated rate of _pallas_bwd at every (B, L, C) the
     flagship step actually contains (counts from the ledger trace),
     v1 vs v2, marginal-slope timed;
  2. the full flagship packed train step (bench.py construction),
     steps/s with VF_GN_BWD=v1 vs v2 — the number that decides the
     shipped default.

Usage (on the chip): python scripts/ab_gn_bwd.py --out GN_BWD_AB_r04.json
"""

import argparse
import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _load_ledger_mod():
    spec = importlib.util.spec_from_file_location(
        "bench_mfu_ledger",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_mfu_ledger.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def time_bwd(shape, groups, act, version):
    import jax.numpy as jnp

    from viewfusion_tpu.ops.groupnorm import _pallas_bwd
    from viewfusion_tpu.utils.timing import chained_op_seconds

    b, l, c = shape
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32),
                     dtype=jnp.bfloat16)
    scale = jnp.ones((1, c), jnp.float32)
    bias = jnp.zeros((1, c), jnp.float32)
    mean = jnp.zeros((b, 1, groups), jnp.float32)
    rstd = jnp.ones((b, 1, groups), jnp.float32)
    g3 = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32),
                     dtype=jnp.bfloat16)

    def op(x3_, scale_, bias_, mean_, rstd_, g3_):
        dx, dsc, dbi = _pallas_bwd(x3_, scale_, bias_, mean_, rstd_, g3_,
                                   groups, 1e-6, act, False,
                                   version=version)
        return (jnp.mean(dx.astype(jnp.float32)) + jnp.mean(dsc)
                + jnp.mean(dbi))

    return chained_op_seconds(op, x3, scale, bias, mean, rstd, g3,
                              K1=32, K2=160)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-step", action="store_true")
    args = ap.parse_args()

    import bench
    import jax

    from viewfusion_tpu.cli import _honor_platform_env
    from viewfusion_tpu.utils.cache import enable_compilation_cache

    _honor_platform_env()
    bench.wait_for_chip(float(os.environ.get("VF_BENCH_WAIT_CHIP_S",
                                             "1800")))
    enable_compilation_cache()

    led = _load_ledger_mod()
    train_step, shapes, tx, step_args = led.build_train_step()
    os.environ["VF_GN_IMPL"] = "hybrid"  # trace the TPU graph shape
    cats = led.inventory(train_step, shapes, tx, step_args)
    gn_shapes = sorted(
        ((sig[1], e["count"]) for sig, e in cats["gn_bwd"].items()),
        key=lambda t: -t[0][1] * t[0][2] * t[1])
    del os.environ["VF_GN_IMPL"]

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}; {len(gn_shapes)} gn shapes",
          file=sys.stderr)

    rows, tot = [], {"v1": 0.0, "v2": 0.0}
    for shape, count in gn_shapes:
        row = {"shape": list(shape), "count": count}
        byts = 3.0 * shape[0] * shape[1] * shape[2] * 2
        for ver in ("v1", "v2"):
            sec = time_bwd(shape, 32, "silu", ver)
            row[f"{ver}_ms"] = round(sec * 1e3, 4)
            row[f"{ver}_gbps"] = round(byts / sec / 1e9, 1)
            tot[ver] += sec * count
        row["speedup"] = round(row["v1_ms"] / row["v2_ms"], 2)
        rows.append(row)
        print(row, file=sys.stderr)

    doc = {
        "device": dev.device_kind,
        "what": ("GroupNorm Pallas backward v1 (r3) vs v2 (r4 rewrite) "
                 "at every shape in the flagship packed step; counts "
                 "from the step trace"),
        "rows": rows,
        "total_ms_v1": round(tot["v1"] * 1e3, 2),
        "total_ms_v2": round(tot["v2"] * 1e3, 2),
        "total_speedup": round(tot["v1"] / tot["v2"], 2),
    }

    if not args.skip_step:
        step = {}
        for ver in ("v1", "v2"):
            os.environ["VF_GN_BWD"] = ver
            # fresh step closure per version: the env var is read at
            # trace time inside _pallas_bwd
            ts, shp, tx2, sa = led.build_train_step()
            sec = led.measure_step_seconds(ts, shp, tx2, sa)
            step[ver] = sec
            print(f"step {ver}: {sec * 1e3:.2f} ms "
                  f"({1.0 / sec:.3f} steps/s)", file=sys.stderr)
        os.environ.pop("VF_GN_BWD", None)
        doc["step_ms_v1"] = round(step["v1"] * 1e3, 2)
        doc["step_ms_v2"] = round(step["v2"] * 1e3, 2)
        doc["step_speedup"] = round(step["v1"] / step["v2"], 3)
        doc["steps_per_sec_v2"] = round(1.0 / step["v2"], 3)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print("wrote", args.out, file=sys.stderr)
    print(json.dumps({k: v for k, v in doc.items() if k != "rows"}))


if __name__ == "__main__":
    main()
