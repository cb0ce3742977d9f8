#!/usr/bin/env python
"""A/B the full-Pallas GroupNorm FORWARD kernel: v1 (one-sample grid)
vs v2 (multi-sample blocks, r4 rewrite).

This settles the empirical question `_fwd_kernel_v2`'s docstring
defers here (groupnorm.py:147-156): whether v2's single-HBM-read
schedule beats v1 per shape.  Scope note: the SHIPPED default GN path
is "hybrid" (XLA forward + Pallas analytic backward) — the full-Pallas
forward only runs under VF_GN_IMPL=pallas, so this A/B sets the
default of that opt-in path (VF_GN_FWD), not the flagship step rate
(that is scripts/ab_gn_boundary.py's job).

Measures the isolated per-shape rate of `_pallas_fwd` at every
(B, L, C) the flagship step contains (shape counts from the ledger
trace), marginal-slope timed, plus the flagship full-Pallas
(VF_GN_IMPL=pallas) step under each version.

Usage (on the chip): python scripts/ab_gn_fwd.py --out GN_FWD_AB_r05.json
"""

import argparse
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _load_ledger_mod():
    spec = importlib.util.spec_from_file_location(
        "bench_mfu_ledger", os.path.join(REPO, "scripts",
                                         "bench_mfu_ledger.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def time_fwd(shape, groups, act, version):
    import jax.numpy as jnp

    from viewfusion_tpu.ops.groupnorm import _pallas_fwd
    from viewfusion_tpu.utils.timing import chained_op_seconds

    b, l, c = shape
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32),
                     dtype=jnp.bfloat16)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)

    def op(x3_, scale_, bias_):
        y, mean, rstd = _pallas_fwd(x3_, scale_, bias_, groups, 1e-6,
                                    act, False, version=version)
        return (jnp.mean(y.astype(jnp.float32)) + jnp.mean(mean)
                + jnp.mean(rstd))

    return chained_op_seconds(op, x3, scale, bias, K1=32, K2=160)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-step", action="store_true")
    ap.add_argument("--top", type=int, default=6,
                    help="isolate only the N heaviest GN shapes (each "
                         "shape costs 4 chained-op compiles; the "
                         "decisive default-setting number is the "
                         "step-level A/B, per-shape rows are "
                         "diagnostics)")
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
    os.environ["VF_GN_IMPL"] = "hybrid"
    cats = led.inventory(train_step, shapes, tx, step_args)
    gn_shapes = sorted(
        ((sig[1], e["count"]) for sig, e in cats["gn_bwd"].items()),
        key=lambda t: -t[0][1] * t[0][2] * t[1])
    dropped = gn_shapes[args.top:]
    if dropped:
        print(f"isolating top {args.top} of {len(gn_shapes)} shapes; "
              f"dropped (by bytes*count): {[list(s) for s, _ in dropped]}",
              file=sys.stderr)
        gn_shapes = gn_shapes[: args.top]
    del os.environ["VF_GN_IMPL"]

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}; {len(gn_shapes)} gn shapes",
          file=sys.stderr)

    rows, tot = [], {"v1": 0.0, "v2": 0.0}
    for shape, count in gn_shapes:
        row = {"shape": list(shape), "count": count}
        byts = 2.0 * shape[0] * shape[1] * shape[2] * 2  # 1 read + 1 write
        for ver in ("v1", "v2"):
            sec = time_fwd(shape, 32, "silu", ver)
            row[f"{ver}_ms"] = round(sec * 1e3, 4)
            row[f"{ver}_gbps"] = round(byts / sec / 1e9, 1)
            tot[ver] += sec * count
        row["speedup_v2"] = round(row["v1_ms"] / row["v2_ms"], 2)
        rows.append(row)
        print(row, file=sys.stderr)

    doc = {
        "device": dev.device_kind,
        "what": ("full-Pallas GroupNorm forward v1 vs v2, isolated at "
                 "every GN shape in the flagship packed step (fwd "
                 "count = bwd count per shape); decides the VF_GN_FWD "
                 "default of the opt-in VF_GN_IMPL=pallas path"),
        "rows": rows,
        "total_ms_v1": round(tot["v1"] * 1e3, 2),
        "total_ms_v2": round(tot["v2"] * 1e3, 2),
        "total_speedup_v2": round(tot["v1"] / tot["v2"], 2),
    }

    if not args.skip_step:
        os.environ["VF_GN_IMPL"] = "pallas"
        step = {}
        for ver in ("v1", "v2"):
            os.environ["VF_GN_FWD"] = ver
            # fresh closure per version: env read at trace time
            ts, shp, tx2, sa = led.build_train_step()
            sec = led.measure_step_seconds(ts, shp, tx2, sa)
            step[ver] = sec
            print(f"full-pallas step {ver}: {sec * 1e3:.2f} ms "
                  f"({1.0 / sec:.3f} steps/s)", file=sys.stderr)
        os.environ.pop("VF_GN_FWD", None)
        del os.environ["VF_GN_IMPL"]
        doc["pallas_step_ms_v1"] = round(step["v1"] * 1e3, 2)
        doc["pallas_step_ms_v2"] = round(step["v2"] * 1e3, 2)
        doc["pallas_step_speedup_v2"] = round(step["v1"] / step["v2"], 3)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print("wrote", args.out, file=sys.stderr)
    print(json.dumps({k: v for k, v in doc.items() if k != "rows"}))


if __name__ == "__main__":
    main()
