#!/usr/bin/env python
"""Per-stage conv utilization probe for the flagship UNet on real TPU.

Measures achieved TFLOP/s (and effective HBM GB/s) of each stage's
dominant 3x3 conv in isolation, bf16, at the packed row count
(sum(view_count) = 98 at batch 28).  Purpose: test the round-2 MFU
accounting story — "the 64px stage's 64-output-channel convs half-fill
the MXU lanes and cap utilization" — with measurements instead of
arithmetic, and price the standard counter-move (space-to-depth):

  * stage0            : (R, 64, 64, 64)  -> 64,  3x3   [N=64 lanes]
  * stage0_iso_flops  : (R, 32, 32, 128) -> 128, 3x3   [same FLOPs,
                        full 128 lanes — what stage0 would run at if
                        lane fill were the only difference]
  * stage0_s2d_exact  : (R, 32, 32, 256) -> 256, 3x3   [the EXACT
                        space-to-depth transform of stage0: the
                        transformed kernel stays 3x3 over 4x channels,
                        so it costs 4x the FLOPs (75% structural
                        zeros); only wins if util gain > 4x]
  * stem              : (R, 64, 64, 6)   -> 64          [tiny K]
  * stage1/2/3        : the real inner-stage convs (lanes full)
  * grad-side variants: conv at the backward pass's data layout

Each conv is timed alone under jit; fusion context differs from the
full graph, so treat these as utilization bounds per op, not end-to-end
deltas.  Writes --out JSON.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--rows", type=int, default=98)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from viewfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    R = args.rows

    cases = [
        # name,                 (H, W, Cin), Cout, k
        ("stem_64px_6to64", (64, 64, 6), 64, 3),
        ("stage0_64px_64to64", (64, 64, 64), 64, 3),
        ("stage0_iso_flops_32px_128to128", (32, 32, 128), 128, 3),
        ("stage0_s2d_exact_32px_256to256", (32, 32, 256), 256, 3),
        ("stage1_32px_128to128", (32, 32, 128), 128, 3),
        ("stage2_16px_192to192", (16, 16, 192), 192, 3),
        ("stage3_8px_320to320", (8, 8, 320), 320, 3),
        ("decoder0_64px_128to64", (64, 64, 128), 64, 3),
        ("stage0_wideout_64px_64to128", (64, 64, 64), 128, 3),
    ]

    rng = np.random.default_rng(0)
    results = []
    # Two chain lengths; per-conv time = marginal slope (t2-t1)/(K2-K1),
    # cancelling the fixed host->tunnel->device round-trip (~20 ms here)
    # and dispatch overheads.
    K1, K2 = 32, 160

    for name, (h, w, cin), cout, k in cases:
        x0 = jnp.asarray(
            rng.standard_normal((R, h, w, cin)).astype(np.float32),
            dtype=jnp.bfloat16,
        )
        wgt = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.05,
            dtype=jnp.bfloat16,
        )

        def conv_op(x, wgt):
            return jax.lax.conv_general_dilated(
                x, wgt, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )

        # Shared fetch-forced marginal-slope harness (rationale in
        # viewfusion_tpu/utils/timing.py)
        from viewfusion_tpu.utils.timing import chained_op_seconds

        best = chained_op_seconds(conv_op, x0, wgt, K1=K1, K2=K2)
        flops = 2.0 * k * k * cin * cout * h * w * R
        out_size = R * h * w * cout
        byts = 2.0 * (x0.size + out_size) + 2.0 * wgt.size
        row = {
            "case": name,
            "shape": f"({R},{h},{w},{cin})->{cout} {k}x{k}",
            "ms": round(best * 1e3, 3),
            "tflops": round(flops / best / 1e12, 1),
            "gbps_min_traffic": round(byts / best / 1e9, 1),
        }
        results.append(row)
        print(row, file=sys.stderr)

    s0 = next(r for r in results if r["case"].startswith("stage0_64px"))
    iso = next(r for r in results if "iso_flops" in r["case"])
    s2d = next(r for r in results if "s2d_exact" in r["case"])
    summary = {
        "stage0_vs_full_lane_iso_flops_speedup_available":
            round(s0["ms"] / iso["ms"], 2),
        "s2d_exact_vs_stage0_time_ratio": round(s2d["ms"] / s0["ms"], 2),
        "s2d_wins": s2d["ms"] < s0["ms"],
    }
    print(summary, file=sys.stderr)
    out = {"device": dev.device_kind, "rows": R, "dtype": "bfloat16",
           "cases": results, "summary": summary}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.out, file=sys.stderr)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
