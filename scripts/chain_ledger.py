#!/usr/bin/env python
"""MFU ledger for the reverse-sampling CHAIN step (VERDICT r4 item 7).

The full ancestral chain saturates the chip at batch 8 while isolated
forward convs run at ~68% of peak (CHAIN_SCALING_r04.json vs
MFU_LEDGER_r04.json) — this script quantifies the chain step's MFU the
way the train step's was: inventory every FLOP-bearing op in ONE
p_sample step (the `seg` scan body of scripts/bench_chain_scaling.py,
dense path, all views valid), time each signature in isolation
(bench_mfu_ledger timers), measure the in-context per-step marginal
cost, and attribute accounted vs residual.

Env knobs measured through the same path (trace-time; use fresh
processes per arm, scripts/ab_step_env.py style, to A/B):
  VF_CHAIN_BF16=1   run the chain carry/elementwise in bfloat16
                    (model compute is already bf16; this moves y_t and
                    the posterior arithmetic too)

Reference scope: one step of the reverse chain
(/root/reference/model/view_fusion.py:166-214).

Usage (on the chip):
  python scripts/chain_ledger.py --batch 8 --out CHAIN_LEDGER_r05.json
"""

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_chain_step(batch, timesteps):
    """One ancestral p_sample step at the flagship config, dense path,
    all views valid — identical to bench_chain_scaling's scan body."""
    import copy

    import jax
    import jax.numpy as jnp

    from bench import FLAGSHIP
    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion, view_mask

    raw = copy.deepcopy(FLAGSHIP)
    for ph in raw["model"]["view_fusion_params"]["beta_schedule"].values():
        ph["num_timesteps"] = timesteps
    cfg = Config.from_dict(raw)
    model = ViewFusion.from_config(cfg)
    n, hw = cfg.data.max_views, cfg.unet.image_size

    rng = np.random.default_rng(0)
    cond = jnp.asarray(
        rng.uniform(0, 1, (batch, n, hw, hw, 3)).astype(np.float32))
    y0 = jnp.asarray(
        rng.uniform(0, 1, (batch, hw, hw, 3)).astype(np.float32))
    vc = jnp.full((batch,), n, jnp.int32)
    angle = jnp.zeros((batch,), jnp.float32)
    mask = view_mask(vc, n)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), cond, y0)

    def step(params, y_t, key, t):
        key, sub = jax.random.split(key)
        y_t, _, _ = model.p_sample(params, sub, y_t, cond, mask, angle, t)
        return y_t, key

    return model, params, step, dict(batch=batch, n=n, hw=hw)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--timesteps", type=int, default=2000)
    ap.add_argument("--seg-len", type=int, default=250)
    ap.add_argument("--probe", type=int, default=50)
    ap.add_argument("--min-flops", type=float, default=5e7)
    ap.add_argument("--inventory-only", action="store_true",
                    help="trace + count signatures, no timing (CPU "
                         "smoke)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import bench
    import jax
    import jax.numpy as jnp

    import bench_mfu_ledger as ledger
    from viewfusion_tpu.cli import _honor_platform_env
    from viewfusion_tpu.utils.cache import enable_compilation_cache

    _honor_platform_env()
    bench.wait_for_chip(float(os.environ.get("VF_BENCH_WAIT_CHIP_S",
                                             "1800")))
    enable_compilation_cache()

    dev = jax.devices()[0]
    model, params, step, dims = build_chain_step(args.batch,
                                                 args.timesteps)
    b, n = dims["batch"], dims["n"]
    rows = b * n
    log(f"device: {dev.device_kind}; batch {b} x {n} views "
        f"= {rows} UNet rows/step")

    # ---------------- inventory one chain step ----------------------
    y_t0 = jnp.zeros((b, dims["hw"], dims["hw"], 3), jnp.float32)
    key0 = jax.random.PRNGKey(7)
    t0v = jnp.int32(args.timesteps - 1)
    jaxpr = jax.make_jaxpr(step)(params, y_t0, key0, t0v)

    cats = defaultdict(lambda: defaultdict(lambda: {"count": 0}))

    def visit(eqn):
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            p = eqn.params
            sig = ("conv",
                   tuple(v.aval.shape for v in eqn.invars),
                   tuple(v.aval.dtype.name for v in eqn.invars),
                   str(p["dimension_numbers"]),
                   tuple(p["window_strides"]),
                   tuple(map(tuple, p["padding"])))
            e = cats["conv_fwd"][sig]
            e["count"] += 1
            e["flops"] = ledger.conv_flops(eqn)
            e["eqn_params"] = dict(eqn.params)
            e["in_shapes"] = [tuple(v.aval.shape) for v in eqn.invars]
            e["in_dtypes"] = [v.aval.dtype for v in eqn.invars]
            e["out_shape"] = tuple(eqn.outvars[0].aval.shape)
        elif name == "dot_general":
            sig = ("dot",
                   tuple(v.aval.shape for v in eqn.invars),
                   tuple(v.aval.dtype.name for v in eqn.invars),
                   str(eqn.params["dimension_numbers"]))
            e = cats["dot"][sig]
            e["count"] += 1
            e["flops"] = ledger.dot_flops(eqn)
            e["eqn_params"] = dict(eqn.params)
            e["in_shapes"] = [tuple(v.aval.shape) for v in eqn.invars]
            e["in_dtypes"] = [v.aval.dtype for v in eqn.invars]
            e["out_shape"] = tuple(eqn.outvars[0].aval.shape)

    ledger._walk(jaxpr.jaxpr, visit)
    if args.inventory_only:
        total_gf = 0.0
        for cat, sigs in cats.items():
            for sig, e in sigs.items():
                total_gf += e["flops"] * e["count"] / 1e9
                log(f"{cat} {e['in_shapes'][0]} x{e['count']} "
                    f"{e['flops'] * e['count'] / 1e9:.2f} GF")
        print(json.dumps({"step_gflops": round(total_gf, 2),
                          "signatures": sum(len(s) for s in
                                            cats.values())}))
        return

    # ---------------- isolated timing per signature ------------------
    rows_out, accounted = [], 0.0
    flops_step = 0.0
    small_flops = 0.0
    small_count = 0
    for cat, sigs in cats.items():
        for sig, e in sigs.items():
            flops_step += e["flops"] * e["count"]
            if e["flops"] < args.min_flops:
                small_flops += e["flops"] * e["count"]
                small_count += e["count"]
                continue
            sec = (ledger.time_conv(e) if cat == "conv_fwd"
                   else ledger.time_dot(e))
            ms_total = sec * 1e3 * e["count"]
            accounted += ms_total
            rows_out.append({
                "category": cat,
                "in_shapes": [list(s) for s in e["in_shapes"]],
                "out_shape": list(e["out_shape"]),
                "count": e["count"],
                "ms_each": round(sec * 1e3, 4),
                "ms_total": round(ms_total, 3),
                "gflops_total": round(e["flops"] * e["count"] / 1e9, 2),
                "tflops_isolated": round(
                    e["flops"] / sec / 1e12, 1),
            })
            log(f"{cat} {e['in_shapes'][0]} x{e['count']}: "
                f"{sec * 1e3:.3f} ms each, "
                f"{e['flops'] / sec / 1e12:.1f} TF/s")
    rows_out.sort(key=lambda r: -r["ms_total"])

    # ---------------- in-context per-step marginal cost --------------
    @jax.jit
    def seg(params, y_t, key, ts):
        def body(carry, t):
            y_t, k = carry
            y_t, k = step(params, y_t, k, t)
            return (y_t, k), None

        (y_t, key), _ = jax.lax.scan(body, (y_t, key), ts)
        return y_t, key

    import time

    def run_len(length):
        ts = jnp.arange(args.timesteps - 1, args.timesteps - 1 - length,
                        -1)
        key = jax.random.PRNGKey(7)
        y_t = jax.random.normal(key, (b, dims["hw"], dims["hw"], 3),
                                jnp.float32)
        y, _ = seg(params, y_t, key, ts)
        float(jnp.sum(y[0, 0, 0]))

    def timed(length):
        run_len(length)  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run_len(length)
            best = min(best, time.perf_counter() - t0)
        return best

    t_short, t_long = timed(args.probe), timed(args.seg_len)
    per_step_ms = (t_long - t_short) / (args.seg_len - args.probe) * 1e3
    log(f"per-step marginal: {per_step_ms:.3f} ms "
        f"({rows / per_step_ms * 1e3:.0f} rows/s)")

    kind = dev.device_kind.lower()
    peak = next((v for k, v in bench.PEAK_BF16.items() if k in kind),
                197e12)
    mfu = flops_step / (per_step_ms / 1e3) / peak
    doc = {
        "what": ("MFU ledger of ONE ancestral chain step (dense, all "
                 "views valid, the bench_chain_scaling scan body): "
                 "isolated per-signature times vs in-context marginal "
                 "per-step cost"),
        "device": dev.device_kind,
        "batch": b,
        "rows_per_step": rows,
        "chain_elementwise_dtype": os.environ.get("VF_CHAIN_BF16", "0"),
        "per_step_ms": round(per_step_ms, 3),
        "device_rows_per_sec": round(rows / per_step_ms * 1e3, 1),
        "step_gflops": round(flops_step / 1e9, 2),
        "mfu_pct": round(mfu * 100, 1),
        "accounted_ms": round(accounted, 3),
        "residual_ms": round(per_step_ms - accounted, 3),
        "residual_pct": round(
            (per_step_ms - accounted) / per_step_ms * 100, 1),
        "small_ops": {"count": small_count,
                      "gflops_total": round(small_flops / 1e9, 3),
                      "note": "below --min-flops per call; untimed"},
        "rows": rows_out,
        "method": ("signatures from make_jaxpr of one p_sample step; "
                   "isolated chained-op marginal times "
                   "(bench_mfu_ledger); in-context cost = scan-length "
                   "slope (seg_len vs probe), fetch-bounded best-of-3"),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        log(f"wrote {args.out}")
    print(json.dumps({k: v for k, v in doc.items() if k != "rows"},
                     indent=1))


if __name__ == "__main__":
    main()
