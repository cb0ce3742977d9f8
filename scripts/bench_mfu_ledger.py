#!/usr/bin/env python
"""Closed per-category MFU accounting for the flagship packed train step.

Round-3 left the end-to-end 29% MFU unattributed: isolated forward
convs measured 60-95% of peak (STAGE_CONVS_r03.json), GroupNorm
backward was fixed, wgrad bounded — yet no ledger summed to the step
time.  This script closes it the mechanical way:

  1. trace the EXACT shipped train step (same construction as bench.py:
     packed loss, uint8 feed, donated Adam update) to a jaxpr;
  2. inventory every FLOP-bearing op and classify it from its
     dimension numbers —
       conv fwd   : rhs_spec=(3,2,0,1)   (HWIO weights)
       conv dgrad : rhs_spec=(2,3,0,1)   (transposed weights)
       conv wgrad : out_spec=(2,3,0,1)   (both operands activations)
       dot_general: attention QK/AV + their grads (rank-3, >=50 MFLOP)
       pallas_call: the hybrid GroupNorm analytic backward
     (classification verified against the jaxpr on CPU in
     tests/test_mfu_ledger.py);
  3. time each unique signature IN ISOLATION on the chip with the
     shared fetch-forced marginal-slope harness (utils/timing.py),
     at the exact shapes/dtypes/dimension-numbers the step uses;
  4. measure the real step time the way bench.py does, and publish
     sum(count x isolated-time) per category against it.

The residual (step - sum of isolated categories) is the honest bucket
for elementwise/reduction/copy/optimizer work plus the fusion delta
(isolated op timing removes the producer/consumer fusion context, so
category times are LOWER BOUNDS of in-graph cost; the residual is the
corresponding upper bound on everything else).

Ops below --min-flops (default 5e7) per call are never individually
timed — their summed FLOPs are reported as `small_ops_flops` (for this
model: time-embedding MLP dots at (1,32)x(32,C) and FWA projections,
~0.1% of step FLOPs).

Writes two artifacts:
  --out       MFU_LEDGER_rNN.json   full accounting
  --dgrad-out STAGE_DGRAD_rNN.json  per-stage dgrad rows in the
                                    STAGE_CONVS_r03.json format
Reference scope: the step being accounted implements
view_fusion.py:131-142 + experiment.py:218-256 (one training update).
"""

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


# ---------------------------------------------------------------- inventory

def build_train_step():
    """The flagship train step, constructed exactly as bench.py does
    (same config dict, packed indices, uint8 feed, donated Adam)."""
    import jax
    import jax.numpy as jnp
    import optax

    import bench
    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion
    from viewfusion_tpu.training.schedulers import lr_schedule
    from viewfusion_tpu.training.trainer import (
        Experiment, _norm_img as norm, stratified_count_multiset,
    )

    cfg = Config.from_dict(bench.FLAGSHIP)
    model = ViewFusion.from_config(cfg)
    b, n, hw = cfg.data.batch_size, cfg.data.max_views, cfg.unet.image_size
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.integers(0, 256, (b, hw, hw, 3), np.uint8))
    cond = jnp.asarray(rng.integers(0, 256, (b, n, hw, hw, 3), np.uint8))
    counts = stratified_count_multiset(b, n)
    np.random.default_rng(1).shuffle(counts)
    view_count = jnp.asarray(counts.astype(np.int32))
    si, vi = Experiment._packed_indices(counts)
    sample_idx, view_idx = si, vi  # host np: closed-over device arrays force a D2H at lowering
    angle = jnp.asarray(rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    shapes = jax.eval_shape(model.init, key,
                            jnp.zeros((b, n, hw, hw, 3)),
                            jnp.zeros((b, hw, hw, 3)))
    tx = optax.adam(lr_schedule())

    def train_step(params, opt_state, key, y0, cond, view_count, angle):
        def loss_fn(p):
            return model.loss_packed(p, key, norm(y0), norm(cond),
                                     view_count, angle,
                                     sample_idx, view_idx)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    args = dict(key=key, y0=y0, cond=cond, view_count=view_count,
                angle=angle)
    return train_step, shapes, tx, args


def _walk(jaxpr, visit):
    for eqn in jaxpr.eqns:
        visit(eqn)
        for v in eqn.params.values():
            inner = getattr(v, "jaxpr", None)
            if inner is not None and hasattr(inner, "eqns"):
                _walk(inner, visit)
            elif hasattr(v, "eqns"):
                _walk(v, visit)


def classify_conv(eqn):
    dn = eqn.params["dimension_numbers"]
    if tuple(dn.out_spec) == (2, 3, 0, 1):
        return "conv_wgrad"
    if tuple(dn.rhs_spec) == (2, 3, 0, 1):
        return "conv_dgrad"
    if tuple(dn.rhs_spec) == (3, 2, 0, 1):
        return "conv_fwd"
    return "conv_other"


def conv_flops(eqn):
    """Useful MACs x2, read off the eqn.

    Base count is 2 * output-elements * contraction-size.  A dgrad of a
    stride-s conv is lowered as an lhs-dilated conv (lhs_dilation=s)
    where (s^2-1)/s^2 of the taps hit structural zeros — counting them
    as FLOPs would report >peak rates (each fwd MAC has exactly one
    dgrad MAC, so the useful count is the base divided by s^2)."""
    dn = eqn.params["dimension_numbers"]
    lhs, rhs = (v.aval.shape for v in eqn.invars)
    out = eqn.outvars[0].aval.shape
    # contraction size = rhs elements / rhs-output-feature dim;
    # output positions = out elements
    cout_dim = dn.out_spec[1]
    cout = out[cout_dim]
    k_contract = int(np.prod(rhs)) // cout
    dil = float(np.prod(eqn.params["lhs_dilation"]))
    return 2.0 * float(np.prod(out)) * k_contract / dil


def dot_flops(eqn):
    contract, _batch = eqn.params["dimension_numbers"]
    lhs, rhs = (v.aval.shape for v in eqn.invars)
    out = eqn.outvars[0].aval.shape
    csize = 1
    for d in contract[0]:
        csize *= lhs[d]
    return 2.0 * float(np.prod(out)) * csize


def inventory(train_step, shapes, tx, args):
    """Trace the step; return {category: {signature: {count, flops,
    rebuild-info}}} plus pallas rows."""
    import jax
    import jax.numpy as jnp

    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    opt_state = jax.eval_shape(tx.init, shapes)
    opt_state = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), opt_state)
    jaxpr = jax.make_jaxpr(train_step)(params, opt_state, **args)

    cats = defaultdict(lambda: defaultdict(lambda: {"count": 0}))

    def visit(eqn):
        name = eqn.primitive.name
        if name == "conv_general_dilated":
            cat = classify_conv(eqn)
            p = eqn.params
            sig = ("conv",
                   tuple(v.aval.shape for v in eqn.invars),
                   tuple(v.aval.dtype.name for v in eqn.invars),
                   tuple(p["dimension_numbers"].lhs_spec),
                   tuple(p["dimension_numbers"].rhs_spec),
                   tuple(p["dimension_numbers"].out_spec),
                   tuple(p["window_strides"]),
                   tuple(map(tuple, p["padding"])),
                   tuple(p["lhs_dilation"]), tuple(p["rhs_dilation"]),
                   int(p["feature_group_count"]),
                   str(p.get("preferred_element_type")))
            e = cats[cat][sig]
            e["count"] += 1
            e["flops"] = conv_flops(eqn)
            e["eqn_params"] = dict(eqn.params)
            e["in_shapes"] = [tuple(v.aval.shape) for v in eqn.invars]
            e["in_dtypes"] = [v.aval.dtype for v in eqn.invars]
            e["out_shape"] = tuple(eqn.outvars[0].aval.shape)
        elif name == "dot_general":
            sig = ("dot",
                   tuple(v.aval.shape for v in eqn.invars),
                   tuple(v.aval.dtype.name for v in eqn.invars),
                   str(eqn.params["dimension_numbers"]),
                   str(eqn.params.get("preferred_element_type")))
            e = cats["dot"][sig]
            e["count"] += 1
            e["flops"] = dot_flops(eqn)
            e["eqn_params"] = dict(eqn.params)
            e["in_shapes"] = [tuple(v.aval.shape) for v in eqn.invars]
            e["in_dtypes"] = [v.aval.dtype for v in eqn.invars]
            e["out_shape"] = tuple(eqn.outvars[0].aval.shape)
        elif "pallas" in name:
            # hybrid GroupNorm analytic backward: inputs
            # (x3, scale, bias, mean, rstd, g3) over (B, L, C)
            x3 = eqn.invars[0].aval
            sig = ("gn_bwd", tuple(x3.shape), x3.dtype.name)
            e = cats["gn_bwd"][sig]
            e["count"] += 1
            e["in_shapes"] = [tuple(v.aval.shape) for v in eqn.invars]
            e["in_dtypes"] = [v.aval.dtype for v in eqn.invars]
            # bandwidth-bound: bytes = x3 + g3 + dx (3 big arrays)
            e["flops"] = 0.0
            e["bytes"] = 3.0 * x3.size * x3.dtype.itemsize

    _walk(jaxpr.jaxpr, visit)
    return cats


# ------------------------------------------------------------------ timing

def time_conv(entry):
    import jax
    from viewfusion_tpu.utils.timing import chained_op_seconds
    p = entry["eqn_params"]
    rng = np.random.default_rng(0)
    ops = [jax.numpy.asarray(
        rng.standard_normal(s).astype(np.float32) * 0.05, dtype=d)
        for s, d in zip(entry["in_shapes"], entry["in_dtypes"])]

    def op(lhs, rhs):
        return jax.lax.conv_general_dilated(
            lhs, rhs,
            window_strides=p["window_strides"], padding=p["padding"],
            lhs_dilation=p["lhs_dilation"], rhs_dilation=p["rhs_dilation"],
            dimension_numbers=p["dimension_numbers"],
            feature_group_count=p["feature_group_count"],
            batch_group_count=p.get("batch_group_count", 1),
            precision=p.get("precision"),
            preferred_element_type=p.get("preferred_element_type"))

    return chained_op_seconds(op, ops[0], ops[1], K1=K_SHORT, K2=K_LONG)


def time_dot(entry):
    import jax
    from viewfusion_tpu.utils.timing import chained_op_seconds
    p = entry["eqn_params"]
    rng = np.random.default_rng(0)
    ops = [jax.numpy.asarray(
        rng.standard_normal(s).astype(np.float32) * 0.05, dtype=d)
        for s, d in zip(entry["in_shapes"], entry["in_dtypes"])]

    def op(lhs, rhs):
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers=p["dimension_numbers"],
            precision=p.get("precision"),
            preferred_element_type=p.get("preferred_element_type"))

    return chained_op_seconds(op, ops[0], ops[1], K1=K_SHORT, K2=K_LONG)


def time_gn_bwd(entry, groups=32, act="silu"):
    import jax.numpy as jnp
    from viewfusion_tpu.ops.groupnorm import _pallas_bwd
    from viewfusion_tpu.utils.timing import chained_op_seconds
    rng = np.random.default_rng(0)
    b, l, c = entry["in_shapes"][0]
    dt = entry["in_dtypes"][0]
    x3 = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32),
                     dtype=dt)
    scale = jnp.ones((1, c), jnp.float32)
    bias = jnp.zeros((1, c), jnp.float32)
    mean = jnp.zeros((b, 1, groups), jnp.float32)
    rstd = jnp.ones((b, 1, groups), jnp.float32)
    g3 = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32),
                     dtype=dt)

    def op(x3_, scale_, bias_, mean_, rstd_, g3_):
        dx, dsc, dbi = _pallas_bwd(x3_, scale_, bias_, mean_, rstd_, g3_,
                                   groups, 1e-6, act, False)
        return (jnp.mean(dx.astype(jnp.float32)) + jnp.mean(dsc)
                + jnp.mean(dbi))

    return chained_op_seconds(op, x3, scale, bias, mean, rstd, g3,
                              K1=K_SHORT, K2=K_LONG)


def measure_step_seconds(train_step, shapes, tx, args):
    """Real step time, bench.py discipline: donate, warm 10, best of
    3 fetch-bounded 30-step windows."""
    import time as _t
    from functools import partial

    import jax

    params = jax.jit(lambda k: jax.tree_util.tree_map(
        lambda s: jax.random.normal(k, s.shape, s.dtype) * 0.02
        if s.dtype.name.startswith(("float", "bfloat")) else
        jax.numpy.zeros(s.shape, s.dtype), shapes))(jax.random.PRNGKey(1))
    opt_state = jax.jit(tx.init)(params)
    step = jax.jit(train_step, donate_argnums=(0, 1))

    params, opt_state, loss = step(params, opt_state, **args)
    jax.block_until_ready(loss)
    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, **args)
    jax.block_until_ready(loss)
    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        for _ in range(30):
            params, opt_state, loss = step(params, opt_state, **args)
        float(loss)
        best = min(best, (_t.perf_counter() - t0) / 30)
    return best


# chain lengths for the shared marginal-slope harness (same as
# bench_stage_convs.py: slope over 128 ops swamps tunnel round-trip noise)
K_SHORT, K_LONG = 32, 160

DGRAD_STAGE = {64: "stage0_64px", 32: "stage1_32px", 16: "stage2_16px",
               8: "stage3_8px"}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--dgrad-out", default=None)
    ap.add_argument("--min-flops", type=float, default=5e7)
    ap.add_argument("--inventory-only", action="store_true",
                    help="trace + classify only (no device timing)")
    args = ap.parse_args()

    import bench
    import jax

    from viewfusion_tpu.cli import _honor_platform_env
    from viewfusion_tpu.utils.cache import enable_compilation_cache

    # sitecustomize pins the tunneled TPU platform; honor the
    # caller's JAX_PLATFORMS (CPU smoke runs must not touch the chip)
    _honor_platform_env()
    if not args.inventory_only:
        # a previous client's dying session can hold the tunneled chip
        # for minutes; probe until it actually executes
        bench.wait_for_chip(float(os.environ.get("VF_BENCH_WAIT_CHIP_S",
                                                 "1800")))
    enable_compilation_cache()

    train_step, shapes, tx, step_args = build_train_step()
    cats = inventory(train_step, shapes, tx, step_args)

    counts = {c: sum(e["count"] for e in sigs.values())
              for c, sigs in cats.items()}
    print("inventory:", counts, file=sys.stderr)
    if args.inventory_only:
        print(json.dumps(counts))
        return

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    peak_tflops = float(os.environ.get("VF_PEAK_TFLOPS_BF16", "197"))

    rows, small_flops, small_count = [], 0.0, 0
    for cat, sigs in sorted(cats.items()):
        for sig, e in sigs.items():
            if cat != "gn_bwd" and e["flops"] < args.min_flops:
                small_flops += e["flops"] * e["count"]
                small_count += e["count"]
                continue
            if cat.startswith("conv"):
                sec = time_conv(e)
            elif cat == "dot":
                sec = time_dot(e)
            else:
                sec = time_gn_bwd(e)
            row = {
                "category": cat,
                "in_shapes": [list(s) for s in e["in_shapes"]],
                "out_shape": list(e.get("out_shape", e["in_shapes"][0])),
                "dtypes": [d.name for d in e["in_dtypes"]],
                "count": e["count"],
                "ms_each": round(sec * 1e3, 4),
                "ms_total": round(sec * 1e3 * e["count"], 3),
                "gflops_each": round(e["flops"] / 1e9, 3),
                "tflops": (round(e["flops"] / sec / 1e12, 1)
                           if e["flops"] else None),
                "pct_peak": (round(e["flops"] / sec / 1e12
                                   / peak_tflops * 100, 1)
                             if e["flops"] else None),
            }
            if "bytes" in e:
                row["gbps"] = round(e["bytes"] / sec / 1e9, 1)
            rows.append(row)
            print({k: row[k] for k in
                   ("category", "count", "ms_each", "ms_total", "tflops")},
                  file=sys.stderr)

    step_s = measure_step_seconds(train_step, shapes, tx, step_args)
    step_ms = step_s * 1e3
    print(f"measured step: {step_ms:.1f} ms", file=sys.stderr)

    summary = {}
    for cat in sorted(cats):
        crows = [r for r in rows if r["category"] == cat]
        t = sum(r["ms_total"] for r in crows)
        f = sum(r["gflops_each"] * r["count"] for r in crows)
        summary[cat] = {
            "ms": round(t, 2),
            "pct_step": round(t / step_ms * 100, 1),
            "gflops": round(f, 1),
            "tflops_isolated": round(f / t, 1) if t else None,
            "pct_peak_isolated": (round(f / t / peak_tflops * 100, 1)
                                  if t else None),
        }
    accounted = sum(v["ms"] for v in summary.values())
    total_gflops = sum(v["gflops"] for v in summary.values()) \
        + small_flops / 1e9
    out = {
        "device": dev.device_kind,
        "peak_tflops_bf16_assumed": peak_tflops,
        "step_ms": round(step_ms, 2),
        "step_gflops": round(total_gflops, 1),
        "mfu_end_to_end_pct": round(
            total_gflops / step_ms / peak_tflops * 100, 1),
        "categories": summary,
        "accounted_ms": round(accounted, 2),
        "residual_ms": round(step_ms - accounted, 2),
        "residual_pct": round((step_ms - accounted) / step_ms * 100, 1),
        "small_ops": {"count": small_count,
                      "gflops_total": round(small_flops / 1e9, 3),
                      "note": "below --min-flops per call; untimed"},
        "method": ("each unique signature timed in isolation "
                   "(fetch-forced marginal slope, K=32 vs 160, adaptively "
                   "lengthened for microsecond ops); isolated "
                   "times are lower bounds (no fusion context), so the "
                   "residual upper-bounds elementwise/reduction/copy/"
                   "optimizer work plus fusion deltas"),
        "rows": rows,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.out, file=sys.stderr)

    if args.dgrad_out:
        drows = []
        for r in rows:
            if r["category"] != "conv_dgrad":
                continue
            hw = r["in_shapes"][0][1]
            drows.append({
                "case": f"dgrad_{DGRAD_STAGE.get(hw, f'{hw}px')}",
                "shape": (f"{tuple(r['in_shapes'][0])} x "
                          f"{tuple(r['in_shapes'][1])} -> "
                          f"{tuple(r['out_shape'])}"),
                "count": r["count"],
                "ms": r["ms_each"],
                "tflops": r["tflops"],
                "pct_peak": r["pct_peak"],
            })
        dout = {"device": dev.device_kind, "dtype": "bfloat16",
                "rows": sorted(drows, key=lambda d: -d["ms"] * d["count"]),
                "total_dgrad_ms": summary.get("conv_dgrad", {}).get("ms"),
                "pct_step": summary.get("conv_dgrad", {}).get("pct_step")}
        with open(args.dgrad_out, "w") as f:
            json.dump(dout, f, indent=1)
        print("wrote", args.dgrad_out, file=sys.stderr)

    print(json.dumps({"step_ms": out["step_ms"],
                      "accounted_ms": out["accounted_ms"],
                      "residual_pct": out["residual_pct"],
                      "categories": {k: v["ms"]
                                     for k, v in summary.items()}}))


if __name__ == "__main__":
    main()
