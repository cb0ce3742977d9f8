#!/usr/bin/env python
"""In-context residual attribution for the flagship packed train step.

The round-4 MFU ledger (MFU_LEDGER_r04.json) times every FLOP-bearing
op in ISOLATION and leaves a 35.8 ms residual bucket ("elementwise,
optimizer, copies, fusion deltas").  This script attributes that bucket
IN CONTEXT: it captures a jax.profiler trace of the exact shipped step
(same construction as scripts/bench_mfu_ledger.py), sums device
self-time per HLO instruction from the perfetto trace, and classifies
every instruction by parsing the compiled HLO text — so each fusion is
labeled by what it computes (GroupNorm forward statistics/normalize,
attention softmax, Adam update, concatenates/copies, ...) rather than
just "fusion".

Writes RESIDUAL_rNN.json: per-category in-context milliseconds summing
to the traced step time, plus the top-N individual ops with their
opcode signatures for auditability.

``--program chain`` applies the same attribution to the reverse-
sampling scan segment (the chain_ledger/bench_chain_scaling program):
a lax.scan of p_sample steps is traced and every category is reported
PER CHAIN STEP — this is what attributes CHAIN_LEDGER_r05.json's
isolation residual in context (scan-body ops live in the while-body
computation, which parse_hlo indexes alongside the entry).

Reference scope: attributes the same training update the ledger
accounts (view_fusion.py:131-142 + experiment.py:218-256 of the
reference, one optimizer step).
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# ------------------------------------------------------------------ HLO text

# type is either a scalar/array type (no spaces) or a tuple type, which
# may contain one level of nested parens inside layout annotations,
# e.g. (f32[98,64]{0,1:T(8,128)S(1)}, bf16[...])
_OPCODE_RE = re.compile(
    r"=\s+(?:\((?:[^()]|\([^()]*\))*\)\s+|\S+\s+)([a-z][a-z0-9._-]*)\(")
_CALLS_RE = re.compile(r"calls=%?([\w.-]+)")
_FUSION_KIND_RE = re.compile(r"kind=(\w+)")


def parse_hlo(text):
    """name -> dict(opcode, kind, body_opcodes, line) for every
    instruction of every computation (device-executed thunks live in
    the entry AND in control-flow bodies — a lax.scan's per-step ops
    are instructions of the while-body computation), plus
    computation -> opcode multiset for fusion bodies.  Entry
    instructions win on (rare) cross-computation name collisions."""
    comp_ops = {}       # computation name -> {opcode: count}
    cur = None
    instr = {}
    entry = None
    for line in text.splitlines():
        s = line.strip()
        # computation header: "name (params...) -> type {".  The param
        # list may contain nested parens (tuple-typed params, e.g. a
        # while-body carry), so don't try to span it with a regex —
        # require name + "(" and the "->"/"{" markers instead.
        m = re.match(r"(?:ENTRY\s+)?%?([\w.-]+)\s+\(", s)
        if m and "=" not in s.split("(", 1)[0] and "->" in s \
                and s.endswith("{"):
            cur = m.group(1)
            comp_ops[cur] = defaultdict(int)
            if s.startswith("ENTRY"):
                entry = cur
            continue
        if s == "}":
            cur = None
            continue
        if cur is None or "=" not in s:
            continue
        om = _OPCODE_RE.search(s)
        if not om:
            continue
        opcode = om.group(1)
        comp_ops[cur][opcode] += 1
        name = s.split("=", 1)[0].strip().lstrip("%").strip()
        instr.setdefault(cur, {})[name] = (opcode, s)
    out = {}
    comps = [c for c in instr if c != entry]
    if entry is not None:
        comps.append(entry)  # last: entry wins collisions
    for comp in comps:
        for name, (opcode, line) in instr[comp].items():
            body = {}
            kind = ""
            if opcode == "fusion":
                cm = _CALLS_RE.search(line)
                if cm and cm.group(1) in comp_ops:
                    body = dict(comp_ops[cm.group(1)])
                km = _FUSION_KIND_RE.search(line)
                kind = km.group(1) if km else ""
            out[name] = {"opcode": opcode, "kind": kind, "body": body,
                         "line": line[:240]}
    return out


def classify(name, info):
    """Category label from the opcode signature of the instruction."""
    op = info["opcode"]
    body = info["body"]
    line = info["line"]

    def has(*ops):
        return any(o in body for o in ops)

    if op.startswith("convolution") or has("convolution"):
        return "conv"
    if op == "custom-call" or has("custom-call"):
        return "custom_call(pallas)" if "tpu_custom_call" in line \
            else "custom_call"
    if op == "dot" or has("dot"):
        return "dot"
    if op in ("copy", "copy-start", "copy-done", "bitcast", "transpose",
              "reshape"):
        return "layout_copy"
    if op in ("all-reduce", "all-gather", "reduce-scatter"):
        return "collective"
    if op == "fusion":
        # order matters: most specific signature first
        if has("scatter"):
            return "scatter_pack"
        if has("gather"):
            return "gather_pack"
        if has("reduce-window"):
            return "pool"
        if has("rng-bit-generator"):
            return "rng"
        if has("sqrt") and has("power") is False and has("reduce") is False \
                and has("divide"):
            return "adam_update"
        if has("exponential") and has("reduce"):
            return "softmax"
        if has("logistic") and has("reduce"):
            return "gn_fwd_stats+silu"
        if has("rsqrt") and has("reduce"):
            return "gn_fwd_stats"
        if has("rsqrt") or (has("subtract") and has("multiply")
                            and has("reduce")):
            return "norm_elementwise"
        if has("logistic"):
            return "silu_elementwise"
        if has("reduce"):
            return "reduce_other"
        if has("concatenate"):
            return "concat"
        if has("pad"):
            return "pad"
        if has("convert") and len(body) <= 3:
            return "convert"
        if has("dynamic-update-slice") or has("dynamic-slice"):
            return "dslice"
        return "elementwise_other"
    return f"op:{op}"


# ------------------------------------------------------------------ trace

def device_self_times(trace_dir):
    """Sum wall duration per event name on the TPU XLA-op tracks of the
    newest perfetto trace under ``trace_dir``.  Returns (name -> us)."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # find (pid, tid) pairs whose thread name says XLA Ops
    tid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    op_tracks = {k for k, v in tid_name.items()
                 if "XLA Ops" in v or "Ops" == v.strip()}
    if not op_tracks:
        # No unfiltered-pid fallback: summing every complete event on a
        # TPU-ish pid double-counts nested/overlapping spans and step
        # markers, silently skewing the attribution this script exists
        # to produce (ADVICE r4). Fail loudly like the no-events case.
        raise SystemExit(
            f"no 'XLA Ops' thread track in {path}; refusing the "
            f"unfiltered pid fallback (it double-counts nested spans). "
            f"tracks={sorted(set(tid_name.values()))[:20]}")
    agg = defaultdict(float)
    n_evt = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        if (e.get("pid"), e.get("tid")) not in op_tracks:
            continue
        agg[e["name"]] += e.get("dur", 0.0)
        n_evt += 1
    if not agg:
        raise SystemExit(
            f"no XLA-op events found in {path}; "
            f"tracks={sorted(set(tid_name.values()))[:20]}")
    print(f"trace: {n_evt} op events on {len(op_tracks)} "
          f"track(s) from {os.path.basename(path)}", file=sys.stderr)
    return agg


# ------------------------------------------------------------------ main

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--program", choices=("train", "chain"),
                    default="train",
                    help="train: the flagship packed train step (the "
                         "bench_mfu_ledger program). chain: a lax.scan "
                         "segment of ancestral p_sample steps (the "
                         "chain_ledger/bench_chain_scaling scan body) — "
                         "per-category times are reported PER CHAIN "
                         "STEP (divided by --seg-len)")
    ap.add_argument("--seg-len", type=int, default=250,
                    help="chain program: scan steps per segment")
    ap.add_argument("--batch", type=int, default=8,
                    help="chain program: sample batch")
    ap.add_argument("--timesteps", type=int, default=2000,
                    help="chain program: schedule length")
    ap.add_argument("--outdir", default="/tmp/vf_residual_trace")
    ap.add_argument("--out", default="RESIDUAL_r04.json")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--all-rows", action="store_true",
                    help="write EVERY instruction row to the artifact "
                         "(needed by scripts/reconcile_ledger.py's "
                         "per-shape conv join)")
    ap.add_argument("--dump-hlo", default=None,
                    help="write the compiled HLO text here")
    ap.add_argument("--hlo-only", action="store_true",
                    help="lower+compile+dump only; skip execution/trace")
    args = ap.parse_args()

    import jax

    from viewfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    import time

    # per_step_div: trace-event sums are divided by (iters * per_step_div)
    # so categories are always per LOGICAL step (train step / chain step).
    if args.program == "train":
        import bench_mfu_ledger as ledger

        train_step, shapes, tx, call_args = ledger.build_train_step()

        # same param-init discipline as ledger.measure_step_seconds
        params = jax.jit(lambda k: jax.tree_util.tree_map(
            lambda s: jax.random.normal(k, s.shape, s.dtype) * 0.02
            if s.dtype.name.startswith(("float", "bfloat")) else
            jnp.zeros(s.shape, s.dtype), shapes))(jax.random.PRNGKey(1))
        opt_state = jax.jit(tx.init)(params)
        jit_fn = jax.jit(train_step, donate_argnums=(0, 1))
        lower_args = (params, opt_state)
        per_step_div = 1

        def make_runner(compiled):
            state = [params, opt_state]

            def run():
                state[0], state[1], loss = compiled(*state, **call_args)
                return loss

            return run
    else:
        from chain_ledger import build_chain_step

        model, params, step, dims = build_chain_step(args.batch,
                                                     args.timesteps)
        b, hw = dims["batch"], dims["hw"]

        def seg(params, y_t, key, ts):
            def body(carry, t):
                y_t, k = carry
                y_t, k = step(params, y_t, k, t)
                return (y_t, k), None

            (y_t, key), _ = jax.lax.scan(body, (y_t, key), ts)
            return y_t, key

        ts0 = jnp.arange(args.timesteps - 1,
                         args.timesteps - 1 - args.seg_len, -1)
        key0 = jax.random.PRNGKey(7)
        y0 = jax.random.normal(key0, (b, hw, hw, 3), jnp.float32)
        call_args = {}
        jit_fn = jax.jit(seg)
        lower_args = (params, y0, key0, ts0)
        per_step_div = args.seg_len

        def make_runner(compiled):
            def run():
                y, k = compiled(params, y0, key0, ts0)
                return y

            return run

    t0 = time.perf_counter()
    lowered = jit_fn.lower(*lower_args, **call_args)
    print(f"lowered in {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()  # call THIS object; jit would recompile
    print(f"compiled in {time.perf_counter() - t0:.1f}s", file=sys.stderr,
          flush=True)
    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
        print(f"HLO text -> {args.dump_hlo}", file=sys.stderr, flush=True)
    instrs = parse_hlo(hlo)
    print(f"HLO: {len(instrs)} instructions indexed (all computations)",
          file=sys.stderr, flush=True)
    if args.hlo_only:
        return

    run = make_runner(compiled)
    n_warm = 30 if args.program == "train" else 2
    n_trace = args.iters if args.program == "train" else max(
        1, min(args.iters, 3))
    out_val = run()
    jax.block_until_ready(out_val)
    t0 = time.perf_counter()
    for _ in range(n_warm):
        out_val = run()
    jax.block_until_ready(out_val)
    step_ms = (time.perf_counter() - t0) / n_warm / per_step_div * 1e3
    print(f"measured step: {step_ms:.2f} ms", file=sys.stderr, flush=True)

    os.makedirs(args.outdir, exist_ok=True)
    jax.profiler.start_trace(args.outdir)
    for _ in range(n_trace):
        out_val = run()
    jax.block_until_ready(out_val)
    jax.profiler.stop_trace()

    agg = device_self_times(args.outdir)
    per_iter = {k: v / (n_trace * per_step_div) for k, v in agg.items()}
    total_ms = sum(per_iter.values()) / 1e3

    # Pallas kernels appear on the XLA-op track under their own kernel
    # names (GroupNorm_0, _bwd_kernel, flash attention names, ...), not
    # the HLO %pallas_call instruction name — map them explicitly
    # instead of letting them land in "unmatched" (r4: 17.6 ms of
    # "unmatched" was mostly these).
    _PALLAS_PREFIXES = ("GroupNorm", "gn_", "_fwd_kernel", "_bwd_kernel",
                        "attention", "flash", "wgrad")

    cats = defaultdict(float)
    rows = []
    unmatched = 0.0
    excluded_wrapper_us = 0.0
    for name, us in per_iter.items():
        info = instrs.get(name)
        if info is None:
            base = name.split(".")[0]
            info = instrs.get(base)
        # control-flow wrapper spans cover their body ops, which the
        # trace also reports individually — summing both double-counts
        # the entire loop (seen: a scan's `while` span = 100% of the
        # segment). Exclude the wrapper, keep the children.
        if info is not None and info["opcode"] in ("while", "conditional",
                                                   "call"):
            excluded_wrapper_us += us
            continue
        if info is None and name.split(".")[0] in ("while", "conditional",
                                                   "call"):
            excluded_wrapper_us += us
            continue
        if info is None:
            if any(name.startswith(p) or base.startswith(p)
                   for p in _PALLAS_PREFIXES):
                cat = "custom_call(pallas)"
            else:
                cat = "unmatched"
                unmatched += us
            sig = {}
            line = ""
        else:
            cat = classify(name, info)
            sig = info["body"] or {info["opcode"]: 1}
            line = info["line"]
        cats[cat] += us
        rows.append({"name": name, "ms": us / 1e3, "category": cat,
                     "opcodes": sig, "hlo": line[:200]})
    rows.sort(key=lambda r: -r["ms"])

    total_ms -= excluded_wrapper_us / 1e3  # wrapper spans double-count
    print(f"\ntraced device time/iter: {total_ms:.2f} ms "
          f"(measured step {step_ms:.2f} ms)")
    print(f"{'category':26s} {'ms':>8s} {'%':>6s}")
    for k, v in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{k:26s} {v / 1e3:8.3f} {100 * v / 1e3 / total_ms:6.1f}")

    out = {
        "device": jax.devices()[0].device_kind,
        "program": args.program,
        "iters": n_trace,
        **({"seg_len": args.seg_len, "batch": args.batch,
            "timesteps": args.timesteps}
           if args.program == "chain" else {}),
        "measured_step_ms": round(step_ms, 3),
        "traced_device_ms_per_iter": round(total_ms, 3),
        "excluded_control_flow_wrapper_ms": round(
            excluded_wrapper_us / 1e3, 4),
        "categories_ms": {k: round(v / 1e3, 4)
                          for k, v in sorted(cats.items(),
                                             key=lambda kv: -kv[1])},
        "top_ops": rows if args.all_rows else rows[:args.top],
        "method": ("perfetto trace XLA-op track summed per instruction "
                   "over N iters; each instruction classified from the "
                   "compiled HLO fusion body opcodes"),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
