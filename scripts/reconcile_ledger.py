#!/usr/bin/env python
"""Reconcile the isolation MFU ledger against the in-context trace.

VERDICT r4 weak #5: the "closed" ledger's two artifacts disagree —
isolation (MFU_LEDGER_r04.json) times conv fwd+dgrad+wgrad at 46.8 ms
while the trace breakdown (RESIDUAL_r04.json) bins only 24.8 ms as
`conv`, with the rest presumably hiding inside `custom_call` and
`unmatched` — "but no mapping is given".  This script GIVES the
mapping:

  1. every trace instruction whose fusion body contains a
     `convolution` (or whose opcode is `convolution`) is a conv-bearing
     instruction, whatever category the coarse classifier binned it to;
  2. each is joined to the isolation ledger's conv signatures by output
     shape (exact dims, then dim-multiset for layout-transposed
     backward convs);
  3. the artifact reports, per shape: isolated ms vs in-context ms and
     WHICH trace category the in-context time was originally binned to
     — so "conv 46.8 vs 24.8" becomes a per-shape table whose totals
     either meet or show a measured fusion delta.

Needs RESIDUAL_rNN.json written with --all-rows (every instruction, not
just the top-40) and the matching MFU_LEDGER artifact.

Usage:
  python scripts/reconcile_ledger.py MFU_LEDGER_r04.json \
      RESIDUAL_r05.json --out RECONCILE_r05.json
"""

import argparse
import json
import re
import sys
from collections import defaultdict

# `%name = bf16[98,64,64,3]{...} fusion(...)` — first array type on the
# line is the instruction's output (tuple types: take the first element).
_SHAPE_RE = re.compile(r"=\s+\(?\s*(\w+)\[([\d,]*)\]")


def out_shape(hlo_line):
    m = _SHAPE_RE.search(hlo_line)
    if not m:
        raise ValueError(f"cannot parse output shape: {hlo_line[:120]}")
    dims = tuple(int(d) for d in m.group(2).split(",") if d)
    return m.group(1), dims


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ledger")
    ap.add_argument("residual")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    ledger = json.load(open(args.ledger))
    residual = json.load(open(args.residual))
    rows = residual["top_ops"]
    if len(rows) <= 40:
        print("WARNING: residual artifact has <=40 rows — re-run "
              "residual_breakdown.py with --all-rows for a complete "
              "join; totals below will be LOWER bounds.",
              file=sys.stderr)

    # ---- trace side: conv-bearing instructions --------------------
    trace_convs = []
    for r in rows:
        ops = r.get("opcodes", {})
        if ops.get("convolution") or r.get("hlo", "").lstrip("%").startswith(
                "convolution"):
            dtype, dims = out_shape(r["hlo"])
            trace_convs.append({
                "name": r["name"], "ms": r["ms"],
                "binned_as": r["category"],
                "out_dtype": dtype, "out_shape": dims,
                "n_convs_in_body": ops.get("convolution", 1),
            })

    # ---- isolation side: conv signatures --------------------------
    iso = [r for r in ledger["rows"]
           if r["category"] in ("conv_fwd", "conv_dgrad", "conv_wgrad")]

    by_exact = defaultdict(list)
    by_multiset = defaultdict(list)
    for t in trace_convs:
        by_exact[t["out_shape"]].append(t)
        by_multiset[tuple(sorted(t["out_shape"]))].append(t)

    matched_trace = set()
    table, iso_total, ctx_total = [], 0.0, 0.0
    unmatched_iso = []
    for r in iso:
        shape = tuple(r["out_shape"])
        cands = [t for t in by_exact.get(shape, [])
                 if t["name"] not in matched_trace]
        how = "exact"
        if not cands:
            cands = [t for t in
                     by_multiset.get(tuple(sorted(shape)), [])
                     if t["name"] not in matched_trace]
            how = "dim-multiset"
        if not cands:
            unmatched_iso.append({
                "category": r["category"],
                "out_shape": list(shape),
                "ms_isolated": r["ms_total"],
            })
            continue
        # a signature can appear count>1 times; absorb as many trace
        # instructions of this shape as the signature counts
        take = cands[:max(r["count"], 1)]
        for t in take:
            matched_trace.add(t["name"])
        ctx_ms = sum(t["ms"] for t in take)
        iso_total += r["ms_total"]
        ctx_total += ctx_ms
        table.append({
            "category": r["category"],
            "out_shape": list(shape),
            "count": r["count"],
            "ms_isolated": r["ms_total"],
            "ms_in_context": round(ctx_ms, 3),
            "trace_binned_as": sorted({t["binned_as"] for t in take}),
            "trace_instrs": [t["name"] for t in take],
            "match": how,
        })
    table.sort(key=lambda x: -x["ms_isolated"])

    leftover_trace = [t for t in trace_convs
                      if t["name"] not in matched_trace]

    # ---- where did the trace classifier bin the conv time? --------
    binned = defaultdict(float)
    for t in trace_convs:
        binned[t["binned_as"]] += t["ms"]

    out = {
        "what": ("per-shape join of the isolation MFU ledger's conv "
                 "signatures against conv-bearing instructions in the "
                 "in-context trace (VERDICT r4 weak #5: conv 46.8 ms "
                 "isolated vs 24.8 ms trace-binned-as-conv)"),
        "ledger": args.ledger,
        "residual": args.residual,
        "iso_conv_ms_total": round(sum(r["ms_total"] for r in iso), 3),
        "trace_conv_bearing_ms_total": round(
            sum(t["ms"] for t in trace_convs), 3),
        "trace_conv_ms_by_original_bin": {
            k: round(v, 3) for k, v in sorted(binned.items(),
                                              key=lambda kv: -kv[1])},
        "matched": {
            "n_iso_signatures": len(table),
            "ms_isolated": round(iso_total, 3),
            "ms_in_context": round(ctx_total, 3),
            "fusion_delta_ms": round(ctx_total - iso_total, 3),
        },
        "unmatched_iso_signatures": unmatched_iso,
        "unmatched_trace_conv_instrs": [
            {"name": t["name"], "ms": round(t["ms"], 3),
             "out_shape": list(t["out_shape"]),
             "binned_as": t["binned_as"]}
            for t in sorted(leftover_trace, key=lambda t: -t["ms"])],
        "per_shape": table,
        "note": ("ms_in_context < ms_isolated per shape is the expected "
                 "direction: in context XLA fuses producers/consumers "
                 "into the conv and overlaps HBM fetches that the "
                 "isolated timing pays serially; the reconciliation "
                 "closes when iso - ctx equals the measured fusion "
                 "delta rather than disappearing into 'unmatched'."),
    }
    txt = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(txt)
        print(f"wrote {args.out}")
        print(json.dumps({k: out[k] for k in (
            "iso_conv_ms_total", "trace_conv_bearing_ms_total",
            "trace_conv_ms_by_original_bin", "matched")}, indent=1))
    else:
        print(txt)


if __name__ == "__main__":
    main()
