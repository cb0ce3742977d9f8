#!/usr/bin/env python
"""Full-chain sampling batch-scaling attribution (round-4 item).

BENCH_DETAIL_r03.json showed batch 8 -> 2.316 views/s but batch 28 ->
2.189 views/s and nothing explained the negative scaling.  Those two
r03 numbers differ in THREE dims at once: batch size, monolithic
generate() vs segmented chain, and frame capture on vs off.  This probe
isolates them:

  1. marginal per-chain-step cost at batch 8 / 16 / 28, measured as the
     slope between a 50-step and a 250-step jitted scan of the SAME
     p_sample body (fetch-forced; cancels dispatch + tunnel constants).
     rows/step = batch x max_views; if rows/s is flat across batches,
     the device is saturated at 48 rows and views/s CANNOT batch-scale;
  2. actual wall time of the full segmented T-step chain at each batch
     (8 x T/8 segments, per-segment fetch sync exactly like the shipped
     inference path) -> dispatch/sync overhead = wall - T x slope;
  3. at batch 8 only: monolithic generate() WITH frame capture
     (sample_num=8), reproducing the r03 2.316 views/s configuration, so
     the capture + monolith delta is quantified too.

Writes --out (merged into BENCH_DETAIL_r04.json by --merge-into).
Reference scope: reverse chain = model/view_fusion.py p_sample loop
(reference samples the full T chain for eval/inference).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,28")
    ap.add_argument("--timesteps", type=int, default=2000)
    ap.add_argument("--segments", type=int, default=8)
    ap.add_argument("--out", default=None)
    ap.add_argument("--merge-into", default=None,
                    help="also write rows into this JSON under "
                    "'batch_scaling'")
    ap.add_argument("--rng-impl", default="threefry",
                    choices=("threefry", "rbg"),
                    help="key impl for every key the chain threads: "
                    "threefry (default; counter-based software PRNG, "
                    "bit-compatible with all prior artifacts) or rbg "
                    "(XLA RngBitGenerator — the hardware-path "
                    "generator; different stream, same distribution). "
                    "A/B knob for the chain-residual RNG share.")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from viewfusion_tpu.cli import _honor_platform_env
    from viewfusion_tpu.utils.cache import enable_compilation_cache

    # sitecustomize pins the tunneled TPU platform; honor the
    # caller's JAX_PLATFORMS (CPU smoke runs must not touch the chip)
    _honor_platform_env()
    enable_compilation_cache()

    def mk_key(seed):
        if args.rng_impl == "threefry":
            return jax.random.PRNGKey(seed)
        return jax.random.key(seed, impl=args.rng_impl)

    from bench import FLAGSHIP
    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion, view_mask

    import copy
    raw = copy.deepcopy(FLAGSHIP)
    for ph in raw["model"]["view_fusion_params"]["beta_schedule"].values():
        ph["num_timesteps"] = args.timesteps
    cfg = Config.from_dict(raw)
    model = ViewFusion.from_config(cfg)
    n, hw = cfg.data.max_views, cfg.unet.image_size
    T, nseg = args.timesteps, args.segments
    assert T % nseg == 0
    seg_len = T // nseg
    probe_short = min(max(10, seg_len // 5), max(1, seg_len // 2))

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}; T={T} segments={nseg} "
        f"(seg_len={seg_len}, probe={probe_short}/{seg_len})")

    rng = np.random.default_rng(0)
    rows_out = []
    params = None

    for b in [int(x) for x in args.batches.split(",")]:
        cond = jnp.asarray(rng.uniform(0, 1, (b, n, hw, hw, 3))
                           .astype(np.float32))
        y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3))
                         .astype(np.float32))
        vc = jnp.full((b,), n, jnp.int32)
        angle = jnp.zeros((b,), jnp.float32)
        mask = view_mask(vc, n)
        if params is None:
            params = jax.jit(model.init)(jax.random.PRNGKey(0), cond, y0)

        @jax.jit
        def seg(params, y_t, key, ts):
            def body(carry, t):
                y_t, k = carry
                k, sub = jax.random.split(k)
                y_t, _, _ = model.p_sample(params, sub, y_t, cond, mask,
                                           angle, t)
                return (y_t, k), None

            (y_t, key), _ = jax.lax.scan(body, (y_t, key), ts)
            return y_t, key

        def run_len(length, start, key):
            ts = jnp.arange(start, start - length, -1)
            y_t = jax.random.normal(key, (b, hw, hw, 3), jnp.float32)
            y_t, key2 = seg(params, y_t, key, ts)
            return y_t, key2

        # marginal slope: short vs one-segment-length scans
        def timed(length):
            key = mk_key(7)
            y, _ = run_len(length, T - 1, key)  # warm (compile/cache)
            float(jnp.sum(y[0, 0, 0]))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                y, _ = run_len(length, T - 1, key)
                float(jnp.sum(y[0, 0, 0]))
                best = min(best, time.perf_counter() - t0)
            return best

        t_short, t_long = timed(probe_short), timed(seg_len)
        per_step = (t_long - t_short) / (seg_len - probe_short)
        rows = b * n
        implied_views = rows / (per_step * T)

        # actual full segmented chain (shipped inference shape: fetch
        # sync after each segment keeps every execution under the rig's
        # per-execution limit)
        ts_all = np.arange(T - 1, -1, -1).reshape(nseg, seg_len)
        key = mk_key(11)
        key, sub = jax.random.split(key)
        y_t = jax.random.normal(sub, (b, hw, hw, 3), jnp.float32)
        t0 = time.perf_counter()
        for s in range(nseg):
            y_t, key = seg(params, y_t, key, jnp.asarray(ts_all[s]))
            float(jnp.sum(y_t[0, 0, 0]))
        wall = time.perf_counter() - t0
        assert np.isfinite(np.asarray(y_t)).all()

        row = {
            "batch": b,
            "rows_per_step": rows,
            "per_step_ms": round(per_step * 1e3, 3),
            "device_rows_per_sec": round(rows / per_step, 1),
            "implied_views_per_sec": round(implied_views, 3),
            "chain_wall_s": round(wall, 2),
            "actual_views_per_sec": round(rows / wall, 3),
            "overhead_s": round(wall - per_step * T, 2),
            "overhead_pct": round((wall - per_step * T) / wall * 100, 1),
        }
        rows_out.append(row)
        log(str(row))

    # batch-8 monolithic generate() with frame capture = the r03
    # 2.316 views/s configuration, to price capture + monolith delta
    b = 8
    cond = jnp.asarray(rng.uniform(0, 1, (b, n, hw, hw, 3))
                       .astype(np.float32))
    vc = jnp.full((b,), n, jnp.int32)
    angle = jnp.zeros((b,), jnp.float32)
    gen = jax.jit(lambda p, k: model.generate(p, k, cond, vc, angle,
                                              sample_num=8))
    out = gen(params, mk_key(1))
    jax.block_until_ready(out.y_t)
    t0 = time.perf_counter()
    for i in range(2):
        out = gen(params, mk_key(2 + i))
    jax.block_until_ready(out.y_t)
    mono_dt = (time.perf_counter() - t0) / 2
    mono = {
        "batch": b,
        "what": "monolithic generate() with 8-frame capture "
                "(r03 headline config)",
        "chain_wall_s": round(mono_dt, 2),
        "actual_views_per_sec": round(b * n / mono_dt, 3),
    }
    log(str(mono))

    flat = (max(r["device_rows_per_sec"] for r in rows_out)
            / min(r["device_rows_per_sec"] for r in rows_out))
    doc = {
        "device": dev.device_kind,
        "timesteps": T,
        "segments": nseg,
        "rng_impl": args.rng_impl,
        "rows": rows_out,
        "monolithic_capture_batch8": mono,
        "rows_per_sec_max_over_min": round(flat, 3),
        "conclusion": (
            (f"device rows/s is flat across the row range (max/min "
             f"{flat:.2f}x): the chain step saturates the chip at the "
             "smallest batch already, so views/s cannot batch-scale; "
             "the wall-vs-implied gap is per-segment host sync "
             "(overhead_s), and the r03 batch-8-vs-28 'negative "
             "scaling' was this saturation plus segmentation overhead, "
             "not a regression")
            if flat < 1.15 else
            (f"device rows/s RISES {flat:.2f}x across the row range — "
             "the chip is NOT saturated at small batch; the r03 gap "
             "must be attributed to the overhead_s column instead")),
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        log(f"wrote {args.out}")
    if args.merge_into:
        base = (json.load(open(args.merge_into))
                if os.path.exists(args.merge_into) else {})
        base["batch_scaling"] = doc
        with open(args.merge_into, "w") as f:
            json.dump(base, f, indent=1)
        log(f"merged into {args.merge_into}")
    print(json.dumps({"rows": rows_out, "flat_ratio": round(flat, 3)}))


if __name__ == "__main__":
    main()
