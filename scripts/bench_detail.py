#!/usr/bin/env python
"""Detailed TPU benchmarks: train step, full reverse-chain sampling
throughput (views/sec — the BASELINE.md north-star metric), and the
Pallas-vs-XLA attention microbenchmark.

Run on the real chip:  python scripts/bench_detail.py [--quick]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(fn, iters, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--timesteps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=28)
    p.add_argument("--gen-batch", type=int, default=8)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from viewfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import FLAGSHIP
    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion
    from viewfusion_tpu.ops.attention import (
        _pallas_attention,
        _xla_attention,
    )

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev}")

    # ---- attention microbench (16x16 tokens, paper channels) ----------
    if on_tpu:
        for s, c in [(256, 192), (64, 320)]:
            b = args.batch * 6
            rng = np.random.default_rng(0)
            q, k, v = (
                jnp.asarray(rng.standard_normal((b, s, c)).astype(
                    np.float32))
                for _ in range(3)
            )
            scale = 1.0 / np.sqrt(c)
            t_pal = timeit(
                jax.jit(lambda q, k, v: _pallas_attention(q, k, v, scale)),
                20, q, k, v,
            )
            t_xla = timeit(
                jax.jit(lambda q, k, v: _xla_attention(q, k, v, scale)),
                20, q, k, v,
            )
            log(f"attention (B={b}, S={s}, C={c}): pallas {t_pal*1e3:.2f}ms "
                f"xla {t_xla*1e3:.2f}ms  ratio {t_xla/t_pal:.2f}x")

    # ---- full sampling chain ------------------------------------------
    cfg_dict = {k: v for k, v in FLAGSHIP.items()}
    cfg_dict["model"]["view_fusion_params"]["beta_schedule"]["train"][
        "num_timesteps"
    ] = args.timesteps
    cfg = Config.from_dict(cfg_dict)
    model = ViewFusion.from_config(cfg)

    # Chain batch is capped separately from the attention microbench:
    # a single T=2000 execution at batch 28 runs ~73 s on-device, which
    # exceeds the tunneled dev rig's per-execution limit (it aborts with
    # UNAVAILABLE).  Batch 8 keeps one execution ~21 s and views/s is
    # batch-normalized anyway; --gen-batch overrides on real hosts.
    b = 4 if args.quick else args.gen_batch
    n, hw = cfg.data.max_views, 64
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(
        np.float32))
    vc = jnp.full((b,), n, jnp.int32)
    angle = jnp.zeros((b,), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), cond, y0)

    gen = jax.jit(
        lambda p, k: model.generate(p, k, cond, vc, angle, sample_num=8)
    )
    t0 = time.perf_counter()
    out = gen(params, jax.random.PRNGKey(1))
    jax.block_until_ready(out.y_t)
    log(f"generate compile+run: {time.perf_counter() - t0:.1f}s")

    iters = 1 if args.quick else 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = gen(params, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(out.y_t)
    dt = (time.perf_counter() - t0) / iters
    # every sample denoises `n` conditioning views through the full chain
    views_per_sec = b * n / dt
    samples_per_sec = b / dt
    log(
        f"sampling: T={args.timesteps} batch={b} views={n}: {dt:.2f}s/batch"
        f" -> {samples_per_sec:.3f} samples/s, {views_per_sec:.2f} views/s"
    )
    # Reference: 4xV100 generates a batch of 112 (28/GPU) with ~3.5 avg
    # views through 2000 UNet passes; no published number — derive the
    # achievable bound from its train rate in BASELINE.md instead.
    # ---- DDIM fast sampler -------------------------------------------
    gen_ddim = jax.jit(
        lambda p, k: model.generate_ddim(p, k, cond, vc, angle,
                                         num_steps=50)
    )
    t0 = time.perf_counter()
    o = gen_ddim(params, jax.random.PRNGKey(9))
    jax.block_until_ready(o)
    log(f"ddim compile+run: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for i in range(iters * 4):
        o = gen_ddim(params, jax.random.PRNGKey(10 + i))
    jax.block_until_ready(o)
    ddim_dt = (time.perf_counter() - t0) / (iters * 4)
    log(f"ddim-50 sampling: {ddim_dt:.2f}s/batch -> "
        f"{b / ddim_dt:.2f} samples/s, {b * n / ddim_dt:.1f} views/s")

    import json

    out = {
        "samples_per_sec": round(samples_per_sec, 4),
        "views_per_sec": round(views_per_sec, 3),
        "seconds_per_batch": round(dt, 3),
        "timesteps": args.timesteps,
        "batch": b,
        "ddim50_samples_per_sec": round(b / ddim_dt, 3),
        "ddim50_views_per_sec": round(b * n / ddim_dt, 2),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
