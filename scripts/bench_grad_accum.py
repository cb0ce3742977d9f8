#!/usr/bin/env python
"""On-chip measurement for tpu.grad_accum (ACCUM_r03.json).

Three questions, answered at the flagship packed config (small family:
max_views 6, 64px, bf16, microbatch 28 = the reference's per-GPU batch):

  1. What does the accumulation machinery cost?  batch 112 direct
     (K=1) vs batch 112 as 4x28 microbatches (K=4) — same effective
     work per optimizer step, so samples/s exposes the scan + grad-
     carry overhead.
  2. Does it scale past the direct path's memory?  batch 448 as 16x28.
  3. Does batch 448 even run directly?  attempted LAST (an OOM must
     not poison earlier rows); success or the trimmed error is
     recorded either way.

Model-level step (same harness as scripts/bench_configs.py); the
trainer-integrated accum path is pinned by tests/test_grad_accum.py.

Usage: python scripts/bench_grad_accum.py --out ACCUM_r03.json
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

MAX_VIEWS = 6
HW = 64


def _make_model():
    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion

    cfg = Config.from_dict({
        "model": {
            "denoise_net": "unet",
            "view_fusion_params": {"beta_schedule": {
                "train": {"schedule": "linear", "num_timesteps": 2000,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "test": {"schedule": "linear", "num_timesteps": 1000,
                         "linear_start": 1e-4, "linear_end": 0.09},
            }},
            "denoise_net_params": {
                "image_size": HW, "in_channel": 6, "out_channel": 6,
                "inner_channel": 64, "res_blocks": 3, "attn_res": [16],
                "channel_mults": [1, 2, 3, 5],
            },
        },
        "data": {"params": {"max_views": MAX_VIEWS, "batch_size": 28}},
        "tpu": {"compute_dtype": "bfloat16"},
    })
    return ViewFusion.from_config(cfg)


def _micro_data(rng, mb, salt):
    from viewfusion_tpu.training.trainer import (
        Experiment,
        stratified_count_multiset,
    )

    y0 = rng.uniform(0, 1, (mb, HW, HW, 3)).astype(np.float32)
    cond = rng.uniform(0, 1, (mb, MAX_VIEWS, HW, HW, 3)).astype(np.float32)
    counts = stratified_count_multiset(mb, MAX_VIEWS)
    np.random.default_rng(salt).shuffle(counts)
    si, vi = Experiment._packed_indices(counts)
    angle = rng.uniform(0, 2 * np.pi, (mb,)).astype(np.float32)
    return y0, cond, counts.astype(np.int32), angle, si, vi


def bench_row(model, batch, accum, iters=30, windows=3):
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from viewfusion_tpu.training.schedulers import lr_schedule

    mb = batch // accum
    rng = np.random.default_rng(0)
    micros = [_micro_data(rng, mb, k) for k in range(accum)]
    stacked = tuple(
        jnp.asarray(np.stack([m[i] for m in micros]))
        for i in range(6)
    )  # each (K, mb, ...)

    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, jnp.zeros((2, MAX_VIEWS, HW, HW, 3)), jnp.zeros((2, HW, HW, 3))
    )
    tx = optax.adam(lr_schedule())
    opt_state = jax.jit(tx.init)(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key, data):
        def micro_loss(p, xs, k):
            y0, cond, vc, angle, si, vi = xs
            return model.loss_packed(
                p, jax.random.fold_in(key, k), y0, cond, vc, angle, si, vi
            )

        if accum == 1:
            xs = jax.tree_util.tree_map(lambda a: a[0], data)
            loss, grads = jax.value_and_grad(micro_loss)(
                params, xs, jnp.zeros((), jnp.int32)
            )
        else:
            def body(carry, xsk):
                xs, k = xsk
                l, g = jax.value_and_grad(micro_loss)(params, xs, k)
                g_acc, l_acc = carry
                return (jax.tree_util.tree_map(jnp.add, g_acc, g),
                        l_acc + l), None

            init = (jax.tree_util.tree_map(jnp.zeros_like, params),
                    jnp.zeros((), jnp.float32))
            (g_sum, l_sum), _ = lax.scan(
                body, init, (data, jnp.arange(accum))
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
            loss = l_sum / accum
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, key, stacked)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    for i in range(10):
        key = jax.random.fold_in(key, i)
        params, opt_state, loss = step(params, opt_state, key, stacked)
    jax.block_until_ready(loss)
    best = 0.0
    for _ in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            key = jax.random.fold_in(key, 100 + i)
            params, opt_state, loss = step(params, opt_state, key, stacked)
        jax.block_until_ready(loss)
        best = max(best, iters / (time.perf_counter() - t0))
    return {
        "batch": batch,
        "grad_accum": accum,
        "microbatch": mb,
        "steps_per_sec": round(best, 4),
        "samples_per_sec": round(best * batch, 2),
        "compile_s": round(compile_s, 1),
        "loss": float(loss),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="ACCUM_r03.json")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from viewfusion_tpu.cli import _honor_platform_env

    _honor_platform_env()
    import jax

    dev = jax.devices()[0]
    model = _make_model()
    rows = []
    # direct-448 LAST: a RESOURCE_EXHAUSTED there must not disturb the
    # measured rows
    for batch, accum in ((28, 1), (112, 1), (112, 4), (448, 16)):
        print(f"bench batch={batch} accum={accum} ...", flush=True)
        rows.append(bench_row(model, batch, accum, iters=args.iters))
        print(rows[-1], flush=True)
    try:
        print("bench batch=448 accum=1 (direct; may OOM) ...", flush=True)
        rows.append(bench_row(model, 448, 1, iters=args.iters))
        print(rows[-1], flush=True)
    except Exception as e:  # noqa: BLE001 — recorded, run continues
        msg = str(e)
        rows.append({"batch": 448, "grad_accum": 1, "error": msg[:300]})
        print(f"direct 448 failed: {msg[:160]}", flush=True)

    by = {(r["batch"], r["grad_accum"]): r for r in rows}
    direct = by.get((112, 1), {}).get("samples_per_sec")
    acc4 = by.get((112, 4), {}).get("samples_per_sec")
    out = {
        "device": str(dev),
        "platform": dev.platform,
        "config": "small family (64px, inner 64, mults 1-2-3-5, "
                  "max_views 6, packed, bf16)",
        "rows": rows,
        "accum_efficiency_batch112": (
            round(acc4 / direct, 4) if direct and acc4 else None
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
