#!/usr/bin/env python
"""Benchmark: flagship-config training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "train_steps_per_sec_per_chip", "value": N, "unit": "steps/s",
   "vs_baseline": N}

Baseline: the reference paper model trained 710k steps in ~6.5 days on
4x V100 (README.md:136) at global batch 112 => ~1.26 global steps/s
=> ~0.316 steps/s per GPU at per-GPU batch 28
(BASELINE.md).  We run the same per-chip workload: paper "small" config
(configs/small-v100-4.yaml: image 64, inner 64, mults 1/2/3/5,
res_blocks 3, attention at 16x16, T=2000 schedule), per-chip batch 28,
max_views 6.

Work parity note: the reference's ragged flatten runs the UNet on
sum(view_count) ~= 98 rows per step of batch 28 (E[v]=3.5,
model/view_fusion.py:244-256).  The packed TPU path measured here
computes exactly the same 98 rows (stratified counts, sum fixed), so
steps/s is an apples-to-apples comparison of per-step work.

Extra diagnostics (sampling throughput etc.) go to stderr; stdout is the
single JSON line.
"""

import json
import sys
import time

import numpy as np

BASELINE_STEPS_PER_SEC_PER_GPU = 1.26 / 4  # BASELINE.md

FLAGSHIP = {
    "model": {
        "denoise_net": "unet",
        "view_fusion_params": {
            "beta_schedule": {
                "train": {
                    "schedule": "linear",
                    "num_timesteps": 2000,
                    "linear_start": 1e-6,
                    "linear_end": 1e-2,
                },
                "test": {
                    "schedule": "linear",
                    "num_timesteps": 1000,
                    "linear_start": 1e-4,
                    "linear_end": 0.09,
                },
            }
        },
        "denoise_net_params": {
            "image_size": 64,
            "in_channel": 6,
            "out_channel": 6,
            "inner_channel": 64,
            "res_blocks": 3,
            "attn_res": [16],
            "channel_mults": [1, 2, 3, 5],
        },
    },
    "data": {"params": {"max_views": 6, "batch_size": 28}},
    "tpu": {"compute_dtype": "bfloat16"},
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from viewfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion
    from viewfusion_tpu.training.schedulers import lr_schedule

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    cfg = Config.from_dict(FLAGSHIP)
    model = ViewFusion.from_config(cfg)
    b = cfg.data.batch_size
    n = cfg.data.max_views
    hw = cfg.unet.image_size

    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(
        rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(np.float32)
    )
    # stratified counts: sum(view_count) == b * (n+1)/2 == the
    # reference's expected per-step row count
    counts = np.resize(np.arange(1, n + 1), b)
    np.random.default_rng(1).shuffle(counts)
    view_count = jnp.asarray(counts.astype(np.int32))
    sample_idx = jnp.asarray(
        np.repeat(np.arange(b), counts).astype(np.int32)
    )
    view_idx = jnp.asarray(
        np.concatenate([np.arange(v) for v in counts]).astype(np.int32)
    )
    angle = jnp.asarray(
        rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32)
    )

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(key, cond, y0)
    tx = optax.adam(lr_schedule())
    opt_state = jax.jit(tx.init)(params)
    log(f"init: {time.perf_counter() - t0:.1f}s; "
        f"params={sum(x.size for x in jax.tree_util.tree_leaves(params)):,}")

    @jax.jit
    def train_step(params, opt_state, key, y0, cond, view_count, angle):
        def loss_fn(p):
            return model.loss_packed(p, key, y0, cond, view_count, angle,
                                     sample_idx, view_idx)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # compile + warmup
    t0 = time.perf_counter()
    params, opt_state, loss = train_step(
        params, opt_state, key, y0, cond, view_count, angle
    )
    jax.block_until_ready(loss)
    log(f"compile+first step: {time.perf_counter() - t0:.1f}s "
        f"loss={float(loss):.4f}")

    for _ in range(3):  # warmup
        params, opt_state, loss = train_step(
            params, opt_state, key, y0, cond, view_count, angle
        )
    jax.block_until_ready(loss)

    iters = 30 if dev.platform != "cpu" else 3
    t0 = time.perf_counter()
    for i in range(iters):
        key = jax.random.fold_in(key, i)
        params, opt_state, loss = train_step(
            params, opt_state, key, y0, cond, view_count, angle
        )
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    steps_per_sec = iters / dt
    log(f"{iters} steps in {dt:.2f}s -> {steps_per_sec:.3f} steps/s "
        f"(batch {b}, max_views {n})")

    print(json.dumps({
        "metric": "train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC_PER_GPU,
                             3),
    }))


if __name__ == "__main__":
    main()
