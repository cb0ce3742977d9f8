#!/usr/bin/env python
"""Measured on-chip train-step row for every shipped config FAMILY.

One line per family (xs / small / medium / dit) at the reference's
per-GPU batch mapped to one chip, packed path, bf16 — so each family in
`configs/` has committed hardware evidence, not just the flagship.

Usage: python scripts/bench_configs.py --out CONFIG_BENCH_r03.json
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

# family -> (denoise_net, denoise_net_params overrides, max_views,
#            per-chip batch = reference global batch / 4 GPUs)
FAMILIES = {
    # configs/xs-tpu-4.yaml: global 336 -> 84/chip, max_views 2
    "xs": ("unet", {}, 2, 84),
    # configs/small-tpu-4.yaml: global 112 -> 28/chip, max_views 6
    "small": ("unet", {}, 6, 28),
    # configs/medium-tpu-4.yaml: global 56 -> 14/chip, max_views 12
    "medium": ("unet", {}, 12, 14),
    # configs/dit-small-tpu-4.yaml at the small batch point
    "dit": ("dit", {"patch_size": 4, "hidden_size": 384, "depth": 12,
                    "num_heads": 6}, 6, 28),
}


def bench_family(name, denoise_net, dn_params, max_views, batch):
    import jax
    import jax.numpy as jnp
    import optax

    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion
    from viewfusion_tpu.training.schedulers import lr_schedule
    from viewfusion_tpu.training.trainer import stratified_count_multiset

    base = {
        "image_size": 64, "in_channel": 6, "out_channel": 6,
        "inner_channel": 64, "res_blocks": 3, "attn_res": [16],
        "channel_mults": [1, 2, 3, 5],
    }
    if denoise_net == "dit":
        base = {"image_size": 64, "in_channel": 6, "out_channel": 6}
    base.update(dn_params)
    cfg = Config.from_dict({
        "model": {
            "denoise_net": denoise_net,
            "view_fusion_params": {"beta_schedule": {
                "train": {"schedule": "linear", "num_timesteps": 2000,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "test": {"schedule": "linear", "num_timesteps": 1000,
                         "linear_start": 1e-4, "linear_end": 0.09},
            }},
            "denoise_net_params": base,
        },
        "data": {"params": {"max_views": max_views, "batch_size": batch}},
        "tpu": {"compute_dtype": "bfloat16"},
    })
    model = ViewFusion.from_config(cfg)
    hw = 64
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.uniform(0, 1, (batch, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(
        rng.uniform(0, 1, (batch, max_views, hw, hw, 3)).astype(np.float32)
    )
    counts = stratified_count_multiset(batch, max_views)
    np.random.default_rng(1).shuffle(counts)
    vc = jnp.asarray(counts.astype(np.int32))
    from viewfusion_tpu.training.trainer import Experiment
    si_, vi_ = Experiment._packed_indices(counts)
    si, vi = si_, vi_  # host np (lowering embeds directly)
    angle = jnp.asarray(
        rng.uniform(0, 2 * np.pi, (batch,)).astype(np.float32)
    )
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, cond, y0)
    nparams = sum(x.size for x in jax.tree_util.tree_leaves(params))
    tx = optax.adam(lr_schedule())
    opt_state = jax.jit(tx.init)(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key):
        def loss_fn(p):
            return model.loss_packed(p, key, y0, cond, vc, angle, si, vi)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, key)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    for i in range(10):
        key = jax.random.fold_in(key, i)
        params, opt_state, loss = step(params, opt_state, key)
    jax.block_until_ready(loss)
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(30):
            key = jax.random.fold_in(key, 100 + i)
            params, opt_state, loss = step(params, opt_state, key)
        jax.block_until_ready(loss)
        best = max(best, 30 / (time.perf_counter() - t0))
    rows = int(counts.sum())
    row = {
        "family": name,
        "denoise_net": denoise_net,
        "params": nparams,
        "per_chip_batch": batch,
        "max_views": max_views,
        "packed_rows": rows,
        "steps_per_sec": round(best, 3),
        "rows_per_sec": round(best * rows, 1),
        "compile_s": round(compile_s, 1),
    }
    print(row, flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--families", default="xs,small,medium,dit")
    args = ap.parse_args()

    from viewfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    rows = [bench_family(f, *FAMILIES[f])
            for f in args.families.split(",")]
    out = {
        "what": ("packed train-step throughput for every shipped config "
                 "family at the reference per-GPU batch mapped to one "
                 "chip"),
        "device": jax.devices()[0].device_kind,
        "rows": rows,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
