#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship train step and print the
top self-time ops (via xprof/tensorboard_plugin_profile's converter).

Usage: python scripts/profile_step.py [--packed] [--outdir DIR]
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--packed", action="store_true")
    ap.add_argument("--outdir", default="/tmp/vf_profile")
    ap.add_argument("--batch", type=int, default=28)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from viewfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bench import FLAGSHIP
    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion
    from viewfusion_tpu.training.schedulers import lr_schedule

    cfg = Config.from_dict(FLAGSHIP)
    model = ViewFusion.from_config(cfg)
    b, n, hw = args.batch, 6, 64
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(
        np.float32))
    angle = jnp.zeros((b,), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), cond, y0)
    tx = optax.adam(lr_schedule())
    opt = jax.jit(tx.init)(params)

    if args.packed:
        counts = np.resize(np.arange(1, n + 1), b)
        vc = jnp.asarray(counts.astype(np.int32))
        si = jnp.asarray(np.repeat(np.arange(b), counts).astype(np.int32))
        vi = jnp.asarray(
            np.concatenate([np.arange(v) for v in counts]).astype(np.int32)
        )

        def loss_fn(p, key):
            return model.loss_packed(p, key, y0, cond, vc, angle, si, vi)
    else:
        vc = jnp.asarray(rng.integers(1, n + 1, (b,)).astype(np.int32))

        def loss_fn(p, key):
            return model.loss(p, key, y0, cond, vc, angle)

    @jax.jit
    def step(params, opt, key):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(p, key))(params)
        u, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), opt, loss

    p, o, l = step(params, opt, jax.random.PRNGKey(0))
    jax.block_until_ready(l)

    os.makedirs(args.outdir, exist_ok=True)
    jax.profiler.start_trace(args.outdir)
    for i in range(5):
        p, o, l = step(p, o, jax.random.PRNGKey(i))
    jax.block_until_ready(l)
    jax.profiler.stop_trace()
    print("trace captured", file=sys.stderr)

    xplanes = glob.glob(
        os.path.join(args.outdir, "**", "*.xplane.pb"), recursive=True
    )
    if not xplanes:
        print("no xplane found", file=sys.stderr)
        return
    xplane = max(xplanes, key=os.path.getmtime)
    try:
        try:
            from xprof.convert import raw_to_tool_data
        except ImportError:  # pre-rename package, same API
            from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [xplane], "framework_op_stats", {}
        )
        tbl = json.loads(data.decode() if isinstance(data, bytes) else data)
        if isinstance(tbl, list):
            tbl = tbl[0]
        cols = [c["id"] for c in tbl["cols"]]
        rows = [[c.get("v") for c in r["c"]] for r in tbl["rows"]]
        i_type = cols.index("type")
        i_t = cols.index("total_self_time")
        i_dev = cols.index("host_or_device")
        agg = {}
        for r in rows:
            if r[i_dev] != "Device":
                continue
            agg[r[i_type]] = agg.get(r[i_type], 0.0) + (r[i_t] or 0.0)
        total = sum(agg.values())
        if not agg or total <= 0:
            print(f"no device self-time in trace (raw at {xplane})")
            return
        print(f"{'op type':30s} {'self us':>12s} {'%':>6s}")
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:15]:
            print(f"{k:30s} {v:12.1f} {100 * v / total:6.1f}")
        print(f"total device self time: {total / 1e3:.1f} ms")
    except Exception as e:  # tooling varies by version; keep the trace
        print(f"converter failed ({e}); raw trace at {xplane}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
