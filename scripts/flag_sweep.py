#!/usr/bin/env python
"""XLA:TPU compiler-flag sweep on the flagship packed train step.

The measured MFU ceiling work (STAGE_CONVS_r03.json, docs/DESIGN.md)
bounded the remaining kernel-level upside at ~5%; this sweeps the
documented XLA:TPU tuning flags to see whether the compiler gives any
of it back for free.  Each flag set needs a fresh backend, so every
measurement runs in its own subprocess; a changed flag set also
invalidates the persistent compile cache, so each row pays a cold
flagship compile (~minutes) — budget accordingly.

Writes FLAGS_r03.json: steps/s per flag set, best vs baseline.
"""

import json
import os
import subprocess
import sys

FLAG_SETS = {
    "baseline": "",
    "scoped_vmem_64M": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "scoped_vmem_128M": "--xla_tpu_scoped_vmem_limit_kib=131072",
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
}

CHILD = r"""
import json, sys, time
from functools import partial
import numpy as np
import jax
from viewfusion_tpu.cli import _honor_platform_env
_honor_platform_env()  # sitecustomize pins jax_platforms=axon otherwise
import jax.numpy as jnp, optax
from viewfusion_tpu.config import Config
from viewfusion_tpu.models.view_fusion import ViewFusion
from viewfusion_tpu.training.schedulers import lr_schedule
from viewfusion_tpu.training.trainer import (
    Experiment, stratified_count_multiset,
)
from bench import FLAGSHIP

import os as _os
if _os.environ.get("VF_BENCH_TINY") == "1":  # CPU smoke of the harness
    m = FLAGSHIP["model"]
    m["denoise_net_params"].update(
        image_size=16, inner_channel=8, res_blocks=1,
        channel_mults=[1, 2], attn_res=[8], norm_groups=4,
    )
    for ph in m["view_fusion_params"]["beta_schedule"].values():
        ph["num_timesteps"] = 8
    FLAGSHIP["data"]["params"].update(batch_size=4, max_views=3)
    FLAGSHIP["tpu"]["compute_dtype"] = "float32"

cfg = Config.from_dict(FLAGSHIP)
model = ViewFusion.from_config(cfg)
b, n, hw = cfg.data.batch_size, cfg.data.max_views, cfg.unet.image_size
rng = np.random.default_rng(0)
y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
cond = jnp.asarray(rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(np.float32))
counts = stratified_count_multiset(b, n)
np.random.default_rng(1).shuffle(counts)
view_count = jnp.asarray(counts.astype(np.int32))
si, vi = Experiment._packed_indices(counts)
sample_idx, view_idx = si, vi  # host np (lowering embeds directly)
angle = jnp.asarray(rng.uniform(0, 6.28, (b,)).astype(np.float32))

key = jax.random.PRNGKey(0)
params = jax.jit(model.init)(key, cond, y0)
tx = optax.adam(lr_schedule())
opt_state = jax.jit(tx.init)(params)

@partial(jax.jit, donate_argnums=(0, 1))
def train_step(params, opt_state, key):
    def loss_fn(p):
        return model.loss_packed(p, key, y0, cond, view_count, angle,
                                 sample_idx, view_idx)
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss

t0 = time.perf_counter()
params, opt_state, loss = train_step(params, opt_state, key)
jax.block_until_ready(loss)
compile_s = time.perf_counter() - t0
for i in range(10):
    key = jax.random.fold_in(key, 10_000 + i)
    params, opt_state, loss = train_step(params, opt_state, key)
jax.block_until_ready(loss)
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    for i in range(30):
        key = jax.random.fold_in(key, i)
        params, opt_state, loss = train_step(params, opt_state, key)
    jax.block_until_ready(loss)
    best = max(best, 30 / (time.perf_counter() - t0))
print(json.dumps({"steps_per_sec": round(best, 4),
                  "compile_s": round(compile_s, 1),
                  "loss": float(loss)}))
"""


CANARY = (
    "from viewfusion_tpu.cli import _honor_platform_env\n"
    "_honor_platform_env()\n"
    "import jax; print(jax.devices()[0].platform)\n"
)


def flags_reach_backend() -> bool:
    """Does LIBTPU_INIT_ARGS reach a libtpu parser on this runtime?

    A deliberately-unknown flag is fatal when parsed; if backend init
    succeeds anyway, init args are NOT delivered (tunneled runtimes own
    libtpu on the far side) and per-flag rows would all silently
    measure the baseline.
    """
    env = dict(os.environ)
    env["LIBTPU_INIT_ARGS"] = "--vf_flag_sweep_canary_unknown=1"
    r = subprocess.run(
        [sys.executable, "-c", CANARY], capture_output=True, text=True,
        timeout=300, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return r.returncode != 0


def main():
    out = {"workload": "flagship packed train step, batch 28, rows 98",
           "rows": {}}
    # TPU flags go through LIBTPU_INIT_ARGS only: the local XLA_FLAGS
    # parser aborts on --xla_tpu_* flags when libtpu is not loaded
    # in-process (fatal 'Unknown flag in XLA_FLAGS'), which is exactly
    # what happens on tunneled runtimes where libtpu lives server-side.
    out["init_args_reach_backend"] = flags_reach_backend()
    print(f"init args reach backend: {out['init_args_reach_backend']}",
          file=sys.stderr, flush=True)
    if not out["init_args_reach_backend"]:
        out["note"] = (
            "LIBTPU_INIT_ARGS is not delivered to the (remote) libtpu on "
            "this runtime — an unknown-flag canary initialized fine, so "
            "per-flag rows would all measure the baseline.  Compiler-flag "
            "tuning must run on a TPU VM with local libtpu; only the "
            "baseline row is recorded here."
        )
    names = (list(FLAG_SETS) if out["init_args_reach_backend"]
             else ["baseline"])
    for name in names:
        flags = FLAG_SETS[name]
        env = dict(os.environ)
        # the child never enables the persistent compile cache, so every
        # row is a fresh compile under exactly these flags.
        if flags:
            env["LIBTPU_INIT_ARGS"] = (
                env.get("LIBTPU_INIT_ARGS", "") + " " + flags
            ).strip()
        print(f"[{name}] LIBTPU_INIT_ARGS={flags!r}",
              file=sys.stderr, flush=True)
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD],
                capture_output=True, text=True, timeout=1800, env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
            row = (json.loads(r.stdout.strip().splitlines()[-1])
                   if r.returncode == 0 else
                   {"error": r.stderr.strip().splitlines()[-1][:300]
                    if r.stderr.strip() else f"rc={r.returncode}"})
        except subprocess.TimeoutExpired:
            row = {"error": "timeout"}
        out["rows"][name] = row
        print(f"[{name}] {row}", file=sys.stderr, flush=True)
    base = out["rows"].get("baseline", {}).get("steps_per_sec")
    if base:
        for name, row in out["rows"].items():
            if "steps_per_sec" in row:
                row["vs_baseline"] = round(row["steps_per_sec"] / base, 4)
    with open("FLAGS_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
