#!/usr/bin/env python
"""Benchmark: flagship-config training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "train_steps_per_sec_per_chip", "value": N, "unit": "steps/s",
   "vs_baseline": N, "mfu": N, "achieved_tflops": N,
   "model_tflops_per_step": N, "data_fed_steps_per_sec": N}

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

MFU: model FLOPs are counted analytically from the config topology
(`unet_flops_per_row`, convs + attention matmuls, x3 for fwd+bwd) and
cross-checked against XLA's own cost analysis of the compiled step
(stderr).  Peak is the chip's dense bf16 rate (v5e: 197 TFLOP/s).

data_fed_steps_per_sec: the same train step fed by the REAL input
pipeline (synthetic 64px NMR-format shards -> shard reader -> decode ->
shuffle -> Batcher -> prefetch -> device put), i.e. trainer-integrated
throughput rather than a pure-compute loop.  NOTE: this container has 1
CPU core; production TPU-VM hosts have >100, so this is a worst-case
host-bound number (each step decodes 28 objects x 24 PNG views).

Extra diagnostics go to stderr; stdout is the single JSON line.
"""

import json
import os
import sys
import tempfile
import time
from functools import partial

import numpy as np

BASELINE_STEPS_PER_SEC_PER_GPU = 1.26 / 4  # BASELINE.md

# Dense bf16 peak FLOP/s by TPU generation (public spec numbers).
PEAK_BF16 = {
    "v4": 275e12,
    "v5 lite": 197e12,
    "v5litepod": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6 lite": 918e12,
    "v6e": 918e12,
}

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


_FETCH_WEDGED = False


def bounded_float(x, timeout_s: float = 60.0) -> float:
    """``float(x)`` with a hard timeout.

    The tunneled dev chip has a failure mode where device EXECUTION
    keeps working but the device->host payload path wedges (observed
    live: an 8-float fetch hangs forever while back-to-back train steps
    run fine).  All of this bench's timing uses block_until_ready — the
    only value fetch is the loss sanity print — so a wedged D2H must
    not take the whole bench (and the round's driver artifact) with it.
    Fetch on a daemon thread; on timeout return NaN, mark the rig so
    main() exits via os._exit (a thread stuck inside a PJRT call would
    otherwise hang interpreter shutdown)."""
    import threading

    box = {}

    def fetch():
        try:
            box["v"] = float(x)
        except Exception as e:  # surfacing beats hanging
            box["e"] = e

    t = threading.Thread(target=fetch, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        global _FETCH_WEDGED
        _FETCH_WEDGED = True
        log(f"WARNING: device->host fetch exceeded {timeout_s}s "
            "(tunnel D2H wedged); continuing without the value")
        return float("nan")
    if "e" in box:
        raise box["e"]
    return box["v"]


def unet_flops_per_row(cfg) -> float:
    """Analytic forward FLOPs for ONE UNet row (one (H, W, in_ch) input),
    walking the exact topology of models/unet.py (= reference
    model/unet.py:42-112): convs, residual/qkv/out projections, and the
    attention einsums.  Norms/activations/bias adds are excluded (<1%).
    """

    def conv(h, cin, cout, k=3):
        return 2.0 * k * k * cin * cout * h * h

    def resnet_attn_block(h, cin, cout, attn):
        f = conv(h, cin, cout) + conv(h, cout, cout)  # Block_0 + Block_1
        if cin != cout:
            f += conv(h, cin, cout, k=1)  # res_conv
        if attn:
            s = h * h
            f += conv(h, cout, 3 * cout, k=1)      # qkv
            f += 2.0 * s * s * cout * 2            # scores + p@v
            f += conv(h, cout, cout, k=1)          # out proj
        return f

    inner = cfg.inner_channel
    now = cfg.image_size
    num = len(cfg.channel_mults)

    total = conv(now, cfg.in_channel, inner)  # stem
    skips = [inner]
    pre = inner
    for ind in range(num):
        attn = now in cfg.attn_res
        cm = inner * cfg.channel_mults[ind]
        for _ in range(cfg.res_blocks):
            total += resnet_attn_block(now, pre, cm, attn)
            pre = cm
            skips.append(cm)
        if ind != num - 1:
            now //= 2
            total += conv(now, pre, pre)  # stride-2 conv, output at now/2
            skips.append(pre)

    total += resnet_attn_block(now, pre, pre, True)   # mid_0
    total += resnet_attn_block(now, pre, pre, False)  # mid_1

    for ind in reversed(range(num)):
        attn = now in cfg.attn_res
        cm = inner * cfg.channel_mults[ind]
        for _ in range(cfg.res_blocks + 1):
            total += resnet_attn_block(now, pre + skips.pop(), cm, attn)
            pre = cm
        if ind >= 1:
            now *= 2
            total += conv(now, pre, pre)  # post-upsample conv at 2x res

    total += conv(cfg.image_size, pre, cfg.out_channel)  # head
    return total


def wait_for_chip(budget_s: float) -> None:
    """Block until a subprocess can initialize the TPU backend, up to
    ``budget_s`` seconds.

    The tunneled chip has a known failure mode where a killed client
    leaves ``jax.devices()`` hanging for minutes; probing in a throwaway
    subprocess (bounded by a timeout) keeps THIS process's JAX backend
    state clean — a failed in-process init would be cached for the rest
    of the run.  Skipped entirely when the user pinned a non-TPU
    platform (JAX_PLATFORMS=cpu smoke runs)."""
    import subprocess

    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat and "tpu" not in plat:
        return
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        try:
            rc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=90, capture_output=True,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            if attempt > 1:
                log(f"chip back after {attempt} probes")
            return
        if time.monotonic() >= deadline:
            log(f"chip probe still failing after {attempt} attempts; "
                f"proceeding (jax will raise if it is really gone)")
            return
        log(f"chip probe {attempt} failed (rc={rc}); retrying in 120s")
        time.sleep(120)


def main():
    wait_for_chip(float(os.environ.get("VF_BENCH_WAIT_CHIP_S", "1800")))

    import jax
    import jax.numpy as jnp
    import optax

    from viewfusion_tpu.cli import _honor_platform_env
    from viewfusion_tpu.utils.cache import enable_compilation_cache

    # a sitecustomize-pinned platform otherwise overrides the user's
    # JAX_PLATFORMS=cpu for tiny-mode smoke runs (same as the CLI)
    _honor_platform_env()
    enable_compilation_cache()

    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion
    from viewfusion_tpu.training.schedulers import lr_schedule

    # VF_BENCH_TINY=1: shrink the model/batch so the WHOLE bench script
    # (incl. the data-fed feeder machinery) smoke-runs on CPU in ~2 min.
    # Numbers from tiny mode are meaningless; it exists so a bench-code
    # regression is caught before the next real TPU run.
    if os.environ.get("VF_BENCH_TINY") == "1":
        m = FLAGSHIP["model"]
        m["denoise_net_params"].update(
            image_size=16, inner_channel=8, res_blocks=1,
            channel_mults=[1, 2], attn_res=[8], norm_groups=4,
        )
        for ph in m["view_fusion_params"]["beta_schedule"].values():
            ph["num_timesteps"] = 8
        FLAGSHIP["data"]["params"].update(batch_size=4, max_views=3)
        FLAGSHIP["tpu"]["compute_dtype"] = "float32"

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")

    cfg = Config.from_dict(FLAGSHIP)
    model = ViewFusion.from_config(cfg)
    b = cfg.data.batch_size
    n = cfg.data.max_views
    hw = cfg.unet.image_size

    from viewfusion_tpu.training.trainer import (
        Experiment, stratified_count_multiset,
    )

    rng = np.random.default_rng(0)
    # uint8 image batches, normalized INSIDE the jitted step — the
    # shipped default (tpu.u8_feed): 4x fewer H2D bytes, and the same
    # compiled program serves the synthetic and data-fed sections.
    y0 = jnp.asarray(rng.integers(0, 256, (b, hw, hw, 3), np.uint8))
    cond = jnp.asarray(rng.integers(0, 256, (b, n, hw, hw, 3), np.uint8))
    # the trainer's stratified multiset: sum(view_count) == b * (n+1)/2
    # == the reference's expected per-step row count (98 at batch 28)
    counts = stratified_count_multiset(b, n)
    np.random.default_rng(1).shuffle(counts)
    view_count = jnp.asarray(counts.astype(np.int32))
    si, vi = Experiment._packed_indices(counts)  # the trainer's own layout
    sample_idx, view_idx = si, vi  # host np: closed-over device arrays force a D2H at lowering
    angle = jnp.asarray(
        rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32)
    )
    rows = int(counts.sum())

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    params = jax.jit(model.init)(
        key, jnp.asarray(cond, jnp.float32) / 255.0,
        jnp.asarray(y0, jnp.float32) / 255.0,
    )
    tx = optax.adam(lr_schedule())
    opt_state = jax.jit(tx.init)(params)
    log(f"init: {time.perf_counter() - t0:.1f}s; "
        f"params={sum(x.size for x in jax.tree_util.tree_leaves(params)):,}")

    # donate params/opt_state like the trainer's step does
    # (training/trainer.py donate_argnums) — XLA updates them in place
    # instead of allocating + copying 3x34M floats per step.
    # the trainer's own on-device normalization — import, don't copy,
    # so the benchmark always measures the program the trainer ships
    from viewfusion_tpu.training.trainer import _norm_img as norm

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, key, y0, cond, view_count, angle):
        def loss_fn(p):
            return model.loss_packed(p, key, norm(y0), norm(cond),
                                     view_count, angle,
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
        f"loss={bounded_float(loss):.4f}")

    # Post-compile warmup needs to be generous: the first ~10 dispatches
    # after a fresh compile run far below steady state (measured: the
    # first 30-step window after compile+3 warmups clocked 2-8 steps/s
    # vs 10.4 steady).  Warm 10 steps, then time 3 windows and take the
    # best (steady-state windows agree within ~0.5%).
    warm = 10 if dev.platform != "cpu" else 1
    for i in range(warm):
        key = jax.random.fold_in(key, 10_000 + i)
        params, opt_state, loss = train_step(
            params, opt_state, key, y0, cond, view_count, angle
        )
    jax.block_until_ready(loss)

    iters = 30 if dev.platform != "cpu" else 3
    windows = 3 if dev.platform != "cpu" else 1
    window_rates = []
    for w in range(windows):
        t0 = time.perf_counter()
        for i in range(iters):
            key = jax.random.fold_in(key, i)
            params, opt_state, loss = train_step(
                params, opt_state, key, y0, cond, view_count, angle
            )
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        log(f"window {w}: {iters} steps in {dt:.2f}s "
            f"-> {iters / dt:.3f} steps/s")
        window_rates.append(iters / dt)
    steps_per_sec = max(window_rates)
    # Self-reported variance (VERDICT r4 item 1): within-process window
    # spread is tiny (<0.5%); GN_BOUNDARY_AB_r05.json bounds the
    # PROCESS-restart spread at <0.2% — so a >1% round-over-round move
    # in `value` is a real code/config change, not rig noise.
    window_spread = max(window_rates) - min(window_rates)
    log(f"best window: {steps_per_sec:.3f} steps/s "
        f"(batch {b}, max_views {n}, packed rows {rows}); "
        f"window spread {window_spread:.4f}")

    # ---------------- MFU / roofline accounting ----------------------
    fwd_flops = unet_flops_per_row(cfg.unet) * rows
    step_flops = 3.0 * fwd_flops  # fwd + ~2x fwd for backward
    achieved = step_flops * steps_per_sec
    kind = dev.device_kind.lower()
    peak = next((v for k, v in PEAK_BF16.items() if k in kind), 197e12)
    mfu = achieved / peak
    log(f"model step FLOPs (analytic): {step_flops / 1e12:.3f} TF "
        f"({fwd_flops / 1e12:.3f} TF fwd x3)")
    try:  # cross-check vs the compiler's own count of the lowered step
        comp = train_step.lower(params, opt_state, key, y0, cond,
                                view_count, angle).compile()
        xla_flops = comp.cost_analysis().get("flops", float("nan"))
        log(f"XLA cost_analysis step FLOPs: {xla_flops / 1e12:.3f} TF "
            f"(analytic/XLA = {step_flops / xla_flops:.3f})")
    except Exception as e:  # pragma: no cover
        log(f"cost_analysis unavailable: {e}")
    log(f"achieved {achieved / 1e12:.1f} TFLOP/s of {peak / 1e12:.0f} peak "
        f"({dev.device_kind}) -> MFU {mfu * 100:.1f}%")

    # ---------------- trainer-integrated (data-fed) ------------------
    data_sps = raw_sps = None
    try:
        data_sps, raw_sps = bench_data_fed(train_step, params, opt_state,
                                           key, cfg, steps_per_sec)
    except Exception as e:  # pragma: no cover
        log(f"data-fed bench failed: {e}")

    # ---------------- MFU vs batch ------------------------------------
    # The headline row stays at per-chip batch 28 for baseline
    # comparability (the reference's per-GPU batch); these rows chart
    # how MFU scales when the chip is given more rows per step.
    # Disable with VF_BENCH_NO_SCALING=1 (e.g. cold-cache CI where two
    # extra flagship compiles are unwelcome).
    scaling = []
    if os.environ.get("VF_BENCH_NO_SCALING") != "1" and \
            dev.platform == "tpu":
        for b2 in (56, 112):
            try:
                scaling.append(
                    bench_one_batch(model, cfg, tx, b2, peak)
                )
            except Exception as e:  # pragma: no cover
                log(f"batch-{b2} scaling bench failed: {e}")

    out = {
        "metric": "train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC_PER_GPU,
                             3),
        "mfu": round(mfu, 4),
        "achieved_tflops": round(achieved / 1e12, 2),
        "model_tflops_per_step": round(step_flops / 1e12, 4),
        "window_steps_per_sec": [round(r, 4) for r in window_rates],
        "window_spread": round(window_spread, 4),
    }
    if data_sps is not None:
        out["data_fed_steps_per_sec"] = round(data_sps, 4)
    if raw_sps is not None:
        out["data_fed_raw_steps_per_sec"] = round(raw_sps, 4)
    if scaling:
        out["batch_scaling"] = scaling
    if _FETCH_WEDGED:
        out["d2h_wedged"] = True
    print(json.dumps(out))
    if _FETCH_WEDGED:
        # a daemon thread is still parked inside a PJRT fetch; normal
        # interpreter shutdown would hang on the client destructor
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


def bench_one_batch(model, cfg, tx, b, peak):
    """Packed train-step throughput + MFU at per-chip batch ``b``."""
    import jax
    import jax.numpy as jnp
    import optax

    from viewfusion_tpu.training.trainer import (
        Experiment, stratified_count_multiset,
    )

    n = cfg.data.max_views
    hw = cfg.unet.image_size
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(
        rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(np.float32)
    )
    counts = stratified_count_multiset(b, n)
    np.random.default_rng(1).shuffle(counts)
    view_count = jnp.asarray(counts.astype(np.int32))
    si, vi = Experiment._packed_indices(counts)
    sample_idx, view_idx = si, vi  # host np: closed-over device arrays force a D2H at lowering
    angle = jnp.asarray(rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32))
    rows = int(counts.sum())

    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, cond, y0)
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
    log(f"batch {b}: compile+first {time.perf_counter() - t0:.1f}s")
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
    step_flops = 3.0 * unet_flops_per_row(cfg.unet) * rows
    mfu = step_flops * best / peak
    log(f"batch {b}: {best:.3f} steps/s, rows {rows}, MFU {mfu*100:.1f}%")
    return {"batch": b, "steps_per_sec": round(best, 3),
            "rows": rows, "mfu": round(mfu, 4)}


def bench_data_fed(train_step, params, opt_state, key, cfg, synth_sps):
    """Same jitted step, fed by the real shard->decode->batch pipeline.

    Measured twice: from the reference-compatible PNG tars (interchange
    format; the host pays a PNG decode per view) and from pre-decoded
    `.rec` raw shards (data/rawrec.py, the production TPU path: mmap
    reads, zero decode).  Returns (tar_sps, raw_sps)."""
    import jax
    import jax.numpy as jnp

    from viewfusion_tpu.config import SplitConfig
    from viewfusion_tpu.data.nmr import Batcher, create_nmr_stream, prefetch
    from viewfusion_tpu.data.rawrec import convert_shard_dir
    from viewfusion_tpu.data.synthetic import make_synthetic_shards

    b = cfg.data.batch_size
    n = cfg.data.max_views
    hw = cfg.unet.image_size
    tmp = tempfile.mkdtemp(prefix="vf_bench_data_")
    make_synthetic_shards(tmp, "train", num_objects=64, image_size=hw)
    convert_shard_dir(tmp)
    from viewfusion_tpu.training.trainer import stratified_count_multiset

    counts = stratified_count_multiset(b, n)
    np.random.default_rng(1).shuffle(counts)
    view_count = jnp.asarray(counts.astype(np.int32))

    def step_from(params, opt_state, batch, key):
        # train_step donates params/opt_state: thread the returned
        # buffers forward, exactly as the trainer does.
        return train_step(
            params, opt_state, key,
            jnp.asarray(batch["target"]), jnp.asarray(batch["cond"]),
            view_count, jnp.asarray(batch["angle"]).reshape(-1),
        )

    rates = {}
    for fmt in ("tar", "raw"):
        stream = create_nmr_stream(
            SplitConfig(path=tmp, mode="train", start_shard=0, end_shard=0),
            shuffle_buffer=64, seed=0, data_format=fmt,
            needed_keys=["target", "cond", "angle"], n_cond_views=n,
            out_dtype=np.uint8,  # shipped default (tpu.u8_feed)
        )
        if fmt == "tar":
            log(f"data-fed: native_loader={stream.native}")
        host_iter = prefetch(
            iter(Batcher(stream, b, n_cond_views=n,
                         keys=["target", "cond", "angle"])),
            depth=2,
        )

        # Device-side double buffering, as the trainer's _device_feed
        # does: the H2D transfer runs on a worker thread and overlaps
        # the in-flight step instead of serializing on dispatch.
        import queue as _q
        import threading as _t

        dq: "_q.Queue" = _q.Queue(maxsize=2)
        stop_flag = {"stop": False}
        sentinel = object()

        def to_dev(batch):
            # only the numeric keys the step consumes (batches also
            # carry the scene-hash string key)
            return {k: jnp.asarray(batch[k])
                    for k in ("target", "cond", "angle")}

        def feeder(it=host_iter, dq=dq):
            try:
                for hb in it:
                    if stop_flag["stop"]:
                        break
                    dq.put(to_dev(hb))
                dq.put(sentinel)
            except BaseException as e:  # noqa: BLE001
                dq.put(e)

        _t.Thread(target=feeder, daemon=True).start()

        def next_dev():
            item = dq.get()
            if item is sentinel:
                raise RuntimeError("data stream ended mid-benchmark")
            if isinstance(item, BaseException):
                raise item
            return item

        params, opt_state, loss = step_from(
            params, opt_state, next_dev(), key
        )  # warm (reuses compile)
        jax.block_until_ready(loss)
        iters = 15 if jax.devices()[0].platform != "cpu" else 2
        t0 = time.perf_counter()
        for i in range(iters):
            key = jax.random.fold_in(key, 1000 + i)
            params, opt_state, loss = step_from(params, opt_state,
                                                next_dev(), key)
        jax.block_until_ready(loss)
        rates[fmt] = iters / (time.perf_counter() - t0)
        # Stop THIS format's feeder before the next format is timed:
        # a still-running tar feeder would keep decoding and issuing
        # H2D transfers into the raw measurement (and pin 2 device
        # batches of HBM).  Draining unblocks its put(); it then sees
        # the flag and exits via the sentinel.
        stop_flag["stop"] = True
        try:
            while True:
                item = dq.get(timeout=2.0)
                if item is sentinel or isinstance(item, BaseException):
                    break
        except _q.Empty:
            pass
        decode_note = (f"{b * 24} PNG decodes/step" if fmt == "tar"
                       else "0 decodes/step (mmap)")
        log(f"data-fed[{fmt}]: {rates[fmt]:.3f} steps/s "
            f"({rates[fmt] / synth_sps * 100:.0f}% of synthetic-tensor "
            f"rate; host has {os.cpu_count()} CPU core(s), {decode_note})")
    return rates["tar"], rates["raw"]


if __name__ == "__main__":
    main()
