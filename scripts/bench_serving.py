#!/usr/bin/env python
"""Serving load test: throughput + latency percentiles under concurrent
clients, exercising dynamic batching, per-bucket warmup, and the
mixed-step re-queue path.

Builds a throwaway run dir (random weights — load characteristics do
not depend on training state), starts ViewFusionService in-process, and
drives it with C concurrent closed-loop clients (each fires its next
request as soon as the previous returns).  Mixed traffic: ~10% of
requests use a second step bucket, which must ride its own precompiled
program rather than stalling the main bucket's batches.

Numbers from a CPU host are illustrative of the MECHANISM (batching,
bucketing, no mid-traffic compiles); absolute latency comes from the
device.  Run with --out SERVE_r03.json to commit the artifact.

Usage: JAX_PLATFORMS=cpu python scripts/bench_serving.py --out SERVE_r03.json
"""

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def make_run_dir(image_size=16, inner=8, T=32) -> str:
    import jax
    import jax.numpy as jnp
    import yaml

    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion
    from viewfusion_tpu.training.checkpoint import Checkpoint

    raw = {
        "model": {
            "denoise_net": "unet",
            "view_fusion_params": {
                "beta_schedule": {
                    "train": {"schedule": "linear", "num_timesteps": T,
                              "linear_start": 1e-4, "linear_end": 0.09},
                    "test": {"schedule": "linear", "num_timesteps": T,
                             "linear_start": 1e-4, "linear_end": 0.09},
                }
            },
            "denoise_net_params": {
                "image_size": image_size, "in_channel": 6,
                "out_channel": 6, "inner_channel": inner,
                "norm_groups": 4, "res_blocks": 1,
                "attn_res": [image_size // 2], "channel_mults": [1, 2],
            },
        },
        "data": {"params": {"max_views": 4, "batch_size": 8}},
        "tpu": {"compute_dtype": "float32"},
    }
    cfg = Config.from_dict(raw)
    model = ViewFusion.from_config(cfg)
    run_dir = tempfile.mkdtemp(prefix="vf_serve_bench_")
    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        yaml.dump(raw, f)
    hw = image_size
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 1, hw, hw, 3), jnp.float32),
        jnp.zeros((1, hw, hw, 3), jnp.float32),
    )
    Checkpoint(run_dir).save("best_model_all.msgpack", {"params": params})
    return run_dir


def drive(service, concurrency: int, seconds: float, image_size: int,
          alt_steps: int):
    """Closed-loop clients for ``seconds``; returns latency list + errors."""
    rng = np.random.default_rng(0)
    views = rng.uniform(0, 1, (2, image_size, image_size, 3)).astype(
        np.float32
    )
    latencies, errors = [], []
    lock = threading.Lock()
    level_t0 = time.perf_counter()
    stop = level_t0 + seconds

    def client(cid):
        i = 0
        while time.perf_counter() < stop:
            i += 1
            # true 10% minority mix across ALL clients (the r03 harness
            # put alt traffic only on client 0, i.e. 10%/C overall —
            # too thin to expose starvation at high concurrency)
            steps = alt_steps if ((i + cid) % 10 == 0) else None
            t0 = time.perf_counter()
            try:
                service.submit(views[: 1 + (i % 2)],
                               angle=0.1 * i, steps=steps)
                dt = time.perf_counter() - t0
                with lock:
                    # (latency, is_alt, completion offset into level) —
                    # the offset locates tail requests in time: a p99
                    # population clustered at offset~0 is a warmup ramp,
                    # not a scheduling pathology (SERVE_r04 conc-8 p99)
                    latencies.append((dt, steps is not None,
                                      time.perf_counter() - level_t0))
            except Exception as e:  # noqa: BLE001
                with lock:
                    errors.append(str(e))

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    return latencies, errors, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--concurrency", default="8,16,32")
    args = ap.parse_args()

    from viewfusion_tpu.cli import _honor_platform_env
    _honor_platform_env()  # CPU mechanism test must not touch the chip
    from viewfusion_tpu.serving import ViewFusionService

    image_size = 16
    run_dir = make_run_dir(image_size=image_size)
    service = ViewFusionService(run_dir, batch_size=8, max_wait_ms=10,
                                default_steps=8)
    t0 = time.perf_counter()
    service.warmup([8, 16])  # default + alternate bucket precompiled
    warmup_s = time.perf_counter() - t0
    print(f"warmup (2 step buckets): {warmup_s:.1f}s")

    import jax

    rows = []
    for conc in [int(c) for c in args.concurrency.split(",")]:
        lats, errors, wall = drive(service, conc, args.seconds,
                                   image_size, alt_steps=16)
        all_ms = sorted(l[0] * 1e3 for l in lats)
        alt_ms = sorted(l[0] * 1e3 for l in lats if l[1])
        row = {
            "concurrency": conc,
            "requests": len(lats),
            "errors": len(errors),
            "throughput_rps": round(len(lats) / wall, 2),
            "p50_ms": round(float(np.percentile(all_ms, 50)), 1),
            "p99_ms": round(float(np.percentile(all_ms, 99)), 1),
            "alt_bucket_requests": len(alt_ms),
            "alt_bucket_p50_ms": (round(float(np.percentile(alt_ms, 50)), 1)
                                  if alt_ms else None),
        }
        # where in the level do the tail requests complete? (diagnoses
        # the SERVE_r04 conc-8 p99 cliff: warmup ramp vs scheduling)
        p99_cut = float(np.percentile(all_ms, 99))
        tail_offsets = sorted(l[2] for l in lats if l[0] * 1e3 >= p99_cut)
        if tail_offsets:
            row["tail_completion_offset_s"] = {
                "min": round(tail_offsets[0], 2),
                "median": round(
                    float(np.percentile(tail_offsets, 50)), 2),
                "max": round(tail_offsets[-1], 2),
            }
        main_ms = sorted(l[0] * 1e3 for l in lats if not l[1])
        if alt_ms and main_ms:
            # the fairness contract (oldest-head-first bucket pickup):
            # minority p50 within a small multiple of the majority's
            row["main_bucket_p50_ms"] = round(
                float(np.percentile(main_ms, 50)), 1)
            row["alt_over_main_p50"] = round(
                row["alt_bucket_p50_ms"] / row["main_bucket_p50_ms"], 2)
        rows.append(row)
        print(row)
        assert not errors, errors[:3]

    result = {
        "what": ("closed-loop load test of ViewFusionService: dynamic "
                 "batching (batch 8, 10ms window), per-bucket warmup "
                 "[8, 16] steps x3 dispatches (r5: post-compile ramp "
                 "moved into warmup), 10% of ALL traffic on the "
                 "16-step bucket; scheduler serves the bucket whose "
                 "head request waited longest (starvation fix, r4); "
                 "tail_completion_offset_s locates each level's p99 "
                 "population in time"),
        "platform": jax.devices()[0].platform,
        "device": jax.devices()[0].device_kind,
        "model": f"tiny UNet {image_size}px (mechanism test; absolute "
                 "latency scales with the real model/device)",
        "warmup_seconds_two_buckets": round(warmup_s, 1),
        "duration_per_level_s": args.seconds,
        "levels": rows,
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
