#!/usr/bin/env python
"""Host->device transfer diagnostics for the tunneled TPU.

Answers three questions behind the data-fed vs synthetic step-rate gap
(bench.py: the same jitted step is ~35% slower when each step's batch
must be device_put from the host):

1. per-put cost vs payload size — is the tunnel latency-dominated
   (fixed cost per RPC) or bandwidth-dominated (cost ~ bytes)?
2. split vs fused batch — the trainer ships target/cond/angle as
   separate puts (parallel/mesh.py:shard_batch); would packing them
   into ONE buffer save real time?
3. overlap — do H2D transfers issued from a worker thread actually
   overlap with compute dispatched from the main thread, or does the
   tunnel serialize them?

Methodology: K-puts marginal slope.  ``block_until_ready`` is not
trusted on the tunneled runtime (see viewfusion_tpu/utils/timing.py);
instead we enqueue K puts, force all K with one fetch of a scalar that
consumes one element of every put array, and take the slope between two
K values to cancel the fetch/dispatch constant.

Writes H2D_PROBE_r03.json and prints it.
"""

import json
import sys
import threading
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def puts_seconds(buffers, K1=8, K2=32, repeats=3):
    """Marginal seconds per round of device_put'ing every array in
    ``buffers`` (a list of numpy arrays = one round)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def consume(xs):
        # one element of every array -> one tiny fetch forces them all
        return sum(jnp.asarray(x.reshape(-1)[0], jnp.float32) for x in xs)

    def timed(K):
        # warm
        float(consume([jax.device_put(b) for b in buffers]))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            devs = []
            for _ in range(K):
                devs = [jax.device_put(b) for b in buffers]
            float(consume(devs))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(K2) - timed(K1)) / (K2 - K1)


def overlap_ratio(put_mb=2.4, rounds=24, n=2048):
    """Run a fixed compute workload; measure it alone, then with a
    worker thread streaming device_puts.  Returns compute slowdown
    (1.0 = perfect overlap)."""
    import jax
    import jax.numpy as jnp

    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def work(x):
        def body(c, _):
            return jax.nn.relu(c @ a) * jnp.bfloat16(1e-3), None

        out, _ = jax.lax.scan(body, x, None, length=64)
        return jnp.float32(out.mean())

    float(work(a))  # warm

    def compute_once():
        t0 = time.perf_counter()
        for _ in range(rounds):
            r = work(a)
        float(r)
        return time.perf_counter() - t0

    alone = min(compute_once() for _ in range(3))

    buf = np.random.default_rng(0).integers(
        0, 256, (int(put_mb * 1e6),), np.uint8
    )
    stop = threading.Event()
    nputs = [0]

    def feeder():
        while not stop.is_set():
            x = jax.device_put(buf)
            x.block_until_ready()
            nputs[0] += 1

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    time.sleep(0.5)  # feeder reaches steady state
    with_feed = min(compute_once() for _ in range(3))
    stop.set()
    t.join(timeout=10)
    return alone, with_feed, nputs[0]


def main():
    import jax

    dev = jax.devices()[0]
    log(f"device: {dev} platform={dev.platform}")
    rng = np.random.default_rng(0)
    out = {"device": str(dev.device_kind), "platform": dev.platform}
    # the compute chains are sized for the TPU; on CPU (smoke runs)
    # shrink them so the script finishes in seconds
    cpu = dev.platform == "cpu"
    mm_n = 128 if cpu else 2048
    ov_rounds = 3 if cpu else 24

    # 1. size sweep (uint8 payloads, the shipped feed dtype)
    sizes = {
        "1KB": 1024,
        "128KB": 128 * 1024,
        "target_344KB": 28 * 64 * 64 * 3,
        "cond_2.06MB": 28 * 6 * 64 * 64 * 3,
        "fused_2.4MB": 28 * 7 * 64 * 64 * 3,
        "8MB": 8 * 1024 * 1024,
    }
    sweep = {}
    for name, nbytes in sizes.items():
        buf = rng.integers(0, 256, (nbytes,), np.uint8)
        s = puts_seconds([buf])
        sweep[name] = {
            "bytes": nbytes,
            "ms_per_put": round(s * 1e3, 3),
            "mb_per_s": round(nbytes / s / 1e6, 1),
        }
        log(f"put {name}: {s * 1e3:.3f} ms -> "
            f"{nbytes / s / 1e6:.1f} MB/s")
    out["put_size_sweep"] = sweep

    # latency/bandwidth decomposition from the two extreme points
    s_small = sweep["1KB"]["ms_per_put"]
    s_big = sweep["8MB"]["ms_per_put"]
    bw = (sizes["8MB"] - sizes["1KB"]) / ((s_big - s_small) / 1e3) / 1e6
    out["est_fixed_ms_per_put"] = round(s_small, 3)
    out["est_bandwidth_mb_s"] = round(bw, 1)
    log(f"est fixed cost {s_small:.3f} ms/put, bandwidth {bw:.1f} MB/s")

    # 2. split (trainer layout) vs fused single buffer
    b, n, hw = 28, 6, 64
    split = [
        rng.integers(0, 256, (b, hw, hw, 3), np.uint8),       # target
        rng.integers(0, 256, (b, n, hw, hw, 3), np.uint8),    # cond
        rng.uniform(0, 6.28, (b,)).astype(np.float32),        # angle
        rng.integers(1, n + 1, (b,)).astype(np.int32),        # view_count
        np.arange(98, dtype=np.int32),                        # sample_idx
        np.arange(98, dtype=np.int32),                        # view_idx
    ]
    fused_img = rng.integers(0, 256, (b, n + 1, hw, hw, 3), np.uint8)
    fused_meta = rng.uniform(0, 6.28, (b * 2 + 196,)).astype(np.float32)
    t_split = puts_seconds(split)
    t_fused = puts_seconds([fused_img, fused_meta])
    out["split_6puts_ms"] = round(t_split * 1e3, 3)
    out["fused_2puts_ms"] = round(t_fused * 1e3, 3)
    log(f"batch feed: split 6 puts {t_split * 1e3:.3f} ms, "
        f"fused 2 puts {t_fused * 1e3:.3f} ms")

    # 3. compute/transfer overlap
    alone, with_feed, nputs = overlap_ratio(rounds=ov_rounds, n=mm_n)
    out["compute_alone_s"] = round(alone, 4)
    out["compute_with_feed_s"] = round(with_feed, 4)
    out["feed_slowdown"] = round(with_feed / alone, 3)
    log(f"overlap: compute {alone:.3f}s alone, {with_feed:.3f}s with "
        f"feeder ({nputs} puts) -> slowdown {with_feed / alone:.3f}x")

    with open("H2D_PROBE_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
