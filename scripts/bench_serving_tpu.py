#!/usr/bin/env python
"""Real-device serving latency/throughput over actual HTTP.

Starts ViewFusionService on a trained run dir (flagship model, DDIM-50)
with the real ThreadingHTTPServer on an ephemeral port, then drives it
with closed-loop HTTP clients posting base64-PNG views.  Appends a
`tpu_http` section to SERVE_r03.json (the CPU section covers the
batching mechanics; this records what a production client sees on the
chip).

Usage: python scripts/bench_serving_tpu.py <run_dir> [--out SERVE_r03.json]
"""

import argparse
import base64
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--out", default=None)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--concurrency", default="4,16")
    ap.add_argument("--sampler", default="ddim",
                    choices=["ddim", "dpm", "dpm_sde"])
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    from PIL import Image

    from viewfusion_tpu.serving import ViewFusionService, make_server

    t0 = time.perf_counter()
    service = ViewFusionService(args.run_dir, batch_size=8,
                                max_wait_ms=30, default_steps=args.steps)
    service.warmup([args.steps], sampler=args.sampler)
    warm_s = time.perf_counter() - t0
    print(f"service up (load+compile/cache): {warm_s:.1f}s")

    httpd = make_server(service, host="127.0.0.1", port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    hw = service.image_size
    rng = np.random.default_rng(0)
    pngs = []
    for i in range(3):
        img = (rng.uniform(0, 1, (hw, hw, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        pngs.append(base64.b64encode(buf.getvalue()).decode())

    url = f"http://127.0.0.1:{port}/generate"
    levels = []
    for conc in [int(c) for c in args.concurrency.split(",")]:
        lats, errors = [], []
        lock = threading.Lock()
        stop = time.perf_counter() + args.seconds

        def client(cid):
            i = 0
            while time.perf_counter() < stop:
                i += 1
                body = json.dumps({
                    "views": pngs[: 1 + (i % 3)],
                    "angle": 0.3 * i,
                    "sampler": args.sampler,
                    "steps": args.steps,
                }).encode()
                t0 = time.perf_counter()
                try:
                    with urllib.request.urlopen(
                        urllib.request.Request(
                            url, data=body,
                            headers={"Content-Type": "application/json"},
                        ),
                        timeout=120,
                    ) as resp:
                        payload = json.loads(resp.read())
                        assert "image" in payload
                    with lock:
                        lats.append(time.perf_counter() - t0)
                except Exception as e:  # noqa: BLE001
                    with lock:
                        errors.append(str(e))

        threads = [threading.Thread(target=client, args=(c,))
                   for c in range(conc)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        ms = sorted(x * 1e3 for x in lats)
        row = {
            "concurrency": conc,
            "requests": len(lats),
            "errors": len(errors),
            "throughput_rps": round(len(lats) / wall, 2),
            "p50_ms": round(float(np.percentile(ms, 50)), 1),
            "p99_ms": round(float(np.percentile(ms, 99)), 1),
        }
        levels.append(row)
        print(row)
        assert not errors, errors[:3]

    import jax

    section = {
        "what": ("real HTTP clients against the production server on "
                 f"the chip: flagship model, {args.sampler}-"
                 f"{args.steps}, batch 8, PNG-decode + base64 + HTTP "
                 "included"),
        "device": jax.devices()[0].device_kind,
        "startup_seconds": round(warm_s, 1),
        "duration_per_level_s": args.seconds,
        "levels": levels,
    }
    if args.out:
        doc = json.load(open(args.out)) if os.path.exists(args.out) else {}
        doc["tpu_http"] = section
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
