"""Production inference serving: dynamic-batching novel-view server.

The reference is a research pipeline with no serving story; this module
turns a trained run directory into a network service (stdlib-only HTTP,
no extra deps):

  * requests carry N conditioning views (PNG bytes or [0,1] arrays) and
    a target azimuth; responses carry the generated view;
  * a background worker coalesces queued requests into fixed-size
    batches — one batch per (steps, sampler) bucket — so the TPU sees a
    static shape per bucket and never recompiles per request; buckets
    are served oldest-waiting-request first, so a minority bucket is
    reached within one batch cycle of its arrival order instead of
    starving behind sustained majority traffic;
  * sampling uses the DDIM fast path by default (92 views/s on a v5e at
    50 steps); "sampler": "dpm_sde" selects DPM-Solver++(2M) SDE (best
    measured quality per step, SAMPLER_QUALITY_r03.json) and "dpm" its
    deterministic ODE form; timed-out/abandoned requests are skipped,
    client input errors map to 400s, and body size / step counts are
    bounded.

Usage:
    python -m viewfusion_tpu.serving -s logs/<run-dir> --port 8000
    POST /generate  {"views": [<b64 png>...], "angle": 1.57,
                     "steps": 50, "sampler": "ddim"}
    GET  /healthz
"""

from __future__ import annotations

import argparse
import base64
import binascii
import io
import json
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from functools import partial
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

import numpy as np

__all__ = ["ViewFusionService", "make_server", "serve"]

MAX_BODY_BYTES = 64 * 1024 * 1024  # generous: 24 views of raw float lists


class ClientError(ValueError):
    """Invalid client input -> HTTP 400."""


@dataclass
class _Request:
    cond: np.ndarray          # (N, H, W, 3) float32 [0,1]
    angle: float
    steps: int
    sampler: str              # "ddim" | "dpm"
    deadline: float
    arrival: float = field(default_factory=time.monotonic)
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[str] = None

    @property
    def abandoned(self) -> bool:
        return time.monotonic() > self.deadline


class ViewFusionService:
    """Loads a run dir (config + best checkpoint) and serves batched
    generation with a static-shape device program.

    ``max_views`` bounds the conditioning buffer (default: the training
    config's max_views) — padding to the full 24 stored views would
    waste up to 24x UNet FLOPs on typical 1-6 view requests."""

    def __init__(self, run_dir: str, batch_size: int = 8,
                 max_wait_ms: float = 30.0, default_steps: int = 50,
                 request_timeout: float = 900.0,
                 max_views: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        from viewfusion_tpu.config import load_config
        from viewfusion_tpu.models.view_fusion import ViewFusion
        from viewfusion_tpu.training.checkpoint import Checkpoint
        from viewfusion_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        self.config = load_config(f"{run_dir}/config.yaml")
        self.model = ViewFusion.from_config(self.config)
        self.n_max = max_views or self.config.data.max_views
        self.image_size = self.config.denoiser.image_size
        self.batch_size = batch_size
        self.max_wait_ms = max_wait_ms
        self.default_steps = default_steps
        self.request_timeout = request_timeout
        self.max_steps = self.model.schedule.num_timesteps

        # params-only load (converted or trained checkpoints both work)
        ckpt = Checkpoint(run_dir)
        hw = self.image_size
        cc = self.config.denoiser.in_channel - 3
        params = jax.jit(self.model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1, hw, hw, cc), jnp.float32),
            jnp.zeros((1, hw, hw, 3), jnp.float32),
        )
        name = ("best_model_all.msgpack"
                if ckpt.exists("best_model_all.msgpack") else
                "model.msgpack")
        # EMA-trained runs (tpu.ema_decay > 0) select best-model
        # checkpoints by evaluating the EMA shadow params
        # (Experiment._infer_params); serve those same weights — the raw
        # params are the Adam iterate, not what the eval metric scored.
        # The trainer initializes the shadow whenever decay > 0, so the
        # field is present in checkpoints from such runs; a checkpoint
        # WITHOUT it under an EMA config (e.g. torch-converted weights
        # dropped into an EMA-configured run dir) must fall back to the
        # real params — load() would otherwise keep the template, i.e.
        # the freshly-initialized RANDOM weights.
        template = {"params": params}
        use_ema = self.config.train.ema_decay > 0
        if use_ema:
            template["ema_params"] = params
        restored, _ = ckpt.load(name, template)
        if use_ema and "ema_params" in ckpt.last_missing:
            print(f"WARNING: {name} has no ema_params field despite "
                  "tpu.ema_decay > 0; serving the checkpoint's raw "
                  "params instead.", flush=True)
            use_ema = False
        weights = restored["ema_params"] if use_ema else restored["params"]
        # Pin the weights on device ONCE: load() restores numpy arrays,
        # and passing those to jit re-uploads the full params tree
        # (~136 MB for the flagship) on EVERY batch — measured ~5 s per
        # request over a tunneled link before this device_put.
        self.params = jax.device_put(weights)

        self._jnp = jnp
        self._jax = jax
        self._ddim = jax.jit(
            self.model.generate_ddim, static_argnames=("num_steps",)
        )
        self._dpm = jax.jit(
            self.model.generate_dpm, static_argnames=("num_steps",)
        )
        self._dpm_sde = jax.jit(
            partial(self.model.generate_dpm, sde=True),
            static_argnames=("num_steps",),
        )
        # one FIFO per (steps, sampler) bucket; the worker serves the
        # bucket whose HEAD request has waited longest (see _run)
        self._cond = threading.Condition()
        self._buckets: "dict[tuple, deque[_Request]]" = {}
        self._counter = 0
        # (steps, sampler) buckets precompiled by warmup()
        self.warmed_steps: List[tuple] = []
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------
    def warmup(self, steps_list: Optional[List[int]] = None,
               sampler: str = "ddim") -> None:
        """Compile (or load from the persistent cache) the sampler for
        each step-count bucket before accepting traffic, so no request
        with a listed ``steps`` value ever pays a mid-traffic jit
        compile.  Default: just the default-steps bucket; pass
        additional buckets you expect clients to use (CLI:
        ``--warmup-steps 50,250``).  ``sampler`` picks the bucket
        family ("ddim" or "dpm") — call twice to pre-warm both."""
        jnp = self._jnp
        fn = self._sampler_fn(sampler)
        b, hw = self.batch_size, self.image_size
        for steps in steps_list or [self.default_steps]:
            steps = int(steps)
            if not 1 <= steps <= self.max_steps:
                raise ValueError(
                    f"warmup steps must be in [1, {self.max_steps}], "
                    f"got {steps}"
                )
            # 3 dispatches, not 1: the first few dispatches after a
            # fresh compile run far below steady state (bench.py
            # measures 2-8 steps/s vs 10.4 for the train step; for
            # serving this surfaced as SERVE_r04's p99=1087ms at the
            # FIRST load level vs 150ms at the second — the ramp, not
            # scheduling).  Extra warmup dispatches move that cost to
            # warmup() where it belongs.
            for _ in range(3):
                out = fn(
                    self.params, self._jax.random.PRNGKey(0),
                    jnp.zeros((b, self.n_max, hw, hw, 3), jnp.float32),
                    jnp.ones((b,), jnp.int32),
                    jnp.zeros((b,), jnp.float32),
                    num_steps=steps,
                )
                self._jax.block_until_ready(out)
            self.warmed_steps.append((steps, sampler))

    def _sampler_fn(self, sampler: str):
        if sampler == "ddim":
            return self._ddim
        if sampler == "dpm":
            return self._dpm
        if sampler == "dpm_sde":
            return self._dpm_sde
        raise ClientError(
            f'sampler must be "ddim", "dpm", or "dpm_sde", '
            f'got {sampler!r}'
        )

    # ------------------------------------------------------------------
    def submit(self, cond: np.ndarray, angle: float,
               steps: Optional[int] = None,
               timeout: Optional[float] = None,
               sampler: str = "ddim") -> np.ndarray:
        """Blocking generate; thread-safe.  Raises ClientError on invalid
        input (HTTP layer maps it to 400)."""
        cond = np.asarray(cond)
        if cond.ndim != 4 or cond.shape[-1] != 3:
            raise ClientError(
                f"cond must be (N, H, W, 3), got {cond.shape}"
            )
        if cond.shape[0] < 1:
            raise ClientError("at least one conditioning view required")
        if cond.shape[0] > self.n_max:
            raise ClientError(
                f"at most {self.n_max} conditioning views supported"
            )
        if cond.shape[1] != self.image_size or \
                cond.shape[2] != self.image_size:
            raise ClientError(
                f"views must be {self.image_size}x{self.image_size}"
            )
        steps = self.default_steps if steps is None else int(steps)
        if not 1 <= steps <= self.max_steps:
            raise ClientError(
                f"steps must be in [1, {self.max_steps}], got {steps}"
            )
        self._sampler_fn(sampler)  # validate early -> HTTP 400
        if sampler in ("dpm", "dpm_sde") and steps < 2:
            raise ClientError("dpm requires steps >= 2")
        try:
            angle = float(angle)
        except (TypeError, ValueError):
            raise ClientError(f"angle must be a number, got {angle!r}")

        wait = self.request_timeout if timeout is None else timeout
        req = _Request(cond=cond.astype(np.float32), angle=angle,
                       steps=steps, sampler=sampler,
                       deadline=time.monotonic() + wait)
        with self._cond:
            self._buckets.setdefault((steps, sampler),
                                     deque()).append(req)
            self._cond.notify()
        # first request pays jit compile (minutes on a cold cache)
        if not req.event.wait(wait):
            raise TimeoutError("generation timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req.result

    # ------------------------------------------------------------------
    def _run(self) -> None:
        # Scheduler: pick the bucket whose HEAD request has waited
        # longest, wait up to max_wait_ms for that bucket to fill, run
        # one device batch, repeat.  Oldest-head-first makes service
        # order FIFO across buckets at batch granularity: a minority
        # bucket's request outranks every majority request that arrived
        # after it, so it is served within one in-flight batch plus its
        # own — the tail-requeue design this replaces let sustained
        # majority traffic starve minority buckets indefinitely
        # (SERVE_r03.json measured 10x p50 inflation at concurrency 32).
        while True:
            with self._cond:
                key = None
                while key is None:
                    for k in list(self._buckets):
                        dq = self._buckets[k]
                        while dq and dq[0].abandoned:
                            dq.popleft()
                        if not dq:
                            del self._buckets[k]
                    if self._buckets:
                        key = min(
                            self._buckets,
                            key=lambda k: self._buckets[k][0].arrival,
                        )
                    else:
                        self._cond.wait()
                dq = self._buckets[key]
                deadline = time.perf_counter() + self.max_wait_ms / 1e3
                while len(dq) < self.batch_size:
                    remaining = deadline - time.perf_counter()
                    if remaining <= 0:
                        break
                    self._cond.wait(timeout=remaining)
                batch = [dq.popleft()
                         for _ in range(min(self.batch_size, len(dq)))]
                if not dq:
                    del self._buckets[key]
            self._generate(batch, *key)

    def _generate(self, reqs: List[_Request], steps: int,
                  sampler: str = "ddim") -> None:
        reqs = [r for r in reqs if not r.abandoned]
        if not reqs:
            return
        jnp = self._jnp
        b = self.batch_size
        hw = self.image_size
        cond = np.zeros((b, self.n_max, hw, hw, 3), np.float32)
        counts = np.ones((b,), np.int32)
        angles = np.zeros((b,), np.float32)
        for i in range(b):
            r = reqs[min(i, len(reqs) - 1)]  # pad with the last request
            counts[i] = r.cond.shape[0]
            cond[i, : counts[i]] = r.cond
            angles[i] = r.angle
        try:
            self._counter += 1
            key = self._jax.random.fold_in(
                self._jax.random.PRNGKey(0x5E11), self._counter
            )
            out = self._sampler_fn(sampler)(
                self.params, key, jnp.asarray(cond), jnp.asarray(counts),
                jnp.asarray(angles), num_steps=steps,
            )
            images = np.clip(np.asarray(out), 0.0, 1.0)
            for i, r in enumerate(reqs):
                r.result = images[i]
                r.event.set()
        except Exception as e:  # surface device errors to callers
            for r in reqs:
                r.error = str(e)
                r.event.set()


def _decode_views(payload: dict) -> np.ndarray:
    from PIL import Image

    views = payload.get("views")
    if not isinstance(views, list) or not views:
        raise ClientError('"views" must be a non-empty list')
    decoded = []
    for item in views:
        if isinstance(item, str):  # base64 PNG
            try:
                img = Image.open(io.BytesIO(base64.b64decode(item)))
                decoded.append(
                    np.asarray(img.convert("RGB"), np.float32) / 255.0
                )
            except (binascii.Error, OSError) as e:
                raise ClientError(f"undecodable view image: {e}")
        else:  # nested lists
            try:
                arr = np.asarray(item, np.float32)
            except (TypeError, ValueError) as e:
                raise ClientError(f"invalid view array: {e}")
            if arr.ndim != 3:
                raise ClientError(
                    f"invalid view array: expected (H, W, 3), "
                    f"got shape {arr.shape}"
                )
            decoded.append(arr)
    try:
        return np.stack(decoded)
    except ValueError as e:
        raise ClientError(f"views have inconsistent shapes: {e}")


def make_server(service: ViewFusionService, host: str = "0.0.0.0",
                port: int = 0) -> ThreadingHTTPServer:
    """Build the HTTP server (port 0 = ephemeral, for tests)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok",
                                 "image_size": service.image_size,
                                 "max_views": service.n_max,
                                 "max_steps": service.max_steps})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > MAX_BODY_BYTES:
                    self._send(413, {"error": "request body too large"})
                    return
                payload = json.loads(self.rfile.read(length))
                if not isinstance(payload, dict):
                    raise ClientError("body must be a JSON object")
                if "angle" not in payload:
                    raise ClientError('"angle" is required')
                cond = _decode_views(payload)
                img = service.submit(
                    cond, payload["angle"], payload.get("steps"),
                    sampler=payload.get("sampler", "ddim"),
                )
                buf = io.BytesIO()
                from PIL import Image

                Image.fromarray(
                    (img * 255).astype(np.uint8)
                ).save(buf, format="PNG")
                self._send(200, {
                    "image": base64.b64encode(buf.getvalue()).decode()
                })
            except (ClientError, KeyError, TypeError,
                    json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})
            except TimeoutError as e:
                self._send(503, {"error": str(e)})
            except Exception as e:  # noqa: BLE001
                self._send(500, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)


def serve(run_dir: str, host: str = "0.0.0.0", port: int = 8000,
          batch_size: int = 8, default_steps: int = 50,
          max_views: Optional[int] = None, warmup: bool = True,
          warmup_steps: Optional[List[int]] = None,
          warmup_samplers: Optional[List[str]] = None) -> None:
    service = ViewFusionService(run_dir, batch_size=batch_size,
                                default_steps=default_steps,
                                max_views=max_views)
    if warmup:
        # the default bucket is ALWAYS warmed — "warmup_steps" lists
        # ADDITIONAL buckets (a request without an explicit steps field
        # must never pay a mid-traffic compile)
        buckets = list(warmup_steps or [])
        if default_steps not in buckets:
            buckets.insert(0, default_steps)
        samplers = warmup_samplers or ["ddim"]
        print(f"warming up (compiling step buckets {buckets} x "
              f"{samplers})...", flush=True)
        for s in samplers:
            service.warmup(buckets, sampler=s)
    httpd = make_server(service, host, port)
    print(f"serving {run_dir} on {host}:{httpd.server_address[1]}")
    httpd.serve_forever()


def main(argv=None) -> None:
    from viewfusion_tpu.cli import _enable_hang_diagnostics

    _enable_hang_diagnostics()
    p = argparse.ArgumentParser()
    p.add_argument("-s", "--src", required=True, help="run directory")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--max-views", type=int, default=None)
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the startup compile of the default sampler")
    p.add_argument("--warmup-steps", default=None,
                   help="comma-separated step buckets to precompile at "
                        "startup (e.g. 50,250); default: the --steps "
                        "bucket only")
    p.add_argument("--warmup-samplers", default="ddim",
                   help="comma-separated sampler families to precompile "
                        "(ddim,dpm,dpm_sde); a request for an unwarmed "
                        "family pays a mid-traffic compile")
    args = p.parse_args(argv)
    buckets = None
    if args.warmup_steps:
        buckets = [int(s) for s in args.warmup_steps.split(",") if s]
        if args.steps not in buckets:
            buckets.insert(0, args.steps)
    samplers = [s for s in args.warmup_samplers.split(",") if s]
    serve(args.src, args.host, args.port, args.batch_size, args.steps,
          args.max_views, warmup=not args.no_warmup,
          warmup_steps=buckets, warmup_samplers=samplers)


if __name__ == "__main__":
    main()
