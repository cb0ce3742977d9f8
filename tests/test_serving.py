"""Serving tests: dynamic batching, HTTP endpoints, input validation."""

import base64
import copy
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
import yaml

from tests.conftest import TINY_CONFIG
from viewfusion_tpu.data.synthetic import make_synthetic_shards
from viewfusion_tpu.training.trainer import Experiment, ExperimentArgs


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("serve")
    data_dir = str(tmp_path / "data")
    make_synthetic_shards(data_dir, "train", num_objects=4, image_size=8)
    make_synthetic_shards(data_dir, "test", num_objects=4, image_size=8)
    raw = copy.deepcopy(TINY_CONFIG)
    for split in ("train", "test"):
        raw["data"]["params"][split]["params"]["path"] = data_dir
    raw["data"]["params"]["batch_size"] = 4
    raw["model"]["max_it"] = 4
    raw["model"]["checkpoint_every"] = 2
    raw["model"]["validate_every"] = 0
    cfg_path = str(tmp_path / "c.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(raw, f)
    exp = Experiment(ExperimentArgs(config=cfg_path, train=True),
                     log_root=str(tmp_path / "logs"))
    exp.train()
    return exp.out_dir


def test_service_submit_and_batching(trained_run):
    from viewfusion_tpu.serving import ViewFusionService

    svc = ViewFusionService(trained_run, batch_size=4, max_wait_ms=20,
                            default_steps=4)
    rng = np.random.default_rng(0)
    cond = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)

    # concurrent requests get coalesced into one device batch
    results = [None] * 3
    def call(i):
        results[i] = svc.submit(cond[: 1 + i % 2], angle=0.5 * i)
    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for r in results:
        assert r.shape == (8, 8, 3)
        assert np.all(np.isfinite(r))
        assert 0.0 <= r.min() and r.max() <= 1.0

    with pytest.raises(ValueError, match="N, H, W, 3"):
        svc.submit(np.zeros((8, 8, 3), np.float32), 0.0)
    with pytest.raises(ValueError, match="8x8"):
        svc.submit(np.zeros((1, 16, 16, 3), np.float32), 0.0)
    with pytest.raises(ValueError, match="at most"):
        svc.submit(np.zeros((25, 8, 8, 3), np.float32), 0.0)


def test_http_endpoints(trained_run):
    from http.server import ThreadingHTTPServer

    import viewfusion_tpu.serving as serving_mod

    # build the server on an ephemeral port without blocking
    svc = serving_mod.ViewFusionService(trained_run, batch_size=2,
                                        max_wait_ms=5, default_steps=4)

    # reuse serve()'s handler by invoking it in a thread on port 0
    held = {}

    def run():
        import http.server

        class H(http.server.BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _send(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                self._send(200, {"status": "ok"})

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length))
                cond = serving_mod._decode_views(payload, 8)
                img = svc.submit(cond, payload["angle"],
                                 payload.get("steps"))
                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray((img * 255).astype(np.uint8)).save(
                    buf, format="PNG")
                self._send(200, {
                    "image": base64.b64encode(buf.getvalue()).decode()})

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
        held["port"] = httpd.server_address[1]
        held["httpd"] = httpd
        httpd.serve_forever()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    import time

    for _ in range(100):
        if "port" in held:
            break
        time.sleep(0.05)

    # health
    with urllib.request.urlopen(
        f"http://127.0.0.1:{held['port']}/healthz"
    ) as resp:
        assert json.loads(resp.read())["status"] == "ok"

    # generate with a base64 PNG view
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.random.default_rng(1).uniform(0, 1, (8, 8, 3)) * 255).astype(
            np.uint8)
    ).save(buf, format="PNG")
    payload = json.dumps({
        "views": [base64.b64encode(buf.getvalue()).decode()],
        "angle": 1.0,
        "steps": 4,
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{held['port']}/generate", data=payload,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        out = json.loads(resp.read())
    img = Image.open(io.BytesIO(base64.b64decode(out["image"])))
    assert img.size == (8, 8)
    held["httpd"].shutdown()
