"""Serving tests: dynamic batching, real HTTP handler, validation."""

import base64
import copy
import io
import json
import threading
import urllib.error
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


@pytest.fixture(scope="module")
def service(trained_run):
    from viewfusion_tpu.serving import ViewFusionService

    return ViewFusionService(trained_run, batch_size=4, max_wait_ms=20,
                             default_steps=4)


def test_service_submit_and_batching(service):
    from viewfusion_tpu.serving import ClientError

    rng = np.random.default_rng(0)
    cond = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)

    # concurrent requests get coalesced into one device batch
    results = [None] * 3

    def call(i):
        results[i] = service.submit(cond[: 1 + i % 2], angle=0.5 * i)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for r in results:
        assert r.shape == (8, 8, 3)
        assert np.all(np.isfinite(r))
        assert 0.0 <= r.min() and r.max() <= 1.0

    with pytest.raises(ClientError, match="N, H, W, 3"):
        service.submit(np.zeros((8, 8, 3), np.float32), 0.0)
    with pytest.raises(ClientError, match="8x8"):
        service.submit(np.zeros((1, 16, 16, 3), np.float32), 0.0)
    with pytest.raises(ClientError, match="at most"):
        service.submit(np.zeros((25, 8, 8, 3), np.float32), 0.0)
    with pytest.raises(ClientError, match="at least one"):
        service.submit(np.zeros((0, 8, 8, 3), np.float32), 0.0)
    with pytest.raises(ClientError, match="steps"):
        service.submit(cond[:1], 0.0, steps=0)
    with pytest.raises(ClientError, match="steps"):
        service.submit(cond[:1], 0.0, steps=10**9)
    with pytest.raises(ClientError, match="angle"):
        service.submit(cond[:1], angle=None)


@pytest.fixture(scope="module")
def http_server(service):
    from viewfusion_tpu.serving import make_server

    httpd = make_server(service, host="127.0.0.1", port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload: dict):
    req = urllib.request.Request(
        f"{url}/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def test_http_real_handler(http_server):
    url = http_server
    with urllib.request.urlopen(f"{url}/healthz") as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok"
    assert health["image_size"] == 8
    assert health["max_steps"] == 8

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        (np.random.default_rng(1).uniform(0, 1, (8, 8, 3)) * 255).astype(
            np.uint8)
    ).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    status, out = _post(url, {"views": [b64], "angle": 1.0, "steps": 4})
    assert status == 200
    img = Image.open(io.BytesIO(base64.b64decode(out["image"])))
    assert img.size == (8, 8)

    # array-valued views also work
    status, out = _post(url, {
        "views": [np.zeros((8, 8, 3)).tolist()], "angle": 0.0, "steps": 2,
    })
    assert status == 200


@pytest.mark.parametrize(
    "payload,match",
    [
        ({"angle": 1.0}, "views"),                       # missing views
        ({"views": [], "angle": 1.0}, "non-empty"),      # empty views
        ({"views": ["bm90YXBuZw=="], "angle": 1.0}, "undecodable"),
        ({"views": [[[0, 0, 0]]], "angle": None}, "angle"),
        ({"views": [123], "angle": 1.0}, "invalid view"),
    ],
)
def test_http_client_errors_are_400(http_server, payload, match):
    # make the inner arrays valid enough to reach the failing check
    if payload.get("views") == [[[0, 0, 0]]]:
        payload["views"] = [np.zeros((8, 8, 3)).tolist()]
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(http_server, payload)
    assert exc.value.code == 400
    body = json.loads(exc.value.read())
    assert match.lower() in body["error"].lower()


def test_http_not_found_and_non_dict(http_server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(http_server, {"angle": 1.0})
    assert exc.value.code == 400
    req = urllib.request.Request(
        f"{http_server}/nope", data=b"{}",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 404
    req = urllib.request.Request(
        f"{http_server}/generate", data=b"[1,2]",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=30)
    assert exc.value.code == 400


def test_abandoned_requests_skipped(service):
    """A request whose waiter timed out must not consume device work."""
    cond = np.zeros((1, 8, 8, 3), np.float32)
    with pytest.raises(TimeoutError):
        service.submit(cond, 0.0, timeout=0.0)
    # the queue drains without the abandoned request blocking new ones
    out = service.submit(cond, 0.0)
    assert out.shape == (8, 8, 3)


def test_warmup_buckets_and_mixed_steps(service):
    """Per-bucket warmup precompiles every listed step count, and mixed
    step-count traffic completes concurrently — a second bucket rides
    its own program instead of blocking the first bucket's batches."""
    service.warmup([4, 6])
    assert service.warmed_steps[-2:] == [(4, "ddim"), (6, "ddim")]
    with pytest.raises(ValueError, match="warmup steps"):
        service.warmup([0])

    rng = np.random.default_rng(1)
    cond = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    results = {}

    def call(i, steps):
        results[i] = service.submit(cond, angle=0.3 * i, steps=steps)

    threads = [
        threading.Thread(target=call, args=(i, 4 if i % 2 else 6))
        for i in range(6)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert len(results) == 6
    for r in results.values():
        assert r.shape == (8, 8, 3) and np.all(np.isfinite(r))


def test_minority_bucket_not_starved(service):
    """Under sustained majority-bucket load, a minority (steps, sampler)
    bucket must be served within a small multiple of the majority
    latency.  The oldest-head-first scheduler guarantees a minority
    request outranks all majority requests that arrived after it; the
    old tail-requeue design starved it for as long as the flood lasted
    (SERVE_r03.json: 10x p50 inflation)."""
    import time

    service.warmup([4, 6])
    rng = np.random.default_rng(3)
    cond = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)

    stop = threading.Event()
    maj_lat, min_lat = [], []
    lock = threading.Lock()

    def flood():
        while not stop.is_set():
            t0 = time.perf_counter()
            service.submit(cond, 0.0, steps=4)
            with lock:
                maj_lat.append(time.perf_counter() - t0)

    floods = [threading.Thread(target=flood) for _ in range(8)]
    for t in floods:
        t.start()
    try:
        time.sleep(0.3)  # build sustained queue depth before probing
        for i in range(4):
            t0 = time.perf_counter()
            out = service.submit(cond, 0.1 * i, steps=6)
            min_lat.append(time.perf_counter() - t0)
            assert out.shape == (8, 8, 3)
    finally:
        stop.set()
        for t in floods:
            t.join(60)

    maj_p50 = float(np.percentile(maj_lat, 50))
    min_p50 = float(np.percentile(min_lat, 50))
    # one in-flight majority batch + the minority's own fill window;
    # +0.25s absolute slack absorbs CPU-host timing noise
    assert min_p50 <= 3.0 * maj_p50 + 0.25, (
        f"minority p50 {min_p50:.3f}s vs majority p50 {maj_p50:.3f}s"
    )


def test_dpm_sampler_requests(service, http_server):
    """"sampler": "dpm" rides its own (steps, sampler) bucket; invalid
    sampler names map to 400 at the HTTP layer."""
    from viewfusion_tpu.serving import ClientError

    rng = np.random.default_rng(2)
    cond = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    service.warmup([4], sampler="dpm")
    out = service.submit(cond, angle=0.7, steps=4, sampler="dpm")
    assert out.shape == (8, 8, 3) and np.all(np.isfinite(out))
    # an ODE solver: same request twice -> different rng fold but no
    # injected noise path differences beyond the initial y_T draw
    with pytest.raises(ClientError, match="sampler"):
        service.submit(cond, angle=0.0, sampler="plms")
    with pytest.raises(ClientError, match="steps >= 2"):
        service.submit(cond, angle=0.0, steps=1, sampler="dpm")

    status, body = _post(http_server, {
        "views": [cond[0].tolist()], "angle": 1.0, "steps": 4,
        "sampler": "dpm",
    })
    assert status == 200 and "image" in body
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(http_server, {"views": [cond[0].tolist()], "angle": 1.0,
                            "sampler": "nope"})
    assert exc.value.code == 400


def test_service_serves_ema_weights(tmp_path):
    """EMA-trained run dirs (tpu.ema_decay > 0) must serve the EMA
    shadow params — the weights eval scored for best-model selection
    (Experiment._infer_params) — not the raw Adam iterate."""
    import jax

    from viewfusion_tpu.serving import ViewFusionService
    from viewfusion_tpu.training.checkpoint import Checkpoint

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
    # fast-moving EMA so the shadow measurably diverges from the raw
    # params within 4 steps
    raw.setdefault("tpu", {})["ema_decay"] = 0.5
    cfg_path = str(tmp_path / "c.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(raw, f)
    exp = Experiment(ExperimentArgs(config=cfg_path, train=True),
                     log_root=str(tmp_path / "logs"))
    exp.train()

    svc = ViewFusionService(exp.out_dir, batch_size=2, default_steps=2)
    served = jax.device_get(svc.params)
    tpl = jax.tree_util.tree_map(np.zeros_like, served)
    restored, _ = Checkpoint(exp.out_dir).load(
        "model.msgpack", {"params": tpl, "ema_params": tpl}
    )
    srv, ema, raw_p = (jax.tree_util.tree_leaves(t) for t in
                       (served, restored["ema_params"],
                        restored["params"]))
    assert all(np.allclose(a, b) for a, b in zip(srv, ema))
    # and the two weight sets genuinely differ after 4 Adam steps
    assert any(not np.allclose(a, b, atol=1e-7)
               for a, b in zip(ema, raw_p))


def test_service_ema_config_with_params_only_checkpoint(tmp_path):
    """An EMA-configured run dir whose checkpoint lacks ema_params (e.g.
    torch-converted weights) must serve the checkpoint's real params —
    NOT the template, which is the fresh random init (advisor r3)."""
    import jax
    import yaml as _yaml

    from viewfusion_tpu.config import load_config
    from viewfusion_tpu.models.view_fusion import ViewFusion
    from viewfusion_tpu.serving import ViewFusionService
    from viewfusion_tpu.training.checkpoint import Checkpoint

    raw = copy.deepcopy(TINY_CONFIG)
    raw.setdefault("tpu", {})["ema_decay"] = 0.99
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    with open(run_dir / "config.yaml", "w") as f:
        _yaml.dump(raw, f)
    cfg = load_config(str(run_dir / "config.yaml"))
    model = ViewFusion.from_config(cfg)
    hw = cfg.denoiser.image_size
    cc = cfg.denoiser.in_channel - 3
    # distinctive non-random weights, saved WITHOUT an ema_params field
    params = model.init(
        jax.random.PRNGKey(7),
        np.zeros((1, 1, hw, hw, cc), np.float32),
        np.zeros((1, hw, hw, 3), np.float32),
    )
    params = jax.tree_util.tree_map(
        lambda x: np.full_like(x, 0.123), params
    )
    Checkpoint(str(run_dir)).save("model.msgpack", {"params": params})

    svc = ViewFusionService(str(run_dir), batch_size=2, default_steps=2)
    for leaf in jax.tree_util.tree_leaves(jax.device_get(svc.params)):
        assert np.allclose(leaf, 0.123)
