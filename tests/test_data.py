"""Data pipeline tests: tar IO round-trip, process_sample semantics,
stream sharding, batching (reference: data/nmr_dataset.py,
data/dataset_prep.py)."""

import numpy as np
import pytest

from viewfusion_tpu.config import SplitConfig
from viewfusion_tpu.data.nmr import (
    Batcher,
    NMRStream,
    create_nmr_stream,
    decode_views,
    prefetch,
    process_sample,
)
from viewfusion_tpu.data.synthetic import make_synthetic_shards, render_views
from viewfusion_tpu.data.tario import (
    TarShardWriter,
    expand_shard_urls,
    iter_tar_samples,
)


def test_tar_roundtrip(tmp_path):
    path = str(tmp_path / "t.tar")
    samples = [
        {"__key__": f"obj-{i}", "0000.png": bytes([i] * 10),
         "meta.txt": f"m{i}".encode()}
        for i in range(5)
    ]
    with TarShardWriter(path) as w:
        for s in samples:
            w.write(s)
    back = list(iter_tar_samples(path))
    assert len(back) == 5
    for orig, rt in zip(samples, back):
        assert rt["__key__"] == orig["__key__"]
        assert rt["0000.png"] == orig["0000.png"]
        assert rt["meta.txt"] == orig["meta.txt"]


def test_expand_shard_urls():
    urls = expand_shard_urls("/d", "train", 0, 3)
    assert urls == [f"/d/NMR-train-{i:02d}.tar" for i in range(4)]


def test_synthetic_shards_decode(tmp_path):
    paths = make_synthetic_shards(str(tmp_path), "train", num_objects=4,
                                  image_size=16)
    samples = list(iter_tar_samples(paths[0]))
    assert len(samples) == 4
    views = decode_views(samples[0])
    assert views.shape == (24, 16, 16, 3)
    assert views.dtype == np.float32
    assert 0.0 <= views.min() and views.max() <= 1.0
    assert "cameras.npz" in samples[0]


def test_shaded_family_renders_and_shards(tmp_path):
    """The round-4 "shaded" family: deterministic, smooth (anti-aliased,
    no per-view stamps), view-dependent with real occlusion events, and
    shard-compatible with the standard loader path."""
    from viewfusion_tpu.data.synthetic import render_views_shaded

    v = render_views_shaded(3, image_size=32)
    assert v.shape == (24, 32, 32, 3) and v.dtype == np.uint8
    assert np.array_equal(v, render_views_shaded(3, image_size=32))
    # all 24 views pairwise distinct (azimuth is recoverable)
    flat = v.reshape(24, -1).astype(np.int32)
    for i in range(24):
        for j in range(i + 1, 24):
            assert np.abs(flat[i] - flat[j]).mean() > 0.5
    # anti-aliased + gradient background => mostly mid-range values,
    # unlike the binary "squares" family
    mid = ((v > 10) & (v < 245)).mean()
    assert mid > 0.8
    # objects differ
    assert not np.array_equal(v, render_views_shaded(4, image_size=32))

    # occlusion actually occurs: the disc orbits at twice the square's
    # rate, so their centers come within touching distance on some
    # views of essentially every object
    rng = np.random.default_rng(3)
    _ = rng.uniform(0.45, 1.0, 3), rng.uniform(0.45, 1.0, 3)
    _ = rng.uniform(0.02, 0.22, 3), rng.uniform(0.05, 0.25, 3)
    phase = rng.uniform(0.0, 2.0 * np.pi)
    r_sq, r_di = rng.uniform(0.22, 0.32), rng.uniform(0.08, 0.18)
    half_sq, rad_di = rng.uniform(0.10, 0.16), rng.uniform(0.10, 0.17)
    hits = 0
    for vi in range(24):
        th = 2 * np.pi * vi / 24
        dx = r_sq * np.cos(th) - r_di * np.cos(2 * th + phase)
        dy = r_sq * np.sin(th) - r_di * np.sin(2 * th + phase)
        hits += np.hypot(dx, dy) < half_sq + rad_di
    assert hits > 0

    paths = make_synthetic_shards(str(tmp_path), "train", num_objects=2,
                                  image_size=32, family="shaded")
    samples = list(iter_tar_samples(paths[0]))
    assert len(samples) == 2
    views = decode_views(samples[0])
    assert views.shape == (24, 32, 32, 3)
    assert np.allclose(views, render_views_shaded(0, 32) / 255.0,
                       atol=1 / 255)


def test_process_sample_semantics(rng):
    views = render_views(0, image_size=8).astype(np.float32) / 255.0
    out = process_sample(views, "k", "test", rng, relative=True)
    assert out["target"].shape == (8, 8, 3)
    assert out["cond"].shape == (23, 8, 8, 3)
    assert out["relative_cond"].shape == (23, 8, 8, 6)
    assert out["all_views"].shape == (24, 8, 8, 3)
    # target must be one of the views, and angle must identify it
    matches = [
        v for v in range(24) if np.allclose(out["target"], views[v])
    ]
    assert len(matches) == 1
    assert np.isclose(out["angle"], 2 * np.pi / 24 * matches[0])
    # outside train mode, target must NOT be in cond
    for c in range(23):
        assert not np.allclose(out["cond"][c], out["target"])
    # relative_cond first 3 channels are the tiled reference view cond[0]
    np.testing.assert_array_equal(
        out["relative_cond"][..., :3],
        np.broadcast_to(out["cond"][0][None], out["cond"].shape),
    )
    np.testing.assert_array_equal(out["relative_cond"][..., 3:], out["cond"])


def test_process_sample_train_leak_rate():
    views = render_views(1, image_size=8).astype(np.float32) / 255.0
    rng = np.random.default_rng(0)
    leaks = 0
    n = 300
    for _ in range(n):
        out = process_sample(views, "k", "train", rng)
        if any(np.allclose(out["cond"][c], out["target"]) for c in range(23)):
            leaks += 1
    # ~10% re-shuffle; target lands in cond[1:] w.p. ~ 0.1 * 23/24
    assert 0.03 < leaks / n < 0.2


def test_stream_and_batcher(tmp_path):
    make_synthetic_shards(str(tmp_path), "train", num_objects=8,
                          num_shards=2, image_size=8)
    split = SplitConfig(path=str(tmp_path), mode="train", start_shard=0,
                        end_shard=1)
    stream = create_nmr_stream(split, shuffle_buffer=4, seed=0)
    batches = Batcher(stream, batch_size=4, n_cond_views=3)
    it = iter(batches)
    b = next(it)
    assert b["target"].shape == (4, 8, 8, 3)
    assert b["cond"].shape == (4, 3, 8, 8, 3)
    assert b["angle"].shape == (4,)
    assert len(b["scene_hash"]) == 4
    # resampled stream is infinite: more batches than the dataset size
    for _ in range(5):
        next(it)


def test_stream_host_sharding(tmp_path):
    make_synthetic_shards(str(tmp_path), "test", num_objects=8,
                          num_shards=2, image_size=8)
    urls = expand_shard_urls(str(tmp_path), "test", 0, 1)
    seen = set()
    for host in range(2):
        s = NMRStream(urls, "test", shuffle_buffer=0, host_id=host,
                      num_hosts=2, resample=False)
        keys = {x["scene_hash"] for x in s}
        assert len(keys) == 4  # one shard each
        seen |= keys
    assert len(seen) == 8  # disjoint cover

    with pytest.raises(ValueError):
        NMRStream(urls[:1], "test", host_id=0, num_hosts=2)


def test_single_pass_stream_terminates(tmp_path):
    make_synthetic_shards(str(tmp_path), "val", num_objects=4, image_size=8)
    split = SplitConfig(path=str(tmp_path), mode="val", start_shard=0,
                        end_shard=0)
    s = create_nmr_stream(split, resample=False)
    assert len(list(s)) == 4


def test_prefetch_preserves_order(tmp_path):
    assert list(prefetch(iter(range(20)), depth=3)) == list(range(20))

def test_process_sample_subset_and_u8_parity():
    """needed/n_cond_views/uint8 fast paths consume identical RNG draws
    and produce identical values to the full float path."""
    views_u8 = render_views(3, image_size=8)
    views_f32 = views_u8.astype(np.float32) / 255.0
    for mode in ("train", "test"):
        for i in range(40):  # spans leak/no-leak draws in train mode
            full = process_sample(
                views_f32, "k", mode, np.random.default_rng(i),
                relative=True,
            )
            fast = process_sample(
                views_u8, "k", mode, np.random.default_rng(i),
                relative=True,
                needed=frozenset(
                    {"target", "cond", "relative_cond", "angle"}
                ),
                n_cond_views=5,
            )
            assert "all_views" not in fast
            np.testing.assert_allclose(fast["target"], full["target"],
                                       atol=1e-7)
            np.testing.assert_allclose(fast["cond"], full["cond"][:5],
                                       atol=1e-7)
            np.testing.assert_allclose(
                fast["relative_cond"], full["relative_cond"][:5], atol=1e-7
            )
            assert fast["angle"] == full["angle"]
            assert fast["relative_angle"] == full["relative_angle"]


def test_stream_needed_keys_matches_full(tmp_path):
    """A trimmed stream yields the same target/cond/angle sequence as a
    full stream with the same seed (RNG-parity end to end)."""
    make_synthetic_shards(str(tmp_path), "train", num_objects=6,
                          image_size=8)
    split = SplitConfig(path=str(tmp_path), mode="train", start_shard=0,
                        end_shard=0)
    # native=False: the C++ reader yields in thread-completion order
    # (non-reproducible by design), which would make the two streams'
    # shuffle buffers diverge; RNG parity needs the deterministic path
    full = iter(Batcher(create_nmr_stream(split, shuffle_buffer=4, seed=3,
                                          native=False),
                        batch_size=4, n_cond_views=3))
    trimmed = iter(Batcher(
        create_nmr_stream(split, shuffle_buffer=4, seed=3, native=False,
                          needed_keys=["target", "cond", "angle"],
                          n_cond_views=3),
        batch_size=4, n_cond_views=3,
        keys=["target", "cond", "angle"],
    ))
    for _ in range(4):
        a, b = next(full), next(trimmed)
        np.testing.assert_allclose(b["target"], a["target"], atol=1e-7)
        np.testing.assert_allclose(b["cond"], a["cond"], atol=1e-7)
        np.testing.assert_array_equal(b["angle"], a["angle"])
