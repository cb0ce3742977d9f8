"""Native C++ loader tests: byte-exact PNG decode vs PIL across color
types, stream semantics, and integration with the NMR pipeline."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from viewfusion_tpu.data.native_loader import (
    NativeShardReader,
    native_available,
)
from viewfusion_tpu.data.nmr import NMRStream, decode_views_u8
from viewfusion_tpu.data.synthetic import make_synthetic_shards
from viewfusion_tpu.data.tario import TarShardWriter, iter_tar_samples

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libvfloader.so not built"
)


def _shard_with_modes(path, total_views=4):
    """One sample whose views exercise RGB / RGBA / grayscale / palette."""
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (4, 12, 12, 3)).astype(np.uint8)
    imgs = [
        Image.fromarray(base[0], "RGB"),
        Image.fromarray(
            np.concatenate([base[1], rng.integers(0, 255, (12, 12, 1))
                            .astype(np.uint8)], -1), "RGBA"
        ),
        Image.fromarray(base[2, :, :, 0], "L"),
        Image.fromarray(base[3], "RGB").convert(
            "P", palette=Image.Palette.ADAPTIVE
        ),
    ]
    with TarShardWriter(path) as w:
        sample = {"__key__": "modes-0"}
        for i, img in enumerate(imgs):
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            sample[f"{i:04d}.png"] = buf.getvalue()
        w.write(sample)
    return path


def test_decode_matches_pil_all_color_types(tmp_path):
    shard = _shard_with_modes(str(tmp_path / "m.tar"))
    raw = next(iter_tar_samples(shard))
    pil = decode_views_u8(raw, total_views=4)

    reader = NativeShardReader([shard], total_views=4, n_threads=1,
                               resample=False)
    views, key = next(iter(reader))
    reader.close()
    assert key == "modes-0"
    assert views.shape == pil.shape == (4, 12, 12, 3)
    np.testing.assert_array_equal(views, pil)


def test_synthetic_shard_decode_exact(tmp_path):
    paths = make_synthetic_shards(str(tmp_path), "train", num_objects=6,
                                  image_size=16)
    pil_views = {
        s["__key__"]: decode_views_u8(s)
        for s in iter_tar_samples(paths[0])
    }
    reader = NativeShardReader(paths, n_threads=2, resample=False)
    count = 0
    for views, key in reader:
        np.testing.assert_array_equal(views, pil_views[key])
        count += 1
    reader.close()
    assert count == 6
    assert reader.decode_errors == 0


def test_resample_is_infinite(tmp_path):
    paths = make_synthetic_shards(str(tmp_path), "train", num_objects=2,
                                  image_size=8)
    reader = NativeShardReader(paths, n_threads=1, resample=True, seed=3)
    it = iter(reader)
    keys = [next(it)[1] for _ in range(7)]  # > dataset size
    reader.close()
    assert len(keys) == 7


def test_corrupt_sample_skipped(tmp_path):
    path = str(tmp_path / "bad.tar")
    good = make_synthetic_shards(str(tmp_path / "g"), "train",
                                 num_objects=1, image_size=8)[0]
    sample = next(iter_tar_samples(good))
    with TarShardWriter(path) as w:
        bad = dict(sample)
        bad["__key__"] = "bad-0"
        bad["0003.png"] = b"not a png"
        w.write(bad)
        w.write(sample)
    reader = NativeShardReader([path], n_threads=1, resample=False)
    keys = [k for _, k in reader]
    assert keys == [sample["__key__"]]
    assert reader.decode_errors == 1
    reader.close()


def test_nmr_stream_native_pipeline(tmp_path):
    make_synthetic_shards(str(tmp_path), "train", num_objects=4,
                          image_size=8)
    urls = [os.path.join(str(tmp_path), "NMR-train-00.tar")]
    s_native = NMRStream(urls, "test", shuffle_buffer=0, resample=False,
                         native=True)
    s_python = NMRStream(urls, "test", shuffle_buffer=0, resample=False,
                         native=False)
    a = {x["scene_hash"] for x in s_native}
    b = {x["scene_hash"] for x in s_python}
    assert a == b and len(a) == 4


def test_missing_shard_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="missing shard"):
        NativeShardReader([str(tmp_path / "nope.tar")], n_threads=1)


def test_empty_shard_list_raises():
    with pytest.raises(RuntimeError):
        NativeShardReader([], n_threads=1)


def test_closed_reader_raises(tmp_path):
    paths = make_synthetic_shards(str(tmp_path), "train", num_objects=2,
                                  image_size=8)
    reader = NativeShardReader(paths, n_threads=1, resample=False)
    it = iter(reader)
    next(it)
    reader.close()
    with pytest.raises(RuntimeError, match="closed"):
        next(it)


def test_all_samples_corrupt_raises(tmp_path):
    path = str(tmp_path / "bad.tar")
    with TarShardWriter(path) as w:
        w.write({"__key__": "x", "0000.png": b"junk"})
    reader = NativeShardReader([path], n_threads=1, resample=False)
    with pytest.raises(RuntimeError, match="no readable samples"):
        list(reader)


def test_all_corrupt_resampled_raises(tmp_path):
    """The dead-stream guard must terminate a resampled stream whose
    every shard yields nothing, even with several producer threads
    (this is the spin-forever case the guard exists for)."""
    path = str(tmp_path / "bad.tar")
    with TarShardWriter(path) as w:
        w.write({"__key__": "x", "0000.png": b"junk"})
    reader = NativeShardReader([path], n_threads=4, resample=True)
    with pytest.raises(RuntimeError, match="no readable samples"):
        next(iter(reader))
    reader.close()


def test_resampled_startup_not_failed_by_thread_race(tmp_path):
    """Regression: the old dead-stream guard counted shard-queue
    REFILLS, so with resample=True and more producer threads than
    shards it could declare "no readable samples" while the first
    decode was still in flight (the queue emptied and refilled twice
    before the first push landed) — observed as a flaky trainer
    failure under full-suite CPU load.  The guard now requires every
    distinct shard to have completed processing with zero pushes.
    Construct-and-read repeatedly with 8 threads on one shard: every
    construction must yield."""
    paths = make_synthetic_shards(str(tmp_path), "train", num_objects=2,
                                  image_size=8)
    for i in range(25):
        reader = NativeShardReader(paths[:1], n_threads=8, resample=True,
                                   seed=i)
        it = iter(reader)
        got = [next(it)[1] for _ in range(3)]
        reader.close()
        assert len(got) == 3


def test_uint8_contract(tmp_path):
    paths = make_synthetic_shards(str(tmp_path), "train", num_objects=1,
                                  image_size=8)
    reader = NativeShardReader(paths, n_threads=1, resample=False)
    views, _ = next(iter(reader))
    assert views.dtype == np.uint8
    reader.close()
