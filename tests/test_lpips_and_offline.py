"""LPIPS architecture + offline metric script tests."""


import numpy as np
import pytest

from viewfusion_tpu.utils.compute_metrics import compute_folder_metrics


def _random_lpips_weights(path):
    """VGG16-shaped random weights for architecture testing."""
    rng = np.random.default_rng(0)
    stages = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]
    out = {}
    conv_idx = 0
    in_ch = 3
    for n_convs, ch in stages:
        for _ in range(n_convs):
            out[f"conv{conv_idx}_w"] = rng.standard_normal(
                (3, 3, in_ch, ch)
            ).astype(np.float32) * 0.05
            out[f"conv{conv_idx}_b"] = np.zeros(ch, np.float32)
            in_ch = ch
            conv_idx += 1
    for s, (_, ch) in enumerate(stages):
        out[f"lin{s}_w"] = np.abs(
            rng.standard_normal((1, 1, ch, 1)).astype(np.float32)
        )
    np.savez(path, **out)
    return path


def test_lpips_identity_zero_and_positive(tmp_path):
    import jax.numpy as jnp

    from viewfusion_tpu.ops.lpips import load_lpips

    wpath = _random_lpips_weights(str(tmp_path / "w.npz"))
    fn = load_lpips(wpath)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    d_same = np.asarray(fn(x, x))
    d_diff = np.asarray(fn(x, y))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert np.all(d_diff > 0)
    assert d_same.shape == (2,)


def test_lpips_missing_weights_raises(tmp_path):
    from viewfusion_tpu.ops.lpips import load_lpips

    with pytest.raises(FileNotFoundError):
        load_lpips(str(tmp_path / "nope.npz"))


def test_offline_metrics_folders(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(2)
    gen_dir = tmp_path / "gen"
    tgt_dir = tmp_path / "tgt"
    gen_dir.mkdir()
    tgt_dir.mkdir()
    for i in range(4):
        img = (rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.uint8)
        noisy = np.clip(
            img.astype(int) + rng.integers(-20, 20, img.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(img).save(tgt_dir / f"{i:04d}.png")
        Image.fromarray(noisy).save(gen_dir / f"{i:04d}.png")

    m = compute_folder_metrics(str(gen_dir), str(tgt_dir))
    assert m["count"] == 4
    assert 10 < m["psnr"] < 50
    assert 0 < m["ssim"] <= 1
    assert "lpips" not in m  # no weights in this image
