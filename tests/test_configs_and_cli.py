"""Every shipped config must load and build a model; CLI flag surface
must match the reference (main.py:6-24); offline sharder round-trips a
synthetic NMR_Dataset.zip (reference: data/dataset_prep.py)."""

import glob
import io
import os
import zipfile

import numpy as np
import pytest
import yaml

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


@pytest.mark.parametrize(
    "path", sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))
)
def test_shipped_config_builds_model(path):
    from viewfusion_tpu.config import load_config
    from viewfusion_tpu.models.view_fusion import ViewFusion

    cfg = load_config(path)
    model = ViewFusion.from_config(cfg)
    assert model.schedule.num_timesteps > 0
    assert cfg.data.batch_size > 0
    assert cfg.denoiser.in_channel in (6, 9)
    if "no-weighting" in path:
        assert not model.weighting_train and not model.weighting_inference
        assert cfg.denoiser.out_channel == 3
    if "relative" in path:
        assert cfg.relative and cfg.denoiser.in_channel == 9
    if "dit" in path:
        from viewfusion_tpu.models.dit import DiT

        assert isinstance(model.denoise_fn, DiT)


def test_cli_flag_surface():
    """All 11 reference flags parse, including short forms."""
    from viewfusion_tpu.cli import get_arg_parser

    p = get_arg_parser()
    args = p.parse_args([
        "-c", "cfg.yaml", "-s", "src", "-g", "-t", "-e", "-r", "--wandb",
        "-i", "-ar", "-gif", "-ex",
    ])
    assert args.config == "cfg.yaml"
    assert args.src == "src"
    assert all([args.gpu, args.train, args.eval, args.resume, args.wandb,
                args.inference, args.autoregressive, args.generate_gifs,
                args.extrapolate])
    defaults = p.parse_args([])
    assert not any([defaults.train, defaults.eval, defaults.inference])


def _make_nmr_zip(path, classes=("02691156",), scenes_per_class=3,
                  image_size=8, views=4):
    from PIL import Image

    rng = np.random.default_rng(0)
    with zipfile.ZipFile(path, "w") as z:
        metadata = {
            c: {"name": f"class-{c}", "id": c} for c in classes
        }
        z.writestr("NMR_Dataset/metadata.yaml", yaml.dump(metadata))
        for c in classes:
            scenes = [f"scene{j:04d}" for j in range(scenes_per_class)]
            for split in ("train", "val", "test"):
                z.writestr(f"NMR_Dataset/{c}/{split}.lst",
                           "\n".join(scenes))
            for s in scenes:
                for v in range(views):
                    img = rng.integers(0, 255, (image_size, image_size, 3)
                                       ).astype(np.uint8)
                    buf = io.BytesIO()
                    Image.fromarray(img).save(buf, format="PNG")
                    z.writestr(f"NMR_Dataset/{c}/{s}/image/{v:04d}.png",
                               buf.getvalue())
                cams = io.BytesIO()
                np.savez(cams, world_mat_0=np.eye(4, dtype=np.float32))
                z.writestr(f"NMR_Dataset/{c}/{s}/cameras.npz",
                           cams.getvalue())


def test_prep_sharder_roundtrip(tmp_path):
    """zip -> shards -> stream: the offline sharder's output feeds the
    runtime pipeline (reference: data/dataset_prep.py + nmr_dataset.py)."""
    from viewfusion_tpu.data.nmr import NMRStream
    from viewfusion_tpu.data.prep import get_dataset_size, shard_dataset
    from viewfusion_tpu.data.tario import iter_tar_samples

    src = tmp_path / "src"
    src.mkdir()
    _make_nmr_zip(str(src / "NMR_Dataset.zip"), views=4)

    sizes = get_dataset_size(str(src))
    assert sizes["train"] == {"02691156": 3}

    dest = shard_dataset(str(src), sizes, str(tmp_path), split="train",
                         percent=100, shard_cnt=1, views_per_scene=4)
    shards = sorted(glob.glob(os.path.join(dest, "NMR-train-*.tar")))
    assert len(shards) >= 1
    samples = [s for p in shards for s in iter_tar_samples(p)]
    assert len(samples) == 3
    # suffix "cameras" (no extension) matches the reference sharder's
    # output byte-for-byte (data/dataset_prep.py:91 writes key "cameras")
    assert all("cameras" in s and "0003.png" in s for s in samples)

    # the runtime stream consumes the sharded output directly
    stream = NMRStream(shards, "test", shuffle_buffer=0, resample=False,
                       total_views=4, native=False)
    out = list(stream)
    assert len(out) == 3
    assert out[0]["all_views"].shape == (4, 8, 8, 3)


def test_prep_zero_capacity_single_shard(tmp_path):
    """limit == 0 (tiny --percent) writes everything into shard 00 and
    never rotates — the reference's `sample_no == limit` with limit 0
    never fires (dataset_prep.py:95)."""
    from viewfusion_tpu.data.prep import get_dataset_size, shard_dataset
    from viewfusion_tpu.data.tario import iter_tar_samples

    src = tmp_path / "src"
    src.mkdir()
    _make_nmr_zip(str(src / "NMR_Dataset.zip"), views=4)
    sizes = get_dataset_size(str(src))

    # 3 scenes, shard_cnt 4 => round(3)//4 == 0 per-shard capacity
    dest = shard_dataset(str(src), sizes, str(tmp_path / "zero"),
                         split="train", percent=100, shard_cnt=4,
                         views_per_scene=4)
    shards = sorted(glob.glob(os.path.join(dest, "NMR-train-*.tar")))
    assert [os.path.basename(s) for s in shards] == ["NMR-train-00.tar"]
    assert len(list(iter_tar_samples(shards[0]))) == 3


def test_prep_withheld_category(tmp_path):
    from viewfusion_tpu.data.prep import get_dataset_size, shard_dataset
    from viewfusion_tpu.data.tario import iter_tar_samples

    src = tmp_path / "src"
    src.mkdir()
    _make_nmr_zip(str(src / "NMR_Dataset.zip"),
                  classes=("aaa", "bbb"), views=2)
    sizes = get_dataset_size(str(src), withheld=["class-aaa"])
    assert "aaa" not in sizes["train"]
    dest = shard_dataset(str(src), sizes, str(tmp_path), split="train",
                         shard_cnt=1, withheld=["class-aaa"],
                         views_per_scene=2)
    assert "withheld" in dest
    keys = [s["__key__"] for p in glob.glob(os.path.join(dest, "*.tar"))
            for s in iter_tar_samples(p)]
    assert keys and all(k.startswith("bbb-") for k in keys)
