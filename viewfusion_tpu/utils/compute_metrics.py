"""Offline PSNR / SSIM / LPIPS over dumped image folders.

Replaces the reference's ``utils/compute_metrics.py`` (hard-coded cluster
path, ImageFolder with generated images in the first class dir and
ground truth in the second, LPIPS-VGG on inputs rescaled to [-1, 1],
utils/compute_metrics.py:9-45) with a proper CLI:

    python -m viewfusion_tpu.utils.compute_metrics --generated g/ --target t/
    python -m viewfusion_tpu.utils.compute_metrics --root imagefolder_root/

LPIPS runs only when its weights file exists (see
viewfusion_tpu/ops/lpips.py); PSNR/SSIM always.
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np


def _load_dir(path: str, exts=(".png", ".jpg", ".jpeg")) -> np.ndarray:
    from PIL import Image

    files = sorted(
        f for f in os.listdir(path) if f.lower().endswith(exts)
    )
    if not files:
        raise FileNotFoundError(f"no images in {path}")
    imgs = [
        np.asarray(
            Image.open(os.path.join(path, f)).convert("RGB"), np.float32
        ) / 255.0
        for f in files
    ]
    return np.stack(imgs)


def compute_folder_metrics(generated_dir: str, target_dir: str,
                           batch_size: int = 256,
                           lpips_weights: str | None = None) -> dict:
    import jax.numpy as jnp

    from viewfusion_tpu.ops.metrics import compute_psnr, compute_ssim

    gen = _load_dir(generated_dir)
    tgt = _load_dir(target_dir)
    assert gen.shape == tgt.shape, (gen.shape, tgt.shape)

    lpips_fn = None
    try:
        from viewfusion_tpu.ops.lpips import load_lpips

        lpips_fn = load_lpips(**(
            {"weights_path": lpips_weights} if lpips_weights else {}
        ))
    except FileNotFoundError as e:
        print(f"LPIPS skipped: {e}")

    psnrs: List[np.ndarray] = []
    ssims: List[np.ndarray] = []
    lpipss: List[np.ndarray] = []
    for i in range(0, len(gen), batch_size):
        g = jnp.asarray(gen[i : i + batch_size])
        t = jnp.asarray(tgt[i : i + batch_size])
        psnrs.append(np.asarray(compute_psnr(g, t)))
        ssims.append(np.asarray(compute_ssim(g, t)))
        if lpips_fn is not None:
            # reference rescales to [-1, 1] (utils/compute_metrics.py:41)
            lpipss.append(np.asarray(lpips_fn(2 * g - 1, 2 * t - 1)))

    out = {
        "psnr": float(np.concatenate(psnrs).mean()),
        "ssim": float(np.concatenate(ssims).mean()),
        "count": int(len(gen)),
    }
    if lpipss:
        out["lpips"] = float(np.concatenate(lpipss).mean())
    return out


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--generated", type=str, default=None)
    p.add_argument("--target", type=str, default=None)
    p.add_argument("--root", type=str, default=None,
                   help="ImageFolder root: first class dir = generated, "
                        "second = ground truth (reference layout)")
    p.add_argument("--lpips-weights", type=str, default=None)
    p.add_argument("--batch-size", type=int, default=256)
    args = p.parse_args(argv)

    if args.root:
        classes = sorted(
            d for d in os.listdir(args.root)
            if os.path.isdir(os.path.join(args.root, d))
        )
        assert len(classes) >= 2, "ImageFolder root needs 2 class dirs"
        gen_dir = os.path.join(args.root, classes[0])
        tgt_dir = os.path.join(args.root, classes[1])
    else:
        assert args.generated and args.target, \
            "provide --generated/--target or --root"
        gen_dir, tgt_dir = args.generated, args.target

    metrics = compute_folder_metrics(
        gen_dir, tgt_dir, args.batch_size, args.lpips_weights
    )
    for k, v in metrics.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
