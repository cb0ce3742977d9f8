"""Image grid / PNG / GIF utilities (NHWC numpy).

Replaces the reference's torchvision ``make_grid`` + wandb.Image/Video +
imageio usage (experiment.py:444-451, 569-578, 630-650) with
dependency-light equivalents.  ``make_grid`` follows torchvision
semantics: row-major tiling, ``padding`` pixels of ``pad_value`` between
tiles and around the border, optional per-image min-max rescale
(``scale_each=True``, as the reference passes).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

__all__ = ["make_grid", "to_uint8", "save_png", "save_gif"]


def make_grid(
    images: np.ndarray,
    nrow: int = 8,
    padding: int = 2,
    pad_value: float = 0.0,
    scale_each: bool = False,
) -> np.ndarray:
    """Tile (N, H, W, C) into one (H', W', C) image."""
    images = np.asarray(images, dtype=np.float32)
    n, h, w, c = images.shape
    if scale_each:
        flat = images.reshape(n, -1)
        lo = flat.min(axis=1).reshape(n, 1, 1, 1)
        hi = flat.max(axis=1).reshape(n, 1, 1, 1)
        images = (images - lo) / np.maximum(hi - lo, 1e-5)
    ncols = min(nrow, n)
    nrows = (n + ncols - 1) // ncols
    grid = np.full(
        (padding + nrows * (h + padding), padding + ncols * (w + padding), c),
        pad_value,
        np.float32,
    )
    for idx in range(n):
        r, col = divmod(idx, ncols)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y : y + h, x : x + w] = images[idx]
    return grid


def to_uint8(image: np.ndarray) -> np.ndarray:
    """[0,1] float -> uint8 (reference: ``(x * 255).to(torch.uint8)``,
    experiment.py:570, 637)."""
    image = np.asarray(image)
    if image.dtype == np.uint8:
        return image
    return (np.clip(image, 0.0, 1.0) * 255).astype(np.uint8)


def save_png(image: np.ndarray, path: str) -> None:
    from PIL import Image

    Image.fromarray(to_uint8(image)).save(path)


def save_gif(frames: Sequence[np.ndarray], path: str,
             duration: float = 0.1) -> None:
    """Write an animated GIF (reference fallback: imageio.mimsave,
    experiment.py:644-650)."""
    from PIL import Image

    pil_frames: List[Image.Image] = [
        Image.fromarray(to_uint8(f)) for f in frames
    ]
    pil_frames[0].save(
        path,
        save_all=True,
        append_images=pil_frames[1:],
        duration=int(duration * 1000),
        loop=0,
    )
