"""Synthetic micro-dataset for tests and smoke runs (SURVEY.md §4/§7).

Generates NMR-format tar shards of procedurally-rendered "objects": each
object is a colored square whose horizontal position encodes the view
azimuth, so view identity is recoverable from pixels and a trained model
has real signal to learn.  Shards are byte-compatible with the real NMR
shards (keys ``0000.png..0023.png`` + ``cameras.npz``).
"""

from __future__ import annotations

import io
import os
from typing import List

import numpy as np

from viewfusion_tpu.data.tario import TarShardWriter

__all__ = ["make_synthetic_shards", "render_views"]


def render_views(obj_seed: int, image_size: int = 16,
                 total_views: int = 24) -> np.ndarray:
    """(V, H, W, 3) uint8 views of one synthetic object."""
    rng = np.random.default_rng(obj_seed)
    color = rng.integers(64, 255, (3,))
    bg = rng.integers(0, 48, (3,))
    size = max(2, image_size // 4)
    views = np.zeros((total_views, image_size, image_size, 3), np.uint8)
    views[..., :] = bg
    for v in range(total_views):
        theta = 2 * np.pi * v / total_views
        cx = int((image_size - size) * (0.5 + 0.4 * np.cos(theta)))
        cy = int((image_size - size) * (0.5 + 0.4 * np.sin(theta)))
        views[v, cy : cy + size, cx : cx + size] = color
        # Stamp the view index into the corner so every view is unique
        # (integer position rounding can otherwise collide).
        views[v, 0, 0] = (v * 10 % 256, 255 - v * 10 % 256, v)
    return views


def _png_bytes(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def make_synthetic_shards(
    dest_dir: str,
    mode: str = "train",
    num_objects: int = 8,
    num_shards: int = 1,
    image_size: int = 16,
    total_views: int = 24,
    seed: int = 0,
) -> List[str]:
    """Write ``NMR-{mode}-{NN}.tar`` shards; returns their paths."""
    os.makedirs(dest_dir, exist_ok=True)
    per_shard = num_objects // num_shards
    paths = []
    obj = 0
    for s in range(num_shards):
        path = os.path.join(dest_dir, f"NMR-{mode}-{s:02d}.tar")
        paths.append(path)
        with TarShardWriter(path) as sink:
            for _ in range(per_shard):
                views = render_views(seed * 10007 + obj, image_size,
                                     total_views)
                sample = {"__key__": f"synth-{mode}-{obj:05d}"}
                for i in range(total_views):
                    sample[f"{i:04d}.png"] = _png_bytes(views[i])
                cams = io.BytesIO()
                np.savez(cams, world_mat_0=np.eye(4, dtype=np.float32))
                sample["cameras.npz"] = cams.getvalue()
                sink.write(sample)
                obj += 1
    return paths
