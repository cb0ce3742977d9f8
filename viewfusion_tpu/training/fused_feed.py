"""Fused device feed: ship one train batch as 3 device puts, not 6.

On the tunneled single-chip runtime every ``device_put`` is an RPC with
a fixed cost; the standard feed ships target / cond / angle /
view_count / sample_idx / view_idx as six separate arrays
(parallel/mesh.py shard_batch).  When put cost is latency-dominated
(scripts/probe_h2d.py measures this), fusing the batch halves the
per-step transfer overhead:

  * ``img``    (B, 1+N, H, W, C) — target in slot 0, cond in 1..N,
               uint8 or float32, batch-sharded.  One put carries ~99.9%
               of the bytes.
  * ``meta_b`` (B, 2) int32 — [angle bitcast to i32, view_count],
               batch-sharded.  Same-size f32<->i32 bitcasts are exact,
               so angle survives the int container bit-for-bit.
  * ``meta_r`` (2, rows) int32 — [sample_idx, view_idx], replicated
               (packed-row gather indices, parallel/mesh.py:87-89).

Opt-in via ``tpu.fused_feed`` (requires the packed path; absolute
conditioning only — relative mode's 6-channel cond cannot share an
array with the 3-channel target).  Numerics are identical to the split
feed: tests/test_fused_feed.py pins pack->unpack round-trips and
loss-sequence equality.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = ["pack_batch", "unpack_batch", "FUSED_KEYS"]

FUSED_KEYS = ("img", "meta_b", "meta_r")


def pack_batch(prepped: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Fuse a host-side prepped train batch (pre-device-put)."""
    target, cond = prepped["target"], prepped["cond"]
    if target.dtype != cond.dtype:
        raise TypeError(
            f"fused feed needs matching image dtypes; got target "
            f"{target.dtype} vs cond {cond.dtype}"
        )
    if target.shape[-1] != cond.shape[-1]:
        raise ValueError(
            "fused feed supports absolute conditioning only (relative "
            "6-channel cond cannot share an array with the 3-channel "
            "target)"
        )
    angle = np.ascontiguousarray(prepped["angle"], np.float32)
    return {
        "img": np.concatenate([target[:, None], cond], axis=1),
        "meta_b": np.stack(
            [angle.view(np.int32),
             prepped["view_count"].astype(np.int32)], axis=1,
        ),
        "meta_r": np.stack(
            [np.asarray(prepped["sample_idx"], np.int32),
             np.asarray(prepped["view_idx"], np.int32)], axis=0,
        ),
    }


def unpack_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Invert :func:`pack_batch` inside jit (slices and same-size
    bitcasts — all free after XLA fusion)."""
    import jax.numpy as jnp
    from jax import lax

    img, meta_b, meta_r = (batch["img"], batch["meta_b"], batch["meta_r"])
    return {
        "target": img[:, 0],
        "cond": img[:, 1:],
        "angle": lax.bitcast_convert_type(meta_b[:, 0], jnp.float32),
        "view_count": meta_b[:, 1],
        "sample_idx": meta_r[0],
        "view_idx": meta_r[1],
    }
