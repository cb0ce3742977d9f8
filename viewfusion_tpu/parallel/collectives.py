"""Collective helpers mirroring the reference's utils/dist.py surface.

Under SPMD JAX these are mostly unnecessary — jit over global arrays
already inserts psum/all-gather where the computation needs them, and
program order replaces barriers (SURVEY.md §2b).  These helpers exist
for users porting code that called the reference API directly:

  * ``reduce_dict``  == utils/dist.py:69-91 (all_reduce AVG/SUM per key)
  * ``gather_all``   == utils/dist.py:58-66 (all_gather list)
  * ``get_rank`` / ``get_world_size`` == utils/dist.py:44-55

Inside a ``shard_map``ped function, use ``psum_dict`` / ``all_gather``
with the mesh axis name; outside jit, ``reduce_dict`` works on global
(possibly sharded) arrays directly because reductions over global arrays
ARE the collective.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp

__all__ = [
    "reduce_dict",
    "gather_all",
    "psum_dict",
    "all_gather",
    "get_rank",
    "get_world_size",
]


def get_rank() -> int:
    """Process index (reference: utils/dist.py:52-55)."""
    return jax.process_index()


def get_world_size() -> int:
    """Process count (reference: utils/dist.py:46-49)."""
    return jax.process_count()


def reduce_dict(input_dict: Dict[str, jnp.ndarray],
                average: bool = True) -> Dict[str, jnp.ndarray]:
    """Mean/sum each value over its leading (device-sharded) axis, or
    pass scalars through.  On global arrays this lowers to the same
    cross-device reduction the reference ran via NCCL all_reduce
    (utils/dist.py:69-91) — no explicit communication API needed."""
    out = {}
    for k in sorted(input_dict.keys()):
        v = jnp.asarray(input_dict[k])
        if v.ndim == 0:
            out[k] = v
        else:
            out[k] = jnp.mean(v, axis=0) if average else jnp.sum(v, axis=0)
    return out


def gather_all(x: jnp.ndarray) -> List[jnp.ndarray]:
    """Per-shard list of a sharded global array (reference
    utils/dist.py:58-66 returned one tensor per rank)."""
    n = max(1, len(getattr(x.sharding, "device_set", [None])))
    if x.ndim == 0 or n <= 1 or x.shape[0] % n != 0:
        return [x]
    chunk = x.shape[0] // n
    return [x[i * chunk : (i + 1) * chunk] for i in range(n)]


# --- shard_map-internal variants ------------------------------------


def psum_dict(d: Dict[str, jnp.ndarray], axis_name: str,
              average: bool = True) -> Dict[str, jnp.ndarray]:
    """Cross-shard reduction inside shard_map/pjit-manual code."""
    out = {k: jax.lax.psum(v, axis_name) for k, v in d.items()}
    if average:
        n = jax.lax.psum(1, axis_name)
        out = {k: v / n for k, v in out.items()}
    return out


def all_gather(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Cross-shard all-gather inside shard_map code."""
    return jax.lax.all_gather(x, axis_name)
