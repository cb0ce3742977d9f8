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
    """One tensor per device of a sharded global array (the reference's
    dist.all_gather returned one tensor per rank, utils/dist.py:58-66).

    Uses the array's ACTUAL shards (``addressable_shards``, ordered by
    device id) rather than assuming devices map to contiguous
    leading-axis slices — correct for any sharding, including
    non-leading-axis and replicated layouts.  On multi-host, where some
    shards are remote, falls back to one tensor per process via
    ``multihost_utils.process_allgather``."""
    x = jnp.asarray(x)
    sharding = getattr(x, "sharding", None)
    if sharding is None or len(sharding.device_set) <= 1:
        return [x]
    if x.is_fully_addressable:
        shards = sorted(x.addressable_shards, key=lambda s: s.device.id)
        return [jnp.asarray(s.data) for s in shards]
    # Multi-host: other processes' shards are not addressable, so gather
    # HOST-LOCAL data (a numpy array — process_allgather stacks host
    # arrays along a new leading process axis, which it does NOT do for
    # global jax Arrays) and return one tensor per process.  The
    # host-local reconstruction below concatenates deduped shards along
    # axis 0, which is only correct when axis 0 is the ONLY partitioned
    # axis (the layout of every per-batch array this framework shards);
    # reject anything else rather than silently mis-assembling it.
    import numpy as np

    from jax.experimental import multihost_utils

    seen, parts = set(), []
    for s in sorted(x.addressable_shards, key=lambda s: s.device.id):
        idx = s.index
        for dim, sl in enumerate(idx[1:], start=1):
            full = (sl.start in (None, 0)
                    and sl.stop in (None, x.shape[dim]))
            if not full:
                raise ValueError(
                    "gather_all on multi-host supports arrays partitioned "
                    f"only along axis 0; axis {dim} of shape {x.shape} is "
                    f"split ({sl}). Reshard or gather inside jit with "
                    "lax.all_gather instead."
                )
        key = tuple(
            (sl.start, sl.stop, sl.step) for sl in idx
        )  # dedupe replicated copies of the same global slice
        if key not in seen:
            seen.add(key)
            parts.append(np.asarray(s.data))
    local = np.concatenate(parts) if len(parts) > 1 else parts[0]
    gathered = multihost_utils.process_allgather(local)
    return [jnp.asarray(gathered[i]) for i in range(gathered.shape[0])]


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
