"""Device mesh + sharding: the TPU-native replacement for torch DDP/NCCL.

The reference's entire distributed stack (utils/dist.py: init_process_group
over NCCL, DDP gradient all-reduce, reduce_dict metric all-reduce,
explicit barriers) collapses in SPMD JAX to: build a ``Mesh``, annotate
array shardings, and let XLA insert the collectives over ICI
(SURVEY.md §2b).  Program order provides the barriers; jit of the global
computation provides the gradient psum.

Mesh axes:
  * ``data``  — batch-dimension data parallelism (the reference's only
    strategy: DDP, experiment.py:104-107).
  * ``view``  — the model's own parallel axis: the N conditioning views
    all flow through one shared UNet (model/view_fusion.py:244-263), so
    the flattened (B, N) UNet batch shards over data AND view.  This is
    the axis the reference scales by growing GPU memory; here it scales
    across chips.

Multi-host: call ``initialize_distributed()`` once per process (the
``jax.distributed.initialize`` equivalent of torchrun's env rendezvous,
utils/dist.py:14-23), then ``make_global_batch`` assembles per-host
shards into global arrays.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "MeshSpec",
    "make_mesh",
    "batch_sharding",
    "shard_batch",
    "replicate",
    "initialize_distributed",
    "make_global_batch",
    "host_id",
    "num_hosts",
]

DATA_AXIS = "data"
VIEW_AXIS = "view"


@dataclass(frozen=True)
class MeshSpec:
    """How many ways to split each mesh axis; -1 on data = all remaining
    devices."""

    data: int = -1
    view: int = 1


def make_mesh(spec: MeshSpec = MeshSpec(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    view = max(1, spec.view)
    data = spec.data if spec.data > 0 else n // view
    if data * view != n:
        raise ValueError(
            f"mesh {data}x{view} != {n} devices; adjust MeshSpec"
        )
    dev_array = np.asarray(devices).reshape(data, view)
    return Mesh(dev_array, (DATA_AXIS, VIEW_AXIS))


# Sharding rules for the standard batch dict (NHWC):
#   target (B,H,W,3) -> data on B
#   cond (B,N,H,W,C) -> data on B, view on N
#   angle/view_count (B,) -> data on B
_BATCH_SPECS: Dict[str, P] = {
    "target": P(DATA_AXIS),
    "cond": P(DATA_AXIS, VIEW_AXIS),
    "relative_cond": P(DATA_AXIS, VIEW_AXIS),
    "all_views": P(DATA_AXIS),
    "angle": P(DATA_AXIS),
    "relative_angle": P(DATA_AXIS),
    "view_count": P(DATA_AXIS),
    "noise": P(DATA_AXIS),
    # packed-row index vectors gather across samples; replicate them
    "sample_idx": P(),
    "view_idx": P(),
    # fused feed (training/fused_feed.py): img carries target+cond in
    # one batch-major buffer (view axis unsharded — slot 0 is the
    # target, so 1+N does not tile the view mesh); meta_r replicates
    # the packed-row indices
    "img": P(DATA_AXIS),
    "meta_b": P(DATA_AXIS),
    "meta_r": P(),
}


def batch_sharding(mesh: Mesh, key: str, accum: bool = False) -> NamedSharding:
    """Standard sharding for one batch-dict key.  ``accum=True`` is the
    gradient-accumulation layout: arrays carry a leading microbatch axis
    (K, B, ...) that the train step lax.scans over, so the batch specs
    shift right by one unsharded dim."""
    spec = _BATCH_SPECS.get(key, P(DATA_AXIS))
    if accum:
        spec = P(*((None,) + tuple(spec)))
    return NamedSharding(mesh, spec)


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh,
                accum: bool = False) -> Dict[str, Any]:
    """Place a (host-local == global, single-host case) numpy batch onto
    the mesh with the standard shardings."""
    out = {}
    for k, v in batch.items():
        if not isinstance(v, np.ndarray):
            continue
        out[k] = jax.device_put(v, batch_sharding(mesh, k, accum))
    return out


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree over the mesh (params/opt state under pure
    DP, matching DDP's replicated model, experiment.py:104-107)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def zero1_shard_specs(tree: Any, mesh: Mesh) -> Any:
    """ZeRO-1 layout for the optimizer state (tpu.shard_opt_state):
    shard each leaf's largest data-axis-divisible dim over the mesh's
    data axis, replicate everything indivisible (scalars, schedule
    counts, small biases).  Adam's m/v are elementwise in the params,
    so ANY dim works — the largest one gives the most even split.  No
    reference equivalent (DDP replicates optimizer state per GPU); this
    is the standard TPU counterpart of ZeRO stage 1 / FSDP's
    optimizer-state sharding, expressed as shardings + XLA-inserted
    collectives rather than hand-written gather/scatter."""
    n = mesh.shape[DATA_AXIS]

    def spec_for(x):
        shape = getattr(x, "shape", ())
        best = None
        for ax, d in enumerate(shape):
            if d >= n and d % n == 0 and (
                best is None or d > shape[best]
            ):
                best = ax
        if best is None:
            return NamedSharding(mesh, P())
        spec = [None] * len(shape)
        spec[best] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(spec_for, tree)


def initialize_distributed() -> None:
    """Multi-host rendezvous (replaces init_process_group("nccl"),
    utils/dist.py:21-23).

    Calls ``jax.distributed.initialize()`` whenever a multi-process
    launch is detectable from standard cluster envs (JAX coordinator
    vars, SLURM, torchrun-style WORLD_SIZE, or VF_NUM_PROCESSES).  Setup
    failures propagate — a broken rendezvous must not silently degrade
    into N independent single-host runs."""
    if num_hosts_env() <= 1:
        return
    try:
        jax.distributed.initialize()
    except RuntimeError as e:
        if "already" in str(e).lower():
            return  # initialized earlier in this process
        raise


def num_hosts_env() -> int:
    for var in ("VF_NUM_PROCESSES", "JAX_NUM_PROCESSES", "SLURM_NTASKS",
                "WORLD_SIZE"):
        val = os.environ.get(var)
        if val is not None:
            try:
                return int(val)
            except ValueError:
                continue
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        return 2  # multi-process implied; exact count comes from JAX
    return 1


def host_id() -> int:
    return jax.process_index()


def num_hosts() -> int:
    return jax.process_count()


def make_global_batch(local_batch: Dict[str, np.ndarray],
                      mesh: Mesh, accum: bool = False) -> Dict[str, Any]:
    """Assemble per-host local numpy shards into global sharded arrays
    (replaces per-rank DataLoader + nodesplitter,
    data/nmr_dataset.py:55-61 + experiment.py:159-162).

    ``accum=True``: arrays are K stacked microbatches (K, B_local, ...)
    — the batch dim (axis 1) is the one that concatenates across hosts.
    """
    if jax.process_count() == 1:
        return shard_batch(local_batch, mesh, accum)
    out = {}
    batch_axis = 1 if accum else 0
    for k, v in local_batch.items():
        if not isinstance(v, np.ndarray):
            continue
        sharding = batch_sharding(mesh, k, accum)
        if sharding.is_fully_replicated:
            # replicated arrays (e.g. packed row indices) are identical
            # on every host: local == global
            global_shape = v.shape
        else:
            global_shape = tuple(
                d * jax.process_count() if ax == batch_axis else d
                for ax, d in enumerate(v.shape)
            )
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, global_shape
        )
    return out
