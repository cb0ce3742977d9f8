"""Checkpoint save/load for parameter/optimizer pytrees + scalar sidecar.

Policy parity with the reference ``Checkpoint`` (utils/checkpoint.py):
  * run-dir creation + ``config.yaml`` snapshot on first creation,
    host-0 only (utils/checkpoint.py:25-29),
  * ``save(filename, state, **extra)`` persists the full state pytree
    plus scalar extras {it, t, run_id, ssim, psnr}
    (utils/checkpoint.py:31-47; experiment.py:242-247),
  * ``load(filename, template)`` restores into a matching pytree and
    returns the leftover scalar state (utils/checkpoint.py:49-72),
  * rolling ``model.msgpack`` + ``best_model_{ssim,psnr,all}.msgpack``
    best-metric files are written by the trainer (experiment.py:373-391).

TPU-native: pytrees via flax msgpack serialization instead of
torch.save/state_dict; writes are atomic (tmp + rename) so a preempted
host never corrupts the rolling checkpoint.

Async saves (``save_async``): the hot loop only takes a device-side
snapshot of the state (an HBM copy enqueued before any later buffer
donation can touch it); the D2H transfer, msgpack serialization, and
file write all happen on one background worker thread in submission
order.  Measured on the flagship state (407 MB): a synchronous save
costs 1.5-3.5 s — a 12-24%% throughput tax at checkpoint_every=100 and
~9 steps/s — which the async path removes from the step loop entirely.
``flush()`` drains the queue (trainer calls it at loop exit, on
SIGTERM, and before reading checkpoint files back); worker exceptions
are re-raised on the next save/flush rather than lost.
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Any, Dict, Optional, Tuple

from flax import serialization

__all__ = ["Checkpoint"]


def _snapshot(state):
    """One jitted device-to-device copy of the whole state pytree.

    A single dispatch instead of one eager ``jnp.copy`` per leaf —
    measured 0.45 s/save eagerly (hundreds of per-op round trips) vs
    sub-millisecond fused."""
    import jax
    import jax.numpy as jnp

    arrays, treedef = jax.tree_util.tree_flatten(state)
    idx = [i for i, x in enumerate(arrays) if isinstance(x, jax.Array)]
    copies = _jit_copy([arrays[i] for i in idx])
    out = list(arrays)
    for i, c in zip(idx, copies):
        out[i] = c
    return jax.tree_util.tree_unflatten(treedef, out)


def _jit_copy(leaves):
    import jax

    global _COPY_FN
    if _COPY_FN is None:
        import jax.numpy as jnp

        _COPY_FN = jax.jit(
            lambda xs: [jnp.copy(x) for x in xs]
        )
    return _COPY_FN(leaves)


_COPY_FN = None


def _gather_partitioned(state):
    """Multi-host collective pre-pass for PARTITIONED state
    (tpu.shard_opt_state): replace non-fully-addressable, non-replicated
    leaves with ``process_allgather``'ed host arrays so host 0 can
    serialize the global value.  COLLECTIVE: every process must reach
    this at the same point — the trainer's save gates are deterministic
    across hosts (step counts and globally-reduced metrics), and
    SIGTERM-triggered final saves assume the preemption signal reaches
    every host (TPU maintenance events do).  Fully-replicated leaves
    pass through (their np conversion is single-process-safe);
    single-process state is returned untouched."""
    import jax

    def partitioned(x):
        return (isinstance(x, jax.Array) and not x.is_fully_addressable
                and not x.sharding.is_fully_replicated)

    if not any(partitioned(x) for x in jax.tree_util.tree_leaves(state)):
        return state
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        lambda x: multihost_utils.process_allgather(x, tiled=True)
        if partitioned(x) else x,
        state,
    )


class Checkpoint:
    def __init__(self, checkpoint_dir: str, config_yaml: Optional[str] = None,
                 is_host0: bool = True):
        self.checkpoint_dir = checkpoint_dir
        if is_host0 and not os.path.exists(checkpoint_dir):
            os.makedirs(checkpoint_dir, exist_ok=True)
            if config_yaml is not None:
                with open(os.path.join(checkpoint_dir, "config.yaml"),
                          "w") as f:
                    f.write(config_yaml)
        self.is_host0 = is_host0
        self._queue: Optional[queue.Queue] = None
        self._worker: Optional[threading.Thread] = None
        self._worker_error: Optional[BaseException] = None
        self._seq = 0
        self._latest_seq: Dict[str, int] = {}
        # queued-but-not-yet-dequeued item per path, so a newer save can
        # drop the older pending HBM snapshot at submission time
        self._pending: Dict[str, list] = {}
        self._latest_lock = threading.Lock()
        # Top-level template fields the most recent load() did NOT find
        # in the file (kept at template values); callers that must not
        # silently run on fresh values (serving EMA weights) check this.
        self.last_missing: list = []

    def _path(self, filename: str) -> str:
        if not os.path.isabs(filename):
            filename = os.path.join(self.checkpoint_dir, filename)
        return filename

    def _write(self, path: str, state_dict: Any, extra: Dict[str, Any]):
        payload = serialization.msgpack_serialize(
            {"state": state_dict, "extra": json.dumps(extra)}
        )
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)

    def save(self, filename: str, state: Any, **extra: Any) -> None:
        """Persist ``state`` (any pytree) + scalar extras. Host-0 only.
        Synchronous: returns only after the file is on disk.

        Drains pending async saves first so submission order is
        preserved across both APIs — without this, an OLDER queued async
        snapshot could land after (and silently overwrite) this newer
        direct write when the worker catches up."""
        state = _gather_partitioned(state)  # collective; before host gate
        if not self.is_host0:
            return
        if self._queue is not None:
            self.flush()
        self._raise_worker_error()
        self._write(self._path(filename), serialization.to_state_dict(state),
                    extra)

    # ------------------------------------------------------------------
    # async path
    # ------------------------------------------------------------------
    def save_async(self, filename: str, state: Any, **extra: Any) -> None:
        """Like :meth:`save` but only the HBM snapshot happens inline.

        The snapshot (``jnp.copy`` per leaf) is enqueued on the device
        stream BEFORE the caller can donate the live buffers into the
        next train step, so the copy always reads this step's values;
        D2H + serialize + write run on the worker thread.  Saves are
        written in submission order, except that a queued-but-unstarted
        save is SKIPPED when a newer save to the same file is already
        queued behind it (latest wins): if the writer falls behind the
        checkpoint cadence — slow disk, slow D2H — the queue coalesces
        rolling saves instead of growing without bound."""
        state = _gather_partitioned(state)  # collective; before host gate
        if not self.is_host0:
            return
        self._raise_worker_error()
        import jax

        leaves = jax.tree_util.tree_leaves(state)
        if any(isinstance(x, jax.Array) and not x.is_fully_addressable
               for x in leaves):
            # Multi-host: the remaining global leaves are fully
            # replicated (partitioned ones were gathered above), but a
            # jitted snapshot dispatched from host 0 alone would still
            # violate the all-processes-participate rule.  Fall back to
            # the synchronous path (np conversion of fully replicated
            # arrays is single-process-safe).
            self._write(self._path(filename),
                        serialization.to_state_dict(state), extra)
            return
        snap = _snapshot(state)
        if self._queue is None:
            self._queue = queue.Queue()
            self._worker = threading.Thread(
                target=self._worker_loop, daemon=True,
                name="checkpoint-writer",
            )
            self._worker.start()
        path = self._path(filename)
        item = [self._seq + 1, path, snap, extra]
        with self._latest_lock:
            self._seq += 1
            item[0] = self._seq
            self._latest_seq[path] = item[0]
            # Bound queue-held HBM: a still-queued older save to the same
            # path will be skipped by the worker anyway — release its
            # snapshot NOW instead of when the worker reaches it, so
            # writer backpressure pins at most ~2 snapshots per file
            # (one in flight + this one) rather than one per queued save.
            old = self._pending.get(path)
            if old is not None:
                old[2] = None
            self._pending[path] = item
        self._queue.put(item)

    def _worker_loop(self):
        import jax

        while True:
            item = self._queue.get()
            try:
                if item is None:
                    return
                seq, path, snap, extra = item
                with self._latest_lock:
                    superseded = self._latest_seq.get(path, seq) > seq
                    if self._pending.get(path) is item:
                        del self._pending[path]
                if superseded:
                    continue  # a newer snapshot of this file is queued
                host = jax.device_get(serialization.to_state_dict(snap))
                del snap  # free the HBM snapshot before the file write
                item[2] = None
                self._write(path, host, extra)
            except BaseException as e:  # noqa: BLE001 — surfaced on flush
                self._worker_error = e
            finally:
                self._queue.task_done()

    def flush(self) -> None:
        """Block until every queued async save is on disk; re-raise the
        first worker failure if one occurred."""
        if self._queue is not None:
            self._queue.join()
        self._raise_worker_error()

    def _raise_worker_error(self):
        if self._worker_error is not None:
            err, self._worker_error = self._worker_error, None
            raise RuntimeError("async checkpoint save failed") from err

    def load(self, filename: str, template: Any) -> Tuple[Any, Dict[str, Any]]:
        """Restore a checkpoint into ``template``'s pytree structure;
        returns (state, extra_scalars).

        Top-level fields missing from the checkpoint keep the template's
        values (with a warning) so params-only checkpoints (torch
        conversions) and schema evolution (e.g. the later-added EMA
        field) restore cleanly instead of crashing."""
        self.flush()  # same-process resume must see queued async saves
        path = self._path(filename)
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        saved = payload["state"]
        tpl_sd = serialization.to_state_dict(template)
        self.last_missing = []
        if isinstance(tpl_sd, dict) and isinstance(saved, dict):
            missing = sorted(set(tpl_sd) - set(saved))
            if missing:
                print(f"Checkpoint {filename} lacks {missing}; keeping "
                      "fresh values for them.")
            self.last_missing = missing
            saved = {k: saved.get(k, tpl_sd[k]) for k in tpl_sd}
        state = serialization.from_state_dict(template, saved)
        extra = json.loads(payload["extra"])
        return state, extra

    def exists(self, filename: str) -> bool:
        return os.path.exists(self._path(filename))
