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
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import yaml
from flax import serialization

__all__ = ["Checkpoint"]


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

    def _path(self, filename: str) -> str:
        if not os.path.isabs(filename):
            filename = os.path.join(self.checkpoint_dir, filename)
        return filename

    def save(self, filename: str, state: Any, **extra: Any) -> None:
        """Persist ``state`` (any pytree) + scalar extras. Host-0 only."""
        if not self.is_host0:
            return
        path = self._path(filename)
        payload = serialization.msgpack_serialize(
            {
                "state": serialization.to_state_dict(state),
                "extra": json.dumps(extra),
            }
        )
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)

    def load(self, filename: str, template: Any) -> Tuple[Any, Dict[str, Any]]:
        """Restore a checkpoint into ``template``'s pytree structure;
        returns (state, extra_scalars).

        Top-level fields missing from the checkpoint keep the template's
        values (with a warning) so params-only checkpoints (torch
        conversions) and schema evolution (e.g. the later-added EMA
        field) restore cleanly instead of crashing."""
        path = self._path(filename)
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        saved = payload["state"]
        tpl_sd = serialization.to_state_dict(template)
        if isinstance(tpl_sd, dict) and isinstance(saved, dict):
            missing = sorted(set(tpl_sd) - set(saved))
            if missing:
                print(f"Checkpoint {filename} lacks {missing}; keeping "
                      "fresh values for them.")
            saved = {k: saved.get(k, tpl_sd[k]) for k in tpl_sd}
        state = serialization.from_state_dict(template, saved)
        extra = json.loads(payload["extra"])
        return state, extra

    def exists(self, filename: str) -> bool:
        return os.path.exists(self._path(filename))
