"""Metric logging: local JSONL always, wandb when available+enabled.

The reference logs exclusively to wandb (experiment.py:297-304, 444-451)
and loses all metrics when it is off; here a JSONL sink in the run dir is
always written (SURVEY.md §7 build item 6), and wandb is an optional
add-on with the reference's resume-by-run_id behavior
(experiment.py:66-88).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Dict, Optional

__all__ = ["MetricLogger", "generate_run_id"]


def generate_run_id() -> str:
    """Stand-in for wandb.util.generate_id (experiment.py:68)."""
    return uuid.uuid4().hex[:8]


class MetricLogger:
    def __init__(self, out_dir: str, use_wandb: bool = False,
                 run_id: Optional[str] = None, exp_name: str = "",
                 config: Optional[Dict[str, Any]] = None,
                 is_host0: bool = True):
        self.is_host0 = is_host0
        self.out_dir = out_dir
        self.jsonl_path = os.path.join(out_dir, "metrics.jsonl")
        self.wandb = None
        self.run_id = run_id
        if not is_host0:
            return
        os.makedirs(out_dir, exist_ok=True)
        if use_wandb:
            try:
                import wandb  # gated: not in the baked image

                if self.run_id is None:
                    self.run_id = wandb.util.generate_id()
                wandb.init(project="view-fusion", name=exp_name or None,
                           id=self.run_id, resume=True, config=config)
                wandb.define_metric("ssim", summary="max")
                wandb.define_metric("psnr", summary="max")
                self.wandb = wandb
            except ImportError:
                print("wandb not installed; logging to JSONL only.")
        if self.run_id is None:
            self.run_id = generate_run_id()

    def best_metric_summary(self) -> Optional[Dict[str, float]]:
        """Max ssim/psnr from the wandb run summary, for resume: the
        reference OVERWRITES checkpoint-restored best_metrics from
        ``wandb.run.summary`` when wandb is enabled (experiment.py:226-232).
        Returns None when wandb is off (JSONL-only runs restore from the
        checkpoint sidecar alone)."""
        if self.wandb is None:
            return None
        out: Dict[str, float] = {}
        for key in ("ssim", "psnr"):
            v = self.wandb.run.summary.get(key)
            if v is None:
                out[key] = float("-inf")
            elif hasattr(v, "get"):  # define_metric summary dict {"max": x}
                out[key] = float(v.get("max", float("-inf")))
            else:
                out[key] = float(v)
        return out

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        if not self.is_host0 or not metrics:
            return
        scalars = {
            k: (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()
            if isinstance(v, (int, float)) or hasattr(v, "__float__")
        }
        record = {"it": step, "wall": time.time(), **scalars}
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def log_image(self, name: str, image, step: int, caption: str = "") -> None:
        """Save a (H, W, C) uint8/float image grid under the run dir;
        mirror to wandb.Image when enabled (experiment.py:444-451)."""
        if not self.is_host0:
            return
        from viewfusion_tpu.utils.image import save_png

        path = os.path.join(self.out_dir, f"{name}-{step}.png")
        save_png(image, path)
        if self.wandb is not None:
            self.wandb.log(
                {name: self.wandb.Image(path, caption=caption)}, step=step
            )

    def log_video(self, name: str, frames, step: int,
                  duration: float = 0.1) -> None:
        """Save GIF locally (reference fallback: experiment.py:644-650);
        mirror to wandb.Video when enabled."""
        if not self.is_host0:
            return
        from viewfusion_tpu.utils.image import save_gif

        path = os.path.join(self.out_dir, f"{name}-{step}.gif")
        save_gif(frames, path, duration=duration)
        if self.wandb is not None:
            import numpy as np

            self.wandb.log(
                {name: self.wandb.Video(
                    np.stack(frames).transpose(0, 3, 1, 2), format="gif"
                )},
                step=step,
            )
