"""Learning-rate schedule: linear warmup then exponential decay.

Numerics identical to the reference ``LrScheduler``
(utils/schedulers.py:1-14), with the reference's hardcoded defaults from
experiment.py:112-116 (peak_lr 1e-4, warmup 2500, decay_it 4e6, rate
0.16).  Also provided as a jax-traceable schedule function for optax —
the TPU-native replacement for mutating torch param_groups per step
(experiment.py:265-267).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["LrScheduler", "lr_schedule"]


class LrScheduler:
    """Host-side schedule (reference API parity: utils/schedulers.py)."""

    def __init__(self, peak_lr: float = 4e-4, peak_it: int = 10000,
                 decay_rate: float = 0.5, decay_it: int = 100000):
        self.peak_lr = peak_lr
        self.peak_it = peak_it
        self.decay_rate = decay_rate
        self.decay_it = decay_it

    def get_cur_lr(self, it: int) -> float:
        if it < self.peak_it:
            return self.peak_lr * (it / self.peak_it)
        it_since_peak = it - self.peak_it
        return self.peak_lr * (
            self.decay_rate ** (it_since_peak / self.decay_it)
        )


def lr_schedule(peak_lr: float = 1e-4, peak_it: int = 2500,
                decay_rate: float = 0.16, decay_it: int = 4_000_000):
    """Jax-traceable schedule for ``optax`` (same numerics as above)."""

    def schedule(it):
        it = jnp.asarray(it, jnp.float32)
        warm = peak_lr * (it / peak_it)
        decay = peak_lr * decay_rate ** ((it - peak_it) / decay_it)
        return jnp.where(it < peak_it, warm, decay)

    return schedule
