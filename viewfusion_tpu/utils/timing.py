"""Fetch-forced marginal-slope microbenchmark timing.

THE methodology for op-level timing on the tunneled axon TPU runtime,
shared by every measurement script so a fix applies everywhere
(previously copy-pasted in scripts/bench_detail.py and
scripts/bench_stage_convs.py):

* the op runs inside a ``lax.scan`` chain whose carry feeds the next
  iteration through ``relu(x0 + carry)`` — a nonlinear dependency XLA
  cannot hoist (a linear chain gets algebraically simplified to one op;
  independent same-input dispatches do not reliably serialize on the
  tunneled runtime);
* the scalar result is FETCHED (``float()``), because
  ``block_until_ready`` alone returns early over the tunnel and
  measures absurd >peak rates;
* per-op cost is the marginal slope between two chain lengths, which
  cancels dispatch/transfer constants.
"""

from __future__ import annotations

import time
from functools import partial

__all__ = ["chained_op_seconds"]


def chained_op_seconds(op, x0, *operands, K1: int = 16, K2: int = 80,
                       repeats: int = 3,
                       min_gap_s: float = 0.02,
                       max_scale: int = 64) -> float:
    """Seconds per call of ``op(x, *operands)`` where ``x`` has ``x0``'s
    shape/dtype and the output reduces to a scalar mean.

    ``op`` must be traceable; operands beyond the first are closed over
    unchanged each iteration.

    For microsecond-scale ops the (K2-K1)-op window can be smaller than
    host-timer/tunnel jitter, yielding garbage (even negative) slopes;
    when the measured gap is below ``min_gap_s`` the chain lengths are
    scaled up 8x and re-measured (bounded by ``max_scale``).  Scan
    length is a cheap knob: the body compiles once per K.
    """
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("K",))
    def chain(x0_, ops, K):
        def body(carry, _):
            x = jax.nn.relu(x0_ + carry.astype(x0_.dtype))
            y = op(x, *ops)
            return jnp.float32(jnp.mean(y)) * 1e-6, None

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return out

    def timed(K):
        float(chain(x0, operands, K))  # warm (compile + first run)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chain(x0, operands, K))
            best = min(best, time.perf_counter() - t0)
        return best

    scale = 1
    while True:
        t1, t2 = timed(K1 * scale), timed(K2 * scale)
        if t2 - t1 >= min_gap_s or scale >= max_scale:
            return (t2 - t1) / ((K2 - K1) * scale)
        scale *= 8
