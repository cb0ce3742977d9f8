"""The shared fetch-forced marginal-slope timing harness
(viewfusion_tpu/utils/timing.py) backs every op-level measurement
artifact; pin its basic contract so a harness regression can't silently
corrupt benchmark numbers."""

import jax.numpy as jnp

from viewfusion_tpu.utils.timing import chained_op_seconds


def test_returns_positive_seconds():
    x = jnp.ones((64, 64), jnp.float32)
    s = chained_op_seconds(lambda a: a * 2.0, x, K1=4, K2=16, repeats=2)
    assert s > 0.0
    assert s < 1.0  # a 64x64 multiply is not a second


def test_heavier_op_costs_more():
    # marginal slope must order a trivial elementwise op below a matmul
    # chain two orders of magnitude heavier (33 MFLOP vs 4 KFLOP per
    # call — far beyond scheduler noise even on a loaded 1-core host)
    small = jnp.ones((64, 64), jnp.float32)
    big = jnp.ones((256, 256), jnp.float32)
    t_cheap = chained_op_seconds(lambda a: a + 1.0, small,
                                 K1=4, K2=16, repeats=2)
    t_matmul = chained_op_seconds(lambda a, w: a @ w, big, big,
                                  K1=4, K2=16, repeats=2)
    assert t_matmul > t_cheap


def test_extra_operands_are_passed_through():
    import math

    x = jnp.ones((8, 8), jnp.float32)
    w = 3.0 * jnp.ones((8, 8), jnp.float32)
    # would raise inside trace if operands were dropped; the slope of a
    # trivial op is pure dispatch noise, so only finiteness is asserted
    s = chained_op_seconds(lambda a, b: a * b, x, w, K1=2, K2=4, repeats=1)
    assert math.isfinite(s)
