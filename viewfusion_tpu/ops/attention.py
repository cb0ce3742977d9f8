"""Spatial self-attention for the UNet: Pallas TPU kernel + XLA fallback.

The reference computes full dense attention over H*W spatial tokens with
two einsums and a softmax (model/unet.py:267-274); attention is enabled at
16x16 (256 tokens) and the 8x8 mid block (64 tokens) in all paper configs
(configs/small-v100-4.yaml:25).  Sequence lengths are small, so a
single-block-per-batch-row Pallas kernel that keeps Q/K/V and the score
matrix entirely in VMEM is the speed-of-light design: one HBM read of
q/k/v, one write of o, zero intermediate HBM traffic.

Gradients: custom VJP whose backward pass is the (cheap, fused-by-XLA)
closed-form attention gradient, so the Pallas forward is usable inside the
jitted training step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU too, but guard for safety.
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["spatial_self_attention"]


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float) -> jnp.ndarray:
    """Reference-equivalent dense attention (model/unet.py:267-274),
    with float32 softmax statistics."""
    s = jnp.einsum(
        "bsc,btc->bst", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bst,btc->bsc", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def _pallas_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      scale: float, interpret: bool = False) -> jnp.ndarray:
    b, s, c = q.shape
    spec = pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(b,),
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * s * s * c,
            bytes_accessed=3 * b * s * c * q.dtype.itemsize + 4 * b * s * c,
            transcendentals=b * s * s,
        ),
        interpret=interpret,  # kernel-math validation off-TPU (tests)
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def spatial_self_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Dense self-attention over (B, S, C) token tensors.

    MEASURED default: XLA einsums.  At the paper's tiny sequence sizes
    the VMEM-resident Pallas kernel is SLOWER than XLA's fused einsums
    (fetch-forced marginal-slope timing on a v5e, round 3 — the earlier
    "within noise" reading came from async dispatch under-measurement):
    S=256/C=192: Pallas 0.241 ms (35 TF/s) vs XLA 0.053 ms (161 TF/s);
    S=64/C=320: 0.173 vs 0.019 ms.  XLA fuses the whole
    softmax(QK)V block with its neighbors; the custom-call boundary
    can't.  The kernel stays as an opt-in (``use_pallas=True`` or
    ``VF_ATTN_PALLAS=1``) and is still exercised by tests — attention
    is 0.5% of step time either way (scripts/profile_step.py).
    """
    return _attention_impl(q, k, v, scale, use_pallas)


def _attention_impl(q, k, v, scale, use_pallas):
    if use_pallas is None:
        import os

        env = os.environ.get("VF_ATTN_PALLAS")
        use_pallas = (
            env not in (None, "0", "false", "")
            and jax.default_backend() == "tpu"
            and pltpu is not None
        )
    if use_pallas:
        # off-TPU an explicit use_pallas=True runs the same kernel in
        # interpret mode (kernel-math validation, tests/test_attention.py)
        return _pallas_attention(q, k, v, scale,
                                 interpret=jax.default_backend() != "tpu")
    return _xla_attention(q, k, v, scale)


def _attn_fwd(q, k, v, scale, use_pallas):
    return _attention_impl(q, k, v, scale, use_pallas), (q, k, v)


def _attn_bwd(scale, use_pallas, res, g):
    q, k, v = res
    # Closed-form attention backward via XLA; the score matrix is tiny
    # (<=256x256) so recomputation is cheaper than stashing it in HBM.
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale),
                     q, k, v)
    return vjp(g)


spatial_self_attention.defvjp(_attn_fwd, _attn_bwd)
