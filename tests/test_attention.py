"""Spatial self-attention (ops/attention.py): the XLA default against a
numpy oracle, and the Pallas VMEM kernel (interpret mode off-TPU)
against the XLA path — forward and custom-VJP gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viewfusion_tpu.ops.attention import (
    _pallas_attention,
    _xla_attention,
    spatial_self_attention,
)


def _numpy_attention(q, k, v, scale):
    s = (q.astype(np.float64) @ k.astype(np.float64).transpose(0, 2, 1)
         ) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return p @ v.astype(np.float64)


@pytest.fixture
def qkv():
    rng = np.random.default_rng(0)
    shape = (3, 64, 32)  # (B, S=8x8 tokens, C)
    return tuple(rng.normal(size=shape).astype(np.float32)
                 for _ in range(3))


def test_xla_attention_matches_oracle(qkv):
    q, k, v = qkv
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = _xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         scale)
    np.testing.assert_allclose(
        np.asarray(out), _numpy_attention(q, k, v, scale), atol=1e-5
    )


def test_pallas_kernel_matches_xla(qkv):
    """The VMEM-resident kernel math (interpret mode on CPU) must equal
    the shipped XLA path bit-for-bit up to reduction order."""
    q, k, v = (jnp.asarray(x) for x in qkv)
    scale = 1.0 / np.sqrt(q.shape[-1])
    ours = _pallas_attention(q, k, v, scale, interpret=True)
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=1e-5)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_custom_vjp_matches_autodiff(qkv, use_pallas):
    """The closed-form backward (shared by both forwards) must agree
    with plain autodiff through the XLA forward."""
    q, k, v = (jnp.asarray(x) for x in qkv)
    scale = 1.0 / np.sqrt(q.shape[-1])

    def f(q_, k_, v_):
        return jnp.sum(
            spatial_self_attention(q_, k_, v_, scale, use_pallas) ** 2
        )

    def f_ref(q_, k_, v_):
        return jnp.sum(_xla_attention(q_, k_, v_, scale) ** 2)

    got = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=2e-4, err_msg=name)
