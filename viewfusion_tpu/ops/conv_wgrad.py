"""Pallas TPU kernel: weight gradient of a stride-1 SAME 3x3 conv.

Round-3 measurements (docs/DESIGN.md "Performance accounting") put the
UNet's remaining backward-pass cost in the weight-gradient convs: XLA
computes dW per tap as a (Cin, Cout) contraction over B*H*W — at the
64px stages' Cin=Cout=64 that fills a quarter of the 128x128 MXU
(measured 67.7 TF/s = 34% of peak isolated).

This kernel uses the tap factorization

    dW[di, dj, ci, co] = sum_{b,i,j} x[b, i+di-1, j+dj-1, ci] g[b,i,j,co]
                       = sum_{b,i,j} xrow[di][b,i,j,ci] gcol[dj][b,i,j,co]

(xrow = x shifted along H by di-1, gcol = g shifted along W by -(dj-1),
zero at the image edge — shifts SEPARATE: one lands on x, one on g), so
all 9 taps become ONE (3*Cin, 3*Cout) matmul per sample: full MXU rows
AND lanes at Cin=Cout=64 (192x192), with the shifted copies built from
VMEM-resident data (the pure-XLA version of the same trick loses
outright to the 6x HBM materialization of the shifted operands).

Grid over B; a float32 (3*Cin, 3*Cout) accumulator persists in scratch
across grid steps (TPU grid iterations are sequential) and is written
once at the last step.  No cross-sample halo exists: shifts stay within
each sample's image and zero-pad at its edge, exactly like SAME conv.

Wired into the UNet via ``conv3x3`` (a custom-VJP conv whose forward
and data-gradient stay XLA); numerics pinned against jax.grad of
lax.conv in tests/test_conv_wgrad.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["conv3x3_wgrad", "conv3x3"]


def _wgrad_kernel(x_ref, g_ref, dw_ref, acc_ref):
    """One sample: accumulate (3*Cin, 3*Cout) += xs^T @ gs."""
    b = pl.program_id(0)
    h, w, cin = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = g_ref.shape[3]

    @pl.when(b == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    # Keep operands in their native dtype (bf16 in training): casting to
    # f32 here dropped the MXU to quarter rate (measured 48.6 TF/s = the
    # f32 ceiling).  Accumulation stays f32 via preferred_element_type.
    x = x_ref[0]                              # (H, W, Cin)
    g = g_ref[0]                              # (H, W, Cout)
    zx = jnp.zeros((1, w, cin), x.dtype)
    zg = jnp.zeros((h, 1, cout), g.dtype)

    # Row-tap blocks: block k holds x[i + (1-k)] (k=0 -> x[i+1],
    # k=1 -> x[i], k=2 -> x[i-1]).  The authoritative (di, dj) mapping
    # lives at the final reshape in conv3x3_wgrad (block k = tap row
    # 2-k there); both are pinned against jax.grad of lax.conv in
    # tests/test_conv_wgrad.py.
    xs = jnp.concatenate(
        [
            jnp.concatenate([x[1:], zx], axis=0),      # block 0: x[i+1]
            x,                                         # block 1: x[i]
            jnp.concatenate([zx, x[:-1]], axis=0),     # block 2: x[i-1]
        ],
        axis=-1,
    )
    gs = jnp.concatenate(
        [
            jnp.concatenate([g[:, 1:], zg], axis=1),   # dj block 0
            g,                                         # dj block 1
            jnp.concatenate([zg, g[:, :-1]], axis=1),  # dj block 2
        ],
        axis=-1,
    )
    xs2 = xs.reshape(h * w, 3 * cin)
    gs2 = gs.reshape(h * w, 3 * cout)
    acc_ref[:, :] += jax.lax.dot_general(
        xs2, gs2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(b == pl.num_programs(0) - 1)
    def _():
        dw_ref[:, :] = acc_ref[:, :]


def conv3x3_wgrad(x: jnp.ndarray, g: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """dW (3, 3, Cin, Cout) of a stride-1 SAME 3x3 NHWC conv.

    ``x`` (B, H, W, Cin) is the conv input, ``g`` (B, H, W, Cout) the
    output cotangent.  float32 accumulation regardless of input dtype.
    """
    b, h, w, cin = x.shape
    cout = g.shape[3]
    if pltpu is None:
        # the kernel needs the VMEM scratch accumulator either way —
        # fail clearly instead of a missing-positional TypeError from
        # pallas_call with an empty scratch_shapes list
        raise RuntimeError(
            "conv3x3_wgrad requires jax.experimental.pallas.tpu "
            "(unavailable in this jax build); use the XLA wgrad path"
        )
    params = None
    if pltpu is not None:
        cp = getattr(pltpu, "CompilerParams", None) or getattr(
            pltpu, "TPUCompilerParams"
        )
        params = cp(vmem_limit_bytes=96 * 1024 * 1024)
    dw2 = pl.pallas_call(
        _wgrad_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM if pltpu else None),
            pl.BlockSpec((1, h, w, cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM if pltpu else None),
        ],
        out_specs=pl.BlockSpec((3 * cin, 3 * cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM if pltpu else None),
        out_shape=jax.ShapeDtypeStruct((3 * cin, 3 * cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((3 * cin, 3 * cout), jnp.float32)]
        if pltpu else [],
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * cin * cout * b * h * w,
            bytes_accessed=(x.size + g.size) * x.dtype.itemsize
            + 4 * 9 * cin * cout,
            transcendentals=0,
        ),
        compiler_params=params,
        interpret=interpret,
    )(x, g)
    # (3*Cin, 3*Cout) blocks -> (di, Cin, dj, Cout) -> (3, 3, Cin, Cout).
    # xs block k holds x[i + (1-k)], i.e. tap row di = 2-k (row axis
    # reversed); gs block k holds g[:, j - (k-1)], which lands tap
    # column dj = k directly.  Pinned against jax.grad of lax.conv in
    # tests/test_conv_wgrad.py.
    dw = dw2.reshape(3, cin, 3, cout)
    dw = dw[::-1, :, :, :]
    return jnp.transpose(dw, (0, 2, 1, 3))


# ---------------------------------------------------------------------
# custom-VJP conv: XLA forward + XLA dgrad, Pallas wgrad on TPU
# ---------------------------------------------------------------------
def _conv_fwd_math(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3(x, kernel, impl: str = "xla"):
    """Stride-1 SAME 3x3 conv (NHWC x HWIO).  ``impl`` selects the
    weight-gradient path: "pallas" (TPU kernel), "pallas-interpret"
    (CPU validation), or "xla" (lax transpose, the default off-TPU)."""
    return _conv_fwd_math(x, kernel)


def _conv3x3_fwd(x, kernel, impl):
    return _conv_fwd_math(x, kernel), (x, kernel)


def _conv3x3_bwd(impl, res, g):
    x, kernel = res
    # data gradient: XLA's transposed conv (measured at fwd-like rates)
    _, dgrad = jax.vjp(lambda x_: _conv_fwd_math(x_, kernel), x)
    (dx,) = dgrad(g)
    if impl in ("pallas", "pallas-interpret"):
        dw = conv3x3_wgrad(x, g, interpret=impl == "pallas-interpret")
        dw = dw.astype(kernel.dtype)
    else:
        _, wgrad = jax.vjp(lambda k_: _conv_fwd_math(x, k_), kernel)
        (dw,) = wgrad(g)
    return dx, dw


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)
