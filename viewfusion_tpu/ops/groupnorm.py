"""Fused GroupNorm(+SiLU) Pallas TPU kernel with analytic backward.

The UNet spends every ResnetBlock on GroupNorm -> SiLU -> Conv
(reference: model/unet.py:207-218); the round-1 op profile attributed 13%
of device self-time to these normalization reductions (README.md).  XLA
lowers GroupNorm to several HBM passes (moment reduction, then a separate
normalize+affine pass, and the mirrored pair in backward).  This kernel
does the speed-of-light schedule instead:

  forward : ONE read of x, ONE write of y per sample.  Per-group moments
            are computed from VMEM-resident data; the per-group <-> per-
            channel mappings run as tiny one-hot matmuls on the MXU
            (C x G one-hot built from iota), avoiding lane-dimension
            reshapes that Mosaic would relayout.
  backward: ONE read of (x, g), ONE write of dx; dscale/dbias are emitted
            as per-sample partials (B, C) and summed outside the kernel
            (a trivial XLA reduction).  Uses the saved per-group
            mean/rstd, so nothing is recomputed from HBM.

Statistics are always float32 (params too); the output is cast back to
the input dtype, matching flax.linen.GroupNorm's float32 stats + dtype
output contract.  ``act="silu"`` fuses the Swish that always follows the
norm in the UNet blocks; ``act="none"`` serves the attention pre-norm.

On non-TPU backends (the 8-device CPU test mesh) the public entry point
dispatches to an equivalent XLA implementation; ``use_pallas=True`` on
CPU runs the kernel in interpreter mode (used by tests to validate the
kernel math itself without a chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu imports fine on CPU; guard for exotic builds.
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["group_norm_act", "FusedGroupNorm"]


def _act_fwd(z: jnp.ndarray, act: str) -> jnp.ndarray:
    if act == "silu":
        return z * jax.nn.sigmoid(z)
    return z


def _act_grad(z: jnp.ndarray, act: str) -> jnp.ndarray:
    """d act(z) / dz evaluated from the pre-activation z."""
    if act == "silu":
        s = jax.nn.sigmoid(z)
        return s * (1.0 + z * (1.0 - s))
    return jnp.ones_like(z)


def _group_onehots(c_lanes: int, groups: int, c_logical: int):
    """(C_lanes, G) and (G, C_lanes) one-hot group-membership matrices.

    Built from 2-D iota so the per-group reductions/broadcasts run as
    MXU matmuls instead of lane-dim reshapes.  When ``c_lanes`` is a
    row-fold of the logical channel axis (f rows packed side by side to
    fill the 128 lanes), lane j carries channel ``j % c_logical`` — the
    membership map absorbs the fold for free."""
    cpg = c_logical // groups
    ch = jax.lax.broadcasted_iota(jnp.int32, (c_lanes, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c_lanes, groups), 1)
    m_cg = (ch % c_logical // cpg == gr).astype(jnp.float32)
    ch_t = jax.lax.broadcasted_iota(jnp.int32, (groups, c_lanes), 1)
    gr_t = jax.lax.broadcasted_iota(jnp.int32, (groups, c_lanes), 0)
    m_gc = (ch_t % c_logical // cpg == gr_t).astype(jnp.float32)
    return m_cg, m_gc


def _fold_factor(l: int, c: int) -> int:
    """Rows folded into lanes so narrow-channel inputs use all 128 VPU
    lanes (C=64 UNet stem blocks would otherwise waste half of every
    vector op)."""
    f = max(1, 128 // c)
    while f > 1 and l % f:
        f -= 1
    return f


# ---------------------------------------------------------------------
# forward kernel: y = act((x - mean_g) * rstd_g * scale + bias)
# ---------------------------------------------------------------------
def _chunk_rows(l: int, c: int, budget_bytes: int = 1 << 19) -> int:
    """Largest divisor of ``l`` whose f32 chunk fits the temp budget.

    The whole (L, C) block lives in VMEM once, but every f32 temporary
    the kernel body creates is stack-allocated at full block size unless
    the body is written chunk-wise — at (4096, 192) that OOMs the 16 MB
    scoped VMEM.  Chunking the row axis keeps each temp under ~0.5 MB
    while the block itself is still read from HBM exactly once."""
    if l * c * 4 <= budget_bytes:
        return l
    chunk = max(1, budget_bytes // (c * 4))
    while l % chunk:
        chunk -= 1
    return max(chunk, 1)


def _fwd_kernel(x_ref, scale_ref, bias_ref, y_ref, mean_ref, rstd_ref,
                *, groups: int, eps: float, act: str, c_logical: int,
                chunk: int):
    l, c = x_ref.shape[1], x_ref.shape[2]
    m_cg, m_gc = _group_onehots(c, groups, c_logical)
    n = float(l * (c // groups))
    hi = jax.lax.Precision.HIGHEST

    # pass 1: per-channel sums, row-chunked (see _chunk_rows)
    s1 = jnp.zeros((1, c), jnp.float32)
    s2 = jnp.zeros((1, c), jnp.float32)
    for k in range(l // chunk):
        xs = x_ref[0, k * chunk:(k + 1) * chunk, :].astype(jnp.float32)
        s1 = s1 + jnp.sum(xs, axis=0, keepdims=True)
        s2 = s2 + jnp.sum(xs * xs, axis=0, keepdims=True)

    mean_g = jnp.dot(s1, m_cg, preferred_element_type=jnp.float32,
                     precision=hi) / n
    ms_g = jnp.dot(s2, m_cg, preferred_element_type=jnp.float32,
                   precision=hi) / n
    var_g = jnp.maximum(ms_g - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)        # (1, G)
    mean_c = jnp.dot(mean_g, m_gc, preferred_element_type=jnp.float32,
                     precision=hi)
    rstd_c = jnp.dot(rstd_g, m_gc, preferred_element_type=jnp.float32,
                     precision=hi)

    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)
    # pass 2: normalize + affine + activation (VMEM-resident)
    for k in range(l // chunk):
        sl = slice(k * chunk, (k + 1) * chunk)
        xs = x_ref[0, sl, :].astype(jnp.float32)
        z = (xs - mean_c) * rstd_c * scale + bias
        y_ref[0, sl, :] = _act_fwd(z, act).astype(y_ref.dtype)
    mean_ref[0] = mean_g  # (1, G) block of the (B, 1, G) stats array
    rstd_ref[0] = rstd_g


def _fwd_kernel_v2(x_ref, scale_ref, bias_ref, y_ref, mean_ref, rstd_ref,
                   *, groups: int, eps: float, act: str, c_logical: int,
                   chunk: int):
    """Round-4 forward rewrite with the v2-backward block structure:
    multi-sample grid blocks (small-L shapes stop being grid-overhead
    bound) and the same chunked two-pass schedule — ONE HBM read of x
    feeding both the statistics and the normalize+activation, ONE write
    of y.  The XLA hybrid forward reads x twice (stats pass + normalize
    pass); whether the saved read beats the lost producer fusion is an
    empirical question settled by scripts/ab_gn_fwd.py — measured on
    chip (GN_FWD_AB_r05.json): v2 wins at every flagship GN shape,
    1.02-1.75x per shape, 1.15x count-weighted, which is why v2 is the
    VF_GN_FWD default."""
    bs, l, c = x_ref.shape
    m_cg, m_gc = _group_onehots(c, groups, c_logical)
    n = float(l * (c // groups))
    hi = jax.lax.Precision.HIGHEST
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)

    for s in range(bs):
        s1 = jnp.zeros((1, c), jnp.float32)
        s2 = jnp.zeros((1, c), jnp.float32)
        for k in range(l // chunk):
            xs = x_ref[s, k * chunk:(k + 1) * chunk, :].astype(jnp.float32)
            s1 = s1 + jnp.sum(xs, axis=0, keepdims=True)
            s2 = s2 + jnp.sum(xs * xs, axis=0, keepdims=True)
        mean_g = jnp.dot(s1, m_cg, preferred_element_type=jnp.float32,
                         precision=hi) / n
        ms_g = jnp.dot(s2, m_cg, preferred_element_type=jnp.float32,
                       precision=hi) / n
        var_g = jnp.maximum(ms_g - mean_g * mean_g, 0.0)
        rstd_g = jax.lax.rsqrt(var_g + eps)          # (1, G)
        mean_c = jnp.dot(mean_g, m_gc, preferred_element_type=jnp.float32,
                         precision=hi)
        rstd_c = jnp.dot(rstd_g, m_gc, preferred_element_type=jnp.float32,
                         precision=hi)
        sc = rstd_c * scale                          # z = x*sc + sh
        sh = bias - mean_c * sc
        for k in range(l // chunk):
            sl = slice(k * chunk, (k + 1) * chunk)
            xs = x_ref[s, sl, :].astype(jnp.float32)
            y_ref[s, sl, :] = _act_fwd(xs * sc + sh, act).astype(y_ref.dtype)
        mean_ref[s] = mean_g   # (1, G) slice of the (bs, 1, G) block
        rstd_ref[s] = rstd_g


# ---------------------------------------------------------------------
# backward kernel: standard GroupNorm gradient with the activation
# gradient folded in; per-sample dscale/dbias partials.
# ---------------------------------------------------------------------
def _bwd_kernel(x_ref, scale_ref, bias_ref, mean_ref, rstd_ref, g_ref,
                dx_ref, dscale_ref, dbias_ref,
                *, groups: int, eps: float, act: str, c_logical: int,
                chunk: int):
    del eps
    l, c = x_ref.shape[1], x_ref.shape[2]
    m_cg, m_gc = _group_onehots(c, groups, c_logical)
    n = float(l * (c // groups))
    hi = jax.lax.Precision.HIGHEST

    scale = scale_ref[0].astype(jnp.float32)   # (C,) broadcast over rows
    bias = bias_ref[0].astype(jnp.float32)
    mean_c = jnp.dot(mean_ref[0], m_gc, preferred_element_type=jnp.float32,
                     precision=hi)
    rstd_c = jnp.dot(rstd_ref[0], m_gc, preferred_element_type=jnp.float32,
                     precision=hi)

    def chunk_xhat_dy(k):
        sl = slice(k * chunk, (k + 1) * chunk)
        xs = x_ref[0, sl, :].astype(jnp.float32)
        gs = g_ref[0, sl, :].astype(jnp.float32)
        xhat = (xs - mean_c) * rstd_c
        dy = gs * _act_grad(xhat * scale + bias, act)
        return sl, xhat, dy

    # pass 1: the four per-channel reductions, row-chunked (_chunk_rows)
    dbias = jnp.zeros((1, c), jnp.float32)
    dscale = jnp.zeros((1, c), jnp.float32)
    a_sum = jnp.zeros((1, c), jnp.float32)   # sum dxhat
    b_sum = jnp.zeros((1, c), jnp.float32)   # sum dxhat * xhat
    for k in range(l // chunk):
        _, xhat, dy = chunk_xhat_dy(k)
        dxhat = dy * scale
        dbias = dbias + jnp.sum(dy, axis=0, keepdims=True)
        dscale = dscale + jnp.sum(dy * xhat, axis=0, keepdims=True)
        a_sum = a_sum + jnp.sum(dxhat, axis=0, keepdims=True)
        b_sum = b_sum + jnp.sum(dxhat * xhat, axis=0, keepdims=True)

    a_g = jnp.dot(a_sum, m_cg, preferred_element_type=jnp.float32,
                  precision=hi) / n          # (1, G)
    b_g = jnp.dot(b_sum, m_cg, preferred_element_type=jnp.float32,
                  precision=hi) / n
    a_c = jnp.dot(a_g, m_gc, preferred_element_type=jnp.float32,
                  precision=hi)
    b_c = jnp.dot(b_g, m_gc, preferred_element_type=jnp.float32,
                  precision=hi)

    # pass 2: dx (x/g still VMEM-resident; recompute xhat/dy per chunk)
    for k in range(l // chunk):
        sl, xhat, dy = chunk_xhat_dy(k)
        dxhat = dy * scale
        dx_ref[0, sl, :] = (
            rstd_c * (dxhat - a_c - xhat * b_c)
        ).astype(dx_ref.dtype)
    dscale_ref[0] = dscale  # (1, C) block of the (B, 1, C) partials
    dbias_ref[0] = dbias


def _bwd_kernel_v2(x_ref, scale_ref, bias_ref, mean_ref, rstd_ref, g_ref,
                   dx_ref, dscale_ref, dbias_ref, dy_scr, xhat_scr,
                   *, groups: int, eps: float, act: str, c_logical: int,
                   chunk: int):
    """Round-4 backward rewrite, driven by the MFU ledger
    (MFU_LEDGER_r04.json): v1 was the step's single largest measured
    category (22.9 ms, 21% of the 107 ms step) at only 95-315 GB/s.
    Three changes, same math:

      * multi-sample blocks — the grid steps over B/bs instead of B, so
        small-L shapes (40 KB blocks at (98, 64, 320)) stop being
        grid-overhead-bound;
      * two reductions instead of four — sum(dxhat) == scale * sum(dy)
        and sum(dxhat*xhat) == scale * sum(dy*xhat) channel-wise, so
        a/b are derived from dbias/dscale after the loop;
      * VMEM scratch for dy/xhat — pass 2 is two fmas per element
        instead of recomputing the normalize + sigmoid chain.
    """
    del eps
    bs, l, c = x_ref.shape
    m_cg, m_gc = _group_onehots(c, groups, c_logical)
    n = float(l * (c // groups))
    hi = jax.lax.Precision.HIGHEST
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)

    for s in range(bs):
        mean_c = jnp.dot(mean_ref[s], m_gc,
                         preferred_element_type=jnp.float32, precision=hi)
        rstd_c = jnp.dot(rstd_ref[s], m_gc,
                         preferred_element_type=jnp.float32, precision=hi)
        sc = rstd_c * scale          # z  = x*sc + sh ; rstd*dxhat = dy*sc
        sh = bias - mean_c * sc
        mr = mean_c * rstd_c         # xhat = x*rstd - mr

        dbias = jnp.zeros((1, c), jnp.float32)
        dscale = jnp.zeros((1, c), jnp.float32)
        for k in range(l // chunk):
            sl = slice(k * chunk, (k + 1) * chunk)
            xs = x_ref[s, sl, :].astype(jnp.float32)
            gs = g_ref[s, sl, :].astype(jnp.float32)
            xhat = xs * rstd_c - mr
            dy = gs * _act_grad(xs * sc + sh, act)
            dy_scr[sl, :] = dy
            xhat_scr[sl, :] = xhat
            dbias = dbias + jnp.sum(dy, axis=0, keepdims=True)
            dscale = dscale + jnp.sum(dy * xhat, axis=0, keepdims=True)

        a_g = jnp.dot(dbias * scale, m_cg,
                      preferred_element_type=jnp.float32, precision=hi) / n
        b_g = jnp.dot(dscale * scale, m_cg,
                      preferred_element_type=jnp.float32, precision=hi) / n
        ra = rstd_c * jnp.dot(a_g, m_gc,
                              preferred_element_type=jnp.float32,
                              precision=hi)
        rb = rstd_c * jnp.dot(b_g, m_gc,
                              preferred_element_type=jnp.float32,
                              precision=hi)
        for k in range(l // chunk):
            sl = slice(k * chunk, (k + 1) * chunk)
            dx_ref[s, sl, :] = (
                dy_scr[sl, :] * sc - (xhat_scr[sl, :] * rb + ra)
            ).astype(dx_ref.dtype)
        dscale_ref[s] = dscale  # (1, C) slice of the (bs, 1, C) block
        dbias_ref[s] = dbias


def _bwd_kernel_v3(x_ref, scale_ref, bias_ref, mean_ref, rstd_ref, g_ref,
                   dx_ref, dscale_ref, dbias_ref, dy_scr, xhat_scr,
                   *, groups: int, eps: float, act: str, c_logical: int,
                   chunk: int):
    """v2 math on rank-4 (bs, H, W, C) blocks — the layout-native
    boundary.  Identical arithmetic to _bwd_kernel_v2; the only change
    is that rows are (H-chunk, W, C) slabs reduced over axes (0, 1), so
    the op consumes the model's NHWC tensors DIRECTLY.  Feeding pallas
    the 4-D arrays (instead of an external reshape to (B, L, C)) lets
    XLA propagate the custom-call's default layout into the producing /
    consuming convs: the round-4 trace (RESIDUAL_r04.json) measured
    19.2 ms/step of layout copies, most of them the
    conv-layout <-> row-major (B, L, C) conversions around these calls.
    """
    del eps
    bs, h, w, c = x_ref.shape
    m_cg, m_gc = _group_onehots(c, groups, c_logical)
    n = float(h * w * (c // groups))
    hi = jax.lax.Precision.HIGHEST
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)

    for s in range(bs):
        mean_c = jnp.dot(mean_ref[s], m_gc,
                         preferred_element_type=jnp.float32, precision=hi)
        rstd_c = jnp.dot(rstd_ref[s], m_gc,
                         preferred_element_type=jnp.float32, precision=hi)
        sc = rstd_c * scale          # (1, C): z = x*sc + sh
        sh = bias - mean_c * sc
        mr = mean_c * rstd_c         # xhat = x*rstd - mr

        dbias = jnp.zeros((1, c), jnp.float32)
        dscale = jnp.zeros((1, c), jnp.float32)
        for k in range(h // chunk):
            sl = slice(k * chunk, (k + 1) * chunk)
            xs = x_ref[s, sl, :, :].astype(jnp.float32)   # (chunk, W, C)
            gs = g_ref[s, sl, :, :].astype(jnp.float32)
            xhat = xs * rstd_c - mr
            dy = gs * _act_grad(xs * sc + sh, act)
            dy_scr[sl, :, :] = dy
            xhat_scr[sl, :, :] = xhat
            dbias = dbias + jnp.sum(dy, axis=(0, 1))[None, :]
            dscale = dscale + jnp.sum(dy * xhat, axis=(0, 1))[None, :]

        a_g = jnp.dot(dbias * scale, m_cg,
                      preferred_element_type=jnp.float32, precision=hi) / n
        b_g = jnp.dot(dscale * scale, m_cg,
                      preferred_element_type=jnp.float32, precision=hi) / n
        ra = rstd_c * jnp.dot(a_g, m_gc,
                              preferred_element_type=jnp.float32,
                              precision=hi)
        rb = rstd_c * jnp.dot(b_g, m_gc,
                              preferred_element_type=jnp.float32,
                              precision=hi)
        for k in range(h // chunk):
            sl = slice(k * chunk, (k + 1) * chunk)
            dx_ref[s, sl, :, :] = (
                dy_scr[sl, :, :] * sc - (xhat_scr[sl, :, :] * rb + ra)
            ).astype(dx_ref.dtype)
        dscale_ref[s] = dscale  # (1, C) slice of the (bs, 1, C) block
        dbias_ref[s] = dbias


# ---------------------------------------------------------------------
# pallas_call wrappers (operate on (B, L, C); grid over B)
# ---------------------------------------------------------------------
def _row_spec(l, c):
    return pl.BlockSpec((1, l, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _vec_spec(c):
    # scale/bias (1, C): same block for every grid step
    return pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _stat_spec(g):
    # Per-sample stats live as (B, 1, G): the (1, 1, G) block's trailing
    # two dims equal the array dims, satisfying Mosaic's tiling rule for
    # any G (a (1, G) block of a (B, G) array would not).
    return pl.BlockSpec((1, 1, g), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _compiler_params():
    """Raise the scoped-VMEM cap: the default 16 MB rejects the largest
    UNet blocks (3 row-blocks x double buffering + chunk temps ~ 17 MB
    at (4096, 192)); v5e has far more physical VMEM than the default
    compiler budget."""
    if pltpu is None:  # pragma: no cover
        return None
    params = getattr(pltpu, "CompilerParams", None) or getattr(
        pltpu, "TPUCompilerParams"
    )
    return params(vmem_limit_bytes=64 * 1024 * 1024)


def _pallas_fwd(x3, scale, bias, groups, eps, act, interpret, version=None):
    import os

    b, l, c = x3.shape
    f = _fold_factor(l, c)
    lf, cf = l // f, f * c
    x4 = x3.reshape(b, lf, cf)
    sc = jnp.tile(scale.reshape(1, c), (1, f))
    bi = jnp.tile(bias.reshape(1, c), (1, f))
    chunk = _chunk_rows(lf, cf)
    if version is None:
        version = os.environ.get("VF_GN_FWD", "v2")

    if version == "v1":  # measurement escape hatch (one-sample grid)
        kern = functools.partial(_fwd_kernel, groups=groups, eps=eps,
                                 act=act, c_logical=c, chunk=chunk)
        bs = 1
    else:
        kern = functools.partial(_fwd_kernel_v2, groups=groups, eps=eps,
                                 act=act, c_logical=c, chunk=chunk)
        bs = _block_batch(b, lf, cf)

    def rows_blk():
        return pl.BlockSpec((bs, lf, cf), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def stat_blk(width):
        return pl.BlockSpec((bs, 1, width), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    y, mean, rstd = pl.pallas_call(
        kern,
        grid=(b // bs,),
        in_specs=[rows_blk(), _vec_spec(cf), _vec_spec(cf)],
        out_specs=[rows_blk(), stat_blk(groups), stat_blk(groups)],
        out_shape=[
            jax.ShapeDtypeStruct((b, lf, cf), x3.dtype),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * l * c,
            bytes_accessed=2 * b * l * c * x3.dtype.itemsize,
            transcendentals=b * l * c if act == "silu" else 0,
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x4, sc, bi)
    return y.reshape(b, l, c), mean, rstd


def _block_batch(b: int, lf: int, cf: int,
                 target_bytes: int = 2 << 20) -> int:
    """Samples per grid step: largest divisor of ``b`` whose bf16 input
    block stays under ``target_bytes``.  One sample per step leaves
    small-L shapes grid-overhead-bound (the r4 ledger measured the
    (98, 64, 320) blocks at 95 GB/s); ~2 MB blocks restore pipelining
    without blowing the scoped-VMEM budget."""
    per_sample = lf * cf * 2
    bs = max(1, min(b, target_bytes // max(per_sample, 1)))
    while b % bs:
        bs -= 1
    return bs


def _pallas_bwd(x3, scale, bias, mean, rstd, g3, groups, eps, act,
                interpret, version=None):
    import os

    b, l, c = x3.shape
    f = _fold_factor(l, c)
    lf, cf = l // f, f * c
    sc = jnp.tile(scale.reshape(1, c), (1, f))
    bi = jnp.tile(bias.reshape(1, c), (1, f))
    chunk = _chunk_rows(lf, cf)
    if version is None:
        version = os.environ.get("VF_GN_BWD", "v2")

    if version == "v1":  # measurement escape hatch for the r4 A/B
        kern = functools.partial(_bwd_kernel, groups=groups, eps=eps,
                                 act=act, c_logical=c, chunk=chunk)
        bs, scratch = 1, []
    else:
        kern = functools.partial(_bwd_kernel_v2, groups=groups, eps=eps,
                                 act=act, c_logical=c, chunk=chunk)
        bs = _block_batch(b, lf, cf)
        vmem = pltpu.VMEM if pltpu is not None else pl.ANY
        scratch = [vmem((lf, cf), jnp.float32),
                   vmem((lf, cf), jnp.float32)]

    def rows_blk():
        return pl.BlockSpec((bs, lf, cf), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def stat_blk(width):
        # trailing two dims equal the array dims (Mosaic tiling rule)
        return pl.BlockSpec((bs, 1, width), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    dx, dscale_p, dbias_p = pl.pallas_call(
        kern,
        grid=(b // bs,),
        in_specs=[rows_blk(), _vec_spec(cf), _vec_spec(cf),
                  stat_blk(groups), stat_blk(groups), rows_blk()],
        out_specs=[rows_blk(), stat_blk(cf), stat_blk(cf)],
        out_shape=[
            jax.ShapeDtypeStruct((b, lf, cf), x3.dtype),
            jax.ShapeDtypeStruct((b, 1, cf), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cf), jnp.float32),
        ],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=16 * b * l * c,
            bytes_accessed=3 * b * l * c * x3.dtype.itemsize,
            transcendentals=b * l * c if act == "silu" else 0,
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x3.reshape(b, lf, cf), sc, bi, mean, rstd, g3.reshape(b, lf, cf))
    # un-fold the per-lane partials back to per-channel (lane j carries
    # channel j % C)
    dscale_p = dscale_p.reshape(b, f, c).sum(axis=1)
    dbias_p = dbias_p.reshape(b, f, c).sum(axis=1)
    return dx.reshape(b, l, c), dscale_p, dbias_p


def _pallas_bwd4(x4, scale, bias, mean, rstd, g4, groups, eps, act,
                 interpret):
    """Rank-4 (layout-native) GroupNorm backward: same v2 math, NHWC
    blocks, no external reshape (see _bwd_kernel_v3 docstring)."""
    b, h, w, c = x4.shape
    chunk = _chunk_rows(h, w * c)
    bs = _block_batch(b, h * w, c)
    kern = functools.partial(_bwd_kernel_v3, groups=groups, eps=eps,
                             act=act, c_logical=c, chunk=chunk)
    vmem = pltpu.VMEM if pltpu is not None else pl.ANY

    def rows_blk():
        return pl.BlockSpec((bs, h, w, c), lambda i: (i, 0, 0, 0),
                            memory_space=vmem)

    def stat_blk(width):
        return pl.BlockSpec((bs, 1, width), lambda i: (i, 0, 0),
                            memory_space=vmem)

    dx, dscale_p, dbias_p = pl.pallas_call(
        kern,
        grid=(b // bs,),
        in_specs=[rows_blk(), _vec_spec(c), _vec_spec(c),
                  stat_blk(groups), stat_blk(groups), rows_blk()],
        out_specs=[rows_blk(), stat_blk(c), stat_blk(c)],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), x4.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        scratch_shapes=[vmem((h, w, c), jnp.float32),
                        vmem((h, w, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=16 * b * h * w * c,
            bytes_accessed=3 * b * h * w * c * x4.dtype.itemsize,
            transcendentals=b * h * w * c if act == "silu" else 0,
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(x4, scale.reshape(1, c), bias.reshape(1, c), mean, rstd, g4)
    # (B, 1, C) partials -> (B, C), matching _pallas_bwd's contract
    return dx, dscale_p.reshape(b, c), dbias_p.reshape(b, c)


# ---------------------------------------------------------------------
# XLA fallback (CPU test meshes, and TPU when the kernel is disabled):
# delegate to flax's tuned GroupNorm with externally-owned params — its
# lowering measured ~5% faster per train step than a hand-rolled
# reshape-based formulation on TPU.
# ---------------------------------------------------------------------
def _xla_gn_act(x, scale, bias, groups, eps, act):
    from flax import linen as nn

    # dtype=x.dtype reproduces the round-1 Block exactly (flax computes
    # the statistics in float32 regardless; normalize/affine/SiLU run in
    # the compute dtype).
    y = nn.GroupNorm(
        num_groups=groups, epsilon=eps, dtype=x.dtype
    ).apply({"params": {"scale": scale, "bias": bias}}, x)
    return _act_fwd(y, act).astype(x.dtype)


def _xla_gn_act_dot(x3, scale, bias, groups, eps, act):
    """GroupNorm with a split, lane-friendly statistics reduction:
    a spatial sum that keeps all C channels in lanes (VPU-parallel),
    then a tiny exact (B, C) -> (B, G) combine.  (NOT a one-hot matmul:
    on TPU that would ride the MXU at bf16 input precision and corrupt
    the statistics.)

    MEASURED NEGATIVE RESULT, kept as a documented escape hatch
    (VF_GN_IMPL=dot): on the flagship packed step this runs 8.60
    steps/s vs flax's 9.00 — the split reduction prevents XLA from
    fusing the stats pass into the producing ops, and that fusion is
    worth more than the lane-friendlier reduction shape."""
    b, l, c = x3.shape
    cg = c // groups
    xf = x3.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=1)        # (B, C): per-channel spatial sums
    s2 = jnp.sum(xf * xf, axis=1)   # fused with s1 by XLA (one pass)
    gs1 = s1.reshape(b, groups, cg).sum(axis=-1)   # (B, G), exact f32
    gs2 = s2.reshape(b, groups, cg).sum(axis=-1)
    n = l * cg
    mean_g = gs1 / n
    var_g = jnp.maximum(gs2 / n - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, cg, axis=1)[:, None, :]   # (B, 1, C)
    rstd_c = jnp.repeat(rstd_g, cg, axis=1)[:, None, :]
    sc = scale.astype(jnp.float32) * rstd_c
    z = xf * sc - (mean_c * sc - bias.astype(jnp.float32))
    return _act_fwd(z, act).astype(x3.dtype)


# ---------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------
def _dispatch(use_pallas):
    """Resolve the implementation name from the flag + environment.

    Returns one of "pallas", "pallas-interpret", "dot", "flax".
    ``VF_GN_PALLAS=0/1`` and ``VF_GN_IMPL=pallas|dot|flax`` override
    (measurement escape hatches; see README perf notes for the measured
    step-time deltas that set the default)."""
    import os

    def hybrid(cpu_fallback="hybrid-interpret"):
        # the Pallas analytic backward needs real TPU; off-TPU callers
        # get the interpreted kernel (tests) or flax (the default path)
        return ("hybrid" if jax.default_backend() == "tpu"
                else cpu_fallback)

    if use_pallas == "hybrid":
        return hybrid()
    if use_pallas is None:
        env = os.environ.get("VF_GN_PALLAS")
        if env is not None:
            use_pallas = env not in ("0", "false", "")
        else:
            impl = os.environ.get("VF_GN_IMPL")
            if impl in ("pallas", "dot", "flax", "hybrid"):
                if impl == "hybrid":
                    return hybrid()
                if impl != "pallas":
                    return impl
                use_pallas = True
            else:
                # MEASURED default (flagship packed step, v5e, best of
                # 3x30-step windows each).  Round 2: flax 9.00 steps/s >
                # dot 8.60 > full Pallas kernel (v1 fwd) 8.20 — XLA
                # fused the forward statistics into producers, which the
                # custom-call boundary forbids.  Round 3: the HYBRID
                # (XLA forward, keeping that fusion + the Pallas
                # analytic BACKWARD replacing XLA's multi-pass GN
                # gradient) measured 9.35 vs 9.04 steps/s (+3.5%) and
                # became the TPU default.  Round 5: the v2 forward
                # kernel (single-read fused stats+normalize, the
                # per-shape winner in GN_FWD_AB_r05.json) flips the
                # order — full Pallas 9.910/9.895 steps/s vs hybrid
                # 9.853/9.844 across interleaved fresh processes
                # (GN_IMPL_AB_r05.json; gap 4-7x the restart spread),
                # so full Pallas (fwd v2 + analytic bwd) is now the
                # TPU default.  CPU keeps flax (the Pallas kernels
                # would run interpreted).  All variants stay
                # selectable via VF_GN_IMPL=flax|dot|pallas|hybrid
                # and tested.
                if jax.default_backend() == "tpu":
                    return "pallas"
                return hybrid(cpu_fallback="flax")
    if use_pallas and jax.default_backend() != "tpu":
        return "pallas-interpret"  # kernel-math validation on CPU
    return "pallas" if use_pallas else "flax"


# The custom VJP wraps ONLY the Pallas path: on the XLA path the plain
# differentiable implementation is returned directly, so XLA can fuse
# the norm into its neighbors (a custom_vjp boundary would block that
# and measurably slow the fallback train step).
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_act_pallas(x3, scale, bias, groups, eps, act, interpret):
    y, _, _ = _pallas_fwd(x3, scale, bias, groups, eps, act, interpret)
    return y


def _gn_act_fwd(x3, scale, bias, groups, eps, act, interpret):
    y, mean, rstd = _pallas_fwd(x3, scale, bias, groups, eps, act,
                                interpret)
    return y, (x3, scale, bias, mean, rstd)


def _gn_act_bwd(groups, eps, act, interpret, res, g):
    x3, scale, bias, mean, rstd = res
    dx, dscale_p, dbias_p = _pallas_bwd(
        x3, scale, bias, mean, rstd, g, groups, eps, act, interpret
    )
    return (dx, jnp.sum(dscale_p, axis=0).astype(scale.dtype),
            jnp.sum(dbias_p, axis=0).astype(bias.dtype))


_gn_act_pallas.defvjp(_gn_act_fwd, _gn_act_bwd)


# ---------------------------------------------------------------------
# hybrid: XLA forward (keeps producer fusion — the reason the full
# Pallas kernel measured slower), Pallas analytic backward (one fused
# kernel replacing XLA's multi-pass GN gradient reductions, which the
# round-3 profile places inside the 13% reduce_sum line).
# ---------------------------------------------------------------------
def _hybrid_fwd_math(x3, scale, bias, groups, eps, act):
    b, l, c = x3.shape
    cg = c // groups
    xf = x3.astype(jnp.float32)
    xg = xf.reshape(b, l, groups, cg)
    m1 = jnp.mean(xg, axis=(1, 3))                 # (B, G)
    m2 = jnp.mean(xg * xg, axis=(1, 3))
    var_g = jnp.maximum(m2 - m1 * m1, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(m1, cg, axis=1)[:, None, :]   # (B, 1, C)
    rstd_c = jnp.repeat(rstd_g, cg, axis=1)[:, None, :]
    z = (xf - mean_c) * rstd_c * scale.astype(jnp.float32) + \
        bias.astype(jnp.float32)
    y = _act_fwd(z, act).astype(x3.dtype)
    return y, m1[:, None, :], rstd_g[:, None, :]      # stats (B, 1, G)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_act_hybrid(x3, scale, bias, groups, eps, act, interpret):
    return _hybrid_fwd_math(x3, scale, bias, groups, eps, act)[0]


def _gn_act_hybrid_fwd(x3, scale, bias, groups, eps, act, interpret):
    y, mean, rstd = _hybrid_fwd_math(x3, scale, bias, groups, eps, act)
    return y, (x3, scale, bias, mean, rstd)


def _gn_act_hybrid_bwd(groups, eps, act, interpret, res, g):
    x3, scale, bias, mean, rstd = res
    dx, dscale_p, dbias_p = _pallas_bwd(
        x3, scale, bias, mean, rstd, g, groups, eps, act, interpret
    )
    return (dx, jnp.sum(dscale_p, axis=0).astype(scale.dtype),
            jnp.sum(dbias_p, axis=0).astype(bias.dtype))


_gn_act_hybrid.defvjp(_gn_act_hybrid_fwd, _gn_act_hybrid_bwd)


# ---------------------------------------------------------------------
# hybrid, 4-D (layout-native) boundary: the custom_vjp wraps the NHWC
# tensor directly, so the only forced-layout surface is the backward
# pallas_call's own operands — the forward keeps full XLA fusion AND
# sheds the external (B, L, C) reshape copies (RESIDUAL_r04.json:
# 19.2 ms/step of layout copies around the 3-D boundary).
# ---------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gn_act_hybrid4(x4, scale, bias, groups, eps, act, interpret):
    b, c = x4.shape[0], x4.shape[-1]
    y, _, _ = _hybrid_fwd_math(x4.reshape(b, -1, c), scale, bias, groups,
                               eps, act)
    return y.reshape(x4.shape)


def _gn_act_hybrid4_fwd(x4, scale, bias, groups, eps, act, interpret):
    b, c = x4.shape[0], x4.shape[-1]
    # the reshape here is INSIDE the vjp forward, so XLA fuses it into
    # the stats/normalize passes instead of materializing a copy
    y, mean, rstd = _hybrid_fwd_math(x4.reshape(b, -1, c), scale, bias,
                                     groups, eps, act)
    return y.reshape(x4.shape), (x4, scale, bias, mean, rstd)


def _gn_act_hybrid4_bwd(groups, eps, act, interpret, res, g):
    x4, scale, bias, mean, rstd = res
    dx, dscale_p, dbias_p = _pallas_bwd4(
        x4, scale, bias, mean, rstd, g, groups, eps, act, interpret
    )
    return (dx, jnp.sum(dscale_p, axis=0).reshape(scale.shape).astype(
        scale.dtype),
        jnp.sum(dbias_p, axis=0).reshape(bias.shape).astype(bias.dtype))


_gn_act_hybrid4.defvjp(_gn_act_hybrid4_fwd, _gn_act_hybrid4_bwd)


def _use_4d_boundary(x):
    """4-D boundary is OFF by default: measured on-chip it REGRESSES the
    flagship packed step 13% (GN_BOUNDARY_AB_r05.json: 3-D 9.89 steps/s
    vs 4-D 8.61, fresh process per variant, interleaved — the r4 driver
    bench's 8.57 was this default, shipped unmeasured).  The layout
    copies it was aimed at (RESIDUAL_r04.json: 19.2 ms) are evidently
    cheaper than whatever fusion/layout choices the 4-D custom_vjp
    boundary costs XLA elsewhere.  VF_GN_BOUNDARY=4d re-enables it for
    measurement (set BEFORE process start: the knob is read at trace
    time; scripts/ab_gn_boundary.py spawns fresh processes per variant
    for exactly this reason)."""
    import os

    if os.environ.get("VF_GN_BOUNDARY", "3d") != "4d":
        return False
    return x.ndim == 4 and x.shape[-1] >= 128


def group_norm_act(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    groups: int,
    eps: float = 1e-5,
    act: str = "none",
    use_pallas=None,
) -> jnp.ndarray:
    """GroupNorm over the trailing channel axis (+optional fused SiLU).

    ``x`` is (B, ..., C) with C % groups == 0; normalization is per
    sample over all non-batch axes within each channel group — identical
    semantics to flax.linen.GroupNorm / torch.nn.GroupNorm (the
    reference Block norm, model/unet.py:209).  Returns x.dtype.
    """
    if x.shape[-1] % groups:
        raise ValueError(
            f"channels {x.shape[-1]} not divisible by groups {groups}"
        )
    if act not in ("none", "silu"):
        raise ValueError(f"unsupported act {act!r}")
    b, c = x.shape[0], x.shape[-1]
    impl = _dispatch(use_pallas)
    if impl in ("hybrid", "hybrid-interpret") and _use_4d_boundary(x):
        return _gn_act_hybrid4(x, scale, bias, groups, eps, act,
                               impl == "hybrid-interpret")
    x3 = x.reshape(b, -1, c)
    if impl in ("pallas", "pallas-interpret"):
        y = _gn_act_pallas(x3, scale, bias, groups, eps, act,
                           impl == "pallas-interpret")
    elif impl in ("hybrid", "hybrid-interpret"):
        y = _gn_act_hybrid(x3, scale, bias, groups, eps, act,
                           impl == "hybrid-interpret")
    elif impl == "dot":
        y = _xla_gn_act_dot(x3, scale, bias, groups, eps, act)
    else:
        y = _xla_gn_act(x3, scale, bias, groups, eps, act)
    return y.reshape(x.shape)


class FusedGroupNorm:
    """Flax-module factory is defined in models/unet.py to keep the param
    tree naming there; this symbol exists only to document the op's home."""

    def __new__(cls, *a, **k):  # pragma: no cover
        raise TypeError("use viewfusion_tpu.models.unet.FusedGroupNorm")
