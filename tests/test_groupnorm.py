"""Fused GroupNorm(+SiLU) kernel: forward + gradient parity.

Oracle is flax.linen.GroupNorm (itself torch-GroupNorm-equivalent, the
reference Block norm, model/unet.py:209) followed by an unfused SiLU.
The Pallas kernel math runs in interpreter mode on the CPU test mesh
(use_pallas=True off-TPU => interpret); the XLA fallback path is what
CPU training/tests actually execute.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from viewfusion_tpu.ops.groupnorm import group_norm_act


def _flax_oracle(x, scale, bias, groups, eps, act):
    mod = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=jnp.float32)
    y = mod.apply({"params": {"scale": scale, "bias": bias}}, x)
    return y * jax.nn.sigmoid(y) if act == "silu" else y


def _rand(rng, shape, dtype=np.float32):
    return jnp.asarray(rng.normal(1.5, 2.0, shape).astype(dtype))


SHAPES = [
    # (B, H, W, C, groups) — includes non-128 lanes and tiny groups
    (3, 8, 8, 32, 8),
    (2, 16, 16, 64, 32),
    (4, 4, 4, 48, 8),
    (2, 5, 7, 24, 4),  # odd spatial dims (L not a sublane multiple)
]


@pytest.mark.parametrize("act", ["none", "silu"])
@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("use_pallas", [False, True, "hybrid"])
def test_forward_matches_flax(rng, shape, act, use_pallas):
    b, h, w, c, g = shape
    x = _rand(rng, (b, h, w, c))
    scale = _rand(rng, (c,))
    bias = _rand(rng, (c,))
    got = group_norm_act(x, scale, bias, groups=g, eps=1e-5, act=act,
                         use_pallas=use_pallas)
    want = _flax_oracle(x, scale, bias, g, 1e-5, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("act", ["none", "silu"])
@pytest.mark.parametrize("use_pallas", [False, True, "hybrid"])
def test_gradients_match_flax(rng, act, use_pallas):
    b, h, w, c, g = 2, 8, 8, 32, 8
    x = _rand(rng, (b, h, w, c))
    scale = _rand(rng, (c,))
    bias = _rand(rng, (c,))
    # weighted sum so the cotangent isn't uniform
    wgt = _rand(rng, (b, h, w, c))

    def loss_fused(x_, s_, b_):
        y = group_norm_act(x_, s_, b_, groups=g, act=act,
                           use_pallas=use_pallas)
        return jnp.sum(y * wgt)

    def loss_oracle(x_, s_, b_):
        return jnp.sum(_flax_oracle(x_, s_, b_, g, 1e-5, act) * wgt)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2))(x, scale, bias)
    for gv, wv, name in zip(got, want, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(wv), atol=1e-3, rtol=1e-3,
            err_msg=name,
        )


@pytest.mark.parametrize("act", ["none", "silu"])
@pytest.mark.parametrize("shape", SHAPES)
def test_dot_impl_matches_flax(rng, shape, act, monkeypatch):
    """The VF_GN_IMPL=dot escape hatch (split lane-friendly reduction;
    measured slower than flax on v5e but kept selectable)."""
    monkeypatch.setenv("VF_GN_IMPL", "dot")
    b, h, w, c, g = shape
    x = _rand(rng, (b, h, w, c))
    scale = _rand(rng, (c,))
    bias = _rand(rng, (c,))
    got = group_norm_act(x, scale, bias, groups=g, eps=1e-5, act=act)
    want = _flax_oracle(x, scale, bias, g, 1e-5, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    wgt = _rand(rng, (b, h, w, c))
    got_g = jax.grad(
        lambda x_, s_, b_: jnp.sum(
            group_norm_act(x_, s_, b_, groups=g, act=act) * wgt
        ),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    want_g = jax.grad(
        lambda x_, s_, b_: jnp.sum(
            _flax_oracle(x_, s_, b_, g, 1e-5, act) * wgt
        ),
        argnums=(0, 1, 2),
    )(x, scale, bias)
    for gv, wv, name in zip(got_g, want_g, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                                   atol=1e-3, rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("use_pallas", [False, True, "hybrid"])
def test_bfloat16_io(rng, use_pallas):
    b, h, w, c, g = 2, 8, 8, 32, 8
    x32 = _rand(rng, (b, h, w, c))
    scale = _rand(rng, (c,))
    bias = _rand(rng, (c,))
    y16 = group_norm_act(x32.astype(jnp.bfloat16), scale, bias, groups=g,
                         act="silu", use_pallas=use_pallas)
    assert y16.dtype == jnp.bfloat16
    want = _flax_oracle(x32, scale, bias, g, 1e-5, "silu")
    np.testing.assert_allclose(
        np.asarray(y16, dtype=np.float32), np.asarray(want),
        atol=0.15, rtol=0.1,
    )


def test_jit_and_vmap_compose(rng):
    b, h, w, c, g = 2, 4, 4, 16, 4
    x = _rand(rng, (b, h, w, c))
    scale, bias = jnp.ones((c,)), jnp.zeros((c,))
    f = jax.jit(lambda x_: group_norm_act(x_, scale, bias, groups=g,
                                          act="silu"))
    np.testing.assert_allclose(
        np.asarray(f(x)),
        np.asarray(_flax_oracle(x, scale, bias, g, 1e-5, "silu")),
        atol=2e-5, rtol=2e-5,
    )


def test_invalid_args(rng):
    x = _rand(rng, (1, 4, 4, 10))
    with pytest.raises(ValueError, match="divisible"):
        group_norm_act(x, jnp.ones(10), jnp.zeros(10), groups=4)
    x = _rand(rng, (1, 4, 4, 8))
    with pytest.raises(ValueError, match="unsupported act"):
        group_norm_act(x, jnp.ones(8), jnp.zeros(8), groups=4, act="gelu")


def test_unet_param_tree_unchanged(tiny_config):
    """The fused norm must keep GroupNorm_0/{scale,bias} paths so round-1
    checkpoints and torch_convert keep loading."""
    from viewfusion_tpu.models.view_fusion import ViewFusion

    model = ViewFusion.from_config(tiny_config)
    hw = tiny_config.unet.image_size
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2, hw, hw, 3)), jnp.zeros((1, hw, hw, 3)),
    )
    flat = {"/".join(str(k.key) for k in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    gn_paths = [p for p in flat if "GroupNorm_0" in p]
    assert gn_paths, "no GroupNorm_0 params found"
    assert all(p.endswith("scale") or p.endswith("bias") for p in gn_paths)


def test_bwd_v1_v2_equivalent(rng):
    """The r4 backward rewrite (_bwd_kernel_v2: multi-sample blocks,
    derived a/b reductions, scratch instead of recompute) must produce
    the same gradients as the r3 kernel it replaces (VF_GN_BWD=v1
    escape hatch).  Shapes chosen so the v2 block batch is > 1 (small
    L x C) AND == 1 (large L), plus a fold case (C < 128)."""
    from viewfusion_tpu.ops.groupnorm import _pallas_bwd

    for b, l, c, g in [(8, 8, 320, 32), (2, 512, 192, 32),
                       (6, 16, 64, 32)]:
        x = _rand(rng, (b, l, c))
        gy = _rand(rng, (b, l, c))
        scale = _rand(rng, (c,)) + 1.0
        bias = _rand(rng, (c,))
        mean = _rand(rng, (b, 1, g))
        rstd = jnp.abs(_rand(rng, (b, 1, g))) + 0.5
        outs = {}
        for ver in ("v1", "v2"):
            outs[ver] = _pallas_bwd(x, scale, bias, mean, rstd, gy,
                                    g, 1e-5, "silu", True, version=ver)
        for a, b_ in zip(outs["v1"], outs["v2"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-4, rtol=1e-4)


def test_bwd_v3_layout_native_equivalent(rng):
    """The rank-4 layout-native backward (_bwd_kernel_v3, fed NHWC
    directly) must match the rank-3 v2 kernel it re-expresses.  The 4-D
    boundary exists to shed the conv-layout <-> row-major copies the
    round-4 trace measured around the 3-D pallas boundary
    (RESIDUAL_r04.json: 19.2 ms/step of layout copies)."""
    from viewfusion_tpu.ops.groupnorm import _pallas_bwd, _pallas_bwd4

    for b, h, w, c, g in [(3, 4, 4, 128, 32), (2, 8, 4, 256, 32)]:
        x4 = _rand(rng, (b, h, w, c))
        g4 = _rand(rng, (b, h, w, c))
        scale = _rand(rng, (c,)) + 1.0
        bias = _rand(rng, (c,))
        mean = _rand(rng, (b, 1, g))
        rstd = jnp.abs(_rand(rng, (b, 1, g))) + 0.5
        dx3, ds3, db3 = _pallas_bwd(
            x4.reshape(b, h * w, c), scale, bias, mean, rstd,
            g4.reshape(b, h * w, c), g, 1e-5, "silu", True, version="v2")
        dx4, ds4, db4 = _pallas_bwd4(
            x4, scale, bias, mean, rstd, g4, g, 1e-5, "silu", True)
        np.testing.assert_allclose(np.asarray(dx4).reshape(b, h * w, c),
                                   np.asarray(dx3), atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(ds4), np.asarray(ds3),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(db4), np.asarray(db3),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("act", ["none", "silu"])
def test_hybrid_4d_boundary_matches_flax(rng, act, monkeypatch):
    """group_norm_act on a lane-filling NHWC input routes the hybrid
    impl through the 4-D custom_vjp (_gn_act_hybrid4) when opted in
    (VF_GN_BOUNDARY=4d; default is 3d per GN_BOUNDARY_AB_r05.json);
    forward and all three gradients must still match the flax oracle."""
    b, h, w, c, g = 2, 4, 4, 128, 32
    x = _rand(rng, (b, h, w, c))
    scale = _rand(rng, (c,)) + 1.0
    bias = _rand(rng, (c,))

    monkeypatch.setenv("VF_GN_BOUNDARY", "4d")
    from viewfusion_tpu.ops.groupnorm import _use_4d_boundary
    assert _use_4d_boundary(x)

    def f_new(x, s, b_):
        return (group_norm_act(x, s, b_, groups=g, eps=1e-5, act=act,
                               use_pallas="hybrid") ** 2).sum()

    def f_ref(x, s, b_):
        return (_flax_oracle(x, s, b_, g, 1e-5, act) ** 2).sum()

    y_new = group_norm_act(x, scale, bias, groups=g, eps=1e-5, act=act,
                           use_pallas="hybrid")
    y_ref = _flax_oracle(x, scale, bias, g, 1e-5, act)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-4)
    gn = jax.grad(f_new, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gn, gr):
        scale_ = float(jnp.max(jnp.abs(b_))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale_,
                                   np.asarray(b_) / scale_,
                                   atol=3e-5, rtol=3e-4)


def test_gn_boundary_env_escape_hatch(rng, monkeypatch):
    """The 3-D boundary is the measured default (GN_BOUNDARY_AB_r05:
    4-D regresses the flagship step 13%); VF_GN_BOUNDARY=4d is the
    opt-in for re-measurement (scripts/ab_gn_boundary.py)."""
    from viewfusion_tpu.ops import groupnorm as gnmod

    x = _rand(rng, (2, 4, 4, 128))
    monkeypatch.delenv("VF_GN_BOUNDARY", raising=False)
    assert not gnmod._use_4d_boundary(x)  # default: 3-D
    monkeypatch.setenv("VF_GN_BOUNDARY", "3d")
    assert not gnmod._use_4d_boundary(x)
    monkeypatch.setenv("VF_GN_BOUNDARY", "4d")
    assert gnmod._use_4d_boundary(x)
    # narrow channels / non-4D never take the 4-D boundary even opted in
    assert not gnmod._use_4d_boundary(_rand(rng, (2, 4, 4, 64)))
    assert not gnmod._use_4d_boundary(_rand(rng, (2, 16, 128)))
