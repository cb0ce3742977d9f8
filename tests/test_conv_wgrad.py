"""conv3x3 weight-gradient kernel vs jax.grad of lax.conv (oracle).

The kernel itself is a documented measured-negative exploration on the
shapes that dominate the UNet (docs/DESIGN.md "Performance accounting");
it stays in-tree, correct and selectable, like the other kernel
experiments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viewfusion_tpu.ops.conv_wgrad import conv3x3, conv3x3_wgrad


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 4, 8),
    (3, 5, 7, 6, 4),    # odd spatial dims
    (1, 16, 16, 8, 8),
    (2, 4, 4, 3, 5),    # non-lane-multiple channels
])
def test_wgrad_matches_conv_grad(rng, shape):
    b, h, w, cin, cout = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((b, h, w, cout)).astype(np.float32))
    w0 = jnp.zeros((3, 3, cin, cout), jnp.float32)
    want = jax.grad(lambda ww: jnp.vdot(_conv(x, ww), g))(w0)
    got = conv3x3_wgrad(x, g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_custom_vjp_matches_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    k = jnp.asarray(
        rng.standard_normal((3, 3, 4, 8)).astype(np.float32) * 0.1
    )
    t = jnp.asarray(rng.standard_normal((2, 8, 8, 8)).astype(np.float32))

    def f_ref(x_, k_):
        return jnp.sum((_conv(x_, k_) - t) ** 2)

    def f_new(x_, k_):
        return jnp.sum((conv3x3(x_, k_, "pallas-interpret") - t) ** 2)

    gr = jax.grad(f_ref, argnums=(0, 1))(x, k)
    gn = jax.grad(f_new, argnums=(0, 1))(x, k)
    for a, b_ in zip(gr, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)

    # forward values identical (both run the same XLA conv)
    np.testing.assert_array_equal(
        np.asarray(_conv(x, k)), np.asarray(conv3x3(x, k, "xla"))
    )
