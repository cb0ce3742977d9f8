"""Masked static-layout view composition must be semantically identical to
the reference's ragged pad_sequence(-inf)+softmax path
(model/view_fusion.py:244-296).  Oracle below re-implements the ragged
semantics in pure numpy (independently, not via torch)."""

import numpy as np
import jax
import jax.numpy as jnp

from viewfusion_tpu.models.view_fusion import view_mask


def _ragged_oracle(unet_out, view_count, weighting):
    """Numpy re-implementation of the ragged reference composition.

    unet_out: (B, N, H, W, 6) where per sample only the first view_count[i]
    rows are meaningful.  Returns noise_hat (B, H, W, 3).
    """
    b, n = unet_out.shape[:2]
    outs = []
    for i in range(b):
        v = view_count[i]
        rows = unet_out[i, :v]  # (v, H, W, 6)
        noise = rows[..., :3]
        if weighting:
            logits = rows[..., 3:]
            # softmax over the view axis, per pixel/channel
            z = logits - logits.max(axis=0, keepdims=True)
            w = np.exp(z) / np.exp(z).sum(axis=0, keepdims=True)
            outs.append((noise * w).sum(axis=0))
        else:
            outs.append(noise.mean(axis=0))
    return np.stack(outs)


def _compose(unet_out, view_count, weighting):
    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion

    model = ViewFusion.from_config(Config.from_dict(
        {"tpu": {"compute_dtype": "float32"}}))
    mask = view_mask(jnp.asarray(view_count), unet_out.shape[1])
    return model.compose(jnp.asarray(unet_out), mask, weighting)


def test_weighted_composition_matches_ragged(rng):
    b, n, h, w = 5, 6, 4, 4
    unet_out = rng.standard_normal((b, n, h, w, 6)).astype(np.float32)
    view_count = np.array([1, 2, 3, 6, 4])
    noise_hat, logits, weights = _compose(unet_out, view_count, True)
    expected = _ragged_oracle(unet_out, view_count, True)
    np.testing.assert_allclose(np.asarray(noise_hat), expected, atol=1e-5)
    # masked views must get exactly zero weight
    wnp = np.asarray(weights)
    for i, v in enumerate(view_count):
        np.testing.assert_array_equal(wnp[i, v:], 0.0)
        np.testing.assert_allclose(wnp[i, :v].sum(axis=0), 1.0, atol=1e-5)


def test_mean_ablation_matches_ragged(rng):
    b, n, h, w = 4, 5, 4, 4
    unet_out = rng.standard_normal((b, n, h, w, 6)).astype(np.float32)
    view_count = np.array([1, 5, 2, 3])
    noise_hat, logits, weights = _compose(unet_out, view_count, False)
    assert logits is None and weights is None
    expected = _ragged_oracle(unet_out, view_count, False)
    np.testing.assert_allclose(np.asarray(noise_hat), expected, atol=1e-5)


def test_single_view_gets_weight_one(rng):
    """Reference pads with -inf => softmax over one valid view gives 1.0
    (SURVEY.md §7 hard parts)."""
    unet_out = rng.standard_normal((2, 4, 2, 2, 6)).astype(np.float32)
    _, _, weights = _compose(unet_out, np.array([1, 1]), True)
    np.testing.assert_allclose(np.asarray(weights)[:, 0], 1.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(weights)[:, 1:], 0.0)


def test_masked_views_get_zero_gradient(rng):
    """Gradients wrt masked view rows must vanish — the static layout may
    not leak padding into training."""
    from viewfusion_tpu.config import Config
    from viewfusion_tpu.models.view_fusion import ViewFusion, view_mask

    model = ViewFusion.from_config(Config.from_dict(
        {"tpu": {"compute_dtype": "float32"}}))
    unet_out = jnp.asarray(
        rng.standard_normal((2, 4, 2, 2, 6)).astype(np.float32))
    view_count = jnp.array([2, 3])
    mask = view_mask(view_count, 4)

    def loss(out):
        noise_hat, _, _ = model.compose(out, mask, True)
        return jnp.sum(noise_hat**2)

    g = np.asarray(jax.grad(loss)(unet_out))
    assert np.all(g[0, 2:] == 0.0)
    assert np.all(g[1, 3:] == 0.0)
    assert np.any(g[0, :2] != 0.0)
    assert np.all(np.isfinite(g))
