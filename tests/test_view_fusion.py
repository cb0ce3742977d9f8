"""End-to-end model tests: q_sample, training loss, scan-based reverse
sampling (reference semantics: model/view_fusion.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from viewfusion_tpu.models.view_fusion import ViewFusion, view_mask


def _model(tiny_config):
    return ViewFusion.from_config(tiny_config)


def _data(rng, b=2, n=3, hw=8, cc=3):
    y0 = rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32)
    cond = rng.uniform(0, 1, (b, n, hw, hw, cc)).astype(np.float32)
    vc = rng.integers(1, n + 1, (b,))
    angle = rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32)
    return jnp.asarray(y0), jnp.asarray(cond), jnp.asarray(vc), jnp.asarray(angle)


def test_q_sample_closed_form(tiny_config, rng):
    model = _model(tiny_config)
    y0 = jnp.asarray(rng.uniform(0, 1, (2, 4, 4, 3)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    g = jnp.asarray([[0.25]], jnp.float32).reshape(2 // 2, 1, 1, 1)
    g = jnp.full((2, 1, 1, 1), 0.25)
    out = model.q_sample(y0, g, noise)
    expected = 0.5 * np.asarray(y0) + np.sqrt(0.75) * np.asarray(noise)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


def test_loss_runs_and_is_deterministic(tiny_config, rng):
    model = _model(tiny_config)
    y0, cond, vc, angle = _data(rng)
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    key = jax.random.PRNGKey(42)
    l1 = model.loss(params, key, y0, cond, vc, angle)
    l2 = model.loss(params, key, y0, cond, vc, angle)
    assert l1.shape == ()
    assert np.isfinite(float(l1))
    assert float(l1) == float(l2)
    l3 = model.loss(params, jax.random.PRNGKey(43), y0, cond, vc, angle)
    assert float(l1) != float(l3)


def test_loss_ignores_masked_views(tiny_config, rng):
    """Changing conditioning views beyond view_count must not change the
    loss — static masked layout == ragged reference semantics."""
    model = _model(tiny_config)
    y0, cond, _, angle = _data(rng)
    vc = jnp.array([1, 2])
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    key = jax.random.PRNGKey(7)
    l1 = model.loss(params, key, y0, cond, vc, angle)
    cond2 = cond.at[0, 1:].set(123.0).at[1, 2:].set(-55.0)
    l2 = model.loss(params, key, y0, cond2, vc, angle)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_gamma_sampling_range(tiny_config, rng):
    """sample_gammas must lie in [gamma_{t-1}, gamma_t) — WaveGrad
    continuous level (model/view_fusion.py:230-237).  Verified indirectly:
    with T timesteps, q_sample inputs stay within schedule envelope."""
    model = _model(tiny_config)
    sched = model.schedule
    g = np.asarray(sched.gammas)
    # brute check on the sampling formula with many draws
    b = 512
    key = jax.random.PRNGKey(0)
    k_t, k_u = jax.random.split(key)
    t = np.asarray(jax.random.randint(k_t, (b,), 1, sched.num_timesteps))
    u = np.asarray(jax.random.uniform(k_u, (b,)))
    samples = (g[t] - g[t - 1]) * u + g[t - 1]
    assert np.all(samples <= g[t - 1]) and np.all(samples >= g[t])
    assert np.all(t >= 1) and np.all(t < sched.num_timesteps)


def test_generate_shapes_and_frames(tiny_config, rng):
    model = _model(tiny_config)
    y0, cond, vc, angle = _data(rng)
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    T = model.schedule.num_timesteps  # 8
    sample_num = 4
    out = jax.jit(
        lambda p, k: model.generate(p, k, cond, vc, angle,
                                    sample_num=sample_num)
    )(params, jax.random.PRNGKey(1))
    inter = T // sample_num
    n_frames = (T - 1) // inter + 1
    b, n, h, w, _ = cond.shape
    assert out.y_t.shape == (b, h, w, 3)
    assert out.ret_arr.shape == (b, n_frames + 1, h, w, 3)
    assert out.logit_arr.shape == (b, n_frames, n, h, w, 3)
    assert out.weight_arr.shape == (b, n_frames, n, h, w, 3)
    np.testing.assert_array_equal(
        np.asarray(out.generated_samples), np.asarray(out.ret_arr[:, -1])
    )
    np.testing.assert_array_equal(
        np.asarray(out.y_t), np.asarray(out.generated_samples)
    )
    assert np.all(np.isfinite(np.asarray(out.ret_arr)))
    # weights over valid views sum to 1; masked views exactly 0
    wsum = np.asarray(out.weight_arr).sum(axis=2)
    np.testing.assert_allclose(wsum, 1.0, atol=1e-4)
    for i, v in enumerate(np.asarray(vc)):
        np.testing.assert_array_equal(np.asarray(out.weight_arr)[i, :, v:], 0.0)


def test_generate_scan_matches_python_loop(tiny_config, rng):
    """The lax.scan chain must match a hand-rolled python loop over
    p_sample with the same keys."""
    model = _model(tiny_config)
    y0, cond, vc, angle = _data(rng)
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    T = model.schedule.num_timesteps
    key = jax.random.PRNGKey(3)

    out = model.generate(params, key, cond, vc, angle, sample_num=4)

    # replicate: same split structure as generate()
    k_init, k_scan = jax.random.split(key)
    y_t = jax.random.normal(k_init, y0.shape, jnp.float32)
    mask = view_mask(vc, cond.shape[1])
    k = k_scan
    for i in range(T - 1, -1, -1):
        k, sub = jax.random.split(k)
        y_t, _, _ = model.p_sample(params, sub, y_t, cond, mask, angle,
                                   jnp.int32(i))
    np.testing.assert_allclose(
        np.asarray(out.y_t), np.asarray(y_t), atol=1e-5
    )


def test_generate_no_weighting(tiny_config, rng):
    import dataclasses

    model = dataclasses.replace(_model(tiny_config),
                                weighting_inference=False)
    y0, cond, vc, angle = _data(rng)
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    out = model.generate(params, jax.random.PRNGKey(1), cond, vc, angle,
                         sample_num=4)
    assert out.logit_arr is None and out.weight_arr is None
    assert np.all(np.isfinite(np.asarray(out.y_t)))


def test_segmented_chain_matches_generate(tiny_config, rng):
    """chain_segment-ed reverse chain (init_chain -> K segments ->
    finalize_chain) must be BIT-identical to one generate() call with
    the same key — same rng stream, same capture schedule."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viewfusion_tpu.models.view_fusion import ViewFusion

    model = ViewFusion.from_config(tiny_config)
    b, n, hw = 2, 3, 8
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(
        rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(np.float32)
    )
    vc = jnp.asarray(np.array([1, 3], np.int32))
    angle = jnp.asarray(rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    key = jax.random.PRNGKey(7)

    ref = model.generate(params, key, cond, vc, angle, sample_num=4)

    T = model.schedule.num_timesteps
    for segs in (2, 3):
        carry = model.init_chain(key, cond, vc, sample_num=4)
        bounds = np.linspace(T, 0, segs + 1).round().astype(int)
        for hi, lo in zip(bounds[:-1], bounds[1:]):
            ts = jnp.arange(int(hi) - 1, int(lo) - 1, -1)
            carry = model.chain_segment(params, carry, ts, cond, vc,
                                        angle, sample_num=4)
        out = model.finalize_chain(carry)
        np.testing.assert_array_equal(np.asarray(ref.y_t),
                                      np.asarray(out.y_t))
        np.testing.assert_array_equal(np.asarray(ref.ret_arr),
                                      np.asarray(out.ret_arr))
        np.testing.assert_array_equal(np.asarray(ref.weight_arr),
                                      np.asarray(out.weight_arr))


def test_chain_bf16_knob_is_bit_identical(tiny_config, rng, monkeypatch):
    """VF_CHAIN_BF16 moves the model-dtype cast from the UNet entry
    (unet.py: x.astype(self.dtype)) to BEFORE the per-view
    gather/concat — the UNet must see bit-identical inputs, so the
    whole chain (and the packed path) must be bit-identical.  Traced
    fresh per call (no jit here), so the trace-time env read is exact."""
    model = ViewFusion.from_config(tiny_config, dtype=jnp.bfloat16)
    assert model.denoise_fn.dtype == jnp.bfloat16  # knob is a no-op otherwise
    b, n, hw = 2, 3, 8
    y0 = jnp.asarray(rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(0, 1, (b, n, hw, hw, 3)).astype(np.float32))
    vc = jnp.asarray(np.array([1, 3], np.int32))
    angle = jnp.asarray(rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), cond, y0)
    key = jax.random.PRNGKey(7)

    sample_idx = jnp.asarray(np.array([0, 1, 1, 1], np.int32))
    view_idx = jnp.asarray(np.array([0, 0, 1, 2], np.int32))

    monkeypatch.setenv("VF_CHAIN_BF16", "0")
    ref = model.generate(params, key, cond, vc, angle, sample_num=4)
    ref_ddim = model.generate_ddim(params, key, cond, vc, angle, num_steps=4)
    ref_packed = model.generate(params, key, cond, vc, angle, sample_num=4,
                                packed_idx=(sample_idx, view_idx))

    monkeypatch.setenv("VF_CHAIN_BF16", "1")
    out = model.generate(params, key, cond, vc, angle, sample_num=4)
    out_ddim = model.generate_ddim(params, key, cond, vc, angle, num_steps=4)
    out_packed = model.generate(params, key, cond, vc, angle, sample_num=4,
                                packed_idx=(sample_idx, view_idx))

    np.testing.assert_array_equal(np.asarray(ref.y_t), np.asarray(out.y_t))
    np.testing.assert_array_equal(np.asarray(ref.ret_arr),
                                  np.asarray(out.ret_arr))
    np.testing.assert_array_equal(np.asarray(ref_ddim), np.asarray(out_ddim))
    np.testing.assert_array_equal(np.asarray(ref_packed.y_t),
                                  np.asarray(out_packed.y_t))
