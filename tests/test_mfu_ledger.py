"""Pin the MFU-ledger inventory (scripts/bench_mfu_ledger.py).

The on-chip accounting is only as good as its op classification: if a
conv is mislabeled or dropped, the per-category sums silently lie.
These tests trace the EXACT flagship train step on CPU and assert the
structural invariants the ledger's conclusions rest on, plus a FLOP
cross-check against bench.py's independent analytic topology walk.
"""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def ledger_cats():
    # On TPU the GroupNorm dispatch resolves to "hybrid" (XLA forward +
    # Pallas analytic backward); CPU defaults to flax, which would trace
    # a graph WITHOUT the gn_bwd category the on-chip ledger accounts.
    # Pin the TPU graph shape (interpret-mode Pallas traces fine here).
    old = os.environ.get("VF_GN_IMPL")
    os.environ["VF_GN_IMPL"] = "hybrid"
    try:
        spec = importlib.util.spec_from_file_location(
            "bench_mfu_ledger", os.path.join(REPO, "scripts",
                                             "bench_mfu_ledger.py"))
        led = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(led)
        ts, shapes, tx, args = led.build_train_step()
        return led, led.inventory(ts, shapes, tx, args)
    finally:
        if old is None:
            os.environ.pop("VF_GN_IMPL", None)
        else:
            os.environ["VF_GN_IMPL"] = old


def test_every_conv_classified(ledger_cats):
    _, cats = ledger_cats
    assert "conv_other" not in cats, (
        "a conv matched none of the fwd/dgrad/wgrad dimension-number "
        "patterns — the ledger's categories would under-count")


def test_conv_counts_balance(ledger_cats):
    """Autodiff structure: every fwd conv has a wgrad twin; every fwd
    conv except the stem (whose input carries no gradient) has a
    dgrad twin."""
    _, cats = ledger_cats
    n_fwd = sum(e["count"] for e in cats["conv_fwd"].values())
    n_wgrad = sum(e["count"] for e in cats["conv_wgrad"].values())
    n_dgrad = sum(e["count"] for e in cats["conv_dgrad"].values())
    assert n_fwd == n_wgrad
    assert n_dgrad == n_fwd - 1


def test_gn_bwd_present(ledger_cats):
    """The hybrid GroupNorm ships with a Pallas analytic backward; it
    must appear in the traced step or the ledger misses a category."""
    _, cats = ledger_cats
    assert sum(e["count"] for e in cats["gn_bwd"].values()) > 0


def test_flops_cross_check_vs_analytic(ledger_cats):
    """Traced fwd-conv+attention FLOPs must agree with bench.py's
    independent analytic walk of the UNet topology (same tolerance
    class bench.py applies to XLA's own cost analysis)."""
    import bench
    from viewfusion_tpu.config import Config

    _, cats = ledger_cats
    cfg = Config.from_dict(bench.FLAGSHIP)
    rows = cfg.data.batch_size * (cfg.data.max_views + 1) // 2
    analytic_fwd = bench.unet_flops_per_row(cfg.unet) * rows

    traced_fwd = sum(e["count"] * e["flops"]
                     for e in cats["conv_fwd"].values())
    # attention fwd dots are the bf16 rank-3 QK/AV pairs
    traced_fwd += sum(
        e["count"] * e["flops"] for e in cats["dot"].values()
        if len(e["in_shapes"][0]) == 3 and
        e["in_dtypes"][0].name == "bfloat16")
    # analytic includes qkv/out 1x1 convs + attention einsums; traced
    # fwd should land within 15% (analytic ignores norms, FWA dots)
    assert abs(traced_fwd - analytic_fwd) / analytic_fwd < 0.15, (
        f"traced {traced_fwd / 1e9:.1f} GF vs analytic "
        f"{analytic_fwd / 1e9:.1f} GF")

    total = sum(e["count"] * e["flops"]
                for sigs in cats.values() for e in sigs.values())
    # train step ~= 3x forward (bench.py's step model)
    assert 2.5 * analytic_fwd < total < 3.6 * analytic_fwd


def test_backward_flops_balance(ledger_cats):
    """Every fwd MAC has exactly one wgrad MAC and (except the stem,
    whose input carries no gradient) one dgrad MAC.  This catches
    lowering-artifact overcounts — e.g. dgrad of a stride-2 conv is an
    lhs-dilated conv where 3/4 of taps are structural zeros; counting
    them once reported >peak TFLOP/s on the chip."""
    _, cats = ledger_cats

    def tot(cat):
        return sum(e["count"] * e["flops"] for e in cats[cat].values())

    fwd, wgrad, dgrad = tot("conv_fwd"), tot("conv_wgrad"), tot("conv_dgrad")
    stem = next(e["flops"] for e in cats["conv_fwd"].values()
                if e["in_shapes"][0][3] == 6)  # 6-channel input = stem
    assert abs(wgrad - fwd) / fwd < 1e-6
    assert abs(dgrad - (fwd - stem)) / fwd < 1e-6


def test_conv_flops_formula(ledger_cats):
    """conv_flops must reduce to 2*H*W*R*k*k*Cin*Cout on a known fwd
    conv regardless of layout bookkeeping."""
    _, cats = ledger_cats
    for e in cats["conv_fwd"].values():
        (r, h, w, cin), (kh, kw, cin2, cout) = e["in_shapes"]
        if (h, w, cin, cout, kh) == (64, 64, 64, 64, 3):
            stride_out = e["out_shape"]
            expect = 2.0 * r * stride_out[1] * stride_out[2] * 9 * 64 * 64
            assert abs(e["flops"] - expect) / expect < 1e-6
            return
    pytest.skip("64px 64->64 conv not found in this topology")
