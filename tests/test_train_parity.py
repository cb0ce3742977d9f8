"""Training-dynamics parity vs the live torch reference (short run).

The committed artifact TRAINPARITY_r03.json pins a 300-step run; this
test keeps a 15-step version green in CI: identical init/batches/noise/
gamma draws through BOTH stacks' full train step (loss + grad + Adam +
LR schedule).  See scripts/train_parity.py for the mechanism.
"""

import os

import pytest

REF = os.environ.get("VIEWFUSION_REFERENCE", "/root/reference")


@pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "model", "view_fusion.py")),
    reason="reference checkout not available",
)
def test_training_dynamics_match_reference():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from train_parity import run

    result = run(steps=15, b=3, n=3, image=16, T=50, seed=1)
    assert result["first_step_grad_max_abs_err"] < 1e-4
    assert result["loss_max_abs_delta"] < 1e-4
    # 15 Adam updates: parameters still track to float32 noise level
    assert result["final_param_max_abs_delta"] < 1e-3
