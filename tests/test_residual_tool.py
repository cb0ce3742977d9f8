"""Pin the trace-attribution parser (scripts/residual_breakdown.py).

The in-context residual attribution is only as good as its HLO
instruction index: a computation whose header fails to parse drops
every instruction it defines into "unmatched", silently un-attributing
device time.  The regression this guards: while-body computations take
a TUPLE-typed carry parameter whose nested parens broke the old
header regex, so a scanned chain segment's entire per-step body went
unindexed (measured: 49% of the trace binned "unmatched").
"""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tool():
    spec = importlib.util.spec_from_file_location(
        "residual_breakdown",
        os.path.join(REPO, "scripts", "residual_breakdown.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_HLO = """\
HloModule jit_seg, entry_computation_layout={...}

%fused_computation.1 (param_0.1: bf16[8,64,64,3]) -> bf16[8,64,64,3] {
  %param_0.1 = bf16[8,64,64,3]{3,2,1,0} parameter(0)
  %convert.5 = f32[8,64,64,3]{3,2,1,0} convert(%param_0.1)
  %constant.9 = f32[] constant(2)
  %broadcast.3 = f32[8,64,64,3]{3,2,1,0} broadcast(%constant.9), dimensions={}
  %multiply.7 = f32[8,64,64,3]{3,2,1,0} multiply(%convert.5, %broadcast.3)
  ROOT %convert.6 = bf16[8,64,64,3]{3,2,1,0} convert(%multiply.7)
}

%region_0.77 (arg_tuple.1: (bf16[8,64,64,3], u32[2], s32[])) -> (bf16[8,64,64,3], u32[2], s32[]) {
  %arg_tuple.1 = (bf16[8,64,64,3]{3,2,1,0}, u32[2]{0}, s32[]) parameter(0)
  %get-tuple-element.1 = bf16[8,64,64,3]{3,2,1,0} get-tuple-element(%arg_tuple.1), index=0
  %fusion.42 = bf16[8,64,64,3]{3,2,1,0} fusion(%get-tuple-element.1), kind=kLoop, calls=%fused_computation.1
  %copy.7 = bf16[8,64,64,3]{0,3,2,1} copy(%fusion.42)
  %get-tuple-element.2 = u32[2]{0} get-tuple-element(%arg_tuple.1), index=1
  %get-tuple-element.3 = s32[] get-tuple-element(%arg_tuple.1), index=2
  ROOT %tuple.9 = (bf16[8,64,64,3]{3,2,1,0}, u32[2]{0}, s32[]) tuple(%copy.7, %get-tuple-element.2, %get-tuple-element.3)
}

%cond.5 (arg_tuple.2: (bf16[8,64,64,3], u32[2], s32[])) -> pred[] {
  %arg_tuple.2 = (bf16[8,64,64,3]{3,2,1,0}, u32[2]{0}, s32[]) parameter(0)
  %get-tuple-element.4 = s32[] get-tuple-element(%arg_tuple.2), index=2
  %constant.3 = s32[] constant(250)
  ROOT %compare.1 = pred[] compare(%get-tuple-element.4, %constant.3), direction=LT
}

ENTRY %main.99 (p0.1: bf16[8,64,64,3], p1.1: u32[2]) -> bf16[8,64,64,3] {
  %p0.1 = bf16[8,64,64,3]{3,2,1,0} parameter(0)
  %p1.1 = u32[2]{0} parameter(1)
  %constant.1 = s32[] constant(0)
  %tuple.1 = (bf16[8,64,64,3]{3,2,1,0}, u32[2]{0}, s32[]) tuple(%p0.1, %p1.1, %constant.1)
  %while.4 = (bf16[8,64,64,3]{3,2,1,0}, u32[2]{0}, s32[]) while(%tuple.1), condition=%cond.5, body=%region_0.77
  ROOT %get-tuple-element.9 = bf16[8,64,64,3]{3,2,1,0} get-tuple-element(%while.4), index=0
}
"""


def test_while_body_instructions_indexed(tool):
    ins = tool.parse_hlo(_HLO)
    # the regression: tuple-typed while-carry param must not drop the body
    assert "fusion.42" in ins, "while-body fusion not indexed"
    assert "copy.7" in ins
    assert ins["fusion.42"]["opcode"] == "fusion"
    # fusion body resolved through calls=
    assert ins["fusion.42"]["body"].get("multiply") == 1


def test_wrapper_and_entry_present(tool):
    ins = tool.parse_hlo(_HLO)
    assert ins["while.4"]["opcode"] == "while"
    assert "tuple.1" in ins  # entry instruction


def test_classification_of_body_ops(tool):
    ins = tool.parse_hlo(_HLO)
    assert tool.classify("copy.7", ins["copy.7"]) == "layout_copy"
    # elementwise-only fusion body
    assert tool.classify("fusion.42", ins["fusion.42"]) \
        == "elementwise_other"
