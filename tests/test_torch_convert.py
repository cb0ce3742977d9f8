"""Torch->Flax checkpoint converter tests (mapping logic only; full
numerical parity vs the live reference is scripts/parity_check.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viewfusion_tpu.config import UNetConfig
from viewfusion_tpu.models.unet import UNet
from viewfusion_tpu.utils.torch_convert import convert_unet_state_dict

CFG = UNetConfig(
    image_size=16, in_channel=6, out_channel=6, inner_channel=8,
    norm_groups=4, channel_mults=(1, 2), attn_res=(8,), res_blocks=2,
)


def _flax_params():
    unet = UNet(config=CFG, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 6))
    return unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)),
                     jnp.ones((1,)))


def _torch_sd_from_flax(params):
    """Inverse-map flax params to a reference-layout torch state dict
    (model/unet.py module ordering)."""
    p = params["params"]
    sd = {}

    def linear(dst, src):
        sd[f"{dst}.weight"] = np.transpose(src["kernel"], (1, 0))
        sd[f"{dst}.bias"] = np.asarray(src["bias"])

    def conv(dst, src, bias=True):
        sd[f"{dst}.weight"] = np.transpose(src["kernel"], (3, 2, 0, 1))
        if bias:
            sd[f"{dst}.bias"] = np.asarray(src["bias"])

    def block(dst, src):
        sd[f"{dst}.block.0.weight"] = np.asarray(src["GroupNorm_0"]["scale"])
        sd[f"{dst}.block.0.bias"] = np.asarray(src["GroupNorm_0"]["bias"])
        conv(f"{dst}.block.3", src["Conv_0"])

    def resblock(dst, src):
        block(f"{dst}.block1", src["Block_0"])
        block(f"{dst}.block2", src["Block_1"])
        linear(f"{dst}.noise_func.noise_func.0",
               src["FeatureWiseAffine_0"]["noise_func"])
        if "res_conv" in src:
            conv(f"{dst}.res_conv", src["res_conv"])

    def bwa(dst, src):
        resblock(f"{dst}.res_block", src["ResnetBlock_0"])
        if "SelfAttention_0" in src:
            a = src["SelfAttention_0"]
            sd[f"{dst}.attn.norm.weight"] = np.asarray(
                a["GroupNorm_0"]["scale"])
            sd[f"{dst}.attn.norm.bias"] = np.asarray(a["GroupNorm_0"]["bias"])
            conv(f"{dst}.attn.qkv", a["qkv"], bias=False)
            conv(f"{dst}.attn.out", a["out"])

    linear("noise_level_mlp.0", p["noise_mlp_0"])
    linear("noise_level_mlp.2", p["noise_mlp_1"])
    conv("downs.0", p["stem"])

    idx = 1
    for ind in range(len(CFG.channel_mults)):
        for blk in range(CFG.res_blocks):
            bwa(f"downs.{idx}", p[f"down_{ind}_{blk}"])
            idx += 1
        if ind != len(CFG.channel_mults) - 1:
            conv(f"downs.{idx}.conv", p[f"downsample_{ind}"]["Conv_0"])
            idx += 1
    bwa("mid.0", p["mid_0"])
    bwa("mid.1", p["mid_1"])
    idx = 0
    for ind in reversed(range(len(CFG.channel_mults))):
        for blk in range(CFG.res_blocks + 1):
            bwa(f"ups.{idx}", p[f"up_{ind}_{blk}"])
            idx += 1
        if ind >= 1:
            conv(f"ups.{idx}.conv", p[f"upsample_{ind}"]["Conv_0"])
            idx += 1
    block("final_conv", p["final_conv"])
    return {f"denoise_fn.{k}": v for k, v in sd.items()}


def test_round_trip_exact():
    params = _flax_params()
    sd = _torch_sd_from_flax(params)
    back = convert_unet_state_dict(sd, CFG)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    paths_a = {jax.tree_util.keystr(k) for k, _ in flat_a}
    paths_b = {jax.tree_util.keystr(k) for k, _ in flat_b}
    assert paths_a == paths_b
    b_map = {jax.tree_util.keystr(k): v for k, v in flat_b}
    for k, v in flat_a:
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(b_map[jax.tree_util.keystr(k)]),
            err_msg=jax.tree_util.keystr(k),
        )


def test_converted_params_run():
    params = _flax_params()
    back = convert_unet_state_dict(_torch_sd_from_flax(params), CFG)
    unet = UNet(config=CFG, dtype=jnp.float32)
    x = jnp.ones((2, 16, 16, 6)) * 0.3
    out_a = unet.apply(params, x, jnp.zeros((2,)), jnp.ones((2,)) * 0.5)
    out_b = unet.apply(back, x, jnp.zeros((2,)), jnp.ones((2,)) * 0.5)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_missing_key_raises():
    sd = _torch_sd_from_flax(_flax_params())
    del sd["denoise_fn.mid.0.res_block.block1.block.0.weight"]
    with pytest.raises(KeyError):
        convert_unet_state_dict(sd, CFG)
