"""Convert reference (PyTorch) ViewFusion checkpoints to this framework.

The reference distributes pretrained weights as a torch checkpoint
(``best_model_all.pt`` via HuggingFace, fetch_pretrained.sh;
payload = {"model": state_dict, "optimizer": ..., it/t/run_id/ssim/psnr},
utils/checkpoint.py:31-47).  This module maps every torch parameter of
the reference UNet (model/unet.py) onto the corresponding Flax NHWC
parameter so the pretrained model runs natively on TPU:

  * Conv2d   (O, I, kh, kw) -> (kh, kw, I, O)
  * Linear   (O, I)         -> (I, O)
  * GroupNorm weight/bias   -> scale/bias

Schedule buffers (gammas etc., model/view_fusion.py:50-68) are NOT
copied — they are recomputed exactly from the config's beta schedule.

CLI:  python -m viewfusion_tpu.utils.torch_convert model.pt out_dir/
writes ``best_model_all.msgpack`` + ``config.yaml`` usable with
``main.py -s out_dir -e`` / ``-i``.
"""

from __future__ import annotations

import sys
from typing import Any, Dict

import numpy as np

from viewfusion_tpu.config import Config, UNetConfig

__all__ = ["convert_unet_state_dict", "convert_checkpoint_file"]


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def _block(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """Torch ``Block``: GroupNorm @ .block.0, Conv @ .block.3
    (model/unet.py:207-218)."""
    return {
        "GroupNorm_0": {
            "scale": sd[f"{prefix}.block.0.weight"],
            "bias": sd[f"{prefix}.block.0.bias"],
        },
        "Conv_0": {
            "kernel": _conv(sd[f"{prefix}.block.3.weight"]),
            "bias": sd[f"{prefix}.block.3.bias"],
        },
    }


def _resnet_block(sd, prefix: str) -> Dict[str, Any]:
    out = {
        "Block_0": _block(sd, f"{prefix}.block1"),
        "Block_1": _block(sd, f"{prefix}.block2"),
        "FeatureWiseAffine_0": {
            "noise_func": {
                "kernel": _linear(sd[f"{prefix}.noise_func.noise_func.0.weight"]),
                "bias": sd[f"{prefix}.noise_func.noise_func.0.bias"],
            }
        },
    }
    if f"{prefix}.res_conv.weight" in sd:
        out["res_conv"] = {
            "kernel": _conv(sd[f"{prefix}.res_conv.weight"]),
            "bias": sd[f"{prefix}.res_conv.bias"],
        }
    return out


def _attn(sd, prefix: str) -> Dict[str, Any]:
    return {
        "GroupNorm_0": {
            "scale": sd[f"{prefix}.norm.weight"],
            "bias": sd[f"{prefix}.norm.bias"],
        },
        "qkv": {"kernel": _conv(sd[f"{prefix}.qkv.weight"])},
        "out": {
            "kernel": _conv(sd[f"{prefix}.out.weight"]),
            "bias": sd[f"{prefix}.out.bias"],
        },
    }


def _block_with_attn(sd, prefix: str) -> Dict[str, Any]:
    out = {"ResnetBlock_0": _resnet_block(sd, f"{prefix}.res_block")}
    if f"{prefix}.attn.norm.weight" in sd:
        out["SelfAttention_0"] = _attn(sd, f"{prefix}.attn")
    return out


def convert_unet_state_dict(
    sd: Dict[str, np.ndarray], cfg: UNetConfig, prefix: str = "denoise_fn."
) -> Dict[str, Any]:
    """Map the reference UNet state_dict to this framework's Flax params
    tree (module naming established in viewfusion_tpu/models/unet.py)."""
    sd = {
        k[len(prefix):]: np.asarray(v)
        for k, v in sd.items()
        if k.startswith(prefix)
    }
    p: Dict[str, Any] = {}

    p["noise_mlp_0"] = {
        "kernel": _linear(sd["noise_level_mlp.0.weight"]),
        "bias": sd["noise_level_mlp.0.bias"],
    }
    p["noise_mlp_1"] = {
        "kernel": _linear(sd["noise_level_mlp.2.weight"]),
        "bias": sd["noise_level_mlp.2.bias"],
    }
    p["stem"] = {
        "kernel": _conv(sd["downs.0.weight"]),
        "bias": sd["downs.0.bias"],
    }

    num_mults = len(cfg.channel_mults)
    # encoder ordering mirrors model/unet.py:42-64
    idx = 1
    for ind in range(num_mults):
        for blk in range(cfg.res_blocks):
            p[f"down_{ind}_{blk}"] = _block_with_attn(sd, f"downs.{idx}")
            idx += 1
        if ind != num_mults - 1:
            p[f"downsample_{ind}"] = {
                "Conv_0": {
                    "kernel": _conv(sd[f"downs.{idx}.conv.weight"]),
                    "bias": sd[f"downs.{idx}.conv.bias"],
                }
            }
            idx += 1

    p["mid_0"] = _block_with_attn(sd, "mid.0")
    p["mid_1"] = _block_with_attn(sd, "mid.1")

    # decoder ordering mirrors model/unet.py:87-108
    idx = 0
    for ind in reversed(range(num_mults)):
        for blk in range(cfg.res_blocks + 1):
            p[f"up_{ind}_{blk}"] = _block_with_attn(sd, f"ups.{idx}")
            idx += 1
        if ind >= 1:
            p[f"upsample_{ind}"] = {
                "Conv_0": {
                    "kernel": _conv(sd[f"ups.{idx}.conv.weight"]),
                    "bias": sd[f"ups.{idx}.conv.bias"],
                }
            }
            idx += 1

    p["final_conv"] = _block(sd, "final_conv")
    return {"params": p}


def convert_checkpoint_file(pt_path: str, out_dir: str,
                            config: Config) -> str:
    """Convert a reference .pt checkpoint into ``out_dir``;
    returns the msgpack path."""
    import torch

    from viewfusion_tpu.training.checkpoint import Checkpoint

    payload = torch.load(pt_path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in payload["model"].items()}
    params = convert_unet_state_dict(sd, config.unet)

    ckpt = Checkpoint(out_dir, config_yaml=config.to_yaml())
    extra = {
        k: (float(v) if hasattr(v, "__float__") else v)
        for k, v in payload.items()
        if k not in ("model", "optimizer")
    }
    # Params-only checkpoint: loadable for eval/inference.  (Optimizer
    # moments are torch-Adam state; a fresh optax state is used if
    # training is resumed from converted weights.)
    ckpt.save("best_model_all.msgpack", {"params": params}, **extra)
    return f"{out_dir}/best_model_all.msgpack"


def main(argv=None) -> None:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2:
        print("usage: python -m viewfusion_tpu.utils.torch_convert "
              "<checkpoint.pt> <out_dir> [config.yaml]")
        raise SystemExit(2)
    pt_path, out_dir = argv[0], argv[1]
    if len(argv) > 2:
        from viewfusion_tpu.config import load_config

        config = load_config(argv[2])
    else:
        # paper "small" config (configs/small-v100-4.yaml)
        import yaml

        with open("configs/small-tpu-4.yaml") as f:
            config = Config.from_dict(yaml.safe_load(f))
    print("wrote", convert_checkpoint_file(pt_path, out_dir, config))


if __name__ == "__main__":
    main()
