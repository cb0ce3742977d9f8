#!/usr/bin/env python
"""Export LPIPS-VGG weights to the .npz layout viewfusion_tpu.ops.lpips
expects.  Run on any machine with torchvision + lpips installed (this
zero-egress image has neither):

    python scripts/convert_lpips_weights.py ~/.cache/viewfusion_tpu/lpips_vgg.npz

Layout: conv{i}_w (kh, kw, in, out) / conv{i}_b for the 13 VGG16 convs in
order; lin{s}_w (1, 1, C, 1) for the 5 LPIPS linear heads.
"""

import sys

import numpy as np


def main(out_path: str) -> None:
    import lpips as lpips_pkg
    import torchvision

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features.eval()
    out = {}
    conv_idx = 0
    for layer in vgg:
        import torch.nn as nn

        if isinstance(layer, nn.Conv2d):
            out[f"conv{conv_idx}_w"] = (
                layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            )
            out[f"conv{conv_idx}_b"] = layer.bias.detach().numpy()
            conv_idx += 1
    assert conv_idx == 13, conv_idx

    net = lpips_pkg.LPIPS(net="vgg").eval()
    for s, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{s}_w"] = w.transpose(2, 3, 1, 0)  # -> (1, 1, C, 1)

    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz")
