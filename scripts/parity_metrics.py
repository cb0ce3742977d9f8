#!/usr/bin/env python
"""Pin metric parity against the reference's torch formulas.

The reference computes PSNR with its own torch expression
(utils/metrics.py:6-8), SSIM via ``pytorch_msssim.ssim`` with
data_range=1.0 (utils/metrics.py:11-12), and offline LPIPS via the
``lpips`` package's VGG backbone fed [-1,1] images
(utils/compute_metrics.py:34-45).  Those packages aren't in this
zero-egress image, so this script runs the SAME algorithms in torch —
PSNR verbatim; SSIM as pytorch_msssim implements it (11-tap sigma-1.5
separable Gaussian, VALID padding, K=(0.01,0.03)); LPIPS as the lpips
package computes it (ScalingLayer -> VGG16 relu taps -> channel unit
norm -> squared diff -> 1x1 linear -> spatial mean -> stage sum), using
one shared set of RANDOM weights for both frameworks so the computation
graph itself is what's compared.

Writes PARITY_METRICS.json (committed so the evidence is in-repo).

Run: JAX_PLATFORMS=cpu python scripts/parity_metrics.py
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --------------------------------------------------------------------
# torch oracles (reference formulas)
# --------------------------------------------------------------------
def torch_psnr(generated, target):
    """Verbatim reference utils/metrics.py:6-8 (NCHW)."""
    import torch

    mse = torch.mean((generated - target) ** 2, dim=(1, 2, 3))
    return 20 * torch.log10(1.0 / torch.sqrt(mse))


def torch_ssim(x, y, data_range=1.0, win_size=11, win_sigma=1.5):
    """pytorch_msssim.ssim algorithm (Wang et al. 2004) in torch, NCHW:
    separable Gaussian window, VALID padding, per-image mean."""
    import torch
    import torch.nn.functional as F

    coords = torch.arange(win_size, dtype=torch.float64) - win_size // 2
    g = torch.exp(-(coords**2) / (2 * win_sigma**2))
    g = (g / g.sum()).to(torch.float32)
    c = x.shape[1]
    win_h = g.view(1, 1, win_size, 1).repeat(c, 1, 1, 1)
    win_w = g.view(1, 1, 1, win_size).repeat(c, 1, 1, 1)

    def blur(t):
        t = F.conv2d(t, win_h, groups=c)
        return F.conv2d(t, win_w, groups=c)

    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu1, mu2 = blur(x), blur(y)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = blur(x * x) - mu1_sq
    s2 = blur(y * y) - mu2_sq
    s12 = blur(x * y) - mu1_mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    return ssim_map.mean(dim=(1, 2, 3))


class TorchLPIPS:
    """The lpips package's VGG-backbone computation graph in torch,
    parameterized by the same .npz our JAX LPIPS loads."""

    def __init__(self, npz):
        import torch

        self.torch = torch
        self.params = {k: torch.from_numpy(np.asarray(v))
                       for k, v in npz.items()}
        # lpips.ScalingLayer constants
        self.shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        self.scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        self.stages = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]

    def features(self, x):
        import torch.nn.functional as F

        h = (x - self.shift) / self.scale
        feats, idx = [], 0
        for s, (n_convs, _c) in enumerate(self.stages):
            for _ in range(n_convs):
                w = self.params[f"conv{idx}_w"].permute(3, 2, 0, 1)  # HWIO->OIHW
                b = self.params[f"conv{idx}_b"].reshape(-1)
                h = F.relu(F.conv2d(h, w, b, padding=1))
                idx += 1
            feats.append(h)
            if s != len(self.stages) - 1:
                h = F.max_pool2d(h, 2)
        return feats

    def __call__(self, x, y):
        total = 0.0
        for s, (a, b) in enumerate(zip(self.features(x), self.features(y))):
            a = a / (a.pow(2).sum(dim=1, keepdim=True) + 1e-10).sqrt()
            b = b / (b.pow(2).sum(dim=1, keepdim=True) + 1e-10).sqrt()
            d = (a - b) ** 2
            lin = self.params[f"lin{s}_w"].permute(3, 2, 0, 1)
            d = self.torch.nn.functional.conv2d(d, lin)
            total = total + d.mean(dim=(1, 2, 3))
        return total


def random_lpips_npz(path, seed=0):
    """One shared random VGG16+linear weight set (He-scaled)."""
    rng = np.random.default_rng(seed)
    stages = [(2, 64), (2, 128), (3, 256), (3, 512), (3, 512)]
    params = {}
    cin, idx = 3, 0
    for n_convs, cout in stages:
        for _ in range(n_convs):
            fan_in = 3 * 3 * cin
            params[f"conv{idx}_w"] = rng.normal(
                0, np.sqrt(2.0 / fan_in), (3, 3, cin, cout)
            ).astype(np.float32)
            params[f"conv{idx}_b"] = rng.normal(
                0, 0.05, (cout,)
            ).astype(np.float32)
            cin = cout
            idx += 1
    for s, (_n, cout) in enumerate(stages):
        params[f"lin{s}_w"] = rng.uniform(
            0, 0.2, (1, 1, cout, 1)
        ).astype(np.float32)
    np.savez(path, **params)
    return params


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    from viewfusion_tpu.ops.lpips import load_lpips
    from viewfusion_tpu.ops.metrics import compute_psnr, compute_ssim

    rng = np.random.default_rng(0)
    b, hw = 8, 64
    gen = rng.uniform(0, 1, (b, hw, hw, 3)).astype(np.float32)
    tgt = np.clip(
        gen + rng.normal(0, 0.1, gen.shape).astype(np.float32), 0, 1
    )
    gen_t = torch.from_numpy(gen.transpose(0, 3, 1, 2))
    tgt_t = torch.from_numpy(tgt.transpose(0, 3, 1, 2))

    results = {}

    psnr_j = np.asarray(compute_psnr(gen, tgt))
    psnr_t = torch_psnr(gen_t, tgt_t).numpy()
    results["psnr_max_abs_err"] = float(np.abs(psnr_j - psnr_t).max())
    print(f"PSNR  jax {psnr_j.mean():.5f}  torch {psnr_t.mean():.5f}  "
          f"max|d| {results['psnr_max_abs_err']:.2e}")

    ssim_j = np.asarray(compute_ssim(gen, tgt))
    ssim_t = torch_ssim(gen_t, tgt_t).numpy()
    results["ssim_max_abs_err"] = float(np.abs(ssim_j - ssim_t).max())
    print(f"SSIM  jax {ssim_j.mean():.5f}  torch {ssim_t.mean():.5f}  "
          f"max|d| {results['ssim_max_abs_err']:.2e}")

    with tempfile.TemporaryDirectory() as tmp:
        npz_path = os.path.join(tmp, "lpips_rand.npz")
        random_lpips_npz(npz_path)
        npz = dict(np.load(npz_path))
        lp_j = np.asarray(load_lpips(npz_path)(
            (2 * gen - 1), (2 * tgt - 1)
        ))
        with torch.no_grad():
            lp_t = TorchLPIPS(npz)(2 * gen_t - 1, 2 * tgt_t - 1).numpy()
    results["lpips_max_abs_err"] = float(np.abs(lp_j - lp_t).max())
    results["lpips_max_rel_err"] = float(
        (np.abs(lp_j - lp_t) / np.abs(lp_t)).max()
    )
    print(f"LPIPS jax {lp_j.mean():.6f}  torch {lp_t.mean():.6f}  "
          f"max|d| {results['lpips_max_abs_err']:.2e}  "
          f"rel {results['lpips_max_rel_err']:.2e}")

    ok = (results["psnr_max_abs_err"] < 1e-4
          and results["ssim_max_abs_err"] < 1e-5
          and results["lpips_max_rel_err"] < 1e-3)
    results.update(
        status="ok" if ok else "FAILED",
        note=("torch oracles implement the reference's exact metric "
              "formulas (utils/metrics.py PSNR, pytorch_msssim SSIM "
              "algorithm, lpips-VGG graph with shared random weights); "
              "batch 8 @ 64px"),
    )
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY_METRICS.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(("PARITY OK -> " if ok else "PARITY FAILED -> ") + out)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
