#!/usr/bin/env python
"""End-to-end eval parity of a CONVERTED checkpoint vs the live torch
reference (committed as EVAL_CONVERTED_r02.json).

parity_check.py pins one UNet forward and one p_mean_variance step; this
script pins the rest of the eval pipeline: starting from ONE weight set
(random-init torch reference UNet -> utils/torch_convert), both sides run
the FULL T-step deterministic reverse chain (posterior mean only, i.e.
the ancestral sampler of model/view_fusion.py:166-177 with epsilon = 0 at
every step, applied identically on both sides) from the same y_T, then
score the generated images against the same ground truth with each
side's OWN metric stack — the reference's utils/metrics.py formulas in
torch vs ops/metrics.py in JAX.  Agreement here means: converted
checkpoint -> generation -> reported PSNR/SSIM match the reference
end-to-end, which is the strongest quality-parity evidence available in
an image with no NMR dataset and no egress.

Run manually:  JAX_PLATFORMS=cpu python scripts/eval_converted.py --out EVAL_CONVERTED_r02.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = os.environ.get("VIEWFUSION_REFERENCE", "/root/reference")
sys.path.insert(0, REF)

import numpy as np  # noqa: E402

T = 100          # reverse-chain length (scaled from 2000 for CPU runtime)
IMG = 32         # image size (scaled from 64; same topology otherwise)
B, N = 2, 4      # batch, stored cond views


def torch_reference_metrics(gen, gt):
    """The reference's exact metric math (utils/metrics.py:6-12) via the
    oracles already pinned in scripts/parity_metrics.py."""
    import torch

    from parity_metrics import torch_psnr, torch_ssim

    g = torch.from_numpy(gen.transpose(0, 3, 1, 2)).clamp(0, 1)
    t = torch.from_numpy(gt.transpose(0, 3, 1, 2)).clamp(0, 1)
    return torch_psnr(g, t).numpy(), torch_ssim(g, t).numpy()


def main():
    import torch

    torch.manual_seed(0)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from model.unet import UNet as TorchUNet  # reference
    from model.view_fusion import ViewFusion as TorchVF  # reference

    from viewfusion_tpu.config import (
        BetaScheduleConfig, Config, DiffusionConfig, UNetConfig,
    )
    from viewfusion_tpu.models.view_fusion import (
        ViewFusion as JaxVF, view_mask,
    )
    from viewfusion_tpu.ops.metrics import compute_psnr, compute_ssim
    from viewfusion_tpu.utils.torch_convert import convert_unet_state_dict

    cfg = UNetConfig(
        image_size=IMG, in_channel=6, out_channel=6, inner_channel=32,
        norm_groups=16, channel_mults=(1, 2, 3, 5), attn_res=(IMG // 4,),
        res_blocks=3, dropout=0.0,
    )
    tnet = TorchUNet(
        in_channel=cfg.in_channel, out_channel=cfg.out_channel,
        inner_channel=cfg.inner_channel, norm_groups=cfg.norm_groups,
        channel_mults=cfg.channel_mults, attn_res=cfg.attn_res,
        res_blocks=cfg.res_blocks, dropout=0.0, image_size=cfg.image_size,
    ).eval()
    params = convert_unet_state_dict(
        {f"denoise_fn.{k}": v.detach().numpy()
         for k, v in tnet.state_dict().items()},
        cfg,
    )

    sched = {"schedule": "linear", "num_timesteps": T,
             "linear_start": 1e-4, "linear_end": 0.09}
    tvf = TorchVF(tnet, {"train": sched})
    tvf.set_new_noise_schedule(device=torch.device("cpu"), phase="train")

    sched_cfg = BetaScheduleConfig("linear", T, 1e-4, 0.09)
    jvf = JaxVF.from_config(
        Config(unet=cfg, diffusion=DiffusionConfig(
            phases={"train": sched_cfg, "test": sched_cfg})),
        dtype=jnp.float32,
    )

    rng = np.random.default_rng(7)
    gt = rng.uniform(0, 1, (B, IMG, IMG, 3)).astype(np.float32)
    cond = rng.uniform(0, 1, (B, N, IMG, IMG, 3)).astype(np.float32)
    vc = np.array([2, 4], dtype=np.int64)
    angle = rng.uniform(0, 2 * np.pi, (B,)).astype(np.float32)
    y_T = rng.standard_normal((B, IMG, IMG, 3)).astype(np.float32)

    # ---- torch reference chain (epsilon = 0 each step) ----------------
    t0 = time.time()
    y = torch.from_numpy(y_T.transpose(0, 3, 1, 2))
    t_cond = torch.from_numpy(cond.transpose(0, 1, 4, 2, 3))
    t_vc = torch.from_numpy(vc)
    t_angle = torch.from_numpy(angle[:, None])
    with torch.no_grad():
        for i in reversed(range(T)):
            mean, _, _, _ = tvf.p_mean_variance(
                y, t_cond, t_vc, t_angle,
                torch.full((B,), i, dtype=torch.long), clip_denoised=True,
            )
            y = mean
    torch_gen = y.numpy().transpose(0, 2, 3, 1)
    print(f"torch chain: {time.time() - t0:.1f}s", file=sys.stderr)

    # ---- jax chain on the converted params -----------------------------
    t0 = time.time()
    mask = view_mask(jnp.asarray(vc.astype(np.int32)), N)
    jy = jnp.asarray(y_T)
    jcond, jangle = jnp.asarray(cond), jnp.asarray(angle)

    @jax.jit
    def mean_step(y, i):
        m, _, _, _ = jvf.p_mean_variance(params, y, jcond, mask, jangle, i)
        return m, None

    jy, _ = jax.lax.scan(
        lambda y, i: mean_step(y, i), jy, jnp.arange(T - 1, -1, -1)
    )
    jax_gen = np.asarray(jy)
    print(f"jax chain: {time.time() - t0:.1f}s", file=sys.stderr)

    img_err = float(np.abs(torch_gen - jax_gen).max())
    print(f"generated image max abs err over {T} steps: {img_err:.3e}")

    # ---- metrics: each side's own stack --------------------------------
    t_psnr, t_ssim = torch_reference_metrics(torch_gen, gt)
    j_psnr = np.asarray(compute_psnr(
        jnp.clip(jnp.asarray(jax_gen), 0, 1), jnp.asarray(gt)))
    j_ssim = np.asarray(compute_ssim(
        jnp.clip(jnp.asarray(jax_gen), 0, 1), jnp.asarray(gt)))

    psnr_err = float(np.abs(t_psnr - j_psnr).max())
    ssim_err = float(np.abs(t_ssim - j_ssim).max())
    print(f"PSNR: torch {t_psnr.mean():.4f} jax {j_psnr.mean():.4f} "
          f"(max abs err {psnr_err:.3e})")
    print(f"SSIM: torch {t_ssim.mean():.4f} jax {j_ssim.mean():.4f} "
          f"(max abs err {ssim_err:.3e})")

    assert img_err < 5e-3, "full-chain image parity FAILED"
    assert psnr_err < 5e-2 and ssim_err < 5e-3, "metric parity FAILED"
    print("EVAL-CONVERTED PARITY OK")

    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
        with open(out_path, "w") as f:
            json.dump(
                {
                    "status": "ok",
                    "chain_steps": T,
                    "image_size": IMG,
                    "generated_image_max_abs_err": img_err,
                    "psnr_torch_mean": float(t_psnr.mean()),
                    "psnr_jax_mean": float(j_psnr.mean()),
                    "psnr_max_abs_err": psnr_err,
                    "ssim_torch_mean": float(t_ssim.mean()),
                    "ssim_jax_mean": float(j_ssim.mean()),
                    "ssim_max_abs_err": ssim_err,
                    "reference": REF,
                    "note": "one converted weight set; deterministic "
                            "(posterior-mean) full reverse chain on both "
                            "sides; metrics from each side's own stack",
                },
                f, indent=1,
            )
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
