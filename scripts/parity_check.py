#!/usr/bin/env python
"""Numerical parity check against the reference torch implementation.

Builds the reference torch UNet (imported from /root/reference, or
$VIEWFUSION_REFERENCE) with random weights, converts them with
viewfusion_tpu.utils.torch_convert, and compares:
  1. UNet forward outputs (torch NCHW vs flax NHWC) on random inputs,
  2. the composed p_mean_variance denoising step,
across the paper config topology (scaled down for speed).

Run manually:  JAX_PLATFORMS=cpu python scripts/parity_check.py
Pass ``--out FILE`` to also record the measured errors as a JSON
artifact (committed as PARITY_r02.json so the evidence trail is in-repo).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = os.environ.get("VIEWFUSION_REFERENCE", "/root/reference")
sys.path.insert(0, REF)

import numpy as np  # noqa: E402


def main():
    import torch  # noqa: E402

    torch.manual_seed(0)

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: E402

    from model.unet import UNet as TorchUNet  # reference  # noqa: E402

    from viewfusion_tpu.config import UNetConfig  # noqa: E402
    from viewfusion_tpu.models.unet import UNet as FlaxUNet  # noqa: E402
    from viewfusion_tpu.utils.torch_convert import (  # noqa: E402
        convert_unet_state_dict,
    )

    cfg = UNetConfig(
        image_size=32, in_channel=6, out_channel=6, inner_channel=32,
        norm_groups=16, channel_mults=(1, 2, 3, 5), attn_res=(8,),
        res_blocks=3, dropout=0.0,
    )
    tnet = TorchUNet(
        in_channel=cfg.in_channel, out_channel=cfg.out_channel,
        inner_channel=cfg.inner_channel, norm_groups=cfg.norm_groups,
        channel_mults=cfg.channel_mults, attn_res=cfg.attn_res,
        res_blocks=cfg.res_blocks, dropout=0.0, image_size=cfg.image_size,
    ).eval()

    sd = {f"denoise_fn.{k}": v.detach().numpy()
          for k, v in tnet.state_dict().items()}
    params = convert_unet_state_dict(sd, cfg)

    fnet = FlaxUNet(config=cfg, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    b = 3
    x = rng.standard_normal((b, cfg.image_size, cfg.image_size,
                             cfg.in_channel)).astype(np.float32)
    angle = rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32)
    level = rng.uniform(0.01, 0.99, (b,)).astype(np.float32)

    with torch.no_grad():
        t_out = tnet(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(angle[:, None]),
            torch.from_numpy(level[:, None]),
        ).numpy().transpose(0, 2, 3, 1)

    # pallas off: CPU comparison
    f_out = np.asarray(fnet.apply(params, jnp.asarray(x), jnp.asarray(angle),
                                  jnp.asarray(level)))

    err = np.abs(t_out - f_out).max()
    rel = err / (np.abs(t_out).max() + 1e-12)
    print(f"UNet forward: max abs err {err:.3e}  rel {rel:.3e}")
    assert err < 5e-4, "UNet forward parity FAILED"

    # --- composed denoising-step parity -------------------------------
    sys.path.insert(0, REF)
    from model.view_fusion import ViewFusion as TorchVF  # noqa: E402

    from viewfusion_tpu.config import (  # noqa: E402
        BetaScheduleConfig, Config, DiffusionConfig,
    )
    from viewfusion_tpu.models.view_fusion import (  # noqa: E402
        ViewFusion as JaxVF, view_mask,
    )

    sched_cfg = BetaScheduleConfig("linear", 100, 1e-4, 0.09)
    tvf = TorchVF(
        tnet,
        {"train": {"schedule": "linear", "num_timesteps": 100,
                   "linear_start": 1e-4, "linear_end": 0.09}},
    )
    tvf.set_new_noise_schedule(device=torch.device("cpu"), phase="train")

    jcfg = Config(
        unet=cfg,
        diffusion=DiffusionConfig(
            phases={"train": sched_cfg, "test": sched_cfg}
        ),
    )
    jvf = JaxVF.from_config(jcfg, dtype=jnp.float32)

    n = 4
    y_t = rng.standard_normal((b, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32
    )
    cond = rng.uniform(0, 1, (b, n, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32
    )
    vc = np.array([1, 3, 4])
    t_step = 57

    with torch.no_grad():
        t_mean, t_logvar, _, _ = tvf.p_mean_variance(
            torch.from_numpy(y_t.transpose(0, 3, 1, 2)),
            torch.from_numpy(cond.transpose(0, 1, 4, 2, 3)),
            torch.from_numpy(vc),
            torch.from_numpy(angle[:, None]),
            torch.full((b,), t_step, dtype=torch.long),
            clip_denoised=True,
        )
    j_mean, j_logvar, _, _ = jvf.p_mean_variance(
        params, jnp.asarray(y_t), jnp.asarray(cond),
        view_mask(jnp.asarray(vc), n), jnp.asarray(angle),
        jnp.int32(t_step),
    )
    mean_err = np.abs(
        t_mean.numpy().transpose(0, 2, 3, 1) - np.asarray(j_mean)
    ).max()
    logvar_err = abs(float(t_logvar.ravel()[0]) - float(j_logvar))
    print(f"p_mean_variance: mean max abs err {mean_err:.3e}  "
          f"logvar err {logvar_err:.3e}")
    assert mean_err < 5e-4 and logvar_err < 1e-6, \
        "denoising step parity FAILED"
    print("PARITY OK")

    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
        with open(out_path, "w") as f:
            json.dump(
                {
                    "status": "ok",
                    "unet_forward_max_abs_err": float(err),
                    "unet_forward_rel_err": float(rel),
                    "p_mean_variance_max_abs_err": float(mean_err),
                    "posterior_logvar_err": float(logvar_err),
                    "reference": REF,
                    "topology": {
                        "image_size": cfg.image_size,
                        "inner_channel": cfg.inner_channel,
                        "channel_mults": list(cfg.channel_mults),
                        "res_blocks": cfg.res_blocks,
                        "norm_groups": cfg.norm_groups,
                        "attn_res": list(cfg.attn_res),
                        "num_timesteps": 100,
                    },
                },
                f, indent=1,
            )
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
