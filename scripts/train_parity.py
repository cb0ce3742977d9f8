#!/usr/bin/env python
"""Training-DYNAMICS parity vs the live torch reference.

Round-2 parity pinned the forward pass, one denoising step, the full
sampling chain, and the metrics — but never a gradient, an Adam update,
or a loss trajectory.  This harness closes that gap: it drives the
UNMODIFIED reference training recipe (Adam, experiment.py:118-120 +
265-293; LrScheduler, utils/schedulers.py:1-14; composed MSE loss,
model/view_fusion.py:216-298) and this framework's jitted
loss+grad+optax-Adam step side by side with IDENTICAL

  * initial weights (torch init converted via utils/torch_convert),
  * per-step batches (shared numpy generator),
  * per-step view_count draws,
  * per-step noise (both losses take ``noise=``),
  * per-step continuous-gamma draws: the torch side's internal
    ``torch.randint``/``torch.rand`` calls (model/view_fusion.py:231,234)
    are monkeypatched to return preset tensors so the REFERENCE CODE
    PATH runs untouched, and the jax side receives the resulting
    ``sample_gammas`` via the loss override,
  * per-step learning rates (reference: param_group mutation at
    ``get_cur_lr(it)``; here: the optax schedule at the same index).

Reports per-step loss deltas, the first-step gradient max error
(torch grads mapped through the same layout converter as the weights),
and the final parameter max delta after N full optimizer steps.

Run:  JAX_PLATFORMS=cpu python scripts/train_parity.py --steps 200 \
          --out TRAINPARITY_r03.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REF = os.environ.get("VIEWFUSION_REFERENCE", "/root/reference")
sys.path.insert(0, REF)

import numpy as np  # noqa: E402


def tree_max_abs_diff(a, b):
    import jax

    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    return float(
        max(
            np.abs(np.asarray(x) - np.asarray(y)).max()
            for x, y in zip(leaves_a, leaves_b)
        )
    )


def run(steps: int = 200, b: int = 4, n: int = 4, image: int = 16,
        T: int = 100, seed: int = 0):
    import torch
    import torch.optim as optim

    torch.manual_seed(seed)
    torch.use_deterministic_algorithms(True)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from model.unet import UNet as TorchUNet  # reference
    from model.view_fusion import ViewFusion as TorchVF  # reference
    from utils.schedulers import LrScheduler  # reference

    from viewfusion_tpu.config import (
        BetaScheduleConfig, Config, DiffusionConfig, UNetConfig,
    )
    from viewfusion_tpu.models.view_fusion import ViewFusion as JaxVF
    from viewfusion_tpu.training.schedulers import lr_schedule
    from viewfusion_tpu.utils.torch_convert import convert_unet_state_dict

    # --- matched models -------------------------------------------------
    ucfg = UNetConfig(
        image_size=image, in_channel=6, out_channel=6, inner_channel=16,
        norm_groups=8, channel_mults=(1, 2), attn_res=(image // 2,),
        res_blocks=1, dropout=0.0,
    )
    tnet = TorchUNet(
        in_channel=ucfg.in_channel, out_channel=ucfg.out_channel,
        inner_channel=ucfg.inner_channel, norm_groups=ucfg.norm_groups,
        channel_mults=ucfg.channel_mults, attn_res=ucfg.attn_res,
        res_blocks=ucfg.res_blocks, dropout=0.0, image_size=ucfg.image_size,
    )
    sched_kwargs = {"schedule": "linear", "num_timesteps": T,
                    "linear_start": 1e-4, "linear_end": 0.09}
    tvf = TorchVF(tnet, {"train": sched_kwargs})
    tvf.set_new_noise_schedule(device=torch.device("cpu"), phase="train")
    tvf.train()

    sched_cfg = BetaScheduleConfig("linear", T, 1e-4, 0.09)
    jcfg = Config(
        unet=ucfg,
        diffusion=DiffusionConfig(
            phases={"train": sched_cfg, "test": sched_cfg}
        ),
    )
    jvf = JaxVF.from_config(jcfg, dtype=jnp.float32)

    # identical init: torch init mapped through the weight converter
    sd = {f"denoise_fn.{k}": v.detach().numpy()
          for k, v in tvf.denoise_fn.state_dict().items()}
    params = jax.tree_util.tree_map(jnp.asarray,
                                    convert_unet_state_dict(sd, ucfg))

    # --- matched optimizers --------------------------------------------
    # Short-horizon schedule so the run exercises BOTH the warmup ramp
    # and the exponential decay region (reference shape, peak_lr/rate
    # hardcoded per experiment.py:116).
    peak_it, decay_it = steps // 4, steps // 2
    tsched = LrScheduler(peak_lr=1e-4, peak_it=peak_it,
                         decay_rate=0.16, decay_it=decay_it)
    topt = optim.Adam(tvf.parameters(), lr=tsched.get_cur_lr(0))
    tx = optax.adam(
        learning_rate=lr_schedule(peak_lr=1e-4, peak_it=peak_it,
                                  decay_rate=0.16, decay_it=decay_it),
        b1=0.9, b2=0.999, eps=1e-8,
    )
    opt_state = tx.init(params)

    gammas_np = tvf.gammas.numpy().astype(np.float32)

    @jax.jit
    def jax_step(params, opt_state, y0, cond, view_count, angle,
                 sample_gammas, noise):
        def loss_fn(p):
            return jvf.loss(p, jax.random.PRNGKey(0), y0, cond,
                            view_count, angle, noise=noise,
                            sample_gammas=sample_gammas)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, grads

    rng = np.random.default_rng(seed)
    losses_t, losses_j, deltas = [], [], []
    grad_err = None
    orig_randint, orig_rand = torch.randint, torch.rand

    for it in range(steps):
        y0 = rng.uniform(0, 1, (b, image, image, 3)).astype(np.float32)
        cond = rng.uniform(0, 1, (b, n, image, image, 3)).astype(np.float32)
        angle = rng.uniform(0, 2 * np.pi, (b,)).astype(np.float32)
        vc = rng.integers(1, n + 1, (b,)).astype(np.int64)
        t_draw = rng.integers(1, T, (b,)).astype(np.int64)
        u_draw = rng.uniform(0, 1, (b,)).astype(np.float32)
        noise = rng.standard_normal((b, image, image, 3)).astype(np.float32)

        g1 = gammas_np[t_draw - 1]
        g2 = gammas_np[t_draw]
        sample_gammas = (g2 - g1) * u_draw + g1  # exactly the ref formula

        # ---- torch step: UNMODIFIED forward, preset internal draws ----
        for group in topt.param_groups:  # experiment.py:265-267
            group["lr"] = tsched.get_cur_lr(it)
        topt.zero_grad()
        torch.randint = lambda *a, **k: torch.from_numpy(t_draw)
        torch.rand = lambda *a, **k: torch.from_numpy(u_draw[:, None])
        try:
            tloss = tvf(
                y_cond=torch.from_numpy(cond.transpose(0, 1, 4, 2, 3)),
                view_count=torch.from_numpy(vc),
                angle=torch.from_numpy(angle[:, None]),  # (b,1) as collated
                y_0=torch.from_numpy(y0.transpose(0, 3, 1, 2)),
                noise=torch.from_numpy(noise.transpose(0, 3, 1, 2)),
            )
        finally:
            torch.randint, torch.rand = orig_randint, orig_rand
        tloss.backward()

        # ---- jax step -------------------------------------------------
        params, opt_state, jloss, grads = jax_step(
            params, opt_state, jnp.asarray(y0), jnp.asarray(cond),
            jnp.asarray(vc.astype(np.int32)), jnp.asarray(angle),
            jnp.asarray(sample_gammas), jnp.asarray(noise),
        )

        if it == 0:
            gsd = {f"denoise_fn.{k}": p.grad.detach().numpy()
                   for k, p in tvf.denoise_fn.named_parameters()}
            tgrads = convert_unet_state_dict(gsd, ucfg)
            grad_err = tree_max_abs_diff(tgrads, grads)
            print(f"first-step gradient max abs err: {grad_err:.3e}")

        topt.step()

        lt, lj = float(tloss.item()), float(jloss)
        losses_t.append(lt)
        losses_j.append(lj)
        deltas.append(abs(lt - lj))
        if it % 25 == 0 or it == steps - 1:
            print(f"it {it:4d}  lr {tsched.get_cur_lr(it):.2e}  "
                  f"torch {lt:.6f}  jax {lj:.6f}  |d| {abs(lt-lj):.2e}")

    # final parameter agreement after `steps` full Adam updates
    sd_final = {f"denoise_fn.{k}": v.detach().numpy()
                for k, v in tvf.denoise_fn.state_dict().items()}
    tparams_final = convert_unet_state_dict(sd_final, ucfg)
    param_delta = tree_max_abs_diff(tparams_final, params)
    pmax = max(float(np.abs(np.asarray(x)).max())
               for x in jax.tree_util.tree_leaves(params))

    result = {
        "steps": steps,
        "batch": b,
        "max_views": n,
        "image_size": image,
        "num_timesteps": T,
        "first_step_grad_max_abs_err": grad_err,
        "loss_max_abs_delta": float(np.max(deltas)),
        "loss_max_abs_delta_first50": float(np.max(deltas[:50])),
        "loss_mean_abs_delta": float(np.mean(deltas)),
        "final_param_max_abs_delta": param_delta,
        "final_param_max_abs": pmax,
        "torch_loss_first": losses_t[0],
        "torch_loss_last": losses_t[-1],
        "jax_loss_first": losses_j[0],
        "jax_loss_last": losses_j[-1],
        "losses_torch": [round(x, 7) for x in losses_t],
        "losses_jax": [round(x, 7) for x in losses_j],
    }
    print(
        f"\nsummary: grad_err {grad_err:.2e}  "
        f"max|dloss| {result['loss_max_abs_delta']:.2e}  "
        f"final param max delta {param_delta:.2e} "
        f"(params max {pmax:.2f})"
    )
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    result = run(steps=args.steps, seed=args.seed)
    assert result["first_step_grad_max_abs_err"] < 1e-4, "gradient parity FAILED"
    assert result["loss_max_abs_delta_first50"] < 1e-3, "loss parity FAILED"
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
