"""DiT-style transformer denoiser — a second denoiser family.

The reference reserves a registry point for alternative denoisers
(``config.model.denoise_net`` keyed factory, experiment.py:91-95) but
ships only the conv UNet.  This adds a Diffusion-Transformer backbone
(Peebles & Xie 2023 adaLN-Zero) with the SAME conditioning interface as
the UNet — ``__call__(x, angle, noise_level)`` with the WaveGrad
positional encoding of BOTH the continuous noise level and the target
azimuth (model/unet.py:114-116 semantics) — so ``ViewFusion`` composes
either backbone unchanged.

Transformers are the most MXU-friendly architecture class: all FLOPs in
dense matmuls, static token counts (patchified 64x64/4 -> 256 tokens),
attention through the same Pallas kernel as the UNet.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from viewfusion_tpu.config import DiTConfig
from viewfusion_tpu.models.unet import positional_encoding
from viewfusion_tpu.ops.attention import spatial_self_attention

__all__ = ["DiT", "DiTConfig"]


def _sincos_2d(h: int, w: int, dim: int) -> np.ndarray:
    """Fixed 2D sin-cos position embedding, (h*w, dim)."""
    assert dim % 4 == 0
    quarter = dim // 4
    omega = 1.0 / (10000 ** (np.arange(quarter) / quarter))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    out = []
    for coords in (ys.reshape(-1), xs.reshape(-1)):
        ang = coords[:, None] * omega[None, :]
        out += [np.sin(ang), np.cos(ang)]
    return np.concatenate(out, axis=1).astype(np.float32)


class _MHAttention(nn.Module):
    """Multi-head attention over tokens, dispatched per head to the
    Pallas spatial-attention kernel."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, s, c = x.shape
        hd = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, s, 3, self.num_heads, hd)
        q, k, v = (
            qkv[:, :, i].transpose(0, 2, 1, 3).reshape(
                b * self.num_heads, s, hd
            )
            for i in range(3)
        )
        out = spatial_self_attention(q, k, v, scale=1.0 / math.sqrt(hd))
        out = out.reshape(b, self.num_heads, s, hd).transpose(
            0, 2, 1, 3
        ).reshape(b, s, c).astype(x.dtype)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class _DiTBlock(nn.Module):
    """adaLN-Zero transformer block."""

    num_heads: int
    mlp_ratio: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        # 6 modulation vectors; zero-init so each block starts as identity
        mod = nn.Dense(
            6 * c, dtype=self.dtype, kernel_init=nn.initializers.zeros,
            name="adaLN",
        )(nn.silu(cond))
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(
            mod[:, None, :], 6, axis=-1
        )
        h = nn.LayerNorm(use_bias=False, use_scale=False,
                         dtype=self.dtype)(x)
        h = h * (1 + sc1) + sh1
        x = x + g1 * _MHAttention(self.num_heads, dtype=self.dtype)(h)
        h = nn.LayerNorm(use_bias=False, use_scale=False,
                         dtype=self.dtype)(x)
        h = h * (1 + sc2) + sh2
        h = nn.Dense(self.mlp_ratio * c, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(c, dtype=self.dtype)(h)
        return x + g2 * h


class DiT(nn.Module):
    """__call__(x (B,H,W,in), angle (B,), noise_level (B,)) ->
    (B, H, W, out_channel); same contract as models.unet.UNet."""

    config: DiTConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize blocks (jax.checkpoint)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        angle: jnp.ndarray,
        noise_level: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        p = cfg.patch_size
        b, hh, ww, cin = x.shape
        assert hh == cfg.image_size and ww == cfg.image_size, (
            f"input {hh}x{ww} != configured image_size {cfg.image_size}"
        )
        assert cin == cfg.in_channel, (
            f"input channels {cin} != configured in_channel "
            f"{cfg.in_channel}"
        )
        assert hh % p == 0, f"image_size {hh} not divisible by patch_size {p}"
        assert cfg.hidden_size % cfg.num_heads == 0, (
            f"hidden_size {cfg.hidden_size} not divisible by num_heads "
            f"{cfg.num_heads}"
        )
        gh, gw = hh // p, ww // p

        # conditioning: WaveGrad encodings of gamma + angle -> MLP
        emb = jnp.concatenate(
            [
                positional_encoding(noise_level.reshape(-1),
                                    cfg.hidden_size // 2),
                positional_encoding(angle.reshape(-1),
                                    cfg.hidden_size // 2),
            ],
            axis=-1,
        ).astype(self.dtype)
        cond = nn.Dense(cfg.hidden_size * 4, dtype=self.dtype)(emb)
        cond = nn.silu(cond)
        cond = nn.Dense(cfg.hidden_size, dtype=self.dtype)(cond)

        # patchify
        tok = nn.Conv(
            cfg.hidden_size, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, name="patchify",
        )(x.astype(self.dtype))
        tok = tok.reshape(b, gh * gw, cfg.hidden_size)
        pos = jnp.asarray(_sincos_2d(gh, gw, cfg.hidden_size))
        tok = tok + pos[None].astype(self.dtype)

        block_cls = (
            nn.remat(_DiTBlock) if self.remat else _DiTBlock
        )
        for i in range(cfg.depth):
            tok = block_cls(
                cfg.num_heads, cfg.mlp_ratio, dtype=self.dtype,
                name=f"block_{i}",
            )(tok, cond)

        # adaLN-Zero final layer: cond-modulated non-affine LayerNorm
        # (zero-init shift/scale) before the zero-init linear head.
        mod = nn.Dense(
            2 * cfg.hidden_size, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="final_adaLN",
        )(nn.silu(cond))
        shift, scale = jnp.split(mod[:, None, :], 2, axis=-1)
        tok = nn.LayerNorm(use_bias=False, use_scale=False,
                           dtype=self.dtype)(tok)
        tok = tok * (1 + scale) + shift
        tok = nn.Dense(
            p * p * cfg.out_channel, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="unpatchify",
        )(tok)
        out = tok.reshape(b, gh, gw, p, p, cfg.out_channel)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, hh, ww, cfg.out_channel
        )
        return out.astype(jnp.float32)
