"""SR3-style denoising UNet, TPU-native Flax implementation.

Architecture replicates the reference denoiser (model/unet.py:8-138):
stem conv -> per-scale ResnetBlocWithAttn stacks + stride-2 Downsample ->
2 mid blocks (first with attention) -> per-scale (res_blocks+1) up blocks
with skip-concat + nearest Upsample -> final GroupNorm/Swish/Conv Block.
Conditioning: WaveGrad positional encoding of BOTH the continuous noise
level gamma and the target azimuth angle, concatenated and passed through
a 2-layer MLP (model/unet.py:24-32, 114-116, 142-157), injected additively
per ResnetBlock via FeatureWiseAffine (model/unet.py:160-177).

TPU-native choices (not a port):
  * NHWC layout end-to-end — XLA:TPU's native conv layout.
  * configurable compute dtype (bfloat16 on the MXU) with float32 params;
    softmax/normalization statistics in float32.
  * attention defaults to XLA einsum (measured fastest at the paper's
    256-token sizes); a Pallas VMEM-resident kernel
    (viewfusion_tpu.ops.attention) remains a tested opt-in via
    ``VF_ATTN_PALLAS=1``.
  * optional rematerialization of the per-scale blocks (jax.checkpoint)
    to trade FLOPs for HBM.
"""

from __future__ import annotations

import math


import jax
import jax.numpy as jnp
from flax import linen as nn

from viewfusion_tpu.config import UNetConfig
from viewfusion_tpu.ops.attention import spatial_self_attention
from viewfusion_tpu.ops.groupnorm import group_norm_act

__all__ = ["UNet", "FusedGroupNorm", "positional_encoding"]


class FusedGroupNorm(nn.Module):
    """GroupNorm with an optionally fused SiLU, dispatched to the Pallas
    TPU kernel in ops/groupnorm.py (XLA fallback off-TPU).

    Param tree matches flax.linen.GroupNorm ({scale, bias}, float32), so
    checkpoints and the torch weight converter (utils/torch_convert.py)
    are layout-identical; statistics are float32, output is ``dtype``."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    act: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return group_norm_act(
            x, scale, bias, groups=self.num_groups, eps=self.epsilon,
            act=self.act,
        ).astype(self.dtype)


def positional_encoding(level: jnp.ndarray, dim: int) -> jnp.ndarray:
    """WaveGrad positional encoding (reference: model/unet.py:142-157).

    ``level`` has shape (B,); returns (B, dim) = concat(sin, cos) of
    level * 1e4^(-k/count) for k in [0, count), count = dim // 2.
    """
    count = dim // 2
    step = jnp.arange(count, dtype=jnp.float32) / count
    encoding = level.astype(jnp.float32)[:, None] * jnp.exp(
        -math.log(1e4) * step[None, :]
    )
    return jnp.concatenate([jnp.sin(encoding), jnp.cos(encoding)], axis=-1)


class FeatureWiseAffine(nn.Module):
    """Additive (or affine) conditioning injection
    (reference: model/unet.py:160-177)."""

    out_channels: int
    use_affine_level: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, noise_embed: jnp.ndarray) -> jnp.ndarray:
        mult = 2 if self.use_affine_level else 1
        h = nn.Dense(self.out_channels * mult, dtype=self.dtype, name="noise_func")(
            noise_embed
        )
        if self.use_affine_level:
            gamma, beta = jnp.split(h, 2, axis=-1)
            return (1.0 + gamma[:, None, None, :]) * x + beta[:, None, None, :]
        return x + h[:, None, None, :]


class Block(nn.Module):
    """GroupNorm -> Swish -> Dropout -> 3x3 Conv
    (reference: model/unet.py:207-218)."""

    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # GroupNorm + Swish.  Measured default lowering (see
        # ops/groupnorm.py _dispatch for the numbers): on TPU the
        # HYBRID — XLA forward (keeps producer fusion) + Pallas analytic
        # backward (one fused kernel for the GN gradient reductions,
        # +3.5% step rate); flax/XLA on CPU; full-Pallas and dot-stats
        # variants are opt-in escape hatches.
        h = FusedGroupNorm(
            num_groups=self.groups, epsilon=1e-5, dtype=self.dtype,
            act="silu", name="GroupNorm_0",
        )(x)
        if self.dropout > 0.0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        return nn.Conv(
            self.dim_out, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype
        )(h)


class ResnetBlock(nn.Module):
    """Two Blocks with conditioning injected between them, plus a 1x1
    residual projection when channels change (reference: model/unet.py:221-245)."""

    dim_out: int
    norm_groups: int = 32
    dropout: float = 0.0
    use_affine_level: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, time_emb: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        h = Block(self.dim_out, groups=self.norm_groups, dtype=self.dtype)(x)
        h = FeatureWiseAffine(
            self.dim_out, self.use_affine_level, dtype=self.dtype
        )(h, time_emb)
        h = Block(
            self.dim_out, groups=self.norm_groups, dropout=self.dropout,
            dtype=self.dtype,
        )(h, deterministic=deterministic)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), dtype=self.dtype, name="res_conv")(x)
        return h + x


class SelfAttention(nn.Module):
    """Full spatial self-attention over H*W tokens with residual
    (reference: model/unet.py:248-277; n_head=1, scale 1/sqrt(channel)).

    The attention contraction itself is dispatched to a Pallas TPU kernel
    (XLA einsum fallback on other backends)."""

    norm_groups: int = 32
    n_head: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        norm = FusedGroupNorm(
            num_groups=self.norm_groups, epsilon=1e-5, dtype=self.dtype,
            act="none", name="GroupNorm_0",
        )(x)
        qkv = nn.Conv(c * 3, (1, 1), use_bias=False, dtype=self.dtype, name="qkv")(
            norm
        )
        q, k, v = jnp.split(qkv.reshape(b, h * w, 3 * c), 3, axis=-1)
        out = spatial_self_attention(q, k, v, scale=1.0 / math.sqrt(c))
        out = out.reshape(b, h, w, c).astype(x.dtype)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="out")(out)
        return out + x


class ResnetBlocWithAttn(nn.Module):
    """ResnetBlock optionally followed by SelfAttention
    (reference: model/unet.py:280-303)."""

    dim_out: int
    norm_groups: int = 32
    dropout: float = 0.0
    with_attn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, time_emb: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        x = ResnetBlock(
            self.dim_out, norm_groups=self.norm_groups, dropout=self.dropout,
            dtype=self.dtype,
        )(x, time_emb, deterministic)
        if self.with_attn:
            x = SelfAttention(norm_groups=self.norm_groups, dtype=self.dtype)(x)
        return x


class Downsample(nn.Module):
    """3x3 stride-2 conv (reference: model/unet.py:195-201)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.dim, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype,
        )(x)


class Upsample(nn.Module):
    """Nearest 2x upsample + 3x3 conv (reference: model/unet.py:185-192)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.dim, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype)(x)


class UNet(nn.Module):
    """The full denoiser (reference: model/unet.py:8-138).

    __call__(x, angle, noise_level) with x (B, H, W, in_channel) NHWC,
    angle (B,), noise_level (B,) -> (B, H, W, out_channel).
    """

    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    # Rematerialize each block's activations in backward (jax.checkpoint):
    # trades ~30% more FLOPs for O(depth) less HBM, enabling larger
    # per-chip batches.  No reference equivalent (torch keeps all
    # activations).
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        angle: jnp.ndarray,
        noise_level: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        inner = cfg.inner_channel

        if cfg.with_noise_level_emb:
            # Encode gamma and angle each to inner//2 dims, concat -> inner
            # (reference: model/unet.py:114-116).
            t_angle = jnp.concatenate(
                [
                    positional_encoding(noise_level.reshape(-1), inner // 2),
                    positional_encoding(angle.reshape(-1), inner // 2),
                ],
                axis=-1,
            ).astype(self.dtype)
            t = nn.Dense(inner * 4, dtype=self.dtype, name="noise_mlp_0")(t_angle)
            t = nn.silu(t)
            t = nn.Dense(inner, dtype=self.dtype, name="noise_mlp_1")(t)
        else:
            t = jnp.zeros((x.shape[0], inner), dtype=self.dtype)

        block_cls = (
            nn.remat(ResnetBlocWithAttn, static_argnums=(3,))
            if self.remat
            else ResnetBlocWithAttn
        )

        def make_block(dim_out: int, with_attn: bool, name: str):
            return block_cls(
                dim_out,
                norm_groups=cfg.norm_groups,
                dropout=cfg.dropout,
                with_attn=with_attn,
                dtype=self.dtype,
                name=name,
            )

        x = x.astype(self.dtype)
        num_mults = len(cfg.channel_mults)
        now_res = cfg.image_size

        # --- encoder (reference: model/unet.py:42-64) ---
        h = nn.Conv(inner, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="stem")(x)
        feats = [h]
        pre_channel = inner
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            use_attn = now_res in cfg.attn_res
            channel_mult = inner * cfg.channel_mults[ind]
            for blk in range(cfg.res_blocks):
                h = make_block(channel_mult, use_attn, f"down_{ind}_{blk}")(
                    h, t, deterministic
                )
                feats.append(h)
            pre_channel = channel_mult
            if not is_last:
                h = Downsample(pre_channel, dtype=self.dtype,
                               name=f"downsample_{ind}")(h)
                feats.append(h)
                now_res //= 2

        # --- mid (reference: model/unet.py:66-85) ---
        h = make_block(pre_channel, True, "mid_0")(h, t, deterministic)
        h = make_block(pre_channel, False, "mid_1")(h, t, deterministic)

        # --- decoder (reference: model/unet.py:87-108) ---
        for ind in reversed(range(num_mults)):
            is_last = ind < 1
            use_attn = now_res in cfg.attn_res
            channel_mult = inner * cfg.channel_mults[ind]
            for blk in range(cfg.res_blocks + 1):
                h = jnp.concatenate([h, feats.pop()], axis=-1)
                h = make_block(channel_mult, use_attn, f"up_{ind}_{blk}")(
                    h, t, deterministic
                )
            pre_channel = channel_mult
            if not is_last:
                h = Upsample(pre_channel, dtype=self.dtype,
                             name=f"upsample_{ind}")(h)
                now_res *= 2

        # --- head (reference: model/unet.py:110-112) ---
        out = Block(cfg.out_channel, groups=cfg.norm_groups, dtype=self.dtype,
                    name="final_conv")(h)
        return out.astype(jnp.float32)
