"""SD 2.1 UNet + ControlNet-XS-style dual noise estimator (Flax, NHWC).

Capability parity:
- UNetModel: /root/reference/ldm/modules/diffusionmodules/openaimodel.py:421-808
  with the rdeic.yaml unet_config (model_channels 320, mult [1,2,4,4],
  2 res blocks/level, SpatialTransformer at ds 1/2/4, context_dim 1024,
  num_head_channels 64, linear-in-transformer).
- ControlModule (0.2-width encoder+middle copy, input conv takes
  in_channels+hint_channels): /root/reference/model/rdeic.py:237-462.
- NoiseEstimator zero-conv bridging (enc->enc per block, mid->mid,
  ctrl-enc-skips->base-dec) and the dual lock-step forward:
  /root/reference/model/rdeic.py:38-235.

TPU design: NHWC; attention runs through rdeic_tpu.ops.attention (Pallas
flash kernel on TPU); GroupNorm in fp32 with bf16 activations optional;
the whole denoiser is a single jittable function of (x, t, context, hint).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from rdeic_tpu.models.blocks import (
    Conv,
    GroupNorm32,
    find_denominator,
    timestep_embedding,
    zero_init_conv,
)
from rdeic_tpu.ops.attention import attention


class TimeEmbed(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc1")(t_emb)
        h = jax.nn.silu(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)


class ResBlock(nn.Module):
    """UNet residual block with timestep-embedding injection."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        h = GroupNorm32(name="in_norm", silu=True)(x)
        h = Conv(self.out_ch, kernel=3, dtype=self.dtype, name="in_conv")(h)
        e = nn.Dense(self.out_ch, dtype=self.dtype, name="emb_proj")(
            jax.nn.silu(emb)
        )
        h = h + e[:, None, None, :].astype(h.dtype)
        h = GroupNorm32(name="out_norm", silu=True)(h)
        h = nn.Conv(
            self.out_ch,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="out_conv",
        )(h)
        if x.shape[-1] != self.out_ch:
            x = Conv(self.out_ch, kernel=1, dtype=self.dtype, name="skip")(x)
        return x + h


class CrossAttention(nn.Module):
    heads: int
    dim_head: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        # x: [B, L, C]; context: [B, Lk, Ck] (None -> self attention)
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        b, lq, _ = q.shape
        lk = k.shape[1]
        q = q.reshape(b, lq, self.heads, self.dim_head)
        k = k.reshape(b, lk, self.heads, self.dim_head)
        v = v.reshape(b, lk, self.heads, self.dim_head)
        out = attention(q, k, v).reshape(b, lq, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class GEGLU(nn.Module):
    inner: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * jax.nn.gelu(gate, approximate=False)


class BasicTransformerBlock(nn.Module):
    heads: int
    dim_head: int
    context_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        dim = x.shape[-1]
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype, name="attn1")(h)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(self.heads, self.dim_head, self.dtype, name="attn2")(
            h, context
        )
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        h = GEGLU(dim * 4, self.dtype, name="ff_geglu")(h)
        x = x + nn.Dense(dim, dtype=self.dtype, name="ff_out")(h)
        return x


class SpatialTransformer(nn.Module):
    """GroupNorm -> linear proj -> transformer blocks -> zero linear proj."""

    heads: int
    dim_head: int
    context_dim: int
    depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        inner = self.heads * self.dim_head
        hidden = GroupNorm32(epsilon=1e-6, name="norm")(x)
        hidden = hidden.reshape(b, h * w, c)
        hidden = nn.Dense(inner, dtype=self.dtype, name="proj_in")(hidden)
        for i in range(self.depth):
            hidden = BasicTransformerBlock(
                self.heads, self.dim_head, self.context_dim, self.dtype,
                name=f"block_{i}",
            )(hidden, context)
        hidden = nn.Dense(
            c, kernel_init=nn.initializers.zeros, dtype=self.dtype,
            name="proj_out",
        )(hidden)
        return x + hidden.reshape(b, h, w, c)


class Downsample(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv(self.out_ch, kernel=3, stride=2, dtype=self.dtype, name="op")(x)


class Upsample(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return Conv(self.out_ch, kernel=3, dtype=self.dtype, name="conv")(x)


class EncoderBlock(nn.Module):
    """One UNet input block: ResBlock [+ SpatialTransformer] or Downsample."""

    kind: str  # "conv" | "res" | "res_attn" | "down"
    out_ch: int
    heads: int = 0
    dim_head: int = 0
    context_dim: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb, context):
        if self.kind == "conv":
            return Conv(self.out_ch, kernel=3, dtype=self.dtype, name="conv_in")(x)
        if self.kind == "down":
            return Downsample(self.out_ch, self.dtype, name="down")(x)
        h = ResBlock(self.out_ch, self.dtype, name="res")(x, emb)
        if self.kind == "res_attn":
            h = SpatialTransformer(
                self.heads, self.dim_head, self.context_dim, 1, self.dtype,
                name="attn",
            )(h, context)
        return h


class DecoderBlock(nn.Module):
    """One UNet output block: ResBlock [+ attn] [+ Upsample]."""

    out_ch: int
    has_attn: bool
    has_upsample: bool
    heads: int = 0
    dim_head: int = 0
    context_dim: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb, context):
        h = ResBlock(self.out_ch, self.dtype, name="res")(x, emb)
        if self.has_attn:
            h = SpatialTransformer(
                self.heads, self.dim_head, self.context_dim, 1, self.dtype,
                name="attn",
            )(h, context)
        if self.has_upsample:
            h = Upsample(self.out_ch, self.dtype, name="up")(h)
        return h


class MiddleBlock(nn.Module):
    ch: int
    heads: int
    dim_head: int
    context_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb, context):
        h = ResBlock(self.ch, self.dtype, name="res1")(x, emb)
        h = SpatialTransformer(
            self.heads, self.dim_head, self.context_dim, 1, self.dtype, name="attn"
        )(h, context)
        return ResBlock(self.ch, self.dtype, name="res2")(h, emb)


def _enc_plan(model_channels, channel_mult, num_res_blocks, attention_resolutions):
    """Static plan of the encoder: list of (kind, out_ch, ds)."""
    plan = [("conv", model_channels, 1)]
    ch = model_channels
    ds = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            ch = mult * model_channels
            kind = "res_attn" if ds in attention_resolutions else "res"
            plan.append((kind, ch, ds))
        if level != len(channel_mult) - 1:
            plan.append(("down", ch, ds))
            ds *= 2
    return plan


def _dec_plan(model_channels, channel_mult, num_res_blocks, attention_resolutions):
    """Static plan of the decoder: list of (out_ch, has_attn, has_up, ds)."""
    plan = []
    ds = 2 ** (len(channel_mult) - 1)
    for level in reversed(range(len(channel_mult))):
        ch = channel_mult[level] * model_channels
        for i in range(num_res_blocks + 1):
            has_attn = ds in attention_resolutions
            has_up = level != 0 and i == num_res_blocks
            plan.append((ch, has_attn, has_up, ds))
            if has_up:
                ds //= 2
    return plan


def _skip_channels(model_channels, channel_mult, num_res_blocks):
    """Encoder output channels per block (the skip stack), in push order."""
    chans = [model_channels]
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            chans.append(mult * model_channels)
        if level != len(channel_mult) - 1:
            chans.append(mult * model_channels)
    return chans


def _remat_cls(cls, use_checkpoint, policy_name):
    """Module class -> (optionally) remat-wrapped class.

    policy_name:
      None   — full rematerialization (reference use_checkpoint parity)
      "dots" — save matmul/conv outputs, recompute elementwise ops only
               (jax.checkpoint_policies.checkpoint_dots): ~B=16-capacity
               memory at near-no-remat step time on v5e
    """
    if not use_checkpoint:
        return cls
    if policy_name == "dots":
        return nn.remat(cls, policy=jax.checkpoint_policies.checkpoint_dots)
    return nn.remat(cls)


class UNetModel(nn.Module):
    """SD 2.1 denoising UNet."""

    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: int = 1024
    use_checkpoint: bool = False
    remat_policy: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        # activation checkpointing (parity: use_checkpoint=True in the
        # reference unet/control configs; util.py:109-159) via nn.remat
        Enc = _remat_cls(EncoderBlock, self.use_checkpoint, self.remat_policy)
        Dec = _remat_cls(DecoderBlock, self.use_checkpoint, self.remat_policy)
        Mid = _remat_cls(MiddleBlock, self.use_checkpoint, self.remat_policy)
        mc = self.model_channels
        self.time_embed = TimeEmbed(mc * 4, self.dtype, name="time_embed")
        enc = _enc_plan(
            mc, self.channel_mult, self.num_res_blocks, self.attention_resolutions
        )
        self.enc_out_channels = tuple(c for _, c, _ in enc)
        blocks = []
        for i, (kind, ch, _) in enumerate(enc):
            heads = ch // self.num_head_channels if kind == "res_attn" else 0
            blocks.append(
                Enc(
                    kind, ch, heads, self.num_head_channels, self.context_dim,
                    self.dtype, name=f"in_{i}",
                )
            )
        self.input_blocks = blocks

        mid_ch = self.channel_mult[-1] * mc
        self.middle_block = Mid(
            mid_ch, mid_ch // self.num_head_channels, self.num_head_channels,
            self.context_dim, self.dtype, name="mid",
        )
        self.mid_out_channels = mid_ch

        dec = _dec_plan(
            mc, self.channel_mult, self.num_res_blocks, self.attention_resolutions
        )
        self.dec_out_channels = tuple(c for c, _, _, _ in dec)
        dblocks = []
        for i, (ch, has_attn, has_up, _) in enumerate(dec):
            heads = ch // self.num_head_channels if has_attn else 0
            dblocks.append(
                Dec(
                    ch, has_attn, has_up, heads, self.num_head_channels,
                    self.context_dim, self.dtype, name=f"out_{i}",
                )
            )
        self.output_blocks = dblocks
        self.out_norm = GroupNorm32(32, silu=True, name="out_norm")
        self.out_conv = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.zeros, name="out_conv",
        )

    def embed_time(self, t):
        return self.time_embed(timestep_embedding(t, self.model_channels))

    def __call__(self, x, t, context):
        """x: [B, H, W, C], t: [B] int, context: [B, L, context_dim]."""
        emb = self.embed_time(t)
        h = x
        skips = []
        for block in self.input_blocks:
            h = block(h, emb, context)
            skips.append(h)
        h = self.middle_block(h, emb, context)
        for block in self.output_blocks:
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = block(h, emb, context)
        h = self.out_norm(h)  # silu fused in GroupNorm32(silu=True)
        return self.out_conv(h)


class ControlModule(nn.Module):
    """Slim (ratio-width) copy of the UNet encoder + middle, with the guide
    hint concatenated to the input."""

    in_channels: int = 4
    hint_channels: int = 256
    model_channels: int = 320  # full width; blocks use ratio-scaled width
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 16
    context_dim: int = 1024
    control_model_ratio: float = 0.2
    use_checkpoint: bool = False
    remat_policy: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        Enc = _remat_cls(EncoderBlock, self.use_checkpoint, self.remat_policy)
        Mid = _remat_cls(MiddleBlock, self.use_checkpoint, self.remat_policy)
        full_mc = self.model_channels
        mc = int(full_mc * self.control_model_ratio)
        self.scaled_channels = mc
        # time embed operates at FULL width (rdeic.py:323-328)
        self.time_embed = TimeEmbed(full_mc * 4, self.dtype, name="time_embed")
        enc = _enc_plan(
            mc, self.channel_mult, self.num_res_blocks, self.attention_resolutions
        )
        self.enc_out_channels = tuple(c for _, c, _ in enc)
        blocks = []
        for i, (kind, ch, _) in enumerate(enc):
            if kind == "res_attn":
                dim_head = find_denominator(ch, self.num_head_channels)
                heads = ch // dim_head
            else:
                dim_head, heads = 0, 0
            blocks.append(
                Enc(
                    kind, ch, heads, dim_head, self.context_dim,
                    self.dtype, name=f"in_{i}",
                )
            )
        self.input_blocks = blocks
        mid_ch = self.channel_mult[-1] * mc
        dim_head = find_denominator(mid_ch, self.num_head_channels)
        self.middle_block = Mid(
            mid_ch, mid_ch // dim_head, dim_head, self.context_dim,
            self.dtype, name="mid",
        )
        self.mid_out_channels = mid_ch

    def embed_time(self, t):
        # sinusoidal embedding at FULL model width (rdeic.py:175)
        return self.time_embed(
            timestep_embedding(t, self.model_channels)
        )


class NoiseEstimator(nn.Module):
    """Dual-UNet: frozen-base + trainable control, bridged by zero convs.

    forward() runs both encoders in lock-step, adding zero-conv control
    features into the base at every block; forward_unconditional() runs the
    base UNet alone (for classifier-free guidance).
    """

    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    hint_channels: int = 256
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_head_channels: int = 64  # base UNet heads
    ctrl_num_head_channels: int = 16
    context_dim: int = 1024
    control_model_ratio: float = 0.2
    control_scale: float = 1.0
    use_checkpoint: bool = False
    remat_policy: Any = None
    dtype: Any = jnp.float32

    def setup(self):
        self.base = UNetModel(
            in_channels=self.in_channels,
            model_channels=self.model_channels,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            channel_mult=tuple(self.channel_mult),
            num_head_channels=self.num_head_channels,
            context_dim=self.context_dim,
            use_checkpoint=self.use_checkpoint,
            remat_policy=self.remat_policy,
            dtype=self.dtype,
            name="base",
        )
        self.control = ControlModule(
            in_channels=self.in_channels,
            hint_channels=self.hint_channels,
            model_channels=self.model_channels,
            num_res_blocks=self.num_res_blocks,
            attention_resolutions=tuple(self.attention_resolutions),
            channel_mult=tuple(self.channel_mult),
            num_head_channels=self.ctrl_num_head_channels,
            context_dim=self.context_dim,
            control_model_ratio=self.control_model_ratio,
            use_checkpoint=self.use_checkpoint,
            remat_policy=self.remat_policy,
            dtype=self.dtype,
            name="control",
        )
        base_enc = self.base.enc_out_channels
        # enc->enc bridges, one per input block
        self.enc_zero_convs_out = [
            zero_init_conv(base_enc[i]) for i in range(len(base_enc))
        ]
        self.middle_block_out = zero_init_conv(self.base.mid_out_channels)
        # ctrl-enc-skip -> base-dec bridges: first targets the mid output,
        # the rest target base decoder block outputs (rdeic.py:150-158)
        dec_targets = [self.base.mid_out_channels] + list(
            self.base.dec_out_channels[:-1]
        )
        self.dec_zero_convs_out = [zero_init_conv(c) for c in dec_targets]

    def __call__(self, x, t, context, guide_hint):
        """Conditional forward with control. x: [B,H,W,4], hint: [B,H,W,256]."""
        emb_base = self.base.embed_time(t)
        emb_ctrl = self.control.embed_time(t)
        scale = self.control_scale * self.control_scale

        h_base = x
        h_ctrl = jnp.concatenate([x, guide_hint], axis=-1)
        skips_base, skips_ctrl = [], []
        for i, (blk_b, blk_c) in enumerate(
            zip(self.base.input_blocks, self.control.input_blocks)
        ):
            h_base = blk_b(h_base, emb_base, context)
            h_ctrl = blk_c(h_ctrl, emb_ctrl, context)
            h_base = h_base + self.enc_zero_convs_out[i](h_ctrl) * scale
            skips_base.append(h_base)
            skips_ctrl.append(h_ctrl)

        h_base = self.base.middle_block(h_base, emb_base, context)
        h_ctrl = self.control.middle_block(h_ctrl, emb_ctrl, context)
        h_base = h_base + self.middle_block_out(h_ctrl) * scale

        for i, blk_b in enumerate(self.base.output_blocks):
            h_base = h_base + self.dec_zero_convs_out[i](skips_ctrl.pop()) * scale
            h_base = jnp.concatenate([h_base, skips_base.pop()], axis=-1)
            h_base = blk_b(h_base, emb_base, context)

        h_base = self.base.out_norm(h_base)  # silu fused (silu=True)
        return self.base.out_conv(h_base)

    def forward_unconditional(self, x, t, context):
        """Base UNet alone (CFG unconditional branch, rdeic.py:214-235)."""
        return self.base(x, t, context)


class UNetConfig(dict):
    """Registry target for unet_config YAML nodes."""

    def __init__(self, **params):
        super().__init__(**params)
