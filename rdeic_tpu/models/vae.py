"""SD 2.1 VAE (AutoencoderKL) in Flax, NHWC.

Capability parity:
- architecture + forward: /root/reference/ldm/modules/diffusionmodules/model.py
  (Encoder/Decoder/ResnetBlock/AttnBlock) with config embed_dim=4, ch=128,
  ch_mult=[1,2,4,4], num_res_blocks=2, attn_resolutions=[] (configs/model/
  rdeic.yaml first_stage_config).
- the fork's custom `encode_hc` twin output returning the pre-conv_out 512-ch
  feature: ldm/modules/diffusionmodules/model.py:551-577 and
  ldm/models/autoencoder.py:91-95.
- DiagonalGaussianDistribution: ldm/modules/distributions/distributions.py.

GroupNorm eps is 1e-6 (the SD VAE "Normalize"). Attention in the mid block is
single-head full attention over h*w tokens.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from typing import Any

from rdeic_tpu.models.blocks import Conv
from rdeic_tpu.ops.attention import attention


def swish(x):
    return x * jax.nn.sigmoid(x)


class Normalize(nn.Module):
    @nn.compact
    def __call__(self, x):
        from rdeic_tpu.models.blocks import find_denominator

        groups = find_denominator(x.shape[-1], 32)
        # fp32 statistics (flax promotes the reductions), normalize in the
        # input dtype: the reference's full fp32 cast peaks f32 temps at
        # 512-res layers and doubles the pass's HBM bytes (see GroupNorm32)
        return nn.GroupNorm(num_groups=groups, epsilon=1e-6, dtype=x.dtype)(x)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Normalize(name="norm1")(x)
        h = swish(h)
        h = Conv(self.out_ch, kernel=3, dtype=self.dtype, name="conv1")(h)
        h = Normalize(name="norm2")(h)
        h = swish(h)
        h = Conv(self.out_ch, kernel=3, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = Conv(self.out_ch, kernel=1, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over the spatial grid."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = Normalize(name="norm")(x)
        q = Conv(c, kernel=1, dtype=self.dtype, name="q")(hidden).reshape(b, h * w, c)
        k = Conv(c, kernel=1, dtype=self.dtype, name="k")(hidden).reshape(b, h * w, c)
        v = Conv(c, kernel=1, dtype=self.dtype, name="v")(hidden).reshape(b, h * w, c)
        # auto-dispatch: Pallas flash on TPU once h*w >= 1024 tokens (at
        # 768x512 input the mid-block attends over 96*64 = 6144 tokens;
        # full attention would materialize a [B, 6144, 6144] matrix,
        # ~150 MB/image — the flash path never forms it)
        out = attention(q[:, :, None, :], k[:, :, None, :], v[:, :, None, :])
        out = out.reshape(b, h, w, c)
        return x + Conv(c, kernel=1, dtype=self.dtype, name="proj_out")(out)


class Downsample(nn.Module):
    """Stride-2 conv with asymmetric (0,1) padding, as in the SD VAE."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            c, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return Conv(c, kernel=3, dtype=self.dtype, name="conv")(x)


class VAEEncoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_feature: bool = False):
        """x: [B, H, W, 3] in [-1, 1].

        return_feature=True also returns the 512-ch pre-conv_out feature
        (the `c` of the fork's forward_hc).
        """
        dt = self.dtype
        h = Conv(self.ch, kernel=3, dtype=dt, name="conv_in")(x)
        for i, mult in enumerate(self.ch_mult):
            for j in range(self.num_res_blocks):
                h = ResnetBlock(self.ch * mult, dt, name=f"down_{i}_block_{j}")(h)
            if i != len(self.ch_mult) - 1:
                h = Downsample(dt, name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], dt, name="mid_block_1")(h)
        h = AttnBlock(dt, name="mid_attn_1")(h)
        h = ResnetBlock(h.shape[-1], dt, name="mid_block_2")(h)
        h = Normalize(name="norm_out")(h)
        h = swish(h)
        feature = h.astype(jnp.float32)  # compression input stays fp32
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        moments = Conv(out_ch, kernel=3, name="conv_out")(h.astype(jnp.float32))
        if return_feature:
            return moments, feature
        return moments


class VAEDecoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dtype: Any = jnp.float32
    use_checkpoint: bool = False

    @nn.compact
    def __call__(self, z):
        dt = self.dtype
        # Refine-phase training backprops through the decoder (frozen weights,
        # grads flow to the latent); without remat the backward holds every
        # intermediate full-res activation (~260 MB each at B=4 512px — the
        # measured OOM). Per-block remat stores only block boundaries and
        # recomputes the rest: the decoder is ~3% of the refine step's FLOPs,
        # so the recompute is roofline-free relative to the memory it returns.
        remat = self.use_checkpoint
        Res = nn.remat(ResnetBlock) if remat else ResnetBlock
        Attn = nn.remat(AttnBlock) if remat else AttnBlock
        block_in = self.ch * self.ch_mult[-1]
        h = Conv(block_in, kernel=3, dtype=dt, name="conv_in")(z)
        h = Res(block_in, dt, name="mid_block_1")(h)
        h = Attn(dt, name="mid_attn_1")(h)
        h = Res(block_in, dt, name="mid_block_2")(h)
        for i in reversed(range(len(self.ch_mult))):
            out = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = Res(out, dt, name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = Upsample(dt, name=f"up_{i}_upsample")(h)
        h = Normalize(name="norm_out")(h)
        h = swish(h)
        return Conv(self.out_ch, kernel=3, name="conv_out")(h.astype(jnp.float32))


class AutoencoderKL(nn.Module):
    """VAE with quant/post-quant 1x1 convs and the encode_hc twin output."""

    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    dtype: Any = jnp.float32
    use_checkpoint: bool = False

    def setup(self):
        self.encoder = VAEEncoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            z_channels=self.embed_dim, dtype=self.dtype, name="encoder",
        )
        self.decoder = VAEDecoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            dtype=self.dtype, use_checkpoint=self.use_checkpoint, name="decoder",
        )
        self.quant_conv = Conv(2 * self.embed_dim, kernel=1, name="quant_conv")
        self.post_quant_conv = Conv(self.embed_dim, kernel=1, name="post_quant_conv")

    def encode_moments(self, x):
        """x [-1,1] -> (mean, logvar) of the latent posterior."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_hc(self, x):
        """(mean, logvar, feature): posterior + 512-ch pre-conv_out feature."""
        moments, feature = self.encoder(x, return_feature=True)
        moments = self.quant_conv(moments)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0), feature

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng):
        mean, logvar = self.encode_moments(x)
        z = sample_diagonal_gaussian(rng, mean, logvar)
        return self.decode(z), mean, logvar


def sample_diagonal_gaussian(rng, mean, logvar):
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


class AutoencoderKLConfig(dict):
    """Registry target for first_stage_config YAML nodes."""

    def __init__(self, **params):
        super().__init__(**params)
