"""Shared Flax building blocks (NHWC, TPU-friendly).

Everything here is layout-native for TPU: NHWC tensors keep channels on the
128-lane axis, convs lower to MXU matmuls, GroupNorm/SiLU fuse into the
surrounding convs under XLA.
"""
from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp


def find_denominator(number: int, start: int) -> int:
    """Largest divisor of `number` that is <= start.

    Parity: /root/reference/model/rdeic.py:464-471 (GroupNorm group count for
    ratio-scaled control channels).
    """
    if start >= number:
        return number
    while start != 0:
        if number % start == 0:
            return start
        start -= 1
    return 1


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal timestep embeddings: cat(cos, sin) ordering.

    Parity: /root/reference/ldm/modules/diffusionmodules/util.py:161-182.
    """
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Depth-to-space with torch PixelShuffle channel ordering (NHWC input
    whose channel dim is laid out as (c, i, j))."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b h i w j c
    return x.reshape(b, h * r, w * r, c)


class Conv(nn.Module):
    """2D conv, NHWC. kernel k, stride s, 'same'-style fixed padding."""

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int | None = None
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        pad = self.padding if self.padding is not None else self.kernel // 2
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics; groups = largest divisor of C that is
    <= max_groups.

    This reproduces both the stock GroupNorm(32, C) (all SD channel counts are
    multiples of 32) and the control module's GroupNorm_leq32 /
    find_denominator behavior for ratio-scaled widths (rdeic.py:473-485).

    The reference's GroupNorm32 casts the whole activation to fp32
    (ldm util: `x.float()`), which on TPU doubles the normalize pass's HBM
    traffic and peaks f32[B,512,512,C] temps at the VAE's full-res layers
    (observed OOM'ing the B=4 refine step). Flax computes the mean/var
    reductions in fp32 regardless of `dtype`, so normalizing in the input
    dtype keeps the fp32-stability rationale while halving the bytes; for
    fp32 inputs this is bit-identical to the reference behavior.
    """

    max_groups: int = 32
    epsilon: float = 1e-5
    silu: bool = False  # fuse the canonical GN->SiLU pair into one pass

    @nn.compact
    def __call__(self, x):
        groups = find_denominator(x.shape[-1], self.max_groups)
        # name="GroupNorm_0" keeps the param path identical to the stock
        # nn.GroupNorm child, so checkpoints/converter maps are unaffected.
        return _FusableGroupNorm(
            num_groups=groups, epsilon=self.epsilon, dtype=x.dtype,
            fuse_silu=self.silu, name="GroupNorm_0",
        )(x)


def _fused_gn_mode() -> str | None:
    """RDEIC_FUSED_GN: "1"/"hybrid" -> stock XLA forward + Pallas backward
    (the measured winner on the v5e: the Pallas backward is 1.4-6x faster
    per shape while XLA's in-situ forward fusion beats the Pallas forward
    — tools/gn_bench.py round-5 sweep); "full" -> Pallas both directions
    (single-visit forward, for forward-dominated experiments); unset/0 ->
    stock flax."""
    v = os.environ.get("RDEIC_FUSED_GN", "")
    if v in ("1", "hybrid"):
        return "hybrid"
    if v == "full":
        return "full"
    return None


class _FusableGroupNorm(nn.GroupNorm):
    """nn.GroupNorm that dispatches to the single-pass Pallas kernel
    (ops/fused_groupnorm.py) when RDEIC_FUSED_GN=1, the backend is TPU and
    the slab fits VMEM. Param creation (names, shapes, init) is inherited
    from flax, so both paths share identical parameters.

    Differentiable (custom_vjp single-pass backward), so training runs may
    opt in too; the flag defaults off so stock XLA remains the baseline.

    `fuse_silu` folds the UNet's canonical GroupNorm->SiLU pair into the
    kernel's single pass; the stock path applies jax.nn.silu after the
    flax GroupNorm (identical math either way).
    """

    fuse_silu: bool = False

    @nn.compact
    def __call__(self, x, *, mask=None):
        from rdeic_tpu.ops import fused_groupnorm  # noqa: PLC0415

        # RDEIC_FUSED_GN_INTERPRET=1 exercises the fused dispatch on CPU
        # via the Pallas interpreter (tests only).
        interpret = os.environ.get("RDEIC_FUSED_GN_INTERPRET") == "1"
        mode = _fused_gn_mode()
        if (
            self.is_initializing()
            or mask is not None
            or mode is None
            or (jax.default_backend() != "tpu" and not interpret)
            or not fused_groupnorm.supported(x.shape, x.dtype)
        ):
            y = super().__call__(x, mask=mask)
            return jax.nn.silu(y) if self.fuse_silu else y
        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), self.param_dtype)
        bias = self.param("bias", self.bias_init, (c,), self.param_dtype)
        fn = (fused_groupnorm.group_norm_hybrid if mode == "hybrid"
              else fused_groupnorm.group_norm)
        return fn(
            x, scale, bias, groups=self.num_groups, eps=self.epsilon,
            silu=self.fuse_silu, interpret=interpret,
        )


def zero_init_conv(features: int, kernel: int = 1, padding: int = 0):
    """Conv initialized to zero (ControlNet-style zero module)."""
    return nn.Conv(
        features,
        (kernel, kernel),
        padding=[(padding, padding), (padding, padding)],
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
    )


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def leaky_relu(x, slope: float = 0.01):
    return jnp.where(x >= 0, x, slope * x)
