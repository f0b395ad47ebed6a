"""Single-pass fused GroupNorm (+ optional SiLU) Pallas kernel for TPU.

Role parity: the reference's GroupNorm32 / `Normalize` layers
(ldm normalization helpers; /root/reference/model/rdeic.py:464-485) lower
on XLA to a two-pass program — one HBM read for the mean/var reduction,
then a second read + write for the normalize(+activation) pass — i.e.
3 slab traversals. This kernel holds one batch item's full (H, W, C) slab
in VMEM, computes fp32 group statistics and the normalized output in a
single visit: 1 read + 1 write, cutting the layer's HBM traffic by ~1/3.
The train-step roofline analysis (BENCHLOG "Train MFU" entry) identified
exactly this two-pass GroupNorm traffic as part of the HBM-bound gap.

Design notes (TPU/Mosaic friendly):
- grid is (B,) only; the block is the whole (1, H, W, C) slab, so C stays
  the minor (lane) dimension at its natural 128-multiple widths. No
  narrow C/G-wide strided loads.
- per-group sums are computed with tiny one-hot matmuls against a (C, G)
  assignment matrix (and its (G, C) transpose for the broadcast back),
  so nothing ever reshapes along the lane dimension.
- statistics accumulate in fp32; the normalize itself runs in the input
  dtype, matching GroupNorm32's input-dtype-normalize semantics.

Only slabs that fit VMEM qualify (`supported()`); callers fall back to
the stock flax GroupNorm otherwise (e.g. the VAE's 512x512 layers).

Forward-only: training paths must not enable it (no custom_vjp yet) —
it is wired opt-in via RDEIC_FUSED_GN=1 for the inference/serving CLIs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# in-slab (bf16) + out-slab + fp32 reduction temps must fit ~16 MB VMEM;
# 4 MB of raw slab bytes keeps the worst case (fp32 in/out) comfortable.
_MAX_SLAB_BYTES = 4 * 1024 * 1024


def supported(shape, dtype) -> bool:
    """True if a (B, H, W, C) activation qualifies for the fused kernel."""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    itemsize = jnp.dtype(dtype).itemsize
    if h * w * c * itemsize > _MAX_SLAB_BYTES:
        return False
    # lane dim must tile cleanly; every SD/control width is a 128-multiple
    # except the narrowest control levels — let those fall back too.
    return c % 128 == 0 and (h * w) % 8 == 0


def _gn_kernel(x_ref, a_ref, at_ref, sc_ref, bi_ref, o_ref, *, hw, cg, eps,
               silu):
    x2d = x_ref[0].reshape(hw, x_ref.shape[-1])
    xf = x2d.astype(jnp.float32)
    colsum = jnp.sum(xf, axis=0, keepdims=True)            # (1, C)
    colsq = jnp.sum(xf * xf, axis=0, keepdims=True)        # (1, C)
    n = float(hw * cg)
    s_g = jnp.dot(colsum, a_ref[...])                      # (1, G)
    ss_g = jnp.dot(colsq, a_ref[...])                      # (1, G)
    mean_g = s_g / n
    var_g = ss_g / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, at_ref[...])                  # (1, C)
    inv_c = jnp.dot(inv_g, at_ref[...])                    # (1, C)
    w = inv_c * sc_ref[...].astype(jnp.float32)            # (1, C)
    off = bi_ref[...].astype(jnp.float32) - mean_c * w     # (1, C)
    y = xf * w + off
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.reshape(x_ref.shape[1:]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "silu", "interpret"))
def group_norm(x, scale, bias, *, groups: int, eps: float = 1e-5,
               silu: bool = False, interpret: bool = False):
    """Fused single-pass GroupNorm(+SiLU) over NHWC `x`.

    `scale`/`bias` are the flax GroupNorm (C,) parameters. Matches
    nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=x.dtype) followed by
    (optionally) SiLU, with fp32 statistics.
    """
    b, h, w, c = x.shape
    assert c % groups == 0, (c, groups)
    cg = c // groups
    # one-hot channel->group assignment (C, G) and its transpose, baked as
    # constants (tiny: C x 32 fp32).
    a = np.zeros((c, groups), dtype=np.float32)
    a[np.arange(c), np.arange(c) // cg] = 1.0
    a = jnp.asarray(a)
    kernel = functools.partial(_gn_kernel, hw=h * w, cg=cg, eps=eps,
                               silu=silu)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((c, groups), lambda i: (0, 0)),
            pl.BlockSpec((groups, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, a, a.T, scale.reshape(1, c), bias.reshape(1, c))
