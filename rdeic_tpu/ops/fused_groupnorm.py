"""Single-pass fused GroupNorm (+ optional SiLU) Pallas kernels for TPU.

Role parity: the reference's GroupNorm32 / `Normalize` layers
(ldm normalization helpers; /root/reference/model/rdeic.py:464-485) lower
on XLA to a two-pass program — one HBM read for the mean/var reduction,
then a second read + write for the normalize(+activation) pass — i.e.
3 slab traversals. These kernels hold one batch item's full (H, W, C)
slab in VMEM and compute fp32 group statistics and the normalized output
in a single visit: 1 read + 1 write forward; the backward likewise visits
(x, dy) once to produce dx and the batch-accumulated dscale/dbias.
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
- the forward saves only the (B, G) fp32 mean/inv-std; the backward
  reconstructs x_hat from x, so no extra slab-sized residual is stored.
- dscale/dbias accumulate into constant-index output blocks across the
  sequential batch grid (initialized at step 0).

Only slabs that fit VMEM qualify (`supported()`); callers fall back to
the stock flax GroupNorm otherwise (e.g. the VAE's 512x512 layers).
Differentiable via jax.custom_vjp; wired opt-in through RDEIC_FUSED_GN=1
in models/blocks.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# in/out (+dy in the backward) slabs plus fp32 reduction temps must fit
# ~16 MB VMEM; 4 MB of raw slab bytes keeps the worst case comfortable.
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


def _one_hot_assignment(c: int, groups: int) -> jnp.ndarray:
    cg = c // groups
    a = np.zeros((c, groups), dtype=np.float32)
    a[np.arange(c), np.arange(c) // cg] = 1.0
    return jnp.asarray(a)


def _gn_fwd_kernel(x_ref, a_ref, at_ref, sc_ref, bi_ref,
                   o_ref, mg_ref, ig_ref, *, hw, cg, eps, silu):
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
    mg_ref[...] = mean_g
    ig_ref[...] = inv_g
    mean_c = jnp.dot(mean_g, at_ref[...])                  # (1, C)
    inv_c = jnp.dot(inv_g, at_ref[...])                    # (1, C)
    w = inv_c * sc_ref[...].astype(jnp.float32)            # (1, C)
    off = bi_ref[...].astype(jnp.float32) - mean_c * w     # (1, C)
    y = xf * w + off
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.reshape(x_ref.shape[1:]).astype(o_ref.dtype)


def _gn_bwd_kernel(x_ref, dy_ref, a_ref, at_ref, sc_ref, bi_ref,
                   mg_ref, ig_ref, dx_ref, dsc_ref, dbi_ref,
                   *, hw, cg, silu):
    i = pl.program_id(0)
    c = x_ref.shape[-1]
    xf = x_ref[0].reshape(hw, c).astype(jnp.float32)
    dyf = dy_ref[0].reshape(hw, c).astype(jnp.float32)
    mean_c = jnp.dot(mg_ref[...], at_ref[...])             # (1, C)
    inv_c = jnp.dot(ig_ref[...], at_ref[...])              # (1, C)
    xhat = (xf - mean_c) * inv_c
    g = sc_ref[...].astype(jnp.float32)
    if silu:
        p = xhat * g + bi_ref[...].astype(jnp.float32)
        sig = jax.nn.sigmoid(p)
        dp = dyf * sig * (1.0 + p * (1.0 - sig))
    else:
        dp = dyf

    @pl.when(i == 0)
    def _init():
        dsc_ref[...] = jnp.zeros_like(dsc_ref)
        dbi_ref[...] = jnp.zeros_like(dbi_ref)

    dsc_ref[...] += jnp.sum(dp * xhat, axis=0, keepdims=True)
    dbi_ref[...] += jnp.sum(dp, axis=0, keepdims=True)

    dxh = dp * g                                           # (hw, C)
    n = float(hw * cg)
    m1_g = jnp.dot(jnp.sum(dxh, axis=0, keepdims=True), a_ref[...]) / n
    m2_g = jnp.dot(jnp.sum(dxh * xhat, axis=0, keepdims=True), a_ref[...]) / n
    m1_c = jnp.dot(m1_g, at_ref[...])
    m2_c = jnp.dot(m2_g, at_ref[...])
    dx = inv_c * (dxh - m1_c - xhat * m2_c)
    dx_ref[0] = dx.reshape(x_ref.shape[1:]).astype(dx_ref.dtype)


def _run_fwd(x, scale, bias, groups, eps, silu, interpret):
    b, h, w, c = x.shape
    cg = c // groups
    a = _one_hot_assignment(c, groups)
    kernel = functools.partial(_gn_fwd_kernel, hw=h * w, cg=cg, eps=eps,
                               silu=silu)
    slab = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0))
    const2d = lambda s: pl.BlockSpec(s, lambda i: (0, 0))  # noqa: E731
    y, mg, ig = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[slab, const2d((c, groups)), const2d((groups, c)),
                  const2d((1, c)), const2d((1, c))],
        out_specs=[slab, pl.BlockSpec((1, groups), lambda i: (i, 0)),
                   pl.BlockSpec((1, groups), lambda i: (i, 0))],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, groups), jnp.float32),
            jax.ShapeDtypeStruct((b, groups), jnp.float32),
        ],
        interpret=interpret,
    )(x, a, a.T, scale.reshape(1, c), bias.reshape(1, c))
    return y, mg, ig


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _group_norm_p(x, scale, bias, groups, eps, silu, interpret):
    y, _, _ = _run_fwd(x, scale, bias, groups, eps, silu, interpret)
    return y


def _group_norm_fwd(x, scale, bias, groups, eps, silu, interpret):
    y, mg, ig = _run_fwd(x, scale, bias, groups, eps, silu, interpret)
    return y, (x, scale, bias, mg, ig)


def _group_norm_bwd(groups, eps, silu, interpret, res, dy):
    x, scale, bias, mg, ig = res
    b, h, w, c = x.shape
    cg = c // groups
    a = _one_hot_assignment(c, groups)
    kernel = functools.partial(_gn_bwd_kernel, hw=h * w, cg=cg, silu=silu)
    slab = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0))
    const2d = lambda s: pl.BlockSpec(s, lambda i: (0, 0))  # noqa: E731
    dx, dsc, dbi = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[slab, slab, const2d((c, groups)), const2d((groups, c)),
                  const2d((1, c)), const2d((1, c)),
                  pl.BlockSpec((1, groups), lambda i: (i, 0)),
                  pl.BlockSpec((1, groups), lambda i: (i, 0))],
        out_specs=[slab, const2d((1, c)), const2d((1, c))],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, dy, a, a.T, scale.reshape(1, c), bias.reshape(1, c), mg, ig)
    return (dx,
            dsc.reshape(c).astype(scale.dtype),
            dbi.reshape(c).astype(bias.dtype))


_group_norm_p.defvjp(_group_norm_fwd, _group_norm_bwd)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "silu", "interpret"))
def group_norm(x, scale, bias, *, groups: int, eps: float = 1e-5,
               silu: bool = False, interpret: bool = False):
    """Fused single-pass GroupNorm(+SiLU) over NHWC `x`. Differentiable.

    `scale`/`bias` are the flax GroupNorm (C,) parameters. Matches
    nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=x.dtype) followed by
    (optionally) SiLU, with fp32 statistics.
    """
    assert x.shape[-1] % groups == 0, (x.shape, groups)
    return _group_norm_p(x, scale, bias, groups, eps, silu, interpret)
