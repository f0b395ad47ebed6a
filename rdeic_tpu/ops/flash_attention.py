"""Pallas flash attention for TPU (the xformers replacement).

Role parity: MemoryEfficientCrossAttention (xformers CUDA) in
ldm/modules/attention.py:206-253. This is a streaming-softmax (FlashAttention
-style) kernel: query blocks live in VMEM, K/V are consumed in chunks with a
running max/denominator, so the [L, L] score matrix never materializes in
HBM. Matmuls hit the MXU with fp32 accumulation; softmax math stays fp32.

Used for the UNet self-attention (L = h*w up to ~10k tokens). Cross
attention to the 77-token text context stays on the XLA path (tiny K).

Backward: dedicated Pallas kernels (dq pass + dk/dv pass) that recompute
the score tiles from the forward's saved logsumexp, FlashAttention-v1
style. The XLA-recompute fallback (materializes the full [L, L] matrix —
~2.7 GB fp32 at the 512px training shapes) remains behind
RDEIC_FLASH_XLA_BWD=1 for debugging.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, *rest, scale, block_k, seq_len,
    save_residuals,
):
    """One (head, q-block, k-block) grid step.

    The k dimension is the LAST grid axis with ARBITRARY semantics: TPU
    executes it sequentially, so the running max / denominator / accumulator
    live in VMEM scratch across k steps. Only one [block_k, D] K/V tile is
    resident at a time — whole-sequence K/V residency VMEM-OOMs at D=512
    (the VAE mid-block: 2 x 6 MB x double-buffering > 16 MB VMEM).

    With save_residuals the kernel also emits lse = m + log(l) (shape
    [block_q, 128], broadcast along lanes) for the backward kernels; the
    inference program is compiled without it (no HBM residual traffic).
    """
    if save_residuals:
        lse_ref, m_ref, l_ref, acc_ref = rest
    else:
        m_ref, l_ref, acc_ref = rest
    nk = pl.program_id(2)

    @pl.when(nk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * scale  # [BQ, D]
    k = k_ref[0].astype(jnp.float32)  # [BK, D]
    v = v_ref[0].astype(jnp.float32)  # [BK, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, BK]
    # mask the zero-padded tail of the last chunk
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + nk * block_k
    s = jnp.where(col < seq_len, s, NEG_INF)
    m_prev = m_ref[:, :1]  # [BQ, 1] (stored broadcast along 128 lanes)
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(nk == pl.num_programs(2) - 1)
    def _finish():
        l_fin = l_ref[:, :1]
        o_ref[0] = (
            acc_ref[...] / jnp.maximum(l_fin, 1e-30)
        ).astype(o_ref.dtype)
        if save_residuals:
            lse = m_ref[:, :1] + jnp.log(jnp.maximum(l_fin, 1e-30))
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref[0].shape)


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """q/k/v: [B, L, H, D] -> [B, L, H, D]. Pallas forward and backward
    (dq + dkv kernels recomputing score tiles from the saved logsumexp —
    the [L, L] matrix never hits HBM in either direction).

    Block sizes from the v5e sweep (experiments/flash_block_sweep.py):
    1024/1024 wins at seq >= 4096 (5.9 ms at 40x6144xd64, 3.4 ms at
    8x6144xd512); 512/1024 wins at seq 1536 (1.22 ms vs 1.66 for
    1024/1024). Shorter sequences dispatch to sdp (ops/attention.py).
    """
    return _flash_forward(q, k, v, **_best_blocks(q))


def _best_blocks(q):
    """Sweep-derived (block_q, block_k) by seq len and head dim.

    bq=1024 only fits VMEM for narrow heads: at d=512 the compiler's
    scoped-vmem analysis hits 17.5M > 16M once the kernel sits inside the
    full VAE program (q/k/v tiles + [bq,bk] logits + fp32 accumulator +
    double buffering), so wide heads cap at bq=512 (3.79 ms vs the 3.44 ms
    1024/1024 ideal at 8x6144xd512 — 10% off best, but always compiles).
    """
    lq, d = q.shape[1], q.shape[3]
    bq = 1024 if (lq >= 4096 and d <= 128) else 512
    return {"block_q": bq, "block_k": 1024}


def _flash_fwd(q, k, v):
    out, lse = _flash_forward(
        q, k, v, save_residuals=True, **_best_blocks(q)
    )
    return out, (q, k, v, out, lse)


def _best_bwd_blocks(q):
    """Backward (block_q, block_k), env-overridable for sweeps
    (RDEIC_FLASH_BWD_BQ / RDEIC_FLASH_BWD_BK).

    Defaults from the round-5 bwd sweep (tools/flash_bwd_sweep_fast.py,
    v5e, fwd+bwd ms at B=8 seq=4096): d64 — 512/512 15.28, 1024/512
    15.10 (best), 512/1024 17.11; d16 — 512/512 13.67, 512/1024 11.62
    (best, -15%), 1024/512 11.87. Narrow heads want deeper k-blocks (the
    dq/dkv dots are output/contraction-lane starved at d=16, so fewer,
    larger k-tiles amortize the grid); d64 is VMEM-happier with the
    taller q-block. Blocks are clamped to seq (the kernel pads L up to
    the block otherwise)."""
    bq = int(os.environ.get("RDEIC_FLASH_BWD_BQ", "0"))
    bk = int(os.environ.get("RDEIC_FLASH_BWD_BK", "0"))
    lq, d = q.shape[1], q.shape[3]
    if not (bq and bk):
        bq, bk = (512, 1024) if d < 64 else (1024, 512)
    return {"block_q": min(bq, lq), "block_k": min(bk, lq)}


def _flash_bwd(res, g):
    q, k, v, out, lse = res
    if os.environ.get("RDEIC_FLASH_XLA_BWD") == "1":
        from rdeic_tpu.ops.attention import sdp_attention  # noqa: PLC0415

        _, vjp = jax.vjp(sdp_attention, q, k, v)
        return vjp(g)
    return _flash_backward(q, k, v, out, lse, g, **_best_bwd_blocks(q))


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("block_q", "block_k", "interpret", "save_residuals"),
)
def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
    save_residuals: bool = False,
) -> jnp.ndarray:
    """q/k/v: [B, L, H, D] -> [B, L, H, D] (self attention, no mask).

    With save_residuals, returns (out, lse) where lse[b*h, lq] is the
    softmax log-normalizer per query row (for the backward kernels).
    """
    b, lq, h, d = q.shape
    lk = k.shape[1]
    scale = d**-0.5

    # [B*H, L, D] layout; pad L to the block size
    def to_bhld(x, l):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, l, d)
        return x

    qh = to_bhld(q, lq)
    kh = to_bhld(k, lk)
    vh = to_bhld(v, lk)
    if lq < block_q:
        block_q = -(-lq // 8) * 8  # round small sequences up to a sublane
    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    if pad_q:
        qh = jnp.pad(qh, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        kh = jnp.pad(kh, ((0, 0), (0, pad_k), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, pad_k), (0, 0)))
    lq_p = lq + pad_q
    lk_p = lk + pad_k

    bh = b * h
    grid = (bh, lq_p // block_q, lk_p // block_k)
    out_shape = [jax.ShapeDtypeStruct((bh, lq_p, d), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda i, j, nk: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    if save_residuals:
        out_shape.append(jax.ShapeDtypeStruct((bh, lq_p, LANES), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, block_q, LANES), lambda i, j, nk: (i, j, 0),
                         memory_space=pltpu.VMEM)
        )
    res = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, seq_len=lk,
            save_residuals=save_residuals,
        ),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, nk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, nk: (i, nk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, nk: (i, nk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),  # running max
            pltpu.VMEM((block_q, LANES), jnp.float32),  # running denominator
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.GridDimensionSemantics.PARALLEL,
                pltpu.GridDimensionSemantics.PARALLEL,
                pltpu.GridDimensionSemantics.ARBITRARY,
            ),
        ),
        # declare the kernel's FLOPs (2 matmuls: QK^T and PV) so XLA
        # cost_analysis — and every MFU number derived from it — counts
        # pallas work instead of silently reporting it as zero
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * lq_p * lk_p * d,
            transcendentals=bh * lq_p * lk_p,
            bytes_accessed=(qh.size + kh.size + vh.size) * qh.dtype.itemsize,
        ),
        interpret=interpret,
    )(qh, kh, vh)
    out = res[0][:, :lq, :].reshape(b, h, lq, d).transpose(0, 2, 1, 3)
    if save_residuals:
        return out, res[1][:, :lq, 0]  # lse: [bh, lq]
    return out


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, dq_ref, acc_ref, *,
    scale, block_q, block_k, seq_q, seq_k,
):
    """dq pass: grid (head, q-block, k-block), k ARBITRARY (innermost).

    Recomputes the score tile from lse, accumulates dq across k steps in
    VMEM scratch: ds = p * (dO V^T - di), dq = scale * ds K.
    """
    j, nk = pl.program_id(1), pl.program_id(2)

    @pl.when(nk == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * block_q
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + nk * block_k
    p = jnp.exp(s - lse_ref[0][:, :1])
    p = jnp.where((row < seq_q) & (col < seq_k), p, 0.0)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    ds = p * (dp - di_ref[0][:, :1]) * scale
    acc_ref[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(nk == pl.num_programs(2) - 1)
    def _finish():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _dkv_kernel(
    k_ref, v_ref, q_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref,
    dk_acc, dv_acc, *, scale, block_q, block_k, seq_q, seq_k,
):
    """dk/dv pass: grid (head, k-block, q-block), q ARBITRARY (innermost).

    dv = P^T dO, dk = scale * dS^T Q accumulated across q steps in VMEM
    scratch (padded-k rows of the outputs are sliced off by the caller).
    """
    nq = pl.program_id(2)

    @pl.when(nq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + nq * block_q
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + pl.program_id(1) * block_k
    p = jnp.exp(s - lse_ref[0][:, :1])
    # mask padded q rows AND padded k cols: without the col mask, exp() on
    # garbage-k scores can overflow into the dk/dv accumulators (the caller
    # slices those rows off, but the kernel should be self-contained)
    p = jnp.where((row < seq_q) & (col < seq_k), p, 0.0)
    dv_acc[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, D]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, BK]
    ds = p * (dp - di_ref[0][:, :1]) * scale
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, D]

    @pl.when(nq == pl.num_programs(2) - 1)
    def _finish():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def _flash_backward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    out: jnp.ndarray,
    lse: jnp.ndarray,
    do: jnp.ndarray,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool = False,
):
    """Backward via two Pallas passes. q/k/v/out/do: [B, L, H, D];
    lse: [B*H, Lq] from the forward. Returns (dq, dk, dv) in [B, L, H, D].

    Backward blocks default to 512/512 (more live tiles than the forward:
    q, k, v, dO plus two accumulators — 1024-blocks exceed scoped VMEM at
    d=512)."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    scale = d**-0.5
    bh = b * h

    def to_bhld(x, l):
        return x.transpose(0, 2, 1, 3).reshape(bh, l, d)

    qh, kh, vh = to_bhld(q, lq), to_bhld(k, lk), to_bhld(v, lk)
    oh, doh = to_bhld(out, lq), to_bhld(do, lq)
    # di[r] = sum_d dO[r, d] * O[r, d] (the softmax-jacobian row term)
    di = jnp.sum(doh.astype(jnp.float32) * oh.astype(jnp.float32), axis=-1)

    if lq < block_q:
        block_q = -(-lq // 8) * 8
    if lk < block_k:
        block_k = -(-lk // 8) * 8
    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    if pad_q:
        zq = ((0, 0), (0, pad_q), (0, 0))
        qh = jnp.pad(qh, zq)
        doh = jnp.pad(doh, zq)
        lse = jnp.pad(lse, ((0, 0), (0, pad_q)))
        di = jnp.pad(di, ((0, 0), (0, pad_q)))
    if pad_k:
        zk = ((0, 0), (0, pad_k), (0, 0))
        kh = jnp.pad(kh, zk)
        vh = jnp.pad(vh, zk)
    lq_p, lk_p = lq + pad_q, lk + pad_k
    # row-wise terms broadcast along a 128-lane minor dim (kernels read
    # [:, :1]; a [L]-shaped operand has no TPU-friendly layout)
    lse_b = jnp.broadcast_to(lse[:, :, None], (bh, lq_p, LANES))
    di_b = jnp.broadcast_to(di[:, :, None], (bh, lq_p, LANES))

    nq, nk = lq_p // block_q, lk_p // block_k
    q_spec = pl.BlockSpec((1, block_q, d), lambda i, j, s: (i, j, 0),
                          memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, LANES), lambda i, j, s: (i, j, 0),
                            memory_space=pltpu.VMEM)
    kin_spec = pl.BlockSpec((1, block_k, d), lambda i, j, s: (i, s, 0),
                            memory_space=pltpu.VMEM)
    semantics = pltpu.CompilerParams(
        dimension_semantics=(
            pltpu.GridDimensionSemantics.PARALLEL,
            pltpu.GridDimensionSemantics.PARALLEL,
            pltpu.GridDimensionSemantics.ARBITRARY,
        ),
    )
    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, block_q=block_q, block_k=block_k,
            seq_q=lq, seq_k=lk,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, lq_p, d), q.dtype),
        grid=(bh, nq, nk),
        in_specs=[q_spec, kin_spec, kin_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=semantics,
        # 3 matmuls per tile (QK^T, dO V^T, dS K) — see _flash_forward's
        # cost_estimate note
        cost_estimate=pl.CostEstimate(
            flops=6 * bh * lq_p * lk_p * d,
            transcendentals=bh * lq_p * lk_p,
            bytes_accessed=2 * (qh.size + kh.size + vh.size)
            * qh.dtype.itemsize,
        ),
        interpret=interpret,
    )(qh, kh, vh, doh, lse_b, di_b)

    # dkv grid: (head, k-block, q-block); q/dO/lse/di stream along the
    # ARBITRARY axis, k/v/dk/dv stay pinned per (i, j)
    kpin_spec = pl.BlockSpec((1, block_k, d), lambda i, j, s: (i, j, 0),
                             memory_space=pltpu.VMEM)
    qstream_spec = pl.BlockSpec((1, block_q, d), lambda i, j, s: (i, s, 0),
                                memory_space=pltpu.VMEM)
    rowstream_spec = pl.BlockSpec(
        (1, block_q, LANES), lambda i, j, s: (i, s, 0),
        memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, block_q=block_q, block_k=block_k,
            seq_q=lq, seq_k=lk,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, lk_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, lk_p, d), v.dtype),
        ],
        grid=(bh, lk_p // block_k, nq),
        in_specs=[kpin_spec, kpin_spec, qstream_spec, qstream_spec,
                  rowstream_spec, rowstream_spec],
        out_specs=[kpin_spec, kpin_spec],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=semantics,
        # 4 matmuls per tile (QK^T, P^T dO, dO V^T, dS^T Q)
        cost_estimate=pl.CostEstimate(
            flops=8 * bh * lq_p * lk_p * d,
            transcendentals=bh * lq_p * lk_p,
            bytes_accessed=2 * (qh.size + kh.size + vh.size)
            * qh.dtype.itemsize,
        ),
        interpret=interpret,
    )(kh, vh, qh, doh, lse_b, di_b)

    def from_bhld(x, l):
        return x[:, :l, :].reshape(b, h, l, d).transpose(0, 2, 1, 3)

    return from_bhld(dq, lq), from_bhld(dk, lk), from_bhld(dv, lk)
