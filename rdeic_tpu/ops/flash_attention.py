"""Pallas flash attention for TPU (the xformers replacement).

Role parity: MemoryEfficientCrossAttention (xformers CUDA) in
ldm/modules/attention.py:206-253. This is a streaming-softmax (FlashAttention
-style) kernel: query blocks live in VMEM, K/V are consumed in chunks with a
running max/denominator, so the [L, L] score matrix never materializes in
HBM. Matmuls hit the MXU with fp32 accumulation; softmax math stays fp32.

Used for the UNet self-attention (L = h*w up to ~10k tokens). Cross
attention to the 77-token text context stays on the XLA path (tiny K).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, block_k,
    seq_len,
):
    """One (head, q-block, k-block) grid step.

    The k dimension is the LAST grid axis with ARBITRARY semantics: TPU
    executes it sequentially, so the running max / denominator / accumulator
    live in VMEM scratch across k steps. Only one [block_k, D] K/V tile is
    resident at a time — whole-sequence K/V residency VMEM-OOMs at D=512
    (the VAE mid-block: 2 x 6 MB x double-buffering > 16 MB VMEM).
    """
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
        o_ref[0] = (
            acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-30)
        ).astype(o_ref.dtype)


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """q/k/v: [B, L, H, D] -> [B, L, H, D]. Pallas forward; the backward
    pass recomputes attention through the XLA path (same memory profile as
    standard attention-with-recompute; a dedicated backward kernel is a
    later optimization).

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
    return _flash_forward(q, k, v, **_best_blocks(q)), (q, k, v)


def _flash_bwd(res, g):
    from rdeic_tpu.ops.attention import sdp_attention  # noqa: PLC0415

    q, k, v = res
    _, vjp = jax.vjp(sdp_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 256,
    block_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """q/k/v: [B, L, H, D] -> [B, L, H, D] (self attention, no mask)."""
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

    grid = (b * h, lq_p // block_q, lk_p // block_k)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, block_k=block_k, seq_len=lk
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, nk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, nk: (i, nk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, nk: (i, nk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, nk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running denominator
            pltpu.VMEM((block_q, d), jnp.float32),  # output accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.GridDimensionSemantics.PARALLEL,
                pltpu.GridDimensionSemantics.PARALLEL,
                pltpu.GridDimensionSemantics.ARBITRARY,
            ),
        ),
        interpret=interpret,
    )(qh, kh, vh)
    out = out[:, :lq, :].reshape(b, h, lq, d).transpose(0, 2, 1, 3)
    return out
