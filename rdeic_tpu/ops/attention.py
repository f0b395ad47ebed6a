"""Attention ops: XLA fallback + Pallas flash attention (TPU).

Role parity: ldm/modules/attention.py CrossAttention /
MemoryEfficientCrossAttention (xformers CUDA) in the reference. On TPU the
fused path is a Pallas flash-attention kernel; the XLA path below is used on
CPU and as a reference implementation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sdp_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    fp32_softmax: bool = True,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    q: [B, Lq, H, D], k/v: [B, Lk, H, D] -> [B, Lq, H, D].
    Softmax is computed in float32 (the reference forces fp32 softmax for
    SD 2.1 numerical stability, ldm/modules/attention.py:153-204).
    """
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if fp32_softmax:
        logits = logits.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


def on_tpu() -> bool:
    import os  # noqa: PLC0415

    if os.environ.get("RDEIC_DISABLE_FLASH") == "1":
        return False
    backend = jax.default_backend()
    return backend in ("tpu", "axon")


def attention(q, k, v, *, allow_flash: bool = True):
    """Auto-dispatching attention: the Pallas flash kernel on TPU for
    long self-attention sequences, the fused XLA path otherwise.

    Threshold from the v5e block sweep (experiments/flash_block_sweep.py,
    B=8 per-call ms): seq 384 -> sdp 0.09 vs flash 0.60 (sdp wins 7x);
    seq 1536 -> flash 1.22 vs sdp 2.22; seq 6144 -> flash 5.9 vs sdp 423
    (d=64) and 3.4 vs 85 (d=512). Crossover sits between 384 and 1536;
    dispatch to flash at >= 1024 tokens.
    """
    lq, lk = q.shape[1], k.shape[1]
    if allow_flash and on_tpu() and lq == lk and lq >= 1024:
        from rdeic_tpu.ops.flash_attention import flash_attention  # noqa: PLC0415

        return flash_attention(q, k, v)
    return sdp_attention(q, k, v)
