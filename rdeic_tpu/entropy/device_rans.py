"""On-device (TPU) interleaved rANS decoding.

The multi-program decode chain pays ~2 device<->host round trips per
channel slice because the host rANS decoder sits between the entropy-
parameter programs (codec.py "Latency design"). This module removes the
host from the loop: the encoder (csrc/rans.cpp rans_encode_interleaved)
stripes each pass's symbols over K independent rANS lanes, and `decode_pass`
decodes all K lanes in lock-step INSIDE the jitted program — pure gathers
and integer ALU, vectorized over [batch, lanes]. The whole decompress then
compiles to ONE device program (entropy params -> symbols -> next slice),
with zero mid-chain transfers.

Bit-exactness: the per-symbol code (16-bit probabilities, 16-bit renorm
words, escape slot + 4-bit bypass chunks) is identical to the host coder —
`tests/test_device_rans.py` pins device output == host output symbol for
symbol. One deliberate divergence: the host decoder's renorm loop can spin
on CORRUPT streams (state 0 + zero-fill); the device pulls at most one
word per renorm, which is exactly equivalent for every well-formed stream
(after dec_advance the state is >= 1, so one 16-bit word always restores
state >= 2^16) and merely yields different garbage on corrupt input (both
remain crash-safe).

Rate cost: each lane flushes its own 32-bit final state, so interleaving
adds ~4*K bytes/stream (+2 bytes/lane from renorm granularity, in
practice). K=128 on a 768x512 image costs ~0.5 KB against ~40 KB payload.

Role parity: the reference has no analog (its GPU waits on the host coder,
compressai model/compression.py:215-273); this is TPU-native design, not a
translation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_PROB_BITS = 16
_RANS_L = jnp.uint32(1 << 16)
_MASK16 = jnp.uint32(0xFFFF)


class DeviceRansTables:
    """Device-resident CDF tables: flat quantized CDF, lengths, offsets and
    the cum->symbol LUT (built by the native library, so symbol resolution
    matches the host decoder bit for bit)."""

    def __init__(self, table):
        from .build import load_library  # noqa: PLC0415

        lib = load_library()
        ncdfs, max_len = table.ncdfs, table.max_len
        lut = np.empty(ncdfs * 65536, dtype=np.uint16)
        import ctypes  # noqa: PLC0415

        lib.rans_build_lut(
            table.cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            table.length.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ncdfs, max_len,
            lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        )
        self.ncdfs = ncdfs
        self.max_len = max_len
        self.cdf_flat = jnp.asarray(table.cdf.reshape(-1), jnp.int32)
        self.lengths = jnp.asarray(table.length, jnp.int32)
        self.offsets = jnp.asarray(table.offset, jnp.int32)
        self.lut_flat = jnp.asarray(lut.astype(np.int32))  # [ncdfs * 2^16]


def lanes_from_bytes(payload: bytes, lane_nbytes: np.ndarray):
    """Split the back-to-back lane bytes into a padded u32 word matrix.

    Returns (words [K, W] uint32 — each entry one little-endian u16 word —
    and nwords [K] int32)."""
    lane_nbytes = np.asarray(lane_nbytes, np.int64)
    k = lane_nbytes.shape[0]
    nwords = (lane_nbytes // 2).astype(np.int32)
    wmax = int(nwords.max()) if k else 0
    words = np.zeros((k, max(wmax, 2)), np.uint32)
    pos = 0
    for i in range(k):
        nb = int(lane_nbytes[i])
        lane = np.frombuffer(payload, np.uint8, nb, pos).astype(np.uint32)
        pos += nb
        w = lane[0::2] | (lane[1::2] << 8)
        words[i, : w.shape[0]] = w
    return words, nwords


def init_lane_state(words, nwords):
    """Mirror Decoder::init — state = first two u16 words (high, then low);
    words/nwords may carry leading batch dims."""
    state = ((words[..., 0].astype(jnp.uint32) << 16)
             | words[..., 1].astype(jnp.uint32))
    ptr = jnp.full(state.shape, 2, jnp.int32)
    # a lane too short to hold its flush words reads zero-fill like the host
    state = jnp.where(nwords >= 2, state, jnp.uint32(0))
    return state, ptr


def _take(flat, idx):
    return jnp.take(flat, idx, mode="clip")


def _renorm(state, ptr, words_flat, lane_base, nwords):
    """One conditional 16-bit pull (== the host loop on well-formed data)."""
    pull = (state < _RANS_L) & (ptr < nwords)
    w = _take(words_flat, lane_base + ptr).astype(jnp.uint32)
    state = jnp.where(pull, (state << 16) | w, state)
    return state, ptr + pull.astype(jnp.int32)


def decode_pass(tables: DeviceRansTables, words, nwords, state, ptr, idx,
                n_valid: int):
    """Decode one pass (e.g. a slice's anchor half) on device.

    words:  [..., K, W] uint32 lane words (leading dims = batch)
    nwords: [..., K] int32, state/ptr: [..., K]
    idx:    [..., T*K] int32 cdf indexes in the pass's flat symbol order
            (padded with zeros past n_valid)
    n_valid: static symbol count of this pass (<= T*K)

    Returns (symbols [..., T*K] int32 — entries past n_valid are zero —
    and the advanced (state, ptr))."""
    *batch, k, w = words.shape
    t_steps = idx.shape[-1] // k
    assert t_steps * k == idx.shape[-1]
    words_flat = words.reshape(-1)
    # flat base of each lane's word row, shaped like state
    lane_base = (jnp.arange(int(np.prod(batch, dtype=np.int64)) * k,
                            dtype=jnp.int32).reshape(*batch, k) * w)
    idx_steps = jnp.moveaxis(
        idx.reshape(*batch, t_steps, k), len(batch), 0
    )  # [T, ..., K]
    valid_steps = jnp.broadcast_to(
        (jnp.arange(t_steps * k, dtype=jnp.int32) < n_valid)
        .reshape(t_steps, *([1] * len(batch)), k),
        (t_steps, *batch, k),
    )

    def step(carry, inp):
        state, ptr = carry
        cdf_idx, valid = inp
        cum = state & _MASK16
        s = _take(tables.lut_flat,
                  (cdf_idx << _PROB_BITS) | cum.astype(jnp.int32))
        base = cdf_idx * tables.max_len
        lo = _take(tables.cdf_flat, base + s).astype(jnp.uint32)
        hi = _take(tables.cdf_flat, base + s + 1).astype(jnp.uint32)
        new_state = (hi - lo) * (state >> _PROB_BITS) + cum - lo
        new_state, new_ptr = _renorm(new_state, ptr, words_flat, lane_base,
                                     nwords)

        max_value = _take(tables.lengths, cdf_idx) - 2
        esc = valid & (s == max_value)

        def esc_cond(c):
            return jnp.any(c[0])

        def esc_body(c):
            active, z, shift, st, pt = c
            bits = (st & jnp.uint32(0xF)).astype(jnp.int32)
            st2 = st >> 4
            st2, pt2 = _renorm(st2, pt, words_flat, lane_base, nwords)
            z = jnp.where(active, z | ((bits & 7) << shift), z)
            shift2 = jnp.where(active, shift + 3, shift)
            cont = active & ((bits & 8) != 0) & (shift2 <= 30)
            st = jnp.where(active, st2, st)
            pt = jnp.where(active, pt2, pt)
            return cont, z, shift2, st, pt

        z0 = jnp.zeros_like(s)
        sh0 = jnp.zeros_like(s)
        _, z, _, new_state, new_ptr = jax.lax.while_loop(
            esc_cond, esc_body, (esc, z0, sh0, new_state, new_ptr)
        )
        # unzigzag_escape: odd -> -(z>>1)-1, even -> (z>>1)+max_value
        esc_v = jnp.where((z & 1) != 0, -(z >> 1) - 1, (z >> 1) + max_value)
        v = jnp.where(esc, esc_v, s)
        sym = v + _take(tables.offsets, cdf_idx)
        # invalid (pad) symbols consume nothing
        state = jnp.where(valid, new_state, state)
        ptr = jnp.where(valid, new_ptr, ptr)
        return (state, ptr), jnp.where(valid, sym, 0)

    (state, ptr), syms = jax.lax.scan(
        step, (state, ptr), (idx_steps, valid_steps)
    )
    syms = jnp.moveaxis(syms, 0, len(batch)).reshape(*batch, t_steps * k)
    return syms, (state, ptr)


def pad_pass_indexes(idx_flat, k: int):
    """Pad a pass's flat index vector to a multiple of K lanes (host-side
    numpy helper used by tests; the codec pads inside its jitted programs)."""
    n = idx_flat.shape[-1]
    t = -(-n // k)
    pad = t * k - n
    if pad:
        idx_flat = np.concatenate(
            [idx_flat, np.zeros((*idx_flat.shape[:-1], pad), idx_flat.dtype)],
            axis=-1,
        )
    return idx_flat, n
