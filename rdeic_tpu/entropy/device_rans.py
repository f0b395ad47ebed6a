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


# ---------------------------------------------------------------------------
# v2 "shared-stream" lane format: all K lanes renormalize from ONE word
# stream, in the fixed phase order the scan below executes (symbol pulls
# lane-major, then bypass-chunk iterations lane-major). The C++ encoder's
# merge (csrc/rans.cpp rans_lanes_to_shared) wrote the words in exactly
# this order, so each lane's next word sits at ptr + (number of
# lower-numbered lanes pulling this phase) — an exclusive cumsum over the
# lane axis. Rate win vs the v1 per-lane layout: the container no longer
# stores K lane sizes (~4 bytes/lane) and lanes share the stream tail.
# ---------------------------------------------------------------------------


def shared_words_from_bytes(payload: bytes):
    """Shared-stream payload bytes -> (words [W] uint32 u16-words, count)."""
    arr = np.frombuffer(payload, np.uint8)
    n = arr.shape[0] // 2
    a = arr[: n * 2].astype(np.uint32)
    return a[0::2] | (a[1::2] << 8), n


def init_shared_state(words, nwords, k: int):
    """Mirror rans_shared_decoder_new: lane k's state = words[2k] (high)
    then words[2k+1] (low); words/nwords may carry leading batch dims."""
    head = words[..., : 2 * k].astype(jnp.uint32)
    # words past the stream end must read as zero-fill
    avail = jnp.arange(2 * k, dtype=jnp.int32) < nwords[..., None]
    head = jnp.where(avail, head, 0)
    state = (head[..., 0::2] << 16) | head[..., 1::2]
    ptr = jnp.full(nwords.shape, 2 * k, jnp.int32)
    return state, ptr


def decode_pass_shared(tables: DeviceRansTables, words, nwords, state, ptr,
                       idx, n_valid: int):
    """decode_pass for v2 shared-stream containers.

    words:  [..., W] uint32 shared word stream (leading dims = batch)
    nwords: [...] int32, ptr: [...] int32 (one cursor per image)
    state:  [..., K]; idx/n_valid as in decode_pass.
    """
    *batch, w_len = words.shape
    k = state.shape[-1]
    t_steps = idx.shape[-1] // k
    assert t_steps * k == idx.shape[-1]
    words_flat = words.reshape(-1)
    img_base = (jnp.arange(int(np.prod(batch, dtype=np.int64)),
                           dtype=jnp.int32).reshape(*batch) * w_len)

    def pull_many(st, pt, pull):
        """Conditionally pull one word per flagged lane from the shared
        stream, lane-major (the phase order every writer of this format
        follows). Past-end reads zero-fill; the cursor always advances."""
        pc = pull.astype(jnp.int32)
        offs = jnp.cumsum(pc, axis=-1) - pc  # exclusive, lane order
        pos = pt[..., None] + offs
        wd = _take(words_flat, img_base[..., None] + pos).astype(jnp.uint32)
        wd = jnp.where(pos < nwords[..., None], wd, jnp.uint32(0))
        st = jnp.where(pull, (st << 16) | wd, st)
        return st, pt + jnp.sum(pc, axis=-1)

    idx_steps = jnp.moveaxis(
        idx.reshape(*batch, t_steps, k), len(batch), 0
    )
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
        adv = (hi - lo) * (state >> _PROB_BITS) + cum - lo
        # fold the pad mask BEFORE the pull so invalid lanes neither pull
        # nor move the shared cursor
        state = jnp.where(valid, adv, state)
        state, ptr = pull_many(state, ptr, valid & (state < _RANS_L))

        max_value = _take(tables.lengths, cdf_idx) - 2
        esc = valid & (s == max_value)

        def esc_cond(c):
            return jnp.any(c[0])

        def esc_body(c):
            active, z, shift, st, pt = c
            bits = (st & jnp.uint32(0xF)).astype(jnp.int32)
            st = jnp.where(active, st >> 4, st)
            st, pt = pull_many(st, pt, active & (st < _RANS_L))
            z = jnp.where(active, z | ((bits & 7) << shift), z)
            shift2 = jnp.where(active, shift + 3, shift)
            cont = active & ((bits & 8) != 0) & (shift2 <= 30)
            return cont, z, shift2, st, pt

        z0 = jnp.zeros_like(s)
        sh0 = jnp.zeros_like(s)
        _, z, _, state, ptr = jax.lax.while_loop(
            esc_cond, esc_body, (esc, z0, sh0, state, ptr)
        )
        esc_v = jnp.where((z & 1) != 0, -(z >> 1) - 1, (z >> 1) + max_value)
        v = jnp.where(esc, esc_v, s)
        sym = v + _take(tables.offsets, cdf_idx)
        return (state, ptr), jnp.where(valid, sym, 0)

    (state, ptr), syms = jax.lax.scan(
        step, (state, ptr), (idx_steps, valid_steps)
    )
    syms = jnp.moveaxis(syms, 0, len(batch)).reshape(*batch, t_steps * k)
    return syms, (state, ptr)


# ---------------------------------------------------------------------------
# On-device (TPU) interleaved rANS ENCODING — the mirror of decode_pass.
#
# Motivation: the encode side of the multi-program codec pulls every pass's
# (symbols, indexes) to the host (~2 MB/image through a ~40 MB/s device
# link) just to run the host encoder. Encoding on device means only the
# COMPRESSED lane words cross the link (payload-sized: ~bpp/8 bytes/pixel).
#
# Bit-exactness: every emitted word matches csrc/rans.cpp encode_one /
# rans_encode_interleaved byte for byte (tests/test_device_rans.py pins
# payload == host payload). Two structural facts make this a cheap
# lax.scan (measured: in-scan table gathers and a per-step while_loop
# each cost more than the whole remaining step):
#   1. the rANS state is < 2^32, so each primitive (enc_symbol,
#      enc_raw-4-bit) renormalizes AT MOST ONE 16-bit word per call;
#   2. symbols are int16-guarded by the codec, so an escape's zigzag
#      payload z < 2^18 needs at most SIX 3-bit bypass chunks — and six
#      4-bit pushes (24 bits) can renormalize at most TWICE (the first
#      emission leaves x < 2^16; re-reaching the 2^28 threshold takes
#      three more pushes). Each step therefore emits at most 3 words
#      (2 chunk renorms + 1 slot renorm) at STATICALLY KNOWN relative
#      positions — one masked scatter per step, no control flow.
# All per-symbol table lookups (start/freq/escape payload) are gathered
# OUTSIDE the scan in one vectorized pass; the scan body is pure ALU.
# ---------------------------------------------------------------------------


def build_pass_steps(syms, idxs, k: int):
    """Stack per-pass flat [B, n_p] symbol/index arrays into step-major
    [T, B, K] scan inputs plus the validity mask (traceable; pads each
    pass to a multiple of K lanes so symbol j of a pass rides lane j%K,
    matching rans_encode_interleaved's striping)."""
    sym_steps, idx_steps, valid_steps = [], [], []
    b = syms[0].shape[0]
    for s, ix in zip(syms, idxs):
        n = int(np.prod(s.shape[1:]))
        s = s.reshape(b, n).astype(jnp.int32)
        ix = ix.reshape(b, n).astype(jnp.int32)
        pad = (-n) % k
        if pad:
            s = jnp.pad(s, ((0, 0), (0, pad)))
            ix = jnp.pad(ix, ((0, 0), (0, pad)))
        t = (n + pad) // k
        sym_steps.append(jnp.moveaxis(s.reshape(b, t, k), 1, 0))
        idx_steps.append(jnp.moveaxis(ix.reshape(b, t, k), 1, 0))
        valid = (jnp.arange(t * k, dtype=jnp.int32) < n).reshape(t, 1, k)
        valid_steps.append(jnp.broadcast_to(valid, (t, b, k)))
    return (
        jnp.concatenate(sym_steps, axis=0),
        jnp.concatenate(idx_steps, axis=0),
        jnp.concatenate(valid_steps, axis=0),
    )


def encode_lanes(tables: DeviceRansTables, sym_steps, idx_steps, valid_steps,
                 wcap: int):
    """Encode all passes' symbols onto [B, K] independent rANS lanes.

    sym/idx/valid: [T, B, K] (int32/int32/bool) in FORWARD stream order
    (build_pass_steps output). Returns (words [B, K, wcap] uint16 in emit
    order — stream order is the REVERSE, see assemble_lane_payloads —
    nwords [B, K] int32 incl. the 2-word state flush, and a scalar bool
    overflow flag; on overflow the words are unusable and the caller must
    fall back to the host encoder)."""
    t_tot, b, k = sym_steps.shape
    u32 = jnp.uint32

    # --- vectorized per-symbol precompute (all table gathers up front) ---
    cidx = idx_steps
    length = _take(tables.lengths, cidx)
    max_value = length - 2
    v = sym_steps - _take(tables.offsets, cidx)
    esc = valid_steps & ((v < 0) | (v >= max_value))
    slot = jnp.where(esc, max_value, jnp.clip(v, 0, max_value - 1))
    base = cidx * tables.max_len
    lo = _take(tables.cdf_flat, base + slot).astype(u32)
    hi = _take(tables.cdf_flat, base + slot + 1).astype(u32)
    start = lo
    # freq-1 fits uint16 even for a degenerate full-range slot
    freqm1 = (hi - lo - 1).astype(jnp.uint16)
    # zigzag_escape (csrc rans.cpp): overflow -> (v-max)<<1,
    # underflow -> ((-v-1)<<1)|1
    z = jnp.where(
        v >= max_value, (v - max_value) << 1, ((-v - 1) << 1) | 1
    ).astype(u32)
    z = jnp.where(esc, z, u32(0))
    # int16-guarded symbols keep z < 2^18 (6 chunks); anything wider is
    # unencodable by the 6-stage pipeline -> flag for the host fallback
    pre_ovf = jnp.any(z >> 18 != 0)
    # top chunk's shift: largest multiple of 3 with z >> shift != 0
    shift0 = jnp.zeros_like(sym_steps)
    for t in range(3, 18, 3):
        shift0 = jnp.where((z >> t) != 0, t, shift0)
    xs = (
        start.astype(jnp.uint16),
        freqm1,
        z,
        shift0.astype(jnp.int8),
        valid_steps,
        esc,
    )

    lane_base = (jnp.arange(b * k, dtype=jnp.int32).reshape(b, k) * wcap)
    oob = jnp.int32(b * k * wcap)
    thresh_raw = u32(1 << 28)

    def step(carry, inp):
        x, wptr, words, ovf = carry
        start16, fm1, z, sh0, valid, esc = inp
        start = start16.astype(u32)
        freq = fm1.astype(u32) + 1

        # --- bypass chunks, most-significant first, 6 unrolled stages;
        # stage j handles shift = shift0 - 3j while active (j*3 <= shift0).
        # At most TWO of the six enc_raw pushes renormalize (see header).
        sh0u = jnp.maximum(sh0, 0).astype(u32)
        ce = jnp.zeros_like(wptr)  # chunk words emitted so far (0..2)
        w_c0 = jnp.zeros_like(start16)
        w_c1 = jnp.zeros_like(start16)
        for j in range(6):
            sh = sh0u - u32(3 * j)
            active = esc & (sh0 >= 3 * j)
            bits = ((z >> jnp.where(active, sh, u32(0))) & 7) | (
                u32(8) if j else u32(0)
            )
            em = active & (x >= thresh_raw)
            w16 = (x & _MASK16).astype(jnp.uint16)
            w_c0 = jnp.where(em & (ce == 0), w16, w_c0)
            w_c1 = jnp.where(em & (ce == 1), w16, w_c1)
            ce = ce + em.astype(jnp.int32)
            x1 = jnp.where(em, x >> 16, x)
            x = jnp.where(active, (x1 << 4) | bits, x)

        # --- slot code (the symbol itself, or the escape slot) ---
        em_s = valid & ((x >> 16) >= freq)
        w_s = (x & _MASK16).astype(jnp.uint16)
        x1 = jnp.where(em_s, x >> 16, x)
        q = x1 // freq
        x = jnp.where(valid, (q << _PROB_BITS) + (x1 - q * freq) + start, x)

        # --- one scatter for the step's <= 3 emissions; emit order is
        # chunk words (processing order) then the slot renorm word ---
        has0 = ce >= 1
        has1 = ce >= 2
        p0 = wptr
        p1 = wptr + 1
        ps = wptr + ce
        flat = lane_base.reshape(-1)
        p0, p1, ps = p0.reshape(-1), p1.reshape(-1), ps.reshape(-1)
        pos = jnp.concatenate([
            jnp.where(has0.reshape(-1) & (p0 < wcap), flat + p0, oob),
            jnp.where(has1.reshape(-1) & (p1 < wcap), flat + p1, oob),
            jnp.where(em_s.reshape(-1) & (ps < wcap), flat + ps, oob),
        ])
        vals = jnp.concatenate(
            [w_c0.reshape(-1), w_c1.reshape(-1), w_s.reshape(-1)]
        )
        words = words.at[pos].set(vals, mode="drop")
        new_ptr = wptr + ce + em_s.astype(jnp.int32)
        ovf = ovf | jnp.any(new_ptr > wcap)
        return (x, new_ptr, words, ovf), None

    state0 = jnp.full((b, k), _RANS_L, u32)
    wptr0 = jnp.zeros((b, k), jnp.int32)
    words0 = jnp.zeros((b * k * wcap,), jnp.uint16)
    # rANS encodes in reverse so the decoder reads forward
    (state, wptr, words, ovf), _ = jax.lax.scan(
        step, (state0, wptr0, words0, pre_ovf), xs, reverse=True,
    )

    # flush: low word then high word (stream-order reversal puts high first,
    # matching Decoder::init's high-then-low read)
    def emit_word(words, wptr, w16, ovf):
        pos = jnp.where(wptr < wcap, lane_base + wptr, oob)
        words = words.at[pos.reshape(-1)].set(w16.reshape(-1), mode="drop")
        return words, wptr + 1, ovf | jnp.any(wptr >= wcap)

    words, wptr, ovf = emit_word(
        words, wptr, (state & _MASK16).astype(jnp.uint16), ovf
    )
    words, wptr, ovf = emit_word(
        words, wptr, (state >> 16).astype(jnp.uint16), ovf
    )
    return words.reshape(b, k, wcap), wptr, ovf


def assemble_lane_payloads(words_np: np.ndarray, nwords_np: np.ndarray):
    """[K, W] uint16 emit-order words + [K] counts -> (payload bytes,
    lane_nbytes int32[K]) in the exact rans_encode_interleaved layout:
    per lane, words reversed, each little-endian."""
    knum, wmax = words_np.shape
    nw = nwords_np.astype(np.int64)
    ar = np.arange(wmax, dtype=np.int64)
    src = nw[:, None] - 1 - ar[None, :]
    rev = np.take_along_axis(
        words_np, np.clip(src, 0, max(wmax - 1, 0)), axis=1
    ).astype(np.uint16)
    le = np.empty((knum, wmax, 2), np.uint8)
    le[..., 0] = rev & 0xFF
    le[..., 1] = rev >> 8
    flat = le.reshape(knum, wmax * 2)
    lane_nbytes = (nw * 2).astype(np.int32)
    payload = b"".join(
        flat[i, : lane_nbytes[i]].tobytes() for i in range(knum)
    )
    return payload, lane_nbytes


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
