"""Compression codec: real-bitstream encode/decode orchestration.

Behavioral parity: /root/reference/model/compression.py:151-273 (compress /
decompress) and utils/ckbd.py:76-141 — 10 channel slices, each coded as a
checkerboard anchor pass then a non-anchor pass; the hyper latent is coded
as fixed-width VQ indices; GaussianConditional CDF tables index the rANS
coder.

Determinism design (replaces the reference's cudnn-determinism toggles,
model/compression.py:156,209): the encode path calls EXACTLY the same jitted
per-pass programs as the decode path, with bit-identical inputs (z_q is
re-derived from the coded indices on both sides; y_hat halves are rebuilt
from integer symbols + means on both sides). Same program + same inputs on
the same device => bit-identical entropy parameters, so the decoder always
sees the CDF indexes the encoder used.

Latency design (the tunnel/dispatch overhead per device call dominates the
sandbox): each slice is THREE shared programs —
  A: (hyper, y_hat_prev)            -> anchor means/indexes (+ channel ctx)
  B: (anchor symbols, A outputs)    -> anchor half + nonanchor means/indexes
  C: (nonanchor symbols, B outputs) -> y_hat_prev extended
The encode side adds tiny round() symbol programs and defers ALL device->
host pulls to the end (JAX async dispatch runs the whole device chain
without blocking); the decode side is inherently host-interactive (the rANS
stream feeds pass k+1), costing 2 pulls + 2 pushes per slice.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from rdeic_tpu.entropy.coder import (
    BufferedRansEncoder,
    CdfTable,
    RansDecoder,
    pack_uniform,
    unpack_uniform,
)
from rdeic_tpu.models.compression import CompressionModel
from rdeic_tpu.ops import ckbd
from rdeic_tpu.ops import gaussian as g


import threading

_CALLBACK_SUPPORT: dict = {}

# symbols cross the device<->host boundary as int16 (the tunnel is the
# bottleneck of the multi-program codec); these guards turn a would-be
# silent wrap into a loud failure. Symbols are round(y - mean) residuals,
# orders of magnitude inside the bound for any real activation.
_SYM_I16_MAX = 32766


def _check_sym_range(maxabs_list) -> None:
    worst = max((int(m) for m in maxabs_list), default=0)
    if worst > _SYM_I16_MAX:
        raise OverflowError(
            f"entropy symbol magnitude {worst} exceeds the int16 transfer "
            f"range — refusing to write a corrupt bitstream"
        )


def _sym_i16(sym: np.ndarray) -> jnp.ndarray:
    if sym.size and int(np.abs(sym).max()) > _SYM_I16_MAX:
        raise OverflowError(
            "decoded entropy symbol exceeds the int16 transfer range — "
            "stream does not match this codec's encode path"
        )
    return jnp.asarray(sym.astype(np.int16))


def host_callbacks_supported() -> bool:
    """Probe whether the default backend supports jax host callbacks.

    (The axon PJRT tunnel reports UNIMPLEMENTED for send/recv callbacks;
    real TPU/CPU backends support them.)
    """
    backend = jax.default_backend()
    if backend not in _CALLBACK_SUPPORT:
        try:
            x = jnp.zeros((1,), jnp.int32)
            fn = jax.jit(
                lambda a: jax.pure_callback(
                    lambda v: np.asarray(v), jax.ShapeDtypeStruct((1,), jnp.int32), a
                )
            )
            jax.block_until_ready(fn(x))
            _CALLBACK_SUPPORT[backend] = True
        except Exception:
            _CALLBACK_SUPPORT[backend] = False
    return _CALLBACK_SUPPORT[backend]


class CompressionCodec:
    """Stateful wrapper: model def + params + CDF tables + jitted passes.

    fused=True routes compress/decompress through ONE shared jitted program
    whose symbol source is a host `pure_callback` (round() on encode, rANS
    stream on decode). Both directions execute the identical compiled
    program, so entropy parameters are bit-identical by construction, and
    per-image device dispatches drop from ~50 to ~5.
    """

    def __init__(self, model: CompressionModel, params, fused: bool = False,
                 lanes: int = 0):
        self.model = model
        self.params = params
        self.fused = fused
        # lanes > 0 enables interleaved-lane streams decoded ON DEVICE
        # (entropy/device_rans.py): the whole decompress chain becomes one
        # jitted program with zero mid-chain host round trips
        self.lanes = int(lanes)
        # device-side rANS ENCODE on the lanes path (symbols never leave
        # the device; only compressed lane words cross the link).
        # RDEIC_RANS_DEVICE_ENC=1 opts in; default is the HOST encoder:
        # on this chip's ~40 MB/s link the ~1.2 MB/image symbol pull +
        # host encode (~45 ms) still beats the in-jit encode scan
        # (~69 ms/image — BENCHLOG round-4 A/B). The device path wins
        # when the link is an order slower or host CPU is saturated;
        # capacity overflow auto-falls-back per batch either way.
        import os  # noqa: PLC0415

        self.device_enc = bool(self.lanes) and (
            os.environ.get("RDEIC_RANS_DEVICE_ENC", "0") == "1"
        )
        # v2 "shared-stream" containers are the default write format on the
        # lanes path: one merged word stream (csrc rans_lanes_to_shared), no
        # per-lane size table — ~4 B/lane of container overhead dropped.
        # RDEIC_RANS_SHARED=0 reverts to v1. Decode accepts both (versioned
        # header).
        self.shared = os.environ.get("RDEIC_RANS_SHARED", "1") == "1"
        # Adaptive lane count (round-4 verdict weak #3: fixed 128-lane flush
        # is ~40% rate inflation at extreme-compression payloads): shrink K
        # by powers of 2 until the residual lane overhead (~4K+4 B of state
        # flush + tag) is under this percentage of the measured payload.
        # 0 disables (always the configured K).
        self.auto_lanes_pct = float(
            os.environ.get("RDEIC_RANS_OVERHEAD_PCT", "2.0")
        )
        # Streams whose K lands below this decode on the HOST (shared-
        # stream C++ decoder): at small K the device scan's serial length
        # n/K dominates, while the host coder runs ~65 Msym/s regardless.
        self.device_min_lanes = int(
            os.environ.get("RDEIC_RANS_DEVICE_MIN_LANES", "32")
        )
        scale_table = g.get_scale_table()
        self.scale_table = scale_table
        cdf, lengths, offsets = g.build_cdf_tables(scale_table)
        self.table = CdfTable(cdf, lengths, offsets)
        # the pure_callback may run on an XLA worker thread, so the active
        # coder is an instance slot guarded by a lock (one fused program
        # execution at a time per codec instance)
        self._active_coder = None
        self._fused_lock = threading.Lock()
        self._build_jitted()
        if fused:
            self._build_fused()
        if self.lanes:
            self._build_interleaved()

    # ------------------------------------------------------------------
    def _build_jitted(self):
        model = self.model

        @jax.jit
        def analyze(params, x):
            """Encode-only: y slices (squeezed halves) + VQ indices + hyper."""
            y, z = model.apply(params, x, method=CompressionModel.analyze)
            _, indices = model.apply(params, z, method=CompressionModel.vq_quant)
            z_q = model.apply(params, indices, method=CompressionModel.vq_lookup)
            hyper = model.apply(params, z_q, method=CompressionModel.hyper_decode)
            return y, indices, hyper

        @jax.jit
        def hyper_from_indices(params, indices):
            z_q = model.apply(params, indices, method=CompressionModel.vq_lookup)
            return model.apply(params, z_q, method=CompressionModel.hyper_decode)

        def pass_a(params, idx, hyper, y_hat_prev):
            """Anchor entropy params for slice idx (shared encode/decode).

            indexes leave the program as uint8: the scale table has 64
            levels, and the multi-program chain pulls every index tensor
            through the remote-TPU tunnel (~40 MB/s) — int32 made the
            batched decompress bandwidth-bound. Values are unchanged, so
            bitstreams stay byte-identical.
            """
            scales, means, channel_ctx = model.apply(
                params, idx, hyper, y_hat_prev,
                method=CompressionModel.params_anchor,
            )
            means_sq = ckbd.ckbd_anchor_squeeze(means)
            indexes = g.build_indexes(
                ckbd.ckbd_anchor_squeeze(scales), self.scale_table
            ).astype(jnp.uint8)
            return means_sq, indexes, channel_ctx

        def pass_b(params, idx, sym_a, means_a_sq, hyper, channel_ctx):
            """Dequantize the anchor half, compute non-anchor entropy params
            (shared encode/decode)."""
            anchor_half = ckbd.ckbd_anchor_unsqueeze(
                sym_a.astype(jnp.float32) + means_a_sq
            )
            scales, means = model.apply(
                params, idx, hyper, channel_ctx, anchor_half,
                method=CompressionModel.params_nonanchor,
            )
            means_sq = ckbd.ckbd_nonanchor_squeeze(means)
            indexes = g.build_indexes(
                ckbd.ckbd_nonanchor_squeeze(scales), self.scale_table
            ).astype(jnp.uint8)
            return anchor_half, means_sq, indexes

        def pass_c(params, sym_na, means_na_sq, anchor_half, y_hat_prev):
            """Assemble the slice and extend y_hat_prev (shared)."""
            nonanchor_half = ckbd.ckbd_nonanchor_unsqueeze(
                sym_na.astype(jnp.float32) + means_na_sq
            )
            y_hat_slice = anchor_half + nonanchor_half
            if y_hat_prev is None:
                return y_hat_slice
            return jnp.concatenate([y_hat_prev, y_hat_slice], axis=-1)

        def pass_ca(params, idx, sym_na, means_na_sq, anchor_half, y_hat_prev,
                    hyper):
            """pass_c of slice idx-1 fused with pass_a of slice idx: one
            dispatch instead of two on the host-interactive decode chain."""
            y_hat_prev = pass_c(
                params, sym_na, means_na_sq, anchor_half, y_hat_prev
            )
            means_sq, indexes, channel_ctx = pass_a(
                params, idx, hyper, y_hat_prev
            )
            return y_hat_prev, means_sq, indexes, channel_ctx

        def pass_c_synth(params, sym_na, means_na_sq, anchor_half, y_hat_prev):
            """Final slice's pass_c fused with the synthesis decoder."""
            y_hat = pass_c(params, sym_na, means_na_sq, anchor_half, y_hat_prev)
            return model.apply(params, y_hat, method=CompressionModel.synthesize)

        # encode-only: integer symbols for a squeezed half. int16 halves
        # the symbol bytes pulled through the tunnel; the companion maxabs
        # scalar lets the caller verify nothing was truncated (symbols are
        # y - mean residuals, far inside int16 for any real activation —
        # but a silent wrap would corrupt the stream, so encode aborts
        # loudly instead).
        @partial(jax.jit, static_argnames=("anchor", "lo", "hi"))
        def symbols_from(y, means_sq, anchor: bool, lo: int, hi: int):
            y_slice = y[..., lo:hi]
            half = (
                ckbd.ckbd_anchor_squeeze(y_slice)
                if anchor
                else ckbd.ckbd_nonanchor_squeeze(y_slice)
            )
            sym = jnp.round(half - means_sq).astype(jnp.int32)
            return sym.astype(jnp.int16), jnp.max(jnp.abs(sym))

        @jax.jit
        def synthesize(params, y_hat):
            return model.apply(params, y_hat, method=CompressionModel.synthesize)

        self._analyze = analyze
        self._hyper = hyper_from_indices
        # one jitted program per (slice, phase) — the SAME objects are used
        # by compress and decompress for bit-determinism. The hot decode
        # chain uses two dispatches per slice: B (anchor->nonanchor params)
        # and CA (slice assembly fused with the NEXT slice's anchor params);
        # the final assembly is fused with the synthesis decoder.
        n = model.slice_num
        self._pass_a0 = jax.jit(partial(pass_a, idx=0))
        self._pass_b = [jax.jit(partial(pass_b, idx=i)) for i in range(n)]
        self._pass_ca = [None] + [
            jax.jit(partial(pass_ca, idx=i)) for i in range(1, n)
        ]
        self._pass_c = jax.jit(pass_c)
        self._pass_c_synth = jax.jit(pass_c_synth)
        self._symbols = symbols_from
        self._synthesize = synthesize

    # ------------------------------------------------------------------
    # fused single-program path (pure_callback symbol source)
    # ------------------------------------------------------------------
    def _build_fused(self):
        model = self.model
        bounds = self._slice_bounds()

        def symbol_cb(y_half_sq, means_sq, indexes):
            """Host symbol source; dispatched to the active coder."""
            impl = self._active_coder
            return impl(
                np.asarray(y_half_sq), np.asarray(means_sq), np.asarray(indexes)
            )

        def entropy_program(params, hyper, y):
            """All 10 slices x (anchor, nonanchor); y is zeros on decode."""
            y_hat_prev = None
            for i, (lo, hi) in enumerate(bounds):
                y_slice = y[..., lo:hi]
                scales_a, means_a, channel_ctx = model.apply(
                    params, i, hyper, y_hat_prev,
                    method=CompressionModel.params_anchor,
                )
                means_a_sq = ckbd.ckbd_anchor_squeeze(means_a)
                idx_a = g.build_indexes(
                    ckbd.ckbd_anchor_squeeze(scales_a), self.scale_table
                )
                y_a_sq = ckbd.ckbd_anchor_squeeze(y_slice)
                sym_a = jax.pure_callback(
                    symbol_cb,
                    jax.ShapeDtypeStruct(y_a_sq.shape, jnp.int32),
                    y_a_sq, means_a_sq, idx_a,
                )
                anchor_half = ckbd.ckbd_anchor_unsqueeze(
                    sym_a.astype(jnp.float32) + means_a_sq
                )
                scales_na, means_na = model.apply(
                    params, i, hyper, channel_ctx, anchor_half,
                    method=CompressionModel.params_nonanchor,
                )
                means_na_sq = ckbd.ckbd_nonanchor_squeeze(means_na)
                idx_na = g.build_indexes(
                    ckbd.ckbd_nonanchor_squeeze(scales_na), self.scale_table
                )
                y_na_sq = ckbd.ckbd_nonanchor_squeeze(y_slice)
                sym_na = jax.pure_callback(
                    symbol_cb,
                    jax.ShapeDtypeStruct(y_na_sq.shape, jnp.int32),
                    y_na_sq, means_na_sq, idx_na,
                )
                nonanchor_half = ckbd.ckbd_nonanchor_unsqueeze(
                    sym_na.astype(jnp.float32) + means_na_sq
                )
                y_hat_slice = anchor_half + nonanchor_half
                y_hat_prev = (
                    y_hat_slice
                    if y_hat_prev is None
                    else jnp.concatenate([y_hat_prev, y_hat_slice], axis=-1)
                )
            return y_hat_prev

        self._entropy_program = jax.jit(entropy_program)

    def _compress_fused(self, x) -> dict:
        params = self.params
        y, indices, _ = self._analyze(params, x)
        indices_np = np.asarray(indices)
        # SAME hyper program as decode (bit-exactness)
        hyper = self._hyper(params, jnp.asarray(indices_np))

        recorded: list[tuple[np.ndarray, np.ndarray]] = []

        def encode_coder(y_half_sq, means_sq, indexes):
            sym = np.round(y_half_sq - means_sq).astype(np.int32)
            recorded.append((sym, indexes))
            return sym

        with self._fused_lock:
            self._active_coder = encode_coder
            try:
                y_hat = self._entropy_program(params, hyper, y)
                jax.block_until_ready(y_hat)
            finally:
                self._active_coder = None
        enc = BufferedRansEncoder()
        for sym, idx in recorded:
            enc.encode_with_indexes(sym, idx)
        y_string = enc.flush(self.table)
        z_string = pack_uniform(indices_np, self.model.codebook_size)
        zh, zw = indices_np.shape[1], indices_np.shape[2]
        return {"strings": [[y_string], [z_string]], "shape": (zh, zw)}

    def _decompress_fused(self, strings, shape):
        params = self.params
        zh, zw = int(shape[0]), int(shape[1])
        indices = unpack_uniform(
            strings[1][0], zh * zw, self.model.codebook_size
        ).reshape(1, zh, zw)
        hyper = self._hyper(params, jnp.asarray(indices))
        dec = RansDecoder()
        dec.set_stream(strings[0][0])

        def decode_coder(y_half_sq, means_sq, indexes):
            sym = dec.decode_stream(indexes, self.table)
            return sym.reshape(indexes.shape).astype(np.int32)

        # y placeholder: zeros with the encoder-side y shape
        b = hyper.shape[0]
        yh, yw = hyper.shape[1], hyper.shape[2]
        y_zeros = jnp.zeros((b, yh, yw, self.model.M), jnp.float32)
        with self._fused_lock:
            self._active_coder = decode_coder
            try:
                y_hat = self._entropy_program(params, hyper, y_zeros)
                jax.block_until_ready(y_hat)
            finally:
                self._active_coder = None
                dec.close()
        return self._synthesize(params, y_hat)

    # ------------------------------------------------------------------
    # interleaved-lane path (lanes > 0): encode stripes each pass's
    # symbols over K independent rANS lanes (csrc rans_encode_interleaved);
    # decode runs entropy/device_rans.decode_pass programs BETWEEN the
    # standard pass programs, so the whole decompress chain is pure async
    # device dataflow — zero mid-chain host round trips. Entropy params
    # stay bit-exact with encode because BOTH directions use the very same
    # _pass_a0/_pass_b/_pass_ca programs (the codec's determinism rule).
    # ------------------------------------------------------------------
    def _build_interleaved(self):
        from rdeic_tpu.entropy.device_rans import (
            DeviceRansTables,
            decode_pass,
            init_lane_state,
        )

        self._tabs = DeviceRansTables(self.table)
        k = self.lanes

        def dev_decode(cdf_flat, lut_flat, lengths, offsets, words, nwords,
                       state, ptr, idx_u8):
            class _T:  # lightweight view so the tables ride as jit args
                pass

            t = _T()
            t.cdf_flat, t.lut_flat = cdf_flat, lut_flat
            t.lengths, t.offsets = lengths, offsets
            t.max_len = self.table.max_len
            b = idx_u8.shape[0]
            n = int(np.prod(idx_u8.shape[1:]))
            idx_flat = idx_u8.astype(jnp.int32).reshape(b, n)
            pad = (-n) % k
            if pad:
                idx_flat = jnp.pad(idx_flat, ((0, 0), (0, pad)))
            sym, (state, ptr) = decode_pass(
                t, words, nwords, state, ptr, idx_flat, n
            )
            sym = sym[:, :n].reshape(idx_u8.shape).astype(jnp.int16)
            return sym, state, ptr

        self._dev_decode_jit = jax.jit(dev_decode)
        self._lane_init = jax.jit(init_lane_state)

        from rdeic_tpu.entropy.device_rans import (
            decode_pass_shared,
            init_shared_state,
        )

        def dev_decode_shared(cdf_flat, lut_flat, lengths, offsets, words,
                              nwords, state, ptr, idx_u8):
            class _T:
                pass

            t = _T()
            t.cdf_flat, t.lut_flat = cdf_flat, lut_flat
            t.lengths, t.offsets = lengths, offsets
            t.max_len = self.table.max_len
            b = idx_u8.shape[0]
            n = int(np.prod(idx_u8.shape[1:]))
            idx_flat = idx_u8.astype(jnp.int32).reshape(b, n)
            pad = (-n) % k
            if pad:
                idx_flat = jnp.pad(idx_flat, ((0, 0), (0, pad)))
            sym, (state, ptr) = decode_pass_shared(
                t, words, nwords, state, ptr, idx_flat, n
            )
            sym = sym[:, :n].reshape(idx_u8.shape).astype(jnp.int16)
            return sym, state, ptr

        self._dev_decode_shared_jit = jax.jit(dev_decode_shared)
        self._shared_init = jax.jit(partial(init_shared_state, k=k))

        from rdeic_tpu.entropy.device_rans import (
            build_pass_steps,
            encode_lanes,
        )

        # Device-side ENCODE: symbols never cross the link — only the
        # compressed lane words do (payload-sized vs ~2 MB/image of
        # int16 symbols + uint8 indexes). Byte-identical to the host
        # rans_encode_interleaved (tests/test_device_rans.py).
        def dev_encode(cdf_flat, lut_flat, lengths, offsets, syms, idxs):
            class _T:
                pass

            t = _T()
            t.cdf_flat, t.lut_flat = cdf_flat, lut_flat
            t.lengths, t.offsets = lengths, offsets
            t.max_len = self.table.max_len
            steps = build_pass_steps(syms, idxs, k)
            t_tot = int(steps[0].shape[0])
            # capacity 1 word/symbol (= 16 bits/sym average, far above any
            # real rate point); overflow flags the host-encoder fallback
            wcap = 64
            while wcap < t_tot + 2:
                wcap *= 2
            return encode_lanes(t, *steps, wcap)

        self._dev_encode_jit = jax.jit(dev_encode)

    def _dev_decode(self, words, nwords, state, ptr, idx_u8):
        t = self._tabs
        return self._dev_decode_jit(
            t.cdf_flat, t.lut_flat, t.lengths, t.offsets,
            words, nwords, state, ptr, idx_u8,
        )

    def _dev_decode_shared(self, words, nwords, state, ptr, idx_u8):
        t = self._tabs
        return self._dev_decode_shared_jit(
            t.cdf_flat, t.lut_flat, t.lengths, t.offsets,
            words, nwords, state, ptr, idx_u8,
        )

    # header versioning: v1 = [K, lane_nbytes x K]; v2 (shared stream) =
    # [0x80000000 | K] only — the per-lane size table is gone, which IS
    # the v2 rate win at K=128 (~516 B/stream).
    _V2_TAG = 0x80000000

    @staticmethod
    def _lane_header(lanes: int, lane_nbytes) -> bytes:
        if lane_nbytes is None:  # v2 shared stream
            return np.asarray(
                [CompressionCodec._V2_TAG | lanes], dtype="<u4"
            ).tobytes()
        return np.concatenate(
            [[lanes], np.asarray(lane_nbytes, np.uint32)]
        ).astype("<u4").tobytes()

    @staticmethod
    def _parse_lane_header(hdr: bytes):
        """-> (version, lanes, lane_nbytes-or-None)."""
        arr = np.frombuffer(hdr, "<u4")
        tag = int(arr[0])
        if tag & CompressionCodec._V2_TAG:
            return 2, tag & ~CompressionCodec._V2_TAG, None
        return 1, tag, arr[1 : 1 + tag].astype(np.int64)

    def _lane_container(self, payload: bytes, lane_nbytes, indices_np,
                        img: int, k: int | None = None) -> dict:
        return {
            "strings": [
                [payload],
                [pack_uniform(indices_np[img], self.model.codebook_size)],
                [self._lane_header(
                    self.lanes if k is None else k, lane_nbytes)],
            ],
            "shape": (indices_np.shape[1], indices_np.shape[2]),
        }

    def _pick_lanes(self, data_bytes: int) -> int:
        """Largest power-of-two K <= configured lanes whose flush overhead
        (~4K+4 B) stays under auto_lanes_pct of the data payload."""
        if self.auto_lanes_pct <= 0:
            return self.lanes
        budget = data_bytes * self.auto_lanes_pct / 100.0
        k = self.lanes
        while k > 2 and 4 * k + 4 > budget:
            k //= 2
        return max(k, 2)

    def _flush_interleaved(self, syms, idxs, indices_np, img: int,
                           k_fixed: int | None = None) -> dict:
        """Per-image container from the per-pass (sym, idx) pulls.

        v2 (self.shared): encode at the configured K, size the payload,
        then shrink K if the flush overhead breaches the rate budget
        (batch callers pin k_fixed from image 0 so one compiled decode
        shape serves the whole batch). Returns a v2 container; v1 when
        RDEIC_RANS_SHARED=0."""
        from rdeic_tpu.entropy.coder import (
            rans_encode_interleaved,
            rans_encode_interleaved_shared,
            rans_lanes_to_shared,
        )

        flat_s = [np.asarray(s[img]).reshape(-1) for s in syms]
        flat_i = [np.asarray(ix[img]).reshape(-1) for ix in idxs]
        pass_sizes = [s.shape[0] for s in flat_s]
        cat_s = np.concatenate(flat_s)
        cat_i = np.concatenate(flat_i)
        if not self.shared:
            payload, lane_nbytes = rans_encode_interleaved(
                cat_s, cat_i, pass_sizes, self.lanes, self.table,
            )
            return self._lane_container(payload, lane_nbytes, indices_np,
                                        img)
        if k_fixed is not None and k_fixed != self.lanes:
            shared_payload = rans_encode_interleaved_shared(
                cat_s, cat_i, pass_sizes, k_fixed, self.table)
            return self._lane_container(
                shared_payload, None, indices_np, img, k=k_fixed)
        payload, lane_nbytes = rans_encode_interleaved(
            cat_s, cat_i, pass_sizes, self.lanes, self.table,
        )
        # data bytes ~= payload minus the per-lane flush (4 B state +
        # ~2 B renorm-granularity tail per lane)
        k = (k_fixed if k_fixed is not None
             else self._pick_lanes(max(len(payload) - 6 * self.lanes, 0)))
        if k == self.lanes:
            shared_payload = rans_lanes_to_shared(
                payload, lane_nbytes, cat_i, pass_sizes, self.table)
        else:
            shared_payload = rans_encode_interleaved_shared(
                cat_s, cat_i, pass_sizes, k, self.table)
        return self._lane_container(shared_payload, None, indices_np, img,
                                    k=k)

    def _compress_device_enc(self, sym_list, idx_list, max_list, indices):
        """Device-side lane encode: pulls only (nwords, overflow, maxabs)
        scalars plus the compressed words. Returns None on capacity
        overflow (caller falls back to the host encoder)."""
        from rdeic_tpu.entropy.device_rans import assemble_lane_payloads

        t = self._tabs
        words, nwords, ovf = self._dev_encode_jit(
            t.cdf_flat, t.lut_flat, t.lengths, t.offsets, sym_list, idx_list
        )
        small = jax.device_get([indices, nwords, ovf] + max_list)
        indices_np, nwords_np = small[0], small[1]
        _check_sym_range(small[3:])
        if bool(small[2]):
            import warnings  # noqa: PLC0415

            warnings.warn(
                "device rANS encode overflowed its word capacity "
                "(pathological symbol statistics); falling back to the "
                "host encoder for this batch"
            )
            return None
        wmax = max(int(nwords_np.max()), 1)
        wb = 64  # pow2 bucket bounds recompiles of the slice program
        while wb < wmax:
            wb *= 2
        words_np = jax.device_get(words[:, :, :wb])
        return [
            self._lane_container(
                *assemble_lane_payloads(words_np[img], nwords_np[img]),
                indices_np, img,
            )
            for img in range(nwords_np.shape[0])
        ]

    def _lane_words_device(self, outs: list[dict]):
        """Stack per-image lane streams into [B, K, W] device words (W
        bucket-padded to bound recompiles of the decode_pass programs)."""
        from rdeic_tpu.entropy.device_rans import lanes_from_bytes

        mats = []
        for o in outs:
            ver, klanes, lane_nbytes = self._parse_lane_header(
                o["strings"][2][0])
            if ver != 1 or klanes != self.lanes:
                raise ValueError(
                    f"stream is v{ver} with {klanes} lanes, codec "
                    f"configured for v1 x {self.lanes}"
                )
            mats.append(lanes_from_bytes(o["strings"][0][0], lane_nbytes))
        wmax = max(m[0].shape[1] for m in mats)
        # pow2 bucket (min 64) so W varies over few compiled shapes
        wpad = 64
        while wpad < wmax:
            wpad *= 2
        b = len(mats)
        words = np.zeros((b, self.lanes, wpad), np.uint32)
        nwords = np.zeros((b, self.lanes), np.int32)
        for i, (w, nw) in enumerate(mats):
            words[i, :, : w.shape[1]] = w
            nwords[i] = nw
        return jnp.asarray(words), jnp.asarray(nwords)

    def _shared_words(self, outs: list[dict]):
        """Stack per-image v2 shared streams into [B, W] device words
        (W bucket-padded to bound recompiles)."""
        from rdeic_tpu.entropy.device_rans import shared_words_from_bytes

        mats = []
        for o in outs:
            ver, klanes, _ = self._parse_lane_header(o["strings"][2][0])
            if ver != 2 or klanes != self.lanes:
                raise ValueError(
                    f"stream is v{ver} with {klanes} lanes, codec "
                    f"configured for v2 x {self.lanes}"
                )
            mats.append(shared_words_from_bytes(o["strings"][0][0]))
        wmax = max(m[1] for m in mats)
        wpad = 64
        while wpad < wmax:
            wpad *= 2
        b = len(mats)
        words = np.zeros((b, wpad), np.uint32)
        nwords = np.zeros((b,), np.int32)
        for i, (w, nw) in enumerate(mats):
            words[i, : w.shape[0]] = w
            nwords[i] = nw
        return jnp.asarray(words), jnp.asarray(nwords)

    def _decompress_shared_host(self, outs: list[dict], k: int):
        """v2 streams below the device lane threshold: the pass programs
        still run on device, but symbols decode on the HOST shared-stream
        coder (csrc rans_shared_decode_pass) — at small K the device
        scan's serial length n/K dominates while the host coder is
        K-independent."""
        from rdeic_tpu.entropy.coder import SharedRansDecoder

        decs = [SharedRansDecoder(o["strings"][0][0], k) for o in outs]

        def decode_rows(idx_np):
            b = len(decs)
            return np.stack(
                [
                    decs[i].decode_pass(
                        idx_np[i].astype(np.int32), self.table
                    ).reshape(idx_np[i].shape)
                    for i in range(b)
                ]
            ).astype(np.int32)

        try:
            return self._decompress_multi_with(outs, decode_rows)
        finally:
            for d in decs:
                d.close()

    def _decompress_interleaved(self, outs: list[dict]):
        """[B] interleaved streams -> (c_latent, guide_hint); the entire
        chain is async device dataflow (no host pulls until the caller's).
        Handles v1 (per-lane) and v2 (shared-stream) containers; v2
        streams with K below device_min_lanes route to the host coder."""
        ver, k, _ = self._parse_lane_header(outs[0]["strings"][2][0])
        if ver == 2 and k < self.device_min_lanes:
            return self._decompress_shared_host(outs, k)
        self._ensure_lanes(k)
        params = self.params
        zh, zw = outs[0]["shape"]
        indices = np.stack(
            [
                unpack_uniform(
                    o["strings"][1][0], zh * zw, self.model.codebook_size
                ).reshape(zh, zw)
                for o in outs
            ]
        )
        hyper = self._hyper(params, jnp.asarray(indices))
        if ver == 2:
            words, nwords = self._shared_words(outs)
            state, ptr = self._shared_init(words, nwords)
            dev_decode = self._dev_decode_shared
        else:
            words, nwords = self._lane_words_device(outs)
            state, ptr = self._lane_init(words, nwords)
            dev_decode = self._dev_decode

        y_hat_prev = None
        n = self.model.slice_num
        means_a, idx_a, channel_ctx = self._pass_a0(
            params, hyper=hyper, y_hat_prev=None
        )
        for i in range(n):
            sym_a, state, ptr = dev_decode(
                words, nwords, state, ptr, idx_a
            )
            anchor_half, means_na, idx_na = self._pass_b[i](
                params, sym_a=sym_a, means_a_sq=means_a,
                hyper=hyper, channel_ctx=channel_ctx,
            )
            sym_na, state, ptr = dev_decode(
                words, nwords, state, ptr, idx_na
            )
            if i < n - 1:
                y_hat_prev, means_a, idx_a, channel_ctx = self._pass_ca[i + 1](
                    params, sym_na=sym_na, means_na_sq=means_na,
                    anchor_half=anchor_half, y_hat_prev=y_hat_prev,
                    hyper=hyper,
                )
            else:
                out = self._pass_c_synth(
                    params, sym_na=sym_na, means_na_sq=means_na,
                    anchor_half=anchor_half, y_hat_prev=y_hat_prev,
                )
        return out

    # ------------------------------------------------------------------
    # batched fused paths: B images per entropy-program execution.
    # Dispatch latency amortizes B-fold; each image still gets its own
    # independent bitstream (decodable alone).
    # ------------------------------------------------------------------
    def compress_batch(self, x) -> list[dict]:
        """x: [B, H, W, in_nc] -> list of per-image {strings, shape}."""
        if not self.fused or self.lanes:
            return self._compress_batch_multi(x)
        params = self.params
        b = x.shape[0]
        y, indices, _ = self._analyze(params, x)
        indices_np = np.asarray(indices)
        hyper = self._hyper(params, jnp.asarray(indices_np))

        recorded: list[list[tuple[np.ndarray, np.ndarray]]] = [
            [] for _ in range(b)
        ]

        def encode_coder(y_half_sq, means_sq, indexes):
            sym = np.round(y_half_sq - means_sq).astype(np.int32)
            for i in range(b):
                recorded[i].append((sym[i], indexes[i]))
            return sym

        with self._fused_lock:
            self._active_coder = encode_coder
            try:
                y_hat = self._entropy_program(params, hyper, y)
                jax.block_until_ready(y_hat)
            finally:
                self._active_coder = None
        outs = []
        for i in range(b):
            enc = BufferedRansEncoder()
            for sym, idx in recorded[i]:
                enc.encode_with_indexes(sym, idx)
            outs.append(
                {
                    "strings": [
                        [enc.flush(self.table)],
                        [pack_uniform(indices_np[i], self.model.codebook_size)],
                    ],
                    "shape": (indices_np.shape[1], indices_np.shape[2]),
                }
            )
        return outs

    def _compress_batch_multi(self, x) -> list[dict]:
        """Batched compression on the multi-program path: the pass programs
        run once on the [B, ...] batch; per-image streams split at pull."""
        params = self.params
        b = x.shape[0]
        y, indices, hyper = self._analyze(params, x)
        sym_list, idx_list, max_list = [], [], []
        y_hat_prev = None
        n = self.model.slice_num
        means_a, idx_a, channel_ctx = self._pass_a0(
            params, hyper=hyper, y_hat_prev=None
        )
        for i, (lo, hi) in enumerate(self._slice_bounds()):
            sym_a, max_a = self._symbols(y, means_a, anchor=True, lo=lo, hi=hi)
            anchor_half, means_na, idx_na = self._pass_b[i](
                params, sym_a=sym_a, means_a_sq=means_a, hyper=hyper,
                channel_ctx=channel_ctx,
            )
            sym_na, max_na = self._symbols(y, means_na, anchor=False, lo=lo, hi=hi)
            sym_list += [sym_a, sym_na]
            idx_list += [idx_a, idx_na]
            max_list += [max_a, max_na]
            if i < n - 1:
                y_hat_prev, means_a, idx_a, channel_ctx = self._pass_ca[i + 1](
                    params, sym_na=sym_na, means_na_sq=means_na,
                    anchor_half=anchor_half, y_hat_prev=y_hat_prev,
                    hyper=hyper,
                )
        if self.lanes and self.device_enc:
            outs = self._compress_device_enc(
                sym_list, idx_list, max_list, indices
            )
            if outs is not None:
                return outs
        pulled = jax.device_get([indices] + sym_list + idx_list + max_list)
        indices_np = pulled[0]
        syms = pulled[1 : 1 + len(sym_list)]
        idxs = pulled[1 + len(sym_list) : 1 + len(sym_list) + len(idx_list)]
        _check_sym_range(pulled[1 + len(sym_list) + len(idx_list) :])
        outs = []
        k_fixed = None
        for img in range(b):
            if self.lanes:
                out = self._flush_interleaved(
                    syms, idxs, indices_np, img, k_fixed=k_fixed)
                if self.shared and k_fixed is None:
                    # pin image 0's adaptive K for the whole batch so the
                    # batched decode compiles one shape
                    _ver, k_fixed, _ = self._parse_lane_header(
                        out["strings"][2][0])
                outs.append(out)
                continue
            enc = BufferedRansEncoder()
            for s, ix in zip(syms, idxs):
                enc.encode_with_indexes(s[img], ix[img])
            outs.append(
                {
                    "strings": [
                        [enc.flush(self.table)],
                        [pack_uniform(indices_np[img], self.model.codebook_size)],
                    ],
                    "shape": (indices_np.shape[1], indices_np.shape[2]),
                }
            )
        return outs

    def _decompress_batch_multi(self, outs: list[dict]):
        """Batched decode on the multi-program path: pass programs run on
        the [B, ...] batch; each image's rANS stream is decoded per slice."""
        b = len(outs)
        decs = []
        for o in outs:
            d = RansDecoder()
            d.set_stream(o["strings"][0][0])
            decs.append(d)

        def decode_rows(idx_np):
            return np.stack(
                [
                    decs[i]
                    .decode_stream(idx_np[i], self.table)
                    .reshape(idx_np[i].shape)
                    for i in range(b)
                ]
            ).astype(np.int32)

        try:
            return self._decompress_multi_with(outs, decode_rows)
        finally:
            for d in decs:
                d.close()

    def _decompress_multi_with(self, outs: list[dict], decode_rows):
        """The host-interactive decode chain, parameterized over the
        symbol source (legacy per-image streams or the v2 shared-stream
        coder): pass programs on device, decode_rows(idx_np) on host."""
        params = self.params
        zh, zw = outs[0]["shape"]
        indices = np.stack(
            [
                unpack_uniform(
                    o["strings"][1][0], zh * zw, self.model.codebook_size
                ).reshape(zh, zw)
                for o in outs
            ]
        )
        hyper = self._hyper(params, jnp.asarray(indices))

        y_hat_prev = None
        n = self.model.slice_num
        means_a, idx_a, channel_ctx = self._pass_a0(
            params, hyper=hyper, y_hat_prev=None
        )
        for i in range(n):
            sym_a = decode_rows(np.asarray(idx_a))
            anchor_half, means_na, idx_na = self._pass_b[i](
                params, sym_a=_sym_i16(sym_a), means_a_sq=means_a,
                hyper=hyper, channel_ctx=channel_ctx,
            )
            sym_na = decode_rows(np.asarray(idx_na))
            if i < n - 1:
                y_hat_prev, means_a, idx_a, channel_ctx = self._pass_ca[i + 1](
                    params, sym_na=_sym_i16(sym_na), means_na_sq=means_na,
                    anchor_half=anchor_half, y_hat_prev=y_hat_prev,
                    hyper=hyper,
                )
            else:
                out = self._pass_c_synth(
                    params, sym_na=_sym_i16(sym_na), means_na_sq=means_na,
                    anchor_half=anchor_half, y_hat_prev=y_hat_prev,
                )
        return out

    def decompress_batch(self, outs: list[dict]):
        """list of per-image {strings, shape} -> (c_latent [B..], guide_hint)."""
        if outs and len(outs[0]["strings"]) > 2:
            return self._decompress_interleaved(outs)
        if not self.fused:
            return self._decompress_batch_multi(outs)
        params = self.params
        b = len(outs)
        zh, zw = outs[0]["shape"]
        indices = np.stack(
            [
                unpack_uniform(
                    o["strings"][1][0], zh * zw, self.model.codebook_size
                ).reshape(zh, zw)
                for o in outs
            ]
        )
        hyper = self._hyper(params, jnp.asarray(indices))
        decs = []
        for o in outs:
            d = RansDecoder()
            d.set_stream(o["strings"][0][0])
            decs.append(d)

        def decode_coder(y_half_sq, means_sq, indexes):
            rows = [
                decs[i]
                .decode_stream(indexes[i], self.table)
                .reshape(indexes[i].shape)
                for i in range(b)
            ]
            return np.stack(rows).astype(np.int32)

        yh, yw = hyper.shape[1], hyper.shape[2]
        y_zeros = jnp.zeros((b, yh, yw, self.model.M), jnp.float32)
        with self._fused_lock:
            self._active_coder = decode_coder
            try:
                y_hat = self._entropy_program(params, hyper, y_zeros)
                jax.block_until_ready(y_hat)
            finally:
                self._active_coder = None
                for d in decs:
                    d.close()
        return self._synthesize(params, y_hat)

    # ------------------------------------------------------------------
    def _slice_bounds(self):
        bounds = []
        acc = 0
        for c in self.model.slice_ch:
            bounds.append((acc, acc + c))
            acc += c
        return bounds

    def compress(self, x) -> dict:
        """x: [1, H, W, in_nc] scaled VAE feature -> {strings, shape}.

        Mirrors Compression.compress (compression.py:151-213). The whole
        device chain is dispatched asynchronously; symbols/indexes are pulled
        from the device in one batched device_get at the end.
        """
        if self.fused and not self.lanes:
            try:
                return self._compress_fused(x)
            except Exception as e:  # backend without host-callback support
                print(f"[fused codec unavailable ({type(e).__name__}); "
                      f"falling back to multi-program path]")
                self.fused = False
        params = self.params
        y, indices, hyper = self._analyze(params, x)

        sym_list = []
        idx_list = []
        max_list = []
        y_hat_prev = None
        n = self.model.slice_num
        bounds = self._slice_bounds()
        means_a, idx_a, channel_ctx = self._pass_a0(
            params, hyper=hyper, y_hat_prev=None
        )
        for i, (lo, hi) in enumerate(bounds):
            sym_a, max_a = self._symbols(y, means_a, anchor=True, lo=lo, hi=hi)
            anchor_half, means_na, idx_na = self._pass_b[i](
                params, sym_a=sym_a, means_a_sq=means_a, hyper=hyper,
                channel_ctx=channel_ctx,
            )
            sym_na, max_na = self._symbols(y, means_na, anchor=False, lo=lo, hi=hi)
            sym_list += [sym_a, sym_na]
            idx_list += [idx_a, idx_na]
            max_list += [max_a, max_na]
            if i < n - 1:
                y_hat_prev, means_a, idx_a, channel_ctx = self._pass_ca[i + 1](
                    params, sym_na=sym_na, means_na_sq=means_na,
                    anchor_half=anchor_half, y_hat_prev=y_hat_prev,
                    hyper=hyper,
                )
            # last slice: nothing downstream of the final symbols on encode

        if self.lanes and self.device_enc:
            outs = self._compress_device_enc(
                sym_list, idx_list, max_list, indices
            )
            if outs is not None:
                return outs[0]
        # one synchronization point: pull everything together
        pulled = jax.device_get([indices] + sym_list + idx_list + max_list)
        indices_np = pulled[0]
        syms = pulled[1 : 1 + len(sym_list)]
        idxs = pulled[1 + len(sym_list) : 1 + len(sym_list) + len(idx_list)]
        _check_sym_range(pulled[1 + len(sym_list) + len(idx_list) :])

        if self.lanes:
            return self._flush_interleaved(syms, idxs, indices_np, 0)
        z_string = pack_uniform(indices_np, self.model.codebook_size)
        enc = BufferedRansEncoder()
        for s, ix in zip(syms, idxs):
            enc.encode_with_indexes(s, ix)
        y_string = enc.flush(self.table)
        zh, zw = indices_np.shape[1], indices_np.shape[2]
        return {"strings": [[y_string], [z_string]], "shape": (zh, zw)}

    def _ensure_lanes(self, k: int) -> None:
        """(Re)build the device-rANS programs for a stream's lane count —
        lets any codec instance decode interleaved streams it didn't
        encode."""
        if self.lanes != k or not hasattr(self, "_tabs"):
            self.lanes = k
            self._build_interleaved()

    def decompress(self, strings, shape):
        """strings/shape -> (c_latent, guide_hint).

        Mirrors Compression.decompress (compression.py:215-273).
        """
        if len(strings) > 2:  # interleaved-lane stream: on-device decode
            return self._decompress_interleaved(
                [{"strings": strings, "shape": shape}]
            )
        if self.fused:
            try:
                return self._decompress_fused(strings, shape)
            except Exception as e:
                print(f"[fused codec unavailable ({type(e).__name__}); "
                      f"falling back to multi-program path]")
                self.fused = False
        params = self.params
        y_string = strings[0][0]
        z_string = strings[1][0]
        zh, zw = int(shape[0]), int(shape[1])
        indices = unpack_uniform(z_string, zh * zw, self.model.codebook_size)
        indices = indices.reshape(1, zh, zw)
        hyper = self._hyper(params, jnp.asarray(indices))

        dec = RansDecoder()
        dec.set_stream(y_string)
        y_hat_prev = None
        n = self.model.slice_num
        means_a, idx_a, channel_ctx = self._pass_a0(
            params, hyper=hyper, y_hat_prev=None
        )
        for i in range(n):
            idx_a_np = np.asarray(idx_a)
            sym_a = dec.decode_stream(idx_a_np, self.table).reshape(idx_a_np.shape)
            anchor_half, means_na, idx_na = self._pass_b[i](
                params, sym_a=_sym_i16(sym_a), means_a_sq=means_a,
                hyper=hyper, channel_ctx=channel_ctx,
            )
            idx_na_np = np.asarray(idx_na)
            sym_na = dec.decode_stream(idx_na_np, self.table).reshape(
                idx_na_np.shape
            )
            if i < n - 1:
                y_hat_prev, means_a, idx_a, channel_ctx = self._pass_ca[i + 1](
                    params, sym_na=_sym_i16(sym_na), means_na_sq=means_na,
                    anchor_half=anchor_half, y_hat_prev=y_hat_prev,
                    hyper=hyper,
                )
            else:
                c_latent, guide_hint = self._pass_c_synth(
                    params, sym_na=_sym_i16(sym_na), means_na_sq=means_na,
                    anchor_half=anchor_half, y_hat_prev=y_hat_prev,
                )
        dec.close()
        return c_latent, guide_hint
