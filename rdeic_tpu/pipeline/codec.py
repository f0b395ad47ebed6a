"""Compression codec: real-bitstream encode/decode orchestration.

Behavioral parity: /root/reference/model/compression.py:151-273 (compress /
decompress) and utils/ckbd.py:76-141 — 10 channel slices, each coded as a
checkerboard anchor pass then a non-anchor pass; the hyper latent is coded
as fixed-width VQ indices; GaussianConditional CDF tables index the rANS
coder.

Determinism design (replaces the reference's cudnn-determinism toggles,
model/compression.py:156,209): the encode path calls EXACTLY the same jitted
per-pass functions as the decode path, with bit-identical inputs (z_q is
re-derived from the coded indices on both sides; y_hat halves are rebuilt
from integer symbols + means on both sides). Same program + same inputs on
the same device => bit-identical entropy parameters, so the decoder always
sees the CDF indexes the encoder used.

TPU pipelining: each pass is a small dense-conv XLA program; host rANS
en/decoding of pass k overlaps device compute of pass k+1 in the decode
direction via dispatch-ahead (JAX async dispatch).
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


class CompressionCodec:
    """Stateful wrapper: model def + params + CDF tables + jitted passes."""

    def __init__(self, model: CompressionModel, params):
        self.model = model
        self.params = params
        scale_table = g.get_scale_table()
        self.scale_table = scale_table
        cdf, lengths, offsets = g.build_cdf_tables(scale_table)
        self.table = CdfTable(cdf, lengths, offsets)
        self._build_jitted()

    # ------------------------------------------------------------------
    def _build_jitted(self):
        model = self.model
        st = jnp.asarray(self.scale_table, jnp.float32)

        @jax.jit
        def analyze(params, x):
            y, z = model.apply(params, x, method=CompressionModel.analyze)
            _, indices = model.apply(params, z, method=CompressionModel.vq_quant)
            return y, indices, z.shape[1:3]

        @jax.jit
        def hyper_from_indices(params, indices):
            z_q = model.apply(params, indices, method=CompressionModel.vq_lookup)
            return model.apply(params, z_q, method=CompressionModel.hyper_decode)

        def anchor_pass(params, idx, hyper, y_hat_prev):
            scales, means, channel_ctx = model.apply(
                params, idx, hyper, y_hat_prev,
                method=CompressionModel.params_anchor,
            )
            scales_sq = ckbd.ckbd_anchor_squeeze(scales)
            means_sq = ckbd.ckbd_anchor_squeeze(means)
            indexes = g.build_indexes(scales_sq, self.scale_table)
            return means_sq, indexes, channel_ctx

        def nonanchor_pass(params, idx, hyper, channel_ctx, anchor_half):
            scales, means = model.apply(
                params, idx, hyper, channel_ctx, anchor_half,
                method=CompressionModel.params_nonanchor,
            )
            scales_sq = ckbd.ckbd_nonanchor_squeeze(scales)
            means_sq = ckbd.ckbd_nonanchor_squeeze(means)
            indexes = g.build_indexes(scales_sq, self.scale_table)
            return means_sq, indexes

        # shared quantize/dequantize helpers (identical both directions)
        @jax.jit
        def symbols_from(y_half_sq, means_sq):
            return jnp.round(y_half_sq - means_sq).astype(jnp.int32)

        @partial(jax.jit, static_argnames=("anchor",))
        def dequant_half(symbols, means_sq, anchor: bool):
            vals = symbols.astype(jnp.float32) + means_sq
            if anchor:
                return ckbd.ckbd_anchor_unsqueeze(vals)
            return ckbd.ckbd_nonanchor_unsqueeze(vals)

        @jax.jit
        def synthesize(params, y_hat):
            return model.apply(params, y_hat, method=CompressionModel.synthesize)

        self._analyze = analyze
        self._hyper = hyper_from_indices
        # one jitted program per (idx, phase) — the same object is reused by
        # compress and decompress for bit-determinism
        self._anchor = [
            jax.jit(partial(anchor_pass, idx=i)) for i in range(model.slice_num)
        ]
        self._nonanchor = [
            jax.jit(partial(nonanchor_pass, idx=i)) for i in range(model.slice_num)
        ]
        self._symbols = symbols_from
        self._dequant = dequant_half
        self._synthesize = synthesize

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

        Mirrors Compression.compress (compression.py:151-213): VQ-code the
        hyper latent, then per slice code anchor and non-anchor halves.
        """
        params = self.params
        y, indices, zshape = self._analyze(params, x)
        indices_np = np.asarray(indices)
        z_string = pack_uniform(indices_np, self.model.codebook_size)
        # decode side derives z_q from indices; encode must match bit-exactly
        hyper = self._hyper(params, jnp.asarray(indices_np))

        enc = BufferedRansEncoder()
        y_hat_prev = None
        for i, (lo, hi) in enumerate(self._slice_bounds()):
            y_slice = y[..., lo:hi]
            means_a, idx_a, channel_ctx = self._anchor[i](params, hyper=hyper, y_hat_prev=y_hat_prev)
            sym_a = self._symbols(ckbd.ckbd_anchor_squeeze(y_slice), means_a)
            enc.encode_with_indexes(np.asarray(sym_a), np.asarray(idx_a))
            anchor_half = self._dequant(sym_a, means_a, anchor=True)

            means_na, idx_na = self._nonanchor[i](
                params, hyper=hyper, channel_ctx=channel_ctx, anchor_half=anchor_half
            )
            sym_na = self._symbols(ckbd.ckbd_nonanchor_squeeze(y_slice), means_na)
            enc.encode_with_indexes(np.asarray(sym_na), np.asarray(idx_na))
            nonanchor_half = self._dequant(sym_na, means_na, anchor=False)

            y_hat_slice = anchor_half + nonanchor_half
            y_hat_prev = (
                y_hat_slice
                if y_hat_prev is None
                else jnp.concatenate([y_hat_prev, y_hat_slice], axis=-1)
            )
        y_string = enc.flush(self.table)
        return {
            "strings": [[y_string], [z_string]],
            "shape": (int(zshape[0]), int(zshape[1])),
        }

    def decompress(self, strings, shape):
        """strings/shape -> (c_latent, guide_hint).

        Mirrors Compression.decompress (compression.py:215-273).
        """
        params = self.params
        y_string = strings[0][0]
        z_string = strings[1][0]
        zh, zw = int(shape[0]), int(shape[1])
        n = zh * zw
        indices = unpack_uniform(z_string, n, self.model.codebook_size).reshape(
            1, zh, zw
        )
        hyper = self._hyper(params, jnp.asarray(indices))

        dec = RansDecoder()
        dec.set_stream(y_string)
        y_hat_prev = None
        for i in range(self.model.slice_num):
            means_a, idx_a, channel_ctx = self._anchor[i](params, hyper=hyper, y_hat_prev=y_hat_prev)
            sym_a = dec.decode_stream(np.asarray(idx_a), self.table).reshape(
                np.asarray(idx_a).shape
            )
            anchor_half = self._dequant(jnp.asarray(sym_a), means_a, anchor=True)

            means_na, idx_na = self._nonanchor[i](
                params, hyper=hyper, channel_ctx=channel_ctx, anchor_half=anchor_half
            )
            sym_na = dec.decode_stream(np.asarray(idx_na), self.table).reshape(
                np.asarray(idx_na).shape
            )
            nonanchor_half = self._dequant(jnp.asarray(sym_na), means_na, anchor=False)

            y_hat_slice = anchor_half + nonanchor_half
            y_hat_prev = (
                y_hat_slice
                if y_hat_prev is None
                else jnp.concatenate([y_hat_prev, y_hat_slice], axis=-1)
            )
        dec.close()
        c_latent, guide_hint = self._synthesize(params, y_hat_prev)
        return c_latent, guide_hint
