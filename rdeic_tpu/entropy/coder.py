"""Python API over the native rANS coder + uniform bit-packing.

Interface parity (role, not bytes): compressai's BufferedRansEncoder /
RansDecoder used at /root/reference/model/compression.py:163-262, and the
torchac uniform-CDF hyper-latent coding at /root/reference/utils/ckbd.py:117-141
(14 bits/symbol for a 16384-entry codebook — here done with exact bit packing,
which is what a uniform-CDF arithmetic coder degenerates to).
"""
from __future__ import annotations

import ctypes

import numpy as np

from .build import load_library


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.int32)


def _ptr_i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class CdfTable:
    """Immutable container for the quantized CDF set used by the coder."""

    def __init__(self, quantized_cdf, cdf_length, offset):
        self.cdf = _as_i32(quantized_cdf)
        self.length = _as_i32(cdf_length).reshape(-1)
        self.offset = _as_i32(offset).reshape(-1)
        assert self.cdf.ndim == 2
        assert self.cdf.shape[0] == self.length.shape[0] == self.offset.shape[0]
        self._lut = None  # cum -> symbol table, built on first decode
        self._buckets = None  # coarse bucket index (32 KB, L1-resident)

    @property
    def ncdfs(self) -> int:
        return self.cdf.shape[0]

    @property
    def max_len(self) -> int:
        return self.cdf.shape[1]

    def buckets(self) -> np.ndarray:
        """Coarse cum-bucket index (rans_num_buckets() buckets/cdf, uint16):
        narrows the per-symbol search to one bucket's symbols. Small enough
        to stay in L1/L2 — the decode default (see decode_stream)."""
        if self._buckets is None:
            lib = load_library()
            # sized from the library (kProbBits - kBucketShift), never a
            # duplicated literal — a C++ constant change cannot overflow this
            b = np.empty(self.ncdfs * lib.rans_num_buckets(), dtype=np.uint16)
            lib.rans_build_buckets(
                _ptr_i32(self.cdf), _ptr_i32(self.length),
                self.ncdfs, self.max_len,
                b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            )
            self._buckets = b
        return self._buckets

    def lut(self) -> np.ndarray:
        """cum -> symbol lookup table (O(1) decode instead of binary
        search; ~65536 * ncdfs uint16, bit-identical decode output)."""
        if self._lut is None:
            lib = load_library()
            lut = np.empty(self.ncdfs * 65536, dtype=np.uint16)
            lib.rans_build_lut(
                _ptr_i32(self.cdf), _ptr_i32(self.length),
                self.ncdfs, self.max_len,
                lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            )
            self._lut = lut
        return self._lut


class BufferedRansEncoder:
    """Collects (symbols, indexes) pairs; encodes everything on flush."""

    def __init__(self):
        self._symbols: list[np.ndarray] = []
        self._indexes: list[np.ndarray] = []

    def encode_with_indexes(self, symbols, indexes) -> None:
        s = _as_i32(symbols).reshape(-1)
        i = _as_i32(indexes).reshape(-1)
        if s.shape != i.shape:
            raise ValueError("symbols/indexes length mismatch")
        self._symbols.append(s)
        self._indexes.append(i)

    def flush(self, table: CdfTable) -> bytes:
        symbols = (
            np.concatenate(self._symbols) if self._symbols else np.zeros(0, np.int32)
        )
        indexes = (
            np.concatenate(self._indexes) if self._indexes else np.zeros(0, np.int32)
        )
        self._symbols, self._indexes = [], []
        return rans_encode(symbols, indexes, table)


def rans_encode(symbols, indexes, table: CdfTable) -> bytes:
    lib = load_library()
    s = _as_i32(symbols).reshape(-1)
    i = _as_i32(indexes).reshape(-1)
    n = s.shape[0]
    capacity = max(n * 8 + 64, 1024)
    for _ in range(4):
        out = np.empty(capacity, dtype=np.uint8)
        nbytes = lib.rans_encode_with_indexes(
            _ptr_i32(s), _ptr_i32(i), n,
            _ptr_i32(table.cdf), _ptr_i32(table.length), _ptr_i32(table.offset),
            table.ncdfs, table.max_len,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), capacity,
        )
        if nbytes >= 0:
            return out[:nbytes].tobytes()
        if nbytes == -2:
            raise ValueError("index out of range in rans_encode")
        capacity *= 4
    raise RuntimeError("rans_encode: capacity growth failed")


def rans_encode_interleaved(symbols, indexes, pass_sizes, lanes: int,
                            table: CdfTable) -> tuple[bytes, np.ndarray]:
    """Stripe each pass's symbols over `lanes` independent rANS streams
    (symbol j of a pass -> lane j % lanes) for lock-step SPMD decoding
    (entropy/device_rans.py). Returns (back-to-back lane bytes,
    lane_nbytes int32 [lanes])."""
    lib = load_library()
    s = _as_i32(symbols).reshape(-1)
    i = _as_i32(indexes).reshape(-1)
    p = _as_i32(pass_sizes).reshape(-1)
    if s.shape != i.shape:
        raise ValueError("symbols/indexes length mismatch")
    if int(p.sum()) != s.shape[0]:
        raise ValueError("pass_sizes must sum to the symbol count")
    n = s.shape[0]
    lane_nbytes = np.empty(lanes, dtype=np.int32)
    capacity = max(n * 8 + 8 * lanes + 64, 1024)
    for _ in range(4):
        out = np.empty(capacity, dtype=np.uint8)
        nbytes = lib.rans_encode_interleaved(
            _ptr_i32(s), _ptr_i32(i), n, _ptr_i32(p), p.shape[0], lanes,
            _ptr_i32(table.cdf), _ptr_i32(table.length), _ptr_i32(table.offset),
            table.ncdfs, table.max_len,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), capacity,
            _ptr_i32(lane_nbytes),
        )
        if nbytes >= 0:
            return out[:nbytes].tobytes(), lane_nbytes.copy()
        if nbytes == -2:
            raise ValueError("bad args in rans_encode_interleaved")
        capacity *= 4
    raise RuntimeError("rans_encode_interleaved: capacity growth failed")


def rans_encode_interleaved_shared(symbols, indexes, pass_sizes, lanes: int,
                                   table: CdfTable) -> bytes:
    """v2 shared-stream interleaved encode: same striping and per-symbol
    code as rans_encode_interleaved, but all lanes' renorm words merge
    into ONE stream ordered by the vector decoder's pull schedule — no
    per-lane size table in the container (~4 bytes/lane saved)."""
    lib = load_library()
    s = _as_i32(symbols).reshape(-1)
    i = _as_i32(indexes).reshape(-1)
    p = _as_i32(pass_sizes).reshape(-1)
    if s.shape != i.shape:
        raise ValueError("symbols/indexes length mismatch")
    if int(p.sum()) != s.shape[0]:
        raise ValueError("pass_sizes must sum to the symbol count")
    n = s.shape[0]
    capacity = max(n * 8 + 8 * lanes + 64, 1024)
    for _ in range(4):
        out = np.empty(capacity, dtype=np.uint8)
        nbytes = lib.rans_encode_interleaved_shared(
            _ptr_i32(s), _ptr_i32(i), n, _ptr_i32(p), p.shape[0], lanes,
            _ptr_i32(table.cdf), _ptr_i32(table.length), _ptr_i32(table.offset),
            table.ncdfs, table.max_len,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), capacity,
        )
        if nbytes >= 0:
            return out[:nbytes].tobytes()
        if nbytes == -2:
            raise ValueError("bad args in rans_encode_interleaved_shared")
        if nbytes == -3:
            raise RuntimeError(
                "rans_lanes_to_shared: schedule/lane mismatch (internal)")
        capacity *= 4
    raise RuntimeError("rans_encode_interleaved_shared: capacity failed")


def rans_lanes_to_shared(lane_payload: bytes, lane_nbytes, indexes,
                         pass_sizes, table: CdfTable) -> bytes:
    """Merge already-encoded v1 per-lane streams (e.g. from the DEVICE
    encoder) into a v2 shared stream; symbols are not needed — the merge
    replays the decode pull schedule against the lane queues."""
    lib = load_library()
    ln = _as_i32(lane_nbytes).reshape(-1)
    i = _as_i32(indexes).reshape(-1)
    p = _as_i32(pass_sizes).reshape(-1)
    lanes_arr = np.frombuffer(lane_payload, np.uint8)
    capacity = max(len(lane_payload) + 16, 64)
    out = np.empty(capacity, dtype=np.uint8)
    nbytes = lib.rans_lanes_to_shared(
        lanes_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _ptr_i32(ln), ln.shape[0], _ptr_i32(i), i.shape[0],
        _ptr_i32(p), p.shape[0],
        _ptr_i32(table.cdf), _ptr_i32(table.length),
        table.ncdfs, table.max_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), capacity,
    )
    if nbytes < 0:
        raise RuntimeError(f"rans_lanes_to_shared failed: {nbytes}")
    return out[:nbytes].tobytes()


class SharedRansDecoder:
    """Host decoder for v2 shared-stream interleaved containers: persistent
    lane states across passes, pull order identical to the device's
    decode_pass_shared (and to the C++ merge that wrote the stream)."""

    def __init__(self, stream: bytes, lanes: int):
        self._lib = load_library()
        buf = np.frombuffer(stream, dtype=np.uint8)
        self._buf = buf  # keep alive
        self._dec = self._lib.rans_shared_decoder_new(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            buf.shape[0], lanes,
        )

    def decode_pass(self, indexes, table: CdfTable) -> np.ndarray:
        if self._dec is None:
            raise RuntimeError("decoder closed")
        i = _as_i32(indexes)
        shape = i.shape
        i = i.reshape(-1)
        out = np.empty(i.shape[0], dtype=np.int32)
        rc = self._lib.rans_shared_decode_pass(
            self._dec, _ptr_i32(i), i.shape[0],
            _ptr_i32(table.cdf), _ptr_i32(table.length),
            _ptr_i32(table.offset), table.ncdfs, table.max_len,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise ValueError(f"rans_shared_decode_pass failed: {rc}")
        return out.reshape(shape)

    def close(self):
        if self._dec is not None:
            self._lib.rans_shared_decoder_free(self._dec)
            self._dec = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class RansDecoder:
    """Persistent-stream decoder: set_stream once, decode_stream repeatedly."""

    def __init__(self):
        self._handle = None
        self._lib = load_library()

    def set_stream(self, stream: bytes) -> None:
        self.close()
        buf = np.frombuffer(stream, dtype=np.uint8)
        buf = np.ascontiguousarray(buf)
        self._buf = buf  # keep alive
        self._handle = self._lib.rans_decoder_new(
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), buf.shape[0]
        )

    def decode_stream(self, indexes, table: CdfTable) -> np.ndarray:
        # Default path: coarse-bucket search (256 buckets/cdf, 32 KB —
        # L1-resident) replaces the full binary search per symbol.
        # NOTE: the flat cum->symbol LUT variant (rans_decode_stream_lut)
        # measured SLOWER (141 vs 63 ms / 1.57M syms): its 8 MB table
        # misses cache on every random cum. Kept for table-resident
        # targets.
        if self._handle is None:
            raise RuntimeError("set_stream must be called first")
        i = _as_i32(indexes).reshape(-1)
        out = np.empty(i.shape[0], dtype=np.int32)
        buckets = table.buckets()
        rc = self._lib.rans_decode_stream_bucketed(
            self._handle, _ptr_i32(i), i.shape[0],
            _ptr_i32(table.cdf), _ptr_i32(table.length), _ptr_i32(table.offset),
            table.ncdfs, table.max_len,
            buckets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            _ptr_i32(out),
        )
        if rc != 0:
            raise ValueError(f"rans_decode_stream failed rc={rc}")
        return out

    def decode_stream_bsearch(self, indexes, table: CdfTable) -> np.ndarray:
        """Plain binary-search decode (bit-identical reference path)."""
        if self._handle is None:
            raise RuntimeError("set_stream must be called first")
        i = _as_i32(indexes).reshape(-1)
        out = np.empty(i.shape[0], dtype=np.int32)
        rc = self._lib.rans_decode_stream(
            self._handle, _ptr_i32(i), i.shape[0],
            _ptr_i32(table.cdf), _ptr_i32(table.length), _ptr_i32(table.offset),
            table.ncdfs, table.max_len, _ptr_i32(out),
        )
        if rc != 0:
            raise ValueError(f"rans_decode_stream failed rc={rc}")
        return out

    def decode_stream_lut(self, indexes, table: CdfTable) -> np.ndarray:
        """LUT-variant decode (bit-identical; see note in decode_stream)."""
        if self._handle is None:
            raise RuntimeError("set_stream must be called first")
        i = _as_i32(indexes).reshape(-1)
        out = np.empty(i.shape[0], dtype=np.int32)
        lut = table.lut()
        rc = self._lib.rans_decode_stream_lut(
            self._handle, _ptr_i32(i), i.shape[0],
            _ptr_i32(table.cdf), _ptr_i32(table.length), _ptr_i32(table.offset),
            table.ncdfs, table.max_len,
            lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), _ptr_i32(out),
        )
        if rc != 0:
            raise ValueError(f"rans_decode_stream failed rc={rc}")
        return out

    def close(self):
        if self._handle is not None:
            self._lib.rans_decoder_free(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def rans_decode(stream: bytes, indexes, table: CdfTable) -> np.ndarray:
    dec = RansDecoder()
    dec.set_stream(stream)
    out = dec.decode_stream(indexes, table)
    dec.close()
    return out


# ---------------------------------------------------------------------------
# Uniform coder for the VQ hyper-latent indices (bits/symbol = ceil(log2 K)).
# ---------------------------------------------------------------------------
def pack_uniform(indices, num_symbols: int) -> bytes:
    """Pack integer indices in [0, num_symbols) at fixed bit width."""
    bits = max(1, int(np.ceil(np.log2(num_symbols))))
    idx = np.asarray(indices).reshape(-1).astype(np.uint64)
    if idx.size and (idx.max() >= num_symbols):
        raise ValueError("index out of range")
    # expand to a bit matrix [n, bits], MSB first, then pack
    shifts = np.arange(bits - 1, -1, -1, dtype=np.uint64)
    bitmat = ((idx[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
    return np.packbits(bitmat.reshape(-1)).tobytes()


def unpack_uniform(data: bytes, n: int, num_symbols: int) -> np.ndarray:
    bits = max(1, int(np.ceil(np.log2(num_symbols))))
    raw = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * bits)
    bitmat = raw.reshape(n, bits).astype(np.uint64)
    shifts = np.arange(bits - 1, -1, -1, dtype=np.uint64)
    return (bitmat << shifts[None, :]).sum(axis=1).astype(np.int32)
