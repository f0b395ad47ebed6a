"""rANS round-trip bit-exactness tests (the de-facto contract of the stack)."""
import numpy as np
import pytest

from rdeic_tpu.entropy.coder import (
    BufferedRansEncoder,
    CdfTable,
    RansDecoder,
    pack_uniform,
    rans_decode,
    rans_encode,
    unpack_uniform,
)
from rdeic_tpu.ops.gaussian import build_cdf_tables, get_scale_table


@pytest.fixture(scope="module")
def table():
    cdf, lengths, offsets = build_cdf_tables(get_scale_table())
    return CdfTable(cdf, lengths, offsets)


def test_roundtrip_gaussian_symbols(table):
    rng = np.random.default_rng(0)
    n = 20000
    indexes = rng.integers(0, 64, size=n).astype(np.int32)
    # symbols drawn roughly matching each scale level
    scale_table = get_scale_table()
    scales = scale_table[indexes]
    symbols = np.round(rng.normal(0, scales)).astype(np.int32)
    stream = rans_encode(symbols, indexes, table)
    decoded = rans_decode(stream, indexes, table)
    np.testing.assert_array_equal(decoded, symbols)
    # compression actually happens: well-modeled symbols ≪ 4 bytes each
    assert len(stream) < n * 2


def test_roundtrip_with_outliers(table):
    # symbols far outside the per-level CDF range exercise the bypass path
    rng = np.random.default_rng(1)
    n = 1000
    indexes = np.zeros(n, dtype=np.int32)  # smallest scale: range ±1
    symbols = rng.integers(-100000, 100000, size=n).astype(np.int32)
    stream = rans_encode(symbols, indexes, table)
    decoded = rans_decode(stream, indexes, table)
    np.testing.assert_array_equal(decoded, symbols)


def test_empty_stream(table):
    stream = rans_encode(np.zeros(0, np.int32), np.zeros(0, np.int32), table)
    out = rans_decode(stream, np.zeros(0, np.int32), table)
    assert out.shape == (0,)


def test_buffered_encoder_multi_chunk_matches_single(table):
    rng = np.random.default_rng(2)
    chunks = [rng.integers(-5, 6, size=k).astype(np.int32) for k in (10, 300, 7)]
    idxs = [rng.integers(0, 64, size=c.shape[0]).astype(np.int32) for c in chunks]
    enc = BufferedRansEncoder()
    for s, i in zip(chunks, idxs):
        enc.encode_with_indexes(s, i)
    stream = enc.flush(table)
    assert stream == rans_encode(np.concatenate(chunks), np.concatenate(idxs), table)


def test_streaming_decode_in_passes(table):
    # decode in several decode_stream calls, mirroring the 20-pass slice loop
    rng = np.random.default_rng(3)
    chunks = [rng.integers(-8, 9, size=k).astype(np.int32) for k in (64, 128, 32)]
    idxs = [rng.integers(0, 64, size=c.shape[0]).astype(np.int32) for c in chunks]
    stream = rans_encode(np.concatenate(chunks), np.concatenate(idxs), table)
    dec = RansDecoder()
    dec.set_stream(stream)
    for s, i in zip(chunks, idxs):
        np.testing.assert_array_equal(dec.decode_stream(i, table), s)
    dec.close()


def test_corrupted_stream_does_not_crash(table):
    rng = np.random.default_rng(4)
    n = 500
    indexes = rng.integers(0, 64, size=n).astype(np.int32)
    symbols = np.round(rng.normal(0, 3, size=n)).astype(np.int32)
    stream = bytearray(rans_encode(symbols, indexes, table))
    stream[len(stream) // 2] ^= 0xFF  # flip bits mid-stream
    out = rans_decode(bytes(stream), indexes, table)  # must not crash
    assert out.shape == (n,)


def test_rate_close_to_entropy(table):
    # unit-scale gaussian: entropy ~ 2.1 bits/symbol; coder should be close
    rng = np.random.default_rng(5)
    n = 100000
    scale_table = get_scale_table()
    level = int(np.argmin(np.abs(scale_table - 1.0)))
    indexes = np.full(n, level, dtype=np.int32)
    symbols = np.round(rng.normal(0, 1.0, size=n)).astype(np.int32)
    stream = rans_encode(symbols, indexes, table)
    bits_per_symbol = len(stream) * 8 / n
    assert bits_per_symbol < 2.6  # entropy of round(N(0,1)) ≈ 2.1 bits


def test_pack_uniform_roundtrip():
    rng = np.random.default_rng(6)
    idx = rng.integers(0, 16384, size=257).astype(np.int32)
    data = pack_uniform(idx, 16384)
    assert len(data) == int(np.ceil(257 * 14 / 8))
    out = unpack_uniform(data, 257, 16384)
    np.testing.assert_array_equal(out, idx)


def test_bitstream_format_stability(table):
    """Golden bytes: the rANS stream format must stay stable across
    versions (a format change would break previously written files)."""
    symbols = np.array([0, 1, -1, 2, -2, 5, -17, 100000, 0, 3], np.int32)
    indexes = np.array([0, 5, 10, 20, 30, 40, 50, 60, 63, 32], np.int32)
    stream = rans_encode(symbols, indexes, table)
    assert stream.hex() == rans_encode(symbols, indexes, table).hex()
    # frozen golden value (update ONLY with a deliberate format bump)
    golden = "0b92d93c846f18a030d935a2ede37a69"
    import hashlib

    assert hashlib.md5(stream).hexdigest() == golden, stream.hex()


def test_bucketed_decode_matches_binary_search(table):
    """The default decode path (coarse-bucket search, 2.5x faster host
    decode) must be bit-identical to the plain binary-search path across
    in-range, escape, and extreme-bypass symbols."""
    rng = np.random.default_rng(11)
    n = 20000
    indexes = rng.integers(0, 64, size=n).astype(np.int32)
    scales = get_scale_table()[indexes]
    symbols = np.round(rng.normal(0, scales * 3)).astype(np.int32)
    symbols[:200] = rng.integers(-80000, 80000, size=200)
    stream = rans_encode(symbols, indexes, table)

    dec = RansDecoder()
    dec.set_stream(stream)
    fast = dec.decode_stream(indexes, table)  # bucketed default
    dec.close()
    dec = RansDecoder()
    dec.set_stream(stream)
    ref = dec.decode_stream_bsearch(indexes, table)
    dec.close()
    np.testing.assert_array_equal(fast, ref)
    np.testing.assert_array_equal(fast, symbols)


def test_lut_decode_matches_binary_search(table):
    """The O(1) LUT decode path must be bit-identical to the binary-search
    path (same stream, same symbols), including escape/bypass symbols."""
    import ctypes

    from rdeic_tpu.entropy.build import load_library
    from rdeic_tpu.entropy.coder import _as_i32, _ptr_i32

    rng = np.random.default_rng(7)
    n = 5000
    indexes = rng.integers(0, 64, size=n).astype(np.int32)
    scales = get_scale_table()[indexes]
    symbols = np.round(rng.normal(0, scales * 3)).astype(np.int32)  # escapes
    symbols[:100] = rng.integers(-50000, 50000, size=100)
    stream = rans_encode(symbols, indexes, table)

    dec = RansDecoder()
    dec.set_stream(stream)
    lut_out = dec.decode_stream_lut(indexes, table)
    dec.close()

    # raw binary-search path
    lib = load_library()
    buf = np.frombuffer(stream, dtype=np.uint8)
    i = _as_i32(indexes)
    out = np.empty(n, dtype=np.int32)
    rc = lib.rans_decode_with_indexes(
        np.ascontiguousarray(buf).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ),
        buf.shape[0], _ptr_i32(i), n,
        _ptr_i32(table.cdf), _ptr_i32(table.length), _ptr_i32(table.offset),
        table.ncdfs, table.max_len, _ptr_i32(out),
    )
    assert rc == 0
    np.testing.assert_array_equal(lut_out, out)
    np.testing.assert_array_equal(lut_out, symbols)
