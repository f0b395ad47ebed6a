"""v2 shared-stream interleaved rANS: one word stream for all K lanes,
pull-ordered by the vector decode schedule (csrc/rans.cpp v2 section).

Must hold: (a) host encode -> host SharedRansDecoder roundtrip, (b) the
shared stream is exactly the v1 lane words re-ordered (same total bytes,
minus the per-lane size table the container no longer stores), (c) the
DEVICE decode (decode_pass_shared, runs on CPU here — pure lax) is
symbol-exact vs the host decoder including escapes, (d) corrupt streams
never crash. Reference context: the reference always decodes host-side
(compressai model/compression.py:215-273); this format is TPU-native
serving design with no reference analog."""
import jax.numpy as jnp
import numpy as np
import pytest

from rdeic_tpu.entropy.coder import (
    CdfTable,
    SharedRansDecoder,
    rans_encode_interleaved,
    rans_encode_interleaved_shared,
    rans_lanes_to_shared,
)
from rdeic_tpu.entropy.device_rans import (
    DeviceRansTables,
    decode_pass_shared,
    init_shared_state,
    pad_pass_indexes,
    shared_words_from_bytes,
)
from rdeic_tpu.ops import gaussian as g
from tests.test_device_rans import _random_case  # same fixture recipe


@pytest.fixture(scope="module")
def table():
    cdf, lengths, offsets = g.build_cdf_tables(g.get_scale_table())
    return CdfTable(cdf, lengths, offsets)


def _encode_shared(table, syms, idxs, pass_sizes, k):
    return rans_encode_interleaved_shared(
        np.concatenate(syms), np.concatenate(idxs), pass_sizes, k, table
    )


@pytest.mark.parametrize("k", [2, 8, 32])
@pytest.mark.parametrize("esc_frac", [0.0, 0.15])
def test_shared_roundtrip_host(table, k, esc_frac):
    rng = np.random.default_rng(0)
    syms, idxs, pass_sizes = _random_case(
        table, rng, 3, [257, 64, 31], esc_frac=esc_frac)
    payload = _encode_shared(table, syms, idxs, pass_sizes, k)
    dec = SharedRansDecoder(payload, k)
    for s, ix in zip(syms, idxs):
        got = dec.decode_pass(ix, table)
        np.testing.assert_array_equal(got, s)
    dec.close()


def test_shared_is_merge_of_v1_lanes(table):
    """encode_shared == v1 encode + rans_lanes_to_shared, and the byte
    count equals the v1 lane bytes exactly (the rate win is the dropped
    per-lane size table, not a different code)."""
    rng = np.random.default_rng(1)
    k = 16
    syms, idxs, pass_sizes = _random_case(
        table, rng, 2, [130, 77], esc_frac=0.1)
    flat_i = np.concatenate(idxs)
    v1_payload, lane_nbytes = rans_encode_interleaved(
        np.concatenate(syms), flat_i, pass_sizes, k, table)
    merged = rans_lanes_to_shared(
        v1_payload, lane_nbytes, flat_i, pass_sizes, table)
    direct = _encode_shared(table, syms, idxs, pass_sizes, k)
    assert merged == direct
    assert len(merged) == int(np.asarray(lane_nbytes).sum())


@pytest.mark.parametrize("k", [8, 128])
@pytest.mark.parametrize("esc_frac", [0.0, 0.2])
def test_shared_device_decode_matches(table, k, esc_frac):
    rng = np.random.default_rng(2)
    syms, idxs, pass_sizes = _random_case(
        table, rng, 3, [300, 65, 17], esc_frac=esc_frac)
    payload = _encode_shared(table, syms, idxs, pass_sizes, k)
    tabs = DeviceRansTables(table)
    words_np, nw = shared_words_from_bytes(payload)
    words = jnp.asarray(words_np)[None]  # [B=1, W]
    nwords = jnp.asarray([nw], jnp.int32)
    state, ptr = init_shared_state(words, nwords, k)
    for s, ix in zip(syms, idxs):
        idx_pad, n = pad_pass_indexes(ix.astype(np.int32), k)
        got, (state, ptr) = decode_pass_shared(
            tabs, words, nwords, state, ptr, jnp.asarray(idx_pad)[None], n)
        np.testing.assert_array_equal(np.asarray(got)[0, :n], s)


def test_shared_device_decode_batched(table):
    """Two images with different symbols share one compiled shape; each
    stream decodes independently (per-image cursor)."""
    rng = np.random.default_rng(3)
    k = 8
    cases = [_random_case(table, rng, 2, [96, 40], esc_frac=0.1)
             for _ in range(2)]
    payloads = [
        _encode_shared(table, s, ix, ps, k) for (s, ix, ps) in cases
    ]
    tabs = DeviceRansTables(table)
    mats = [shared_words_from_bytes(p) for p in payloads]
    wmax = max(m[0].shape[0] for m in mats)
    words = np.zeros((2, wmax), np.uint32)
    nwords = np.zeros((2,), np.int32)
    for i, (w, nw) in enumerate(mats):
        words[i, : w.shape[0]] = w
        nwords[i] = nw
    words = jnp.asarray(words)
    nwords = jnp.asarray(nwords)
    state, ptr = init_shared_state(words, nwords, k)
    for p in range(2):
        idx_pad0, n = pad_pass_indexes(cases[0][1][p].astype(np.int32), k)
        idx_pad1, _ = pad_pass_indexes(cases[1][1][p].astype(np.int32), k)
        idx = jnp.asarray(np.stack([idx_pad0, idx_pad1]))
        got, (state, ptr) = decode_pass_shared(
            tabs, words, nwords, state, ptr, idx, n)
        for i in range(2):
            np.testing.assert_array_equal(
                np.asarray(got)[i, :n], cases[i][0][p])


def test_shared_corrupt_never_crash(table):
    rng = np.random.default_rng(4)
    k = 8
    syms, idxs, pass_sizes = _random_case(
        table, rng, 2, [64, 32], esc_frac=0.1)
    payload = bytearray(_encode_shared(table, syms, idxs, pass_sizes, k))
    # trash everything after the lane-state head
    for pos in range(4 * k, len(payload)):
        payload[pos] = (payload[pos] * 31 + 7) % 256
    # host: must terminate and return SOMETHING
    dec = SharedRansDecoder(bytes(payload), k)
    for ix in idxs:
        out = dec.decode_pass(ix, table)
        assert out.shape == ix.shape
    dec.close()
    # device: same
    tabs = DeviceRansTables(table)
    words_np, nw = shared_words_from_bytes(bytes(payload))
    words = jnp.asarray(words_np)[None]
    nwords = jnp.asarray([nw], jnp.int32)
    state, ptr = init_shared_state(words, nwords, k)
    for ix in idxs:
        idx_pad, n = pad_pass_indexes(ix.astype(np.int32), k)
        got, (state, ptr) = decode_pass_shared(
            tabs, words, nwords, state, ptr, jnp.asarray(idx_pad)[None], n)
        assert got.shape[-1] == idx_pad.shape[-1]
