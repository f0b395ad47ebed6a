"""Device (in-jit) interleaved rANS decode must be bit-exact vs the host
coder: same CDF tables, same per-symbol code (escape slot + 4-bit bypass
chunks), same renorm words. Reference behavior being replaced: the host
round trips of the multi-program decode chain (codec.py "Latency design");
the reference itself always decodes on the host (compressai
model/compression.py:215-273)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdeic_tpu.entropy.coder import (
    CdfTable,
    RansDecoder,
    rans_encode_interleaved,
)
from rdeic_tpu.entropy.device_rans import (
    DeviceRansTables,
    decode_pass,
    init_lane_state,
    lanes_from_bytes,
    pad_pass_indexes,
)
from rdeic_tpu.ops import gaussian as g


@pytest.fixture(scope="module")
def table():
    cdf, lengths, offsets = g.build_cdf_tables(g.get_scale_table())
    return CdfTable(cdf, lengths, offsets)


def _random_case(table, rng, n_passes, sizes, esc_frac=0.0):
    """Random (symbols, indexes) per pass; esc_frac forces bypass escapes."""
    syms, idxs, pass_sizes = [], [], []
    for p in range(n_passes):
        n = sizes[p]
        idx = rng.integers(0, table.ncdfs, n).astype(np.int32)
        max_v = table.length[idx] - 2
        off = table.offset[idx]
        # in-range values: offset + [0, max_v)
        v = (off + rng.integers(0, 1 << 30) % np.maximum(max_v, 1)).astype(
            np.int32
        )
        if esc_frac:
            esc = rng.random(n) < esc_frac
            wild = rng.integers(-3000, 3000, n).astype(np.int32)
            v = np.where(esc, wild, v)
        syms.append(v)
        idxs.append(idx)
        pass_sizes.append(n)
    return syms, idxs, pass_sizes


def _host_decode_interleaved(payload, lane_nbytes, idxs, k, table):
    """Host reference: per-lane persistent decoders, pass-striped order."""
    decs, pos = [], 0
    for nb in lane_nbytes:
        d = RansDecoder()
        d.set_stream(payload[pos : pos + int(nb)])
        pos += int(nb)
        decs.append(d)
    out = []
    for idx in idxs:
        n = idx.shape[0]
        res = np.zeros(n, np.int32)
        for lane in range(k):
            lane_idx = idx[lane::k]
            if lane_idx.size:
                res[lane::k] = decs[lane].decode_stream(lane_idx, table)
        out.append(res)
    for d in decs:
        d.close()
    return out


def _device_decode(payload, lane_nbytes, idxs, k, table):
    tabs = DeviceRansTables(table)
    words, nwords = lanes_from_bytes(payload, lane_nbytes)
    words = jnp.asarray(words)
    nwords = jnp.asarray(nwords)
    state, ptr = init_lane_state(words, nwords)
    outs = []
    for idx in idxs:
        padded, n = pad_pass_indexes(idx.astype(np.int32), k)
        syms, (state, ptr) = decode_pass(
            tabs, words, nwords, state, ptr, jnp.asarray(padded), n
        )
        outs.append(np.asarray(syms)[:n])
    return outs


@pytest.mark.parametrize("k,esc", [(4, 0.0), (4, 0.05), (7, 0.02)])
def test_device_matches_host(table, k, esc):
    rng = np.random.default_rng(0 if not esc else int(esc * 1000) + k)
    syms, idxs, sizes = _random_case(
        table, rng, n_passes=4, sizes=[64, 96, 40, 33], esc_frac=esc
    )
    payload, lane_nbytes = rans_encode_interleaved(
        np.concatenate(syms), np.concatenate(idxs), sizes, k, table
    )
    host = _host_decode_interleaved(payload, lane_nbytes, idxs, k, table)
    dev = _device_decode(payload, lane_nbytes, idxs, k, table)
    for h, d, s in zip(host, dev, syms):
        np.testing.assert_array_equal(h, s)  # host decodes what was encoded
        np.testing.assert_array_equal(d, s)  # device bit-exact too


def test_device_decode_batched(table):
    """Two independent images decoded in one vectorized program."""
    rng = np.random.default_rng(7)
    k = 8
    cases = []
    for _ in range(2):
        syms, idxs, sizes = _random_case(
            table, rng, n_passes=2, sizes=[48, 80], esc_frac=0.03
        )
        payload, lane_nbytes = rans_encode_interleaved(
            np.concatenate(syms), np.concatenate(idxs), sizes, k, table
        )
        cases.append((syms, idxs, payload, lane_nbytes))
    # stack to [B, K, W]
    lw = [lanes_from_bytes(c[2], c[3]) for c in cases]
    wmax = max(w.shape[1] for w, _ in lw)
    words = np.zeros((2, k, wmax), np.uint32)
    nwords = np.zeros((2, k), np.int32)
    for b, (w, nw) in enumerate(lw):
        words[b, :, : w.shape[1]] = w
        nwords[b] = nw
    tabs = DeviceRansTables(table)
    words = jnp.asarray(words)
    nwords = jnp.asarray(nwords)
    state, ptr = init_lane_state(words, nwords)
    for p in range(2):
        idx_b = np.stack([c[1][p] for c in cases])
        padded, n = pad_pass_indexes(idx_b.astype(np.int32), k)
        syms, (state, ptr) = decode_pass(
            tabs, words, nwords, state, ptr, jnp.asarray(padded), n
        )
        for b in range(2):
            np.testing.assert_array_equal(
                np.asarray(syms)[b, :n], cases[b][0][p]
            )


def test_corrupt_lanes_never_crash(table):
    """Garbage lane bytes must decode to garbage, not crash (crash-safety
    parity with the host decoder's zero-fill)."""
    rng = np.random.default_rng(3)
    k = 4
    payload = rng.integers(0, 256, 160, dtype=np.uint8).tobytes()
    lane_nbytes = np.full(k, 40, np.int32)
    idx = rng.integers(0, table.ncdfs, 50).astype(np.int32)
    out = _device_decode(payload, lane_nbytes, [idx], k, table)
    assert out[0].shape == (50,)
    assert np.all(np.isfinite(out[0]))


# ---------------------------------------------------------------------------
# Device-side ENCODING (entropy/device_rans.encode_lanes) — must emit the
# byte-identical payload to the host rans_encode_interleaved for the same
# (symbols, indexes, pass striping), escapes included.
# ---------------------------------------------------------------------------
from rdeic_tpu.entropy.device_rans import (  # noqa: E402
    assemble_lane_payloads,
    build_pass_steps,
    encode_lanes,
)


def _device_encode(syms, idxs, k, table, wcap=None, batch=None):
    """Encode per-pass flat arrays on device; returns per-image
    (payload, lane_nbytes). `batch` stacks the same case B times."""
    tabs = DeviceRansTables(table)
    b = batch or 1
    sym_b = [jnp.asarray(np.stack([s] * b)) for s in syms]
    idx_b = [jnp.asarray(np.stack([i] * b)) for i in idxs]
    sym_steps, idx_steps, valid_steps = build_pass_steps(sym_b, idx_b, k)
    t_tot = int(sym_steps.shape[0])
    if wcap is None:  # random test data is high-entropy (~14 bits/sym)
        wcap = max(64, 4 * t_tot)
    words, nwords, ovf = encode_lanes(
        tabs, sym_steps, idx_steps, valid_steps, wcap
    )
    words, nwords, ovf = map(np.asarray, (words, nwords, ovf))
    return [
        assemble_lane_payloads(words[i], nwords[i]) for i in range(b)
    ], bool(ovf)


@pytest.mark.parametrize("k,esc", [(4, 0.0), (4, 0.08), (7, 0.02)])
def test_device_encode_matches_host(table, k, esc):
    rng = np.random.default_rng(11 + k + int(esc * 100))
    syms, idxs, sizes = _random_case(
        table, rng, n_passes=4, sizes=[64, 96, 40, 33], esc_frac=esc
    )
    payload, lane_nbytes = rans_encode_interleaved(
        np.concatenate(syms), np.concatenate(idxs), sizes, k, table
    )
    outs, ovf = _device_encode(syms, idxs, k, table)
    assert not ovf
    dev_payload, dev_nbytes = outs[0]
    np.testing.assert_array_equal(dev_nbytes, lane_nbytes)
    assert dev_payload == payload


def test_device_encode_batched_and_roundtrip(table):
    """B=3 identical images encode to 3 identical host-exact streams, and
    the device decoder reads a device-encoded stream back bit-exact."""
    rng = np.random.default_rng(23)
    syms, idxs, sizes = _random_case(
        table, rng, n_passes=3, sizes=[80, 31, 57], esc_frac=0.05
    )
    payload, lane_nbytes = rans_encode_interleaved(
        np.concatenate(syms), np.concatenate(idxs), sizes, 4, table
    )
    outs, ovf = _device_encode(syms, idxs, 4, table, batch=3)
    assert not ovf
    for dev_payload, dev_nbytes in outs:
        assert dev_payload == payload
        np.testing.assert_array_equal(dev_nbytes, lane_nbytes)
    dec = _device_decode(payload, lane_nbytes, idxs, 4, table)
    for d, s in zip(dec, syms):
        np.testing.assert_array_equal(d, s)


def test_device_encode_overflow_flag(table):
    """A wcap too small for the stream must raise the overflow flag (the
    codec then falls back to the host encoder) and never scatter out of
    the lane's capacity window."""
    rng = np.random.default_rng(5)
    syms, idxs, _ = _random_case(table, rng, n_passes=1, sizes=[256])
    outs, ovf = _device_encode(syms, idxs, 4, table, wcap=4)
    assert ovf


def test_device_encode_wide_escape_flags_fallback(table):
    """z >= 2^18 exceeds the 6-stage bypass pipeline (cannot happen for
    int16-guarded codec symbols); the encoder must flag it so the codec
    falls back to the host encoder rather than miscode."""
    syms = [np.array([10_000_000], np.int32)]
    idxs = [np.array([0], np.int32)]
    outs, ovf = _device_encode(syms, idxs, 2, table)
    assert ovf
