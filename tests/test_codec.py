"""End-to-end bitstream round-trip through the full codec path.

This is the TPU analog of the reference's de-facto unit test
(model/compression.py:282-289): feature -> compress -> file bytes ->
decompress, checking (a) decode reproduces the encoder's y_hat bit-exactly
and (b) container round-trips.
"""
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdeic_tpu.models.compression import CompressionModel
from rdeic_tpu.pipeline.codec import CompressionCodec
from rdeic_tpu.utils.bitstream import read_body, write_body

SMALL = dict(
    in_nc=8, out_nc=4, N=8, M=8, slice_num=2, slice_ch=(4, 4), codebook_size=32
)


@pytest.fixture(scope="module")
def codec():
    model = CompressionModel(**SMALL)
    x = jnp.zeros((1, 8, 8, 8))
    params = model.init({"params": jax.random.PRNGKey(0)}, x, rng=jax.random.PRNGKey(1))
    return CompressionCodec(model, params)


def test_compress_decompress_roundtrip(codec):
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8)) * 2.0
    out = codec.compress(x)
    assert out["shape"] == (1, 1)
    c_latent, guide_hint = codec.decompress(out["strings"], out["shape"])
    assert c_latent.shape == (1, 8, 8, 4)
    assert guide_hint.shape == (1, 8, 8, 8)
    # determinism: decompress twice -> identical
    c2, g2 = codec.decompress(out["strings"], out["shape"])
    np.testing.assert_array_equal(np.asarray(c_latent), np.asarray(c2))
    np.testing.assert_array_equal(np.asarray(guide_hint), np.asarray(g2))


def test_compress_deterministic(codec):
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 8))
    s1 = codec.compress(x)
    s2 = codec.compress(x)
    assert s1["strings"][0][0] == s2["strings"][0][0]
    assert s1["strings"][1][0] == s2["strings"][1][0]


def test_container_roundtrip_through_file(codec, tmp_path):
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 8))
    out = codec.compress(x)
    p = tmp_path / "img.rdeic"
    with p.open("wb") as f:
        write_body(f, out["shape"], out["strings"])
    with p.open("rb") as f:
        strings, shape = read_body(f)
    assert strings[0][0] == out["strings"][0][0]
    c1, _ = codec.decompress(out["strings"], out["shape"])
    c2, _ = codec.decompress(strings, shape)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_fused_codec_matches_multiprogram(codec):
    """The fused pure_callback path must produce identical bitstreams and
    reconstructions to the multi-program path."""
    import jax.numpy as jnp
    from rdeic_tpu.pipeline.codec import CompressionCodec

    fused = CompressionCodec(codec.model, codec.params, fused=True)
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 8, 8, 8))
    a = codec.compress(x)
    b = fused.compress(x)
    assert a["shape"] == b["shape"]
    assert a["strings"][1][0] == b["strings"][1][0]  # hyper indices identical
    ca, ga = codec.decompress(a["strings"], a["shape"])
    cb, gb = fused.decompress(b["strings"], b["shape"])
    np.testing.assert_allclose(np.asarray(ca), np.asarray(cb), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-6)
    # fused self-roundtrip determinism
    cb2, gb2 = fused.decompress(b["strings"], b["shape"])
    np.testing.assert_array_equal(np.asarray(cb), np.asarray(cb2))


def test_batched_codec_matches_single(codec):
    """Batched fused coding must produce the same per-image streams as
    single-image fused coding."""
    from rdeic_tpu.pipeline.codec import CompressionCodec

    fused = CompressionCodec(codec.model, codec.params, fused=True)
    x = jax.random.normal(jax.random.PRNGKey(11), (3, 8, 8, 8))
    batch = fused.compress_batch(x)
    assert len(batch) == 3
    for i in range(3):
        single = fused.compress(x[i : i + 1])
        assert batch[i]["strings"][0][0] == single["strings"][0][0]
        assert batch[i]["strings"][1][0] == single["strings"][1][0]
    c_b, g_b = fused.decompress_batch(batch)
    assert c_b.shape[0] == 3
    c_0, g_0 = fused.decompress(batch[0]["strings"], batch[0]["shape"])
    np.testing.assert_allclose(
        np.asarray(c_b[0:1]), np.asarray(c_0), atol=1e-5
    )


def test_batched_multiprogram_matches_fused_batch(codec):
    """The multi-program batched path must produce identical per-image
    streams to the fused batched path."""
    from rdeic_tpu.pipeline.codec import CompressionCodec

    fused = CompressionCodec(codec.model, codec.params, fused=True)
    multi = CompressionCodec(codec.model, codec.params, fused=False)
    x = jax.random.normal(jax.random.PRNGKey(13), (2, 8, 8, 8))
    a = fused.compress_batch(x)
    m = multi.compress_batch(x)
    for i in range(2):
        assert a[i]["strings"][1][0] == m[i]["strings"][1][0]
    c_a, g_a = fused.decompress_batch(a)
    c_m, g_m = multi.decompress_batch(m)
    np.testing.assert_allclose(np.asarray(c_a), np.asarray(c_m), atol=1e-5)
    # multi batched self-consistency with multi single
    c_s, _ = multi.decompress(m[0]["strings"], m[0]["shape"])
    np.testing.assert_array_equal(np.asarray(c_m[0:1]), np.asarray(c_s))


def test_int16_transfer_guards():
    """Symbols cross the device<->host boundary as int16 (tunnel bandwidth);
    the guards must turn an out-of-range value into a loud error instead of
    a silent wrap that would corrupt the stream."""
    from rdeic_tpu.pipeline.codec import _check_sym_range, _sym_i16

    _check_sym_range([0, 120, 32766])  # in range: no raise
    with pytest.raises(OverflowError):
        _check_sym_range([12, 40000])
    out = _sym_i16(np.array([[1, -5, 32766]], np.int32))
    assert out.dtype == jnp.int16
    with pytest.raises(OverflowError):
        _sym_i16(np.array([40000], np.int32))


def test_multiprogram_transfer_dtypes(codec):
    """The multi-program chain's boundary tensors must stay slim: uint8
    indexes out of the pass programs, int16 symbols in/out."""
    multi = CompressionCodec(codec.model, codec.params, fused=False)
    params = multi.params
    x = jax.random.normal(jax.random.PRNGKey(21), (1, 8, 8, 8))
    y, indices, hyper = multi._analyze(params, x)
    means_a, idx_a, channel_ctx = multi._pass_a0(
        params, hyper=hyper, y_hat_prev=None
    )
    assert idx_a.dtype == jnp.uint8
    sym_a, max_a = multi._symbols(y, means_a, anchor=True, lo=0, hi=4)
    assert sym_a.dtype == jnp.int16
    assert int(max_a) >= 0
    anchor_half, means_na, idx_na = multi._pass_b[0](
        params, sym_a=sym_a, means_a_sq=means_a, hyper=hyper,
        channel_ctx=channel_ctx,
    )
    assert idx_na.dtype == jnp.uint8


def test_interleaved_roundtrip_and_cross_decode(codec):
    """lanes>0: encode stripes symbols over K device-decodable rANS lanes.
    The interleaved decode must reproduce the encoder's y_hat bit-exactly
    (same pass programs both directions), a plain codec must auto-detect
    and decode the 3-string container, and batched must match single."""
    il = CompressionCodec(codec.model, codec.params, lanes=4)
    x = jax.random.normal(jax.random.PRNGKey(31), (2, 8, 8, 8)) * 2.0
    outs = il.compress_batch(x)
    assert len(outs[0]["strings"]) == 3  # payload, z, lane header
    c_b, g_b = il.decompress_batch(outs)
    assert c_b.shape == (2, 8, 8, 4) and g_b.shape == (2, 8, 8, 8)

    # single-image encode -> identical stream to the batched per-image one
    single = il.compress(x[:1])
    assert single["strings"][0][0] == outs[0]["strings"][0][0]
    c_s, g_s = il.decompress(single["strings"], single["shape"])
    np.testing.assert_array_equal(np.asarray(c_b[:1]), np.asarray(c_s))

    # a codec built WITHOUT lanes decodes the stream via auto-detection
    plain = CompressionCodec(codec.model, codec.params)
    c_p, g_p = plain.decompress(single["strings"], single["shape"])
    np.testing.assert_array_equal(np.asarray(c_s), np.asarray(c_p))

    # interleaved decode == the multi-program host decode of the SAME
    # content coded without lanes (same pass programs -> same y_hat)
    legacy = CompressionCodec(codec.model, codec.params, fused=False)
    lout = legacy.compress(x[:1])
    c_l, g_l = legacy.decompress(lout["strings"], lout["shape"])
    np.testing.assert_array_equal(np.asarray(c_l), np.asarray(c_s))


def test_interleaved_corrupt_stream_safe(codec):
    il = CompressionCodec(codec.model, codec.params, lanes=4)
    x = jax.random.normal(jax.random.PRNGKey(33), (1, 8, 8, 8))
    out = il.compress(x)
    payload = bytearray(out["strings"][0][0])
    for i in range(4, min(len(payload), 40)):
        payload[i] ^= 0xA5
    bad = [[bytes(payload)], out["strings"][1], out["strings"][2]]
    c, g = il.decompress(bad, out["shape"])  # must not crash
    assert np.all(np.isfinite(np.asarray(c)))


def test_v2_shared_container_roundtrip(codec, monkeypatch):
    """Default lane containers are v2 shared-stream: one merged payload,
    4-byte header (no per-lane size table), adaptive K from the payload
    size; decode auto-routes (host coder below device_min_lanes) and
    reproduces the v1 content bit-exactly."""
    x = jax.random.normal(jax.random.PRNGKey(57), (2, 8, 8, 8)) * 2.0
    il = CompressionCodec(codec.model, codec.params, lanes=4)
    assert il.shared
    outs = il.compress_batch(x)
    ver, k, sizes = il._parse_lane_header(outs[0]["strings"][2][0])
    assert ver == 2 and sizes is None
    assert len(outs[0]["strings"][2][0]) == 4
    assert 2 <= k <= 4
    # v2 payload must be strictly smaller than the v1 container
    # (payload + size table) for the same content
    monkeypatch.setenv("RDEIC_RANS_SHARED", "0")
    v1 = CompressionCodec(codec.model, codec.params, lanes=4)
    o1 = v1.compress_batch(x)
    monkeypatch.delenv("RDEIC_RANS_SHARED")
    for a, b in zip(outs, o1):
        v2_total = len(a["strings"][0][0]) + len(a["strings"][2][0])
        v1_total = len(b["strings"][0][0]) + len(b["strings"][2][0])
        assert v2_total < v1_total
    # decode matches the v1 decode of the same images
    c2, g2 = il.decompress_batch(outs)
    c1, g1 = v1.decompress_batch(o1)
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(g1))


def test_device_enc_matches_host_enc(codec, monkeypatch):
    """The device-side lane encoder must emit byte-identical containers to
    the host rans_encode_interleaved fallback path (both pinned to the v1
    per-lane format — the device encoder keeps symbols on device, so the
    v2 merge's index replay is a host-side step it skips by design)."""
    x = jax.random.normal(jax.random.PRNGKey(41), (2, 8, 8, 8)) * 2.0
    monkeypatch.setenv("RDEIC_RANS_SHARED", "0")
    monkeypatch.setenv("RDEIC_RANS_DEVICE_ENC", "1")
    dev = CompressionCodec(codec.model, codec.params, lanes=4)
    assert dev.device_enc
    monkeypatch.delenv("RDEIC_RANS_DEVICE_ENC")
    host = CompressionCodec(codec.model, codec.params, lanes=4)
    assert not host.device_enc  # host encode is the measured default
    o_dev = dev.compress_batch(x)
    o_host = host.compress_batch(x)
    for a, b in zip(o_dev, o_host):
        assert a["strings"][0][0] == b["strings"][0][0]
        assert a["strings"][1][0] == b["strings"][1][0]
        assert a["strings"][2][0] == b["strings"][2][0]
        assert a["shape"] == b["shape"]
