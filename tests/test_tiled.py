"""Tiled high-res inference: container round-trip + stitched output."""
import jax
import numpy as np
import pytest

from rdeic_tpu.pipeline import tiled
from tests.helpers import micro_rdeic


def test_tile_grid_and_blend():
    ys, xs = tiled._tile_grid(128, 192, 64, 32)
    assert ys[0] == 0 and ys[-1] + 64 >= 128
    assert xs[0] == 0 and xs[-1] + 64 >= 192
    w = tiled._blend_weight(64, 32)
    assert w.shape == (64, 64, 1)
    assert np.all(w > 0) and np.isclose(w.max(), 1.0)


@pytest.mark.slow
def test_tiled_roundtrip(tmp_path):
    model = micro_rdeic()
    params = model.init_params(jax.random.PRNGKey(0), image_hw=(64, 64))
    img = np.random.default_rng(0).uniform(0, 1, (1, 64, 96, 3)).astype("f4")
    stream = str(tmp_path / "tiled.rdeic")
    bpp = tiled.tiled_compress(model, params, img, stream, tile=64, overlap=32)
    assert bpp > 0
    out = tiled.tiled_decompress_decode(
        model, params, stream, jax.random.PRNGKey(1), steps=2
    )
    assert out.shape == (1, 64, 96, 3)
    assert np.all(np.isfinite(out))
    assert out.min() >= 0 and out.max() <= 1


@pytest.mark.slow
def test_tiled_decode_with_mesh(tmp_path):
    """Tile batch sharded over the dp mesh axis (multi-chip decode path)."""
    from rdeic_tpu.parallel.mesh import make_mesh

    model = micro_rdeic()
    params = model.init_params(jax.random.PRNGKey(0), image_hw=(64, 64))
    img = np.random.default_rng(1).uniform(0, 1, (1, 64, 128, 3)).astype("f4")
    stream = str(tmp_path / "tiled_mesh.rdeic")
    tiled.tiled_compress(model, params, img, stream, tile=64, overlap=32)
    mesh = make_mesh(dp=8, tp=1)
    out = tiled.tiled_decompress_decode(
        model, params, stream, jax.random.PRNGKey(2), steps=2, mesh=mesh
    )
    assert out.shape == (1, 64, 128, 3)
    assert np.all(np.isfinite(out))


@pytest.mark.slow
def test_cross_tile_context_bpp(tmp_path):
    """v2 layout: tiled bpp must match whole-image bpp (shared entropy
    context) and beat independent-tile coding; decode round-trips."""
    import jax.numpy as jnp

    model = micro_rdeic()
    params = model.init_params(jax.random.PRNGKey(0), image_hw=(64, 64))
    img = np.random.default_rng(2).uniform(0, 1, (1, 64, 128, 3)).astype("f4")
    H, W = 64, 128

    s_v1 = str(tmp_path / "v1.rdeic")
    s_v2 = str(tmp_path / "v2.rdeic")
    s_whole = str(tmp_path / "whole.rdeic")
    bpp_v1 = tiled.tiled_compress(model, params, img, s_v1, tile=64, overlap=32)
    bpp_v2 = tiled.tiled_compress_xctx(
        model, params, img, s_v2, tile=64, overlap=32
    )
    bpp_whole = model.apply_condition_compress(
        params, jnp.asarray(img), s_whole, H, W
    )
    assert bpp_v2 < bpp_v1, (bpp_v2, bpp_v1)
    # shared-context coding ~= whole-image coding (only conv-halo feature
    # differences at stitch seams remain)
    assert abs(bpp_v2 - bpp_whole) / bpp_whole < 0.02, (bpp_v2, bpp_whole)

    out = tiled.tiled_decompress_decode(
        model, params, s_v2, jax.random.PRNGKey(3), steps=2
    )
    assert out.shape == (1, H, W, 3)
    assert np.all(np.isfinite(out))
    assert out.min() >= 0 and out.max() <= 1


def test_cross_tile_validation():
    model = micro_rdeic()
    with pytest.raises(ValueError, match="multiple of"):
        tiled.tiled_compress_xctx(
            model, None, np.zeros((1, 64, 64, 3), "f4"), "/tmp/x.rdeic",
            tile=64, overlap=2,
        )


@pytest.mark.slow
def test_tiled_roundtrip_interleaved(tmp_path, monkeypatch):
    """Both tiled container versions must carry the interleaved (3-group)
    codec container transparently (v1: per-tile groups; v2: whole-image)."""
    monkeypatch.setenv("RDEIC_RANS_LANES", "4")
    model = micro_rdeic()
    params = model.init_params(jax.random.PRNGKey(0), image_hw=(64, 64))
    img = np.random.default_rng(2).uniform(0, 1, (1, 64, 96, 3)).astype("f4")

    s1 = str(tmp_path / "v1.rdeic")
    tiled.tiled_compress(model, params, img, s1, tile=64, overlap=32)
    out1 = tiled.tiled_decompress_decode(
        model, params, s1, jax.random.PRNGKey(1), steps=2
    )
    assert out1.shape == (1, 64, 96, 3) and np.all(np.isfinite(out1))

    s2 = str(tmp_path / "v2.rdeic")
    tiled.tiled_compress_xctx(model, params, img, s2, tile=64, overlap=32)
    out2 = tiled.tiled_decompress_decode(
        model, params, s2, jax.random.PRNGKey(1), steps=2
    )
    assert out2.shape == (1, 64, 96, 3) and np.all(np.isfinite(out2))
