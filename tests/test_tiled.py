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
