"""Tiled high-resolution inference with overlap stitching.

NEW capability (required by BASELINE.json config 4; the reference reaches
high resolution only by batching or downscaling — SURVEY.md §5.7). Large
images are split into fixed-size overlapping tiles; every tile runs through
the full codec + relay sampler as ONE batched XLA program (tiles share a
shape, so there is exactly one compile), and the batch dimension shards
across chips over the "dp" mesh axis for multi-chip decode. Reconstructed
tiles are blended with linear ramps in the overlap bands.

Bitstream container: the standard write_body framing with a meta string
(original size, tile grid) followed by per-tile (y, z) strings.
"""
from __future__ import annotations

import struct
from pathlib import Path
import jax
import jax.numpy as jnp
import numpy as np

from rdeic_tpu.utils.bitstream import read_body, write_body
from rdeic_tpu.utils.image import pad

_META_FMT = ">6I"  # H, W, tile, overlap, n_th, n_tw


def _tile_grid(h: int, w: int, tile: int, overlap: int):
    """Tile origins covering [0,h)x[0,w) with `overlap` pixel overlap."""
    stride = tile - overlap
    ys = list(range(0, max(h - tile, 0) + 1, stride))
    if ys[-1] + tile < h:
        ys.append(h - tile)
    xs = list(range(0, max(w - tile, 0) + 1, stride))
    if xs[-1] + tile < w:
        xs.append(w - tile)
    return ys, xs


def _blend_weight(tile: int, overlap: int) -> np.ndarray:
    """[tile, tile, 1] linear ramp weights for overlap blending."""
    ramp = np.ones(tile, dtype=np.float32)
    if overlap > 0:
        r = np.linspace(1.0 / (overlap + 1), 1.0, overlap, dtype=np.float32)
        ramp[:overlap] = r
        ramp[-overlap:] = r[::-1]
    return (ramp[:, None] * ramp[None, :])[..., None]


def tiled_compress(
    model, params, img01: np.ndarray, stream_path: str,
    tile: int = 512, overlap: int = 64,
) -> float:
    """img01: [1, H, W, 3] in [0,1], H/W arbitrary. Returns total bpp."""
    if tile % 64 != 0:
        raise ValueError(f"tile must be a multiple of 64, got {tile}")
    if overlap % 2 != 0:
        raise ValueError(f"overlap must be even, got {overlap}")
    H, W = img01.shape[1:3]
    padded = pad(np.asarray(img01), 64)
    ph, pw = padded.shape[1:3]
    tile = min(tile, ph, pw)
    ys, xs = _tile_grid(ph, pw, tile, overlap)

    codec = model.codec(params)
    feat_fn = model._jitted_feature()
    strings = []
    zshape = None
    for y0 in ys:
        for x0 in xs:
            patch = jnp.asarray(padded[:, y0 : y0 + tile, x0 : x0 + tile])
            h = feat_fn(params, patch)
            out = codec.compress(h)
            strings.append(out["strings"][0])  # [y_string]
            strings.append(out["strings"][1])  # [z_string]
            zshape = out["shape"]
    meta = struct.pack(_META_FMT, H, W, tile, overlap, len(ys), len(xs))
    with Path(stream_path).open("wb") as f:
        write_body(f, zshape, [[meta]] + strings)
    return Path(stream_path).stat().st_size * 8.0 / (H * W)


def tiled_decompress_decode(
    model, params, stream_path: str, rng: jax.Array,
    steps: int = 2, sampler: str = "ddpm", tile_batch: int = 0,
    mesh=None,
) -> np.ndarray:
    """Decode a tiled bitstream -> [1, H, W, 3] in [0,1].

    tile_batch: how many tiles to relay-sample per device batch (0 = all).
    With a mesh, the tile batch is sharded over the "dp" axis.
    """
    with Path(stream_path).open("rb") as f:
        strings, zshape = read_body(f)
    (meta,) = strings[0]
    H, W, tile, overlap, n_th, n_tw = struct.unpack(_META_FMT, meta)
    tiles = strings[1:]
    if len(tiles) != 2 * n_th * n_tw:
        raise ValueError(
            f"corrupt tiled stream: {len(tiles)} tile strings, "
            f"expected {2 * n_th * n_tw}"
        )

    codec = model.codec(params)
    c_latents, hints = [], []
    for i in range(n_th * n_tw):
        y_s, z_s = tiles[2 * i], tiles[2 * i + 1]
        cl, gh = codec.decompress([y_s, z_s], zshape)
        c_latents.append(cl)
        hints.append(gh)
    c_latent = jnp.concatenate(c_latents)
    guide_hint = jnp.concatenate(hints)

    fn = model.jitted_decode(steps=steps, sampler=sampler)
    n = c_latent.shape[0]
    bs = tile_batch or n
    outs = []
    for j in range(0, n, bs):
        rng, sub = jax.random.split(rng)
        cl = c_latent[j : j + bs]
        gh = guide_hint[j : j + bs]
        real = cl.shape[0]
        if mesh is not None:
            from rdeic_tpu.parallel.mesh import batch_sharding  # noqa: PLC0415

            # pad the tile batch to a multiple of the dp axis
            dp = mesh.shape["dp"]
            padn = (-real) % dp
            if padn:
                cl = jnp.concatenate([cl, jnp.tile(cl[-1:], (padn, 1, 1, 1))])
                gh = jnp.concatenate([gh, jnp.tile(gh[-1:], (padn, 1, 1, 1))])
            cl = jax.device_put(cl, batch_sharding(mesh))
            gh = jax.device_put(gh, batch_sharding(mesh))
        outs.append(np.asarray(fn(params, cl, gh, sub))[:real])
    recon_tiles = np.concatenate(outs)

    ph = -(-H // 64) * 64
    pw = -(-W // 64) * 64
    ys, xs = _tile_grid(ph, pw, tile, overlap)
    weight = _blend_weight(tile, overlap)
    acc = np.zeros((ph, pw, 3), np.float32)
    wacc = np.zeros((ph, pw, 1), np.float32)
    k = 0
    for y0 in ys:
        for x0 in xs:
            acc[y0 : y0 + tile, x0 : x0 + tile] += recon_tiles[k] * weight
            wacc[y0 : y0 + tile, x0 : x0 + tile] += weight
            k += 1
    out = acc / np.maximum(wacc, 1e-8)
    return out[None, :H, :W]
