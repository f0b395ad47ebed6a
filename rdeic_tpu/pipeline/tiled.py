"""Tiled high-resolution inference with overlap stitching.

NEW capability (required by BASELINE.json config 4; the reference reaches
high resolution only by batching or downscaling — SURVEY.md §5.7). Large
images are split into fixed-size overlapping tiles; every tile runs through
the full codec + relay sampler as ONE batched XLA program (tiles share a
shape, so there is exactly one compile), and the batch dimension shards
across chips over the "dp" mesh axis for multi-chip decode. Reconstructed
tiles are blended with linear ramps in the overlap bands.

Two stream layouts:
- v1 (independent tiles): each tile carries its own (y, z) strings. Simple,
  but pays an entropy-context reset at every tile boundary.
- v2 (cross-tile context, default): only the MEMORY-heavy stages are tiled
  — VAE feature extraction on the way in, relay sampler + VAE decoder on
  the way out. The entropy model runs ONCE over the whole image's stitched
  feature map (it lives at 1/16 of pixel resolution, so even 8K images are
  small there), giving the full spatial/channel context everywhere: tiled
  bpp == whole-image bpp by construction.

Bitstream container: the standard write_body framing with a meta string
(original size, tile grid, version) followed by the (y, z) strings.
"""
from __future__ import annotations

import struct
from pathlib import Path
import jax
import jax.numpy as jnp
import numpy as np

from rdeic_tpu.utils.bitstream import read_body, write_body
from rdeic_tpu.utils.image import pad

_META_FMT = ">6I"  # v1: H, W, tile, overlap, n_th, n_tw
_META2_FMT = ">7I"  # v2: version(=2), H, W, tile, overlap, n_th, n_tw


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
            # pass the codec container through verbatim: 2 groups in the
            # legacy format, 3 with interleaved lanes (codec.py)
            strings.extend(out["strings"])
            zshape = out["shape"]
    meta = struct.pack(_META_FMT, H, W, tile, overlap, len(ys), len(xs))
    with Path(stream_path).open("wb") as f:
        write_body(f, zshape, [[meta]] + strings)
    return Path(stream_path).stat().st_size * 8.0 / (H * W)


def _vae_factor(model) -> int:
    return 2 ** (len(model.vae.ch_mult) - 1)


def _batched_tile_decode(
    model, params, c_latent, guide_hint, rng, steps, sampler, tile_batch,
    mesh,
) -> np.ndarray:
    """Relay-sample + VAE-decode a stack of latent tiles (dp-shardable)."""
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
    return np.concatenate(outs)


def _blend_tiles(recon_tiles, ys, xs, tile, overlap, ph, pw, H, W):
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


def tiled_decompress_decode(
    model, params, stream_path: str, rng: jax.Array,
    steps: int = 2, sampler: str = "ddpm", tile_batch: int = 0,
    mesh=None,
) -> np.ndarray:
    """Decode a tiled bitstream (v1 or v2) -> [1, H, W, 3] in [0,1].

    tile_batch: how many tiles to relay-sample per device batch (0 = all).
    With a mesh, the tile batch is sharded over the "dp" axis.
    """
    with Path(stream_path).open("rb") as f:
        strings, zshape = read_body(f)
    (meta,) = strings[0]
    if len(meta) == struct.calcsize(_META2_FMT):
        return _decompress_decode_xctx(
            model, params, strings, zshape, meta, rng, steps, sampler,
            tile_batch, mesh,
        )
    H, W, tile, overlap, n_th, n_tw = struct.unpack(_META_FMT, meta)
    tiles = strings[1:]
    n_tiles = n_th * n_tw
    # per-tile group count: 2 legacy (y, z) or 3 interleaved (y, z, lanes)
    gs, rem = divmod(len(tiles), n_tiles)
    if rem or gs not in (2, 3):
        raise ValueError(
            f"corrupt tiled stream: {len(tiles)} tile strings for "
            f"{n_tiles} tiles"
        )

    codec = model.codec(params)
    c_latents, hints = [], []
    for i in range(n_tiles):
        cl, gh = codec.decompress(tiles[gs * i : gs * (i + 1)], zshape)
        c_latents.append(cl)
        hints.append(gh)
    c_latent = jnp.concatenate(c_latents)
    guide_hint = jnp.concatenate(hints)

    recon_tiles = _batched_tile_decode(
        model, params, c_latent, guide_hint, rng, steps, sampler,
        tile_batch, mesh,
    )
    ph = -(-H // 64) * 64
    pw = -(-W // 64) * 64
    ys, xs = _tile_grid(ph, pw, tile, overlap)
    return _blend_tiles(recon_tiles, ys, xs, tile, overlap, ph, pw, H, W)


# ---------------------------------------------------------------------------
# v2: cross-tile entropy context (tile the heavy stages, code the whole image)
# ---------------------------------------------------------------------------
def tiled_compress_xctx(
    model, params, img01: np.ndarray, stream_path: str,
    tile: int = 512, overlap: int = 64,
) -> float:
    """Cross-tile-context compression: VAE features are extracted per tile
    (bounded memory), hard-stitched on their valid centers, and the entropy
    model codes the WHOLE feature map once — no per-tile context reset, so
    bpp matches whole-image coding. img01: [1, H, W, 3] in [0,1]."""
    if tile % 64 != 0:
        raise ValueError(f"tile must be a multiple of 64, got {tile}")
    f = _vae_factor(model)
    if overlap % (2 * f) != 0:
        raise ValueError(f"overlap must be a multiple of {2 * f}, got {overlap}")
    H, W = img01.shape[1:3]
    padded = pad(np.asarray(img01), 64)
    ph, pw = padded.shape[1:3]
    tile = min(tile, ph, pw)
    ys, xs = _tile_grid(ph, pw, tile, overlap)

    feat_fn = model._jitted_feature()
    C = model.compression.in_nc
    fh, fw = ph // f, pw // f
    tf, ovf = tile // f, overlap // f
    grid = [(y0, x0) for y0 in ys for x0 in xs]
    # batch the tile VAE encodes (one dispatch per 8 tiles) and stitch the
    # valid centers ON DEVICE: the feature map never crosses the link
    # (the ~8 MB/tile fp32 pulls were the encode-side hot spot), and the
    # stitched array feeds codec.compress as pure async device dataflow
    patches = np.concatenate(
        [padded[:, y0 : y0 + tile, x0 : x0 + tile] for y0, x0 in grid]
    )
    bs = 8
    h_batches = [
        feat_fn(params, jnp.asarray(patches[j : j + bs]))
        for j in range(0, len(grid), bs)
    ]
    h_full = jnp.zeros((1, fh, fw, C), h_batches[0].dtype)
    for i, (y0, x0) in enumerate(grid):
        h_tile = h_batches[i // bs][i % bs : i % bs + 1]
        y0f, x0f = y0 // f, x0 // f
        ys_v = 0 if y0 == 0 else ovf // 2
        ye_v = tf if y0 + tile >= ph else tf - ovf // 2
        xs_v = 0 if x0 == 0 else ovf // 2
        xe_v = tf if x0 + tile >= pw else tf - ovf // 2
        h_full = h_full.at[
            :, y0f + ys_v : y0f + ye_v, x0f + xs_v : x0f + xe_v
        ].set(h_tile[:, ys_v:ye_v, xs_v:xe_v])

    out = model.codec(params).compress(jnp.asarray(h_full))
    meta = struct.pack(_META2_FMT, 2, H, W, tile, overlap, len(ys), len(xs))
    with Path(stream_path).open("wb") as fp:
        write_body(fp, out["shape"], [[meta]] + out["strings"])
    return Path(stream_path).stat().st_size * 8.0 / (H * W)


def _decompress_decode_xctx(
    model, params, strings, zshape, meta, rng, steps, sampler, tile_batch,
    mesh,
) -> np.ndarray:
    _v, H, W, tile, overlap, n_th, n_tw = struct.unpack(_META2_FMT, meta)
    if len(strings) not in (3, 4):  # meta + codec container (2 or 3 groups)
        raise ValueError(
            f"corrupt cross-tile stream: {len(strings)} string groups, "
            "expected meta + y + z [+ lane table]"
        )
    codec = model.codec(params)
    c_latent, guide_hint = codec.decompress(strings[1:], zshape)

    f = _vae_factor(model)
    lt, lov = tile // f, overlap // f
    lh, lw = c_latent.shape[1:3]
    lys, lxs = _tile_grid(lh, lw, lt, lov)
    cl_tiles = jnp.concatenate(
        [
            c_latent[:, y0 : y0 + lt, x0 : x0 + lt]
            for y0 in lys
            for x0 in lxs
        ]
    )
    gh_tiles = jnp.concatenate(
        [
            guide_hint[:, y0 : y0 + lt, x0 : x0 + lt]
            for y0 in lys
            for x0 in lxs
        ]
    )
    recon_tiles = _batched_tile_decode(
        model, params, cl_tiles, gh_tiles, rng, steps, sampler, tile_batch,
        mesh,
    )
    ph, pw = lh * f, lw * f
    ys = [y0 * f for y0 in lys]
    xs = [x0 * f for x0 in lxs]
    return _blend_tiles(recon_tiles, ys, xs, tile, overlap, ph, pw, H, W)
