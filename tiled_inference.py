"""Tiled high-resolution inference CLI (2K+ images, overlap stitching).

NEW capability beyond the reference (BASELINE.json config 4): spatial tiles
coded independently and relay-decoded as one batched XLA program, optionally
sharded across chips over the dp mesh axis.
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import numpy as np
from PIL import Image

from rdeic_tpu.data.dataset import list_image_files
from rdeic_tpu.parallel.mesh import make_mesh
from rdeic_tpu.pipeline.tiled import (
    tiled_compress,
    tiled_compress_xctx,
    tiled_decompress_decode,
)
from rdeic_tpu.registry import instantiate_from_config, load_yaml
from rdeic_tpu.utils.checkpoint_io import load_inference_params
from rdeic_tpu.utils.image import to_float01, to_uint8
from rdeic_tpu.utils.metrics import MetricSuite


def main():
    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    ap = argparse.ArgumentParser()
    from rdeic_tpu.utils.backend import add_platform_arg, apply_platform

    add_platform_arg(ap)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--config", type=str, default="configs/model/rdeic.yaml")
    ap.add_argument("--input", type=str, required=True)
    ap.add_argument("--output", type=str, required=True)
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--overlap", type=int, default=64)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--sampler", type=str, default="ddpm")
    ap.add_argument("--tile_batch", type=int, default=0)
    ap.add_argument("--use_mesh", action="store_true",
                    help="shard the tile batch across all local devices")
    ap.add_argument("--independent_tiles", action="store_true",
                    help="v1 layout: per-tile entropy coding (default is "
                         "cross-tile context — whole-image entropy pass, "
                         "no bpp overhead at tile boundaries)")
    ap.add_argument("--seed", type=int, default=231)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 denoiser compute (TPU-native autocast)")
    args = ap.parse_args()
    apply_platform(args.platform)

    model = instantiate_from_config(load_yaml(args.config))
    if args.bf16:
        import jax.numpy as jnp

        model.set_compute_dtype(jnp.bfloat16)
    params = load_inference_params(args.ckpt, cast_denoiser_bf16=args.bf16)
    mesh = make_mesh() if args.use_mesh else None
    suite = MetricSuite()
    psnr_f = suite.create_metric("psnr")

    in_path = Path(args.input)
    files = [str(in_path)] if in_path.is_file() else list_image_files(str(in_path))
    out_dir = Path(args.output)
    (out_dir / "bitstreams").mkdir(parents=True, exist_ok=True)

    rng = jax.random.PRNGKey(args.seed)
    for f in files:
        name = Path(f).stem
        arr = np.array(Image.open(f).convert("RGB"))
        H, W = arr.shape[:2]
        stream = out_dir / "bitstreams" / f"{name}.rdeic"
        t0 = time.time()
        compress_fn = (
            tiled_compress if args.independent_tiles else tiled_compress_xctx
        )
        bpp = compress_fn(
            model, params, to_float01(arr)[None], str(stream),
            tile=args.tile, overlap=args.overlap,
        )
        enc_t = time.time() - t0
        rng, sub = jax.random.split(rng)
        t0 = time.time()
        out01 = tiled_decompress_decode(
            model, params, str(stream), sub, steps=args.steps,
            sampler=args.sampler, tile_batch=args.tile_batch, mesh=mesh,
        )
        dec_t = time.time() - t0
        recon = to_uint8(out01[0])
        Image.fromarray(recon).save(out_dir / f"{name}.png")
        import jax.numpy as jnp

        p = float(psnr_f(
            jnp.asarray(arr, jnp.float32)[None] / 255,
            jnp.asarray(recon, jnp.float32)[None] / 255,
        )[0])
        print(f"{name} ({H}x{W}): bpp={bpp:.5f} psnr={p:.2f} "
              f"enc={enc_t:.2f}s dec={dec_t:.2f}s")


if __name__ == "__main__":
    main()
