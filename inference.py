"""Single-image encode -> bitstream -> decode CLI.

Role parity: /root/reference/inference.py — pads each image to a multiple of
64, writes a real bitstream per image, reports per-image bpp from the file
size, relay-samples with the spaced DDPM or DDIM sampler, saves PNGs.
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import jax
import numpy as np
from PIL import Image

from rdeic_tpu.data.dataset import list_image_files
from rdeic_tpu.registry import instantiate_from_config, load_yaml
from rdeic_tpu.utils.checkpoint_io import load_inference_params
from rdeic_tpu.utils.image import pad, to_float01, to_uint8


def process(model, params, img01, sampler, steps, stream_path, guidance_scale, rng):
    """Compress one padded image to a file, decode it back. Returns
    (reconstruction uint8 HWC, bpp). Parity: inference.py:22-91."""
    h, w = img01.shape[1:3]
    bpp = model.apply_condition_compress(params, img01, stream_path, h, w)
    c_latent, guide_hint = model.apply_condition_decompress(params, stream_path)
    fn = model.jitted_decode(steps=steps, sampler=sampler,
                             guidance_scale=guidance_scale)
    out = fn(params, c_latent, guide_hint, rng)
    return to_uint8(out[0]), bpp


def main():
    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    ap = argparse.ArgumentParser()
    from rdeic_tpu.utils.backend import add_platform_arg, apply_platform

    add_platform_arg(ap)
    ap.add_argument("--ckpt", type=str, required=True,
                    help="params .npz (converter) or an orbax train-state "
                         "checkpoint dir (train.py runs/*/checkpoints[/step_N])")
    ap.add_argument("--config", type=str, default="configs/model/rdeic.yaml")
    ap.add_argument("--input", type=str, required=True, help="image file or dir")
    ap.add_argument("--output", type=str, required=True)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--sampler", type=str, default="ddpm", choices=["ddpm", "ddim"])
    ap.add_argument("--guidance_scale", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=231)
    ap.add_argument("--show_lq", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 denoiser compute (TPU-native autocast)")
    args = ap.parse_args()
    apply_platform(args.platform)

    model = instantiate_from_config(load_yaml(args.config))
    if args.bf16:
        import jax.numpy as jnp

        model.set_compute_dtype(jnp.bfloat16)
    params = load_inference_params(args.ckpt, cast_denoiser_bf16=args.bf16)

    in_path = Path(args.input)
    files = [str(in_path)] if in_path.is_file() else list_image_files(str(in_path))
    out_dir = Path(args.output)
    (out_dir / "bitstreams").mkdir(parents=True, exist_ok=True)

    rng = jax.random.PRNGKey(args.seed)
    total_bpp, times = [], []
    for fp in files:
        name = Path(fp).stem
        arr = np.array(Image.open(fp).convert("RGB"))
        H, W = arr.shape[:2]
        img01 = to_float01(pad(arr, 64))[None]
        rng, sub = jax.random.split(rng)
        t0 = time.time()
        recon, bpp = process(
            model, params, img01, args.sampler, args.steps,
            str(out_dir / "bitstreams" / f"{name}.rdeic"),
            args.guidance_scale, sub,
        )
        dt = time.time() - t0
        recon = recon[:H, :W]
        Image.fromarray(recon).save(out_dir / f"{name}.png")
        # bpp was computed over padded dims inside process; recompute on real
        size = (out_dir / "bitstreams" / f"{name}.rdeic").stat().st_size
        bpp = size * 8 / (H * W)
        total_bpp.append(bpp)
        times.append(dt)
        print(f"{name}: bpp={bpp:.5f} time={dt:.2f}s")
    if total_bpp:
        print(f"avg bpp={np.mean(total_bpp):.5f} avg time={np.mean(times):.2f}s")


if __name__ == "__main__":
    main()
