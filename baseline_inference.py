"""Baseline sanity-check runner.

Role parity: /root/reference/baseline_inference.py — run N images through the
full encode/decode pipeline and record PSNR/SSIM/MS-SSIM/LPIPS + bpp to a
CSV, verifying the setup works end to end.
"""
from __future__ import annotations

import argparse
import csv
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from rdeic_tpu.data.dataset import list_image_files
from rdeic_tpu.registry import instantiate_from_config, load_yaml
from rdeic_tpu.utils.checkpoint_io import load_inference_params
from rdeic_tpu.utils.image import pad, to_float01, to_uint8
from rdeic_tpu.utils.metrics import MetricSuite


def process_single(model, params, path, out_dir, steps, sampler, rng):
    arr = np.array(Image.open(path).convert("RGB"))
    H, W = arr.shape[:2]
    img01 = to_float01(pad(arr, 64))[None]
    stream = out_dir / "bitstreams" / f"{Path(path).stem}.rdeic"
    t0 = time.time()
    model.apply_condition_compress(
        params, jnp.asarray(img01), str(stream), img01.shape[1], img01.shape[2]
    )
    enc_t = time.time() - t0
    t0 = time.time()
    c_latent, guide_hint = model.apply_condition_decompress(params, str(stream))
    fn = model.jitted_decode(steps=steps, sampler=sampler)
    out = np.asarray(fn(params, c_latent, guide_hint, rng))[0][:H, :W]
    dec_t = time.time() - t0
    bpp = stream.stat().st_size * 8 / (H * W)
    return arr, to_uint8(out), bpp, enc_t, dec_t


def main():
    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    ap = argparse.ArgumentParser()
    from rdeic_tpu.utils.backend import add_platform_arg, apply_platform

    add_platform_arg(ap)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--config", type=str, default="configs/model/rdeic.yaml")
    ap.add_argument("--input", type=str, required=True)
    ap.add_argument("--output", type=str, default="./baseline_out")
    ap.add_argument("--num_images", type=int, default=3)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--sampler", type=str, default="ddpm")
    ap.add_argument("--seed", type=int, default=231)
    args = ap.parse_args()
    apply_platform(args.platform)

    model = instantiate_from_config(load_yaml(args.config))
    params = load_inference_params(args.ckpt)
    suite = MetricSuite()
    fns = {n: suite.create_metric(n) for n in ("psnr", "ssim", "ms_ssim", "lpips")}

    in_path = Path(args.input)
    files = ([str(in_path)] if in_path.is_file() else list_image_files(str(in_path)))
    files = files[: args.num_images]
    out_dir = Path(args.output)
    (out_dir / "bitstreams").mkdir(parents=True, exist_ok=True)

    rng = jax.random.PRNGKey(args.seed)
    rows = []
    for f in files:
        rng, sub = jax.random.split(rng)
        ref, recon, bpp, enc_t, dec_t = process_single(
            model, params, f, out_dir, args.steps, args.sampler, sub
        )
        Image.fromarray(recon).save(out_dir / f"{Path(f).stem}.png")
        a = jnp.asarray(ref, jnp.float32)[None] / 255.0
        b = jnp.asarray(recon, jnp.float32)[None] / 255.0
        row = {"name": Path(f).stem, "bpp": bpp,
               "enc_time": enc_t, "dec_time": dec_t}
        for n, fn in fns.items():
            try:
                row[n] = float(fn(a, b)[0])
            except Exception:
                row[n] = float("nan")
        rows.append(row)
        print(row)

    with (out_dir / "baseline_metrics.csv").open("w", newline="") as fcsv:
        w = csv.DictWriter(fcsv, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_dir/'baseline_metrics.csv'}")


if __name__ == "__main__":
    main()
