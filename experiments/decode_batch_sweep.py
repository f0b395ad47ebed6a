"""Batched-decode sweep: stage breakdown + batch-size scaling on the v5e.

Measures, per batch size, the three stages of the batched serving path
(bench.py's `batched_run`):
  1. compress_batch   (VAE feature encode + entropy passes + host rANS enc)
  2. decompress_batch (host rANS dec + entropy passes)
  3. decode scan      (2-step relay sampling + VAE decode, pure device)

With --bf16_params the diffusion/VAE weights are stored bf16
(RDEIC.cast_inference_params), halving their HBM footprint — this is what
lifts the B=32 OOM ceiling found in round 2 (HLO temp copy in the scan,
25 MB short of 16 GB with fp32 weights).

Usage: python experiments/decode_batch_sweep.py --batches 24,32,40 [--bf16_params]
"""
from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="24,32")
    ap.add_argument("--bf16_params", action="store_true")
    ap.add_argument("--size", type=str, default="512x768")
    args = ap.parse_args()

    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    log(f"devices: {jax.devices()}")

    from rdeic_tpu.registry import instantiate_from_config, load_yaml
    from rdeic_tpu.utils.fast_init import fast_random_params

    model = instantiate_from_config(load_yaml("configs/model/rdeic.yaml"))
    model.set_compute_dtype(jnp.bfloat16)
    H, W = (int(x) for x in args.size.split("x"))
    params = fast_random_params(model, (H, W))
    if args.bf16_params:
        params = model.cast_inference_params(params)
        log("inference params cast to bf16 (vae/denoiser)")
    n_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params)
    )
    log(f"param bytes on device: {n_bytes/1e9:.2f} GB")

    img01 = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    )
    tmp = Path(tempfile.mkdtemp())

    for B in (int(b) for b in args.batches.split(",")):
        imgs = jnp.tile(img01, (B, 1, 1, 1))
        paths = [str(tmp / f"s{B}_{i}.rdeic") for i in range(B)]
        try:
            fn = model.jitted_decode(steps=2)
            # warm all programs for this shape
            model.apply_condition_compress_batch(params, imgs, paths)
            cl, gh = model.apply_condition_decompress_batch(params, paths)
            jax.block_until_ready(fn(params, cl, gh, jax.random.PRNGKey(0)))

            t0 = time.time()
            model.apply_condition_compress_batch(params, imgs, paths)
            t1 = time.time()
            cl, gh = model.apply_condition_decompress_batch(params, paths)
            jax.block_until_ready((cl, gh))
            t2 = time.time()
            out = fn(params, cl, gh, jax.random.PRNGKey(1))
            float(out.ravel()[0])  # host fetch: forces execution through
            # the axon tunnel (block_until_ready alone may not)
            t3 = time.time()
            tot = (t3 - t0) * 1000 / B
            log(
                f"B={B}: compress {1000*(t1-t0)/B:.0f} + decompress "
                f"{1000*(t2-t1)/B:.0f} + scan {1000*(t3-t2)/B:.0f} "
                f"= {tot:.0f} ms/img"
            )
        except Exception as e:
            log(f"B={B}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
