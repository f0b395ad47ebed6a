"""Per-shape A/B of the fused GroupNorm kernels vs stock flax GroupNorm.

Sweeps the real RDEIC activation shapes (UNet/control levels at the 512px
train crop and the 768x512 decode scan; VAE full-res slabs) and times
stock XLA vs ops/fused_groupnorm.py, forward-only and forward+backward,
reporting effective HBM bandwidth so wins/losses can be read against the
v5e roofline (~810 GB/s). This is the instrument behind the train-MFU
work (round-4 verdict next #1): per-shape results decide the dispatch
policy instead of end-to-end step times alone.

Usage: python tools/gn_bench.py [--iters 20] [--dtype bf16]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from rdeic_tpu.ops import fused_groupnorm  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# (label, shape): every GroupNorm shape the 512px train step and the
# 768x512 decode scan actually run (UNet levels, ratio-0.2 control
# levels, VAE encoder/decoder stages)
SHAPES = [
    ("unet64x320 B8", (8, 64, 64, 320)),
    ("unet32x640 B8", (8, 32, 32, 640)),
    ("unet16x1280 B8", (8, 16, 16, 1280)),
    ("unet8x1280 B8", (8, 8, 8, 1280)),
    ("ctrl64x64 B8", (8, 64, 64, 64)),
    ("ctrl32x128 B8", (8, 32, 32, 128)),
    ("ctrl16x256 B8", (8, 16, 16, 256)),
    ("vae512x128 B1", (1, 512, 512, 128)),
    ("vae256x256 B1", (1, 256, 256, 256)),
    ("vae128x512 B1", (1, 128, 128, 512)),
    ("scan96x64x320 B16", (16, 96, 64, 320)),
    ("scan48x32x640 B16", (16, 48, 32, 640)),
    ("scan24x16x1280 B16", (16, 24, 16, 1280)),
]


def stock_gn(x, scale, bias, groups, silu):
    y = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=x.dtype).apply(
        {"params": {"scale": scale, "bias": bias}}, x)
    return jax.nn.silu(y) if silu else y


def time_call(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)  # compile
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1000.0


# Dispatches through the remote-TPU tunnel cost ~1-2 ms each, dwarfing a
# microsecond-scale GN kernel; so each timed unit CHAINS `depth` dependent
# applications inside one jit (y_{i+1} = gn(y_i): loop-carried, so XLA
# cannot hoist it) and reports per-application time.
_DEPTH = 32


def chain_fwd(gn_fn):
    def run(x, s, b):
        return jax.lax.fori_loop(
            0, _DEPTH, lambda i, y: gn_fn(y, s, b).astype(x.dtype), x)

    return jax.jit(run)


def chain_grad(gn_fn, cot):
    def loss(x, s, b):
        y = jax.lax.fori_loop(
            0, _DEPTH, lambda i, y: gn_fn(y, s, b).astype(x.dtype), x)
        return jnp.sum((y * cot).astype(jnp.float32))

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    log(f"devices: {jax.devices()}")

    from rdeic_tpu.models.blocks import find_denominator
    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    rows = []
    rng = np.random.default_rng(0)
    for label, shape in SHAPES:
        b, h, w, c = shape
        groups = find_denominator(c, 32)
        if not fused_groupnorm.supported(shape, dtype):
            log(f"{label}: not supported (c={c}) -> skipped")
            continue
        path_f = ("single"
                  if fused_groupnorm._fits_single_fwd(shape, dtype)
                  else "chunked")
        path_b = ("single"
                  if fused_groupnorm._fits_single_bwd(shape, dtype)
                  else "chunked")
        x = jax.device_put(jnp.asarray(
            rng.normal(size=shape), dtype=dtype))
        scale = jax.device_put(jnp.asarray(
            rng.normal(size=(c,)).astype(np.float32)))
        bias = jax.device_put(jnp.asarray(
            rng.normal(size=(c,)).astype(np.float32)))
        cot = jax.device_put(jnp.asarray(
            rng.normal(size=shape), dtype=dtype))

        def gn_fused(x, s, bi):
            return fused_groupnorm.group_norm(
                x, s, bi, groups=groups, silu=True)

        def gn_stock(x, s, bi):
            return stock_gn(x, s, bi, groups, True)

        fused_f = chain_fwd(gn_fused)
        stock_f = chain_fwd(gn_stock)
        fused_g = chain_grad(gn_fused, cot)
        stock_g = chain_grad(gn_stock, cot)

        row = {"label": label, "shape": list(shape), "groups": groups,
               "path_fwd": path_f, "path_bwd": path_b}
        slab_gb = b * h * w * c * jnp.dtype(dtype).itemsize / 1e9
        try:
            tf_stock = time_call(stock_f, (x, scale, bias),
                                 args.iters) / _DEPTH
            tf_fused = time_call(fused_f, (x, scale, bias),
                                 args.iters) / _DEPTH
            row["fwd_stock_ms"] = round(tf_stock, 3)
            row["fwd_fused_ms"] = round(tf_fused, 3)
            # fwd moves >= 1R+1W of the slab
            row["fwd_fused_gbps"] = round(2 * slab_gb / (tf_fused / 1e3), 0)
            row["fwd_speedup"] = round(tf_stock / tf_fused, 2)
        except Exception as e:
            row["fwd_error"] = repr(e)[:200]
        try:
            tg_stock = time_call(stock_g, (x, scale, bias),
                                 args.iters) / _DEPTH
            tg_fused = time_call(fused_g, (x, scale, bias),
                                 args.iters) / _DEPTH
            row["bwd_stock_ms"] = round(tg_stock, 3)
            row["bwd_fused_ms"] = round(tg_fused, 3)
            row["bwd_speedup"] = round(tg_stock / tg_fused, 2)
        except Exception as e:
            row["bwd_error"] = repr(e)[:200]
        log(json.dumps(row))
        rows.append(row)

    print(json.dumps(rows, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
