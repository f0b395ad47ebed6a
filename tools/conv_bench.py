"""Per-shape conv A/B vs the v5e roofline — the MFU-gap attribution tool.

The axon tunnel exposes no TPU xplane (profile_train_step.py's trace path
returns host planes only), so op-level attribution composes from
microbenches instead: this times every dominant 3x3 conv shape of the
512px train step (UNet levels, ratio-0.2 control levels, frozen-VAE
levels) forward and forward+backward, chained in-jit so tunnel dispatch
cannot masquerade as kernel time (same method as gn_bench.py), and
reports achieved efficiency against the per-shape roofline
max(FLOPs / 197 TF/s, HBM bytes / 810 GB/s).

If the convs run near roofline, the train-step MFU ceiling is the
model's own byte/FLOP mix + inter-op gaps, not conv layout copies
(round-4 verdict next #7).

Usage: python tools/conv_bench.py [--iters 10]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

PEAK_FLOPS = 197e12  # v5e bf16
PEAK_BW = 810e9      # v5e HBM

# (label, (B, H, W, Cin), Cout, with_bwd)
SHAPES = [
    ("unet64 320->320", (8, 64, 64, 320), 320, True),
    ("unet32 640->640", (8, 32, 32, 640), 640, True),
    ("unet16 1280->1280", (8, 16, 16, 1280), 1280, True),
    ("unet8 1280->1280", (8, 8, 8, 1280), 1280, True),
    ("ctrl64 64->64", (8, 64, 64, 64), 64, True),
    ("ctrl32 128->128", (8, 32, 32, 128), 128, True),
    ("ctrl16 256->256", (8, 16, 16, 256), 256, True),
    # the heaviest buckets of the ACTUAL train-step conv inventory
    # (tools/conv_inventory.py): compression/hyper stacks at 64x64 and
    # the UNet's wgrad-adjacent mid widths
    ("comp64 256->256", (8, 64, 64, 256), 256, True),
    ("comp64 512->512", (8, 64, 64, 512), 512, True),
    ("comp32 256->256", (8, 32, 32, 256), 256, True),
    ("vae512 128->128", (8, 512, 512, 128), 128, False),
    ("vae256 256->256", (8, 256, 256, 256), 256, False),
    ("vae128 512->512", (8, 128, 128, 512), 512, False),
]

_DEPTH = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(x):
    # Hard device sync: through the axon tunnel, block_until_ready can
    # return EARLY on the first timed executable of a fresh process
    # (observed: a 16-conv chain "measured" 29 us until a value pull
    # forced real sync; outputs were verified byte-identical, it is
    # purely a completion-signal race). A scalar device_get round-trip
    # is the only reliable barrier.
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def time_call(fn, args, iters):
    # Chain each iteration's (first) output into the next call so
    # sequential device execution is forced and identical dispatches
    # cannot be deduped.
    x, rest = args[0], args[1:]
    first = lambda o: o[0] if isinstance(o, tuple) else o
    for _ in range(2):
        x = first(fn(x, *rest))
    _sync(x)
    # measure the sync pull itself (~1 RTT + a small reduce) to subtract
    t0 = time.time()
    _sync(x)
    t_pull = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        x = first(fn(x, *rest))
    jax.block_until_ready(x)
    _sync(x)
    dt = time.time() - t0 - t_pull
    return dt / iters * 1000.0 / _DEPTH


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    log(f"devices: {jax.devices()}")
    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    rows = []
    for label, xshape, cout, with_bwd in SHAPES:
        b, h, w, cin = xshape
        assert cin == cout, "chain timing needs cin == cout"
        x = jax.device_put(jnp.asarray(
            rng.normal(size=xshape) * 0.1, jnp.bfloat16))
        k = jax.device_put(jnp.asarray(
            rng.normal(size=(3, 3, cin, cout)) * 0.02, jnp.bfloat16))
        cot = jax.device_put(jnp.asarray(
            rng.normal(size=xshape), jnp.bfloat16))

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.bfloat16,
            )

        def chain(x, k):
            # mild decay keeps bf16 magnitudes sane over the chain
            return jax.lax.fori_loop(
                0, _DEPTH, lambda i, y: conv(y, k) * 0.5, x)

        fwd = jax.jit(chain)

        def loss(x, k):
            return jnp.sum((chain(x, k) * cot).astype(jnp.float32))

        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))

        flops = 2 * 9 * b * h * w * cin * cout
        bytes_fwd = (b * h * w * cin + b * h * w * cout) * 2 + cin * cout * 18
        t_roof_f = max(flops / PEAK_FLOPS, bytes_fwd / PEAK_BW) * 1e3
        row = {"label": label, "shape": list(xshape), "cout": cout,
               "flops_G": round(flops / 1e9, 1),
               "roofline_fwd_ms": round(t_roof_f, 4)}
        try:
            tf = time_call(fwd, (x, k), args.iters)
            row["fwd_ms"] = round(tf, 4)
            row["fwd_eff_pct"] = round(100 * t_roof_f / tf, 1)
            row["fwd_tflops"] = round(flops / tf / 1e9, 1)
        except Exception as e:
            row["fwd_error"] = repr(e)[:160]
        if with_bwd:
            # bwd = dgrad + wgrad ~= 2x fwd FLOPs (3x total with fwd)
            t_roof_g = max(3 * flops / PEAK_FLOPS,
                           3 * bytes_fwd / PEAK_BW) * 1e3
            try:
                tg = time_call(grad, (x, k), args.iters)
                row["fwdbwd_ms"] = round(tg, 4)
                row["fwdbwd_eff_pct"] = round(100 * t_roof_g / tg, 1)
                row["fwdbwd_tflops"] = round(3 * flops / tg / 1e9, 1)
            except Exception as e:
                row["bwd_error"] = repr(e)[:160]
        log(json.dumps(row))
        rows.append(row)
    print(json.dumps(rows, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
