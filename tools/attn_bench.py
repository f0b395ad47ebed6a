"""Per-shape attention timing for the train-step attribution.

Times the EXACT attention calls of the full-width B=8 512px train step
(counted by tracing model.loss_fn with an instrumented dispatcher — see
tools/conv_inventory.py's sibling analysis): self-attention routes to the
Pallas flash kernel at seq >= 1024 (ops/attention.py:attention), the
seq-256/64 and all cross-attention (Lk=77) calls to fused XLA sdp.
Forward and forward+backward, chained in-jit with the hard device_get
sync (same tunnel hazards as tools/conv_bench.py).

Usage: python tools/attn_bench.py [--iters 20]
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

# (label, (B, L, H, D), Lk, per-step fwd count, with_bwd)
# counts from the loss-trace: x5 at the 320-ch level etc.; the VAE
# encoder mid-attn (h1 d512) is frozen + upstream-of-trainables -> fwd only
SHAPES = [
    ("self4096 h5 d64", (8, 4096, 5, 64), 4096, 5, True),
    ("self1024 h10 d64", (8, 1024, 10, 64), 1024, 5, True),
    ("self256 h20 d64", (8, 256, 20, 64), 256, 5, True),
    ("self4096 h4 d16", (8, 4096, 4, 16), 4096, 2, True),
    ("self1024 h8 d16", (8, 1024, 8, 16), 1024, 2, True),
    ("self256 h16 d16", (8, 256, 16, 16), 256, 2, True),
    ("vae4096 h1 d512", (8, 4096, 1, 512), 4096, 1, False),
    ("cross4096 h5 d64", (8, 4096, 5, 64), 77, 5, True),
    ("cross1024 h10 d64", (8, 1024, 10, 64), 77, 5, True),
]

_DEPTH = 4  # attention calls chained per jit


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def time_call(fn, x, rest, iters):
    first = lambda o: o[0] if isinstance(o, tuple) else o
    for _ in range(2):
        x = first(fn(x, *rest))
    _sync(x)
    t0 = time.time()
    _sync(x)
    t_pull = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        x = first(fn(x, *rest))
    jax.block_until_ready(x)
    _sync(x)
    return (time.time() - t0 - t_pull) / iters * 1000.0 / _DEPTH


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--filter", type=str, default=None,
                    help="substring filter on shape labels (smoke tests)")
    args = ap.parse_args()
    shapes = [s for s in SHAPES
              if args.filter is None or args.filter in s[0]]
    log(f"devices: {jax.devices()}")
    from rdeic_tpu.ops.attention import attention
    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    rows = []
    for label, qshape, lk, n_per_step, with_bwd in shapes:
        b, lq, h, d = qshape
        q = jax.device_put(jnp.asarray(
            rng.normal(size=qshape), jnp.bfloat16))
        k = jax.device_put(jnp.asarray(
            rng.normal(size=(b, lk, h, d)), jnp.bfloat16))
        v = jax.device_put(jnp.asarray(
            rng.normal(size=(b, lk, h, d)), jnp.bfloat16))
        cot = jax.device_put(jnp.asarray(
            rng.normal(size=qshape), jnp.bfloat16))

        def chain(q, k, v):
            for _ in range(_DEPTH):
                # mild scale keeps magnitudes sane; output feeds back as q
                q = attention(q, k, v) * 0.5 + q * 0.5
            return q

        fwd = jax.jit(chain)

        def loss(q, k, v):
            return jnp.sum((chain(q, k, v) * cot).astype(jnp.float32))

        grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        flops = 4 * b * h * lq * lk * d  # QK^T + PV
        row = {"label": label, "q": list(qshape), "lk": lk,
               "n_per_step": n_per_step,
               "flops_G": round(flops / 1e9, 2)}
        try:
            tf = time_call(fwd, q, (k, v), args.iters)
            row["fwd_ms"] = round(tf, 4)
            row["fwd_tflops"] = round(flops / tf / 1e9, 1)
            row["fwd_step_ms"] = round(tf * n_per_step, 3)
        except Exception as e:
            row["fwd_error"] = repr(e)[:160]
        if with_bwd:
            try:
                tg = time_call(grad, q, (k, v), args.iters)
                row["fwdbwd_ms"] = round(tg, 4)
                row["fwdbwd_step_ms"] = round(tg * n_per_step, 3)
            except Exception as e:
                row["bwd_error"] = repr(e)[:160]
        log(json.dumps(row))
        rows.append(row)
    total_fwd = sum(r.get("fwd_step_ms", 0) for r in rows)
    total_fb = sum(
        r.get("fwdbwd_step_ms", r.get("fwd_step_ms", 0)) for r in rows
    )
    summary = {"attn_fwd_ms_per_step": round(total_fwd, 1),
               "attn_fwdbwd_ms_per_step": round(total_fb, 1)}
    log(json.dumps(summary))
    print(json.dumps({"rows": rows, **summary}, indent=1))
    if args.out:
        Path(args.out).write_text(
            json.dumps({"rows": rows, **summary}, indent=1))


if __name__ == "__main__":
    main()
