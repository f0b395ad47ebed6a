"""Flash-attention block-size sweep at the shapes the model actually runs.

Measures the Pallas kernel at the UNet/VAE self-attention shapes for a
768x512 input (latent 96x64) across (block_q, block_k) candidates, plus the
XLA sdp path as the reference point. Prints a winner per shape; use the
results to set the defaults in rdeic_tpu/ops/flash_attention.py.

Shapes (SD2.1 UNet head dim 64; VAE mid-block single 512-dim head):
  level1: B*5 heads,  seq 6144, d 64
  level2: B*10 heads, seq 1536, d 64
  level3: B*20 heads, seq 384,  d 64
  vae:    B*1 head,   seq 6144, d 512
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from rdeic_tpu.ops.attention import sdp_attention
from rdeic_tpu.ops.flash_attention import _flash_forward


def timeit(fn, q, k, v, iters=20):
    """Median-of-3 per-call ms, measured as ONE jitted lax.scan of `iters`
    chained calls (each iteration's output perturbs the next query, so the
    device must run them sequentially). Host-side loops with
    block_until_ready under-measure through the axon tunnel — small
    dispatches report ~0.02 ms for workloads whose FLOP floor is ~2 ms."""

    @jax.jit
    def chained(q, k, v):
        def body(carry, _):
            out = fn(carry, k, v)
            return out.astype(carry.dtype), ()

        final, _ = jax.lax.scan(body, q, None, length=iters)
        # scalar result: the host fetch (float()) forces execution through
        # the axon tunnel; block_until_ready alone does not.
        return jnp.sum(final.astype(jnp.float32))

    float(chained(q, k, v))  # compile + first run
    # measured fetch floor (tunnel RTT): trivial computation, same fetch
    @jax.jit
    def trivial(q):
        return jnp.sum(q[0, 0, 0].astype(jnp.float32))

    float(trivial(q))
    t0 = time.time()
    for _ in range(3):
        float(trivial(q))
    rtt = (time.time() - t0) / 3
    times = []
    for _ in range(3):
        t0 = time.time()
        float(chained(q, k, v))
        times.append(max(time.time() - t0 - rtt, 0.0) / iters * 1000)
    return float(np.median(times))


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    shapes = {
        "unet_l1": (b, 6144, 5, 64),
        "unet_l2": (b, 1536, 10, 64),
        "unet_l3": (b, 384, 20, 64),
        "vae_mid": (b, 6144, 1, 512),
    }
    blocks = [128, 256, 512, 1024]
    rng = np.random.default_rng(0)
    results = {}
    for name, (B, L, H, D) in shapes.items():
        q = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.bfloat16)
        try:
            ref_ms = timeit(jax.jit(sdp_attention), q, k, v)
        except Exception as e:
            ref_ms = float("nan")
            print(f"{name}: sdp failed ({str(e)[:80]})")
        rows = []
        for bq in blocks:
            if bq > L:
                continue
            for bk in blocks:
                if bk > L:
                    continue
                try:
                    ms = timeit(
                        lambda q, k, v, bq=bq, bk=bk: _flash_forward(
                            q, k, v, block_q=bq, block_k=bk
                        ),
                        q, k, v,
                    )
                    rows.append((ms, bq, bk))
                    print(f"{name} bq={bq} bk={bk}: {ms:.2f} ms "
                          f"(sdp {ref_ms:.2f})", flush=True)
                except Exception as e:
                    print(f"{name} bq={bq} bk={bk}: FAIL {str(e)[:80]}",
                          flush=True)
        if rows:
            best = min(rows)
            results[name] = {
                "best_ms": round(best[0], 3),
                "block_q": best[1],
                "block_k": best[2],
                "sdp_ms": round(ref_ms, 3),
                "speedup_vs_sdp": round(ref_ms / best[0], 2)
                if ref_ms == ref_ms else None,
            }
    import json

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
