"""Single-process flash-attention BACKWARD block sweep (round 5).

The subprocess-per-combo sweep (flash_bwd_sweep.py) costs ~8 min/combo on
a slow tunnel session (fresh device init + compile each time). This one
amortizes process startup: the env knobs are read at TRACE time, so a new
jit closure per combo forces a retrace that picks up the new blocks.

Sweeps the dominant train-step shape first (8x4096 h5 d64 — ~61 ms/step
fwd+bwd pool per attn_bench), then d16 if budget remains. The (512,512)
combo is the shipping default and serves as the in-sweep baseline.

Usage: python tools/flash_bwd_sweep_fast.py [--iters 20] [--budget_s 900]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

SHAPES = [
    ("8x4096 h5 d64", (8, 4096, 5, 64)),
    ("8x4096 h4 d16", (8, 4096, 4, 16)),
]
COMBOS = [(512, 512), (256, 256), (256, 512), (512, 256),
          (1024, 512), (512, 1024)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--budget_s", type=float, default=900.0)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rdeic_tpu.ops import flash_attention as fa
    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    t_start = time.time()
    results = []
    rng = np.random.default_rng(0)

    for label, shape in SHAPES:
        q = jax.device_put(jnp.asarray(rng.normal(size=shape), jnp.bfloat16))
        k = jax.device_put(jnp.asarray(rng.normal(size=shape), jnp.bfloat16))
        v = jax.device_put(jnp.asarray(rng.normal(size=shape), jnp.bfloat16))
        cot = jax.device_put(jnp.asarray(rng.normal(size=shape), jnp.bfloat16))
        for bq, bk in COMBOS:
            if time.time() - t_start > args.budget_s:
                print(json.dumps({"skipped": f"{label} {bq}x{bk}",
                                  "reason": "budget"}), file=sys.stderr,
                      flush=True)
                continue
            os.environ["RDEIC_FLASH_BWD_BQ"] = str(bq)
            os.environ["RDEIC_FLASH_BWD_BK"] = str(bk)

            # Fresh closure -> fresh jit cache entry -> re-trace reads env.
            def loss(q, k, v, _cot=cot):
                out = fa.flash_attention(q, k, v)
                return jnp.sum((out * _cot).astype(jnp.float32))

            grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            try:
                x = q
                for _ in range(2):  # compile + warm
                    x = grad(x, k, v)[0]
                float(jax.device_get(jnp.sum(x.astype(jnp.float32))))
                t0 = time.time()
                for _ in range(args.iters):
                    x = grad(x, k, v)[0]
                jax.block_until_ready(x)
                # hard completion sync (tunnel early-return hazard)
                float(jax.device_get(jnp.sum(x.astype(jnp.float32))))
                ms = (time.time() - t0) / args.iters * 1000.0
                row = {"label": label, "bq": bq, "bk": bk,
                       "fwdbwd_ms": round(ms, 3)}
            except Exception as e:  # noqa: BLE001 — record and continue
                row = {"label": label, "bq": bq, "bk": bk,
                       "error": str(e)[-160:].replace("\n", " ")}
            print(json.dumps(row), file=sys.stderr, flush=True)
            results.append(row)

    print(json.dumps(results, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
