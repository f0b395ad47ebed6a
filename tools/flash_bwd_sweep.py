"""Flash-attention BACKWARD block sweep on the v5e.

Round-5 attribution found flash bwd is ~61 ms/step at the 64x64 level
alone (attn_bench): the forward blocks were sweep-tuned in round 3 but
dq/dkv always ran 512/512. This sweeps (block_q, block_k) for the
backward via the RDEIC_FLASH_BWD_* env knobs — in subprocesses, because
the custom_vjp reads the env at trace time and jit caches by trace.

Usage: python tools/flash_bwd_sweep.py [--iters 10]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

SHAPES = [
    ("8x4096 h5 d64", (8, 4096, 5, 64)),
    ("8x4096 h4 d16", (8, 4096, 4, 16)),
    ("8x1024 h10 d64", (8, 1024, 10, 64)),
]
COMBOS = [(256, 256), (256, 512), (512, 512), (512, 1024),
          (1024, 512), (1024, 1024)]

_CHILD = r"""
import sys, time, json
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp, numpy as np
from rdeic_tpu.ops.flash_attention import flash_attention
from rdeic_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
shape = %(shape)r
rng = np.random.default_rng(0)
q = jax.device_put(jnp.asarray(rng.normal(size=shape), jnp.bfloat16))
k = jax.device_put(jnp.asarray(rng.normal(size=shape), jnp.bfloat16))
v = jax.device_put(jnp.asarray(rng.normal(size=shape), jnp.bfloat16))
cot = jax.device_put(jnp.asarray(rng.normal(size=shape), jnp.bfloat16))
def loss(q, k, v):
    return jnp.sum((flash_attention(q, k, v) * cot).astype(jnp.float32))
grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
def sync(x):
    return float(jax.device_get(jnp.sum(x[0].astype(jnp.float32))))
x = q
for _ in range(2):
    x = grad(x, k, v)[0]
sync((x,))
t0 = time.time(); sync((x,)); t_pull = time.time() - t0
iters = %(iters)d
t0 = time.time()
for _ in range(iters):
    x = grad(x, k, v)[0]
jax.block_until_ready(x)
sync((x,))
print(json.dumps({"ms": (time.time() - t0 - t_pull) / iters * 1000.0}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    repo = str(Path(__file__).parent.parent)
    results = []
    for label, shape in SHAPES:
        for bq, bk in COMBOS:
            env = dict(os.environ,
                       RDEIC_FLASH_BWD_BQ=str(bq),
                       RDEIC_FLASH_BWD_BK=str(bk))
            code = _CHILD % {"repo": repo, "shape": shape,
                             "iters": args.iters}
            try:
                out = subprocess.run(
                    [sys.executable, "-c", code], env=env,
                    capture_output=True, text=True, timeout=900,
                )
                if out.returncode == 0:
                    ms = json.loads(out.stdout.strip().splitlines()[-1])["ms"]
                    row = {"label": label, "bq": bq, "bk": bk,
                           "fwdbwd_ms": round(ms, 3)}
                else:
                    tail = (out.stderr or "")[-200:]
                    row = {"label": label, "bq": bq, "bk": bk,
                           "error": tail.replace("\n", " ")[-160:]}
            except subprocess.TimeoutExpired:
                row = {"label": label, "bq": bq, "bk": bk,
                       "error": "timeout"}
            print(json.dumps(row), file=sys.stderr, flush=True)
            results.append(row)
    print(json.dumps(results, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
