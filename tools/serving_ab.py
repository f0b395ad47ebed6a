"""Same-session serving A/B: v2 shared-stream containers vs v1 per-lane.

Times the two serving paths (batched B+micro scan, 3-stage pipeline) at
the bench configuration on whatever chip is attached, so format decisions
rest on a same-session measurement (BENCHLOG honesty rule).

Usage: python tools/serving_ab.py [--batch 32] [--micro 16] [--chunk 32]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def one_side(shared: str, args) -> dict:
    """Run one format side in a subprocess (codec format is chosen at
    construction from the env)."""
    env = dict(os.environ)
    env["RDEIC_RANS_SHARED"] = shared
    env["RDEIC_RANS_LANES"] = "128"
    code = f"""
import json, sys, time
sys.path.insert(0, {str(Path(__file__).parent.parent)!r})
import jax, jax.numpy as jnp, numpy as np
from rdeic_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from rdeic_tpu.registry import instantiate_from_config, load_yaml
from rdeic_tpu.utils.fast_init import fast_random_params
model = instantiate_from_config(load_yaml("configs/model/rdeic.yaml"))
model.set_compute_dtype(jnp.bfloat16)
H, W = 512, 768
params = fast_random_params(model, (H, W))
params = model.cast_inference_params(params)
img01 = jnp.asarray(np.random.default_rng(0).uniform(
    0, 1, (1, H, W, 3)).astype(np.float32))
import tempfile
from pathlib import Path as P
tmp = P(tempfile.mkdtemp())
B, MICRO, CH, NCH = {args.batch}, {args.micro}, {args.chunk}, 3
imgs = jnp.tile(img01, (B, 1, 1, 1))
paths = [str(tmp / f"b{{i}}.rdeic") for i in range(B)]

def batched_run():
    model.apply_condition_compress_batch(params, imgs, paths)
    cl, gh = model.apply_condition_decompress_batch(params, paths)
    out = model.decode_batched(params, cl, gh, jax.random.PRNGKey(7),
                               steps=2, micro=MICRO)
    jax.block_until_ready(out)

batched_run()
t0 = time.time(); batched_run(); batched = (time.time()-t0)*1000/B

from concurrent.futures import ThreadPoolExecutor
chunk_imgs = jnp.tile(img01, (CH, 1, 1, 1))

def compress_stage(k):
    cpaths = [str(tmp / f"c{{k}}_{{i}}.rdeic") for i in range(CH)]
    model.apply_condition_compress_batch(params, chunk_imgs, cpaths)
    return cpaths

def decompress_stage(cpaths):
    cl, gh = model.apply_condition_decompress_batch(params, cpaths)
    jax.block_until_ready((cl, gh))
    return cl, gh

def chunked_run():
    enc_pool = ThreadPoolExecutor(max_workers=1)
    dec_pool = ThreadPoolExecutor(max_workers=1)
    enc_futs = [enc_pool.submit(compress_stage, k) for k in range(NCH)]
    dec_fut = dec_pool.submit(decompress_stage, enc_futs[0].result())
    for k in range(NCH):
        cl, gh = dec_fut.result()
        if k + 1 < NCH:
            dec_fut = dec_pool.submit(decompress_stage,
                                      enc_futs[k + 1].result())
        out = model.decode_batched(params, cl, gh,
                                   jax.random.PRNGKey(40 + k),
                                   steps=2, micro=MICRO)
    jax.block_until_ready(out)
    enc_pool.shutdown(); dec_pool.shutdown()

chunked_run()
t0 = time.time(); chunked_run(); chunked = (time.time()-t0)*1000/(CH*NCH)
# container size (rate accounting)
sz = sum(P(p).stat().st_size for p in paths) / B
print(json.dumps({{"batched_ms": round(batched, 1),
                   "pipelined3_ms": round(chunked, 1),
                   "container_bytes": round(sz, 1)}}))
"""
    t0 = time.time()
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=1800)
    if proc.returncode != 0:
        return {"error": proc.stderr[-400:], "wall_s": time.time() - t0}
    row = json.loads(proc.stdout.strip().splitlines()[-1])
    row["wall_s"] = round(time.time() - t0, 1)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--micro", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    res = {}
    for label, shared in (("v2_shared", "1"), ("v1_lanes", "0")):
        res[label] = one_side(shared, args)
        print(label, json.dumps(res[label]), flush=True)
    if args.out:
        Path(args.out).write_text(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
