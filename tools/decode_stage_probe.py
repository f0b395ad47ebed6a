"""Where do the batched enc+dec milliseconds go? (VERDICT r3 items 2/6.)

Times each stage of the batched serving path at full width on the live
backend, and splits decompress into device+RTT vs host-rANS by re-running
the pass chain with a stubbed symbol source (shapes/dtypes identical, so
device work is unchanged; only the host entropy decode drops out).

Also sweeps the new micro-batched relay scan (rdeic.decode_batched) so the
codec batch can exceed the scan's B~24 OOM ceiling.

Usage: python tools/decode_stage_probe.py [--batch 24] [--micros 8,12,24]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def t(fn, *a, **k):
    t0 = time.time()
    out = fn(*a, **k)
    import jax

    jax.block_until_ready(out) if out is not None else None
    return (time.time() - t0) * 1000, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--micros", type=str, default="8,12,24")
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rdeic_tpu.registry import instantiate_from_config, load_yaml
    from rdeic_tpu.utils.cache import enable_compile_cache
    from rdeic_tpu.utils.fast_init import fast_random_params

    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    model = instantiate_from_config(load_yaml(str(REPO / "configs/model/rdeic.yaml")))
    model.set_compute_dtype(jnp.bfloat16)
    H, W = 512, 768
    params = fast_random_params(model, (H, W))
    params = model.cast_inference_params(params)

    B = args.batch
    img01 = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    )
    import tempfile

    tmp = Path(tempfile.mkdtemp())
    paths = [str(tmp / f"p{i}.rdeic") for i in range(B)]

    # ---- warm all shapes ----
    print("warming...", flush=True)
    model.apply_condition_compress_batch(params, img01, paths)
    cl, gh = model.apply_condition_decompress_batch(params, paths)
    fn = model.jitted_decode(steps=args.steps)
    jax.block_until_ready(fn(params, cl, gh, jax.random.PRNGKey(0)))
    micros = [int(m) for m in args.micros.split(",") if m]
    for m in micros:
        jax.block_until_ready(
            model.decode_batched(
                params, cl, gh, jax.random.PRNGKey(0), steps=args.steps, micro=m
            )
        )
    print("warm done", flush=True)

    # ---- stage timings (median of 3) ----
    def med(fn3):
        xs = []
        for _ in range(3):
            xs.append(fn3())
        return float(np.median(xs))

    feat = model._jitted_feature()
    ms_feat = med(lambda: t(lambda: feat(params, img01))[0])

    ms_comp = med(
        lambda: t(
            lambda: model.apply_condition_compress_batch(params, img01, paths)
        )[0]
    )
    ms_decomp = med(
        lambda: t(
            lambda: model.apply_condition_decompress_batch(params, paths)
        )[0]
    )

    # decompress with host rANS stubbed out: device+RTT floor
    import rdeic_tpu.entropy.coder as coder_mod

    real_decode = coder_mod.RansDecoder.decode_stream

    def stub_decode(self, indexes, table):
        return np.zeros(int(np.asarray(indexes).size), np.int32)

    coder_mod.RansDecoder.decode_stream = stub_decode
    try:
        ms_decomp_dev = med(
            lambda: t(
                lambda: model.apply_condition_decompress_batch(params, paths)
            )[0]
        )
    finally:
        coder_mod.RansDecoder.decode_stream = real_decode

    ms_scan = med(
        lambda: t(lambda: fn(params, cl, gh, jax.random.PRNGKey(1)))[0]
    )
    scan_micro = {}
    for m in micros:
        scan_micro[m] = med(
            lambda m=m: t(
                lambda: model.decode_batched(
                    params, cl, gh, jax.random.PRNGKey(1),
                    steps=args.steps, micro=m,
                )
            )[0]
        )

    print(f"\n=== stage timings at B={B}, {H}x{W}, steps={args.steps} ===")
    print(f"feature encode (VAE enc):   {ms_feat:8.1f} ms  {ms_feat/B:6.1f} /img")
    print(f"compress_batch total:       {ms_comp:8.1f} ms  {ms_comp/B:6.1f} /img")
    print(f"decompress_batch total:     {ms_decomp:8.1f} ms  {ms_decomp/B:6.1f} /img")
    print(f"  device+RTT (stub rANS):   {ms_decomp_dev:8.1f} ms  {ms_decomp_dev/B:6.1f} /img")
    print(f"  host rANS share:          {ms_decomp-ms_decomp_dev:8.1f} ms  {(ms_decomp-ms_decomp_dev)/B:6.1f} /img")
    print(f"decode scan (full B):       {ms_scan:8.1f} ms  {ms_scan/B:6.1f} /img")
    for m, v in scan_micro.items():
        print(f"decode scan (micro={m:3d}):   {v:8.1f} ms  {v/B:6.1f} /img")
    tot = ms_comp + ms_decomp + ms_scan
    print(f"sequential total:           {tot:8.1f} ms  {tot/B:6.1f} /img")


if __name__ == "__main__":
    main()
