"""Benchmark: Kodak-size (768x512) encode+decode ms/image on the local chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The pipeline measured is the full inference.py path: VAE feature encode ->
real rANS bitstream -> decompress -> 2-step relay sampling -> VAE decode.
Weights are random (throughput does not depend on weight values).

BASELINE.md publishes no wall-clock numbers for the reference
(SURVEY.md §6: only an OOD-finetune anecdote), so vs_baseline is null until
a measured A100/torch number exists.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fast_random_params(model, image_hw, scale: float = 1.0):
    """Params with the right tree/shapes but cheap per-leaf random values.

    Avoids compiling the monolithic init program (slow over the TPU tunnel);
    throughput does not depend on trained weight values. Fills are
    variance-preserving (fan-in scaled, norm scales = 1, biases = 0) so
    activations stay O(1) through the full-width 60+-layer stacks — a flat
    per-leaf scale explodes exponentially once fan-in is large (0.02 *
    sqrt(9*1280) > 2 gain per conv) and NaNs the training loss.
    """
    template = jax.eval_shape(
        lambda r: model.init_params(r, image_hw=image_hw), jax.random.PRNGKey(0)
    )
    rng = np.random.default_rng(0)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for path, leaf in flat:
        name = ""
        for p in reversed(path):
            name = str(getattr(p, "key", getattr(p, "name", p)))
            break
        if name == "scale":  # GroupNorm / LayerNorm gain
            arr = np.ones(leaf.shape, leaf.dtype)
        elif name == "bias" or name == "vq_embed_prob":
            # vq_embed_prob is a usage EMA (must be >= 0: a negative fill
            # makes the CVQ dead-code alpha = exp(+large) = inf)
            arr = np.zeros(leaf.shape, leaf.dtype)
        elif leaf.ndim >= 2:  # conv/dense kernels, embeddings: LeCun normal
            fan_in = int(np.prod(leaf.shape[:-1]))
            std = scale / np.sqrt(max(fan_in, 1))
            arr = (rng.standard_normal(leaf.shape) * std).astype(leaf.dtype)
        else:
            arr = (rng.standard_normal(leaf.shape) * 0.02).astype(leaf.dtype)
        out.append(jax.device_put(jnp.asarray(arr)))
    return jax.tree_util.tree_unflatten(
        treedef, out
    )


def main():
    # persistent XLA compile cache: repeat bench runs skip the warmup compiles
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/rdeic_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    platform = jax.devices()[0].platform
    log(f"devices: {jax.devices()} (platform={platform})")

    from rdeic_tpu.registry import instantiate_from_config, load_yaml

    if platform == "cpu":
        # CPU smoke fallback: micro model so the bench always completes
        sys.path.insert(0, "tests")
        from helpers import micro_rdeic  # noqa: PLC0415

        model = micro_rdeic()
        H = W = 32
        metric = "cpu_smoke_32x32_encdec_ms_per_image"
        params = model.init_params(jax.random.PRNGKey(0), image_hw=(H, W))
    else:
        model = instantiate_from_config(load_yaml("configs/model/rdeic.yaml"))
        import os as _os

        if _os.environ.get("RDEIC_BENCH_FP32") != "1":
            model.set_compute_dtype(jnp.bfloat16)
            log("denoiser compute dtype: bfloat16")
        H, W = 512, 768
        metric = "kodak_768x512_encdec_ms_per_image"
        log("materializing full-size params (eval_shape + per-leaf fill)...")
        params = _fast_random_params(model, (H, W))

    img01 = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    )

    import tempfile
    from pathlib import Path

    tmp = Path(tempfile.mkdtemp())
    stream = str(tmp / "bench.rdeic")

    def once(rng):
        bpp = model.apply_condition_compress(params, img01, stream, H, W)
        c_latent, guide_hint = model.apply_condition_decompress(params, stream)
        fn = model.jitted_decode(steps=2)
        out = fn(params, c_latent, guide_hint, rng)
        jax.block_until_ready(out)
        return bpp, out

    log("warmup (compiles)...")
    t0 = time.time()
    bpp, _ = once(jax.random.PRNGKey(1))
    log(f"warmup done in {time.time()-t0:.1f}s, bpp={bpp:.4f}")

    # single-image latency
    lat = []
    for i in range(2 if platform == "cpu" else 3):
        t0 = time.time()
        once(jax.random.PRNGKey(2 + i))
        lat.append((time.time() - t0) * 1000)
    log(f"single-image latency ms: {['%.0f' % t for t in lat]}")

    # pipelined throughput: overlap host entropy coding / tunnel syncs of one
    # image with device compute of another (the serving configuration)
    from concurrent.futures import ThreadPoolExecutor

    def one_image(i):
        s = str(tmp / f"bench_{i}.rdeic")
        model.apply_condition_compress(params, img01, s, H, W)
        cl, gh = model.apply_condition_decompress(params, s)
        fn = model.jitted_decode(steps=2)
        out = fn(params, cl, gh, jax.random.PRNGKey(100 + i))
        jax.block_until_ready(out)

    n_imgs = 2 if platform == "cpu" else 8
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=3) as ex:
        list(ex.map(one_image, range(n_imgs)))
    pipelined = (time.time() - t0) * 1000 / n_imgs
    log(f"pipelined ms/image over {n_imgs} images: {pipelined:.0f}")

    # batched path: B images per entropy-program execution (Kodak-style
    # batch); per-image bitstreams stay independent
    import os as _os2

    # B=24 is the measured sweet spot on one v5e (B=32 OOMs the decode
    # scan by 25 MB; B=16 leaves dispatch amortization on the table)
    B = 2 if platform == "cpu" else int(_os2.environ.get("RDEIC_BENCH_BATCH", "24"))
    imgs = jnp.tile(img01, (B, 1, 1, 1))
    paths = [str(tmp / f"b{i}.rdeic") for i in range(B)]
    fn_b = model.jitted_decode(steps=2)

    def batched_run():
        model.apply_condition_compress_batch(params, imgs, paths)
        cl, gh = model.apply_condition_decompress_batch(params, paths)
        out = fn_b(params, cl, gh, jax.random.PRNGKey(7))
        jax.block_until_ready(out)

    batched_run()  # warm batched shapes
    t0 = time.time()
    batched_run()
    batched = (time.time() - t0) * 1000 / B
    log(f"batched ms/image (B={B}): {batched:.0f}")

    # chunked-pipelined serving path: the codec of chunk k+1 (host rANS +
    # small entropy-pass programs) runs on a worker thread while chunk k's
    # decode scan (pure device compute) executes — same overlap structure as
    # inference_partition.py. Steady-state cost/chunk ~= max(codec, scan)
    # instead of their sum.
    CH = 2 if platform == "cpu" else int(_os2.environ.get("RDEIC_BENCH_CHUNK", "8"))
    NCH = 1 if platform == "cpu" else int(_os2.environ.get("RDEIC_BENCH_NCHUNKS", "4"))
    chunk_imgs = jnp.tile(img01, (CH, 1, 1, 1))
    fn_c = model.jitted_decode(steps=2)

    def codec_stage(k):
        cpaths = [str(tmp / f"c{k}_{i}.rdeic") for i in range(CH)]
        model.apply_condition_compress_batch(params, chunk_imgs, cpaths)
        return model.apply_condition_decompress_batch(params, cpaths)

    def chunked_run():
        pool = ThreadPoolExecutor(max_workers=1)
        fut = pool.submit(codec_stage, 0)
        for k in range(NCH):
            cl, gh = fut.result()
            if k + 1 < NCH:
                fut = pool.submit(codec_stage, k + 1)
            out = fn_c(params, cl, gh, jax.random.PRNGKey(40 + k))
        jax.block_until_ready(out)
        pool.shutdown()

    chunked_run()  # warm chunk shapes
    t0 = time.time()
    chunked_run()
    chunked = (time.time() - t0) * 1000 / (CH * NCH)
    log(f"chunked-pipelined ms/image (chunk={CH} x {NCH}): {chunked:.0f}")
    value = float(min(np.median(lat), pipelined, batched, chunked))

    # MFU of the 2-step relay decode scan (XLA flop count vs v5e bf16 peak)
    try:
        cl, gh = model.apply_condition_decompress_batch(params, paths)
        compiled = fn_b.lower(params, cl, gh, jax.random.PRNGKey(7)).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            t0 = time.time()
            jax.block_until_ready(fn_b(params, cl, gh, jax.random.PRNGKey(8)))
            dt = time.time() - t0
            log(
                f"decode scan: {flops/1e12:.2f} TFLOP, {dt*1000:.0f} ms, "
                f"MFU {100*flops/dt/197e12:.1f}% of v5e bf16 peak"
            )
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 2),
                "unit": "ms/image",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
