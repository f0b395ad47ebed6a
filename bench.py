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


from rdeic_tpu.utils.fast_init import fast_random_params as _fast_random_params  # noqa: E402


def _probe_backend(timeout_s: int | None = None, retries: int | None = None) -> bool:
    """True if the default backend (e.g. the remote-TPU tunnel) comes up.

    Probed in a SUBPROCESS: when the tunnel endpoint is dead,
    jax.devices() blocks forever in-process and the whole bench hangs
    with no output. The tunnel flaps, so the probe retries for ~10 min
    total (RDEIC_BENCH_PROBE_S x RDEIC_BENCH_PROBE_RETRIES) before the
    parent falls back to CPU so a result line is always produced.
    """
    import os
    import subprocess

    if os.environ.get("RDEIC_BENCH_SKIP_PROBE") == "1":
        return True
    if os.environ.get("RDEIC_BENCH_FORCE_CPU") == "1":
        return False
    if timeout_s is None:
        timeout_s = int(os.environ.get("RDEIC_BENCH_PROBE_S", "150"))
    if retries is None:
        retries = int(os.environ.get("RDEIC_BENCH_PROBE_RETRIES", "4"))
    for attempt in range(1, retries + 1):
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d=jax.devices(); import sys; sys.exit(0)"],
                capture_output=True, timeout=timeout_s,
            )
            if proc.returncode == 0:
                return True
            log(f"backend probe attempt {attempt}/{retries}: "
                f"rc={proc.returncode}")
        except subprocess.TimeoutExpired:
            log(f"backend probe attempt {attempt}/{retries}: timed out "
                f"after {timeout_s}s")
    return False


def main():
    # persistent XLA compile cache: repeat bench runs skip the warmup
    # compiles (repo-local default so it survives /tmp cleanup)
    import os as _os0

    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    # serving default: 128-lane interleaved streams decoded on device
    # (entropy/device_rans.py) — decompress becomes pure async device
    # dataflow. Costs ~0.5 KB/stream of rate; RDEIC_RANS_LANES=0 reverts
    # to the host-interactive legacy format.
    _os0.environ.setdefault("RDEIC_RANS_LANES", "128")
    fell_back = False
    if not _probe_backend():
        log("backend probe failed (TPU tunnel down?) -> CPU fallback")
        fell_back = True
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    platform = jax.devices()[0].platform
    # a CPU number must never be mistaken for a TPU result when parsing
    # BENCH_r*.json (round-3 verdict weak #2)
    backend_stamp = "cpu-fallback" if fell_back else platform
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
        if _os.environ.get("RDEIC_BENCH_FP32") != "1":
            # bf16 weight storage halves the diffusion/VAE HBM footprint
            # (5.2 -> 2.2 GB), lifting the decode-scan batch ceiling
            params = model.cast_inference_params(params)
            log("inference params stored bf16 (vae/denoiser)")

    img01 = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    )

    import tempfile
    from pathlib import Path

    tmp = Path(tempfile.mkdtemp())
    stream = str(tmp / "bench.rdeic")

    # --- always emit a result line, even if the harness times us out ---
    # The driver gives the bench a finite wall clock; a cold compile cache
    # through the tunnel can eat most of it (746 s observed). Stages feed
    # `stage_ms` as they finish; the budget gates later stages, and a
    # SIGTERM/SIGINT from an outer `timeout` prints the best-so-far value
    # instead of dying with no output.
    import os as _osb
    import signal

    budget_s = float(_osb.environ.get("RDEIC_BENCH_BUDGET_S", "2100"))
    t_start = time.time()
    stage_ms: list[float] = []
    # secondary measurements (single-image latency, per-stage numbers,
    # decode-scan MFU) ride along in the same JSON line so driver captures
    # stop losing them to stderr-only prose (round-4 verdict #4)
    extras: dict[str, float] = {}
    import threading as _thr

    _emitted = {"done": False}
    _emit_lock = _thr.Lock()

    def emit(interrupted: bool = False):
        # lock: the watchdog thread may race the main thread here; exactly
        # one JSON line must ever be printed
        with _emit_lock:
            if _emitted["done"]:
                return
            _emitted["done"] = True
            # value stays null (never a -1 sentinel) when no stage finished,
            # so parsers cannot ingest a fake negative latency (advisor r4)
            value = round(float(min(stage_ms)), 2) if stage_ms else None
            row = {
                "metric": metric,
                "value": value,
                "unit": "ms/image",
                "vs_baseline": None,
                "backend": backend_stamp,
                **{k: round(v, 2) for k, v in extras.items()},
            }
            if interrupted or not stage_ms:
                row["partial"] = True
            if interrupted:
                row["interrupted"] = True
            print(json.dumps(row), flush=True)

    def _on_term(sig, frm):
        log(f"signal {sig}: emitting best-so-far result and exiting")
        emit(interrupted=True)
        # nonzero exit: a truncated run must be distinguishable from a
        # clean one for shell scripting (advisor round 4)
        _osb._exit(128 + int(sig))

    for _sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(_sig, _on_term)
        except Exception:
            pass

    # Hard watchdog: the budget checks below only run BETWEEN stages. If the
    # tunnel wedges mid-stage (observed: a bench process blocked >9 h inside
    # a device call after the probe passed), no budget check ever fires and
    # the driver gets no output. A daemon thread force-emits the best-so-far
    # line and exits once the budget (plus grace for the in-flight emit) is
    # exhausted, no matter where the main thread is stuck.
    def _watchdog():
        deadline = t_start + budget_s + 120.0
        while True:
            left = deadline - time.time()
            if left <= 0:
                break
            time.sleep(min(left, 30.0))
        if not _emitted["done"]:
            log(f"watchdog: budget {budget_s:.0f}s (+120s grace) exhausted "
                "mid-stage — emitting best-so-far and exiting")
            emit(interrupted=True)
            _osb._exit(3)

    # RDEIC_BENCH_WATCHDOG=0 disables it for in-process (runpy/pytest)
    # runs, where _exit would take the host process down with it
    if _osb.environ.get("RDEIC_BENCH_WATCHDOG", "1") != "0":
        _thr.Thread(target=_watchdog, daemon=True).start()

    def remaining() -> float:
        return budget_s - (time.time() - t_start)

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
    stage_ms.append(float(np.median(lat)))
    extras["single_image_ms"] = float(np.median(lat))

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
    stage_ms.append(float(pipelined))
    extras["pipelined_ms"] = float(pipelined)

    if remaining() < 300:
        log(f"budget low ({remaining():.0f}s left): skipping batched/"
            "chunked stages")
        emit()
        return

    # batched path: B images per entropy-program execution (Kodak-style
    # batch); per-image bitstreams stay independent
    import os as _os2

    # B=32 codec batch + micro=16 relay-scan chunks is the measured best
    # serving config on one v5e (BENCHLOG round 4: beats the monolithic
    # B=24 scan in every session). RDEIC_BENCH_MICRO>0 chunks the relay
    # scan (decode_batched) so the CODEC batch can exceed the scan
    # ceiling — entropy-program dispatch amortizes over the full batch
    # while scan memory stays at the micro size.
    B = 2 if platform == "cpu" else int(_os2.environ.get("RDEIC_BENCH_BATCH", "32"))
    MICRO = int(_os2.environ.get("RDEIC_BENCH_MICRO", "16" if platform != "cpu" else "0")) or None
    imgs = jnp.tile(img01, (B, 1, 1, 1))
    paths = [str(tmp / f"b{i}.rdeic") for i in range(B)]
    fn_b = model.jitted_decode(steps=2)

    def batched_run():
        model.apply_condition_compress_batch(params, imgs, paths)
        cl, gh = model.apply_condition_decompress_batch(params, paths)
        out = model.decode_batched(
            params, cl, gh, jax.random.PRNGKey(7), steps=2, micro=MICRO
        )
        jax.block_until_ready(out)

    batched_run()  # warm batched shapes
    t0 = time.time()
    batched_run()
    batched = (time.time() - t0) * 1000 / B
    log(f"batched ms/image (B={B}): {batched:.0f}")
    stage_ms.append(float(batched))
    extras["batched_ms"] = float(batched)

    if remaining() < 240:
        log(f"budget low ({remaining():.0f}s left): skipping chunked stage")
        emit()
        return

    # 3-stage pipelined serving path: compress (chunk k+2), decompress
    # (chunk k+1), and the decode scan (chunk k) overlap on separate
    # threads — the serving configuration for a stream of images.
    # Steady-state cost/chunk ~= max(compress, decompress, scan) instead of
    # their sum (measured ~71/79/57 ms/img at chunk=24 on one v5e).
    CH = 2 if platform == "cpu" else int(_os2.environ.get("RDEIC_BENCH_CHUNK", "32"))
    NCH = 1 if platform == "cpu" else int(_os2.environ.get("RDEIC_BENCH_NCHUNKS", "3"))
    chunk_imgs = jnp.tile(img01, (CH, 1, 1, 1))

    def compress_stage(k):
        cpaths = [str(tmp / f"c{k}_{i}.rdeic") for i in range(CH)]
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
                dec_fut = dec_pool.submit(
                    decompress_stage, enc_futs[k + 1].result()
                )
            out = model.decode_batched(
                params, cl, gh, jax.random.PRNGKey(40 + k), steps=2,
                micro=MICRO,
            )
        jax.block_until_ready(out)
        enc_pool.shutdown()
        dec_pool.shutdown()

    chunked_run()  # warm chunk shapes
    t0 = time.time()
    chunked_run()
    chunked = (time.time() - t0) * 1000 / (CH * NCH)
    log(f"pipelined-3stage ms/image (chunk={CH} x {NCH}): {chunked:.0f}")
    stage_ms.append(float(chunked))
    extras["pipelined3_ms"] = float(chunked)

    # MFU of the 2-step relay decode scan (XLA flop count vs v5e bf16
    # peak), measured at the scan batch the serving path actually runs
    # (the micro chunk when RDEIC_BENCH_MICRO is set)
    if remaining() < 90:
        log(f"budget low ({remaining():.0f}s left): skipping MFU probe")
        emit()
        return
    try:
        cl, gh = model.apply_condition_decompress_batch(params, paths)
        sb = min(MICRO or B, B)
        cl_s, gh_s = cl[:sb], gh[:sb]
        compiled = fn_b.lower(
            params, cl_s, gh_s, jax.random.PRNGKey(7)
        ).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            t0 = time.time()
            jax.block_until_ready(
                fn_b(params, cl_s, gh_s, jax.random.PRNGKey(8))
            )
            dt = time.time() - t0
            mfu_pct = 100 * flops / dt / 197e12
            log(
                f"decode scan (B={sb}): {flops/1e12:.2f} TFLOP, "
                f"{dt*1000:.0f} ms, "
                f"MFU {mfu_pct:.1f}% of v5e bf16 peak"
            )
            if platform != "cpu":
                extras["decode_scan_mfu_pct"] = float(mfu_pct)
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")

    emit()


if __name__ == "__main__":
    main()
