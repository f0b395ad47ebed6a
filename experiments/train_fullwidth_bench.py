"""Full-width (SD2.1-scale) training-step benchmark on real hardware.

Proves the flagship config (320-ch dual UNet, 0.2 control ratio, 16384-code
codebook — configs/model/rdeic.yaml) trains at 512x512 crops on one chip:
steps/s, grad_norm, loss curves, device memory. Optionally a refine-phase
burst (is_refine: grad through the fixed_step sampler + VAE decoder +
LPIPS), matching the reference's two-phase recipe
(/root/reference/configs/train_rdeic.yaml + model/rdeic.py:837-879).

Params are materialized by eval_shape + per-leaf numpy fills (real init
compiles stall on the 1-core host); throughput and memory do not depend on
weight values, and the entropy/rate losses still learn from random init.

Usage:
  python experiments/train_fullwidth_bench.py --steps 300 --batch 4
  python experiments/train_fullwidth_bench.py --refine --steps 20 --batch 1
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def synthetic_batches(n: int, batch: int, size: int, seed: int = 0):
    """Structured multi-octave noise batches in [-1, 1] (natural-ish
    statistics so rate/guide losses have signal to fit)."""
    from PIL import Image  # noqa: PLC0415

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        imgs = []
        for _b in range(batch):
            img = np.zeros((size, size, 3), np.float32)
            for octave in range(5):
                c = 2 ** (octave + 2)
                coarse = rng.random((c, c, 3)).astype(np.float32)
                up = np.asarray(
                    Image.fromarray((coarse * 255).astype(np.uint8)).resize(
                        (size, size), Image.BILINEAR
                    ),
                    np.float32,
                ) / 255.0
                img += up / (2**octave)
            img /= img.max()
            imgs.append(img * 2 - 1)
        out.append(np.stack(imgs))
    return out


def device_mem_stats():
    try:
        stats = jax.devices()[0].memory_stats()
        return {
            "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 2**30,
            "peak_bytes_gb": stats.get("peak_bytes_in_use", 0) / 2**30,
        }
    except Exception:
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--refine", action="store_true",
                    help="refine phase: is_refine=True, grad through the "
                         "fixed_step sampler + VAE + LPIPS")
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--out", type=str, default="indicators")
    ap.add_argument("--config", type=str, default="configs/model/rdeic.yaml")
    ap.add_argument("--no_remat", action="store_true",
                    help="disable activation checkpointing (trades HBM for "
                    "the rematerialized forward's FLOPs)")
    ap.add_argument("--remat_policy", type=str, default=None,
                    choices=["dots"],
                    help="selective remat: save matmul/conv outputs, "
                    "recompute elementwise only")
    ap.add_argument("--scan_remat", action="store_true",
                    help="refine only: checkpoint each sampler-scan step "
                    "(backward re-runs each step's UNet forward; holds one "
                    "step's activations instead of fixed_step sets)")
    ap.add_argument("--frozen_bf16", action="store_true",
                    help="store the frozen SD subtree bf16 (halves its HBM "
                    "reads per step; trainables/optimizer stay fp32)")
    args = ap.parse_args()

    from rdeic_tpu.registry import instantiate_from_config, load_yaml
    from rdeic_tpu.train.trainer import Trainer
    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    log(f"devices: {jax.devices()}")

    cfg = load_yaml(args.config)
    if args.refine:
        cfg["params"]["is_refine"] = True
    if args.scan_remat:
        cfg["params"]["scan_remat"] = True
    if args.no_remat:
        for key in ("control_stage_config", "unet_config"):
            cfg["params"].setdefault(key, {}).setdefault("params", {})[
                "use_checkpoint"
            ] = False
    if args.remat_policy:
        for key in ("control_stage_config", "unet_config"):
            cfg["params"].setdefault(key, {}).setdefault("params", {})[
                "remat_policy"
            ] = args.remat_policy
    model = instantiate_from_config(cfg)
    model.set_compute_dtype(jnp.bfloat16)

    from bench import _fast_random_params  # noqa: E402  (repo-root helper)

    log("materializing full-width params...")
    t0 = time.time()
    params = _fast_random_params(model, (args.size, args.size))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    log(f"params: {n_params/1e9:.3f}B leaves in {time.time()-t0:.1f}s")

    trainer = Trainer(
        model, accumulate_grad_batches=args.accum,
        frozen_dtype=jnp.bfloat16 if args.frozen_bf16 else None,
    )
    state = trainer.init_state(params, jax.random.PRNGKey(0))
    # init_state re-casts the frozen subtree (e.g. bf16 storage); holding
    # the fp32 originals would pin ~2 GB of dead copies in HBM at full
    # width (same fix as train.py's post-init del)
    del params
    n_train = sum(
        x.size for x in jax.tree_util.tree_leaves(state.train_params)
    )
    log(f"trainable params: {n_train/1e6:.1f}M")

    batches = synthetic_batches(4, args.batch, args.size)
    # pin on device once: re-uploading B x 512 x 512 x 3 f32 (25 MB at B=8)
    # per step costs hundreds of ms through the axon tunnel
    batches = [jax.device_put(jnp.asarray(b)) for b in batches]
    phase = "refine" if args.refine else "independent"
    out_path = Path(args.out) / f"fullwidth_{phase}_metrics.jsonl"
    out_path.parent.mkdir(parents=True, exist_ok=True)

    log(f"compiling + first step (phase={phase}, B={args.batch}, "
        f"{args.size}x{args.size})...")
    t0 = time.time()
    state, logs = trainer.step(state, batches[0])
    jax.block_until_ready(state.train_params)
    compile_s = time.time() - t0
    log(f"first step (incl. compile): {compile_s:.1f}s")
    log(f"memory after step 1: {device_mem_stats()}")

    times = []
    with out_path.open("w") as f:
        for i in range(1, args.steps):
            t0 = time.time()
            state, logs = trainer.step(state, batches[i % 4])
            jax.block_until_ready(state.train_params)
            dt = time.time() - t0
            times.append(dt)
            row = {"step": i, "time_s": round(dt, 4)}
            for k, v in logs.items():
                try:
                    row[k] = float(v)
                except (TypeError, ValueError):
                    pass
            f.write(json.dumps(row) + "\n")
            if i % 20 == 0 or i == 1:
                f.flush()
                log(f"step {i}: {dt*1000:.0f} ms  loss={row.get('loss'):.4f} "
                    f"grad_norm={row.get('grad_norm', float('nan')):.3f}")

    med = float(np.median(times))
    mfu = {}
    try:
        # XLA's own flop count for the compiled step -> MFU vs v5e bf16 peak
        compiled = trainer._step_fn.lower(
            state, batches[0]
        ).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops > 0:
            peak = 197e12  # TPU v5e bf16 peak FLOP/s
            mfu = {
                "flops_per_step_T": round(flops / 1e12, 3),
                "mfu_pct": round(100.0 * flops / med / peak, 2),
            }
    except Exception as e:  # cost analysis unsupported on some backends
        log(f"cost_analysis unavailable: {e}")
    result = {
        **mfu,
        "phase": phase,
        "batch": args.batch,
        "size": args.size,
        "steps": args.steps,
        "median_step_ms": round(med * 1000, 1),
        "steps_per_s": round(1.0 / med, 3),
        "images_per_s": round(args.batch / med, 3),
        "compile_s": round(compile_s, 1),
        "trainable_params_M": round(n_train / 1e6, 1),
        "total_params_B": round(n_params / 1e9, 3),
        **device_mem_stats(),
    }
    log(json.dumps(result))
    print(json.dumps(result))
    summary = Path(args.out) / f"fullwidth_{phase}_summary.json"
    summary.write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
