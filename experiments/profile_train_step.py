"""Trace one full-width training step and print the device-time breakdown.

Captures a jax.profiler trace of a single compiled train step on the
attached chip, parses the xplane with jax.profiler.ProfileData, and
aggregates TPU-plane event durations by op category — the evidence for
where the non-MFU time goes (role parity: the reference's bottleneck
hunting is nvidia-smi/torch.profiler anecdotes; SURVEY.md §5.1).

Usage: python experiments/profile_train_step.py [--batch 8] [--no_remat]
"""
from __future__ import annotations

import argparse
import collections
import re
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


CATEGORIES = [
    ("flash attention (pallas)", re.compile(r"flash|custom-call")),
    ("convolution", re.compile(r"convolution|conv")),
    ("matmul (dot)", re.compile(r"dot|einsum")),
    ("fusion (elementwise/norm)", re.compile(r"fusion|loop_")),
    ("copy / transpose / reshape", re.compile(r"copy|transpose|bitcast|reshape")),
    ("all-reduce / collective", re.compile(r"all-reduce|collective|psum")),
]


def categorize(name: str) -> str:
    low = name.lower()
    for label, pat in CATEGORIES:
        if pat.search(low):
            return label
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--no_remat", action="store_true")
    ap.add_argument("--remat_policy", type=str, default=None,
                    choices=["dots"])
    ap.add_argument("--frozen_bf16", action="store_true",
                    help="bf16 frozen-weight storage (the shipped recipe)")
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--time_only", action="store_true",
                    help="skip the xplane trace (the tunnel profiler can "
                    "RESOURCE_EXHAUSTED the chip); just time steps")
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    from rdeic_tpu.registry import instantiate_from_config, load_yaml
    from rdeic_tpu.train.trainer import Trainer
    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    cfg = load_yaml("configs/model/rdeic.yaml")
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

    from bench import _fast_random_params

    log("materializing params...")
    params = _fast_random_params(model, (args.size, args.size))
    trainer = Trainer(
        model, frozen_dtype=jnp.bfloat16 if args.frozen_bf16 else None
    )
    state = trainer.init_state(params, jax.random.PRNGKey(0))
    batch = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0)
            .uniform(-1, 1, (args.batch, args.size, args.size, 3))
            .astype(np.float32)
        )
    )
    log("compile + warm step...")
    state, _ = trainer.step(state, batch)
    jax.block_until_ready(state.train_params)

    if args.time_only:
        times = []
        for _ in range(args.steps):
            t0 = time.time()
            state, logs = trainer.step(state, batch)
            # block_until_ready alone is not a reliable sync over the axon
            # tunnel (observed returning in ~20 ms for a ~400 ms step);
            # pulling a scalar output is
            float(logs["loss"])
            times.append((time.time() - t0) * 1000)
        best = min(times)
        print(f"step times ms: {[f'{t:.1f}' for t in times]}")
        print(f"best {best:.1f} ms -> {args.batch / best * 1000:.2f} images/s")
        return

    tdir = tempfile.mkdtemp(prefix="rdeic_prof_")
    t0 = time.time()
    with jax.profiler.trace(tdir):
        state, _ = trainer.step(state, batch)
        jax.block_until_ready(state.train_params)
    wall_ms = (time.time() - t0) * 1000
    log(f"traced step: {wall_ms:.0f} ms wall; parsing {tdir}")

    pb = next(Path(tdir).rglob("*.xplane.pb"))
    data = jax.profiler.ProfileData.from_serialized_xspace(
        pb.read_bytes()
    )
    per_op: collections.Counter = collections.Counter()
    per_cat: collections.Counter = collections.Counter()
    device_total_ns = 0
    for plane in data.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        # the xplane nests events (module > op); summing every line would
        # double count — prefer the leaf "XLA Ops" line when present
        lines = list(plane.lines)
        op_lines = [ln for ln in lines if "XLA Ops" in (ln.name or "")]
        for line in op_lines or lines:
            for ev in line.events:
                dur = ev.duration_ns
                name = ev.name
                per_op[name] += dur
                per_cat[categorize(name)] += dur
                device_total_ns += dur
    if device_total_ns == 0:
        log("no device-plane events found; planes:")
        for plane in data.planes:
            log(f"  {plane.name}")
        return

    print(f"\ndevice busy time: {device_total_ns/1e6:.1f} ms "
          f"(step wall {wall_ms:.0f} ms)")
    print("\n== by category ==")
    for cat, ns in per_cat.most_common():
        print(f"  {cat:34s} {ns/1e6:9.2f} ms  {100*ns/device_total_ns:5.1f}%")
    print(f"\n== top {args.top} ops ==")
    for name, ns in per_op.most_common(args.top):
        print(f"  {ns/1e6:9.2f} ms  {100*ns/device_total_ns:5.1f}%  {name[:90]}")


if __name__ == "__main__":
    main()
