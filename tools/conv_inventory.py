"""Exact conv inventory of the compiled train step, by abstract tracing.

The axon tunnel exposes no TPU xplane, so per-op attribution can't come
from a profile. This gets the ground truth a different way: trace the
REAL full-width train step (post-AD — fwd + bwd convs both appear as
`conv_general_dilated` eqns) with `jax.make_jaxpr` on ShapeDtypeStructs
(no compile, no weights, CPU-only), walk every sub-jaxpr (pjit / remat /
scan x length / cond / custom_vjp), and tally each conv's shape + exact
FLOPs. Pairing the buckets with tools/conv_bench.py's measured per-shape
TFLOP/s turns the microbench into a step-time attribution (round-4
verdict next #7): estimated conv ms vs the measured ~400 ms step.

Usage: python tools/conv_inventory.py [--batch 8 --size 512 --refine]
"""
from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # env vars don't stick here

import jax.numpy as jnp  # noqa: E402

try:
    core = jax.extend.core  # jax >= 0.4.33
except AttributeError:  # pragma: no cover
    core = jax.core


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sub_jaxprs(eqn):
    """Yield (jaxpr, multiplier) for every sub-jaxpr of an eqn."""
    name = eqn.primitive.name
    p = eqn.params
    if name == "scan":
        yield p["jaxpr"].jaxpr, int(p["length"])
        return
    if name == "while":
        # trip count unknowable statically; tally once and flag
        yield p["cond_jaxpr"].jaxpr, 1
        yield p["body_jaxpr"].jaxpr, 1
        return
    if name == "cond":
        # branches are mutually exclusive; tally each once (overcounts a
        # multi-branch cond, but RDEIC's conds carry no convs)
        for b in p["branches"]:
            yield b.jaxpr, 1
        return
    if name == "pallas_call":
        # kernel jaxpr runs once per grid step; its dots are the flash-
        # attention MXU work (ops/flash_attention.py)
        gm = p.get("grid_mapping")
        n = 1
        try:
            for g in getattr(gm, "grid", ()):
                n *= int(g)
        except (TypeError, ValueError):
            n = 1
        yield p["jaxpr"], n
        return
    for v in p.values():
        if hasattr(v, "jaxpr") and hasattr(v, "consts"):  # ClosedJaxpr
            yield v.jaxpr, 1
        elif hasattr(v, "eqns"):  # bare Jaxpr
            yield v, 1


def conv_flops(eqn):
    lhs = eqn.invars[0].aval
    rhs = eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    fg = int(eqn.params.get("feature_group_count", 1))
    k_spatial = 1
    for d in dn.rhs_spec[2:]:
        k_spatial *= rhs.shape[d]
    cin = lhs.shape[dn.lhs_spec[1]]
    # MACs = out positions x kernel taps x input channels per group
    return 2 * out.size * k_spatial * (cin // fg)


def dot_flops(eqn):
    lhs = eqn.invars[0].aval
    rhs = eqn.invars[1].aval
    (cl, cr), (bl, _br) = eqn.params["dimension_numbers"]
    k = 1
    for d in cl:
        k *= lhs.shape[d]
    b = 1
    for d in bl:
        b *= lhs.shape[d]
    m = lhs.size // (k * b)
    n = rhs.size // (k * b)
    return 2 * b * m * n * k


def walk(jaxpr, mult, tally, dots, flags):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "conv_general_dilated":
            lhs = tuple(eqn.invars[0].aval.shape)
            rhs = tuple(eqn.invars[1].aval.shape)
            out = tuple(eqn.outvars[0].aval.shape)
            dt = str(eqn.outvars[0].aval.dtype)
            key = (lhs, rhs, out, dt)
            tally[key]["count"] += mult
            tally[key]["flops"] += mult * conv_flops(eqn)
        elif eqn.primitive.name == "dot_general":
            lhs = tuple(eqn.invars[0].aval.shape)
            rhs = tuple(eqn.invars[1].aval.shape)
            key = (lhs, rhs)
            dots[key]["count"] += mult
            dots[key]["flops"] += mult * dot_flops(eqn)
        elif eqn.primitive.name == "while":
            flags.add("while-loop seen: its convs tallied x1")
        for sub, n in _sub_jaxprs(eqn):
            walk(sub, mult * n, tally, dots, flags)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--refine", action="store_true")
    ap.add_argument("--config", type=str, default="configs/model/rdeic.yaml")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--assume_tpu", action="store_true",
                    help="trace the TPU program shape: dispatch attention "
                    "to the Pallas flash kernel (as the real TPU step "
                    "does) even though this trace runs on CPU")
    args = ap.parse_args()

    if args.assume_tpu:
        import rdeic_tpu.ops.attention as _attn
        _attn.on_tpu = lambda: True

    from rdeic_tpu.registry import instantiate_from_config, load_yaml
    from rdeic_tpu.train.trainer import Trainer

    cfg = load_yaml(args.config)
    if args.refine:
        cfg["params"]["is_refine"] = True
    # mirror the shipping bench recipe: no module remat, bf16 compute +
    # frozen storage (remat would double-tally the rematerialized convs —
    # correctly! pass --remat variants by editing here if needed)
    for key in ("control_stage_config", "unet_config"):
        cfg["params"].setdefault(key, {}).setdefault("params", {})[
            "use_checkpoint"
        ] = False
    model = instantiate_from_config(cfg)
    model.set_compute_dtype(jnp.bfloat16)

    log("abstract init (eval_shape)...")
    template = jax.eval_shape(
        lambda r: model.init_params(r, image_hw=(args.size, args.size)),
        jax.random.PRNGKey(0),
    )
    trainer = Trainer(model, frozen_dtype=jnp.bfloat16)
    state_abs = jax.eval_shape(
        trainer.init_state, template, jax.random.PRNGKey(0)
    )
    img = jax.ShapeDtypeStruct(
        (args.batch, args.size, args.size, 3), jnp.float32
    )
    log("tracing the train step (make_jaxpr, no compile)...")
    step = trainer._build_step()
    jaxpr = jax.make_jaxpr(step)(state_abs, img)

    tally = defaultdict(lambda: {"count": 0, "flops": 0})
    dots = defaultdict(lambda: {"count": 0, "flops": 0})
    flags = set()
    walk(jaxpr.jaxpr, 1, tally, dots, flags)

    rows = []
    for (lhs, rhs, out, dt), v in sorted(
        tally.items(), key=lambda kv: -kv[1]["flops"]
    ):
        rows.append({
            "lhs": list(lhs), "rhs": list(rhs), "out": list(out),
            "dtype": dt, "count": v["count"],
            "gflops_total": round(v["flops"] / 1e9, 1),
        })
    dot_rows = []
    for (lhs, rhs), v in sorted(
        dots.items(), key=lambda kv: -kv[1]["flops"]
    )[:40]:
        dot_rows.append({
            "lhs": list(lhs), "rhs": list(rhs), "count": v["count"],
            "gflops_total": round(v["flops"] / 1e9, 1),
        })
    total_tf = sum(v["flops"] for v in tally.values()) / 1e12
    n_convs = sum(v["count"] for v in tally.values())
    result = {
        "phase": "refine" if args.refine else "independent",
        "batch": args.batch, "size": args.size,
        "n_conv_dispatches": n_convs,
        "conv_tflops_per_step": round(total_tf, 3),
        "n_dot_dispatches": sum(v["count"] for v in dots.values()),
        "dot_tflops_per_step": round(
            sum(v["flops"] for v in dots.values()) / 1e12, 3),
        "flags": sorted(flags),
        "buckets": rows,
        "dot_buckets_top40": dot_rows,
    }
    print(json.dumps(result, indent=1))
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
