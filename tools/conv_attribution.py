"""Join the conv inventory with measured per-shape rates -> step-time attribution.

Inputs: tools/conv_inventory.py JSON (exact conv dispatches + FLOPs of the
post-AD train step) and tools/conv_bench.py JSON (measured TFLOP/s per
representative shape, same chip session as the train-step measurement).
Output: estimated total conv time at measured rates vs at per-shape
roofline, so the train step's MFU gap decomposes into
  (a) conv inefficiency on TPU-hostile shapes (small/odd-width),
  (b) everything-else (attention, norms+elementwise not fused into convs,
      optimizer, codec losses, dispatch gaps).

Usage:
  python tools/conv_attribution.py --inventory /tmp/conv_inventory_b8.json \
      --rates /tmp/conv_bench_r5d.json --step_ms 400
"""
from __future__ import annotations

import argparse
import json
from collections import defaultdict


def classify(lhs, rhs, out):
    """Map a conv dispatch to a conv_bench rate-class label."""
    b = lhs[0]
    # wgrad convs contract over batch/spatial (rhs is activation-shaped,
    # e.g. lhs [8,64,64,256] x rhs [8,64,64,256] -> [3,3,256,256]):
    # class them by the activation geometry they stream
    wgrad = len(rhs) == 4 and rhs[0] == b and rhs[1] > 7
    if wgrad:
        spatial = max(lhs[1], lhs[2])
        ch = max(lhs[3], out[-1])
    else:
        spatial = max(out[1], out[2])
        ch = max(lhs[3], out[-1])
    if spatial >= 384:
        return "vae512 128->128"
    if spatial >= 192:
        return "vae256 256->256"
    if spatial >= 96:
        return "vae128 512->512"
    if spatial >= 48:
        if ch >= 512:
            return "comp64 512->512"
        if ch >= 288:
            return "unet64 320->320"
        if ch >= 192:
            return "comp64 256->256"
        return "ctrl64 64->64"
    if spatial >= 24:
        if ch >= 576:
            return "unet32 640->640"
        if ch >= 192:
            return "comp32 256->256"
        return "ctrl32 128->128"
    if spatial >= 12:
        if ch >= 576:
            return "unet16 1280->1280"
        return "ctrl16 256->256"
    return "unet8 1280->1280"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inventory", required=True)
    ap.add_argument("--rates", required=True)
    ap.add_argument("--step_ms", type=float, default=None,
                    help="measured median step ms (same session) to "
                    "compute the non-conv residual")
    ap.add_argument("--attn", type=str, default=None,
                    help="tools/attn_bench.py JSON: measured attention "
                    "ms/step (flash + sdp), subtracted from the residual")
    ap.add_argument("--dots_tflops", type=float, default=None,
                    help="total non-attention dot_general TFLOP/step "
                    "(inventory dot total minus flash-kernel dots)")
    ap.add_argument("--dots_rate", type=float, default=145.0,
                    help="assumed TFLOP/s for projection/dense dots "
                    "(MXU-friendly shapes; conv_bench's wide-conv rate)")
    args = ap.parse_args()

    inv = json.load(open(args.inventory))
    rates = {r["label"]: r for r in json.load(open(args.rates))}

    agg = defaultdict(lambda: {"flops": 0.0, "count": 0})
    for bkt in inv["buckets"]:
        lab = classify(bkt["lhs"], bkt["rhs"], bkt["out"])
        agg[lab]["flops"] += bkt["gflops_total"] * 1e9
        agg[lab]["count"] += bkt["count"]

    total_est = total_roof = total_f = 0.0
    rows = []
    for lab, v in sorted(agg.items(), key=lambda kv: -kv[1]["flops"]):
        r = rates.get(lab)
        if r is None or "fwd_tflops" not in r:
            rows.append((lab, v["count"], v["flops"] / 1e12, None, None))
            continue
        est_ms = v["flops"] / (r["fwd_tflops"] * 1e12) * 1e3
        roof_ms = est_ms * r["fwd_eff_pct"] / 100.0
        total_est += est_ms
        total_roof += roof_ms
        total_f += v["flops"]
        rows.append((lab, v["count"], v["flops"] / 1e12, est_ms, roof_ms))

    print(f"{'class':>20} {'n':>4} {'TFLOP':>7} {'est_ms':>8} {'roof_ms':>8}")
    for lab, n, tf, est, roof in rows:
        e = f"{est:8.1f}" if est is not None else "   (n/a)"
        rm = f"{roof:8.1f}" if roof is not None else "   (n/a)"
        print(f"{lab:>20} {n:>4} {tf:>7.2f} {e} {rm}")
    print(f"{'TOTAL conv':>20} {inv['n_conv_dispatches']:>4} "
          f"{total_f/1e12:>7.2f} {total_est:>8.1f} {total_roof:>8.1f}")
    if args.step_ms:
        print(f"\nstep {args.step_ms:.1f} ms: conv ~{total_est:.0f} ms "
              f"({100*total_est/args.step_ms:.0f}%), non-conv residual "
              f"~{args.step_ms-total_est:.0f} ms "
              f"({100*(args.step_ms-total_est)/args.step_ms:.0f}%); "
              f"conv at per-shape roofline would be {total_roof:.0f} ms "
              f"(conv-shape inefficiency costs "
              f"{total_est-total_roof:.0f} ms/step)")
        residual = args.step_ms - total_est
        if args.attn:
            attn = json.load(open(args.attn))
            attn_ms = attn["attn_fwdbwd_ms_per_step"]
            residual -= attn_ms
            print(f"attention (measured, attn_bench): {attn_ms:.1f} ms")
        if args.dots_tflops:
            dots_ms = args.dots_tflops / args.dots_rate * 1e3
            residual -= dots_ms
            print(f"non-attn dots ({args.dots_tflops:.2f}T @ "
                  f"{args.dots_rate:.0f} TF/s assumed): {dots_ms:.1f} ms")
        if args.attn or args.dots_tflops:
            print(f"unattributed (elementwise/GN/optimizer/codec/gaps): "
                  f"~{residual:.0f} ms "
                  f"({100*residual/args.step_ms:.0f}%)")


if __name__ == "__main__":
    main()
