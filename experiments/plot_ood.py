"""OOD evaluation plots: per-domain metric bars and radar chart.

Role parity: /root/reference/experiments/plot_ood.py (bars/radar/violin over
OOD domains).
"""
from __future__ import annotations

import argparse
import csv
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", type=str, nargs="+", required=True,
                    help="one or more ood_metrics.csv files")
    ap.add_argument("--output", type=str, default="./ood_plots")
    args = ap.parse_args()
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)

    domains = {}
    for path in args.results:
        with open(path) as f:
            rows = list(csv.DictReader(f))
        if not rows:
            continue
        name = rows[0].get("domain") or Path(path).parent.name
        domains[name] = {
            m: float(np.nanmean([float(r[m]) for r in rows]))
            for m in ("bpp", "psnr", "ms_ssim", "lpips")
        }

    metrics = ["bpp", "psnr", "ms_ssim", "lpips"]
    fig, axes = plt.subplots(1, len(metrics), figsize=(4 * len(metrics), 3.5))
    names = list(domains)
    for ax, m in zip(axes, metrics):
        ax.bar(names, [domains[n][m] for n in names])
        ax.set_title(m)
        ax.tick_params(axis="x", rotation=30)
    fig.tight_layout()
    fig.savefig(out / "ood_bars.png", dpi=140)

    # radar over normalized metrics
    fig = plt.figure(figsize=(5, 5))
    ax = fig.add_subplot(111, polar=True)
    angles = np.linspace(0, 2 * np.pi, len(metrics), endpoint=False).tolist()
    angles += angles[:1]
    for n in names:
        vals = []
        for m in metrics:
            col = [domains[d][m] for d in names]
            lo, hi = min(col), max(col)
            v = 0.5 if hi == lo else (domains[n][m] - lo) / (hi - lo)
            if m == "lpips" or m == "bpp":  # lower is better
                v = 1 - v
            vals.append(v)
        vals += vals[:1]
        ax.plot(angles, vals, label=n)
        ax.fill(angles, vals, alpha=0.1)
    ax.set_xticks(angles[:-1])
    ax.set_xticklabels(metrics)
    ax.legend(fontsize=8, loc="upper right")
    fig.savefig(out / "ood_radar.png", dpi=140)
    print(f"wrote plots to {out}")


if __name__ == "__main__":
    main()
