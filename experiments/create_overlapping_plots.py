"""Overlapped RD/robustness comparison plots across multiple result CSVs.

Role parity: /root/reference/experiments/create_overlapping_plots.py —
overlay metric curves from several runs (e.g. RDEIC vs JPEG2000) in one
figure per metric.
"""
from __future__ import annotations

import argparse
import csv
from collections import defaultdict
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def _curve(rows, metric):
    by_sev = defaultdict(list)
    for r in rows:
        try:
            by_sev[float(r["severity"])].append(float(r[metric]))
        except (KeyError, ValueError):
            continue
    sevs = sorted(by_sev)
    return sevs, [float(np.nanmean(by_sev[s])) for s in sevs]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", type=str, nargs="+", required=True)
    ap.add_argument("--labels", type=str, nargs="+", default=None)
    ap.add_argument("--metrics", type=str, nargs="+",
                    default=["psnr", "ms_ssim", "lpips"])
    ap.add_argument("--output", type=str, default="./overlapping_plots")
    args = ap.parse_args()
    labels = args.labels or [Path(p).stem for p in args.results]
    out = Path(args.output)
    out.mkdir(parents=True, exist_ok=True)

    datasets = []
    for p in args.results:
        with open(p) as f:
            datasets.append(list(csv.DictReader(f)))

    for m in args.metrics:
        fig, ax = plt.subplots(figsize=(6, 4))
        for rows, label in zip(datasets, labels):
            sevs, ys = _curve(rows, m)
            if sevs:
                ax.plot(sevs, ys, marker="o", label=label)
        ax.set_xlabel("severity / error rate")
        ax.set_ylabel(m)
        ax.set_xscale("symlog", linthresh=1e-4)
        ax.grid(True, alpha=0.3)
        ax.legend()
        fig.tight_layout()
        fig.savefig(out / f"overlap_{m}.png", dpi=140)
        print(f"wrote {out}/overlap_{m}.png")


if __name__ == "__main__":
    main()
