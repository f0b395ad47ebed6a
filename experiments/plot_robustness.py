"""Robustness plots: degradation curves, failure-rate heatmaps, thresholds.

Role parity: /root/reference/experiments/plot_robustness.py — metric-vs-
severity curves per corruption mode, decode-failure rates, and failure
thresholds (PSNR 25 / SSIM .85 / MS-SSIM .9 / LPIPS .3).
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

THRESHOLDS = {"psnr": (25.0, ">="), "ms_ssim": (0.9, ">="), "lpips": (0.3, "<=")}


def load_rows(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", type=str, required=True,
                    help="robustness_results.csv from run_robustness.py")
    ap.add_argument("--output", type=str, default=None)
    args = ap.parse_args()
    rows = load_rows(args.results)
    out_dir = Path(args.output or Path(args.results).parent)
    out_dir.mkdir(parents=True, exist_ok=True)

    groups = defaultdict(list)
    for r in rows:
        groups[(r["target"], r["mode"])].append(r)

    metrics = ["psnr", "ms_ssim", "lpips"]
    fig, axes = plt.subplots(1, len(metrics) + 1, figsize=(5 * (len(metrics) + 1), 4))
    for (target, mode), rs in sorted(groups.items()):
        sev_groups = defaultdict(list)
        for r in rs:
            sev_groups[float(r["severity"])].append(r)
        sevs = sorted(sev_groups)
        label = f"{target}:{mode}"
        for ax, m in zip(axes, metrics):
            ys = [
                np.nanmean([float(r[m] or "nan") for r in sev_groups[s]])
                for s in sevs
            ]
            ax.plot(sevs, ys, marker="o", label=label)
            ax.set_xlabel("severity")
            ax.set_ylabel(m)
            ax.set_xscale("symlog", linthresh=1e-4)
        fails = [
            np.mean([r["decode_failed"] == "True" for r in sev_groups[s]])
            for s in sevs
        ]
        axes[-1].plot(sevs, fails, marker="s", label=label)
    axes[-1].set_xlabel("severity")
    axes[-1].set_ylabel("decode failure rate")
    axes[-1].set_xscale("symlog", linthresh=1e-4)
    for ax in axes:
        ax.grid(True, alpha=0.3)
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_dir / "robustness_curves.png", dpi=140)
    print(f"wrote {out_dir/'robustness_curves.png'}")

    # heatmaps: (target:mode) x severity grid per metric (+ failure rate) —
    # parity with the reference's heatmap variants (plot_robustness.py)
    mode_keys = sorted(groups)
    all_sevs = sorted({float(r["severity"]) for r in rows})
    for m in metrics + ["decode_failed"]:
        grid = np.full((len(mode_keys), len(all_sevs)), np.nan)
        for i, key in enumerate(mode_keys):
            sev_groups = defaultdict(list)
            for r in groups[key]:
                sev_groups[float(r["severity"])].append(r)
            for j, s in enumerate(all_sevs):
                if s not in sev_groups:
                    continue
                if m == "decode_failed":
                    grid[i, j] = np.mean(
                        [r["decode_failed"] == "True" for r in sev_groups[s]]
                    )
                else:
                    grid[i, j] = np.nanmean(
                        [float(r[m] or "nan") for r in sev_groups[s]]
                    )
        hfig, hax = plt.subplots(
            figsize=(1.2 * len(all_sevs) + 3, 0.6 * len(mode_keys) + 2)
        )
        cmap = "viridis" if m != "lpips" else "viridis_r"
        im = hax.imshow(grid, aspect="auto", cmap=cmap)
        hax.set_xticks(range(len(all_sevs)))
        hax.set_xticklabels([f"{s:g}" for s in all_sevs], fontsize=7)
        hax.set_yticks(range(len(mode_keys)))
        hax.set_yticklabels([f"{t}:{md}" for t, md in mode_keys], fontsize=7)
        hax.set_xlabel("severity")
        hax.set_title(m)
        for i in range(len(mode_keys)):
            for j in range(len(all_sevs)):
                if np.isfinite(grid[i, j]):
                    hax.text(j, i, f"{grid[i, j]:.2f}", ha="center",
                             va="center", fontsize=6, color="white")
        hfig.colorbar(im, ax=hax)
        hfig.tight_layout()
        hfig.savefig(out_dir / f"robustness_heatmap_{m}.png", dpi=140)
        plt.close(hfig)
        print(f"wrote {out_dir}/robustness_heatmap_{m}.png")

    # failure thresholds: largest severity still meeting each quality bar
    lines = []
    for (target, mode), rs in sorted(groups.items()):
        sev_groups = defaultdict(list)
        for r in rs:
            sev_groups[float(r["severity"])].append(r)
        for m, (bar, op) in THRESHOLDS.items():
            ok = []
            for s in sorted(sev_groups):
                v = np.nanmean([float(r[m] or "nan") for r in sev_groups[s]])
                passes = (v >= bar) if op == ">=" else (v <= bar)
                if passes:
                    ok.append(s)
            thr = max(ok) if ok else None
            lines.append(f"{target}:{mode} {m} {op} {bar}: "
                         f"max severity = {thr}")
    (out_dir / "failure_thresholds.txt").write_text("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
