"""Reference-vs-reconstruction metric tool.

Role parity: /root/reference/image_checker.py — compare a folder of
reconstructions against a folder of references (PSNR/MSE/MAE/LPIPS), write a
CSV and optional difference images.
"""
from __future__ import annotations

import argparse
import csv
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from PIL import Image

from rdeic_tpu.data.dataset import list_image_files
from rdeic_tpu.utils.metrics import MetricSuite


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref_dir", type=str, required=True)
    ap.add_argument("--recon_dir", type=str, required=True)
    ap.add_argument("--output", type=str, default="./image_check")
    ap.add_argument("--save_diff", action="store_true")
    args = ap.parse_args()

    suite = MetricSuite()
    fns = {n: suite.create_metric(n) for n in ("psnr", "mse", "mae", "lpips")}

    refs = {Path(f).stem: f for f in list_image_files(args.ref_dir)}
    recons = {Path(f).stem: f for f in list_image_files(args.recon_dir)}
    common = sorted(set(refs) & set(recons))
    if not common:
        raise SystemExit("no matching image stems between the two folders")

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    for name in common:
        a = np.array(Image.open(refs[name]).convert("RGB"))
        b = np.array(Image.open(recons[name]).convert("RGB"))
        if a.shape != b.shape:
            b = np.array(
                Image.fromarray(b).resize((a.shape[1], a.shape[0]), Image.LANCZOS)
            )
        aj = jnp.asarray(a, jnp.float32)[None] / 255.0
        bj = jnp.asarray(b, jnp.float32)[None] / 255.0
        row = {"name": name}
        for n, fn in fns.items():
            row[n] = float(fn(aj, bj)[0])
        rows.append(row)
        print(row)
        if args.save_diff:
            diff = np.abs(a.astype(np.int16) - b.astype(np.int16)).astype(np.uint8)
            Image.fromarray(diff).save(out_dir / f"{name}_diff.png")

    with (out_dir / "check.csv").open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    avg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0] if k != "name"}
    print("averages:", avg)


if __name__ == "__main__":
    main()
