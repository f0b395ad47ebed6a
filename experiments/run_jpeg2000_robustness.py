"""JPEG2000 robustness control arm.

Role parity: /root/reference/experiments/run_jpeg2000_robustness.py — the
same corruption protocol applied to JPEG2000 bitstreams produced by the
openjpeg CLI (opj_compress/opj_decompress subprocesses, 80-136), so the
diffusion codec's robustness can be compared against a classical codec.
Gated on the openjpeg binaries being installed; falls back to Pillow's
JPEG2000 support when available.
"""
from __future__ import annotations

import argparse
import csv
import io
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).parent.parent))

from experiments.corruptors import bit_flip_bytes, burst_flip_bytes  # noqa: E402
from rdeic_tpu.data.dataset import list_image_files  # noqa: E402
from rdeic_tpu.utils.metrics import MetricSuite  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def _have_openjpeg() -> bool:
    return shutil.which("opj_compress") is not None


def j2k_encode(arr: np.ndarray, rate: float) -> bytes:
    """Encode RGB uint8 -> JPEG2000 codestream at ~`rate` bpp."""
    if _have_openjpeg():
        with tempfile.TemporaryDirectory() as td:
            src = Path(td) / "in.png"
            dst = Path(td) / "out.j2k"
            Image.fromarray(arr).save(src)
            ratio = max(1.0, 24.0 / rate)  # 24 bpp raw RGB -> target bpp
            subprocess.run(
                ["opj_compress", "-i", str(src), "-o", str(dst),
                 "-r", f"{ratio:.2f}"],
                check=True, capture_output=True,
            )
            return dst.read_bytes()
    buf = io.BytesIO()
    ratio = max(1, int(24.0 / rate))
    Image.fromarray(arr).save(
        buf, format="JPEG2000", irreversible=True, quality_mode="rates",
        quality_layers=[ratio],
    )
    return buf.getvalue()


def j2k_decode(data: bytes) -> np.ndarray:
    if _have_openjpeg():
        with tempfile.TemporaryDirectory() as td:
            src = Path(td) / "in.j2k"
            dst = Path(td) / "out.png"
            src.write_bytes(data)
            subprocess.run(
                ["opj_decompress", "-i", str(src), "-o", str(dst)],
                check=True, capture_output=True,
            )
            return np.array(Image.open(dst).convert("RGB"))
    return np.array(Image.open(io.BytesIO(data)).convert("RGB"))


def main():
    ap = argparse.ArgumentParser()
    from rdeic_tpu.utils.backend import add_platform_arg, apply_platform

    add_platform_arg(ap)
    ap.add_argument("--input", type=str, required=True)
    ap.add_argument("--output", type=str, default="./j2k_robustness_out")
    ap.add_argument("--bpp", type=float, default=0.12)
    ap.add_argument("--num_images", type=int, default=1)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument("--error_rates", type=float, nargs="+",
                    default=[0.0, 0.0001, 0.001, 0.005, 0.01, 0.02])
    ap.add_argument("--modes", type=str, nargs="+", default=["random", "burst"])
    args = ap.parse_args()
    apply_platform(args.platform)

    suite = MetricSuite()
    fns = {n: suite.create_metric(n) for n in ("psnr", "ms_ssim", "lpips")}
    p = Path(args.input)
    files = ([str(p)] if p.is_file() else list_image_files(str(p)))[: args.num_images]
    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    rows = []

    for f in files:
        name = Path(f).stem
        arr = np.array(Image.open(f).convert("RGB"))
        H, W = arr.shape[:2]
        try:
            clean = j2k_encode(arr, args.bpp)
        except Exception as e:
            print(f"JPEG2000 encoder unavailable ({e}); aborting")
            return
        bpp = len(clean) * 8 / (H * W)
        ref = jnp.asarray(arr, jnp.float32)[None] / 255.0
        for mode in args.modes:
            flip = bit_flip_bytes if mode == "random" else burst_flip_bytes
            for rate in args.error_rates:
                for seed in args.seeds:
                    row = dict(image=name, mode=mode, severity=rate,
                               seed=seed, bpp=bpp, decode_failed=False)
                    try:
                        corrupted = flip(clean, rate, seed=seed)
                        recon = j2k_decode(corrupted)
                        if recon.shape != arr.shape:
                            raise ValueError("shape mismatch after decode")
                        b = jnp.asarray(recon, jnp.float32)[None] / 255.0
                        for n, fn in fns.items():
                            row[n] = float(fn(ref, b)[0])
                    except Exception as e:
                        row["decode_failed"] = True
                        row["error"] = f"{type(e).__name__}"[:80]
                        for n in fns:
                            row[n] = float("nan")
                    rows.append(row)
                    print(row)

    fields = sorted({k for r in rows for k in r})
    with (out_dir / "jpeg2000_robustness.csv").open("w", newline="") as fcsv:
        w = csv.DictWriter(fcsv, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_dir}/jpeg2000_robustness.csv")


if __name__ == "__main__":
    main()
