"""Robustness sweep: corruption rates x seeds over bitstream/latent faults.

Role parity: /root/reference/experiments/run_robustness.py — caches clean
encodings, sweeps error rates x seeds for bitstream (random/burst) and latent
(mask_replace/additive) corruption, records decode exceptions as
`decode_failed` rows instead of crashing (277-298), writes a per-run CSV and
a groupby summary.
"""
from __future__ import annotations

import argparse
import csv
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

sys.path.insert(0, str(Path(__file__).parent.parent))

from experiments.corruptors import Corruptor  # noqa: E402
from rdeic_tpu.data.dataset import list_image_files  # noqa: E402
from rdeic_tpu.registry import instantiate_from_config, load_yaml  # noqa: E402
from rdeic_tpu.utils.checkpoint_io import load_inference_params  # noqa: E402
from rdeic_tpu.utils.image import pad, to_float01, to_uint8  # noqa: E402
from rdeic_tpu.utils.metrics import MetricSuite  # noqa: E402


def main():
    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    ap = argparse.ArgumentParser()
    from rdeic_tpu.utils.backend import add_platform_arg, apply_platform

    add_platform_arg(ap)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--config", type=str, default="configs/model/rdeic.yaml")
    ap.add_argument("--input", type=str, required=True)
    ap.add_argument("--output", type=str, default="./robustness_out")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--num_images", type=int, default=1)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    ap.add_argument(
        "--error_rates", type=float, nargs="+",
        default=[0.0, 0.0001, 0.001, 0.005, 0.01, 0.02],
    )
    ap.add_argument(
        "--targets", type=str, nargs="+",
        default=["bitstream:random", "bitstream:burst",
                 "latent:mask_replace", "latent:additive"],
    )
    ap.add_argument("--latent_severities", type=float, nargs="+",
                    default=[0.0, 0.05, 0.1, 0.2, 0.5])
    args = ap.parse_args()
    apply_platform(args.platform)

    model = instantiate_from_config(load_yaml(args.config))
    params = load_inference_params(args.ckpt)
    suite = MetricSuite()
    fns = {n: suite.create_metric(n) for n in ("psnr", "ms_ssim", "lpips")}

    in_path = Path(args.input)
    files = ([str(in_path)] if in_path.is_file() else list_image_files(str(in_path)))
    files = files[: args.num_images]
    out_dir = Path(args.output)
    (out_dir / "streams").mkdir(parents=True, exist_ok=True)

    decode_fn = model.jitted_decode(steps=args.steps)
    rng = jax.random.PRNGKey(0)
    rows = []

    for f in files:
        name = Path(f).stem
        arr = np.array(Image.open(f).convert("RGB"))
        H, W = arr.shape[:2]
        img01 = to_float01(pad(arr, 64))[None]
        clean_stream = out_dir / "streams" / f"{name}.rdeic"
        # cache clean encodings (re-encode only once per image)
        if not clean_stream.exists():
            model.apply_condition_compress(
                params, jnp.asarray(img01), str(clean_stream),
                img01.shape[1], img01.shape[2],
            )
        bpp = clean_stream.stat().st_size * 8 / (H * W)
        ref = jnp.asarray(arr, jnp.float32)[None] / 255.0

        for target_mode in args.targets:
            target, mode = target_mode.split(":")
            severities = (
                args.error_rates if target == "bitstream"
                else args.latent_severities
            )
            for sev in severities:
                for seed in args.seeds:
                    rng, sub = jax.random.split(rng)
                    row = dict(
                        image=name, target=target, mode=mode,
                        severity=sev, seed=seed, bpp=bpp,
                        decode_failed=False,
                    )
                    try:
                        if target == "bitstream":
                            raw = clean_stream.read_bytes()
                            head, payload = raw[:12], raw[12:]
                            cor = Corruptor("bitstream", mode, sev, seed)
                            cpath = out_dir / "streams" / "_corrupt.rdeic"
                            cpath.write_bytes(head + cor.apply_bytes(payload))
                            c_latent, guide_hint = (
                                model.apply_condition_decompress(params, str(cpath))
                            )
                        else:
                            c_latent, guide_hint = (
                                model.apply_condition_decompress(
                                    params, str(clean_stream)
                                )
                            )
                            cor = Corruptor("latent", mode, sev, seed)
                            c_latent = jnp.asarray(
                                cor.apply_latent(np.asarray(c_latent))
                            )
                        out01 = decode_fn(params, c_latent, guide_hint, sub)
                        recon = to_uint8(out01[0])[:H, :W]
                        b = jnp.asarray(recon, jnp.float32)[None] / 255.0
                        for n, fn in fns.items():
                            try:
                                row[n] = float(fn(ref, b)[0])
                            except Exception:
                                row[n] = float("nan")
                    except Exception as e:
                        row["decode_failed"] = True
                        row["error"] = f"{type(e).__name__}: {e}"[:200]
                        for n in fns:
                            row[n] = float("nan")
                    rows.append(row)
                    print(row)

    fields = sorted({k for r in rows for k in r})
    with (out_dir / "robustness_results.csv").open("w", newline="") as fcsv:
        w = csv.DictWriter(fcsv, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)

    # groupby summary (target, mode, severity)
    summary = {}
    for r in rows:
        key = (r["target"], r["mode"], r["severity"])
        summary.setdefault(key, []).append(r)
    with (out_dir / "robustness_summary.csv").open("w", newline="") as fcsv:
        w = csv.writer(fcsv)
        w.writerow(["target", "mode", "severity", "n", "fail_rate",
                    "psnr", "ms_ssim", "lpips"])
        for (t, m, s), rs in sorted(summary.items()):
            fail = float(np.mean([r["decode_failed"] for r in rs]))
            stats = []
            for n in ("psnr", "ms_ssim", "lpips"):
                vals = [r[n] for r in rs if n in r and np.isfinite(r[n])]
                stats.append(float(np.mean(vals)) if vals else float("nan"))
            w.writerow([t, m, s, len(rs), fail] + stats)
    print(f"wrote {out_dir}/robustness_results.csv and summary")


if __name__ == "__main__":
    main()
