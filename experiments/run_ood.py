"""OOD domain evaluation harness.

Role parity: /root/reference/experiments/run_ood.py — evaluate the codec on
out-of-distribution domains (satellite/sketch/etc. file lists), optional
test-time augmentation (sample multiple relay noise draws, keep the best by
LPIPS, 187-221), full-reference + no-reference metrics, per-image CSV.
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

from rdeic_tpu.data.dataset import list_image_files, load_file_list  # noqa: E402
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
    ap.add_argument("--input", type=str, required=True,
                    help="comma-separated image dirs or .list files, one "
                         "per OOD domain (reference run_ood.py --domains)")
    ap.add_argument("--domain", type=str, default=None,
                    help="comma-separated domain names; default: the stem "
                         "of each --input entry")
    ap.add_argument("--output", type=str, default="./ood_out")
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--num_images", type=int, default=0)
    ap.add_argument("--tta_samples", type=int, default=1,
                    help=">1 enables noise-draw test-time augmentation: "
                         "keep the sample with the best LPIPS")
    ap.add_argument("--seed", type=int, default=231)
    ap.add_argument("--nr_metrics", action="store_true",
                    help="also compute no-reference NIQE + BRISQUE columns "
                         "(parity: reference run_ood.py:93-129)")
    ap.add_argument("--niqe_model", type=str, default=None,
                    help="fitted NIQE pristine model .npz; default: fit "
                         "from the input originals of this domain")
    ap.add_argument("--brisque_model", type=str, default=None,
                    help="fitted BRISQUE pristine model .npz; default: fit "
                         "from the input originals of this domain")
    args = ap.parse_args()
    apply_platform(args.platform)

    model = instantiate_from_config(load_yaml(args.config))
    params = load_inference_params(args.ckpt)
    suite = MetricSuite()
    fns = {n: suite.create_metric(n) for n in ("psnr", "ms_ssim", "lpips")}

    inputs = [s.strip() for s in args.input.split(",") if s.strip()]
    names = (
        [s.strip() for s in args.domain.split(",")]
        if args.domain
        else [Path(s).stem or "ood" for s in inputs]
    )
    if len(names) != len(inputs):
        raise SystemExit("--domain count must match --input count")

    all_rows = []
    rng = jax.random.PRNGKey(args.seed)
    for inp, domain in zip(inputs, names):
        rows, rng = eval_domain(args, model, params, fns, inp, domain, rng)
        all_rows.extend(rows)

    # consolidated CSV + per-domain mean/std summary
    # (parity: reference run_ood.py:389-405 groupby summary)
    if all_rows and len(inputs) > 1:
        out_root = Path(args.output)
        keys = list(all_rows[0].keys())
        with (out_root / "ood_results_all.csv").open("w", newline="") as fcsv:
            w = csv.DictWriter(fcsv, fieldnames=keys)
            w.writeheader()
            w.writerows(all_rows)
        print("\n=== Summary by domain (mean / std) ===")
        metric_keys = [k for k in keys if k not in ("name", "domain")]
        for domain in names:
            drows = [r for r in all_rows if r["domain"] == domain]
            if not drows:
                continue
            parts = []
            for k in metric_keys:
                vals = np.asarray([r[k] for r in drows], np.float64)
                parts.append(
                    f"{k}={np.nanmean(vals):.4f}±{np.nanstd(vals):.4f}"
                )
            print(f"  {domain} (n={len(drows)}): " + "  ".join(parts))


def eval_domain(args, model, params, fns, input_path, domain, rng):
    """Evaluate one OOD domain; returns (per-image rows, advanced rng)."""
    p = Path(input_path)
    if p.is_file() and p.suffix == ".list":
        files = load_file_list(str(p))
    elif p.is_file():
        files = [str(p)]
    else:
        files = list_image_files(str(p))
    if args.num_images:
        files = files[: args.num_images]

    nr_models = {}
    if args.nr_metrics:
        from rdeic_tpu.utils.brisque import BRISQUEModel  # noqa: PLC0415
        from rdeic_tpu.utils.niqe import NIQEModel  # noqa: PLC0415

        if args.niqe_model:
            nr_models["niqe"] = NIQEModel.load(args.niqe_model)
        if args.brisque_model:
            nr_models["brisque"] = BRISQUEModel.load(args.brisque_model)
        missing = [n for n in ("niqe", "brisque") if n not in nr_models]
        if missing:
            # Self-fit pristine statistics from this domain's originals:
            # the in-domain clean images ARE the naturalness reference the
            # reconstructions should match.
            pristine = []
            for f in files[:24]:
                arr = np.array(Image.open(f).convert("RGB"), np.float64) / 255.0
                if min(arr.shape[:2]) >= 96:
                    pristine.append(arr)
            if pristine:
                if "niqe" in missing:
                    nr_models["niqe"] = NIQEModel.fit_pristine(pristine)
                if "brisque" in missing:
                    nr_models["brisque"] = BRISQUEModel.fit_pristine(pristine)
                print(f"fitted pristine {missing} models from "
                      f"{len(pristine)} domain originals")
            else:
                print(f"WARNING: no images >=96px to fit {missing}; skipping")

    out_dir = Path(args.output) / domain
    (out_dir / "bitstreams").mkdir(parents=True, exist_ok=True)
    decode_fn = model.jitted_decode(steps=args.steps)
    rows = []

    for f in files:
        name = Path(f).stem
        arr = np.array(Image.open(f).convert("RGB"))
        H, W = arr.shape[:2]
        img01 = to_float01(pad(arr, 64))[None]
        stream = out_dir / "bitstreams" / f"{name}.rdeic"
        model.apply_condition_compress(
            params, jnp.asarray(img01), str(stream),
            img01.shape[1], img01.shape[2],
        )
        bpp = stream.stat().st_size * 8 / (H * W)
        c_latent, guide_hint = model.apply_condition_decompress(params, str(stream))
        ref = jnp.asarray(arr, jnp.float32)[None] / 255.0

        best = None
        for _ in range(max(1, args.tta_samples)):
            rng, sub = jax.random.split(rng)
            out01 = decode_fn(params, c_latent, guide_hint, sub)
            recon = to_uint8(out01[0])[:H, :W]
            b = jnp.asarray(recon, jnp.float32)[None] / 255.0
            lp = float(fns["lpips"](ref, b)[0])
            if best is None or lp < best[0]:
                best = (lp, recon, b)
        _, recon, b = best
        Image.fromarray(recon).save(out_dir / f"{name}.png")
        row = {"name": name, "domain": domain, "bpp": bpp}
        for n, fn in fns.items():
            try:
                row[n] = float(fn(ref, b)[0])
            except Exception:
                row[n] = float("nan")
        for n, m in nr_models.items():
            try:
                row[n] = m.score(np.asarray(recon, np.float64) / 255.0)
            except Exception:
                row[n] = float("nan")
        rows.append(row)
        print(row)

    if rows:
        with (out_dir / "ood_metrics.csv").open("w", newline="") as fcsv:
            w = csv.DictWriter(fcsv, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        avg = {
            k: float(np.nanmean([r[k] for r in rows]))
            for k in rows[0] if k not in ("name", "domain")
        }
        print(f"domain={domain} averages: {avg}")
    return rows, rng


if __name__ == "__main__":
    main()
