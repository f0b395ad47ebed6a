"""Generate deterministic sample images + datalists for in-sandbox runs.

Role parity: /root/reference/datalists/*.list point at LSDIR/Kodak/EuroSAT
datasets that are not redistributable here; this script synthesizes small
structured images (natural-ish: gradients, shapes, textures) and writes the
same list-file layout so every CLI that takes a `.list` (train.py,
run_ood.py, run_robustness.py, inference_partition.py) can run end-to-end.

Usage: python experiments/make_sample_data.py [--root datalists] [--size 256]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def _texture(rng: np.random.Generator, size: int) -> np.ndarray:
    """Multi-octave value noise: smooth, natural-image-like statistics."""
    img = np.zeros((size, size, 3))
    for octave in range(4):
        n = 2 ** (octave + 2)
        coarse = rng.random((n, n, 3))
        img += np.asarray(
            Image.fromarray((coarse * 255).astype(np.uint8)).resize(
                (size, size), Image.BILINEAR
            ),
            np.float64,
        ) / 255.0 / (2**octave)
    return img / img.max()


def _natural(rng: np.random.Generator, size: int) -> np.ndarray:
    """Texture + geometric structure (edges matter for codecs)."""
    img = _texture(rng, size)
    yy, xx = np.mgrid[0:size, 0:size] / size
    # sky/ground gradient
    img = 0.6 * img + 0.4 * np.stack(
        [0.4 + 0.5 * yy, 0.5 + 0.3 * yy, 0.8 - 0.4 * yy], axis=-1
    )
    # a few hard-edged rectangles and a disc
    for _ in range(4):
        y0, x0 = rng.integers(0, size - size // 4, 2)
        h, w = rng.integers(size // 8, size // 3, 2)
        img[y0 : y0 + h, x0 : x0 + w] = rng.random(3) * 0.9
    cy, cx, r = rng.integers(size // 4, 3 * size // 4, 3)
    mask = (yy * size - cy) ** 2 + (xx * size - cx) ** 2 < (r / 2) ** 2
    img[mask] = rng.random(3)
    return np.clip(img, 0, 1)


def _satellite(rng: np.random.Generator, size: int) -> np.ndarray:
    """Top-down field/road mosaic (EuroSAT-ish statistics)."""
    img = np.zeros((size, size, 3))
    n = 6
    cell = size // n
    for i in range(n):
        for j in range(n):
            green = rng.uniform(0.2, 0.7)
            img[i * cell : (i + 1) * cell, j * cell : (j + 1) * cell] = (
                green * 0.5,
                green,
                green * 0.3,
            )
    # roads
    for _ in range(3):
        pos = int(rng.integers(0, size - 4))
        if rng.random() < 0.5:
            img[pos : pos + 3, :] = 0.55
        else:
            img[:, pos : pos + 3] = 0.55
    img += 0.08 * rng.standard_normal(img.shape)
    return np.clip(img, 0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, default="datalists")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n_train", type=int, default=12)
    ap.add_argument("--n_valid", type=int, default=4)
    ap.add_argument("--n_ood", type=int, default=6)
    ap.add_argument("--seed", type=int, default=231)
    args = ap.parse_args()

    root = Path(args.root)
    rng = np.random.default_rng(args.seed)

    def write_set(dirname: str, count: int, gen) -> list:
        d = root / "samples" / dirname
        d.mkdir(parents=True, exist_ok=True)
        out = []
        for i in range(count):
            arr = (gen(rng, args.size) * 255).astype(np.uint8)
            p = d / f"{dirname}_{i:03d}.png"
            Image.fromarray(arr).save(p)
            out.append(str(p.absolute()))
        return out

    train = write_set("natural", args.n_train, _natural)
    valid = write_set("natural_valid", args.n_valid, _natural)
    ood_t = write_set("satellite", args.n_ood, _satellite)
    ood_v = write_set("satellite_valid", max(2, args.n_ood // 3), _satellite)

    lists = {
        "train.list": train,
        "valid.list": valid,
        "ood_train.list": ood_t,
        "ood_satellite_train.list": ood_t,
        "ood_satellite_valid.list": ood_v,
        "ood_satellite_valid_small.list": ood_v[:2],
    }
    for name, files in lists.items():
        (root / name).write_text("\n".join(files) + "\n")
        print(f"{name}: {len(files)} entries")


if __name__ == "__main__":
    main()
