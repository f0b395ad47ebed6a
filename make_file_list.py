"""Build train.list / valid.list from image folders.

Role parity: /root/reference/make_file_list.py.
"""
from __future__ import annotations

import argparse
import random
from pathlib import Path

from rdeic_tpu.data.dataset import list_image_files


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img_folder", type=str, required=True, nargs="+")
    ap.add_argument("--val_size", type=int, default=0)
    ap.add_argument("--save_folder", type=str, default="./datalists")
    ap.add_argument("--seed", type=int, default=231)
    args = ap.parse_args()

    files = []
    for folder in args.img_folder:
        files.extend(str(Path(f).absolute()) for f in list_image_files(folder))
    random.Random(args.seed).shuffle(files)

    out = Path(args.save_folder)
    out.mkdir(parents=True, exist_ok=True)
    val = files[: args.val_size]
    train = files[args.val_size :]
    (out / "train.list").write_text("\n".join(train) + "\n")
    (out / "valid.list").write_text("\n".join(val) + "\n" if val else "")
    print(f"wrote {len(train)} train / {len(val)} valid entries to {out}")


if __name__ == "__main__":
    main()
