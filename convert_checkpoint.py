"""Convert PyTorch checkpoints (SD 2.1 base + CC) into framework params.

Role parity: the reference's composite load path — inference.py:121-122
(single merged ckpt) and inference_partition.py:371-374 (SD ckpt + CC ckpt
dict-merged then loaded non-strict), plus sync_control_weights_from_base
(rdeic.py:962-991). Output: a portable .npz params file for all CLIs.

Usage:
  python convert_checkpoint.py --config configs/model/rdeic.yaml \
      --sd_ckpt v2-1_512-ema-pruned.ckpt --cc_ckpt rdeic_ckpt.ckpt \
      --out params.npz [--sync_control]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from rdeic_tpu.models.clip import tokenize_empty
from rdeic_tpu.registry import instantiate_from_config, load_yaml
from rdeic_tpu.utils.checkpoint_io import save_params_npz
from rdeic_tpu.utils.torch_convert import (
    convert_state_dict,
    load_torch_checkpoint,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default="configs/model/rdeic.yaml")
    ap.add_argument("--sd_ckpt", type=str, default=None,
                    help="SD 2.1 base checkpoint (v2-1_512-ema-pruned.ckpt)")
    ap.add_argument("--cc_ckpt", type=str, default=None,
                    help="compression-and-control checkpoint")
    ap.add_argument("--lpips_ckpt", type=str, default=None,
                    help="lpips lin-layer weights (alex.pth)")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--sync_control", action="store_true",
                    help="initialise control weights from the base UNet "
                         "(tile/truncate) when absent from the checkpoints")
    ap.add_argument("--image_size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    model = instantiate_from_config(load_yaml(args.config))
    print("building params template (random init)...")
    params = model.init_params(
        jax.random.PRNGKey(args.seed),
        image_hw=(args.image_size, args.image_size),
        include_clip=True,
        include_lpips=True,
    )

    # merge semantics: SD dict first, CC dict updates it
    merged = {}
    for path in (args.sd_ckpt, args.cc_ckpt):
        if path:
            print(f"loading {path}...")
            merged.update(load_torch_checkpoint(path))
    if not merged:
        raise SystemExit("provide at least one of --sd_ckpt / --cc_ckpt")

    params, missing = convert_state_dict(
        merged, params, model, sync_control=args.sync_control
    )
    print(f"[{len(missing)} leaves kept random "
          f"(hint processing / cross connections included)]")
    for m in missing[:20]:
        print("  missing:", m)

    if args.lpips_ckpt:
        import torch  # noqa: PLC0415
        from flax.traverse_util import flatten_dict, unflatten_dict  # noqa: PLC0415

        lp = torch.load(args.lpips_ckpt, map_location="cpu")
        flat = dict(flatten_dict(params))
        for i in range(5):
            key = next(
                (k for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight")
                 if k in lp), None,
            )
            if key is None:
                continue
            w = lp[key].float().numpy()  # [1, C, 1, 1]
            flat[("lpips", f"lin{i}", "kernel")] = jnp.asarray(
                np.transpose(w, (2, 3, 1, 0))
            )
        params = unflatten_dict(flat)
        print("lpips lin weights converted")

    # precompute the empty-prompt context from the converted CLIP tower
    if "clip" in params:
        print("computing empty-prompt CLIP embedding...")
        tokens = jnp.asarray(tokenize_empty(1))
        ctx = model.clip.apply({"params": params["clip"]}, tokens)
        params["uncond_context"] = jnp.asarray(ctx)

    save_params_npz(args.out, jax.device_get(params))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
