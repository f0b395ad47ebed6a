"""Batched multi-image inference CLI.

Role parity: /root/reference/inference_partition.py — groups images by
padded resolution (439-450), micro-batches the sampling stage (244-316),
optional bf16 autocast (283-291; bf16 here, TPU-native), optional VLM
captioning + classifier-free guidance over captions (73-134, 487-494),
resize guard / upsample-back (426-438, 519-535), per-image metrics CSV
(563-571), and memory/time profiling.

Note: like the reference, "partition" here means batching by resolution
group, not spatial tiling — spatial tiling lives in tiled_inference.py
(a new TPU capability).
"""
from __future__ import annotations

import argparse
import csv
import time
from collections import defaultdict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from rdeic_tpu.data.dataset import list_image_files
from rdeic_tpu.registry import instantiate_from_config, load_yaml
from rdeic_tpu.utils.checkpoint_io import load_inference_params
from rdeic_tpu.utils.image import pad, to_float01, to_uint8
from rdeic_tpu.utils.metrics import MetricSuite


def generate_captions(files, model_id, device):
    """Caption images with a HF VLM (Qwen2-VL in the reference). Gated on
    the model being locally available (zero-egress environments skip)."""
    try:
        from transformers import (  # noqa: PLC0415
            AutoProcessor,
            Qwen2VLForConditionalGeneration,
        )

        proc = AutoProcessor.from_pretrained(model_id, local_files_only=True)
        vlm = Qwen2VLForConditionalGeneration.from_pretrained(
            model_id, local_files_only=True
        )
    except Exception as e:  # pragma: no cover
        print(f"[captioning unavailable: {e}; using empty prompts]")
        return {f: "" for f in files}
    captions = {}
    for f in files:
        img = Image.open(f).convert("RGB")
        msgs = [{"role": "user", "content": [
            {"type": "image"},
            {"type": "text", "text": "Describe this image in one sentence."},
        ]}]
        prompt = proc.apply_chat_template(msgs, add_generation_prompt=True)
        inputs = proc(text=[prompt], images=[img], return_tensors="pt")
        out = vlm.generate(**inputs, max_new_tokens=48)
        text = proc.batch_decode(out[:, inputs["input_ids"].shape[1]:],
                                 skip_special_tokens=True)[0].strip()
        captions[f] = text
    return captions


def main():
    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    ap = argparse.ArgumentParser()
    from rdeic_tpu.utils.backend import add_platform_arg, apply_platform

    add_platform_arg(ap)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--config", type=str, default="configs/model/rdeic.yaml")
    ap.add_argument("--input", type=str, required=True)
    ap.add_argument("--output", type=str, required=True)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--sampler", type=str, default="ddpm", choices=["ddpm", "ddim"])
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--micro_batch_size", type=int, default=0,
                    help="sampling micro-batch (0 = batch_size)")
    ap.add_argument("--guidance_scale", type=float, default=1.0)
    ap.add_argument("--use_captions", action="store_true")
    ap.add_argument("--caption_model", type=str, default="Qwen/Qwen2-VL-2B-Instruct")
    ap.add_argument("--bpe_vocab", type=str, default=None,
                    help="CLIP BPE vocab (bpe_simple_vocab_16e6.txt.gz); "
                         "required to embed captions")
    ap.add_argument("--bf16", action="store_true", help="bf16 sampling")
    ap.add_argument("--max_size", type=int, default=0,
                    help="resize guard: downscale long side to this before "
                         "coding, upsample the reconstruction back (0 = off)")
    ap.add_argument("--seed", type=int, default=231)
    ap.add_argument("--profile_memory", action="store_true")
    ap.add_argument("--dp", type=int, default=1,
                    help="shard each sampling micro-batch over this many "
                         "devices (data-parallel serving mesh; micro-batch "
                         "must divide by it)")
    args = ap.parse_args()
    apply_platform(args.platform)

    model = instantiate_from_config(load_yaml(args.config))
    if args.bf16:
        model.set_compute_dtype(jnp.bfloat16)
    params = load_inference_params(args.ckpt, cast_denoiser_bf16=args.bf16)
    metrics = MetricSuite()
    psnr_f = metrics.create_metric("psnr")
    msssim_f = metrics.create_metric("ms_ssim")
    lpips_f = metrics.create_metric("lpips")

    in_path = Path(args.input)
    files = [str(in_path)] if in_path.is_file() else list_image_files(str(in_path))
    out_dir = Path(args.output)
    (out_dir / "bitstreams").mkdir(parents=True, exist_ok=True)

    # captioning (torch, host CPU) overlaps with coding (TPU): start it in a
    # background thread and resolve right before the first tokenization
    captions_future = None
    captions = {f: "" for f in files}
    if args.use_captions:
        from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

        _cap_pool = ThreadPoolExecutor(max_workers=1)
        captions_future = _cap_pool.submit(
            generate_captions, files, args.caption_model, None
        )
    tokenizer = None
    if args.use_captions and args.bpe_vocab and "clip" in params:
        from rdeic_tpu.models.clip import SimpleTokenizer  # noqa: PLC0415

        tokenizer = SimpleTokenizer(args.bpe_vocab)

    # ---- group by padded resolution (recompile-avoidance on TPU) ----
    groups = defaultdict(list)
    originals = {}
    for f in files:
        arr = np.array(Image.open(f).convert("RGB"))
        if args.max_size and max(arr.shape[:2]) > args.max_size:
            scale = args.max_size / max(arr.shape[:2])
            nh, nw = int(arr.shape[0] * scale), int(arr.shape[1] * scale)
            small = np.array(
                Image.fromarray(arr).resize((nw, nh), Image.LANCZOS)
            )
        else:
            small = arr
        padded = pad(small, 64)
        originals[f] = (arr, small.shape[:2])
        groups[padded.shape[:2]].append((f, padded))

    micro = args.micro_batch_size or args.batch_size
    mesh = None
    if args.dp > 1:
        from rdeic_tpu.parallel.mesh import batch_sharding, make_mesh  # noqa: PLC0415

        assert micro % args.dp == 0, (
            f"--micro_batch_size {micro} must divide by --dp {args.dp}"
        )
        mesh = make_mesh(dp=args.dp, tp=1,
                         devices=jax.devices()[: args.dp])
        bshard = batch_sharding(mesh)
        print(f"serving mesh: dp={args.dp} over {jax.device_count()} devices")
    rng = jax.random.PRNGKey(args.seed)
    rows = []

    # flatten (group, chunk) so the codec of chunk k+1 (host rANS + entropy
    # passes) overlaps with the sampling scan of chunk k (device-bound)
    chunks = []
    for (H, W), items in groups.items():
        print(f"group {H}x{W}: {len(items)} images")
        for i in range(0, len(items), args.batch_size):
            chunks.append(items[i : i + args.batch_size])

    def codec_stage(chunk):
        # batched codec: one pass-program chain for the whole chunk,
        # per-image independent bitstreams
        imgs01 = jnp.asarray(np.stack([to_float01(p) for _, p in chunk]))
        streams = [
            str(out_dir / "bitstreams" / f"{Path(f).stem}.rdeic")
            for f, _ in chunk
        ]
        bpps = model.apply_condition_compress_batch(params, imgs01, streams)
        c_latent, guide_hint = model.apply_condition_decompress_batch(
            params, streams
        )
        return bpps, c_latent, guide_hint

    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    codec_pool = ThreadPoolExecutor(max_workers=1)
    fut = codec_pool.submit(codec_stage, chunks[0]) if chunks else None
    for ci, chunk in enumerate(chunks):
        t0 = time.time()
        bpps, c_latent, guide_hint = fut.result()
        fut = (
            codec_pool.submit(codec_stage, chunks[ci + 1])
            if ci + 1 < len(chunks)
            else None
        )
        # micro-batched sampling
        outs = []
        fn = model.jitted_decode(
            steps=args.steps, sampler=args.sampler,
            guidance_scale=args.guidance_scale,
        )
        context = None
        if tokenizer is not None:
            if captions_future is not None:
                captions = captions_future.result()
                captions_future = None
            texts = [captions.get(f, "") for f, _ in chunk]
            tokens = jnp.asarray(tokenizer.tokenize(texts))
            context = model.get_learned_conditioning(params, tokens)
        for j in range(0, c_latent.shape[0], micro):
            rng, sub = jax.random.split(rng)
            cl_j = c_latent[j : j + micro]
            gh_j = guide_hint[j : j + micro]
            ctx_j = None if context is None else context[j : j + micro]
            if mesh is not None and cl_j.shape[0] % args.dp == 0:
                # shard the micro-batch over the dp serving mesh (same
                # layout dryrun_multichip validates); params replicate
                cl_j = jax.device_put(cl_j, bshard)
                gh_j = jax.device_put(gh_j, bshard)
                if ctx_j is not None:
                    ctx_j = jax.device_put(ctx_j, bshard)
            elif mesh is not None:
                print(
                    f"[dp] tail micro-batch of {cl_j.shape[0]} not divisible "
                    f"by --dp {args.dp}: running unsharded on one device "
                    "(extra compile for this shape)",
                    flush=True,
                )
            try:
                if mesh is not None:
                    with mesh:
                        outs.append(fn(params, cl_j, gh_j, sub, context=ctx_j))
                else:
                    outs.append(fn(params, cl_j, gh_j, sub, context=ctx_j))
            except Exception as e:
                if "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in str(e).lower():
                    print(
                        "\nOUT OF DEVICE MEMORY during sampling. Try, in "
                        "order:\n"
                        f"  --micro_batch_size {max(1, micro // 2)} "
                        "(halve the sampling micro-batch)\n"
                        "  --bf16 (halves activation memory)\n"
                        f"  --batch_size {max(1, args.batch_size // 2)} "
                        "(halve the codec batch)\n"
                        "  --max_size 1024 (resize guard for very large "
                        "images)\n"
                        "  or tiled_inference.py for 2K+ images "
                        "(bounded memory at any resolution)."
                    )
                raise
        out = np.concatenate([np.asarray(o) for o in outs])
        dt = (time.time() - t0) / len(chunk)
        if args.profile_memory:
            try:
                stats = jax.local_devices()[0].memory_stats()
                print(f"  device mem: {stats.get('bytes_in_use', 0)/2**20:.0f} MiB")
            except Exception:
                pass
        if captions_future is not None:  # captions wanted for the CSV
            captions = captions_future.result()
            captions_future = None
        for (f, _), recon01, bpp in zip(chunk, out, bpps):
            arr, (sh, sw) = originals[f]
            recon = to_uint8(recon01)[:sh, :sw]
            if recon.shape[:2] != arr.shape[:2]:
                recon = np.array(
                    Image.fromarray(recon).resize(
                        (arr.shape[1], arr.shape[0]), Image.LANCZOS
                    )
                )
            name = Path(f).stem
            Image.fromarray(recon).save(out_dir / f"{name}.png")
            a = jnp.asarray(arr, jnp.float32)[None] / 255.0
            b = jnp.asarray(recon, jnp.float32)[None] / 255.0
            size = (out_dir / "bitstreams" / f"{name}.rdeic").stat().st_size
            real_bpp = size * 8 / (arr.shape[0] * arr.shape[1])
            row = dict(
                name=name, bpp=real_bpp,
                psnr=float(psnr_f(a, b)[0]),
                ms_ssim=float(msssim_f(a, b)[0])
                if min(arr.shape[:2]) >= 176 else float("nan"),
                lpips=float(lpips_f(a, b)[0]),
                time=dt, caption=captions.get(f, ""),
            )
            rows.append(row)
            print(f"  {name}: bpp={row['bpp']:.5f} psnr={row['psnr']:.2f} "
                  f"time={dt:.2f}s")

    codec_pool.shutdown(wait=False)

    with (out_dir / "metrics.csv").open("w", newline="") as fcsv:
        writer = csv.DictWriter(fcsv, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    avg = {
        k: float(np.nanmean([r[k] for r in rows]))
        for k in ("bpp", "psnr", "ms_ssim", "lpips", "time")
    }
    print("averages:", ", ".join(f"{k}={v:.4f}" for k, v in avg.items()))


if __name__ == "__main__":
    main()
