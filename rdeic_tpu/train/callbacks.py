"""Training callbacks: periodic image logging + checkpoint cadence.

Role parity: /root/reference/model/callbacks.py — ImageLogger saves
target / vae reconstruction / samples image grids every N steps (rank-zero
only; here: host process 0), ModelCheckpoint cadence handled by the trainer
loop via utils.checkpoint_io.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from rdeic_tpu.utils.image import to_uint8


class ImageLogger:
    """Every `every_n_steps`, run log_images on one batch and save a grid of
    target / vae_rec / samples panels (rdeic.py:715-738 outputs)."""

    def __init__(self, save_dir: str, every_n_steps: int = 2000,
                 max_images: int = 4, sample_steps: int = 5):
        self.save_dir = Path(save_dir)
        self.every_n_steps = every_n_steps
        self.max_images = max_images
        self.sample_steps = sample_steps

    def maybe_log(self, model, params, batch_img, step: int, rng) -> None:
        if step % self.every_n_steps != 0:
            return
        if jax.process_index() != 0:
            return
        img = np.asarray(batch_img)[: self.max_images]
        log, bpp = log_images(model, params, img, rng,
                              sample_steps=self.sample_steps)
        out_dir = self.save_dir / "image_log" / f"step_{step}"
        out_dir.mkdir(parents=True, exist_ok=True)
        for key, val in log.items():
            grid = _make_grid(np.asarray(val))
            Image.fromarray(grid).save(out_dir / f"{key}.png")
        (out_dir / "bpp.txt").write_text(f"{bpp:.6f}\n")


def _log_inputs_fn(model):
    """Jitted eval-mode get_input + VAE reconstruction (cached on model)."""
    key = ("log_inputs",)
    if key not in model._jit_cache:

        def fn(params, img, rng):
            z, cond = model.get_input(params, img, rng, training=False)
            vae_rec = jnp.clip(
                (model.decode_first_stage(params, z) + 1) / 2, 0.0, 1.0
            )
            return (
                cond["c_latent"], cond["guide_hint"], cond["c_crossattn"],
                cond["q_bpp"], cond["vq_indices"], vae_rec,
            )

        model._jit_cache[key] = jax.jit(fn)
    return model._jit_cache[key]


def log_images(model, params, img, rng, sample_steps: int = 5):
    """(log dict, q_bpp + hyper bits) — parity with RDEIC.log_images
    (rdeic.py:715-738): target / vae_rec / relay samples panels."""
    rng_in, rng_s = jax.random.split(rng)
    img = jnp.asarray(img, jnp.float32)
    c_latent, guide_hint, context, q_bpp, vq_indices, vae_rec = _log_inputs_fn(
        model
    )(params, img, rng_in)
    zh, zw = vq_indices.shape[1:3]
    n_pix = img.shape[1] * img.shape[2]
    bits_per_idx = max(1, int(np.ceil(np.log2(model.compression.codebook_size))))
    bpp = float(q_bpp) + bits_per_idx * zh * zw / n_pix
    steps = model.fixed_step if model.is_refine else sample_steps
    samples01 = model.jitted_decode(steps=steps)(
        params, c_latent, guide_hint, rng_s
    )
    log = {
        "target": (np.asarray(img) + 1) / 2,
        "vae_rec": np.asarray(vae_rec),
        "samples": np.asarray(samples01),
    }
    return log, bpp


def _make_grid(batch01: np.ndarray) -> np.ndarray:
    """[B, H, W, 3] in [0,1] -> single row grid uint8."""
    return to_uint8(np.concatenate(list(np.clip(batch01, 0, 1)), axis=1))


class ModelCheckpoint:
    """Registry-compatible placeholder (cadence lives in the trainer)."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs
