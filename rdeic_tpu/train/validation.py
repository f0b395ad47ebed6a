"""Validation loop: avg bpp / PSNR / MS-SSIM / LPIPS + VQ codebook usage.

Role parity: RDEIC.validation_step / validation_epoch_end
(model/rdeic.py:907-955) — per-batch relay sampling, pyiqa-style metrics,
codebook-usage fraction aggregated per validation pass
(compression_modules.py:218-226).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rdeic_tpu.train.callbacks import _log_inputs_fn
from rdeic_tpu.utils.metrics import MetricSuite


def run_validation(
    model, params, loader, rng, max_batches: int = 0,
    sample_steps: int = 5, metric_names=("psnr", "ms_ssim", "lpips"),
) -> dict:
    suite = MetricSuite()
    fns = {n: suite.create_metric(n) for n in metric_names}
    usage = np.zeros(model.compression.codebook_size, dtype=np.int64)
    rows = []
    bits_per_idx = max(
        1, int(np.ceil(np.log2(model.compression.codebook_size)))
    )
    steps = model.fixed_step if model.is_refine else sample_steps
    for i, batch in enumerate(loader):
        if max_batches and i >= max_batches:
            break
        img = jnp.asarray(batch["jpg"], jnp.float32)
        rng, sub, sub2 = jax.random.split(rng, 3)
        c_latent, guide_hint, _, q_bpp, vq_indices, _ = _log_inputs_fn(model)(
            params, img, sub2
        )
        idx = np.asarray(vq_indices).reshape(-1)
        np.add.at(usage, idx, 1)
        zh, zw = vq_indices.shape[1:3]
        n_pix = img.shape[1] * img.shape[2]
        bpp = float(q_bpp) + bits_per_idx * zh * zw / n_pix
        samples01 = model.jitted_decode(steps=steps)(
            params, c_latent, guide_hint, sub
        )
        a = (img + 1) / 2
        b = jnp.asarray(samples01, jnp.float32)
        row = {"bpp": bpp}
        for n, fn in fns.items():
            try:
                row[n] = float(np.mean(np.asarray(fn(a, b))))
            except Exception:
                row[n] = float("nan")
        rows.append(row)
    out = {
        f"avg_{k}": float(np.nanmean([r[k] for r in rows]))
        for k in rows[0]
    } if rows else {}
    out["usage"] = float((usage > 0).mean())
    return out
