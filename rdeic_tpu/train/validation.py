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

from rdeic_tpu.train.callbacks import log_images
from rdeic_tpu.utils.metrics import MetricSuite


def run_validation(
    model, params, loader, rng, max_batches: int = 0,
    sample_steps: int = 5, metric_names=("psnr", "ms_ssim", "lpips"),
) -> dict:
    suite = MetricSuite()
    fns = {n: suite.create_metric(n) for n in metric_names}
    usage = np.zeros(model.compression.codebook_size, dtype=np.int64)
    rows = []
    for i, batch in enumerate(loader):
        if max_batches and i >= max_batches:
            break
        img = jnp.asarray(batch["jpg"], jnp.float32)
        rng, sub, sub2 = jax.random.split(rng, 3)
        # codebook usage from the eval-mode forward
        _, cond = model.get_input(params, img, sub2, training=False)
        idx = np.asarray(cond["vq_indices"]).reshape(-1)
        np.add.at(usage, idx, 1)
        log, bpp = log_images(model, params, np.asarray(img), sub,
                              sample_steps=sample_steps)
        a = jnp.asarray(log["target"], jnp.float32)
        b = jnp.asarray(log["samples"], jnp.float32)
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
