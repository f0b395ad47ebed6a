"""Image quality metrics: PSNR / SSIM / MS-SSIM (+ LPIPS via the Flax net).

Role parity: the pyiqa metrics used throughout the reference
(model/rdeic.py:641-647, inference_partition.py, experiments/run_*.py).
Implemented from the published formulas (Wang et al. 2003/2004) in JAX so
they run on TPU; all take NHWC float arrays in [0, 1].
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a: jnp.ndarray, b: jnp.ndarray, crop_border: int = 0) -> jnp.ndarray:
    """Peak signal-to-noise ratio per image. a, b: [B, H, W, C] in [0,1]."""
    if crop_border:
        a = a[:, crop_border:-crop_border, crop_border:-crop_border]
        b = b[:, crop_border:-crop_border, crop_border:-crop_border]
    mse = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


def _fspecial_gauss(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g2 = g[:, None] * g[None, :]
    return g2 / jnp.sum(g2)


def _filter2(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode depthwise 2D filter. img [B,H,W,C], window [k,k]."""
    c = img.shape[-1]
    kernel = jnp.tile(window[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        img, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _ssim_components(a, b, window):
    c1, c2 = 0.01**2, 0.03**2
    mu1 = _filter2(a, window)
    mu2 = _filter2(b, window)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter2(a * a, window) - mu1_sq
    s2 = _filter2(b * b, window) - mu2_sq
    s12 = _filter2(a * b, window) - mu12
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    ssim_map = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    return ssim_map, cs


def ssim(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Single-scale SSIM per image (11x11 gaussian window, sigma 1.5)."""
    window = _fspecial_gauss(11, 1.5)
    ssim_map, _ = _ssim_components(a, b, window)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


_MSSSIM_WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])


def ms_ssim(a: jnp.ndarray, b: jnp.ndarray, levels: int = 5) -> jnp.ndarray:
    """Multi-scale SSIM per image. Needs H, W >= 11 * 2^(levels-1)."""
    window = _fspecial_gauss(11, 1.5)
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:levels])
    vals = []
    for i in range(levels):
        ssim_map, cs = _ssim_components(a, b, window)
        if i == levels - 1:
            vals.append(jnp.mean(ssim_map, axis=(1, 2, 3)))
        else:
            vals.append(jnp.mean(cs, axis=(1, 2, 3)))
            a = jax.lax.reduce_window(
                a, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            b = jax.lax.reduce_window(
                b, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    vals = jnp.stack(vals)  # [levels, B]
    return jnp.prod(jnp.maximum(vals, 0) ** weights[:, None], axis=0)


def mse(a, b):
    return jnp.mean((a - b) ** 2, axis=(1, 2, 3))


def mae(a, b):
    return jnp.mean(jnp.abs(a - b), axis=(1, 2, 3))


class MetricSuite:
    """pyiqa-style metric registry: create_metric(name) -> callable.

    LPIPS uses the Flax net with converted weights when `lpips_params` is
    provided (random weights otherwise — relative comparisons only).
    """

    def __init__(self, lpips_params=None, lpips_net: str = "alex"):
        self._lpips_params = lpips_params
        self._lpips_net = lpips_net
        self._jitted = {}

    def create_metric(self, name: str, **opts):
        crop = int(opts.get("crop_border", 0) or 0)
        if name == "psnr":
            return self._jit(name, partial(psnr, crop_border=crop))
        if name == "ssim":
            return self._jit(name, ssim)
        if name == "ms_ssim":
            return self._jit(name, ms_ssim)
        if name in ("mse",):
            return self._jit(name, mse)
        if name in ("mae",):
            return self._jit(name, mae)
        if name == "lpips":
            return self._lpips()
        if name == "niqe":
            return self._niqe(opts.get("model_path"))
        raise ValueError(f"unknown metric {name!r}")

    def _jit(self, name, fn):
        if name not in self._jitted:
            self._jitted[name] = jax.jit(fn)
        return self._jitted[name]

    def _niqe(self, model_path):
        """No-reference NIQE; needs a fitted pristine model
        (rdeic_tpu.utils.niqe.NIQEModel.fit_pristine / .save)."""
        if "niqe" in self._jitted:
            return self._jitted["niqe"]
        from rdeic_tpu.utils.niqe import NIQEModel  # noqa: PLC0415

        if model_path is None:
            raise ValueError(
                "niqe requires model_path= (fit one with NIQEModel.fit_pristine)"
            )
        model = NIQEModel.load(model_path)

        def fn(a, b=None):  # single-input metric; b ignored for API parity
            import numpy as _np  # noqa: PLC0415

            arr = _np.asarray(a)
            return jnp.asarray([model.score(im) for im in arr])

        self._jitted["niqe"] = fn
        return fn

    def _lpips(self):
        if "lpips" in self._jitted:
            return self._jitted["lpips"]
        from rdeic_tpu.models.lpips import LPIPS  # noqa: PLC0415

        from rdeic_tpu.models.lpips import warn_random_backbone  # noqa: PLC0415

        net = LPIPS(net=self._lpips_net)
        params = self._lpips_params
        if params is None:
            warn_random_backbone("MetricSuite")
            probe = jnp.zeros((1, 64, 64, 3))
            params = net.init(jax.random.PRNGKey(0), probe, probe)["params"]

        @jax.jit
        def fn(a, b):
            # metric inputs are [0,1]; LPIPS expects [-1,1]
            return net.apply({"params": params}, a * 2 - 1, b * 2 - 1)

        self._jitted["lpips"] = fn
        return fn
