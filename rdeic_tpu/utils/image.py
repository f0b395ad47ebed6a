"""Image utilities: crops, augmentation, padding, conversions.

Behavioral parity: /root/reference/utils/image/common.py — guided-diffusion
style center/random crops, hflip/rot augmentation, pad-to-multiple with
zero bottom/right padding (common.py:251-258).
"""
from __future__ import annotations

import math
import random
import numpy as np
from PIL import Image


def center_crop_arr(pil_image: Image.Image, image_size: int) -> np.ndarray:
    """Downscale so the short side is image_size, then center-crop."""
    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    arr = np.array(pil_image)
    cy = (arr.shape[0] - image_size) // 2
    cx = (arr.shape[1] - image_size) // 2
    return arr[cy : cy + image_size, cx : cx + image_size]


def random_crop_arr(
    pil_image: Image.Image,
    image_size: int,
    min_crop_frac: float = 0.8,
    max_crop_frac: float = 1.0,
    rng: random.Random | None = None,
) -> np.ndarray:
    """Random-scale then random-crop (guided-diffusion semantics)."""
    rng = rng or random
    min_smaller = math.ceil(image_size / max_crop_frac)
    max_smaller = math.ceil(image_size / min_crop_frac)
    smaller_dim = rng.randrange(min_smaller, max_smaller + 1)

    while min(*pil_image.size) >= 2 * smaller_dim:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = smaller_dim / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    arr = np.array(pil_image)
    cy = rng.randrange(arr.shape[0] - image_size + 1)
    cx = rng.randrange(arr.shape[1] - image_size + 1)
    return arr[cy : cy + image_size, cx : cx + image_size]


def augment(
    img: np.ndarray,
    hflip: bool = True,
    rotation: bool = True,
    rng: random.Random | None = None,
) -> np.ndarray:
    """Random horizontal flip + 90-degree rotations (HWC)."""
    rng = rng or random
    if hflip and rng.random() < 0.5:
        img = img[:, ::-1]
    if rotation:
        k = rng.randrange(4)
        img = np.rot90(img, k)
    return np.ascontiguousarray(img)


def pad(img: np.ndarray, scale: int = 64) -> np.ndarray:
    """Zero-pad bottom/right so H and W are multiples of `scale`.

    Accepts HWC or NHWC arrays.
    """
    h, w = img.shape[-3], img.shape[-2]
    ph = (scale - h % scale) % scale
    pw = (scale - w % scale) % scale
    if ph == 0 and pw == 0:
        return img
    pad_width = [(0, 0)] * (img.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return np.pad(img, pad_width)


def to_float01(img_uint8: np.ndarray) -> np.ndarray:
    return img_uint8.astype(np.float32) / 255.0


def to_uint8(img01: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img01) * 255.0, 0, 255).astype(np.uint8)


def rgb2ycbcr(img01: np.ndarray, y_only: bool = True) -> np.ndarray:
    """RGB [0,1] -> YCbCr (BT.601, as the reference's rgb2ycbcr_pt)."""
    m = np.array(
        [[65.481, 128.553, 24.966],
         [-37.797, -74.203, 112.0],
         [112.0, -93.786, -18.214]], dtype=np.float32,
    )
    out = img01 @ m.T + np.array([16.0, 128.0, 128.0], np.float32)
    out = out / 255.0
    return out[..., :1] if y_only else out


def usm_sharp(img01: np.ndarray, weight: float = 0.5, radius: int = 50,
              threshold: float = 10 / 255.0) -> np.ndarray:
    """Unsharp masking (role parity: utils/image/usm_sharp.py)."""
    from scipy.ndimage import gaussian_filter  # noqa: PLC0415

    blur = gaussian_filter(img01, sigma=(radius / 6, radius / 6, 0))
    residual = img01 - blur
    mask = (np.abs(residual) > threshold).astype(np.float32)
    soft_mask = gaussian_filter(mask, sigma=(radius / 6, radius / 6, 0))
    sharp = np.clip(img01 + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img01
