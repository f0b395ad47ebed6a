"""LPIPS perceptual loss (Flax, NHWC): AlexNet and VGG16 backbones.

Capability parity: /root/reference/model/lpips.py (bundled LPIPS used by the
refine-phase loss with pnet_type='alex', model/rdeic.py:653,861). Weights are
converted from the standard lpips .pth files by the checkpoint converter;
random init is used in tests.
"""
from __future__ import annotations

import warnings

import flax.linen as nn
import jax.numpy as jnp

_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])

_warned_contexts: set = set()


def warn_random_backbone(context: str) -> None:
    """Loud, once-per-context warning that LPIPS runs on a RANDOM backbone.

    No pretrained AlexNet/VGG feature weights exist in this environment
    (zero egress; torchvision absent). The published lpips .pth files bundle
    only the 1x1 "lin" heads — the backbone they calibrate is missing, so any
    LPIPS value computed here is an arbitrary random-projection distance:
    usable for relative/smoke comparisons within one run, NOT comparable to
    published LPIPS numbers (reference model/rdeic.py:653 uses the real net).
    """
    if context in _warned_contexts:
        return
    _warned_contexts.add(context)
    warnings.warn(
        f"LPIPS[{context}]: backbone weights are RANDOM-INIT — values are "
        "not comparable to published LPIPS numbers. Load a pretrained "
        "AlexNet/VGG backbone (none available in this sandbox) for real "
        "perceptual scores.",
        stacklevel=3,
    )


def load_lin_weights_torch(params: dict, pth_path: str) -> dict:
    """Merge the published LPIPS linear-head weights into a params tree.

    The reference ships `weight/lpips/{alex,vgg}.pth` containing ONLY the
    five 1x1 `lin{i}.model.1.weight` convs (the learned per-channel
    calibration); this loads them onto our Flax layout. The backbone stays
    whatever it already is in `params` (see warn_random_backbone).
    Torch layout (1, C, 1, 1) -> Flax Conv kernel (1, 1, C, 1).
    """
    import numpy as np  # noqa: PLC0415
    import torch  # noqa: PLC0415

    sd = torch.load(pth_path, map_location="cpu")
    out = dict(params)
    for i in range(5):
        w = sd[f"lin{i}.model.1.weight"].numpy()  # (1, C, 1, 1)
        kernel = np.transpose(w, (2, 3, 1, 0))  # (1, 1, C, 1)
        have = np.asarray(params[f"lin{i}"]["kernel"])
        if have.shape != kernel.shape:
            raise ValueError(
                f"lin{i} shape mismatch: params {have.shape} vs pth {kernel.shape}"
            )
        out[f"lin{i}"] = {"kernel": jnp.asarray(kernel)}
    return out


def _normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class AlexNetFeatures(nn.Module):
    """AlexNet feature extractor; returns the 5 post-ReLU taps."""

    @nn.compact
    def __call__(self, x):
        taps = []
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=[(2, 2), (2, 2)], name="conv1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=[(2, 2), (2, 2)], name="conv2")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding=[(1, 1), (1, 1)], name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="conv4")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="conv5")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


class VGG16Features(nn.Module):
    """VGG16 feature extractor; taps after relu1_2/2_2/3_3/4_3/5_3."""

    @nn.compact
    def __call__(self, x):
        taps = []
        cfg = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        idx = 0
        for stage, (ch, n) in enumerate(cfg):
            for i in range(n):
                x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], name=f"conv{idx}")(x)
                x = nn.relu(x)
                idx += 1
            taps.append(x)
            if stage != len(cfg) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Learned perceptual distance between two [-1,1] RGB images (NHWC)."""

    net: str = "alex"  # "alex" | "vgg"

    @nn.compact
    def __call__(self, x, y):
        backbone = (
            AlexNetFeatures(name="backbone")
            if self.net == "alex"
            else VGG16Features(name="backbone")
        )
        xs = backbone((x - _SHIFT) / _SCALE)
        ys = backbone((y - _SHIFT) / _SCALE)
        total = 0.0
        for i, (fx, fy) in enumerate(zip(xs, ys)):
            diff = (_normalize(fx) - _normalize(fy)) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin{i}")(diff)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total  # [B]
