"""Module stubs so reference torch modules import without their heavy deps.

The reference (under /root/reference, sys.path-appended by the parity tests)
needs pytorch_lightning / pyiqa / torchvision / compressai / torchac /
omegaconf at import time; none are installed here. These stubs supply the
exact surface the imported module graph touches so we can instantiate
NoiseEstimator / ControlModule / Compression and compare forwards.
"""
from __future__ import annotations

import sys
import types


def install_reference_stubs():
    import torch
    import torch.nn as nn

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    pl = stub("pytorch_lightning")

    class LightningModule(nn.Module):
        def save_hyperparameters(self, *a, **k):
            pass

    pl.LightningModule = LightningModule
    pl.Callback = object
    pl.seed_everything = lambda *a, **k: None
    stub("pytorch_lightning.utilities")
    stub("pytorch_lightning.utilities.types", EPOCH_OUTPUT=list)
    stub("pytorch_lightning.utilities.distributed", rank_zero_only=lambda f: f)

    stub(
        "pyiqa",
        create_metric=lambda *a, **k: (lambda *aa, **kk: torch.zeros(1)),
    )

    if "omegaconf" not in sys.modules:
        oc = stub("omegaconf")
        lc = stub("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        oc.listconfig = lc
        oc.ListConfig = ListConfig
        oc.OmegaConf = types.SimpleNamespace(to_container=lambda x, **k: x)

    tv = stub("torchvision")
    tv.__path__ = []

    class ToPILImage:
        def __call__(self, x):
            return x

    stub("torchvision.utils", make_grid=lambda *a, **k: torch.zeros(1))
    stub("torchvision.transforms", ToPILImage=ToPILImage)
    stub("torchvision.models")
    tv.utils = sys.modules["torchvision.utils"]
    tv.transforms = sys.modules["torchvision.transforms"]
    tv.models = sys.modules["torchvision.models"]

    ca = stub("compressai")
    ca.__path__ = []

    class _EntropyModel(nn.Module):
        pass

    class GaussianConditional(nn.Module):
        """Likelihood values are irrelevant for deterministic-tensor parity;
        returns ones so the reference forward runs."""

        def __init__(self, *a, **k):
            super().__init__()
            # real compressai EntropyModel/GaussianConditional buffers —
            # a released RDEIC checkpoint carries these names, so the
            # full-surface converter audit must see them (they are
            # rebuilt at load time by update(force=True), matching
            # reference inference.py:124)
            self.register_buffer("_offset", torch.zeros(0, dtype=torch.int32))
            self.register_buffer(
                "_quantized_cdf", torch.zeros(0, dtype=torch.int32)
            )
            self.register_buffer(
                "_cdf_length", torch.zeros(0, dtype=torch.int32)
            )
            self.register_buffer("scale_table", torch.zeros(0))

        def forward(self, inputs, scales, means=None, training=None):
            return inputs, torch.ones_like(inputs)

    stub(
        "compressai.entropy_models",
        GaussianConditional=GaussianConditional,
        EntropyModel=_EntropyModel,
    )

    class CompressionModel(nn.Module):
        pass

    stub("compressai.models", CompressionModel=CompressionModel)
    stub(
        "compressai.ops",
        quantize_ste=lambda x: (torch.round(x) - x).detach() + x,
    )
    stub("compressai.ans", BufferedRansEncoder=object, RansDecoder=object)

    def conv3x3(in_ch, out_ch, stride=1):
        return nn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1)

    stub("compressai.layers", conv3x3=conv3x3)
    stub("torchac")

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
