"""Config system: YAML `target:`/`params:` reflection, as in the reference.

Parity: /root/reference/utils/common.py:7-19 and ldm/util.py:83-98 —
`instantiate_from_config` resolves a dotted class path and passes `params`
as kwargs. Reference target paths (e.g. ``model.rdeic.RDEIC``) are remapped
to this package so the reference YAML trees keep working unmodified.
"""
from __future__ import annotations

import importlib
from typing import Any, Mapping

import yaml

# Reference target path -> rdeic_tpu target path.
_TARGET_ALIASES = {
    "model.rdeic.RDEIC": "rdeic_tpu.pipeline.rdeic.RDEIC",
    "model.rdeic.NoiseEstimator": "rdeic_tpu.models.control.NoiseEstimatorConfig",
    "model.compression.Compression": "rdeic_tpu.models.compression.CompressionConfig",
    "ldm.modules.diffusionmodules.openaimodel.UNetModel": "rdeic_tpu.models.unet.UNetConfig",
    "ldm.models.autoencoder.AutoencoderKL": "rdeic_tpu.models.vae.AutoencoderKLConfig",
    "ldm.modules.encoders.modules.FrozenOpenCLIPEmbedder": "rdeic_tpu.models.clip.OpenCLIPTextConfig",
    "torch.nn.Identity": "rdeic_tpu.registry.Identity",
    "dataset.data_module.DataModule": "rdeic_tpu.data.dataset.DataModule",
    "dataset.licdataset.LICDataset": "rdeic_tpu.data.dataset.LICDataset",
    "dataset.batch_transform.IdentityBatchTransform": "rdeic_tpu.data.dataset.IdentityBatchTransform",
    "model.callbacks.ImageLogger": "rdeic_tpu.train.callbacks.ImageLogger",
    "model.callbacks.ModelCheckpoint": "rdeic_tpu.train.callbacks.ModelCheckpoint",
}


class Identity:
    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, x):
        return x


def get_obj_from_str(path: str, reload: bool = False) -> Any:
    path = _TARGET_ALIASES.get(path, path)
    module, cls = path.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: Mapping[str, Any]) -> Any:
    if "target" not in config:
        raise KeyError("expected key `target` to instantiate")
    params = dict(config.get("params") or {})
    return get_obj_from_str(config["target"])(**params)


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)
