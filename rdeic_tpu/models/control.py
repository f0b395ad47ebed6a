"""Control-model config + re-exports (NoiseEstimator lives in unet.py)."""
from rdeic_tpu.models.unet import ControlModule, NoiseEstimator  # noqa: F401


class NoiseEstimatorConfig(dict):
    """Registry target for control_stage_config YAML nodes."""

    def __init__(self, **params):
        super().__init__(**params)
