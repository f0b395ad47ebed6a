"""RDEIC-TPU: TPU-native relay-residual diffusion extreme image compression.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of the RDEIC
reference (relay residual diffusion extreme image compression, TCSVT 2024/25):

- Stable-Diffusion-2.1 VAE + UNet re-implemented in Flax (NHWC layout, bf16
  compute on MXU, Pallas flash attention).
- ControlNet-XS-style dual-UNet noise estimator with a 0.2-width control copy.
- Learned compression model with checkerboard + channel-slice autoregressive
  context entropy model and a real rANS bitstream (C++ host coder).
- Relay sampling: diffusion starts from the compressed latent noised to
  t = used_timesteps - 1, runs 2-5 spaced steps as a single jitted lax.scan.
- Data-parallel + tensor-parallel training/inference over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"

from rdeic_tpu.registry import instantiate_from_config, load_yaml  # noqa: E402,F401


def load_model(config_path: str):
    """Convenience: YAML path -> RDEIC instance."""
    return instantiate_from_config(load_yaml(config_path))
