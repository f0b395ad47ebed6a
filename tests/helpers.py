"""Micro model configs shared across tests (sized for 1-core XLA-CPU)."""
from rdeic_tpu.pipeline.rdeic import RDEIC


def micro_rdeic(is_refine: bool = False, **overrides) -> RDEIC:
    """A tiny but structurally complete RDEIC instance.

    32x32 images, /2 VAE (latent 16x16, feature 16ch), 2-slice compression,
    2-level UNet with attention at ds=2, 0.5-width control copy.
    """
    return RDEIC(
        control_stage_config=dict(
            params=dict(
                in_channels=4, out_channels=4, hint_channels=8,
                model_channels=16, num_res_blocks=1,
                attention_resolutions=[2], channel_mult=[1, 2],
                num_head_channels=8, context_dim=16,
                control_model_ratio=0.5, control_scale=1.0,
            )
        ),
        unet_config=dict(params=dict(num_head_channels=8)),
        first_stage_config=dict(
            params=dict(
                embed_dim=4,
                ddconfig=dict(ch=8, ch_mult=[1, 2], num_res_blocks=1),
            )
        ),
        preprocess_config=dict(
            params=dict(
                in_nc=16, out_nc=4, N=8, M=8, slice_num=2, slice_ch=[4, 4],
                codebook_size=32,
            )
        ),
        is_refine=is_refine,
        fixed_step=2,
        **overrides,
        used_timesteps=300,
        timesteps=1000,
    )
