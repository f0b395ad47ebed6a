"""Numerical parity vs the reference PyTorch modules (CPU torch).

Instantiates the reference UNetModel / VAE Encoder+Decoder at a small
GroupNorm-compatible width, converts their state dicts with our converter,
and checks the Flax forwards match within float32 tolerance. This validates
architecture AND converter mapping end to end (SURVEY.md §7 hard part 3).
"""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

# the reference imports omegaconf (ListConfig) and other heavy deps at
# import time; install the shared stub set (ref_stubs) rather than an
# ad-hoc one — a partial stub left in sys.modules here breaks the other
# parity test files collected after this one.
from ref_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax.traverse_util import flatten_dict, unflatten_dict  # noqa: E402

from rdeic_tpu.models.unet import UNetModel as JaxUNet  # noqa: E402
from rdeic_tpu.models.vae import AutoencoderKL as JaxVAE  # noqa: E402
from rdeic_tpu.utils.torch_convert import convert_state_dict  # noqa: E402

ATOL = 2e-4


def _to_nhwc(x):
    return np.transpose(x.detach().numpy(), (0, 2, 3, 1))


def _convert_subtree(sd, template_subtree, top_path, model_ns):
    template = unflatten_dict(
        {top_path + k: v for k, v in flatten_dict(template_subtree).items()}
    )
    params, missing = convert_state_dict(sd, template, model_ns)
    assert not missing, missing[:8]
    flat = flatten_dict(params)
    sub = {k[len(top_path):]: v for k, v in flat.items()}
    return unflatten_dict(sub)


@pytest.mark.slow
def test_unet_forward_parity():
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    torch.manual_seed(0)
    cfg = dict(
        in_channels=4, model_channels=64, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1, 2], channel_mult=[1, 2],
        num_head_channels=32, context_dim=64,
    )
    tnet = TorchUNet(
        image_size=32, use_spatial_transformer=True,
        use_linear_in_transformer=True, transformer_depth=1, legacy=False,
        **cfg,
    ).eval().float()

    jnet = JaxUNet(
        in_channels=4, model_channels=64, out_channels=4, num_res_blocks=1,
        attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_head_channels=32, context_dim=64,
    )
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 7, 64))
    template = jnet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]

    sd = {f"model.diffusion_model.{k}": v for k, v in tnet.state_dict().items()}
    model_ns = types.SimpleNamespace(denoiser=jnet)
    params = _convert_subtree(sd, template, ("denoiser", "base"), model_ns)

    rng = np.random.default_rng(1)
    xin = rng.normal(size=(1, 4, 8, 8)).astype("f4")
    cin = rng.normal(size=(1, 7, 64)).astype("f4")
    tin = np.array([250], dtype="i8")
    with torch.no_grad():
        tout = tnet(
            torch.from_numpy(xin), timesteps=torch.from_numpy(tin),
            context=torch.from_numpy(cin),
        )
    jout = jnet.apply(
        {"params": params},
        jnp.asarray(np.transpose(xin, (0, 2, 3, 1))),
        jnp.asarray(tin.astype("i4")),
        jnp.asarray(cin),
    )
    np.testing.assert_allclose(np.asarray(jout), _to_nhwc(tout), atol=ATOL)


@pytest.mark.slow
def test_vae_forward_parity():
    from ldm.modules.diffusionmodules.model import (
        Decoder as TorchDecoder,
        Encoder as TorchEncoder,
    )

    torch.manual_seed(1)
    dd = dict(ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=[],
              in_channels=3, resolution=64, z_channels=4, out_ch=3)
    tenc = TorchEncoder(double_z=True, **dd).eval().float()
    tdec = TorchDecoder(**dd).eval().float()
    tq = torch.nn.Conv2d(8, 8, 1)
    tpq = torch.nn.Conv2d(4, 4, 1)

    jvae = JaxVAE(embed_dim=4, ch=32, ch_mult=(1, 2), num_res_blocks=1)
    img = jnp.zeros((1, 16, 16, 3))
    template = jvae.init(jax.random.PRNGKey(0), img, jax.random.PRNGKey(1))[
        "params"
    ]
    sd = {f"first_stage_model.encoder.{k}": v for k, v in tenc.state_dict().items()}
    sd.update(
        {f"first_stage_model.decoder.{k}": v for k, v in tdec.state_dict().items()}
    )
    sd.update({f"first_stage_model.quant_conv.{k}": v for k, v in tq.state_dict().items()})
    sd.update(
        {f"first_stage_model.post_quant_conv.{k}": v for k, v in tpq.state_dict().items()}
    )
    model_ns = types.SimpleNamespace()
    params = _convert_subtree(sd, template, ("vae",), model_ns)

    rng = np.random.default_rng(2)
    xin = rng.normal(size=(1, 3, 16, 16)).astype("f4")
    with torch.no_grad():
        t_moments, t_feat = tenc.forward_hc(torch.from_numpy(xin))
        t_moments = tq(t_moments)
    mean, logvar, feat = jvae.apply(
        {"params": params},
        jnp.asarray(np.transpose(xin, (0, 2, 3, 1))),
        method=JaxVAE.encode_hc,
    )
    t_mean, t_logvar = torch.chunk(t_moments, 2, dim=1)
    np.testing.assert_allclose(np.asarray(mean), _to_nhwc(t_mean), atol=ATOL)
    np.testing.assert_allclose(np.asarray(feat), _to_nhwc(t_feat), atol=ATOL)

    zin = rng.normal(size=(1, 4, 8, 8)).astype("f4")
    with torch.no_grad():
        t_img = tdec(tpq(torch.from_numpy(zin)))
    j_img = jvae.apply(
        {"params": params},
        jnp.asarray(np.transpose(zin, (0, 2, 3, 1))),
        method=JaxVAE.decode,
    )
    np.testing.assert_allclose(np.asarray(j_img), _to_nhwc(t_img), atol=ATOL)
