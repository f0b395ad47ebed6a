"""Numerical parity vs the reference dual-UNet + compression torch modules.

Extends test_torch_parity.py (base UNet / VAE) to the remaining converter
surfaces flagged by round-1 review:
- NoiseEstimator: lock-step dual UNet incl. the enc/mid/dec zero-conv
  bridges (/root/reference/model/rdeic.py:38-235, zero-conv build 166-190)
  — zero convs are RANDOMIZED before conversion so a broken mapping cannot
  pass silently.
- Compression: encoder/decoder/hyper/VQ/context/entropy-parameter nets
  (/root/reference/model/compression.py:10-149).
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))
from ref_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax.traverse_util import flatten_dict, unflatten_dict  # noqa: E402

from rdeic_tpu.models.compression import CompressionModel as JaxCompression  # noqa: E402
from rdeic_tpu.models.unet import NoiseEstimator as JaxNoiseEstimator  # noqa: E402
from rdeic_tpu.utils.torch_convert import (  # noqa: E402
    convert_state_dict,
)

ATOL = 5e-4


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
def test_noise_estimator_forward_parity():
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet
    from model.rdeic import NoiseEstimator as TorchNE

    torch.manual_seed(0)
    common = dict(
        in_channels=4, model_channels=64, out_channels=4, num_res_blocks=1,
        attention_resolutions=[1, 2], channel_mult=[1, 2],
        num_head_channels=32, context_dim=64,
    )
    tbase = TorchUNet(
        image_size=32, use_spatial_transformer=True,
        use_linear_in_transformer=True, transformer_depth=1, legacy=False,
        **common,
    ).eval().float()
    tne = TorchNE(
        image_size=32, hint_channels=8, use_spatial_transformer=True,
        use_linear_in_transformer=True, transformer_depth=1, legacy=False,
        control_model_ratio=0.5, learn_embedding=True, control_scale=1.0,
        **common,
    ).eval().float()
    # zero convs are zero-init; randomize them so the converter mapping for
    # enc/mid/dec bridges is actually exercised (a wrong map would otherwise
    # still produce a matching output of zeros)
    gen = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for mod in (
            tne.enc_zero_convs_out, tne.dec_zero_convs_out, tne.middle_block_out
        ):
            for p in mod.parameters():
                p.copy_(torch.randn(p.shape, generator=gen) * 0.05)

    jnet = JaxNoiseEstimator(
        in_channels=4, model_channels=64, out_channels=4, hint_channels=8,
        num_res_blocks=1, attention_resolutions=(1, 2), channel_mult=(1, 2),
        num_head_channels=32, ctrl_num_head_channels=32, context_dim=64,
        control_model_ratio=0.5, control_scale=1.0,
    )
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 7, 64))
    hint = jnp.zeros((1, 8, 8, 8))
    template = jnet.init(jax.random.PRNGKey(0), x, t, ctx, hint)["params"]

    sd = {f"model.diffusion_model.{k}": v for k, v in tbase.state_dict().items()}
    sd.update({f"control_model.{k}": v for k, v in tne.state_dict().items()})
    model_ns = types.SimpleNamespace(denoiser=jnet)
    params = _convert_subtree(sd, template, ("denoiser",), model_ns)

    rng = np.random.default_rng(1)
    xin = rng.normal(size=(1, 4, 8, 8)).astype("f4")
    hintin = rng.normal(size=(1, 8, 8, 8)).astype("f4")
    cin = rng.normal(size=(1, 7, 64)).astype("f4")
    tin = np.array([250], dtype="i8")
    with torch.no_grad():
        tout = tne(
            torch.from_numpy(xin), torch.from_numpy(hintin),
            torch.from_numpy(tin), torch.from_numpy(cin), base_model=tbase,
        )
    jout = jnet.apply(
        {"params": params},
        jnp.asarray(np.transpose(xin, (0, 2, 3, 1))),
        jnp.asarray(tin.astype("i4")),
        jnp.asarray(cin),
        jnp.asarray(np.transpose(hintin, (0, 2, 3, 1))),
    )
    np.testing.assert_allclose(np.asarray(jout), _to_nhwc(tout), atol=ATOL)

    # CFG unconditional branch: base UNet alone (rdeic.py:214-235)
    with torch.no_grad():
        tout_u = tne.forward_unconditional(
            torch.from_numpy(xin), torch.from_numpy(tin),
            torch.from_numpy(cin), base_model=tbase,
        )
    jout_u = jnet.apply(
        {"params": params},
        jnp.asarray(np.transpose(xin, (0, 2, 3, 1))),
        jnp.asarray(tin.astype("i4")),
        jnp.asarray(cin),
        method=JaxNoiseEstimator.forward_unconditional,
    )
    np.testing.assert_allclose(np.asarray(jout_u), _to_nhwc(tout_u), atol=ATOL)


@pytest.mark.slow
def test_compression_forward_parity():
    from model.compression import Compression as TorchCompression

    torch.manual_seed(2)
    kw = dict(in_nc=8, out_nc=4, N=8, M=8, slice_num=2, slice_ch=[4, 4],
              codebook_size=32)
    tc = TorchCompression(**kw).eval().float()

    jc = JaxCompression(
        in_nc=8, out_nc=4, N=8, M=8, slice_num=2, slice_ch=(4, 4),
        codebook_size=32,
    )
    x0 = jnp.zeros((1, 16, 16, 8))
    template = jc.init(
        {"params": jax.random.PRNGKey(0)}, x0, rng=jax.random.PRNGKey(1)
    )["params"]

    sd = {f"preprocess_model.{k}": v for k, v in tc.state_dict().items()}
    model_ns = types.SimpleNamespace()
    params = _convert_subtree(sd, template, ("compression",), model_ns)

    rng = np.random.default_rng(3)
    xin = (rng.normal(size=(1, 8, 16, 16)) * 2).astype("f4")
    x_nhwc = jnp.asarray(np.transpose(xin, (0, 2, 3, 1)))

    # granular: analysis + hyper chain
    with torch.no_grad():
        ty = tc.encoder(torch.from_numpy(xin))
        tz = tc.hyper_enc(ty)
        tz_q, _, _ = tc.quantize(tz)
        thyper = tc.hyper_dec(tz_q)
    jy, jz = jc.apply({"params": params}, x_nhwc, method=JaxCompression.analyze)
    np.testing.assert_allclose(np.asarray(jy), _to_nhwc(ty), atol=ATOL)
    np.testing.assert_allclose(np.asarray(jz), _to_nhwc(tz), atol=ATOL)
    jz_q, j_idx = jc.apply({"params": params}, jz, method=JaxCompression.vq_quant)
    np.testing.assert_allclose(np.asarray(jz_q), _to_nhwc(tz_q), atol=ATOL)
    jhyper = jc.apply(
        {"params": params}, jz_q, method=JaxCompression.hyper_decode
    )
    np.testing.assert_allclose(np.asarray(jhyper), _to_nhwc(thyper), atol=ATOL)

    # full forward: c_latent + guide_hint through the slice loop + synthesis
    with torch.no_grad():
        t_out, _, _, _, t_guide = tc(torch.from_numpy(xin))
    j = jc.apply({"params": params}, x_nhwc, training=False)
    np.testing.assert_allclose(
        np.asarray(j["guide_hint"]), _to_nhwc(t_guide), atol=ATOL
    )
    np.testing.assert_allclose(
        np.asarray(j["c_latent"]), _to_nhwc(t_out), atol=ATOL
    )
