"""RDEIC task model: the central orchestrator.

Capability parity: /root/reference/model/rdeic.py:600-991 (RDEIC
LightningModule) — owns the dual-UNet denoiser, the compression model, the
frozen VAE + text conditioning, the relay sampling logic, and both training
losses. Re-designed functionally for JAX: the model holds static configs +
module definitions; all state lives in an explicit params pytree; every hot
path is a cached jitted function.

Key relay mechanics preserved (model/rdeic.py:649,740-761,788-881):
- lamba = sqrt_recipm1_alphas_cumprod[used_timesteps - 1]
- inference starts from q_sample(c_latent, t=used_timesteps-1)
- independent phase: noise target shifted by (c_latent - x_start)/lamba,
  loss on predicted x0 vs x_start (+ guide/bpp/emb terms)
- refine phase: backprop through the fixed_step sampler and the VAE decoder
  with MSE + 0.5*LPIPS (+ guide/bpp/emb terms)
"""
from __future__ import annotations

import math
from functools import partial
from pathlib import Path
from typing import Any, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rdeic_tpu.diffusion import ddim as ddim_lib
from rdeic_tpu.diffusion import spaced as spaced_lib
from rdeic_tpu.diffusion.schedule import NoiseSchedule
from rdeic_tpu.models.clip import OpenCLIPTextEncoder
from rdeic_tpu.models.compression import CompressionModel
from rdeic_tpu.models.lpips import LPIPS
from rdeic_tpu.models.unet import NoiseEstimator
from rdeic_tpu.models.vae import AutoencoderKL, sample_diagonal_gaussian
from rdeic_tpu.pipeline.codec import CompressionCodec
from rdeic_tpu.utils.bitstream import filesize, read_body, write_body


def _cfg_params(cfg: Optional[Mapping[str, Any]]) -> dict:
    if cfg is None:
        return {}
    if "params" in cfg or "target" in cfg:
        return dict(cfg.get("params") or {})
    return dict(cfg)


class RDEIC:
    """Relay-residual diffusion extreme image compression (TPU-native)."""

    def __init__(
        self,
        control_stage_config: Optional[Mapping] = None,
        unet_config: Optional[Mapping] = None,
        first_stage_config: Optional[Mapping] = None,
        cond_stage_config: Optional[Mapping] = None,
        preprocess_config: Optional[Mapping] = None,
        calculate_metrics: Optional[Mapping] = None,
        sd_locked: bool = True,
        is_refine: bool = False,
        fixed_step: int = 2,
        scan_remat: bool = False,
        learning_rate: float = 2e-5,
        l_bpp_weight: float = 1.0,
        l_guide_weight: float = 2.0,
        used_timesteps: int = 300,
        timesteps: int = 1000,
        linear_start: float = 0.00085,
        linear_end: float = 0.0120,
        scale_factor: float = 0.18215,
        parameterization: str = "eps",
        sync_path: Optional[str] = None,
        synch_control: bool = False,
        ckpt_path_pre: Optional[str] = None,
        dtype=jnp.float32,
        **_: Any,
    ):
        ctrl = _cfg_params(control_stage_config)
        unet = _cfg_params(unet_config)
        vae_cfg = _cfg_params(first_stage_config)
        comp = _cfg_params(preprocess_config)

        self.schedule = NoiseSchedule.create(
            timesteps=timesteps,
            beta_schedule="linear",
            linear_start=linear_start,
            linear_end=linear_end,
        )
        self.used_timesteps = used_timesteps
        self.fixed_step = fixed_step
        # per-step remat of the refine-phase sampler scan (spaced.sample
        # remat_steps): backward holds one step's UNet activations instead
        # of fixed_step sets — sweep axis for the refine recipe
        self.scan_remat = scan_remat
        self.is_refine = is_refine
        self.sd_locked = sd_locked
        self.learning_rate = learning_rate
        self.l_bpp_weight = l_bpp_weight
        self.l_guide_weight = l_guide_weight
        self.scale_factor = scale_factor
        self.parameterization = parameterization
        self.calculate_metrics = calculate_metrics or {}
        self.sync_path = sync_path
        self.synch_control = synch_control
        self.ckpt_path_pre = ckpt_path_pre
        # residual relay shift (rdeic.py:649)
        self.lamba = float(
            self.schedule.table("sqrt_recipm1_alphas_cumprod")[used_timesteps - 1]
        )

        mc = ctrl.get("model_channels", 320)
        self.denoiser = NoiseEstimator(
            in_channels=ctrl.get("in_channels", 4),
            model_channels=mc,
            out_channels=ctrl.get("out_channels", 4),
            hint_channels=ctrl.get("hint_channels", 256),
            num_res_blocks=ctrl.get("num_res_blocks", 2),
            attention_resolutions=tuple(ctrl.get("attention_resolutions", (4, 2, 1))),
            channel_mult=tuple(ctrl.get("channel_mult", (1, 2, 4, 4))),
            num_head_channels=unet.get("num_head_channels", 64),
            ctrl_num_head_channels=ctrl.get("num_head_channels", 16),
            context_dim=ctrl.get("context_dim", 1024),
            control_model_ratio=ctrl.get("control_model_ratio", 0.2),
            control_scale=ctrl.get("control_scale", 1.0),
            use_checkpoint=bool(ctrl.get("use_checkpoint", False)),
            remat_policy=ctrl.get("remat_policy", unet.get("remat_policy")),
            dtype=dtype,
        )
        dd = vae_cfg.get("ddconfig", {})
        self.vae = AutoencoderKL(
            embed_dim=vae_cfg.get("embed_dim", 4),
            ch=dd.get("ch", 128),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            use_checkpoint=bool(vae_cfg.get("use_checkpoint", False)),
        )
        self.compression = CompressionModel(
            in_nc=comp.get("in_nc", 512),
            out_nc=comp.get("out_nc", 4),
            N=comp.get("N", 256),
            M=comp.get("M", 256),
            slice_num=comp.get("slice_num", 10),
            slice_ch=tuple(comp.get("slice_ch", (8, 8, 8, 8, 16, 16, 32, 32, 64, 64))),
            codebook_size=comp.get("codebook_size", 16384),
        )
        self.clip = OpenCLIPTextEncoder(
            width=ctrl.get("context_dim", 1024),
            penultimate=_cfg_params(cond_stage_config).get("layer", "penultimate")
            == "penultimate",
        )
        self.lpips = LPIPS(net="alex")

        self.channels = ctrl.get("in_channels", 4)
        self._codec: Optional[CompressionCodec] = None
        self._codec_src = None
        self._jit_cache: dict = {}

    def set_compute_dtype(self, dtype) -> None:
        """Switch the denoiser's compute dtype (params stay fp32).

        bf16 is the TPU-native inference precision (the reference's analog
        is the optional fp16 autocast, inference_partition.py:283-291);
        GroupNorm/softmax stay fp32 inside the modules.
        """
        self.denoiser = self.denoiser.clone(dtype=dtype)
        self.vae = self.vae.clone(dtype=dtype)
        self._jit_cache.clear()

    @staticmethod
    def cast_inference_params(params, dtype=jnp.bfloat16):
        """Cast the diffusion/VAE weights to `dtype` for inference storage.

        Halves the HBM footprint of the 1.25B frozen/denoiser weights
        (~5.2 GB fp32 -> 2.6 GB bf16 at full width), which is what bounds
        the decode-scan batch size on a 16 GB chip. The compression subtree
        stays fp32: its outputs parameterize the entropy coder and the
        bitstream format is pinned fp32 (tests/test_golden_bitstream.py).
        """
        out = dict(params)
        for key in ("vae", "denoiser", "uncond_context", "clip", "lpips"):
            if key in out:
                out[key] = jax.tree_util.tree_map(
                    lambda x: x.astype(dtype)
                    if jnp.issubdtype(x.dtype, jnp.floating)
                    else x,
                    out[key],
                )
        return out

    # ------------------------------------------------------------------
    # initialization
    # ------------------------------------------------------------------
    def init_params(
        self,
        rng: jax.Array,
        image_hw: tuple[int, int] = (256, 256),
        include_clip: bool = False,
        include_lpips: bool = None,
    ) -> dict:
        """Random-init all parameter trees (tests / training from scratch)."""
        h, w = image_hw
        factor = 2 ** (len(self.vae.ch_mult) - 1)
        lh, lw = h // factor, w // factor
        ks = jax.random.split(rng, 6)
        img = jnp.zeros((1, h, w, 3))
        vae_params = self.vae.init(ks[0], img, ks[5])["params"]
        feat = jnp.zeros((1, lh, lw, self.compression.in_nc))
        comp_params = self.compression.init(
            {"params": ks[1]}, feat, rng=ks[4]
        )["params"]
        x = jnp.zeros((1, lh, lw, self.channels))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, 77, self.denoiser.context_dim))
        hint = jnp.zeros((1, lh, lw, self.denoiser.hint_channels))
        den_params = self.denoiser.init(ks[2], x, t, ctx, hint)["params"]
        params = {
            "vae": vae_params,
            "compression": comp_params,
            "denoiser": den_params,
            "uncond_context": jnp.zeros((1, 77, self.denoiser.context_dim)),
            "vq_embed_prob": jnp.zeros((self.compression.codebook_size,)),
        }
        if include_clip:
            tokens = jnp.zeros((1, 77), jnp.int32)
            params["clip"] = self.clip.init(ks[3], tokens)["params"]
        if include_lpips is None:
            include_lpips = self.is_refine
        if include_lpips:
            from rdeic_tpu.models.lpips import warn_random_backbone  # noqa: PLC0415

            warn_random_backbone("RDEIC.init_params")
            probe = jnp.zeros((1, 64, 64, 3))
            params["lpips"] = self.lpips.init(ks[3], probe, probe)["params"]
        return params

    # ------------------------------------------------------------------
    # first stage / conditioning
    # ------------------------------------------------------------------
    def encode_first_stage(self, params, img, rng=None):
        """img in [-1,1] NHWC -> (z latent sampled*scale, feature h*scale).

        Parity: ddpm.py:777-833 get_input + get_first_stage_encoding.
        rng=None uses the posterior mean (deterministic eval).
        """
        mean, logvar, h = self.vae.apply(
            {"params": params["vae"]}, img, method=AutoencoderKL.encode_hc
        )
        z = mean if rng is None else sample_diagonal_gaussian(rng, mean, logvar)
        return z * self.scale_factor, h * self.scale_factor

    def decode_first_stage(self, params, z):
        return self.vae.apply(
            {"params": params["vae"]}, z / self.scale_factor,
            method=AutoencoderKL.decode,
        )

    def get_learned_conditioning(self, params, texts_tokens=None, batch: int = 1):
        """Context embedding: CLIP(tokens) if available, else the stored
        empty-prompt embedding tiled to the batch."""
        if texts_tokens is not None and "clip" in params:
            return self.clip.apply({"params": params["clip"]}, texts_tokens)
        return jnp.tile(params["uncond_context"], (batch, 1, 1))

    # ------------------------------------------------------------------
    # denoiser
    # ------------------------------------------------------------------
    def apply_model(self, params, x_noisy, t, context, guide_hint):
        return self.denoiser.apply(
            {"params": params["denoiser"]}, x_noisy, t, context, guide_hint
        )

    def apply_model_unconditional(self, params, x_noisy, t, context):
        return self.denoiser.apply(
            {"params": params["denoiser"]}, x_noisy, t, context,
            method=NoiseEstimator.forward_unconditional,
        )

    # ------------------------------------------------------------------
    # training losses (pure; jit/grad-safe)
    # ------------------------------------------------------------------
    def get_input(self, params, img, rng, training: bool = True):
        """img in [-1,1] -> (x_start z, cond dict). Parity: rdeic.py:678-686."""
        rng_z, rng_like = jax.random.split(rng)
        z, h = self.encode_first_stage(params, img, rng_z if training else None)
        # the reference detaches the frozen first-stage outputs
        # (ddpm.py:788-789) — no gradient flows into the VAE encoder
        z = jax.lax.stop_gradient(z)
        h = jax.lax.stop_gradient(h)
        comp_out = self.compression.apply(
            {"params": params["compression"]}, h, rng=rng_like, training=training
        )
        n, lh, lw, _ = z.shape
        num_pixels = n * lh * lw * 64
        bpp = jnp.sum(jnp.log(comp_out["y_likelihoods"])) / (
            -math.log(2) * num_pixels
        )
        q_bpp = jnp.sum(jnp.log(comp_out["q_likelihoods"])) / (
            -math.log(2) * num_pixels
        )
        context = self.get_learned_conditioning(params, batch=n)
        cond = dict(
            c_crossattn=context,
            c_latent=comp_out["c_latent"],
            guide_hint=comp_out["guide_hint"],
            bpp=bpp,
            q_bpp=q_bpp,
            emb_loss=comp_out["emb_loss"],
            target=img,
            z_hyper=comp_out["z"],
            vq_indices=comp_out["vq_indices"],
        )
        return z, cond

    def p_losses_independent(self, params, z_start, cond, t, rng):
        """Single-step noise loss with the residual relay shift.

        Parity: rdeic.py:794-835.
        """
        c_latent = cond["c_latent"]
        eps = jax.random.normal(rng, z_start.shape, z_start.dtype)
        noise = eps + (c_latent - z_start) / self.lamba
        x_noisy = self.schedule.q_sample(z_start, t, noise)
        model_out = self.apply_model(
            params, x_noisy, t, cond["c_crossattn"], cond["guide_hint"]
        )
        # parity rdeic.py:799-807: "eps" converts the model output to a
        # pred-x0 and regresses x_start; "x0" regresses x_start directly;
        # "v" regresses get_v(x_start, noise, t) against the raw output
        # (note `noise` here includes the relay shift, as in the reference)
        if self.parameterization == "eps":
            pred = self.schedule.predict_xstart_from_eps(x_noisy, t, model_out)
            target = z_start
        elif self.parameterization == "x0":
            pred, target = model_out, z_start
        elif self.parameterization == "v":
            pred, target = model_out, self.schedule.get_v(z_start, noise, t)
        else:
            raise NotImplementedError(self.parameterization)
        loss_simple = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
        loss = self.l_guide_weight * jnp.mean(loss_simple)
        loss_guide = jnp.mean((c_latent - z_start) ** 2)
        loss = loss + self.l_guide_weight * loss_guide
        loss = loss + self.l_bpp_weight * cond["bpp"]
        loss = loss + self.l_bpp_weight * cond["emb_loss"]
        logs = dict(
            l_simple=jnp.mean(loss_simple),
            l_guide=loss_guide,
            l_bpp=cond["bpp"],
            q_bpp=cond["q_bpp"],
            l_emb=cond["emb_loss"],
            loss=loss,
        )
        return loss, logs

    def p_losses_refine(self, params, z_start, cond, rng):
        """Backprop through the fixed_step sampler + VAE decoder.

        Parity: rdeic.py:837-879 (including the reference's overwrite of the
        latent-MSE term by the pixel-MSE term — the actual objective is
        pixel MSE + 0.5*LPIPS + guide + bpp + emb).
        """
        c_latent = cond["c_latent"]
        b = z_start.shape[0]
        rng_noise, rng_sample = jax.random.split(rng)
        t = jnp.full((b,), self.used_timesteps - 1, jnp.int32)
        noise = jax.random.normal(rng_noise, c_latent.shape, c_latent.dtype)
        x_T = self.schedule.q_sample(c_latent, t, noise)

        coeffs = spaced_lib.make_spaced_coefficients(
            self.schedule, self.used_timesteps, self.fixed_step
        )

        def denoise(x, tt):
            return self.apply_model(
                params, x, tt, cond["c_crossattn"], cond["guide_hint"]
            )

        samples = spaced_lib.sample(
            denoise, x_T, rng_sample, coeffs, remat_steps=self.scan_remat
        )
        decoded = self.decode_first_stage(params, samples)
        target = cond["target"]

        loss_simple = jnp.mean((samples - z_start) ** 2, axis=(1, 2, 3))
        loss_mse = jnp.mean((decoded - target) ** 2, axis=(1, 2, 3))
        loss = self.l_guide_weight * jnp.mean(loss_mse)
        loss_lpips = jnp.mean(
            self.lpips.apply({"params": params["lpips"]}, decoded, target)
        )
        loss = loss + self.l_guide_weight * loss_lpips * 0.5
        loss_guide = jnp.mean((c_latent - z_start) ** 2)
        loss = loss + self.l_guide_weight * loss_guide
        loss = loss + self.l_bpp_weight * cond["bpp"]
        loss = loss + self.l_bpp_weight * cond["emb_loss"]
        logs = dict(
            l_simple=jnp.mean(loss_simple),
            l_mse=jnp.mean(loss_mse),
            l_lpips=loss_lpips,
            l_guide=loss_guide,
            l_bpp=cond["bpp"],
            q_bpp=cond["q_bpp"],
            l_emb=cond["emb_loss"],
            loss=loss,
        )
        return loss, logs

    def loss_fn(self, params, img, rng):
        """Full forward + loss for one batch of [-1,1] images."""
        rng_in, rng_t, rng_loss = jax.random.split(rng, 3)
        z, cond = self.get_input(params, img, rng_in, training=True)
        if self.is_refine:
            loss, logs = self.p_losses_refine(params, z, cond, rng_loss)
        else:
            t = jax.random.randint(
                rng_t, (img.shape[0],), 0, self.used_timesteps
            )
            loss, logs = self.p_losses_independent(params, z, cond, t, rng_loss)
        # hyper latent for the trainer's CVQ codebook maintenance
        logs["_z_hyper"] = jax.lax.stop_gradient(cond["z_hyper"])
        return loss, logs

    # ------------------------------------------------------------------
    # sampling / inference
    # ------------------------------------------------------------------
    def relay_init(self, c_latent, rng):
        """x_T = q_sample(c_latent, t=used_timesteps-1). rdeic.py:740-748."""
        b = c_latent.shape[0]
        t = jnp.full((b,), self.used_timesteps - 1, jnp.int32)
        noise = jax.random.normal(rng, c_latent.shape, c_latent.dtype)
        return self.schedule.q_sample(c_latent, t, noise)

    def sample(
        self,
        params,
        c_latent,
        guide_hint,
        context,
        rng,
        steps: int,
        sampler: str = "ddpm",
        guidance_scale: float = 1.0,
        uncond_context=None,
    ):
        """Relay sampling from the compressed latent -> denoised latent."""
        rng_init, rng_loop = jax.random.split(rng)
        x_T = self.relay_init(c_latent, rng_init)

        def denoise(x, t):
            return self.apply_model(params, x, t, context, guide_hint)

        uncond_fn = None
        if guidance_scale != 1.0:
            uctx = uncond_context if uncond_context is not None else context

            def uncond_fn(x, t):  # noqa: F811
                return self.apply_model_unconditional(params, x, t, uctx)

        if sampler == "ddpm":
            coeffs = spaced_lib.make_spaced_coefficients(
                self.schedule, self.used_timesteps, steps
            )
            return spaced_lib.sample(
                denoise, x_T, rng_loop, coeffs,
                uncond_fn=uncond_fn, guidance_scale=guidance_scale,
            )
        if sampler == "ddim":
            coeffs = ddim_lib.make_ddim_coefficients(
                self.schedule, self.used_timesteps, steps
            )
            return ddim_lib.sample(
                denoise, x_T, rng_loop, coeffs,
                uncond_fn=uncond_fn, guidance_scale=guidance_scale,
            )
        raise ValueError(f"unknown sampler {sampler!r}")

    def decode_pipeline(
        self, params, c_latent, guide_hint, rng, steps: int,
        sampler: str = "ddpm", guidance_scale: float = 1.0, context=None,
    ):
        """c_latent/guide_hint -> RGB in [0,1]; single jittable program."""
        if context is None:
            context = self.get_learned_conditioning(
                params, batch=c_latent.shape[0]
            )
        samples = self.sample(
            params, c_latent, guide_hint, context, rng, steps,
            sampler=sampler, guidance_scale=guidance_scale,
        )
        img = self.decode_first_stage(params, samples)
        return jnp.clip((img + 1) / 2, 0.0, 1.0)

    def jitted_decode(self, steps: int, sampler: str = "ddpm",
                      guidance_scale: float = 1.0):
        key = ("decode", steps, sampler, guidance_scale)
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(
                partial(
                    self.decode_pipeline, steps=steps, sampler=sampler,
                    guidance_scale=guidance_scale,
                )
            )
        return self._jit_cache[key]

    def decode_batched(
        self, params, c_latent, guide_hint, rng, steps: int,
        sampler: str = "ddpm", guidance_scale: float = 1.0,
        micro: int | None = None,
    ):
        """Batched decode with a bounded-activation relay scan.

        The entropy programs amortize dispatch over the FULL batch, but the
        relay scan's activations OOM past B~24 at 768x512 on one v5e (HLO
        temp copy). Splitting the scan into `micro`-image chunks keeps one
        compiled shape, queues the chunks back-to-back via async dispatch,
        and caps scan memory at the micro size — so the codec batch can
        grow past the scan ceiling. A ragged tail is padded to `micro`
        (no recompile) and sliced off.
        """
        b = c_latent.shape[0]
        if micro is None or micro >= b:
            return self.jitted_decode(steps, sampler, guidance_scale)(
                params, c_latent, guide_hint, rng
            )
        fn = self.jitted_decode(steps, sampler, guidance_scale)
        pad = (-b) % micro
        if pad:
            c_latent = jnp.concatenate([c_latent, c_latent[:pad]], axis=0)
            guide_hint = jnp.concatenate([guide_hint, guide_hint[:pad]], axis=0)
        outs = []
        for k in range(0, b + pad, micro):
            rng, sub = jax.random.split(rng)
            outs.append(
                fn(params, c_latent[k:k + micro], guide_hint[k:k + micro], sub)
            )
        return jnp.concatenate(outs, axis=0)[:b]

    # ------------------------------------------------------------------
    # real bitstream paths
    # ------------------------------------------------------------------
    def codec(self, params) -> CompressionCodec:
        # Cache on the COMPRESSION subtree identity, not the whole params
        # pytree: train steps produce fresh outer dicts every step, but
        # frozen-compression eval keeps the same subtree object — rebuilding
        # CdfTable + re-jitting 20+ pass programs there is a latency trap.
        comp = params["compression"]
        if self._codec is None or self._codec_src is not comp:
            self._codec_src = comp
            import os  # noqa: PLC0415

            from rdeic_tpu.pipeline.codec import host_callbacks_supported

            fused = (
                os.environ.get("RDEIC_FUSED_CODEC", "1") == "1"
                and host_callbacks_supported()
            )
            # RDEIC_RANS_LANES > 0: interleaved-lane streams decoded fully
            # on device (entropy/device_rans.py) — zero mid-chain host
            # round trips; costs ~4*lanes bytes/stream of rate
            lanes = int(os.environ.get("RDEIC_RANS_LANES", "0"))
            self._codec = CompressionCodec(
                self.compression, {"params": params["compression"]},
                fused=fused, lanes=lanes,
            )
        return self._codec

    def _jitted_feature(self):
        if "feature" not in self._jit_cache:

            def feat(params, img01):
                _, h = self.encode_first_stage(params, img01 * 2 - 1, rng=None)
                return h

            self._jit_cache["feature"] = jax.jit(feat)
        return self._jit_cache["feature"]

    def apply_condition_compress(self, params, img01, stream_path, H, W):
        """img01: [1,H,W,3] in [0,1] -> bitstream file; returns real bpp.

        Parity: rdeic.py:659-669.
        """
        h = self._jitted_feature()(params, img01)
        out = self.codec(params).compress(h)
        with Path(stream_path).open("wb") as f:
            write_body(f, out["shape"], out["strings"])
        return filesize(stream_path) * 8.0 / (H * W)

    def apply_condition_decompress(self, params, stream_path):
        with Path(stream_path).open("rb") as f:
            strings, shape = read_body(f)
        return self.codec(params).decompress(strings, shape)

    # ---- batched bitstream paths (one entropy-program run for B images) --
    def apply_condition_compress_batch(self, params, imgs01, stream_paths):
        """imgs01: [B, H, W, 3] (same padded size) -> per-image files + bpps."""
        h = self._jitted_feature()(params, imgs01)
        outs = self.codec(params).compress_batch(h)
        bpps = []
        H, W = imgs01.shape[1:3]
        for out, path in zip(outs, stream_paths):
            with Path(path).open("wb") as f:
                write_body(f, out["shape"], out["strings"])
            bpps.append(filesize(path) * 8.0 / (H * W))
        return bpps

    def apply_condition_decompress_batch(self, params, stream_paths):
        outs = []
        for path in stream_paths:
            with Path(path).open("rb") as f:
                strings, shape = read_body(f)
            outs.append({"strings": strings, "shape": shape})
        return self.codec(params).decompress_batch(outs)
