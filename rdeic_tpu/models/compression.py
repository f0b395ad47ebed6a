"""Learned compression model (Flax, NHWC).

Capability parity with the reference compression core:
- architecture: /root/reference/model/compression.py:10-50 and
  model/compression_modules.py (Encoder/Decoder/Hyper nets, CVQ-VAE
  VectorQuantiser, ChannelContextEX, EntropyParametersEX) and
  model/layers/res_blk.py (residual conv blocks).
- training forward with STE quantization and two likelihood sets
  (noise-based and round-based): model/compression.py:52-149.
- granular per-slice methods used by both the encode and decode paths so the
  entropy-parameter computation is bit-identical on both sides (the
  reference forces cudnn determinism for the same reason,
  model/compression.py:156,209).

TPU design: NHWC + channel-last slices; the 10-slice x anchor/nonanchor
structure is a static Python loop of dense convs (XLA unrolls and fuses);
the VQ nearest-neighbour search is one [B*h*w, N] x [N, K] matmul on the MXU.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from rdeic_tpu.ops import ckbd
from rdeic_tpu.ops import gaussian as g
from rdeic_tpu.models.blocks import Conv, gelu_exact, leaky_relu, pixel_shuffle


class ResidualBlock(nn.Module):
    """Two 3x3 convs + LeakyReLU(0.01), 1x1 adaptor when channels change."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        identity = x
        if x.shape[-1] != self.out_ch:
            identity = Conv(self.out_ch, kernel=1, name="adaptor")(x)
        h = Conv(self.out_ch, kernel=3, name="conv1")(x)
        h = leaky_relu(h, 0.01)
        h = Conv(self.out_ch, kernel=3, name="conv2")(h)
        h = leaky_relu(h, 0.01)
        return h + identity


class ResidualBlockWithStride(nn.Module):
    """Stride-2 residual downsampling block."""

    out_ch: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        h = Conv(self.out_ch, kernel=3, stride=self.stride, name="conv1")(x)
        h = leaky_relu(h, 0.01)
        h = Conv(self.out_ch, kernel=3, name="conv2")(h)
        h = leaky_relu(h, 0.1)
        identity = Conv(self.out_ch, kernel=1, stride=self.stride, name="downsample")(x)
        return h + identity


class ResidualBlockUpsample(nn.Module):
    """Sub-pixel (1x1 conv + depth-to-space) residual upsampling block."""

    out_ch: int
    upsample: int = 2

    @nn.compact
    def __call__(self, x):
        r = self.upsample
        h = Conv(self.out_ch * r * r, kernel=1, name="subpel_conv")(x)
        h = pixel_shuffle(h, r)
        h = leaky_relu(h, 0.01)
        h = Conv(self.out_ch, kernel=3, name="conv")(h)
        h = leaky_relu(h, 0.1)
        identity = pixel_shuffle(Conv(self.out_ch * r * r, kernel=1, name="upsample")(x), r)
        return h + identity


class AnalysisTransform(nn.Module):
    """g_a: 512-ch VAE feature -> y latent, one stride-2 (64x64 -> 32x32)."""

    M: int

    @nn.compact
    def __call__(self, x):
        h = ResidualBlock(self.M)(x)
        h = ResidualBlock(self.M)(h)
        h = ResidualBlock(self.M)(h)
        h = ResidualBlock(self.M)(h)
        h = ResidualBlockWithStride(self.M)(h)
        h = ResidualBlock(self.M)(h)
        h = ResidualBlock(self.M)(h)
        h = ResidualBlock(self.M)(h)
        return Conv(self.M, kernel=3, name="conv_out")(h)


class SynthesisTransform(nn.Module):
    """g_s: y_hat -> guide_hint feature, one x2 upsample (32x32 -> 64x64)."""

    M: int

    @nn.compact
    def __call__(self, y):
        h = Conv(self.M, kernel=3, name="conv_in")(y)
        h = ResidualBlock(self.M)(h)
        h = ResidualBlock(self.M)(h)
        h = ResidualBlock(self.M)(h)
        h = ResidualBlockUpsample(self.M)(h)
        h = ResidualBlock(self.M)(h)
        h = ResidualBlock(self.M)(h)
        h = ResidualBlock(self.M)(h)
        return ResidualBlock(self.M)(h)


class HyperEncoder(nn.Module):
    N: int

    @nn.compact
    def __call__(self, y):
        h = ResidualBlock(self.N)(y)
        h = ResidualBlock(self.N)(h)
        h = ResidualBlockWithStride(self.N)(h)
        return ResidualBlockWithStride(self.N)(h)


class HyperDecoder(nn.Module):
    M: int

    @nn.compact
    def __call__(self, z):
        h = ResidualBlockUpsample(self.M)(z)
        h = ResidualBlockUpsample(self.M)(h)
        h = ResidualBlock(self.M * 3 // 2)(h)
        return ResidualBlock(self.M * 2)(h)


class ChannelContextEX(nn.Module):
    """5x5-conv fusion of previously decoded slices -> per-slice context."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        h = Conv(224, kernel=5, name="conv1")(x)
        h = gelu_exact(h)
        h = Conv(128, kernel=5, name="conv2")(h)
        h = gelu_exact(h)
        return Conv(self.out_dim, kernel=5, name="conv3")(h)


class EntropyParametersEX(nn.Module):
    """1x1-conv fusion producing per-slice (scales, means)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        h = Conv(self.out_dim * 5 // 3, kernel=1, name="conv1")(x)
        h = gelu_exact(h)
        h = Conv(self.out_dim * 4 // 3, kernel=1, name="conv2")(h)
        h = gelu_exact(h)
        return Conv(self.out_dim, kernel=1, name="conv3")(h)


def vq_logits(z_flat: jnp.ndarray, embedding: jnp.ndarray) -> jnp.ndarray:
    """Negative squared L2 distance (argmax == nearest code).

    One MXU matmul: [n, D] x [D, K].
    """
    ez = jnp.matmul(z_flat, embedding.T, precision=jax.lax.Precision.HIGHEST)
    return (
        2.0 * ez
        - jnp.sum(embedding**2, axis=-1)[None, :]
        - jnp.sum(z_flat**2, axis=-1, keepdims=True)
    )


def vq_codebook_update(
    embedding: jnp.ndarray,
    embed_prob: jnp.ndarray,
    z_flat: jnp.ndarray,
    decay: float = 0.99,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """CVQ-VAE 'closest'-anchor dead-code reinitialisation (pure function).

    Parity: /root/reference/model/compression_modules.py:272-296 — EMA of
    per-code usage, then every step pull each code towards its closest input
    feature with a strength that decays as the code gets used.
    Applied by the trainer after the optimizer step.
    """
    d = vq_logits(jax.lax.stop_gradient(z_flat), embedding)  # [n, K]
    onehot = jax.nn.one_hot(jnp.argmax(d, axis=1), embedding.shape[0])
    avg_probs = jnp.mean(onehot, axis=0)
    new_prob = embed_prob * decay + avg_probs * (1 - decay)
    closest = jnp.argmax(d, axis=0)  # for each code, nearest input row
    random_feat = z_flat[closest]
    alpha = jnp.exp(
        -(new_prob * embedding.shape[0] * 10) / (1 - decay) - 1e-3
    )[:, None]
    new_embedding = embedding * (1 - alpha) + random_feat * alpha
    return new_embedding, new_prob


class VectorQuantiser(nn.Module):
    """CVQ-VAE vector quantizer over the hyper latent z.

    Training loss = commitment + codebook + contrastive terms
    (parity: model/compression_modules.py:228-307). The codebook
    reinitialisation is applied separately via `vq_codebook_update`.
    """

    num_embed: int
    embed_dim: int
    beta: float = 0.25
    contras_loss: bool = True

    def setup(self):
        self.embedding = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / self.num_embed, 1.0 / self.num_embed
            ),
            (self.num_embed, self.embed_dim),
        )

    def __call__(self, z: jnp.ndarray, training: bool = True):
        """z: [B, h, w, D]. Returns (z_q, loss, indices [B, h, w])."""
        b, h, w, d = z.shape
        z_flat = z.reshape(-1, d)
        logits = vq_logits(jax.lax.stop_gradient(z_flat), self.embedding)
        indices = jnp.argmax(logits, axis=1)
        z_q = jnp.take(self.embedding, indices, axis=0).reshape(z.shape)

        loss = jnp.zeros((), z.dtype)
        if training:
            loss = self.beta * jnp.mean(
                (jax.lax.stop_gradient(z_q) - z) ** 2
            ) + jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
            if self.contras_loss:
                loss = loss + self._contrastive(logits)
            z_q = z + jax.lax.stop_gradient(z_q - z)  # STE
        return z_q, loss, indices.reshape(b, h, w)

    def _contrastive(self, logits: jnp.ndarray) -> jnp.ndarray:
        # logits: [n, K] (larger = closer). Positive = mean of the n_pos
        # closest inputs per code; negatives = the farthest half. Uses
        # top_k partial selection instead of a full column sort — the
        # [B*hw, 16384] sort was ~15% of the full-width train step on the
        # v5e, and softmax is order-invariant so only the selected VALUES
        # matter (identical to the sort formulation, incl. gradients).
        n = logits.shape[0]
        lt = logits.T  # [K, n]
        n_pos = max(1, n // self.num_embed)
        top, _ = jax.lax.top_k(lt, n_pos)  # largest n_pos per code
        dis_pos = jnp.mean(top, axis=1, keepdims=True)  # [K, 1]
        neg, _ = jax.lax.top_k(-lt, n // 2)  # smallest n/2 per code
        dis_neg = -neg  # [K, n/2]
        dis = jnp.concatenate([dis_pos, dis_neg], axis=1) / 0.07
        logz = jax.nn.log_softmax(dis, axis=1)
        return -jnp.mean(logz[:, 0])

    def quant(self, z: jnp.ndarray):
        """Inference-path quantization: (z_q, indices)."""
        b, h, w, d = z.shape
        logits = vq_logits(z.reshape(-1, d), self.embedding)
        indices = jnp.argmax(logits, axis=1)
        z_q = jnp.take(self.embedding, indices, axis=0).reshape(z.shape)
        return z_q, indices.reshape(b, h, w)

    def lookup(self, indices: jnp.ndarray) -> jnp.ndarray:
        """indices: [B, h, w] -> z_q [B, h, w, D]."""
        return jnp.take(self.embedding, indices.reshape(-1), axis=0).reshape(
            indices.shape + (self.embed_dim,)
        )


class CompressionModel(nn.Module):
    """Checkerboard + channel-slice autoregressive compression model."""

    in_nc: int = 512
    out_nc: int = 4
    N: int = 256
    M: int = 256
    slice_num: int = 10
    slice_ch: Sequence[int] = (8, 8, 8, 8, 16, 16, 32, 32, 64, 64)
    codebook_size: int = 16384

    def setup(self):
        assert sum(self.slice_ch) == self.M
        self.encoder = AnalysisTransform(self.M, name="encoder")
        self.hyper_enc = HyperEncoder(self.N, name="hyper_enc")
        self.hyper_dec = HyperDecoder(self.M, name="hyper_dec")
        self.decoder = SynthesisTransform(self.M, name="decoder")
        self.out = Conv(self.out_nc, kernel=3, name="out")
        self.quantize = VectorQuantiser(
            self.codebook_size, self.N, contras_loss=True, name="quantize"
        )
        self.local_context = [
            Conv(2 * c, kernel=5, name=f"local_context_{i}")
            for i, c in enumerate(self.slice_ch)
        ]
        self.channel_context = [
            ChannelContextEX(2 * c, name=f"channel_context_{i}") if i else None
            for i, c in enumerate(self.slice_ch)
        ]
        self.entropy_parameters_anchor = [
            EntropyParametersEX(2 * c, name=f"ep_anchor_{i}")
            for i, c in enumerate(self.slice_ch)
        ]
        self.entropy_parameters_nonanchor = [
            EntropyParametersEX(2 * c, name=f"ep_nonanchor_{i}")
            for i, c in enumerate(self.slice_ch)
        ]

    # ------------------------------------------------------------------
    # granular methods (shared by encode and decode for bit-determinism)
    # ------------------------------------------------------------------
    def analyze(self, x):
        """x: [B, H, W, in_nc] -> (y, z)."""
        y = self.encoder(x)
        z = self.hyper_enc(y)
        return y, z

    def vq_quant(self, z):
        return self.quantize.quant(z)

    def vq_lookup(self, indices):
        return self.quantize.lookup(indices)

    def hyper_decode(self, z_q):
        return self.hyper_dec(z_q)

    def params_anchor(self, idx: int, hyper_params, y_hat_prev):
        """(scales, means, channel_ctx) for slice `idx`'s anchor half.

        y_hat_prev: concat of previously decoded slices (None for idx 0).
        """
        if idx == 0:
            params = self.entropy_parameters_anchor[0](hyper_params)
            channel_ctx = None
        else:
            channel_ctx = self.channel_context[idx](y_hat_prev)
            params = self.entropy_parameters_anchor[idx](
                jnp.concatenate([channel_ctx, hyper_params], axis=-1)
            )
        scales, means = jnp.split(params, 2, axis=-1)
        return scales, means, channel_ctx

    def params_nonanchor(self, idx: int, hyper_params, channel_ctx, slice_anchor):
        """(scales, means) for slice `idx`'s non-anchor half given the
        dequantized anchor half (checkerboard local context)."""
        local_ctx = self.local_context[idx](slice_anchor)
        if idx == 0:
            inp = jnp.concatenate([local_ctx, hyper_params], axis=-1)
        else:
            inp = jnp.concatenate([local_ctx, channel_ctx, hyper_params], axis=-1)
        params = self.entropy_parameters_nonanchor[idx](inp)
        scales, means = jnp.split(params, 2, axis=-1)
        return scales, means

    def synthesize(self, y_hat):
        """y_hat -> (c_latent [B,2h,2w,out_nc], guide_hint [B,2h,2w,M])."""
        guide_hint = self.decoder(y_hat)
        return self.out(guide_hint), guide_hint

    # ------------------------------------------------------------------
    # training forward
    # ------------------------------------------------------------------
    def __call__(self, x, rng=None, training: bool = True):
        """Full rate-estimation forward.

        Returns dict with c_latent, guide_hint, y_likelihoods, q_likelihoods,
        emb_loss, z (hyper latent), vq_indices.
        """
        y, z = self.analyze(x)
        z_q, emb_loss, vq_indices = self.quantize(z, training=training)
        hyper_params = self.hyper_decode(z_q)

        splits = []
        acc = 0
        for c in self.slice_ch[:-1]:
            acc += c
            splits.append(acc)
        y_slices = jnp.split(y, splits, axis=-1)

        y_hat_slices = []
        y_likelihoods = []
        q_likelihoods = []
        for idx, y_slice in enumerate(y_slices):
            slice_anchor, slice_nonanchor = ckbd.ckbd_split(y_slice)
            y_hat_prev = (
                jnp.concatenate(y_hat_slices, axis=-1) if idx else None
            )
            scales_a, means_a, channel_ctx = self.params_anchor(
                idx, hyper_params, y_hat_prev
            )
            scales_a = ckbd.ckbd_anchor(scales_a)
            means_a = ckbd.ckbd_anchor(means_a)
            slice_anchor = g.ste_round(slice_anchor - means_a) + means_a

            scales_na, means_na = self.params_nonanchor(
                idx, hyper_params, channel_ctx, slice_anchor
            )
            scales_na = ckbd.ckbd_nonanchor(scales_na)
            means_na = ckbd.ckbd_nonanchor(means_na)
            scales_slice = ckbd.ckbd_merge(scales_a, scales_na)
            means_slice = ckbd.ckbd_merge(means_a, means_na)

            if training:
                rng, sub = jax.random.split(rng)
                _, y_like = g.likelihood(
                    y_slice, scales_slice, means_slice, noisy=True, rng=sub
                )
            else:
                _, y_like = g.likelihood(
                    y_slice, scales_slice, means_slice, noisy=False
                )
            _, q_like = g.likelihood(y_slice, scales_slice, means_slice, noisy=False)

            slice_nonanchor = g.ste_round(slice_nonanchor - means_na) + means_na
            y_hat_slices.append(slice_anchor + slice_nonanchor)
            y_likelihoods.append(y_like)
            q_likelihoods.append(q_like)

        y_hat = jnp.concatenate(y_hat_slices, axis=-1)
        c_latent, guide_hint = self.synthesize(y_hat)
        return dict(
            c_latent=c_latent,
            guide_hint=guide_hint,
            y_likelihoods=jnp.concatenate(y_likelihoods, axis=-1),
            q_likelihoods=jnp.concatenate(q_likelihoods, axis=-1),
            emb_loss=emb_loss,
            z=z,
            vq_indices=vq_indices,
        )


class CompressionConfig(dict):
    """Registry target for preprocess_config YAML nodes."""

    def __init__(self, **params):
        super().__init__(**params)
