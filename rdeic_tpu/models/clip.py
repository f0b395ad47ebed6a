"""OpenCLIP ViT-H/14 text tower (Flax) + tokenizer utilities.

Capability parity: /root/reference/ldm/modules/encoders/modules.py:174-237
(FrozenOpenCLIPEmbedder, penultimate layer, 77 tokens -> [B, 77, 1024]).
The visual tower is never used by RDEIC and is not implemented.

The "penultimate" layer semantics: run all transformer blocks EXCEPT the
last, then apply the final LayerNorm.

Tokenization: the empty prompt (the only text RDEIC training/inference needs
by default) is [SOT, EOT, 0, ...]; full BPE tokenization for captions is
supported when a vocab file is supplied (gated — no network access).
"""
from __future__ import annotations

import gzip
import html
from functools import lru_cache
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SOT_TOKEN = 49406
EOT_TOKEN = 49407
VOCAB_SIZE = 49408
CONTEXT_LENGTH = 77


class TextTransformerBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        # pre-LN attention
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        d = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, l, _ = q.shape
        q = q.reshape(b, l, self.heads, d)
        k = k.reshape(b, l, self.heads, d)
        v = v.reshape(b, l, self.heads, d)
        # causal mask applied additively in fp32
        scale = d**-0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
        logits = logits + mask[None, None, :, :]
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, l, self.width)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)
        # MLP
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_fc")(h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x


class OpenCLIPTextEncoder(nn.Module):
    """Text tower returning the penultimate-layer hidden states."""

    width: int = 1024
    heads: int = 16
    layers: int = 24
    vocab_size: int = VOCAB_SIZE
    context_length: int = CONTEXT_LENGTH
    penultimate: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens: [B, 77] int32 -> [B, 77, width]."""
        tok_emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
        )
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = jnp.take(tok_emb, tokens, axis=0) + pos_emb[None]
        l = tokens.shape[1]
        mask = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)
        n_blocks = self.layers - 1 if self.penultimate else self.layers
        for i in range(n_blocks):
            x = TextTransformerBlock(
                self.width, self.heads, self.dtype, name=f"resblock_{i}"
            )(x, mask)
        return nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)


def tokenize_empty(batch: int = 1) -> np.ndarray:
    """Token ids for the empty prompt."""
    t = np.zeros((batch, CONTEXT_LENGTH), dtype=np.int32)
    t[:, 0] = SOT_TOKEN
    t[:, 1] = EOT_TOKEN
    return t


# ---------------------------------------------------------------------------
# BPE tokenizer (CLIP-style byte BPE). Needs a vocab file
# (bpe_simple_vocab_16e6.txt.gz); gated because there is no network access.
# ---------------------------------------------------------------------------
@lru_cache()
def _bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class SimpleTokenizer:
    """CLIP byte-BPE tokenizer (used only for caption conditioning)."""

    def __init__(self, bpe_path: str):
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = merges[1 : 49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges]
        self.byte_encoder = _bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for m in merges:
            vocab.append("".join(m))
        vocab.extend(["<start_of_text>", "<end_of_text>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {}

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(
                pairs, key=lambda p: self.bpe_ranks.get(p, float("inf"))
            )
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                if (
                    i < len(word) - 1
                    and word[i] == first
                    and word[i + 1] == second
                ):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> list[int]:
        import re  # noqa: PLC0415

        text = html.unescape(html.unescape(text)).strip().lower()
        # ASCII approximation of CLIP's unicode word pattern (\p classes
        # need the `regex` module, which is not installed)
        pat = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+")
        tokens = []
        for tok in re.findall(pat, text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            tokens.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return tokens

    def tokenize(self, texts, context_length: int = CONTEXT_LENGTH) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            toks = [SOT_TOKEN] + self.encode(text)[: context_length - 2] + [EOT_TOKEN]
            out[i, : len(toks)] = toks
        return out


class OpenCLIPTextConfig:
    """Registry target for the cond_stage_config YAML node."""

    def __init__(self, freeze: bool = True, layer: str = "penultimate", **kw):
        self.freeze = freeze
        self.penultimate = layer == "penultimate"

    def build(self) -> OpenCLIPTextEncoder:
        return OpenCLIPTextEncoder(penultimate=self.penultimate)
