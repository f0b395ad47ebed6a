"""Checkerboard anchor/non-anchor ops in NHWC layout.

Behavioral parity: /root/reference/utils/ckbd.py:6-115 (NCHW torch slicing).
Anchor = positions (even row, odd col) + (odd row, even col); non-anchor is
the complement. "Squeeze" packs the active half of the checkerboard into a
dense [B, H, W//2, C] tensor so the entropy coder never touches inactive
symbols; "unsqueeze" is the exact inverse.

TPU design notes: everything here is static strided slicing + masking —
no scatters, no dynamic shapes — so XLA fuses these into neighbouring convs.
NHWC keeps the channel dim on the 128-wide lane axis.
"""
from __future__ import annotations

import jax.numpy as jnp


def _checkerboard_mask(h: int, w: int, anchor: bool) -> jnp.ndarray:
    """[H, W, 1] float mask; anchor=True marks (r+c) odd positions."""
    r = jnp.arange(h).reshape(h, 1)
    c = jnp.arange(w).reshape(1, w)
    parity = (r + c) % 2  # 1 at (even,odd)+(odd,even) = anchor
    mask = parity if anchor else 1 - parity
    return mask[..., None]


def ckbd_anchor(y: jnp.ndarray) -> jnp.ndarray:
    """Zero out non-anchor positions. y: [B, H, W, C]."""
    _, h, w, _ = y.shape
    return y * _checkerboard_mask(h, w, anchor=True).astype(y.dtype)


def ckbd_nonanchor(y: jnp.ndarray) -> jnp.ndarray:
    """Zero out anchor positions. y: [B, H, W, C]."""
    _, h, w, _ = y.shape
    return y * _checkerboard_mask(h, w, anchor=False).astype(y.dtype)


def ckbd_split(y: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    return ckbd_anchor(y), ckbd_nonanchor(y)


def ckbd_merge(anchor: jnp.ndarray, nonanchor: jnp.ndarray) -> jnp.ndarray:
    return anchor + nonanchor


def ckbd_anchor_squeeze(y: jnp.ndarray) -> jnp.ndarray:
    """Pack anchor positions into [B, H, W//2, C].

    Even rows keep odd columns; odd rows keep even columns.
    """
    even_rows = y[:, 0::2, 1::2, :]
    odd_rows = y[:, 1::2, 0::2, :]
    return _interleave_rows(even_rows, odd_rows, y.shape)


def ckbd_nonanchor_squeeze(y: jnp.ndarray) -> jnp.ndarray:
    """Pack non-anchor positions into [B, H, W//2, C].

    Even rows keep even columns; odd rows keep odd columns.
    """
    even_rows = y[:, 0::2, 0::2, :]
    odd_rows = y[:, 1::2, 1::2, :]
    return _interleave_rows(even_rows, odd_rows, y.shape)


def _interleave_rows(even_rows, odd_rows, full_shape):
    b, h, _, c = full_shape
    w2 = even_rows.shape[2]
    # Stack even/odd rows then interleave along a new axis: result row r of the
    # output comes from even_rows[r//2] if r even else odd_rows[r//2].
    stacked = jnp.stack([even_rows, odd_rows], axis=2)  # [B, H//2, 2, W//2, C]
    return stacked.reshape(b, h, w2, c)


def ckbd_anchor_unsqueeze(anchor: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ckbd_anchor_squeeze: [B, H, W2, C] -> [B, H, 2*W2, C]."""
    b, h, w2, c = anchor.shape
    rows = anchor.reshape(b, h // 2, 2, w2, c)
    even_rows, odd_rows = rows[:, :, 0], rows[:, :, 1]
    out = jnp.zeros((b, h, 2 * w2, c), anchor.dtype)
    out = out.at[:, 0::2, 1::2, :].set(even_rows)
    out = out.at[:, 1::2, 0::2, :].set(odd_rows)
    return out


def ckbd_nonanchor_unsqueeze(nonanchor: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ckbd_nonanchor_squeeze."""
    b, h, w2, c = nonanchor.shape
    rows = nonanchor.reshape(b, h // 2, 2, w2, c)
    even_rows, odd_rows = rows[:, :, 0], rows[:, :, 1]
    out = jnp.zeros((b, h, 2 * w2, c), nonanchor.dtype)
    out = out.at[:, 0::2, 0::2, :].set(even_rows)
    out = out.at[:, 1::2, 1::2, :].set(odd_rows)
    return out
