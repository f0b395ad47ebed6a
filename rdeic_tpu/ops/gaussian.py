"""Conditional Gaussian entropy model math (JAX) + quantized CDF tables.

Behavioral parity targets:
- Gaussian likelihood / STE rounding / scale-table indexing as used by
  /root/reference/model/compression.py:50,89-135 (via compressai's
  GaussianConditional; formulas are from Balle et al., "Variational image
  compression with a scale hyperprior", and are re-derived here).
- 64-level log-spaced scale table [0.11, 256]:
  /root/reference/utils/func.py:10-12.
- CDF table construction for the range coder mirrors the *contract* of
  compressai's update(): per scale level a symmetric integer PMF with
  tail_mass 1e-9, quantized to 16-bit precision with no zero-width symbols.

The likelihood math runs on TPU in float32. CDF tables are built host-side
in float64 once per model (they depend only on the scale table).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

SCALE_BOUND = 0.11
LIKELIHOOD_BOUND = 1e-9
CDF_PRECISION = 16
TAIL_MASS = 1e-9


def get_scale_table(
    minimum: float = SCALE_BOUND, maximum: float = 256.0, levels: int = 64
) -> np.ndarray:
    return np.exp(np.linspace(math.log(minimum), math.log(maximum), levels))


# ---------------------------------------------------------------------------
# Lower bound with the compressai-style gradient: grad passes through when the
# input is above the bound OR when the incoming gradient pushes it down.
# ---------------------------------------------------------------------------
@jax.custom_vjp
def lower_bound(x, bound):
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lb_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lb_fwd, _lb_bwd)


def ste_round(x: jnp.ndarray) -> jnp.ndarray:
    """Round with a straight-through (identity) gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def _std_cumulative(x: jnp.ndarray) -> jnp.ndarray:
    """Standard normal CDF via erfc: 0.5 * erfc(-x / sqrt(2))."""
    return 0.5 * jax.lax.erfc(-x * (2**-0.5))


def likelihood(
    inputs: jnp.ndarray,
    scales: jnp.ndarray,
    means: jnp.ndarray | None = None,
    *,
    noisy: bool,
    rng: jax.Array | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(quantized outputs, per-symbol likelihood) of a conditional Gaussian.

    noisy=True adds U(-0.5, 0.5) noise (training surrogate); noisy=False uses
    hard rounding around the mean. Likelihood is P(round(x-mu) +- 0.5) under
    N(mu, scale^2), lower-bounded at 1e-9.
    """
    if noisy:
        if rng is None:
            raise ValueError("noisy likelihood requires an rng key")
        noise = jax.random.uniform(rng, inputs.shape, inputs.dtype, -0.5, 0.5)
        outputs = inputs + noise
    else:
        if means is not None:
            outputs = ste_round(inputs - means) + means
        else:
            outputs = ste_round(inputs)

    scales = lower_bound(scales, SCALE_BOUND)
    values = outputs - means if means is not None else outputs
    values = jnp.abs(values)
    upper = _std_cumulative((0.5 - values) / scales)
    lower = _std_cumulative((-0.5 - values) / scales)
    like = lower_bound(upper - lower, LIKELIHOOD_BOUND)
    return outputs, like


def quantize_symbols(
    inputs: jnp.ndarray, means: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Integer symbols for entropy coding: round(x - mu)."""
    if means is not None:
        inputs = inputs - means
    return jnp.round(inputs).astype(jnp.int32)


def dequantize(symbols: jnp.ndarray, means: jnp.ndarray | None = None):
    out = symbols.astype(jnp.float32)
    return out + means if means is not None else out


def build_indexes(scales: jnp.ndarray, scale_table: np.ndarray) -> jnp.ndarray:
    """Index of the smallest table entry >= scale (after lower-bounding)."""
    scales = jnp.maximum(scales, float(scale_table[0]))
    table = jnp.asarray(scale_table[:-1], dtype=scales.dtype)
    # index = #entries strictly below scale
    return jnp.sum(
        scales[..., None] > table, axis=-1
    ).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Host-side quantized CDF construction (float64 numpy; once per model).
# ---------------------------------------------------------------------------
def _std_quantile(q: float) -> float:
    """Inverse standard normal CDF by bisection on erfc (float64)."""
    lo, hi = -40.0, 40.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if 0.5 * math.erfc(-mid / math.sqrt(2)) < q:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def pmf_to_quantized_cdf(pmf: np.ndarray, precision: int = CDF_PRECISION):
    """Quantize a PMF (with tail mass appended as the last entry) to an
    integer CDF summing to 2**precision, with every symbol width >= 1.

    Returns int32 array of length len(pmf) + 1 with cdf[0] = 0.
    """
    pmf = np.asarray(pmf, dtype=np.float64)
    if np.any(pmf < 0) or not np.all(np.isfinite(pmf)):
        raise ValueError("invalid pmf")
    total = 1 << precision
    freqs = np.maximum(1, np.round(pmf / max(pmf.sum(), 1e-300) * total)).astype(
        np.int64
    )
    # Rebalance so freqs sum to `total`, stealing from/adding to largest bins
    # (largest bins suffer the least relative rate loss).
    diff = int(freqs.sum()) - total
    while diff != 0:
        order = np.argsort(-freqs)
        for i in order:
            if diff == 0:
                break
            if diff > 0 and freqs[i] > 1:
                take = min(diff, int(freqs[i]) - 1)
                freqs[i] -= take
                diff -= take
            elif diff < 0:
                freqs[i] += -diff
                diff = 0
    cdf = np.zeros(len(pmf) + 1, dtype=np.int32)
    np.cumsum(freqs, out=cdf[1:])
    assert cdf[-1] == total
    return cdf


def build_cdf_tables(scale_table: np.ndarray, precision: int = CDF_PRECISION):
    """Per-scale quantized CDFs for the range coder.

    Returns (quantized_cdf int32 [L, max_len], cdf_length int32 [L],
    offset int32 [L]). Symbol s for level l covers value s + offset[l];
    the last in-range symbol index is cdf_length[l] - 2 and doubles as the
    bypass escape symbol.
    """
    scale_table = np.asarray(scale_table, dtype=np.float64)
    multiplier = -_std_quantile(TAIL_MASS / 2)
    pmf_center = np.ceil(scale_table * multiplier).astype(np.int64)
    pmf_length = 2 * pmf_center + 1
    max_length = int(pmf_length.max())

    samples = np.abs(
        np.arange(max_length, dtype=np.float64)[None, :] - pmf_center[:, None]
    )
    scales = scale_table[:, None]

    def cum(x):
        from scipy.special import erfc as _erfc  # noqa: PLC0415

        return 0.5 * _erfc(-x / math.sqrt(2))

    try:
        upper = cum((0.5 - samples) / scales)
        lower = cum((-0.5 - samples) / scales)
    except ImportError:  # pragma: no cover - scipy is available in this env
        vec_erfc = np.vectorize(math.erfc)
        upper = 0.5 * vec_erfc(-((0.5 - samples) / scales) / math.sqrt(2))
        lower = 0.5 * vec_erfc(-((-0.5 - samples) / scales) / math.sqrt(2))
    pmf = upper - lower
    tail = 2 * lower[:, :1]

    num = len(scale_table)
    cdf_length = (pmf_length + 2).astype(np.int32)
    quantized = np.zeros((num, max_length + 2), dtype=np.int32)
    for i in range(num):
        n = int(pmf_length[i])
        prob = np.concatenate([pmf[i, :n], tail[i]])
        cdf = pmf_to_quantized_cdf(prob, precision)
        quantized[i, : len(cdf)] = cdf
    offset = (-pmf_center).astype(np.int32)
    return quantized, cdf_length, offset
