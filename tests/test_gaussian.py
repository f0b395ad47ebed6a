import math

import jax
import jax.numpy as jnp
import numpy as np

from rdeic_tpu.ops import gaussian as g


def test_scale_table():
    t = g.get_scale_table()
    assert len(t) == 64
    assert np.isclose(t[0], 0.11)
    assert np.isclose(t[-1], 256.0)
    assert np.all(np.diff(np.log(t)) > 0)


def test_likelihood_matches_closed_form():
    x = jnp.array([0.2, -1.3, 4.0])
    scales = jnp.array([1.0, 0.5, 2.0])
    means = jnp.array([0.0, 0.0, 3.0])
    out, like = g.likelihood(x, scales, means, noisy=False)
    # hard rounding around the mean
    np.testing.assert_allclose(np.asarray(out), [0.0, -1.0, 4.0], atol=1e-6)
    # closed form: Phi((v+0.5)/s) - Phi((v-0.5)/s) with v = |round| residual
    def phi(z):
        return 0.5 * math.erfc(-z / math.sqrt(2))

    vals = [0.0, 1.0, 1.0]
    exp = [
        phi((0.5 - v) / s) - phi((-0.5 - v) / s)
        for v, s in zip(vals, [1.0, 0.5, 2.0])
    ]
    np.testing.assert_allclose(np.asarray(like), exp, rtol=1e-5)


def test_likelihood_lower_bound_and_scale_bound():
    x = jnp.array([100.0])
    out, like = g.likelihood(x, jnp.array([0.001]), jnp.array([0.0]), noisy=False)
    assert float(like[0]) >= g.LIKELIHOOD_BOUND * (1 - 1e-6)


def test_ste_round_gradient():
    grad = jax.grad(lambda x: jnp.sum(g.ste_round(x) ** 2))(jnp.array([1.3]))
    # d/dx (round(x)^2) with STE = 2*round(x)
    np.testing.assert_allclose(np.asarray(grad), [2.0], atol=1e-6)


def test_build_indexes():
    table = g.get_scale_table()
    scales = jnp.array([0.0, 0.11, 0.111, 1.0, 256.0, 999.0])
    idx = np.asarray(g.build_indexes(scales, table))
    assert idx[0] == 0 and idx[1] == 0
    assert idx[2] == 1  # just above the first level
    assert idx[4] == 63 and idx[5] == 63
    # invariant: table[idx] >= scale (after clamping into table range)
    for s, i in zip(np.asarray(scales), idx):
        assert table[i] >= min(max(s, 0.11), table[-1]) - 1e-9


def test_pmf_to_quantized_cdf_properties():
    pmf = np.array([0.5, 0.25, 0.125, 0.125, 1e-12])
    cdf = g.pmf_to_quantized_cdf(pmf)
    assert cdf[0] == 0 and cdf[-1] == 1 << g.CDF_PRECISION
    assert np.all(np.diff(cdf) >= 1)  # no zero-width symbols


def test_build_cdf_tables_shapes():
    table = g.get_scale_table()[:8]  # small for speed
    cdf, lengths, offsets = g.build_cdf_tables(table)
    assert cdf.shape[0] == 8
    for i in range(8):
        n = int(lengths[i])
        assert cdf[i, 0] == 0
        assert cdf[i, n - 1] == 1 << g.CDF_PRECISION
        assert np.all(np.diff(cdf[i, :n]) >= 1)
        assert offsets[i] <= 0


def test_noisy_likelihood_in_range():
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1000,))
    out, like = g.likelihood(x, jnp.ones((1000,)), jnp.zeros((1000,)), noisy=True, rng=rng)
    assert np.all(np.abs(np.asarray(out)) <= 0.5 + 1e-6)
    assert np.all(np.asarray(like) > 0) and np.all(np.asarray(like) <= 1)
