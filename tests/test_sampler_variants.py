"""Sampler variant coefficient math (no model needed)."""
import numpy as np
import jax
import jax.numpy as jnp

from rdeic_tpu.diffusion.ddim import make_ddim_coefficients, sample as ddim_sample
from rdeic_tpu.diffusion.schedule import NoiseSchedule
from rdeic_tpu.diffusion.spaced import make_spaced_coefficients, sample as sp_sample


def _sched():
    return NoiseSchedule.create(timesteps=1000, linear_start=0.00085,
                                linear_end=0.0120)


def test_fixed_large_variance_differs():
    s = _sched()
    small = make_spaced_coefficients(s, 300, 5, var_type="fixed_small")
    large = make_spaced_coefficients(s, 300, 5, var_type="fixed_large")
    assert not np.allclose(
        np.asarray(small.sqrt_model_var), np.asarray(large.sqrt_model_var)
    )
    # first (highest-t) step of fixed_large uses beta, >= posterior variance
    assert float(large.sqrt_model_var[0]) >= float(small.sqrt_model_var[0])


def test_ddim_eta_zero_is_deterministic():
    s = _sched()
    c = make_ddim_coefficients(s, 300, 2, eta=0.0)
    np.testing.assert_allclose(np.asarray(c.sigmas), 0.0)

    def denoise(x, t):
        return 0.1 * x

    x = jnp.ones((1, 4, 4, 2))
    a = ddim_sample(denoise, x, jax.random.PRNGKey(0), c)
    b = ddim_sample(denoise, x, jax.random.PRNGKey(1), c)  # rng must not matter
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_ddim_eta_positive_is_stochastic():
    s = _sched()
    c = make_ddim_coefficients(s, 300, 2, eta=1.0)
    assert float(np.max(np.asarray(c.sigmas))) > 0

    def denoise(x, t):
        return 0.1 * x

    x = jnp.ones((1, 4, 4, 2))
    a = ddim_sample(denoise, x, jax.random.PRNGKey(0), c)
    b = ddim_sample(denoise, x, jax.random.PRNGKey(1), c)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_spaced_final_step_adds_no_noise():
    s = _sched()
    c = make_spaced_coefficients(s, 300, 2)
    assert float(c.nonzero[-1]) == 0.0  # t=0 step
    assert float(c.nonzero[0]) == 1.0

    def denoise(x, t):
        return jnp.zeros_like(x)

    x = jnp.ones((1, 4, 4, 2))
    a = sp_sample(denoise, x, jax.random.PRNGKey(0), c)
    b = sp_sample(denoise, x, jax.random.PRNGKey(0), c)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
