"""Schedule math vs independently-computed golden constants.

Golden values are hand-derived from the published DDPM/guided-diffusion
formulas with the RDEIC config (linear_start=0.00085, linear_end=0.0120,
timesteps=1000, used_timesteps=300).
"""
import numpy as np
import jax.numpy as jnp

from rdeic_tpu.diffusion.schedule import (
    NoiseSchedule,
    make_beta_schedule,
    space_timesteps,
    spaced_schedule,
)


def test_linear_betas_endpoints():
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    assert betas.dtype == np.float64
    assert np.isclose(betas[0], 0.00085)
    assert np.isclose(betas[-1], 0.0120)
    # interior: squares of linspace of sqrt-betas
    sq = np.linspace(0.00085**0.5, 0.0120**0.5, 1000) ** 2
    np.testing.assert_allclose(betas, sq, rtol=0, atol=0)


def test_derived_tables_consistency():
    s = NoiseSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.0120)
    acp = s.table("alphas_cumprod")
    assert acp.shape == (1000,)
    assert np.all(np.diff(acp) < 0)
    np.testing.assert_allclose(
        s.table("sqrt_recipm1_alphas_cumprod"), np.sqrt(1 / acp - 1)
    )
    # posterior mean coefs sum: coef1 + coef2 * sqrt(acp_t/acp_{t-1}) should
    # reconstruct x0=xt case: check identity posterior_mean(x,x,t) ~ x for t
    # where noise is tiny (t=0).
    pm1 = s.table("posterior_mean_coef1")[0]
    pm2 = s.table("posterior_mean_coef2")[0]
    assert np.isclose(pm1 + pm2 * np.sqrt(1 - s.betas[0]), 1.0, atol=1e-6)


def test_lambda_relay_constant():
    # lamba = sqrt_recipm1_alphas_cumprod[299] (rdeic.py:649) — check the
    # value is sane and matches a direct recompute.
    s = NoiseSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.0120)
    acp = np.cumprod(1 - s.betas)
    lam = np.sqrt(1 / acp[299] - 1)
    assert np.isclose(s.table("sqrt_recipm1_alphas_cumprod")[299], lam)


def test_space_timesteps_two_steps():
    # 2-step relay over 300 used timesteps must select {0, 299}
    assert space_timesteps(300, "2") == {0, 299}
    assert space_timesteps(300, 5) == {0, 75, 150, 224, 299}


def test_spaced_schedule_marginals_match():
    base = NoiseSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.0120)
    sub, timesteps = spaced_schedule(base, used_timesteps=300, num_steps=5)
    # marginal alphas_cumprod at the kept steps must match the base process
    base_acp = base.table("alphas_cumprod")
    np.testing.assert_allclose(
        sub.table("alphas_cumprod"), base_acp[timesteps], rtol=1e-12
    )
    assert list(timesteps) == sorted(space_timesteps(300, 5))


def test_q_sample_roundtrip():
    s = NoiseSchedule.create(timesteps=1000)
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.full((2, 4, 4, 3), 0.5)
    t = jnp.array([299, 0])
    xt = s.q_sample(x0, t, noise)
    eps_back = s.predict_eps_from_xstart(xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_back), 0.5, atol=1e-4)
    x0_back = s.predict_xstart_from_eps(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_back), 1.0, atol=1e-4)


def test_get_v_matches_reference_formula():
    """get_v (reference ldm ddpm.py:371-375):
    v = sqrt(acp[t]) * noise - sqrt(1-acp[t]) * x, and the algebraic
    inverse sqrt(acp)*x_t - sqrt(1-acp)*v recovers x0 exactly."""
    s = NoiseSchedule.create(timesteps=1000, linear_start=0.00085, linear_end=0.0120)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    t = jnp.array([299, 7])
    v = np.asarray(s.get_v(x0, noise, t))
    sa = s.table("sqrt_alphas_cumprod")[np.asarray(t)][:, None, None, None]
    s1 = s.table("sqrt_one_minus_alphas_cumprod")[np.asarray(t)][:, None, None, None]
    np.testing.assert_allclose(
        v, sa * np.asarray(noise) - s1 * np.asarray(x0), rtol=1e-5, atol=1e-6
    )
    xt = np.asarray(s.q_sample(x0, t, noise))
    np.testing.assert_allclose(
        sa * xt - s1 * v, np.asarray(x0), rtol=1e-4, atol=1e-5
    )
