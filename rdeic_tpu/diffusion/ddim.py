"""Relay DDIM sampler as a single `lax.scan`.

Behavioral parity: /root/reference/model/ddim_sampler_relay.py — uniform DDIM
striding over the first `used_timesteps` (=300) of the FULL 1000-step
alphas_cumprod, with the guided-diffusion +1 timestep shift
(ldm/modules/diffusionmodules/util.py:53-82), eta-parameterized update.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rdeic_tpu.diffusion.schedule import NoiseSchedule


class DDIMCoefficients(NamedTuple):
    timesteps: jnp.ndarray  # [S] int32, descending (includes +1 shift)
    sqrt_alphas: jnp.ndarray  # [S] sqrt(a_t)
    sqrt_one_minus_alphas: jnp.ndarray  # [S]
    sqrt_alphas_prev: jnp.ndarray  # [S]
    dir_coef: jnp.ndarray  # [S] sqrt(1 - a_prev - sigma^2)
    sigmas: jnp.ndarray  # [S]

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def make_ddim_coefficients(
    base: NoiseSchedule, used_timesteps: int, num_steps: int, eta: float = 0.0
) -> DDIMCoefficients:
    stride = used_timesteps // num_steps
    ts = np.arange(0, used_timesteps, stride)  # ascending, len >= num_steps
    acp = base.table("alphas_cumprod")
    # the +1 shift applies to the ALPHA GATHERS too, not just the model
    # call (ldm util make_ddim_timesteps: steps_out = ddim_timesteps + 1,
    # consumed by make_ddim_sampling_parameters: alphas = alphacums[steps])
    # — round-5 fix found by the torch-parity test for the DDIM extras
    ts_shifted = ts + 1
    alphas = acp[ts_shifted]
    alphas_prev = np.concatenate([[float(acp[0])], acp[ts_shifted[:-1]]])
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    order = np.arange(len(ts))[::-1]
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    return DDIMCoefficients(
        timesteps=jnp.asarray(ts_shifted[order], jnp.int32),
        sqrt_alphas=f32(np.sqrt(alphas[order])),
        sqrt_one_minus_alphas=f32(np.sqrt(1 - alphas[order])),
        sqrt_alphas_prev=f32(np.sqrt(alphas_prev[order])),
        dir_coef=f32(np.sqrt(np.maximum(1 - alphas_prev[order] - sigmas[order] ** 2, 0))),
        sigmas=f32(sigmas[order]),
    )


def sample(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_T: jnp.ndarray,
    rng: jax.Array,
    coeffs: DDIMCoefficients,
    *,
    uncond_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
    guidance_scale: float = 1.0,
) -> jnp.ndarray:
    b = x_T.shape[0]

    def step(carry, per):
        x, rng = carry
        rng, key = jax.random.split(rng)
        t = jnp.full((b,), per.timesteps, jnp.int32)
        eps = denoise_fn(x, t)
        if uncond_fn is not None and guidance_scale != 1.0:
            eps_u = uncond_fn(x, t)
            eps = eps_u + guidance_scale * (eps - eps_u)
        x0 = (x - per.sqrt_one_minus_alphas * eps) / per.sqrt_alphas
        dir_xt = per.dir_coef * eps
        noise = per.sigmas * jax.random.normal(key, x.shape, x.dtype)
        x = per.sqrt_alphas_prev * x0 + dir_xt + noise
        return (x, rng), None

    (x, _), _ = jax.lax.scan(step, (x_T, rng), coeffs)
    return x


# ---------------------------------------------------------------------------
# DDIM extras: encode / stochastic_encode / decode
# (parity: /root/reference/model/ddim_sampler_relay.py:233-316 — unused by
# any reference CLI or shipped config, rebuilt for API completeness)
# ---------------------------------------------------------------------------


class DDIMEncodeCoefficients(NamedTuple):
    """Per-step weights for the deterministic DDIM inversion scan."""

    t_index: jnp.ndarray  # [S] int32 — the LOOP INDEX (see encode note)
    xt_w: jnp.ndarray     # [S] sqrt(a_next / a)
    eps_w: jnp.ndarray    # [S] sqrt(a_next) * (sqrt(1/a_next-1) - sqrt(1/a-1))


def make_ddim_encode_coefficients(
    base: NoiseSchedule, used_timesteps: int, num_steps: int
) -> DDIMEncodeCoefficients:
    """Ascending-order inversion tables (reference encode():242-247:
    alphas_next = ddim_alphas[:n], alphas = ddim_alphas_prev[:n])."""
    stride = used_timesteps // num_steps
    ts = np.arange(0, used_timesteps, stride)[:num_steps] + 1  # ldm +1 shift
    acp = base.table("alphas_cumprod")
    a_next = acp[ts]
    a = np.concatenate([[float(acp[0])], acp[ts[:-1]]])
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    return DDIMEncodeCoefficients(
        t_index=jnp.arange(len(ts), dtype=jnp.int32),
        xt_w=f32(np.sqrt(a_next / a)),
        eps_w=f32(np.sqrt(a_next)
                  * (np.sqrt(1.0 / a_next - 1.0) - np.sqrt(1.0 / a - 1.0))),
    )


def encode(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    coeffs: DDIMEncodeCoefficients,
    *,
    uncond_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
    guidance_scale: float = 1.0,
) -> jnp.ndarray:
    """Deterministic DDIM inversion x0 -> x_{t_enc} as one lax.scan.

    Reference quirk reproduced deliberately: the model is called with the
    LOOP INDEX as the timestep (ddim_sampler_relay.py:252 `t = full(i)`),
    not the ddim timestep — inherited LDM behavior, kept for parity.
    """
    b = x0.shape[0]

    def step(x, per):
        t = jnp.full((b,), per.t_index, jnp.int32)
        eps = denoise_fn(x, t)
        if uncond_fn is not None and guidance_scale != 1.0:
            eps_u = uncond_fn(x, t)
            eps = eps_u + guidance_scale * (eps - eps_u)
        return per.xt_w * x + per.eps_w * eps, None

    x, _ = jax.lax.scan(step, x0, coeffs)
    return x


def stochastic_encode(
    base: NoiseSchedule,
    used_timesteps: int,
    num_steps: int,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    use_original_steps: bool = False,
) -> jnp.ndarray:
    """q_sample against the DDIM alpha sub-table (reference :281-296).

    `t` indexes ddim steps (or raw timesteps with use_original_steps)."""
    if use_original_steps:
        sqrt_a = base.table("sqrt_alphas_cumprod")
        sqrt_1ma = base.table("sqrt_one_minus_alphas_cumprod")
    else:
        stride = used_timesteps // num_steps
        ts = np.arange(0, used_timesteps, stride)[:num_steps] + 1  # ldm shift
        a = base.table("alphas_cumprod")[ts]
        sqrt_a = np.sqrt(a)
        sqrt_1ma = np.sqrt(1.0 - a)
    sqrt_a = jnp.asarray(sqrt_a, jnp.float32)
    sqrt_1ma = jnp.asarray(sqrt_1ma, jnp.float32)
    bc = (-1,) + (1,) * (x0.ndim - 1)
    return (sqrt_a[t].reshape(bc) * x0 + sqrt_1ma[t].reshape(bc) * noise)


def decode(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_latent: jnp.ndarray,
    rng: jax.Array,
    coeffs: DDIMCoefficients,
    t_start: int,
    *,
    uncond_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
    guidance_scale: float = 1.0,
) -> jnp.ndarray:
    """Run the last `t_start` DDIM steps from x_{t_start} down to x_0
    (reference :298-316): exactly `sample` over the tail of the descending
    coefficient table."""
    assert 0 < t_start <= coeffs.num_steps, (t_start, coeffs.num_steps)
    sub = DDIMCoefficients(*[a[coeffs.num_steps - t_start:] for a in coeffs])
    return sample(denoise_fn, x_latent, rng, sub,
                  uncond_fn=uncond_fn, guidance_scale=guidance_scale)
