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
    alphas = acp[ts]
    alphas_prev = np.concatenate([[float(acp[0])], acp[ts[:-1]]])
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    ts_shifted = ts + 1  # guided-diffusion style shift for the model call
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
