"""Relay spaced-DDPM sampler as a single `lax.scan`.

Behavioral parity: /root/reference/model/spaced_sampler_relay.py — guided
-diffusion respacing over the first `used_timesteps` of the base schedule;
per step: predict eps -> predict x0 -> posterior mean + fixed variance noise;
CFG mixes the conditional dual-UNet output with the base-UNet-only output
(apply_model_unconditional).

TPU design: all per-step coefficients are precomputed host-side and stacked
into [steps] arrays that the scan body indexes — the entire sampling loop
(including every UNet call) compiles into ONE XLA program, differentiable
end-to-end (the reference needs a separate `sample_grad` twin; in JAX the
same scan is used for the refine-phase training loss).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rdeic_tpu.diffusion.schedule import NoiseSchedule, spaced_schedule


class SpacedCoefficients(NamedTuple):
    """Per-step tables, index 0 = first (highest-t) sampling step."""

    timesteps: jnp.ndarray  # [S] int32 — original-process step ids (desc)
    sqrt_recip_acp: jnp.ndarray  # [S]
    sqrt_recipm1_acp: jnp.ndarray  # [S]
    post_mean_c1: jnp.ndarray  # [S]
    post_mean_c2: jnp.ndarray  # [S]
    sqrt_model_var: jnp.ndarray  # [S]
    nonzero: jnp.ndarray  # [S] — 0.0 on the final (t=0) step

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def make_spaced_coefficients(
    base: NoiseSchedule,
    used_timesteps: int,
    num_steps: int,
    var_type: str = "fixed_small",
) -> SpacedCoefficients:
    sub, timesteps = spaced_schedule(base, used_timesteps, num_steps)
    betas = sub.betas
    post_var = sub.table("posterior_variance")
    if var_type == "fixed_small":
        model_var = post_var
    elif var_type == "fixed_large":
        model_var = np.append(post_var[1], betas[1:])
    else:
        raise ValueError(var_type)

    # reverse: step 0 of the scan is the largest timestep
    order = np.arange(num_steps)[::-1]
    nonzero = (order != 0).astype(np.float64)
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    return SpacedCoefficients(
        timesteps=jnp.asarray(timesteps[order], jnp.int32),
        sqrt_recip_acp=f32(sub.table("sqrt_recip_alphas_cumprod")[order]),
        sqrt_recipm1_acp=f32(sub.table("sqrt_recipm1_alphas_cumprod")[order]),
        post_mean_c1=f32(sub.table("posterior_mean_coef1")[order]),
        post_mean_c2=f32(sub.table("posterior_mean_coef2")[order]),
        sqrt_model_var=f32(np.sqrt(model_var[order])),
        nonzero=f32(nonzero),
    )


def sample(
    denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_T: jnp.ndarray,
    rng: jax.Array,
    coeffs: SpacedCoefficients,
    *,
    uncond_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
    guidance_scale: float = 1.0,
    cond_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
    remat_steps: bool = False,
) -> jnp.ndarray:
    """Run the relay spaced sampling loop from x_T (already q_sampled).

    denoise_fn(x, t[B]) -> eps. Differentiable; jit/grad-safe.
    cond_fn(pred_x0, t) -> delta implements latent-space classifier guidance
    (parity: spaced_sampler_relay.py:292-347 — the delta shifts pred_x0 and
    adds 0.5*delta to the posterior mean).
    remat_steps=True checkpoints each scan step: the backward pass saves
    only the inter-step carries and re-runs each step's UNet forward,
    trading one extra forward per step for not holding `num_steps` sets of
    UNet activations at once (the refine-phase memory axis the module-level
    remat knobs cannot reach).
    """
    b = x_T.shape[0]

    def step(carry, per):
        x, rng = carry
        rng, key = jax.random.split(rng)
        t = jnp.full((b,), per.timesteps, jnp.int32)
        eps = denoise_fn(x, t)
        if uncond_fn is not None and guidance_scale != 1.0:
            eps_u = uncond_fn(x, t)
            eps = eps_u + guidance_scale * (eps - eps_u)
        x0 = per.sqrt_recip_acp * x - per.sqrt_recipm1_acp * eps
        mean = per.post_mean_c1 * x0 + per.post_mean_c2 * x
        if cond_fn is not None:
            delta = cond_fn(x0, t)
            mean = mean + 0.5 * delta
        noise = jax.random.normal(key, x.shape, x.dtype)
        x = mean + per.nonzero * per.sqrt_model_var * noise
        return (x, rng), None

    body = jax.checkpoint(step) if remat_steps else step
    (x, _), _ = jax.lax.scan(body, (x_T, rng), coeffs)
    return x
