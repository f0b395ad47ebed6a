"""Parity of the single-pass Pallas GroupNorm (ops/fused_groupnorm.py)
against flax nn.GroupNorm, in interpret mode (no TPU needed).

The kernel must match nn.GroupNorm(num_groups, epsilon, dtype=x.dtype)
— fp32 statistics, input-dtype normalize — which is exactly what
GroupNorm32 (models/blocks.py) computes on the stock path.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdeic_tpu.ops import fused_groupnorm


def _ref(x, scale, bias, groups, eps):
    mod = nn.GroupNorm(num_groups=groups, epsilon=eps, dtype=x.dtype)
    return mod.apply({"params": {"scale": scale, "bias": bias}}, x)


@pytest.mark.parametrize(
    "shape,groups",
    [((2, 8, 16, 128), 32), ((1, 4, 8, 256), 32), ((3, 2, 4, 128), 16)],
)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_matches_flax_groupnorm(shape, groups, dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape) * 3 + 1, dtype=dtype)
    c = shape[-1]
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    got = fused_groupnorm.group_norm(
        x, scale, bias, groups=groups, interpret=True)
    want = _ref(x, scale, bias, groups, 1e-5)
    assert got.dtype == want.dtype
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=tol)


def test_silu_fusion():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 128)).astype(np.float32))
    scale = jnp.ones((128,), jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)
    got = fused_groupnorm.group_norm(
        x, scale, bias, groups=32, silu=True, interpret=True)
    want = jax.nn.silu(_ref(x, scale, bias, 32, 1e-5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("silu", [False, True])
def test_gradient_matches_flax(silu):
    """custom_vjp backward (dx, dscale, dbias) vs jax.grad through the
    stock flax GroupNorm(+SiLU)."""
    rng = np.random.default_rng(4)
    shape, groups, c = (2, 4, 8, 128), 32, 128
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 2 + 0.5)
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def fused(x, s, b):
        y = fused_groupnorm.group_norm(
            x, s, b, groups=groups, interpret=True, silu=silu)
        return jnp.sum(y * cot)

    def stock(x, s, b):
        y = _ref(x, s, b, groups, 1e-5)
        if silu:
            y = jax.nn.silu(y)
        return jnp.sum(y * cot)

    g_f = jax.grad(fused, argnums=(0, 1, 2))(x, scale, bias)
    g_s = jax.grad(stock, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_f, g_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-4)


def test_supported_guard():
    assert fused_groupnorm.supported((2, 8, 16, 128), jnp.bfloat16)
    # VAE full-res slab: too big for VMEM -> must fall back
    assert not fused_groupnorm.supported((1, 512, 512, 128), jnp.float32)
    # non-128 lane width (narrow control levels) -> fall back
    assert not fused_groupnorm.supported((1, 8, 8, 96), jnp.float32)
    assert not fused_groupnorm.supported((8, 16, 128), jnp.float32)


def test_groupnorm32_fused_flag_param_paths(monkeypatch):
    """RDEIC_FUSED_GN must not change param paths, and on non-TPU backends
    the module output is the stock flax result."""
    from rdeic_tpu.models.blocks import GroupNorm32

    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(1, 4, 8, 128)).astype(np.float32))
    mod = GroupNorm32()
    params = mod.init(jax.random.PRNGKey(0), x)
    leaf_paths = jax.tree_util.tree_map_with_path(lambda p, _: None, params)
    base = mod.apply(params, x)
    monkeypatch.setenv("RDEIC_FUSED_GN", "1")
    params2 = mod.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params2) == \
        jax.tree_util.tree_structure(params)
    del leaf_paths
    flagged = mod.apply(params2, x)  # CPU backend -> stock path
    np.testing.assert_allclose(np.asarray(flagged), np.asarray(base))


def test_groupnorm32_fused_dispatch_interpret(monkeypatch):
    """With RDEIC_FUSED_GN=1 + the interpret escape hatch, GroupNorm32
    dispatches through the Pallas kernel and matches the stock path,
    including the fused SiLU epilogue."""
    from rdeic_tpu.models.blocks import GroupNorm32

    x = jnp.asarray(np.random.default_rng(3).normal(
        size=(2, 4, 8, 128)).astype(np.float32))
    mod = GroupNorm32(silu=True)
    params = mod.init(jax.random.PRNGKey(0), x)
    stock = mod.apply(params, x)
    monkeypatch.setenv("RDEIC_FUSED_GN", "1")
    monkeypatch.setenv("RDEIC_FUSED_GN_INTERPRET", "1")
    fused = mod.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(stock), atol=1e-5, rtol=1e-5)
