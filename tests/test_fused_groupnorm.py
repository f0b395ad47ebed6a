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


# shapes sized (vs the 12 MB default budget) to force: both passes
# chunked, and single-slab forward + chunked backward
_CHUNKED_SHAPE = (1, 72, 64, 128)   # 24*hwc and 36*hwc both exceed budget
_MIXED_SHAPE = (1, 56, 64, 128)     # fwd fits single; bwd chunked


@pytest.mark.parametrize(
    "shape,groups",
    [((2, 8, 16, 128), 32), ((1, 4, 8, 256), 32), ((3, 2, 4, 128), 16),
     ((2, 8, 8, 320), 32), ((1, 8, 8, 64), 32)],
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


@pytest.mark.parametrize("shape", [(2, 4, 8, 128), _CHUNKED_SHAPE])
@pytest.mark.parametrize("silu", [False, True])
def test_hybrid_forward_and_grad_match_flax(shape, silu):
    """Hybrid mode (stock jnp forward + Pallas backward): forward must
    match flax bit-for-tolerance and the custom backward must match
    jax.grad through the stock graph, on both the single-slab and the
    chunked backward dispatch."""
    rng = np.random.default_rng(7)
    c = shape[-1]
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 2 + 0.5)
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    got = fused_groupnorm.group_norm_hybrid(
        x, scale, bias, groups=32, silu=silu, interpret=True)
    want = _ref(x, scale, bias, 32, 1e-5)
    if silu:
        want = jax.nn.silu(want)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)

    def fused(x, s, b):
        y = fused_groupnorm.group_norm_hybrid(
            x, s, b, groups=32, interpret=True, silu=silu)
        return jnp.sum(y * cot)

    def stock(x, s, b):
        y = _ref(x, s, b, 32, 1e-5)
        if silu:
            y = jax.nn.silu(y)
        return jnp.sum(y * cot)

    g_f = jax.grad(fused, argnums=(0, 1, 2))(x, scale, bias)
    g_s = jax.grad(stock, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_f, g_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-4, rtol=3e-4)


def test_groupnorm32_hybrid_dispatch(monkeypatch):
    """RDEIC_FUSED_GN=hybrid routes GroupNorm32 through group_norm_hybrid
    (param paths unchanged; output matches stock)."""
    from rdeic_tpu.models.blocks import GroupNorm32

    x = jnp.asarray(np.random.default_rng(8).normal(
        size=(2, 4, 8, 128)).astype(np.float32))
    mod = GroupNorm32(silu=True)
    params = mod.init(jax.random.PRNGKey(0), x)
    stock = mod.apply(params, x)
    monkeypatch.setenv("RDEIC_FUSED_GN", "hybrid")
    monkeypatch.setenv("RDEIC_FUSED_GN_INTERPRET", "1")
    hybrid = mod.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(hybrid), np.asarray(stock), atol=1e-5, rtol=1e-5)


def test_supported_guard():
    assert fused_groupnorm.supported((2, 8, 16, 128), jnp.bfloat16)
    # VAE full-res slab: too big for one VMEM visit -> row-chunked path
    assert fused_groupnorm.supported((1, 512, 512, 128), jnp.float32)
    assert not fused_groupnorm._fits_single_fwd((1, 512, 512, 128),
                                                jnp.float32)
    # the UNet's 320-wide levels and the 64-ch control levels qualify
    # (c pads to the lane tile in VMEM; HBM traffic unchanged)
    assert fused_groupnorm.supported((8, 64, 64, 320), jnp.bfloat16)
    assert fused_groupnorm.supported((1, 8, 8, 64), jnp.float32)
    # non-64-multiple lane width -> fall back
    assert not fused_groupnorm.supported((1, 8, 8, 96), jnp.float32)
    assert not fused_groupnorm.supported((8, 16, 128), jnp.float32)


def test_single_slab_vmem_estimate_counts_backward():
    """The whole-slab gate must account for the backward's three slab
    windows + fp32 temps, not just the raw input bytes (advisor round 4):
    a ~3.9 MB fp32 slab may NOT take the whole-slab backward."""
    shape = (1, 88, 88, 512)  # 3.96 MB fp32 raw slab
    assert not fused_groupnorm._fits_single_bwd(shape, jnp.float32)


def test_chunk_plan_shapes():
    fg = fused_groupnorm
    assert not fg._fits_single_fwd(_CHUNKED_SHAPE, jnp.float32)
    assert not fg._fits_single_bwd(_CHUNKED_SHAPE, jnp.float32)
    assert fg._fits_single_fwd(_MIXED_SHAPE, jnp.float32)
    assert not fg._fits_single_bwd(_MIXED_SHAPE, jnp.float32)
    assert fg.supported(_CHUNKED_SHAPE, jnp.float32)
    assert fg.supported(_MIXED_SHAPE, jnp.float32)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("silu", [False, True])
def test_chunked_matches_flax(dtype, silu):
    """Row-chunked forward parity on a slab too big for one VMEM visit."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=_CHUNKED_SHAPE) * 2 + 1, dtype=dtype)
    c = _CHUNKED_SHAPE[-1]
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    got = fused_groupnorm.group_norm(
        x, scale, bias, groups=32, silu=silu, interpret=True)
    want = _ref(x, scale, bias, 32, 1e-5)
    if silu:
        want = jax.nn.silu(want)
    assert got.dtype == want.dtype
    tol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=tol, rtol=tol)


@pytest.mark.parametrize("shape", [_CHUNKED_SHAPE, _MIXED_SHAPE])
@pytest.mark.parametrize("silu", [False, True])
def test_chunked_gradient_matches_flax(shape, silu):
    """Chunked backward (and the mixed single-fwd + chunked-bwd case)
    vs jax.grad through the stock flax GroupNorm(+SiLU)."""
    rng = np.random.default_rng(6)
    c = shape[-1]
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 2 + 0.5)
    scale = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(c,)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    def fused(x, s, b):
        y = fused_groupnorm.group_norm(
            x, s, b, groups=32, interpret=True, silu=silu)
        return jnp.sum(y * cot)

    def stock(x, s, b):
        y = _ref(x, s, b, 32, 1e-5)
        if silu:
            y = jax.nn.silu(y)
        return jnp.sum(y * cot)

    g_f = jax.grad(fused, argnums=(0, 1, 2))(x, scale, bias)
    g_s = jax.grad(stock, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_f, g_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-4, rtol=3e-4)


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
