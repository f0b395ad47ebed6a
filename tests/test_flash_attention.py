"""Flash attention kernel vs the XLA reference (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdeic_tpu.ops.attention import sdp_attention


def _flash_interpret(q, k, v, block_q=64, block_k=64):
    """Run the REAL _flash_forward wrapper (padding, grid, k-blocked
    scratch accumulation) in interpreter mode (CPU-safe)."""
    from rdeic_tpu.ops import flash_attention as fa

    return fa._flash_forward(
        q, k, v, block_q=block_q, block_k=block_k, interpret=True
    )


@pytest.mark.parametrize("lq,lk", [(128, 128), (100, 100), (64, 160)])
def test_flash_matches_reference(lq, lk):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(1, lq, 2, 32)).astype("f4"))
    k = jnp.asarray(rng.normal(size=(1, lk, 2, 32)).astype("f4"))
    v = jnp.asarray(rng.normal(size=(1, lk, 2, 32)).astype("f4"))
    ref = sdp_attention(q, k, v)
    out = _flash_interpret(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("lq,lk", [(128, 128), (100, 100), (64, 160)])
def test_flash_backward_matches_sdp_grads(lq, lk):
    """The Pallas backward (dq + dkv kernels, interpret mode) must match
    the XLA sdp gradients, including non-block-divisible (padded) seqs."""
    from rdeic_tpu.ops import flash_attention as fa

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(1, lq, 2, 32)).astype("f4"))
    k = jnp.asarray(rng.normal(size=(1, lk, 2, 32)).astype("f4"))
    v = jnp.asarray(rng.normal(size=(1, lk, 2, 32)).astype("f4"))
    ct = jnp.asarray(rng.normal(size=(1, lq, 2, 32)).astype("f4"))

    out_ref, vjp = jax.vjp(sdp_attention, q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(ct)

    out, lse = fa._flash_forward(
        q, k, v, block_q=64, block_k=64, interpret=True, save_residuals=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=2e-5)
    dq, dk, dv = fa._flash_backward(
        q, k, v, out, lse, ct, block_q=64, block_k=64, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=2e-4)


def test_flash_attention_grad_cpu():
    """flash_attention's custom VJP structure end to end on CPU: the pallas
    forward/backward are swapped for interpret-mode equivalents via
    monkeypatching the jitted inner fns; gradients must match sdp's."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 16, 2, 8)).astype("f4"))
    k = jnp.asarray(rng.normal(size=(1, 16, 2, 8)).astype("f4"))
    v = jnp.asarray(rng.normal(size=(1, 16, 2, 8)).astype("f4"))

    def loss_ref(q, k, v):
        return jnp.sum(sdp_attention(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    from rdeic_tpu.ops import flash_attention as fa

    orig_fwd, orig_bwd = fa._flash_forward, fa._flash_backward
    fa_fn = fa.flash_attention
    try:
        fa._flash_forward = functools.partial(orig_fwd, interpret=True)
        fa._flash_backward = functools.partial(orig_bwd, interpret=True)

        def loss_flash(q, k, v):
            return jnp.sum(fa_fn(q, k, v) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa._flash_forward = orig_fwd
        fa._flash_backward = orig_bwd
    for a, b in zip(g_ref, g_flash):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
