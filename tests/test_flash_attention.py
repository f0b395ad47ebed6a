"""Flash attention kernel vs the XLA reference (interpret mode on CPU)."""
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


def test_flash_attention_grad_cpu():
    """flash_attention must be differentiable: the custom VJP routes the
    backward through the XLA path, so its gradients must match
    sdp_attention's exactly."""
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 16, 2, 8)).astype("f4"))
    k = jnp.asarray(rng.normal(size=(1, 16, 2, 8)).astype("f4"))
    v = jnp.asarray(rng.normal(size=(1, 16, 2, 8)).astype("f4"))

    def loss_ref(q, k, v):
        return jnp.sum(sdp_attention(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    from rdeic_tpu.ops import flash_attention as fa

    # swap the pallas forward for the XLA one so the custom_vjp structure is
    # testable on CPU (the TPU forward is covered by interpret-mode tests)
    orig = fa._flash_forward
    fa_fn = fa.flash_attention
    try:
        fa._flash_forward = lambda q, k, v, **_kw: sdp_attention(q, k, v)

        def loss_flash(q, k, v):
            return jnp.sum(fa_fn(q, k, v) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa._flash_forward = orig
    for a, b in zip(g_ref, g_flash):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
