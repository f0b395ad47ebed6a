"""Flash attention kernel vs the XLA reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdeic_tpu.ops.attention import sdp_attention


def _flash_interpret(q, k, v, block_q=64, block_k=64):
    """Run the pallas kernel in interpreter mode (CPU-safe)."""
    import functools
    from jax.experimental import pallas as pl
    from rdeic_tpu.ops import flash_attention as fa

    b, lq, h, d = q.shape
    lk = k.shape[1]
    scale = d**-0.5

    def to_bhld(x, l):
        return x.transpose(0, 2, 1, 3).reshape(b * h, l, d)

    qh, kh, vh = to_bhld(q, lq), to_bhld(k, lk), to_bhld(v, lk)
    pad_q = (-lq) % block_q
    pad_k = (-lk) % block_k
    qh = jnp.pad(qh, ((0, 0), (0, pad_q), (0, 0)))
    kh = jnp.pad(kh, ((0, 0), (0, pad_k), (0, 0)))
    vh = jnp.pad(vh, ((0, 0), (0, pad_k), (0, 0)))
    lq_p, lk_p = lq + pad_q, lk + pad_k
    out = pl.pallas_call(
        functools.partial(
            fa._flash_kernel, scale=scale, block_k=block_k, seq_len=lk
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d), q.dtype),
        grid=(b * h, lq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, lk_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, lk_p, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        interpret=True,
    )(qh, kh, vh)
    return out[:, :lq, :].reshape(b, h, lq, d).transpose(0, 2, 1, 3)


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
        fa._flash_forward = lambda q, k, v: sdp_attention(q, k, v)

        def loss_flash(q, k, v):
            return jnp.sum(fa_fn(q, k, v) ** 2)

        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        fa._flash_forward = orig
    for a, b in zip(g_ref, g_flash):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
