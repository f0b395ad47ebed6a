import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdeic_tpu.models.compression import (
    CompressionModel,
    vq_codebook_update,
)

# small config for test speed (XLA-CPU compiles of the slice loop are slow)
SMALL = dict(
    in_nc=8, out_nc=4, N=8, M=8, slice_num=2, slice_ch=(4, 4),
    codebook_size=32,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = CompressionModel(**SMALL)
    x = jnp.zeros((1, 8, 8, 8))
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, x, rng=jax.random.PRNGKey(1)
    )
    return model, params


def test_forward_shapes_and_rate(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8))
    out = model.apply(params, x, rng=jax.random.PRNGKey(3), training=True)
    assert out["c_latent"].shape == (2, 8, 8, 4)
    assert out["guide_hint"].shape == (2, 8, 8, 8)
    assert out["y_likelihoods"].shape == (2, 4, 4, 8)
    assert out["q_likelihoods"].shape == (2, 4, 4, 8)
    assert out["vq_indices"].shape == (2, 1, 1)
    like = np.asarray(out["y_likelihoods"])
    assert np.all(like > 0) and np.all(like <= 1 + 1e-6)
    assert np.isfinite(float(out["emb_loss"]))


def test_forward_eval_mode(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 8))
    out = model.apply(params, x, training=False)
    # eval y_likelihoods are round-based == q_likelihoods
    np.testing.assert_allclose(
        np.asarray(out["y_likelihoods"]), np.asarray(out["q_likelihoods"])
    )


def test_forward_differentiable(model_and_params):
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 8))

    def loss_fn(p):
        out = model.apply(p, x, rng=jax.random.PRNGKey(5), training=True)
        bpp = -jnp.sum(jnp.log(out["y_likelihoods"]))
        return bpp + out["emb_loss"] + jnp.mean(out["c_latent"] ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # entropy-parameter nets must receive gradient through the rate term
    gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert gnorm > 0


def test_vq_quant_lookup_consistency(model_and_params):
    model, params = model_and_params
    z = jax.random.normal(jax.random.PRNGKey(6), (1, 1, 1, 8))
    z_q, idx = model.apply(params, z, method=CompressionModel.vq_quant)
    z_q2 = model.apply(params, idx, method=CompressionModel.vq_lookup)
    np.testing.assert_array_equal(np.asarray(z_q), np.asarray(z_q2))


def test_vq_codebook_update_moves_dead_codes():
    key = jax.random.PRNGKey(7)
    emb = jax.random.uniform(key, (8, 4), minval=-0.1, maxval=0.1)
    prob = jnp.zeros((8,))
    z = jax.random.normal(jax.random.PRNGKey(8), (32, 4)) + 5.0
    new_emb, new_prob = vq_codebook_update(emb, prob, z)
    # unused codes (prob ~ 0) get pulled strongly toward data
    assert float(jnp.mean(jnp.abs(new_emb))) > float(jnp.mean(jnp.abs(emb)))
    assert new_prob.shape == (8,)
    assert float(jnp.sum(new_prob)) > 0
