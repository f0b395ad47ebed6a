"""bf16 parameter-storage paths: frozen-subtree cast in training and
inference-params cast for the decode pipeline."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import micro_rdeic


@pytest.fixture(scope="module")
def model_params():
    model = micro_rdeic()
    params = model.init_params(jax.random.PRNGKey(0), image_hw=(32, 32))
    return model, params


def test_frozen_dtype_train_step(model_params):
    from rdeic_tpu.train.trainer import Trainer

    model, params = model_params
    trainer = Trainer(model, frozen_dtype=jnp.bfloat16)
    # copy: trainer.step donates the state, whose leaves alias the
    # module-scoped params fixture shared with the other tests
    params = jax.tree_util.tree_map(jnp.array, params)
    state = trainer.init_state(params, jax.random.PRNGKey(1))
    # frozen floats are bf16, usage EMA stays fp32, trainables stay fp32
    frozen_leaves = jax.tree_util.tree_leaves(state.frozen_params["vae"])
    assert all(x.dtype == jnp.bfloat16 for x in frozen_leaves)
    assert state.frozen_params["vq_embed_prob"].dtype == jnp.float32
    train_leaves = jax.tree_util.tree_leaves(state.train_params)
    assert all(x.dtype == jnp.float32 for x in train_leaves)

    img = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32
    )
    state, logs = trainer.step(state, img)
    assert np.isfinite(float(logs["loss"]))


def test_cast_inference_params_decode(model_params):
    model, params = model_params
    cast = model.cast_inference_params(params)
    # compression stays fp32 (bitstream format is pinned fp32)
    comp_leaves = jax.tree_util.tree_leaves(cast["compression"])
    assert all(x.dtype == jnp.float32 for x in comp_leaves)
    den_leaves = jax.tree_util.tree_leaves(cast["denoiser"])
    assert all(x.dtype == jnp.bfloat16 for x in den_leaves)

    cl = jnp.zeros((1, 16, 16, 4))
    gh = jnp.zeros((1, 16, 16, model.denoiser.hint_channels))
    out = model.jitted_decode(steps=2)(cast, cl, gh, jax.random.PRNGKey(2))
    assert out.shape[-1] == 3
    assert np.isfinite(np.asarray(out)).all()


def test_cast_inference_params_bitstream_roundtrip(model_params, tmp_path):
    """bf16 diffusion weights must not disturb codec bit-exactness: the
    compression subtree is fp32 in both trees, so a stream written with
    fp32-everything params decodes identically under cast params."""
    model, params = model_params
    img01 = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 32, 32, 3)), jnp.float32
    )
    p1 = str(tmp_path / "a.rdeic")
    model.apply_condition_compress(params, img01, p1, 32, 32)
    cl_ref, gh_ref = model.apply_condition_decompress(params, p1)

    cast = model.cast_inference_params(params)
    model._codec = None  # drop the codec cached on the fp32 subtree id
    cl_cast, gh_cast = model.apply_condition_decompress(cast, p1)
    np.testing.assert_array_equal(np.asarray(cl_ref), np.asarray(cl_cast))
    np.testing.assert_array_equal(np.asarray(gh_ref), np.asarray(gh_cast))
