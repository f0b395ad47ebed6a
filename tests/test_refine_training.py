"""Refine-phase training: backprop through the fixed_step sampler, the VAE
decoder, and LPIPS (rdeic.py:837-879) — the memory-hard path."""
import numpy as np
import jax
import pytest

from rdeic_tpu.train.trainer import Trainer
from tests.helpers import micro_rdeic


@pytest.mark.slow
def test_refine_loss_and_step():
    model = micro_rdeic(is_refine=True)
    assert model.is_refine and model.fixed_step == 2
    params = model.init_params(
        jax.random.PRNGKey(0), image_hw=(32, 32), include_lpips=True
    )
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1

    loss, logs = model.loss_fn(params, img, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    for k in ("l_simple", "l_mse", "l_lpips", "l_guide", "l_bpp", "l_emb"):
        assert k in logs and np.isfinite(float(logs[k])), k

    trainer = Trainer(model)
    state = trainer.init_state(params, jax.random.PRNGKey(3))
    state, step_logs = trainer.step(state, img)
    assert int(state.step) == 1
    assert np.isfinite(float(step_logs["loss"]))
    assert np.isfinite(float(step_logs["grad_norm"]))
    assert float(step_logs["grad_norm"]) > 0


@pytest.mark.slow
def test_scan_remat_same_loss_and_grads():
    """scan_remat=True (per-step sampler remat, spaced.sample remat_steps)
    must change memory behavior only: loss and gradients stay numerically
    identical to the default path."""
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3)) * 2 - 1
    vals = {}
    for flag in (False, True):
        model = micro_rdeic(is_refine=True, scan_remat=flag)
        params = model.init_params(
            jax.random.PRNGKey(0), image_hw=(32, 32), include_lpips=True
        )
        (loss, _), grads = jax.value_and_grad(
            lambda p: model.loss_fn(p, img, jax.random.PRNGKey(2)),
            has_aux=True,
        )(params)
        vals[flag] = (float(loss), grads)
    assert np.isclose(vals[False][0], vals[True][0], rtol=1e-5)
    flat_a = jax.tree_util.tree_leaves(vals[False][1])
    flat_b = jax.tree_util.tree_leaves(vals[True][1])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=2e-4, atol=1e-6,
        )
