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
