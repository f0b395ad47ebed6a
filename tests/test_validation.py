"""Validation loop + image logger on the micro model."""
import numpy as np
import jax
import pytest

from rdeic_tpu.train.callbacks import ImageLogger, log_images
from rdeic_tpu.train.validation import run_validation
from tests.helpers import micro_rdeic


class _Loader:
    def __init__(self, n=2, b=1):
        rng = np.random.default_rng(0)
        self.batches = [
            {"jpg": rng.uniform(-1, 1, (b, 32, 32, 3)).astype("f4")}
            for _ in range(n)
        ]

    def __iter__(self):
        return iter(self.batches)


@pytest.fixture(scope="module")
def model_and_params():
    model = micro_rdeic()
    params = model.init_params(jax.random.PRNGKey(0), image_hw=(32, 32))
    return model, params


@pytest.mark.slow
def test_run_validation(model_and_params):
    model, params = model_and_params
    out = run_validation(
        model, params, _Loader(), jax.random.PRNGKey(1),
        max_batches=2, sample_steps=2, metric_names=("psnr",),
    )
    assert "avg_bpp" in out and np.isfinite(out["avg_bpp"])
    assert "avg_psnr" in out
    assert 0 <= out["usage"] <= 1


@pytest.mark.slow
def test_image_logger_writes_grids(model_and_params, tmp_path):
    model, params = model_and_params
    logger = ImageLogger(str(tmp_path), every_n_steps=2, sample_steps=2)
    batch = np.random.default_rng(1).uniform(-1, 1, (2, 32, 32, 3)).astype("f4")
    logger.maybe_log(model, params, batch, step=1, rng=jax.random.PRNGKey(2))
    assert not (tmp_path / "image_log").exists()  # step 1 not a multiple of 2
    logger.maybe_log(model, params, batch, step=2, rng=jax.random.PRNGKey(2))
    out = tmp_path / "image_log" / "step_2"
    assert (out / "target.png").exists()
    assert (out / "vae_rec.png").exists()
    assert (out / "samples.png").exists()
    assert float((out / "bpp.txt").read_text()) > 0
