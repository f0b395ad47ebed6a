import jax
import jax.numpy as jnp
import numpy as np

from rdeic_tpu.utils.metrics import MetricSuite, ms_ssim, psnr, ssim


def test_psnr_known_value():
    a = jnp.zeros((1, 16, 16, 3))
    b = jnp.full((1, 16, 16, 3), 0.1)
    # mse = 0.01 -> psnr = 20
    np.testing.assert_allclose(np.asarray(psnr(a, b)), [20.0], atol=1e-4)


def test_ssim_identity_and_degradation():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype("f4"))
    assert float(ssim(a, a)[0]) > 0.999
    noisy = jnp.clip(a + 0.2 * rng.normal(size=a.shape).astype("f4"), 0, 1)
    assert float(ssim(a, noisy)[0]) < 0.9


def test_ms_ssim_identity():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)).astype("f4"))
    assert float(ms_ssim(a, a)[0]) > 0.999
    blurry = jnp.asarray(
        np.array(
            jax.image.resize(
                jax.image.resize(a, (1, 48, 48, 3), "bilinear"),
                (1, 192, 192, 3),
                "bilinear",
            )
        )
    )
    v = float(ms_ssim(a, blurry)[0])
    assert 0 < v < 0.99


def test_suite_registry():
    suite = MetricSuite()
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype("f4"))
    b = jnp.clip(a + 0.05, 0, 1)
    for name in ("psnr", "ssim", "mse", "mae", "lpips"):
        out = np.asarray(suite.create_metric(name)(a, b))
        assert out.shape == (2,)
        assert np.all(np.isfinite(out))
