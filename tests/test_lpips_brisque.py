"""LPIPS honesty (lin-head loading, random-backbone warning) + BRISQUE."""
import warnings
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rdeic_tpu.models import lpips as lpips_mod
from rdeic_tpu.models.lpips import LPIPS, load_lin_weights_torch
from rdeic_tpu.utils.brisque import BRISQUEModel, brisque_features

REF_ALEX_PTH = Path("/root/reference/weight/lpips/alex.pth")


def _alex_params():
    net = LPIPS(net="alex")
    probe = jnp.zeros((1, 64, 64, 3))
    return net, net.init(jax.random.PRNGKey(0), probe, probe)["params"]


@pytest.mark.skipif(not REF_ALEX_PTH.exists(), reason="reference lpips pth absent")
def test_lin_head_loading_from_published_pth():
    """The published 8 KB lin heads load onto our Flax layout exactly."""
    import torch

    net, params = _alex_params()
    loaded = load_lin_weights_torch(params, str(REF_ALEX_PTH))
    sd = torch.load(str(REF_ALEX_PTH), map_location="cpu")
    for i in range(5):
        want = sd[f"lin{i}.model.1.weight"].numpy().transpose(2, 3, 1, 0)
        got = np.asarray(loaded[f"lin{i}"]["kernel"])
        np.testing.assert_array_equal(got, want)
    # and the merged tree still runs forward
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 2 - 1
    y = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 2 - 1
    d = net.apply({"params": loaded}, x, y)
    assert d.shape == (1,) and np.isfinite(float(d[0]))


def test_lin_head_shape_mismatch_raises():
    net = LPIPS(net="vgg")
    probe = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), probe, probe)["params"]
    if REF_ALEX_PTH.exists():
        with pytest.raises(ValueError, match="shape mismatch"):
            load_lin_weights_torch(params, str(REF_ALEX_PTH))


def test_random_backbone_warning_fires_once():
    lpips_mod._warned_contexts.discard("unit-test")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        lpips_mod.warn_random_backbone("unit-test")
        lpips_mod.warn_random_backbone("unit-test")
    msgs = [str(w.message) for w in rec if "RANDOM-INIT" in str(w.message)]
    assert len(msgs) == 1


def test_metric_suite_lpips_warns_on_random():
    from rdeic_tpu.utils.metrics import MetricSuite

    lpips_mod._warned_contexts.discard("MetricSuite")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        MetricSuite().create_metric("lpips")
    assert any("RANDOM-INIT" in str(w.message) for w in rec)


def test_brisque_features_shape_and_sensitivity():
    rng = np.random.default_rng(0)
    clean = np.clip(
        0.5 + 0.2 * rng.standard_normal((128, 128, 3)), 0, 1
    )
    f = brisque_features(clean)
    assert f.shape == (36,)
    assert np.all(np.isfinite(f))


def test_brisque_model_scores_distortion_higher():
    rng = np.random.default_rng(1)
    # pristine: smooth textures; distorted: heavy blockiness
    pristine = []
    for i in range(4):
        base = rng.random((16, 16, 3))
        img = np.asarray(
            [np.kron(base[..., c], np.ones((8, 8))) for c in range(3)]
        ).transpose(1, 2, 0)
        img = 0.7 * img + 0.3 * rng.random((128, 128, 3))
        pristine.append(np.clip(img, 0, 1))
    model = BRISQUEModel.fit_pristine(pristine)
    in_dist = pristine[0]
    distorted = np.round(in_dist * 4) / 4  # severe quantization
    assert model.score(distorted) > model.score(in_dist)
    # save/load round trip
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = f"{d}/brisque.npz"
        model.save(p)
        m2 = BRISQUEModel.load(p)
        assert abs(m2.score(in_dist) - model.score(in_dist)) < 1e-9
