"""NIQE: natural images fit the pristine model better than noise."""
import numpy as np

from rdeic_tpu.utils.niqe import NIQEModel, niqe_features


def _smooth_images(n, seed=0, size=192):
    """Synthetic 'natural-ish' images: smooth gradients + mild texture."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        base = gaussian_filter(rng.normal(size=(size, size, 3)), (17, 17, 0))
        base = (base - base.min()) / (np.ptp(base) + 1e-9)
        tex = gaussian_filter(rng.normal(size=(size, size, 3)), (2, 2, 0)) * 0.05
        out.append(np.clip(base + tex, 0, 1).astype("f4"))
    return out


def test_features_shape():
    img = _smooth_images(1)[0]
    f = niqe_features(img)
    assert f.shape == (4, 36)
    assert np.all(np.isfinite(f))


def test_fit_score_ordering(tmp_path):
    model = NIQEModel.fit_pristine(_smooth_images(6))
    clean = _smooth_images(1, seed=99)[0]
    noisy = np.clip(
        clean + np.random.default_rng(1).normal(0, 0.25, clean.shape), 0, 1
    ).astype("f4")
    s_clean = model.score(clean)
    s_noisy = model.score(noisy)
    assert np.isfinite(s_clean) and np.isfinite(s_noisy)
    assert s_noisy > s_clean  # heavy noise must look less natural

    p = tmp_path / "niqe.npz"
    model.save(str(p))
    model2 = NIQEModel.load(str(p))
    assert abs(model2.score(clean) - s_clean) < 1e-9
