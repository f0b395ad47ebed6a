"""End-to-end pipeline tests on a micro RDEIC (the inference.py equivalent)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import micro_rdeic


@pytest.fixture(scope="module")
def model_and_params():
    model = micro_rdeic()
    params = model.init_params(jax.random.PRNGKey(0), image_hw=(32, 32))
    return model, params


def test_get_input_shapes(model_and_params):
    model, params = model_and_params
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)) * 2 - 1
    z, cond = model.get_input(params, img, jax.random.PRNGKey(2))
    assert z.shape == (2, 16, 16, 4)
    assert cond["c_latent"].shape == (2, 16, 16, 4)
    assert cond["guide_hint"].shape == (2, 16, 16, 8)
    assert cond["c_crossattn"].shape == (2, 77, 16)
    assert float(cond["bpp"]) > 0
    assert np.isfinite(float(cond["q_bpp"]))


def test_independent_loss_finite(model_and_params):
    model, params = model_and_params
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3)) * 2 - 1
    loss, logs = model.loss_fn(params, img, jax.random.PRNGKey(4))
    assert np.isfinite(float(loss))
    for k in ("l_simple", "l_guide", "l_bpp", "q_bpp", "l_emb", "loss"):
        assert k in logs and np.isfinite(float(logs[k]))


def test_v_parameterization_loss(model_and_params):
    """parameterization="v" (reference ddpm.py get_v / p_losses): the loss
    branch runs, is finite, and regresses a DIFFERENT target than "eps"."""
    model, params = model_and_params
    img = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 3)) * 2 - 1
    old = model.parameterization
    try:
        model.parameterization = "v"
        loss_v, logs_v = model.loss_fn(params, img, jax.random.PRNGKey(4))
        model.parameterization = "eps"
        loss_e, logs_e = model.loss_fn(params, img, jax.random.PRNGKey(4))
    finally:
        model.parameterization = old
    assert np.isfinite(float(loss_v)) and np.isfinite(float(loss_e))
    # same rng, different objective -> l_simple must differ
    assert not np.isclose(float(logs_v["l_simple"]), float(logs_e["l_simple"]))


def test_decode_pipeline_jitted(model_and_params):
    model, params = model_and_params
    c_latent = jax.random.normal(jax.random.PRNGKey(5), (1, 16, 16, 4))
    guide_hint = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 16, 8))
    fn = model.jitted_decode(steps=2, sampler="ddpm")
    img = fn(params, c_latent, guide_hint, jax.random.PRNGKey(7))
    assert img.shape == (1, 32, 32, 3)
    out = np.asarray(img)
    assert np.all(out >= 0) and np.all(out <= 1) and np.all(np.isfinite(out))


def test_full_inference_roundtrip(model_and_params, tmp_path):
    """process() of inference.py: compress -> file -> decompress -> sample."""
    model, params = model_and_params
    img01 = jax.random.uniform(jax.random.PRNGKey(8), (1, 32, 32, 3))
    stream = str(tmp_path / "img.rdeic")
    bpp = model.apply_condition_compress(params, img01, stream, 32, 32)
    assert bpp > 0
    c_latent, guide_hint = model.apply_condition_decompress(params, stream)
    assert c_latent.shape == (1, 16, 16, 4)
    fn = model.jitted_decode(steps=2)
    out = fn(params, c_latent, guide_hint, jax.random.PRNGKey(9))
    assert out.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(out)))


def test_ddim_sampler_path(model_and_params):
    model, params = model_and_params
    c_latent = jax.random.normal(jax.random.PRNGKey(10), (1, 16, 16, 4))
    guide_hint = jax.random.normal(jax.random.PRNGKey(11), (1, 16, 16, 8))
    fn = model.jitted_decode(steps=2, sampler="ddim")
    img = fn(params, c_latent, guide_hint, jax.random.PRNGKey(12))
    assert img.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(img)))


def test_retrace_different_batch_no_tracer_leak(model_and_params):
    """Two different batch sizes through the same schedule must not leak
    tracers from the lazily-built coefficient tables (regression)."""
    model, params = model_and_params
    fn = model.jitted_decode(steps=2)
    for b in (1, 2):
        c = jax.random.normal(jax.random.PRNGKey(b), (b, 16, 16, 4))
        g = jax.random.normal(jax.random.PRNGKey(b + 10), (b, 16, 16, 8))
        out = fn(params, c, g, jax.random.PRNGKey(b + 20))
        assert out.shape[0] == b


def test_cfg_guidance_path(model_and_params):
    """Classifier-free guidance runs the base-UNet-only unconditional branch
    (rdeic.py:700-709) inside the scan."""
    model, params = model_and_params
    # at init every zero conv is zero => conditional == unconditional
    # (the ControlNet property); perturb one bridge so control has effect

    # (the UNet's final conv is ALSO zero-init, SD zero_module style, so the
    # raw eps is 0 at init — perturb it too)
    params = dict(params)
    den = dict(params["denoiser"])
    den["middle_block_out"] = {
        "kernel": jnp.ones_like(den["middle_block_out"]["kernel"]) * 0.05,
        "bias": den["middle_block_out"]["bias"],
    }
    base = dict(den["base"])
    base["out_conv"] = {
        "kernel": jax.random.normal(
            jax.random.PRNGKey(99), base["out_conv"]["kernel"].shape
        )
        * 0.05,
        "bias": base["out_conv"]["bias"],
    }
    den["base"] = base
    params["denoiser"] = den
    c_latent = jax.random.normal(jax.random.PRNGKey(30), (1, 16, 16, 4))
    guide_hint = jax.random.normal(jax.random.PRNGKey(31), (1, 16, 16, 8))
    fn = model.jitted_decode(steps=2, guidance_scale=2.0)
    img = fn(params, c_latent, guide_hint, jax.random.PRNGKey(32))
    assert img.shape == (1, 32, 32, 3)
    assert np.all(np.isfinite(np.asarray(img)))
    # guidance must change the output vs scale 1.0 once control is non-zero
    plain = model.jitted_decode(steps=2)(
        params, c_latent, guide_hint, jax.random.PRNGKey(32)
    )
    assert not np.allclose(np.asarray(img), np.asarray(plain))


def test_decode_batched_micro_chunks(model_and_params):
    """decode_batched must equal running the same jitted decode on each
    micro chunk (identical rng split order), pad ragged tails without a
    second compiled shape, and keep outputs in [0, 1]."""
    model, params = model_and_params
    b, micro = 5, 2  # ragged: 2 full chunks + padded tail
    c = jax.random.normal(jax.random.PRNGKey(20), (b, 16, 16, 4))
    g = jax.random.normal(jax.random.PRNGKey(21), (b, 16, 16, 8))
    rng = jax.random.PRNGKey(22)
    out = model.decode_batched(params, c, g, rng, steps=2, micro=micro)
    assert out.shape == (b, 32, 32, 3)
    o = np.asarray(out)
    assert np.all(np.isfinite(o)) and np.all(o >= 0) and np.all(o <= 1)

    # reference: same chunking by hand (pad with the first rows)
    fn = model.jitted_decode(steps=2)
    cp = jnp.concatenate([c, c[:1]], axis=0)
    gp = jnp.concatenate([g, g[:1]], axis=0)
    outs, r = [], rng
    for k in range(0, 6, micro):
        r, sub = jax.random.split(r)
        outs.append(fn(params, cp[k:k + micro], gp[k:k + micro], sub))
    ref = np.concatenate(outs, axis=0)[:b]
    np.testing.assert_allclose(o, ref, atol=1e-6)

    # micro >= b must be the plain single-program path
    full = model.decode_batched(params, c, g, rng, steps=2, micro=8)
    direct = fn(params, c, g, rng)
    np.testing.assert_allclose(np.asarray(full), np.asarray(direct), atol=1e-6)
