"""remat_policy knob: plumbing (RDEIC reads the config key) + effect
(the policy changes the compiled gradient program).

Round-2 verdict found the knob dead: models/unet.py implemented it but
RDEIC.__init__ never read the key, so every "dots" measurement silently
ran full remat. These tests pin the plumbing and the behavioural
difference so the knob can't die silently again.
"""
import jax
import jax.numpy as jnp
import pytest

from rdeic_tpu.models.unet import UNetModel
from rdeic_tpu.pipeline.rdeic import RDEIC

TINY = dict(
    in_channels=4,
    model_channels=32,
    out_channels=4,
    num_res_blocks=1,
    attention_resolutions=(1,),
    channel_mult=(1, 2),
    num_head_channels=8,
    context_dim=16,
)


def _grad_jaxpr(policy):
    unet = UNetModel(use_checkpoint=True, remat_policy=policy, **TINY)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 4, 16))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]

    def loss(p):
        return jnp.sum(unet.apply({"params": p}, x, t, ctx) ** 2)

    return str(jax.make_jaxpr(jax.grad(loss))(params))


def test_policy_changes_gradient_program():
    full = _grad_jaxpr(None)
    dots = _grad_jaxpr("dots")
    assert "remat" in full  # checkpointing is actually applied
    # checkpoint_dots saves matmul outputs -> different residual set ->
    # different jaxpr than full remat
    assert full != dots


def test_no_checkpoint_has_no_remat():
    unet = UNetModel(use_checkpoint=False, **TINY)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 4, 16))
    params = unet.init(jax.random.PRNGKey(0), x, t, ctx)["params"]

    def loss(p):
        return jnp.sum(unet.apply({"params": p}, x, t, ctx) ** 2)

    assert "remat" not in str(jax.make_jaxpr(jax.grad(loss))(params))


@pytest.mark.parametrize("via", ["control_stage_config", "unet_config"])
def test_rdeic_reads_remat_policy_key(via):
    cfg = {via: {"params": {"remat_policy": "dots", "use_checkpoint": True}}}
    model = RDEIC(**cfg)
    assert model.denoiser.remat_policy == "dots"
    assert model.denoiser.use_checkpoint == (via == "control_stage_config")


def test_rdeic_policy_survives_dtype_clone():
    model = RDEIC(
        control_stage_config={
            "params": {"remat_policy": "dots", "use_checkpoint": True}
        }
    )
    model.set_compute_dtype(jnp.bfloat16)
    assert model.denoiser.remat_policy == "dots"
    assert model.denoiser.dtype == jnp.bfloat16


def test_vae_decoder_remat_same_values_and_grads():
    """use_checkpoint on the VAE decoder is numerics-neutral (values + grads)
    and actually inserts remat into the gradient program.

    Refine training backprops through the (frozen) decoder to the latent;
    per-block remat is how B=4 fits one v5e (BENCHLOG round 4).
    """
    from rdeic_tpu.models.vae import AutoencoderKL

    kw = dict(embed_dim=4, ch=8, ch_mult=(1, 2), num_res_blocks=1)
    plain = AutoencoderKL(**kw)
    remat = AutoencoderKL(use_checkpoint=True, **kw)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    params = plain.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(2)
    )["params"]

    def dec(model, latent):
        return model.apply({"params": params}, latent, method=AutoencoderKL.decode)

    out_plain = dec(plain, z)
    out_remat = dec(remat, z)
    assert jnp.allclose(out_plain, out_remat, atol=0, rtol=0)

    def loss(model):
        def f(latent):
            return jnp.sum(dec(model, latent) ** 2)
        return f

    g_plain = jax.grad(loss(plain))(z)
    g_remat = jax.grad(loss(remat))(z)
    assert jnp.allclose(g_plain, g_remat, atol=1e-5, rtol=1e-5)
    assert "remat" in str(jax.make_jaxpr(jax.grad(loss(remat)))(z))
    assert "remat" not in str(jax.make_jaxpr(jax.grad(loss(plain)))(z))
