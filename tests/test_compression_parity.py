

def test_contrastive_topk_equals_sort_formulation():
    """The top_k contrastive loss must equal the reference's sort-based
    formulation (softmax is order-invariant over the selected values) —
    value AND gradient."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rdeic_tpu.models.compression import VectorQuantiser

    def sort_version(logits, num_embed):
        n = logits.shape[0]
        srt = jnp.sort(logits, axis=0)
        n_pos = max(1, n // num_embed)
        dis_pos = jnp.mean(srt[-n_pos:, :], axis=0, keepdims=True)
        dis_neg = srt[: n // 2, :]
        dis = jnp.concatenate([dis_pos, dis_neg], axis=0).T / 0.07
        return -jnp.mean(jax.nn.log_softmax(dis, axis=1)[:, 0])

    vq = VectorQuantiser(num_embed=32, embed_dim=4)
    logits = jax.random.normal(jax.random.PRNGKey(0), (48, 32))

    def new_loss(lg):
        return vq._contrastive(lg)

    # n_pos > 1 case too (n // num_embed = 48 // 32 = 1; use a small K)
    vq2 = VectorQuantiser(num_embed=8, embed_dim=4)

    for q, fn_ref in ((vq, lambda lg: sort_version(lg, 32)),
                      (vq2, lambda lg: sort_version(lg, 8))):
        ref_v, ref_g = jax.value_and_grad(fn_ref)(logits)
        new_v, new_g = jax.value_and_grad(q._contrastive)(logits)
        np.testing.assert_allclose(float(new_v), float(ref_v), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(new_g), np.asarray(ref_g), atol=1e-6
        )
