"""Fast full-width parameter materialization.

Running the monolithic flax `init` program for the 1.3B-param flagship
compiles a huge single-use XLA program (minutes over a remote-TPU tunnel).
This builds the identical pytree from `jax.eval_shape` (no compile) and
fills each leaf host-side with variance-preserving random values:

- norm scales = 1, biases/usage-EMAs = 0
- conv/dense kernels: LeCun-normal (fan-in scaled) so activations stay
  O(1) through the 60+-layer full-width stacks (a flat per-leaf std
  explodes exponentially once fan-in is large and NaNs the loss)

Used by bench.py and by `train.py` when `trainer.fast_init: true`
(training from scratch without released SD weights — the reference's
analog path loads `sync_path` SD 2.1 weights instead,
/root/reference/train.py:25-31).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fast_random_params(model, image_hw, scale: float = 1.0, seed: int = 0,
                       device: bool = True):
    """Params with the right tree/shapes but cheap per-leaf random values.

    device=False keeps leaves host-side (numpy): warm-start flows overlay
    checkpoint weights on top and let the first jitted step upload once —
    uploading both the random tree and the loaded tree peaks ~8 GB of
    dead fp32 copies in HBM at full width.
    """
    template = jax.eval_shape(
        lambda r: model.init_params(r, image_hw=image_hw), jax.random.PRNGKey(0)
    )
    rng = np.random.default_rng(seed)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for path, leaf in flat:
        name = ""
        for p in reversed(path):
            name = str(getattr(p, "key", getattr(p, "name", p)))
            break
        if name == "scale":  # GroupNorm / LayerNorm gain
            arr = np.ones(leaf.shape, leaf.dtype)
        elif name == "bias" or name == "vq_embed_prob":
            # vq_embed_prob is a usage EMA (must be >= 0: a negative fill
            # makes the CVQ dead-code alpha = exp(+large) = inf)
            arr = np.zeros(leaf.shape, leaf.dtype)
        elif leaf.ndim >= 2:  # conv/dense kernels, embeddings: LeCun normal
            fan_in = int(np.prod(leaf.shape[:-1]))
            std = scale / np.sqrt(max(fan_in, 1))
            arr = (rng.standard_normal(leaf.shape) * std).astype(leaf.dtype)
        else:
            arr = (rng.standard_normal(leaf.shape) * 0.02).astype(leaf.dtype)
        out.append(jax.device_put(jnp.asarray(arr)) if device else arr)
    return jax.tree_util.tree_unflatten(treedef, out)
