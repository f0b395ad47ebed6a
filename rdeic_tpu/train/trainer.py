"""Training runtime: optimizer, train step, trainability masks, VQ codebook
maintenance, checkpoint/resume.

Role parity: the PyTorch-Lightning Trainer + RDEIC.configure_optimizers /
training_step of the reference (train.py:27, model/rdeic.py:763-905), with
the TPU replacements:
- DDP -> mesh-sharded jitted train step (gradients all-reduced by XLA)
- torch AdamW over (control + preprocess [+ unlocked SD decoder]) ->
  optax.adamw over the same trainable subtree (frozen params are excluded
  from differentiation entirely, not just masked)
- grad accumulation -> optax.MultiSteps
- checkpoints -> orbax (full train state incl. optimizer, fixing the
  reference's weights-only resume TODO at train.py:20-22)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.traverse_util import flatten_dict, unflatten_dict

from rdeic_tpu.models.compression import vq_codebook_update
from rdeic_tpu.train.ema import ema_init, ema_update
from rdeic_tpu.parallel import mesh as mesh_lib


def trainable_predicate(sd_locked: bool) -> Callable[[tuple], bool]:
    """Which param paths train. Parity: rdeic.py:763-772 —
    control_model + preprocess_model (+ SD UNet decoder when unlocked)."""

    def pred(path: tuple) -> bool:
        if not path:
            return False
        top = path[0]
        if top == "compression":
            return True
        if top == "denoiser":
            sub = path[1] if len(path) > 1 else ""
            if sub == "base":
                if sd_locked:
                    return False
                nxt = path[2] if len(path) > 2 else ""
                return nxt.startswith("out")  # decoder blocks + out head
            return True  # control module + all zero convs
        return False

    return pred


def partition_params(params, pred):
    """Split a nested dict pytree into (trainable, frozen) by path."""
    flat = flatten_dict(params)
    train = {k: v for k, v in flat.items() if pred(k)}
    frozen = {k: v for k, v in flat.items() if not pred(k)}
    return unflatten_dict(train), unflatten_dict(frozen)


def merge_params(train, frozen):
    flat = dict(flatten_dict(frozen))
    flat.update(flatten_dict(train))
    return unflatten_dict(flat)


def cast_frozen(frozen, dtype):
    """Cast the frozen subtree's float leaves to `dtype` for storage.

    `vq_embed_prob` is exempt: it is a live usage EMA updated every step
    (codebook dead-code reinit) and small decays underflow in bf16.
    """
    flat = flatten_dict(frozen)
    out = {}
    for k, v in flat.items():
        if k[0] == "vq_embed_prob" or not jnp.issubdtype(v.dtype, jnp.floating):
            out[k] = v
        else:
            out[k] = v.astype(dtype)
    return unflatten_dict(out)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    train_params: Any
    frozen_params: Any
    opt_state: Any
    rng: jax.Array
    ema_params: Any = None  # shadow of train_params when EMA is enabled


@dataclasses.dataclass
class Trainer:
    """Builds and runs the jitted train step for an RDEIC model."""

    model: Any  # rdeic_tpu.pipeline.rdeic.RDEIC
    learning_rate: Optional[float] = None
    accumulate_grad_batches: int = 1
    weight_decay: float = 0.01
    use_ema: bool = False  # LitEma parity (off in reference configs)
    ema_decay: float = 0.9999
    mesh: Any = None  # jax.sharding.Mesh or None for single-device
    # storage dtype for the frozen subtree (None = keep fp32). bf16 halves
    # both the HBM footprint (~1.9 GB for the 953M frozen SD weights) and
    # their per-step HBM reads; trainable params + optimizer stay fp32.
    frozen_dtype: Any = None

    def __post_init__(self):
        lr = self.learning_rate or self.model.learning_rate
        tx = optax.adamw(lr, weight_decay=self.weight_decay)
        if self.accumulate_grad_batches > 1:
            tx = optax.MultiSteps(tx, self.accumulate_grad_batches)
        self.tx = tx
        self._step_fn = None

    def init_state(self, params, rng) -> TrainState:
        pred = trainable_predicate(self.model.sd_locked)
        train, frozen = partition_params(params, pred)
        if self.frozen_dtype is not None:
            frozen = cast_frozen(frozen, self.frozen_dtype)
        opt_state = self.tx.init(train)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            train_params=train,
            frozen_params=frozen,
            opt_state=opt_state,
            rng=rng,
            ema_params=ema_init(train) if self.use_ema else None,
        )

    # ------------------------------------------------------------------
    def _build_step(self):
        model = self.model
        tx = self.tx

        def loss_from_parts(train_params, frozen_params, img, rng):
            params = merge_params(train_params, frozen_params)
            loss, logs = model.loss_fn(params, img, rng)
            return loss, logs

        def step_fn(state: TrainState, img):
            rng, step_rng = jax.random.split(state.rng)
            (loss, logs), grads = jax.value_and_grad(
                loss_from_parts, has_aux=True
            )(state.train_params, state.frozen_params, img, step_rng)
            updates, opt_state = tx.update(
                grads, state.opt_state, state.train_params
            )
            train_params = optax.apply_updates(state.train_params, updates)

            # CVQ-VAE dead-code reinit (model/compression_modules.py:272-296):
            # applied after the optimizer step, mirroring the reference's
            # in-forward .data mutation.
            z_flat = logs.pop("_z_hyper").reshape(
                -1, model.compression.N
            )
            emb = train_params["compression"]["quantize"]["embedding"]
            prob = state.frozen_params["vq_embed_prob"]
            new_emb, new_prob = vq_codebook_update(emb, prob, z_flat)
            train_params = dict(train_params)
            train_params["compression"] = dict(train_params["compression"])
            train_params["compression"]["quantize"] = {"embedding": new_emb}
            frozen = dict(state.frozen_params)
            frozen["vq_embed_prob"] = new_prob

            ema_params = state.ema_params
            if self.use_ema and ema_params is not None:
                ema_params = ema_update(
                    ema_params, train_params, self.ema_decay, state.step
                )
            new_state = TrainState(
                step=state.step + 1,
                train_params=train_params,
                frozen_params=frozen,
                opt_state=opt_state,
                rng=rng,
                ema_params=ema_params,
            )
            logs = dict(logs)
            logs["grad_norm"] = optax.global_norm(grads)
            return new_state, logs

        if self.mesh is not None:
            batch_shard = mesh_lib.batch_sharding(self.mesh)
            step_fn = jax.jit(
                step_fn,
                in_shardings=(None, batch_shard),
                donate_argnums=(0,),
            )
        else:
            step_fn = jax.jit(step_fn, donate_argnums=(0,))
        return step_fn

    def step(self, state: TrainState, img):
        """One optimization step. img: [B, H, W, 3] in [-1, 1]."""
        if self._step_fn is None:
            self._step_fn = self._build_step()
        return self._step_fn(state, img)

    def params(self, state: TrainState):
        return merge_params(state.train_params, state.frozen_params)
