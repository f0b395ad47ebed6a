"""Training CLI.

Role parity: /root/reference/train.py — load the YAML tree, seed, build the
DataModule + model, then run the training loop (here: mesh-sharded jitted
steps with orbax checkpointing and JSONL/TensorBoard metric logging).
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _deep_update(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v
    return dst

from rdeic_tpu.parallel.mesh import batch_sharding, make_mesh
from rdeic_tpu.registry import instantiate_from_config, load_yaml
from rdeic_tpu.train.trainer import Trainer
from rdeic_tpu.utils.checkpoint_io import (
    list_checkpoints,
    restore_train_checkpoint,
    save_train_checkpoint,
)


class MetricLogger:
    """JSONL metrics + optional TensorBoard (if tensorboardX is present)."""

    def __init__(self, out_dir: str):
        self.path = Path(out_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._tb = None
        try:  # pragma: no cover - optional dep
            from tensorboardX import SummaryWriter  # noqa: PLC0415

            self._tb = SummaryWriter(str(Path(out_dir) / "tb"))
        except Exception:
            pass

    def log(self, step: int, metrics: dict):
        row = {"step": step}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        with self.path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        if self._tb is not None:
            for k, v in row.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)


def main():
    from rdeic_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    ap = argparse.ArgumentParser()
    from rdeic_tpu.utils.backend import add_platform_arg, apply_platform

    add_platform_arg(ap)
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--max_steps", type=int, default=None)
    args = ap.parse_args()
    apply_platform(args.platform)

    cfg = load_yaml(args.config)
    tcfg = cfg.get("trainer", {})
    seed = int(tcfg.get("seed", 231))

    data = instantiate_from_config(cfg["data"])
    model_cfg = load_yaml(cfg["model"]["config"])
    # model.overrides: deep-merged into the model YAML's params (the
    # Lightning-config analog of per-run hyperparameter overrides, e.g.
    # use_checkpoint / remat_policy / is_refine without a config fork)
    _deep_update(model_cfg.setdefault("params", {}),
                 cfg.get("model", {}).get("overrides") or {})
    model = instantiate_from_config(model_cfg)
    compute_dtype = tcfg.get("compute_dtype")
    if compute_dtype:
        model.set_compute_dtype(jnp.dtype(compute_dtype))
        print(f"[compute dtype: {compute_dtype}]")

    mesh_cfg = tcfg.get("mesh") or {}
    mesh = make_mesh(dp=mesh_cfg.get("dp"), tp=int(mesh_cfg.get("tp") or 1))

    frozen_dtype = tcfg.get("frozen_dtype")
    trainer = Trainer(
        model,
        learning_rate=tcfg.get("learning_rate"),
        accumulate_grad_batches=int(tcfg.get("accumulate_grad_batches", 1)),
        mesh=mesh,
        frozen_dtype=jnp.dtype(frozen_dtype) if frozen_dtype else None,
    )

    out_dir = tcfg.get("out_dir", "./runs/rdeic")
    ckpt_dir = str(Path(out_dir) / "checkpoints")
    loader = data.train_dataloader()
    sample = next(iter(loader))
    image_hw = sample["jpg"].shape[1:3]

    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    if tcfg.get("fast_init"):
        # from-scratch full-width runs: skip the monolithic init compile
        # (minutes over a remote-TPU tunnel); values are variance-preserving
        # random — the reference's analog loads sync_path SD weights instead
        from rdeic_tpu.utils.fast_init import fast_random_params

        params = fast_random_params(model, tuple(image_hw), seed=seed,
                                    device=False)
    else:
        params = model.init_params(init_rng, image_hw=tuple(image_hw))
    resume = cfg.get("model", {}).get("resume")
    # sync_path: SD 2.1 torch checkpoint -> converted into the fresh params
    # (with control-weight sync, rdeic.py:962-991) when not resuming.
    sync_path = getattr(model, "sync_path", None)
    if sync_path and Path(sync_path).exists() and not resume:
        from rdeic_tpu.utils.torch_convert import (
            convert_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(sync_path)
        params, missing = convert_state_dict(
            sd, params, model, sync_control=bool(model.synch_control)
        )
        print(f"[synced base weights from {sync_path}; "
              f"{len(missing)} keys stay random]")
    if resume and str(resume).endswith(".npz"):
        from rdeic_tpu.utils.checkpoint_io import warm_start_overlay

        params, kept = warm_start_overlay(params, resume)
        if kept:
            tops = sorted({k[0] for k in kept})
            print(f"[warm start from {resume}; fresh subtrees kept: {tops}]")
    state = trainer.init_state(params, rng)
    # drop the pre-partition tree: init_state re-casts the frozen subtree
    # (e.g. bf16 storage), and holding the fp32 originals alive would pin
    # ~3.8 GB of dead weight copies in HBM at full width
    del params
    start_step = 0
    if resume and not str(resume).endswith(".npz") and list_checkpoints(resume):
        # capture each leaf's mesh sharding BEFORE restore so the restored
        # numpy leaves are device_put straight to their tp/dp shards — a
        # blanket jnp.asarray would peak the whole 1B-param state + optimizer
        # in one chip's HBM before the first sharded step
        _unset = object()
        shardings = jax.tree_util.tree_map(
            lambda x: x.sharding if isinstance(x, jax.Array) else _unset, state
        )
        state, start_step = restore_train_checkpoint(resume, state)
        state = jax.tree_util.tree_map(
            lambda x, s: jnp.asarray(x) if s is _unset else jax.device_put(x, s),
            state, shardings,
        )
        print(f"[resumed full train state from step {start_step}]")

    logger = MetricLogger(out_dir)
    max_steps = args.max_steps or int(tcfg.get("max_steps", 100000))
    log_every = int(tcfg.get("log_every_n_steps", 50))
    ckpt_every = int(tcfg.get("ckpt_every_n_steps", 5000))
    val_every = int(tcfg.get("val_check_interval", 0))
    val_loader = data.val_dataloader()
    from rdeic_tpu.train.callbacks import ImageLogger
    from rdeic_tpu.train.validation import run_validation

    image_logger = ImageLogger(
        out_dir, every_n_steps=int(tcfg.get("image_log_every_n_steps", 2000))
    )

    bshard = batch_sharding(mesh)
    step = start_step
    t0 = time.time()
    from rdeic_tpu.data.dataset import device_prefetch

    def _put(batch):
        return jax.device_put(batch["jpg"].astype(np.float32), bshard)

    while step < max_steps:
        # device-side prefetch: batch k+1 uploads while step k computes
        # (the transfer is ~25 MB at B=8 512px — serialized it costs half
        # a step through a remote-TPU tunnel)
        for img, batch in device_prefetch(loader, _put):
            state, logs = trainer.step(state, img)
            step += 1
            if step % log_every == 0:
                logs = {k: v for k, v in logs.items() if not k.startswith("_")}
                logs["steps_per_sec"] = log_every / (time.time() - t0)
                t0 = time.time()
                logger.log(step, logs)
                print(f"step {step}: " + ", ".join(
                    f"{k}={float(v):.4g}" for k, v in logs.items()
                ))
            if step % ckpt_every == 0:
                t_ck = time.time()
                path = save_train_checkpoint(
                    ckpt_dir, step, state,
                    keep=int(tcfg.get("ckpt_keep", -1)),
                )
                print(f"[checkpoint saved: {path} "
                      f"({time.time() - t_ck:.0f}s)]")
            try:
                image_logger.maybe_log(
                    model, trainer.params(state), batch["jpg"], step,
                    jax.random.PRNGKey(step),
                )
            except Exception as e:  # logging must never kill training
                print(f"[image log failed: {e}]")
            if val_every and val_loader is not None and step % val_every == 0:
                vm = run_validation(
                    model, trainer.params(state), val_loader,
                    jax.random.PRNGKey(step), max_batches=8,
                )
                logger.log(step, vm)
                print(f"validation @ {step}: {vm}")
            if step >= max_steps:
                break
    save_train_checkpoint(ckpt_dir, step, state)
    print("done")


if __name__ == "__main__":
    main()
