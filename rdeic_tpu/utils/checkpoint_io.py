"""Orbax checkpointing: full train-state save/resume.

Role parity: PL ModelCheckpoint (model/callbacks.py:17-20, every_n_train_steps)
— upgraded to restore optimizer state as well (the reference leaves resume as
a weights-only TODO, train.py:20-22).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def fetch_tree(tree: Any, retries: int = 4) -> Any:
    """Device->host fetch, leaf by leaf, with retry.

    Through a remote-TPU tunnel a monolithic `jax.device_get` of a
    multi-GB train state can fail with RESOURCE_EXHAUSTED mid-transfer
    (observed on the 1.03B-param state; link runs ~20 MB/s). Per-leaf
    fetch with backoff rides out transient tunnel pressure.
    """
    import time  # noqa: PLC0415

    # only transient transfer failures are worth retrying; a deterministic
    # error (bad buffer, INVALID_ARGUMENT) must surface immediately
    _TRANSIENT = ("RESOURCE_EXHAUSTED", "UNAVAILABLE", "DEADLINE_EXCEEDED",
                  "transfer", "Connection reset")

    def get(x):
        if not isinstance(x, jax.Array):
            return x
        for attempt in range(retries):
            try:
                return np.asarray(x)
            except Exception as e:  # jax.errors.JaxRuntimeError and kin
                if attempt == retries - 1 or not any(
                    t in str(e) for t in _TRANSIENT
                ):
                    raise
                time.sleep(1.5 * (attempt + 1))

    return jax.tree_util.tree_map(get, tree)


def frozen_fingerprint(frozen_static: Any) -> str:
    """Content fingerprint of the frozen subtree, cheap enough to compute
    on every save (one device program + one ~100 KB fetch).

    Hashes leaf paths, shapes, dtypes, and 64 exactly-sampled elements per
    leaf (strided gather, cast f32 — a deterministic byte pattern on every
    backend, unlike reduction-order-sensitive sums). Guards a checkpoint
    dir against being reused across runs whose frozen weights differ
    (different seed / warm start / model overrides), which would silently
    pair a stale frozen tree with new trainables on restore.
    """
    import hashlib  # noqa: PLC0415

    import jax.numpy as jnp  # noqa: PLC0415
    from flax.traverse_util import flatten_dict  # noqa: PLC0415

    flat = flatten_dict(frozen_static)
    keys = sorted(flat.keys())
    leaves = [flat[k] for k in keys]

    def probe(x):
        v = jnp.ravel(jnp.asarray(x))
        idx = np.linspace(0, v.shape[0] - 1, min(64, v.shape[0])).astype(
            np.int32
        )
        return v[idx].astype(jnp.float32)

    samples = np.asarray(
        jax.jit(lambda ls: jnp.concatenate([probe(x) for x in ls]))(leaves)
    )
    h = hashlib.sha256()
    for k, x in zip(keys, leaves):
        h.update("/".join(k).encode())
        h.update(str(tuple(np.shape(x))).encode())
        h.update(str(x.dtype if hasattr(x, "dtype") else np.asarray(x).dtype
                     ).encode())
    h.update(samples.tobytes())
    return h.hexdigest()


def save_train_checkpoint(ckpt_dir: str, step: int, state: Any, keep: int = -1):
    """Split train-state checkpoint sized for a slow device->host link.

    The frozen subtree (953M SD weights at full width) is immutable during
    training, so it is written ONCE to `<ckpt_dir>/frozen`; every step
    save then transfers only the trainables + optimizer + step/rng
    (`step_<N>` dirs) — ~10x less per-save traffic at full width. The one
    mutable "frozen" leaf — the codebook usage EMA `vq_embed_prob`,
    updated every step for dead-code reinit — rides in the step save.
    Layout is understood by restore_train_checkpoint and
    load_inference_params.
    """
    base = Path(ckpt_dir).absolute()
    ckptr = ocp.StandardCheckpointer()
    frozen_static = {k: v for k, v in state.frozen_params.items()
                     if k != "vq_embed_prob"}
    fp = frozen_fingerprint(frozen_static)
    stamp = base / "frozen_fingerprint.txt"
    if not (base / "frozen").exists():
        ckptr.save(base / "frozen", fetch_tree(frozen_static), force=True)
        ckptr.wait_until_finished()
        base.mkdir(parents=True, exist_ok=True)
        stamp.write_text(fp + "\n")
    elif stamp.exists():
        saved = stamp.read_text().strip()
        if saved != fp:
            raise ValueError(
                f"{base}/frozen was written by a run with DIFFERENT frozen "
                f"weights (stamp {saved[:12]}… != current {fp[:12]}…). "
                "Reusing it would silently pair a stale frozen tree with new "
                "trainables on restore — save into a fresh --ckpt_dir."
            )
    else:
        import warnings  # noqa: PLC0415

        warnings.warn(
            f"{base}/frozen has no fingerprint stamp (pre-round-4 layout); "
            "assuming it matches the current frozen weights and stamping it.",
            stacklevel=2,
        )
        stamp.write_text(fp + "\n")
    small = {
        "step": np.asarray(state.step),
        "train_params": fetch_tree(state.train_params),
        "opt_state": fetch_tree(state.opt_state),
        "rng": np.asarray(state.rng),
        "ema_params": fetch_tree(state.ema_params),
        "frozen_mutable": fetch_tree({
            k: v for k, v in state.frozen_params.items()
            if k == "vq_embed_prob"
        }),
    }
    path = base / f"step_{step}"
    ckptr.save(path, small, force=True)
    ckptr.wait_until_finished()
    if keep > 0:
        for s in sorted(list_checkpoints(ckpt_dir))[:-keep]:
            import shutil  # noqa: PLC0415

            shutil.rmtree(base / f"step_{s}", ignore_errors=True)
    return str(path)


def restore_train_checkpoint(
    ckpt_dir: str, template_state: Any, step: Optional[int] = None
) -> tuple[Any, int]:
    """Restore a split checkpoint (see save_train_checkpoint) into a
    TrainState built by Trainer.init_state. Falls back to the monolithic
    layout when no `frozen` dir exists."""
    base = Path(ckpt_dir).absolute()
    if not (base / "frozen").exists():
        return restore_checkpoint(ckpt_dir, template_state, step)
    steps = list_checkpoints(ckpt_dir)
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    step = step if step is not None else steps[-1]
    ckptr = ocp.StandardCheckpointer()
    tpl_frozen = jax.device_get(template_state.frozen_params)
    frozen = ckptr.restore(
        base / "frozen",
        {k: v for k, v in tpl_frozen.items() if k != "vq_embed_prob"},
    )
    small_tpl = {
        "step": np.asarray(template_state.step),
        "train_params": jax.device_get(template_state.train_params),
        "opt_state": jax.device_get(template_state.opt_state),
        "rng": np.asarray(template_state.rng),
        "ema_params": jax.device_get(template_state.ema_params),
        "frozen_mutable": {k: v for k, v in tpl_frozen.items()
                           if k == "vq_embed_prob"},
    }
    small = ckptr.restore(base / f"step_{step}", small_tpl)
    frozen = dict(frozen)
    frozen.update(small["frozen_mutable"])
    state = template_state.replace(
        step=small["step"], train_params=small["train_params"],
        opt_state=small["opt_state"], rng=small["rng"],
        ema_params=small["ema_params"], frozen_params=frozen,
    )
    return state, step


def save_checkpoint(ckpt_dir: str, step: int, tree: Any, keep: int = -1):
    """Save a pytree checkpoint at `ckpt_dir/step_<N>`."""
    path = Path(ckpt_dir).absolute() / f"step_{step}"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    if keep > 0:
        steps = sorted(list_checkpoints(ckpt_dir))
        for s in steps[:-keep]:
            import shutil  # noqa: PLC0415

            shutil.rmtree(Path(ckpt_dir).absolute() / f"step_{s}", ignore_errors=True)
    return str(path)


def list_checkpoints(ckpt_dir: str) -> list[int]:
    p = Path(ckpt_dir)
    if not p.exists():
        return []
    out = []
    for d in p.iterdir():
        if d.is_dir() and d.name.startswith("step_"):
            try:
                out.append(int(d.name.split("_")[1]))
            except ValueError:
                pass
    return sorted(out)


def restore_checkpoint(
    ckpt_dir: str, template: Any, step: Optional[int] = None
) -> tuple[Any, int]:
    """Restore the latest (or given-step) checkpoint into template's structure."""
    steps = list_checkpoints(ckpt_dir)
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    step = step if step is not None else steps[-1]
    path = Path(ckpt_dir).absolute() / f"step_{step}"
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, template)
    return restored, step


def load_inference_params(path: str, cast_denoiser_bf16: bool = False) -> Any:
    """Load merged model params for inference from either format:

    - `*.npz` — flat params export (converter / save_params_npz)
    - an orbax train-state checkpoint: a `step_N` dir, or a checkpoint
      dir containing them (latest wins) — restored raw (no template) and
      the train/frozen subtrees merged back into one params tree

    Closes the train.py -> checkpoint -> inference.py loop without an
    export step (reference leaves resume/export as a TODO, train.py:20-22).

    The returned tree is DEVICE-RESIDENT: restored leaves are host numpy,
    and feeding numpy into a jitted call re-uploads all ~2-5 GB of weights
    on EVERY call (measured 1.6 s -> 45.7 s per decode over the device
    link). `cast_denoiser_bf16` applies RDEIC.cast_inference_params on the
    host FIRST so only the bf16 bytes cross the link once.
    """

    def _finish(tree):
        if cast_denoiser_bf16:
            from rdeic_tpu.pipeline.rdeic import RDEIC  # noqa: PLC0415

            tree = RDEIC.cast_inference_params(tree)
        return jax.device_put(tree)

    if str(path).endswith(".npz"):
        return _finish(load_params_npz(path))
    p = Path(path)
    frozen_dir = None
    if p.is_dir() and not p.name.startswith("step_"):
        steps = list_checkpoints(str(p))
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        if (p / "frozen").exists():
            frozen_dir = p / "frozen"
        p = p / f"step_{steps[-1]}"
    elif (p.parent / "frozen").exists():
        frozen_dir = p.parent / "frozen"
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(p.absolute())
    from rdeic_tpu.train.trainer import merge_params  # noqa: PLC0415

    if frozen_dir is not None:  # split layout (save_train_checkpoint)
        if not (isinstance(raw, dict) and "train_params" in raw):
            raise ValueError(f"{p} is not a train-state checkpoint")
        frozen = dict(ckptr.restore(frozen_dir.absolute()))
        frozen.update(raw.get("frozen_mutable") or {})
        return _finish(merge_params(raw["train_params"], frozen))
    if not (isinstance(raw, dict) and {"train_params", "frozen_params"} <= set(raw)):
        raise ValueError(f"{p} is not a train-state checkpoint")
    return _finish(merge_params(raw["train_params"], raw["frozen_params"]))


def save_params_npz(path: str, params: Any):
    """Portable flat .npz export of a params pytree (for weight exchange).

    Extension float dtypes (ml_dtypes bfloat16 etc.) are upcast to float32:
    numpy serializes them as opaque void (`|V2`) records that jit cannot
    interpret on reload. The upcast is lossless.
    """
    from flax.traverse_util import flatten_dict  # noqa: PLC0415

    def leaf(v):
        a = np.asarray(v)
        if a.dtype.kind == "V":  # ml_dtypes float (bfloat16/f8) leaf
            a = a.astype(np.float32)
        return a

    flat = {
        "/".join(k): leaf(v) for k, v in flatten_dict(params).items()
    }
    np.savez(path, **flat)


def warm_start_overlay(params: Any, npz_path: str) -> tuple[Any, list]:
    """Overlay saved weights onto a fresh params tree, keeping subtrees
    the source run did not have (e.g. phase 1 has no "lpips" net; the
    refine model needs one) — load_state_dict(strict=False) semantics for
    phase switches. Host-side; returns (merged tree, kept fresh keys)."""
    from flax.traverse_util import flatten_dict, unflatten_dict  # noqa: PLC0415

    flat = dict(flatten_dict(params))
    loaded = flatten_dict(load_params_npz(npz_path, device=False))
    kept = [k for k in flat if k not in loaded]
    flat.update({k: v for k, v in loaded.items() if k in flat})
    return unflatten_dict(flat), kept


def load_params_npz(path: str, device: bool = True) -> Any:
    """device=False returns host (numpy) leaves — warm-start flows keep
    the tree on host so only the final merged state is uploaded."""
    from flax.traverse_util import unflatten_dict  # noqa: PLC0415

    data = np.load(path)

    def conv(x):
        if x.dtype.kind == "V" and x.dtype.itemsize == 2:
            # pre-fix export of an ml_dtypes bfloat16 leaf (opaque |V2
            # record): reinterpret the bytes as bfloat16
            import ml_dtypes  # noqa: PLC0415

            x = x.view(ml_dtypes.bfloat16)
        return jax.numpy.asarray(x) if device else x

    flat = {tuple(k.split("/")): conv(data[k]) for k in data.files}
    return unflatten_dict(flat)
