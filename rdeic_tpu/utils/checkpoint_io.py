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


def load_inference_params(path: str) -> Any:
    """Load merged model params for inference from either format:

    - `*.npz` — flat params export (converter / save_params_npz)
    - an orbax train-state checkpoint: a `step_N` dir, or a checkpoint
      dir containing them (latest wins) — restored raw (no template) and
      the train/frozen subtrees merged back into one params tree

    Closes the train.py -> checkpoint -> inference.py loop without an
    export step (reference leaves resume/export as a TODO, train.py:20-22).
    """
    if str(path).endswith(".npz"):
        return load_params_npz(path)
    p = Path(path)
    if p.is_dir() and not p.name.startswith("step_"):
        steps = list_checkpoints(str(p))
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {path}")
        p = p / f"step_{steps[-1]}"
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(p.absolute())
    if not (isinstance(raw, dict) and {"train_params", "frozen_params"} <= set(raw)):
        raise ValueError(f"{p} is not a train-state checkpoint")
    from rdeic_tpu.train.trainer import merge_params  # noqa: PLC0415

    return merge_params(raw["train_params"], raw["frozen_params"])


def save_params_npz(path: str, params: Any):
    """Portable flat .npz export of a params pytree (for weight exchange)."""
    from flax.traverse_util import flatten_dict  # noqa: PLC0415

    flat = {
        "/".join(k): np.asarray(v) for k, v in flatten_dict(params).items()
    }
    np.savez(path, **flat)


def load_params_npz(path: str) -> Any:
    from flax.traverse_util import unflatten_dict  # noqa: PLC0415

    data = np.load(path)
    flat = {tuple(k.split("/")): jax.numpy.asarray(data[k]) for k in data.files}
    return unflatten_dict(flat)
