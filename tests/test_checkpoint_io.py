"""Orbax train-state checkpointing: save/restore round-trip, resume
semantics, and inference-params loading straight from a train checkpoint.

Role parity: the reference leaves full-state resume as a TODO
(/root/reference/train.py:20-22); this pins the upgraded behavior.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.helpers import micro_rdeic


@pytest.fixture(scope="module")
def trained_state():
    from rdeic_tpu.train.trainer import Trainer

    model = micro_rdeic()
    params = model.init_params(jax.random.PRNGKey(0), image_hw=(32, 32))
    trainer = Trainer(model, frozen_dtype=jnp.bfloat16)
    state = trainer.init_state(params, jax.random.PRNGKey(1))
    img = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)), jnp.float32
    )
    state, _ = trainer.step(state, img)
    return model, trainer, state, img


def test_save_restore_roundtrip(trained_state, tmp_path):
    from rdeic_tpu.utils.checkpoint_io import (
        list_checkpoints,
        restore_checkpoint,
        save_checkpoint,
    )

    model, trainer, state, img = trained_state
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, 1, jax.device_get(state))
    assert list_checkpoints(ckpt_dir) == [1]

    template = jax.tree_util.tree_map(np.zeros_like, jax.device_get(state))
    restored, step = restore_checkpoint(ckpt_dir, template)
    assert step == 1
    a = jax.tree_util.tree_leaves(jax.device_get(state))
    b = jax.tree_util.tree_leaves(restored)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    # dtypes survive (frozen bf16, trainables fp32)
    assert all(np.asarray(x).dtype == np.asarray(y).dtype for x, y in zip(a, b))

    # resumed training continues without recompile errors
    state2, logs = trainer.step(
        jax.tree_util.tree_map(jnp.asarray, restored), img
    )
    assert np.isfinite(float(logs["loss"]))
    assert int(state2.step) == int(state.step) + 1


def test_keep_prunes_old_checkpoints(trained_state, tmp_path):
    from rdeic_tpu.utils.checkpoint_io import list_checkpoints, save_checkpoint

    _, _, state, _ = trained_state
    host = jax.device_get(state)
    ckpt_dir = str(tmp_path / "ckpts")
    for s in (1, 2, 3):
        save_checkpoint(ckpt_dir, s, host, keep=2)
    assert list_checkpoints(ckpt_dir) == [2, 3]


def test_load_inference_params_from_train_ckpt(trained_state, tmp_path):
    """An orbax train-state dir loads as merged inference params that are
    byte-identical to the in-memory merged tree, and decode runs on them."""
    from rdeic_tpu.utils.checkpoint_io import (
        load_inference_params,
        save_checkpoint,
    )

    model, trainer, state, _ = trained_state
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, 5, jax.device_get(state))

    for path in (ckpt_dir, str(tmp_path / "ckpts" / "step_5")):
        loaded = load_inference_params(path)
        ref = jax.device_get(trainer.params(state))
        a = jax.tree_util.tree_leaves(ref)
        b = jax.tree_util.tree_leaves(jax.device_get(loaded))
        assert all(np.array_equal(x, y) for x, y in zip(a, b))

    cl = jnp.zeros((1, 16, 16, 4))
    gh = jnp.zeros((1, 16, 16, model.denoiser.hint_channels))
    out = model.jitted_decode(steps=2)(
        jax.tree_util.tree_map(jnp.asarray, loaded), cl, gh,
        jax.random.PRNGKey(2),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_split_checkpoint_roundtrip(trained_state, tmp_path):
    """save_train_checkpoint writes the frozen subtree once + small step
    dirs; restore_train_checkpoint reassembles the exact state; the split
    layout also feeds load_inference_params (the serving path)."""
    from rdeic_tpu.utils.checkpoint_io import (
        list_checkpoints,
        load_inference_params,
        restore_train_checkpoint,
        save_train_checkpoint,
    )

    model, trainer, state, img = trained_state
    ckpt_dir = str(tmp_path / "split")
    save_train_checkpoint(ckpt_dir, 1, state)
    img2 = jnp.asarray(np.asarray(img))  # state will be donated by step
    state2, _ = trainer.step(
        jax.tree_util.tree_map(jnp.asarray, jax.device_get(state)), img2
    )
    save_train_checkpoint(ckpt_dir, 2, state2, keep=1)
    # frozen written once; keep=1 pruned step_1
    assert (tmp_path / "split" / "frozen").exists()
    assert list_checkpoints(ckpt_dir) == [2]

    fresh = jax.tree_util.tree_map(
        jnp.asarray, jax.device_get(trainer.params(state2))
    )
    template = trainer.init_state(fresh, jax.random.PRNGKey(9))
    restored, step = restore_train_checkpoint(ckpt_dir, template)
    assert step == 2
    a = jax.tree_util.tree_leaves(jax.device_get(state2))
    b = jax.tree_util.tree_leaves(jax.device_get(restored))
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))

    merged = load_inference_params(ckpt_dir)
    ref = jax.device_get(trainer.params(restored))
    a = jax.tree_util.tree_leaves(ref)
    b = jax.tree_util.tree_leaves(jax.device_get(merged))
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))


def test_frozen_fingerprint_guards_ckpt_dir_reuse(trained_state, tmp_path):
    """Saving into a checkpoint dir whose frozen tree came from DIFFERENT
    frozen weights must refuse (round-3 advisor medium: silent stale-frozen
    pairing); re-saving with the SAME frozen weights stays allowed."""
    from rdeic_tpu.train.trainer import Trainer
    from rdeic_tpu.utils.checkpoint_io import save_train_checkpoint

    model, trainer, state, img = trained_state
    ckpt_dir = str(tmp_path / "guard")
    save_train_checkpoint(ckpt_dir, 1, state)
    assert (tmp_path / "guard" / "frozen_fingerprint.txt").exists()
    # same frozen weights, later step: fine
    save_train_checkpoint(ckpt_dir, 2, state)

    # a different init seed -> different frozen weights -> refuse
    params2 = model.init_params(jax.random.PRNGKey(42), image_hw=(32, 32))
    other = Trainer(model, frozen_dtype=jnp.bfloat16).init_state(
        params2, jax.random.PRNGKey(1)
    )
    with pytest.raises(ValueError, match="DIFFERENT frozen weights"):
        save_train_checkpoint(ckpt_dir, 3, other)

    # legacy dir (no stamp): warn once, stamp, and proceed
    (tmp_path / "guard" / "frozen_fingerprint.txt").unlink()
    with pytest.warns(UserWarning, match="no fingerprint stamp"):
        save_train_checkpoint(ckpt_dir, 4, state)
    assert (tmp_path / "guard" / "frozen_fingerprint.txt").exists()


def test_warm_start_overlay(tmp_path):
    """Phase-switch warm start: loaded weights overwrite matching keys,
    fresh-only subtrees survive, loader stays host-side."""
    import numpy as np

    from rdeic_tpu.utils.checkpoint_io import (
        save_params_npz,
        warm_start_overlay,
    )

    saved = {"a": {"w": np.ones((2, 2), np.float32)},
             "b": {"k": np.full((3,), 7.0, np.float32)}}
    p = str(tmp_path / "phase1.npz")
    save_params_npz(p, saved)

    fresh = {"a": {"w": np.zeros((2, 2), np.float32)},
             "b": {"k": np.zeros((3,), np.float32)},
             "lpips": {"lin": np.full((4,), 0.5, np.float32)}}
    merged, kept = warm_start_overlay(fresh, p)
    assert np.array_equal(merged["a"]["w"], saved["a"]["w"])
    assert np.array_equal(merged["b"]["k"], saved["b"]["k"])
    assert np.array_equal(merged["lpips"]["lin"], fresh["lpips"]["lin"])
    assert kept == [("lpips", "lin")]
    assert all(isinstance(x, np.ndarray)
               for x in jax.tree_util.tree_leaves(merged))


def test_load_inference_params_npz(trained_state, tmp_path):
    from rdeic_tpu.utils.checkpoint_io import (
        load_inference_params,
        save_params_npz,
    )

    model, trainer, state, _ = trained_state
    params = jax.device_get(trainer.params(state))
    # npz export casts to fp32-storable dtypes upstream of save
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating) or
        str(np.asarray(x).dtype) == "bfloat16" else np.asarray(x),
        params,
    )
    p = str(tmp_path / "params.npz")
    save_params_npz(p, params)
    loaded = load_inference_params(p)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(jax.device_get(loaded))
    assert all(np.allclose(np.asarray(x, np.float32), np.asarray(y, np.float32))
               for x, y in zip(a, b))


def test_save_params_npz_bf16_roundtrip(tmp_path):
    """bf16 leaves (frozen_dtype storage) must survive the npz round trip
    as real floats: numpy would otherwise serialize ml_dtypes bfloat16 as
    opaque |V2 records that jit cannot interpret on reload (seen on the
    round-4 phase-1 export)."""
    import ml_dtypes
    import numpy as np

    from rdeic_tpu.utils.checkpoint_io import (
        load_params_npz,
        save_params_npz,
    )

    vals = np.arange(6, dtype=np.float32).reshape(2, 3)
    tree = {"frozen": {"w": vals.astype(ml_dtypes.bfloat16)},
            "train": {"k": np.full((3,), 7.0, np.float32)}}
    p = str(tmp_path / "bf16.npz")
    save_params_npz(p, tree)

    raw = np.load(p)
    assert all(raw[k].dtype.kind != "V" for k in raw.files)

    back = load_params_npz(p, device=False)
    assert back["frozen"]["w"].dtype == np.float32  # lossless upcast
    assert np.array_equal(back["frozen"]["w"], vals)
    assert np.array_equal(back["train"]["k"], tree["train"]["k"])


def test_load_params_npz_legacy_v2(tmp_path):
    """Pre-fix exports hold |V2 bf16 leaves; the loader reinterprets the
    bytes as bfloat16 instead of handing jit an opaque record."""
    import ml_dtypes
    import numpy as np

    from rdeic_tpu.utils.checkpoint_io import load_params_npz

    vals = np.arange(4, dtype=np.float32).astype(ml_dtypes.bfloat16)
    legacy = vals.view(np.dtype("V2"))  # what np.savez wrote pre-fix
    p = str(tmp_path / "legacy.npz")
    np.savez(p, **{"frozen/w": legacy})
    back = load_params_npz(p, device=False)
    assert back["frozen"]["w"].dtype == ml_dtypes.bfloat16
    assert np.array_equal(back["frozen"]["w"].astype(np.float32),
                          vals.astype(np.float32))


def test_load_inference_params_is_device_resident(tmp_path):
    """Feeding host-numpy params into a jitted call re-uploads every leaf
    on EVERY call (measured 1.6 s -> 45.7 s per full-width decode over the
    device link) — load_inference_params must return committed device
    arrays, with the optional bf16 cast applied BEFORE the upload."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from rdeic_tpu.utils.checkpoint_io import (
        load_inference_params,
        save_params_npz,
    )

    tree = {"vae": {"w": np.ones((4, 4), np.float32)},
            "compression": {"b": np.zeros((3,), np.float32)}}
    path = str(tmp_path / "p.npz")
    save_params_npz(path, tree)

    loaded = load_inference_params(path)
    for leaf in jax.tree_util.tree_leaves(loaded):
        assert isinstance(leaf, jax.Array)

    cast = load_inference_params(path, cast_denoiser_bf16=True)
    assert cast["vae"]["w"].dtype == jnp.bfloat16
    assert cast["compression"]["b"].dtype == jnp.float32  # codec stays fp32
    for leaf in jax.tree_util.tree_leaves(cast):
        assert isinstance(leaf, jax.Array)
