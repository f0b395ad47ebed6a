"""Data pipeline + trainer-state unit tests (no heavy compiles)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from rdeic_tpu.data.dataset import DataLoader, LICDataset
from rdeic_tpu.train.ema import ema_init, ema_update
from rdeic_tpu.train.trainer import (
    merge_params,
    partition_params,
    trainable_predicate,
)
from rdeic_tpu.utils.image import augment, center_crop_arr, pad, random_crop_arr


@pytest.fixture()
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(5):
        arr = rng.integers(0, 255, (80 + i, 100, 3), dtype=np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    lst = tmp_path / "train.list"
    lst.write_text("\n".join(paths) + "\n")
    return str(lst)


def test_dataset_and_loader(image_dir):
    ds = LICDataset(image_dir, out_size=64, crop_type="random", seed=0)
    item = ds[0]
    assert item["jpg"].shape == (64, 64, 3)
    assert item["jpg"].min() >= -1 and item["jpg"].max() <= 1
    assert item["txt"] == ""
    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=1)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["jpg"].shape == (2, 64, 64, 3)
    # different epochs shuffle differently
    b2 = list(loader)
    assert len(b2) == 2


def test_dataset_ram_cache(image_dir):
    """cache_size keeps decoded images in RAM (no re-decode), caps entries
    FIFO, and random crops still differ between accesses."""
    ds = LICDataset(image_dir, out_size=64, crop_type="random", seed=0,
                    cache_size=3)
    for i in range(5):
        ds[i]
    assert len(ds._cache) == 3
    calls = []
    orig = ds._load_uncached
    ds._load_uncached = lambda p: (calls.append(p), orig(p))[1]
    a = ds[4]["jpg"]  # cached (last 3 of 5 inserted)
    b = ds[4]["jpg"]
    assert calls == []
    assert a.shape == b.shape == (64, 64, 3)
    ds[0]  # evicted earlier -> re-decoded
    assert len(calls) == 1


def test_crops_and_pad():
    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (100, 140, 3), dtype=np.uint8)
    )
    assert center_crop_arr(img, 64).shape == (64, 64, 3)
    assert random_crop_arr(img, 64).shape == (64, 64, 3)
    arr = np.zeros((70, 130, 3), np.float32)
    p = pad(arr, 64)
    assert p.shape == (128, 192, 3)
    out = augment(np.zeros((8, 8, 3)), hflip=True, rotation=True)
    assert out.shape[2] == 3


def test_trainable_partition():
    params = {
        "compression": {"w": jnp.ones(2)},
        "denoiser": {
            "base": {"out_0": {"w": jnp.ones(2)}, "in_0": {"w": jnp.ones(2)},
                     "out_conv": {"k": jnp.ones(2)}},
            "control": {"w": jnp.ones(2)},
            "enc_zero_convs_out_0": {"k": jnp.ones(2)},
        },
        "vae": {"w": jnp.ones(2)},
        "uncond_context": jnp.ones(2),
    }
    pred = trainable_predicate(sd_locked=True)
    train, frozen = partition_params(params, pred)
    assert "compression" in train
    assert "control" in train["denoiser"]
    assert "enc_zero_convs_out_0" in train["denoiser"]
    assert "base" not in train["denoiser"]
    assert "vae" in frozen and "uncond_context" in frozen
    merged = merge_params(train, frozen)
    assert set(merged) == set(params)

    pred2 = trainable_predicate(sd_locked=False)
    train2, _ = partition_params(params, pred2)
    assert "out_0" in train2["denoiser"]["base"]
    assert "out_conv" in train2["denoiser"]["base"]
    assert "in_0" not in train2["denoiser"]["base"]


def test_ema():
    p = {"a": jnp.zeros(3)}
    shadow = ema_init(p)
    p2 = {"a": jnp.ones(3)}
    s = ema_update(shadow, p2, decay=0.5)
    np.testing.assert_allclose(np.asarray(s["a"]), 0.5)
    s2 = ema_update(shadow, p2, decay=0.9999, step=jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(s2["a"]), 0.9, atol=1e-6)


def test_device_prefetch_order_and_drain():
    """device_prefetch must yield every batch exactly once, in order, with
    put_fn applied, including the tail still in the buffer at exhaustion."""
    from rdeic_tpu.data.dataset import device_prefetch

    batches = [{"jpg": i} for i in range(5)]
    put_calls = []

    def put(b):
        put_calls.append(b["jpg"])
        return b["jpg"] * 10

    out = list(device_prefetch(batches, put, depth=2))
    assert [d for d, _ in out] == [0, 10, 20, 30, 40]
    assert [h["jpg"] for _, h in out] == [0, 1, 2, 3, 4]
    assert put_calls == [0, 1, 2, 3, 4]


def test_device_prefetch_stays_ahead():
    """put_fn for batch k+1 must run before batch k is consumed."""
    from rdeic_tpu.data.dataset import device_prefetch

    events = []
    batches = [{"jpg": i} for i in range(3)]
    gen = device_prefetch(batches, lambda b: events.append(("put", b["jpg"])), depth=2)
    next(gen)
    events.append(("consume", 0))
    # after consuming batch 0, batches 0 AND 1 must already be uploaded
    assert ("put", 1) in events[:2]


def test_finetune_ood_recipe_mask():
    """The OOD fine-tune recipe (configs/finetune_ood.yaml, reference
    README.md:175-198) must train ONLY compression + control: sd_locked
    stays true in the model config, so the SD UNet ('denoiser/base') is
    frozen while preprocess (compression) and the control module adapt."""
    from rdeic_tpu.registry import load_yaml

    run_cfg = load_yaml("configs/finetune_ood.yaml")
    model_cfg = load_yaml(run_cfg["model"]["config"])
    p = model_cfg["params"]
    assert p["sd_locked"] is True
    assert p["is_refine"] is False  # light adaptation: single-step loss
    # the recipe warm-starts from pretrained weights, never SD sync
    assert run_cfg["model"].get("resume")
    assert p["sync_path"] is None

    pred = trainable_predicate(sd_locked=p["sd_locked"])
    assert pred(("compression", "vq_embedding"))
    assert pred(("denoiser", "control", "w"))
    assert pred(("denoiser", "enc_zero_convs_out_0", "k"))
    assert not pred(("denoiser", "base", "out_0"))  # UNet frozen
    assert not pred(("denoiser", "base", "in_0"))
    assert not pred(("vae", "w"))
    assert not pred(("clip", "w"))
