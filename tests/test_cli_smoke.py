"""CLI-surface smoke tests: drive the user-facing scripts end to end on
the micro model (role parity: the reference's inference.py / run_ood.py
entry points — README.md usage section of the upstream repo)."""
import runpy
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).parent.parent

MICRO_YAML = """\
target: rdeic_tpu.pipeline.rdeic.RDEIC
params:
  fixed_step: 2
  used_timesteps: 300
  timesteps: 1000
  control_stage_config:
    params:
      in_channels: 4
      out_channels: 4
      hint_channels: 8
      model_channels: 16
      num_res_blocks: 1
      attention_resolutions: [2]
      channel_mult: [1, 2]
      num_head_channels: 8
      context_dim: 16
      control_model_ratio: 0.5
      control_scale: 1.0
  unet_config:
    params:
      num_head_channels: 8
  first_stage_config:
    params:
      embed_dim: 4
      ddconfig:
        ch: 8
        ch_mult: [1, 2]
        num_res_blocks: 1
  preprocess_config:
    params:
      in_nc: 16
      out_nc: 4
      N: 8
      M: 8
      slice_num: 2
      slice_ch: [4, 4]
      codebook_size: 32
"""


@pytest.fixture(scope="module")
def micro_ckpt(tmp_path_factory):
    """Micro config YAML + random-init .npz params on disk."""
    import jax

    from rdeic_tpu.registry import instantiate_from_config, load_yaml
    from rdeic_tpu.utils.checkpoint_io import save_params_npz

    ws = tmp_path_factory.mktemp("cli_ws")
    cfg = ws / "micro.yaml"
    cfg.write_text(MICRO_YAML)
    model = instantiate_from_config(load_yaml(str(cfg)))
    params = model.init_params(jax.random.PRNGKey(0), image_hw=(64, 64))
    ckpt = ws / "micro.npz"
    save_params_npz(str(ckpt), jax.device_get(params))
    return cfg, ckpt, ws


def _run_cli(script, argv):
    old = sys.argv
    try:
        sys.argv = [script] + argv
        runpy.run_path(str(REPO / script), run_name="__main__")
    finally:
        sys.argv = old


def test_inference_cli_end_to_end(micro_ckpt):
    """inference.py: odd-size input -> padded coding -> real bitstream ->
    2-step relay decode -> output cropped back to the input size."""
    cfg, ckpt, ws = micro_ckpt
    rng = np.random.default_rng(0)
    img = ws / "photo.png"
    Image.fromarray(
        rng.integers(0, 255, (49, 77, 3), dtype=np.uint8), "RGB"
    ).save(img)
    out = ws / "out"
    _run_cli(
        "inference.py",
        ["--ckpt", str(ckpt), "--config", str(cfg),
         "--input", str(img), "--output", str(out), "--steps", "2"],
    )
    rec = Image.open(out / "photo.png")
    assert rec.size == (77, 49)
    assert (out / "bitstreams" / "photo.rdeic").stat().st_size > 12


def test_run_ood_multi_domain(micro_ckpt):
    """run_ood.py with two comma-separated domains: per-domain CSVs plus
    the consolidated CSV (parity: reference run_ood.py --domains)."""
    import csv

    cfg, ckpt, ws = micro_ckpt
    rng = np.random.default_rng(1)
    for dom in ("alpha", "beta"):
        d = ws / dom
        d.mkdir(exist_ok=True)
        Image.fromarray(
            rng.integers(0, 255, (96, 96, 3), dtype=np.uint8), "RGB"
        ).save(d / f"{dom}_0.png")
    out = ws / "ood_out"
    _run_cli(
        "experiments/run_ood.py",
        ["--ckpt", str(ckpt), "--config", str(cfg),
         "--input", f"{ws}/alpha,{ws}/beta",
         "--output", str(out), "--steps", "2", "--num_images", "1"],
    )
    for dom in ("alpha", "beta"):
        assert (out / dom / "ood_metrics.csv").exists()
    with (out / "ood_results_all.csv").open() as f:
        rows = list(csv.DictReader(f))
    assert sorted(r["domain"] for r in rows) == ["alpha", "beta"]
    assert all("bpp" in r and "psnr" in r for r in rows)


def test_inference_partition_cli(micro_ckpt):
    """inference_partition.py: resolution grouping + micro-batching over a
    small mixed-size directory; writes per-image outputs + metrics.csv."""
    cfg, ckpt, ws = micro_ckpt
    rng = np.random.default_rng(2)
    d = ws / "part_in"
    d.mkdir(exist_ok=True)
    for i, (h, w) in enumerate([(64, 64), (64, 64), (96, 64)]):
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8), "RGB"
        ).save(d / f"img_{i}.png")
    out = ws / "part_out"
    _run_cli(
        "inference_partition.py",
        ["--ckpt", str(ckpt), "--config", str(cfg),
         "--input", str(d), "--output", str(out),
         "--steps", "2", "--batch_size", "2"],
    )
    outs = sorted(p.name for p in out.glob("*.png"))
    assert outs == ["img_0.png", "img_1.png", "img_2.png"]
    assert (out / "metrics.csv").exists()


def test_inference_partition_dp_mesh(micro_ckpt):
    """--dp 2: sampling micro-batches shard over a data-parallel serving
    mesh (8-device virtual CPU); outputs match the single-device layout's
    file set."""
    cfg, ckpt, ws = micro_ckpt
    rng = np.random.default_rng(5)
    d = ws / "dp_in"
    d.mkdir(exist_ok=True)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB"
        ).save(d / f"dp_{i}.png")
    out = ws / "dp_out"
    _run_cli(
        "inference_partition.py",
        ["--ckpt", str(ckpt), "--config", str(cfg),
         "--input", str(d), "--output", str(out),
         "--steps", "2", "--batch_size", "4", "--micro_batch_size", "2",
         "--dp", "2"],
    )
    outs = sorted(p.name for p in out.glob("*.png"))
    assert outs == [f"dp_{i}.png" for i in range(4)]
    assert (out / "metrics.csv").exists()


def test_tiled_inference_cli(micro_ckpt):
    """tiled_inference.py: image larger than the tile -> overlap-stitched
    output at the input size."""
    cfg, ckpt, ws = micro_ckpt
    rng = np.random.default_rng(3)
    img = ws / "big.png"
    Image.fromarray(
        rng.integers(0, 255, (96, 128, 3), dtype=np.uint8), "RGB"
    ).save(img)
    out = ws / "tiled_out"
    _run_cli(
        "tiled_inference.py",
        ["--ckpt", str(ckpt), "--config", str(cfg),
         "--input", str(img), "--output", str(out),
         "--tile", "64", "--overlap", "32", "--steps", "2"],
    )
    rec = Image.open(next(out.glob("*.png")))
    assert rec.size == (128, 96)
