"""Checkpoint converter coverage: every leaf of the param tree must map to a
torch key, and a synthetic torch state dict (built by inverting the mapping)
must convert back with exact values."""
import numpy as np
import jax
import pytest

from flax.traverse_util import flatten_dict
from rdeic_tpu.utils.torch_convert import (
    _t_conv,
    _t_linear,
    convert_state_dict,
    dec_upsample_positions,
    torch_key_for,
)
from tests.helpers import micro_rdeic


@pytest.fixture(scope="module")
def model_template():
    model = micro_rdeic()
    template = jax.eval_shape(
        lambda r: model.init_params(r, image_hw=(32, 32), include_clip=True),
        jax.random.PRNGKey(0),
    )
    return model, template


def test_full_mapping_coverage(model_template):
    model, template = model_template
    dec_pos = dec_upsample_positions(model)
    unmapped = []
    keys = set()
    for path in flatten_dict(template):
        if path[0] in ("uncond_context", "lpips"):
            continue
        try:
            key, _ = torch_key_for(path, dec_pos)
            keys.add(key)
        except KeyError:
            unmapped.append("/".join(map(str, path)))
    assert not unmapped, f"unmapped paths: {unmapped[:10]}"
    # keys must be unique per leaf kind (weight/bias collapse is expected
    # only for in_proj which has separate _weight/_bias keys)
    assert len(keys) > 100


def test_synthetic_roundtrip(model_template):
    model, template = model_template
    dec_pos = dec_upsample_positions(model)
    rng = np.random.default_rng(0)
    sd = {}
    expected = {}
    for path, leaf in flatten_dict(template).items():
        if path[0] in ("uncond_context", "lpips"):
            continue
        key, transform = torch_key_for(path, dec_pos)
        target_shape = tuple(leaf.shape)
        val = rng.normal(size=target_shape).astype("f4")
        # invert the transform to create the torch-layout tensor
        if transform is _t_conv:
            sd[key] = np.transpose(val, (3, 2, 0, 1))
        elif transform is _t_linear:
            sd[key] = np.transpose(val, (1, 0))
        else:
            sd[key] = val
        expected[path] = val
    params, missing = convert_state_dict(sd, template, model)
    real_missing = [m for m in missing if not m.startswith(("uncond", "lpips"))]
    assert not real_missing, real_missing[:10]
    flat = flatten_dict(params)
    for path, val in expected.items():
        np.testing.assert_array_equal(np.asarray(flat[path]), val)


def test_sync_control_tile_truncate(model_template):
    model, template = model_template
    dec_pos = dec_upsample_positions(model)
    rng = np.random.default_rng(1)
    # state dict containing ONLY base-UNet keys; control should sync where
    # shapes can be tiled/truncated (rdeic.py:962-991)
    sd = {}
    for path, leaf in flatten_dict(template).items():
        if path[:2] != ("denoiser", "base"):
            continue
        key, transform = torch_key_for(path, dec_pos)
        val = rng.normal(size=tuple(leaf.shape)).astype("f4")
        if transform is _t_conv:
            sd[key] = np.transpose(val, (3, 2, 0, 1))
        elif transform is _t_linear:
            sd[key] = np.transpose(val, (1, 0))
        else:
            sd[key] = val
    params, missing = convert_state_dict(sd, template, model, sync_control=True)
    flat_t = flatten_dict(template)
    flat_p = flatten_dict(params)
    # time_embed has identical shapes in control -> must be synced exactly
    base_te = flat_p[("denoiser", "base", "time_embed", "fc1", "kernel")]
    ctrl_te = flat_p[("denoiser", "control", "time_embed", "fc1", "kernel")]
    np.testing.assert_array_equal(np.asarray(base_te), np.asarray(ctrl_te))
    # some control leaf with halved width must equal the truncated base
    base_k = np.asarray(
        flat_p[("denoiser", "base", "mid", "res1", "out_conv", "kernel")]
    )
    ctrl_k = np.asarray(
        flat_p[("denoiser", "control", "mid", "res1", "out_conv", "kernel")]
    )
    assert ctrl_k.shape[2] * 2 == base_k.shape[2]
    np.testing.assert_array_equal(
        ctrl_k, base_k[:, :, : ctrl_k.shape[2], : ctrl_k.shape[3]]
    )
