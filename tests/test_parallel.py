"""Mesh/sharding tests on the 8-device virtual CPU mesh."""
import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from rdeic_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    params_shardings,
    shard_params,
)


def test_make_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh = make_mesh()  # default: all devices on dp
    assert mesh.shape["dp"] == 8 and mesh.shape["tp"] == 1
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=2)


def test_param_sharding_rules():
    mesh = make_mesh(dp=4, tp=2)
    params = {
        "attn": {"to_q": {"kernel": np.zeros((64, 64), "f4")}},
        "norm": {"scale": np.zeros((64,), "f4")},
        "odd": {"to_q": {"kernel": np.zeros((64, 63), "f4")}},  # 63 % 2 != 0
    }
    sharded = shard_params(params, mesh)
    specs = params_shardings(params, mesh)
    assert specs["attn"]["to_q"]["kernel"].spec == P(None, "tp")
    assert specs["norm"]["scale"].spec == P()
    assert specs["odd"]["to_q"]["kernel"].spec == P()  # indivisible -> replicated
    # placement actually happened
    assert len(sharded["attn"]["to_q"]["kernel"].sharding.device_set) == 8


@pytest.mark.slow
def test_dryrun_multichip_trains():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
