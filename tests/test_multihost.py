"""Two-process jax.distributed smoke test (DCN multi-host path).

Exercises rdeic_tpu.parallel.mesh.init_distributed — the analog of the
reference's DDP multi-process launch (configs/train_rdeic.yaml accelerator
block) — by spawning two real processes that form one JAX cluster over a
local coordinator, build a global mesh spanning both, and run a jitted
global reduction.
"""
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent

WORKER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, %(repo)r)
    from rdeic_tpu.parallel.mesh import init_distributed, make_mesh

    init_distributed(
        coordinator=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
    )
    assert jax.process_count() == 2, f"process_count={jax.process_count()}"

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    devs = jax.devices()  # global device list across both processes
    assert len(devs) == 4, devs
    mesh = make_mesh(dp=4, tp=1, devices=devs)
    sharding = NamedSharding(mesh, P("dp"))
    local = np.full((2, 4), float(jax.process_index() + 1), np.float32)
    arr = jax.make_array_from_process_local_data(sharding, local, (4, 4))
    total = jax.jit(
        lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P())
    )(arr)
    want = 2 * 4 * 1.0 + 2 * 4 * 2.0  # proc0 rows of 1s, proc1 rows of 2s
    assert float(total) == want, (float(total), want)
    print(f"MULTIHOST_OK p{jax.process_index()} sum={float(total)}")
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER % {"repo": str(REPO)})
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(REPO),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
