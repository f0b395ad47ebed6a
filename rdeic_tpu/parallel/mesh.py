"""Device mesh + sharding rules (the TPU replacement for the reference's DDP).

Role parity: the reference scales out with PyTorch-Lightning DDP over NCCL
(configs/train_rdeic.yaml `accelerator: ddp`; SURVEY.md §2.10). Here the
entire distribution surface is a `jax.sharding.Mesh` with two axes:

- "dp": data parallel — the batch dim of images/latents is sharded; gradient
  averaging becomes an XLA all-reduce over ICI inserted automatically by the
  partitioner.
- "tp": tensor parallel — large Dense/Conv kernels (attention qkv/out, GEGLU,
  time-embed MLPs) are sharded on their output feature axis; XLA inserts
  all-gathers/reduce-scatters where needed. The reference has no TP at all
  (SURVEY.md §2.10) — this is a TPU-native addition for large-batch serving.

Everything uses `jax.jit` + `NamedSharding` (the pjit path): one program,
SPMD over the mesh.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp={dp*tp} != #devices={n}")
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Kernel-name suffixes whose OUTPUT feature axis is sharded over tp.
_TP_SHARDED_SUFFIXES = (
    "to_q", "to_k", "to_v", "proj", "fc1", "mlp_fc", "in_proj",
)


def param_spec(path: tuple, leaf) -> P:
    """Tensor-parallel sharding rule for a parameter leaf.

    Dense kernels of attention projections and MLP up-projections are sharded
    on the output-feature (last) axis; everything else is replicated. Leaves
    whose last dim does not divide by the tp size are replicated (checked by
    the caller with mesh info).
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if names and names[-1] == "kernel" and len(names) >= 2:
        parent = names[-2]
        if any(parent.endswith(s) for s in _TP_SHARDED_SUFFIXES):
            return P(*([None] * (leaf.ndim - 1) + ["tp"]))
    return P()


def shard_params(params, mesh: Mesh):
    """Apply the tensor-parallel sharding rules to a params pytree."""
    tp = mesh.shape["tp"]

    def place(path, leaf):
        spec = param_spec(path, leaf)
        if spec != P() and leaf.shape[-1] % tp != 0:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def params_shardings(params, mesh: Mesh):
    """NamedSharding pytree matching shard_params placement."""
    tp = mesh.shape["tp"]

    def spec_of(path, leaf):
        spec = param_spec(path, leaf)
        if spec != P() and leaf.shape[-1] % tp != 0:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_of, params)


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host initialization (DCN multi-slice; no-op on a single host).

    TPU pods set the coordinator automatically from the environment;
    explicit args support manual DCN setups.
    """
    import jax  # noqa: PLC0415
    from jax._src import distributed as _dist  # noqa: PLC0415

    # NOTE: do NOT probe jax.process_count() here — it initialises the XLA
    # backend, after which jax.distributed.initialize() refuses to run.
    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized
    if coordinator is not None:
        # explicit multi-host setup: a failure here is a real error
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        return
    try:
        jax.distributed.initialize()
    except Exception:
        pass  # single-process environment without cluster env vars
