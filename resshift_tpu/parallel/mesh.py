"""Device mesh + sharding helpers.

Replaces the reference's NCCL/torchrun stack (trainer.py:49-64 DDP wrap at
:221, DistributedSampler :250-257, rank-sliced inference batches
sampler.py:273-283) with JAX-native SPMD:

  * one `Mesh` with a `data` axis (training DP) and an optional `tile` axis
    (inference tile parallelism — the reference's chopped-inference analog);
  * params replicated, batch sharded on `data`; XLA inserts the gradient
    all-reduce over ICI — no DDP object, no explicit collectives;
  * multi-host: `jax.distributed.initialize()` + `process_index()==0` for
    rank-0-only work (logging/checkpointing), replacing LOCAL_RANK checks.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_shardings", "P"]


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Batch-dim sharding over the mesh's data axis."""
    return NamedSharding(mesh, P(axis_name))


def data_parallel_shardings(mesh: Mesh, state: Any, batch: Any):
    """(state_sharding, batch_sharding) pytrees for a DP train step:
    params/opt-state replicated, every batch leaf sharded on dim 0."""
    rep = replicate(mesh)
    shd = shard_batch(mesh)
    state_sh = jax.tree_util.tree_map(lambda _: rep, state)
    batch_sh = jax.tree_util.tree_map(lambda _: shd, batch)
    return state_sh, batch_sh
