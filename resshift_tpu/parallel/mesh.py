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

__all__ = ["make_mesh", "shard_batch", "replicate", "data_parallel_shardings",
           "maybe_init_distributed", "P"]


def maybe_init_distributed(force: bool = False) -> bool:
    """Bootstrap JAX's multi-process runtime when this looks like (or is
    forced to be) a multi-host job; safe no-op on a single host.

    TPU pods auto-configure `jax.distributed.initialize()` from the TPU
    metadata; other clusters set JAX_COORDINATOR_ADDRESS (+
    JAX_NUM_PROCESSES / JAX_PROCESS_ID — jax's own env protocol).
    Returns True when the multi-process runtime is (already) up; raises if
    a multi-host environment is indicated but cannot be initialized —
    silently degrading to N independent single-process jobs would corrupt
    the run (every host would be rank 0 with num_shards=1).  Replaces the
    reference's torchrun/env:// init_process_group bootstrap
    (trainer.py:49-64)."""
    import os

    coord = any(os.environ.get(k) for k in
                ("JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
    # TPU_WORKER_HOSTNAMES is also set on single-host TPUs — only a
    # multi-entry list indicates a pod slice needing the bootstrap
    hosts = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    if not (force or coord or len(hosts) > 1):
        return False
    try:
        if jax.distributed.is_initialized():
            return jax.process_count() > 1
    except AttributeError:  # older jax
        pass
    kwargs = {}
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr and os.environ.get("JAX_NUM_PROCESSES"):
        # generic rendezvous (non-TPU-pod clusters, and the multi-process
        # CPU test harness): pass the env protocol explicitly — older jax
        # cluster auto-detection does not read these three on bare hosts
        kwargs = dict(coordinator_address=addr,
                      num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                      process_id=int(os.environ["JAX_PROCESS_ID"]))
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        raise RuntimeError(
            "multi-host environment indicated but jax.distributed could not "
            "be initialized (it must run before ANY jax computation — call "
            "maybe_init_distributed() first thing in your program): "
            f"{e}") from e
    return jax.process_count() > 1


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
