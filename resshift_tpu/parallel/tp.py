"""Tensor (model) parallelism: shard the flagship models over a mesh axis.

The reference has no model parallelism at all — its multi-GPU story is
rank-sliced data parallelism (sampler.py:267-283, trainer.py DDP).  On TPU
the idiomatic mechanism is GSPMD: annotate the *parameters* with
`PartitionSpec`s over a `model` mesh axis and let XLA's partitioner
propagate shardings through the program, inserting the all-reduce /
all-gather collectives on ICI.  Sharding annotations never change the
math — the partitioned program computes the same values (up to float
reduction order) — so correctness is testable by exactness against the
single-device sampler (tests/test_tp.py).

Layout chosen (classic Megatron pairing, arXiv 1909.08053, applied to the
ResShift UNet/VQGAN):

  * Swin attention: `qkv` kernel column-sharded (output features), `proj`
    kernel row-sharded (input features) — the pair needs one all-reduce at
    the proj output instead of collectives around every matmul.
  * Swin MLP: `mlp_fc1` column-sharded, `mlp_fc2` row-sharded — same pair.
  * Timestep MLP: `time_embed_0` column / `time_embed_2` row; each
    ResBlock's FiLM `emb_proj` column-sharded (its output is per-channel
    scale/shift, consistent with conv output-channel sharding).
  * Convolutions (UNet ResBlocks/skeleton, VQGAN backbones): output-channel
    sharded wherever the channel count divides the axis — channel
    parallelism.  GroupNorm(32) group boundaries align with the channel
    shards for the shipped channel counts (160/320/192 over 2-8 devices),
    so the partitioner keeps the stats reduction local per group set.
  * Small/odd leaves (rel-pos bias tables, norm affines, the 3-channel
    head convs, the VQ codebook) stay replicated.

Caveats documented rather than hidden:
  * The qkv kernel stores [q|k|v] concatenated on the output axis; its
    contiguous shards do not align with the per-head slices for every
    (C, n_model) combination, so GSPMD may insert a reshard inside the
    attention composition.  Head-aligned TP would need separate q/k/v
    parameters — a checkpoint-layout change we do not make.
  * The fused Pallas kernels are opaque to the partitioner, so the TP
    sampler runs the XLA compositions (`use_pallas=False` clones).  TP is
    the batch-1 *latency* lever across chips; single-chip throughput
    serving should keep the fused kernels (PERF.md).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Dense kernels stored (in_features, out_features):
_COL_DENSE = {"qkv", "mlp_fc1", "time_embed_0", "emb_proj"}  # shard axis 1
_ROW_DENSE = {"proj", "mlp_fc2", "time_embed_2"}             # shard axis 0


def _path_names(path) -> tuple[str, ...]:
    return tuple(getattr(p, "key", str(p)) for p in path)


def param_specs(params: Any, n_model: int, axis: str = "model") -> Any:
    """PartitionSpec pytree for a `{unet, vqgan}` param tree.

    Only axes whose size divides `n_model` are sharded; everything else is
    replicated.  `n_model=1` returns an all-replicated tree (useful for
    spec-structure tests).
    """

    def spec(path, leaf) -> P:
        names = _path_names(path)
        kind = names[-1]
        parent = names[-2] if len(names) >= 2 else ""
        if kind == "kernel":
            if leaf.ndim == 2:
                if parent in _COL_DENSE and leaf.shape[1] % n_model == 0:
                    return P(None, axis)
                if parent in _ROW_DENSE and leaf.shape[0] % n_model == 0:
                    return P(axis, None)
                return P()
            if leaf.ndim == 4:  # conv HWIO: shard output channels
                if leaf.shape[3] % n_model == 0:
                    return P(None, None, None, axis)
                return P()
            return P()
        if kind == "bias":
            # bias rides its kernel's output sharding: column-sharded dense
            # and output-channel-sharded convs add bias per shard; row-parallel
            # matmuls add bias AFTER the all-reduce -> replicated
            if parent in _ROW_DENSE:
                return P()
            if leaf.ndim == 1 and leaf.shape[0] % n_model == 0 and (
                    parent in _COL_DENSE or _is_conv_parent(names)):
                return P(axis)
            return P()
        # norm scale/bias, rel-pos tables, VQ codebook: replicated
        return P()

    def _is_conv_parent(names: tuple[str, ...]) -> bool:
        # conv modules in this tree: everything whose sibling kernel is 4-D.
        # Cheap structural test: dense parents are exactly the two sets above
        # plus nothing else holds a 2-D kernel in the flagship trees, so a
        # bias under any other parent belongs to a conv (or a norm, which has
        # no 'kernel' sibling and uses 'scale'/'bias' — those biases sit
        # under parents ending in 'norm'/'norm1'/... and must stay replicated).
        parent = names[-2] if len(names) >= 2 else ""
        if parent in _COL_DENSE or parent in _ROW_DENSE:
            return False
        return "norm" not in parent

    return jax.tree_util.tree_map_with_path(spec, params)


def param_shardings(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """NamedSharding pytree matching `params` for `mesh` (which must carry
    `axis`)."""
    n_model = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    specs = param_specs(params, n_model, axis)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, P))


def shard_params(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Place `params` on `mesh` with the TP layout (host -> sharded device
    arrays; each device holds only its shard of the sharded leaves)."""
    return jax.device_put(params, param_shardings(params, mesh, axis))
