"""Pipeline parallelism: GPipe-style SPMD streaming over a mesh axis.

The reverse-diffusion chain is a depth-T stack of weight-tied layers (the
same denoiser applied at T schedule points), so for this model family the
natural pipeline axis is TIME, not module depth.  `pipeline_stream` is the
generic engine: stage s of an S-stage pipeline (one device along the
`stage` mesh axis per stage) repeatedly (a) receives a payload from stage
s-1 over ICI (`lax.ppermute`), (b) runs its slice of the work on it, and
(c) passes it on — all inside ONE jitted `lax.scan`, the canonical TPU
pipelining pattern (single program, no host round-trips, transfers ride
ICI while every stage computes).

Where this sits next to the other parallel modes:
  * DP (`sample_batch_sharded`) — max throughput for big batches; zero
    communication; each device needs the FULL phase working set (encode +
    T-step chain + decode) live at once.
  * TP (`sample_tp`) — batch-1 latency; params sharded.
  * PP (this) — streaming throughput with a bounded per-device working
    set: each stage holds ONE in-flight chunk and runs only its slice of
    the chain, and the encode (stage 0) / denoise (all stages) / decode
    (last stage) phases of DIFFERENT chunks overlap in steady state.
    Efficiency is 1 - (S-1)/(N+S-1) for N streamed chunks (the classic
    GPipe bubble): N >> S amortizes the fill/drain.
  * Params are weight-tied across the time axis, so PP replicates them —
    param-memory scaling is FSDP/TP's job, and EP does not apply (no
    mixture-of-experts routing anywhere in this model family).

Reference: the torch reference has no pipeline mode at all (its multi-GPU
story is rank-sliced batches, sampler.py:267-283); this module is
beyond-reference capability.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["stage_slices", "pipeline_stream", "make_stage_mesh"]


def make_stage_mesh(n_stages: int, devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if len(devs) < n_stages:
        raise ValueError(f"need {n_stages} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_stages]), ("stage",))


def stage_slices(n_steps: int, n_stages: int) -> tuple[list[int], list[int]]:
    """Partition the descending step chain t = n_steps-1 .. 0 into
    contiguous per-stage slices: returns (starts, counts) where stage s
    runs steps starts[s], starts[s]-1, ..., starts[s]-counts[s]+1.

    Remainder steps go to the EARLIEST stages: stage 0 also pays the
    ingest (encode) cost, but the last stage pays decode, which is the
    heavier phase for this model family — so front-loading keeps the
    heaviest stage lighter.
    """
    counts = [n_steps // n_stages + (1 if i < n_steps % n_stages else 0)
              for i in range(n_stages)]
    offs = np.cumsum([0] + counts[:-1]).tolist()
    starts = [n_steps - 1 - o for o in offs]
    return starts, counts


def pipeline_stream(
    mesh: Mesh,
    axis: str,
    operands: Any,
    *,
    n_chunks: int,
    ingest: Callable[[Any, jnp.ndarray], Any],
    work: Callable[[Any, jnp.ndarray, Any], Any],
    emit: Callable[[Any, Any], jnp.ndarray],
):
    """Stream `n_chunks` payloads through the `axis` pipeline.

    operands: pytree of arrays every stage may read (params, the chunked
        inputs, per-chunk keys) — replicated over the pipeline axis.
    ingest(operands, chunk_idx) -> payload pytree.  Traced on every
        device; EXECUTED only on stage 0 (`lax.cond`).  `chunk_idx` is a
        traced int32 scalar.
    work(operands, stage, payload) -> payload.  Runs on every stage;
        `stage` is the traced pipeline index for selecting the stage's
        step slice.
    emit(operands, payload) -> output chunk (fixed shape/dtype).
        Executed only on the last stage.

    Returns the stacked outputs, shape (n_chunks, *chunk_shape), taken
    from the last stage's buffer.  The per-device live state is one
    payload + the output buffer; all stage-to-stage traffic is a single
    `ppermute` of the payload per tick.
    """
    if axis not in mesh.shape:
        raise ValueError(f"mesh has no axis {axis!r}: {dict(mesh.shape)}")
    n_stages = mesh.shape[axis]
    ticks = n_chunks + n_stages - 1
    perm = [(i, i + 1) for i in range(n_stages - 1)]

    payload_sd = jax.eval_shape(lambda ops: ingest(ops, jnp.int32(0)), operands)
    out_sd = jax.eval_shape(
        lambda ops: emit(ops, jax.tree.map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype), payload_sd)), operands)

    def body(ops):
        s = jax.lax.axis_index(axis)
        payload0 = jax.tree.map(lambda sd: jnp.zeros(sd.shape, sd.dtype),
                                payload_sd)
        out0 = jnp.zeros((n_chunks,) + tuple(out_sd.shape), out_sd.dtype)

        def tick(carry, t):
            out_buf, send = carry
            recv = jax.tree.map(
                lambda x: jax.lax.ppermute(x, axis, perm), send)
            # stage 0 ingests chunk t (re-ingests the last chunk during
            # drain ticks; the redundant work rides the pipeline bubble)
            idx = jnp.minimum(t, n_chunks - 1)
            payload = jax.lax.cond(
                s == 0, lambda: ingest(ops, idx), lambda: recv)
            payload = work(ops, s, payload)

            cidx = t - (n_stages - 1)  # chunk the LAST stage just finished

            def write(buf):
                return jax.lax.dynamic_update_index_in_dim(
                    buf, emit(ops, payload),
                    jnp.clip(cidx, 0, n_chunks - 1), 0)

            out_buf = jax.lax.cond(
                (s == n_stages - 1) & (cidx >= 0), write,
                lambda buf: buf, out_buf)
            return (out_buf, payload), None

        (out_buf, _), _ = jax.lax.scan(
            tick, (out0, payload0), jnp.arange(ticks, dtype=jnp.int32))
        # out_specs stacks the per-stage buffers along a leading axis;
        # only the last stage's buffer is read back (sliced by the caller)
        return out_buf[None]

    # Manual ONLY over the pipeline axis: on a 2-D (stage, data) mesh the
    # other axes stay automatic, so GSPMD shards each in-flight chunk's
    # batch dim over `data` (hybrid PP x DP) from the caller's sharding
    # constraints while ppermute moves payloads along `stage`.
    stacked = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(),),
        out_specs=P(axis),
        axis_names={axis},
        check_vma=False,
    )(operands)
    return stacked[-1]
