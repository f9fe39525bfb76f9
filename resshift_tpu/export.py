"""Ahead-of-time export: serialize the jitted sampler to a portable artifact.

The reference has no deployment story beyond "run the Python repo"
(predict.py builds a sampler per request; app.py wraps the same).  A
TPU-native framework can do better: `jax.export` lowers the FULL sampler
(encode -> 15/4-step scan -> decode) to versioned StableHLO once, and the
artifact then runs under any runtime with compatible libtpu — no model
code, no Flax, no Python tracing at serve time.  This is the TorchScript/
ONNX role for the XLA world.

Artifact format (single file, magic ``RSXP0001``):

    8 bytes magic | u64 little-endian manifest length | manifest JSON |
    jax.export blob

The manifest records task/shape/dtype/platform metadata so a serving
fleet can route requests without deserializing the program.  Weights stay
OUTSIDE the artifact (they are call-time arguments): ship them as the
orbax checkpoint you already have, and the same artifact serves every
fine-tune of the task.

Exported call signature:  ``fn(params, lq, seed)`` -> restored image batch
  * params: the pipeline param pytree (same structure as at export time)
  * lq:     (batch, H, W, 3) f32 in [-1, 1]
  * seed:   int32 scalar -> folded into the sampler's PRNG key
(with_mask=True inserts a ``mask`` argument after ``lq``.)
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

import jax
import jax.numpy as jnp
from jax import export as jax_export

__all__ = ["export_sampler", "save_artifact", "load_artifact", "MAGIC"]

MAGIC = b"RSXP0001"


def _abstract(tree):
    return jax.tree.map(lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                                       jnp.result_type(x)), tree)


def export_sampler(pipe, params, hw: tuple[int, int], batch: int = 1,
                   with_mask: bool = False,
                   platforms: list[str] | None = None):
    """Export `pipe`'s tile sampler at a fixed (batch, H, W) operating point.

    Returns (blob: bytes, manifest: dict).  `platforms=None` exports for the
    current default backend; pass e.g. ["tpu"] or ["cpu"] explicitly to
    cross-export (multi-platform export requires every traced op to lower
    on all of them — Pallas-kernel paths are TPU-only).
    """
    h, w = hw

    if with_mask:
        def fn(p, lq, mask, seed):
            key = jax.random.PRNGKey(seed)
            return pipe._sample_tile(p, lq, key, mask=mask)

        args = (_abstract(params),
                jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32),
                jax.ShapeDtypeStruct((batch, h, w, 1), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.int32))
    else:
        def fn(p, lq, seed):
            key = jax.random.PRNGKey(seed)
            return pipe._sample_tile(p, lq, key)

        args = (_abstract(params),
                jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.int32))

    exp = jax_export.export(jax.jit(fn),
                            platforms=list(platforms) if platforms else None)(*args)
    sf = pipe.sf
    manifest = {
        "format": "resshift_tpu.export/1",
        "task": pipe.config.get("task", "custom"),
        "sf": sf,
        "input_hw": [h, w],
        "batch": batch,
        "with_mask": bool(with_mask),
        "output_hw": [h * sf, w * sf],
        "platforms": list(exp.platforms),
        "jax_version": jax.__version__,
        "calling_convention": (["params", "lq", "mask", "seed"] if with_mask
                               else ["params", "lq", "seed"]),
    }
    return exp.serialize(), manifest


def save_artifact(path: str | Path, blob: bytes, manifest: dict) -> None:
    mj = json.dumps(manifest, sort_keys=True).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(mj)))
        f.write(mj)
        f.write(blob)


def load_artifact(path: str | Path):
    """Returns (call, manifest): `call(params, lq[, mask], seed)` executes
    the exported program on the current backend."""
    raw = Path(path).read_bytes()
    if raw[:8] != MAGIC:
        raise ValueError(f"{path}: not a resshift_tpu export artifact")
    (mlen,) = struct.unpack("<Q", raw[8:16])
    manifest = json.loads(raw[16:16 + mlen].decode())
    exp = jax_export.deserialize(raw[16 + mlen:])
    return exp.call, manifest
