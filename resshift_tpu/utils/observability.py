"""Tracing / profiling / numeric-sanitizer utilities.

The reference has no profiler integration (SURVEY §5.1 — only a CUDA-event
timing helper at utils/util_net.py:68-84) and only ad-hoc NaN scrubbing
(trainer.py:679-682,1047-1063).  Here both are first-class:

  * `trace(...)`: context manager around `jax.profiler.trace` producing
    TensorBoard-loadable traces; `start_profiler_server` exposes the live
    profiling endpoint.
  * `measure`: device-synchronized wall-time helper (compile vs steady
    state reported separately).
  * `nan_guard` / `debug_nans`: batch scrubbing with an audit log (same
    semantics as replace_nan_in_batch) and a test-time hard-failure mode.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp

__all__ = ["trace", "start_profiler_server", "measure", "nan_guard", "debug_nans"]


@contextlib.contextmanager
def trace(logdir: str | Path):
    """Capture an XLA/TPU profile into `logdir` (TensorBoard format)."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_profiler_server(port: int = 9999):
    return jax.profiler.start_server(port)


def measure(fn: Callable[[], Any], iters: int = 5) -> dict[str, float]:
    """Run `fn` once (compile) then `iters` times; returns seconds."""
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return {"compile_s": compile_s, "steady_s": (time.perf_counter() - t0) / iters}


def nan_guard(batch: dict[str, jnp.ndarray], audit_path: str | Path | None = None
              ) -> tuple[dict, bool]:
    """Replace NaNs with zeros, logging an audit line when any were found
    (replace_nan_in_batch semantics, trainer.py:1047-1063)."""
    flagged = False
    out = {}
    for k, v in batch.items():
        has_nan = bool(jnp.isnan(v).any())
        flagged |= has_nan
        out[k] = jnp.nan_to_num(v) if has_nan else v
    if flagged and audit_path is not None:
        with open(audit_path, "a") as f:
            f.write(f"NaN found in batch on process {jax.process_index()}\n")
    return out, flagged


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Hard-fail on NaN production inside jitted code (test/debug mode)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
