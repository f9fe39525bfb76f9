"""Persistent XLA compilation cache for every entry point.

The flagship sampler's first jit costs 20-40 s on TPU; the reference
pays the analogous torch/CUDA warmup on every process start and has no
cross-restart story.  JAX can persist compiled executables keyed by
(HLO, flags, platform), so CLI runs, the serving process, and trainers
all reuse each other's compilations across restarts.

Off by default only when explicitly disabled: set RSTPU_COMPILE_CACHE=0
(or "off") to disable, or point it at a custom directory.  The trainer
additionally redirects the cache into its save_dir (train_loop.py:91-97)
so a training job's artifacts stay self-contained.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = "~/.cache/resshift_tpu/xla"


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Enable the persistent compilation cache; returns the directory in
    use, or None when disabled.  Safe to call more than once (last call
    wins, matching jax.config semantics)."""
    env = os.environ.get("RSTPU_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "false", "none"):
        return None
    path = Path(cache_dir or env or _DEFAULT_DIR).expanduser()
    try:
        path.mkdir(parents=True, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", str(path))
        # cache even fast compiles: the CLI's many small degradation /
        # metric jits add up across restarts
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        return None
    return str(path)
