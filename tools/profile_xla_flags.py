"""XLA TPU flag sweep on the bench-protocol program (VERDICT r2 #1(c)).

The remaining UNet-step gap to the achievable floor is scheduling/fusion
slack XLA owns, not op math we can rewrite (every structural rewrite
regressed — PERF.md ledger).  This sweeps the documented XLA knobs that
move that slack without changing semantics:

  * scoped-VMEM limit (more room for fusion temporaries vs less room for
    pipelining buffers — both directions plausible, so sweep both);
  * multi-level nested-loop fusion on/off;
  * latency-hiding scheduler aggressiveness.

XLA flags are consumed at backend initialization, so each configuration
runs in a FRESH subprocess of this same file (--child).  Results print as
one JSON line per config; the parent summarizes best-vs-default.

Usage: python tools/profile_xla_flags.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CONFIGS: dict[str, str] = {
    "default": "",
    "vmem_32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem_8m": "--xla_tpu_scoped_vmem_limit_kib=8192",
    "no_nested_fusion": "--xla_tpu_enable_multi_level_nested_loop_fusion=false",
    "aggressive_lhs": ("--xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"),
    "all_reduce_scatter": "--xla_tpu_enable_all_experimental_scheduler_features=true",
}

TILE, BATCH, SF = 64, 64, 4


def child(reps: int = 3) -> None:
    sys.path.insert(0, str(REPO))
    if os.environ.get("JAX_PLATFORMS") == "axon":
        os.environ["JAX_PLATFORMS"] = "axon,cpu"
    import jax
    import jax.numpy as jnp

    from resshift_tpu.pipeline import ResShiftPipeline

    pipe = ResShiftPipeline("realsr_v1", dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        params = pipe.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    n_iter = 4

    @jax.jit
    def chained(p, key):
        def body(carry, k):
            lq = jax.random.uniform(k, (BATCH, TILE, TILE, 3), jnp.float32,
                                    -1.0, 1.0) + 1e-4 * carry
            out = pipe._sample_tile(p, lq, k)
            return jnp.mean(out), ()
        out, _ = jax.lax.scan(body, jnp.float32(0), jax.random.split(key, n_iter))
        return out

    float(chained(params, jax.random.PRNGKey(2)))
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        float(chained(params, jax.random.PRNGKey(3 + r)))
        times.append((time.perf_counter() - t0) / n_iter)
    mpx = BATCH * (TILE * SF) ** 2 / 1e6
    print("CHILD_RESULT " + json.dumps(
        {"ms": round(min(times) * 1e3, 1), "mpx_s": round(mpx / min(times), 3)}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child()
        return
    results = {}
    for name, flags in CONFIGS.items():
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # no persistent compile cache: flag changes must recompile honestly
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        p = subprocess.run([sys.executable, __file__, "--child"],
                           capture_output=True, text=True, env=env,
                           timeout=1800)
        line = next((ln for ln in p.stdout.splitlines()
                     if ln.startswith("CHILD_RESULT ")), None)
        if line is None:
            err = (p.stderr or "").strip().splitlines()
            results[name] = {"error": err[-1] if err else f"rc={p.returncode}"}
        else:
            results[name] = json.loads(line[len("CHILD_RESULT "):])
        print(f"{name:>20}: {results[name]}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
