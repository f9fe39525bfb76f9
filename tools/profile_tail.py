"""Measure the fused GN+SiLU+conv_out tail kernel vs the XLA composition
(ops/tail_pallas.py; decoder census item "GN+silu+conv_out(128->3)@256^2 =
10.6 ms vs ~5 ms floor", PERF.md).

Also verifies kernel==XLA numerics on-chip at both operating shapes:
  * decoder tail: (64, 256, 256, 128) bf16 -> 3
  * UNet head:    (64, 64, 64, 160)  f32  -> 3   (runs 15x per sampler call)

Methodology: ops chained in a lax.scan (>=32 iters) to amortize the ~25 ms
relay overhead; completion forced via scalar transfer (PERF.md pitfalls).
"""

from __future__ import annotations

import functools
import os
import sys
import time
from pathlib import Path

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np

import jax
import jax.numpy as jnp

from resshift_tpu.models.layers import group_norm_fold
from resshift_tpu.ops import tail_pallas

N_ITER = 32


def bench(fn, *args):
    @jax.jit
    def chained(*a):
        def body(carry, _):
            out = fn(carry, *a[1:])
            # feed a scalar back so the scan cannot collapse
            return carry + 1e-6 * jnp.mean(out).astype(carry.dtype), ()

        c, _ = jax.lax.scan(body, a[0], None, length=N_ITER)
        return jnp.mean(c)

    float(chained(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(*args))
        ts.append((time.perf_counter() - t0) / N_ITER)
    return min(ts) * 1e3


def check_and_time(name, shape, dtype, co=3, eps=1e-6):
    rng = np.random.default_rng(0)
    b, h, w, c = shape
    x = jnp.asarray(rng.standard_normal(shape), dtype)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    kernel = jnp.asarray(0.05 * rng.standard_normal((3, 3, c, co)), jnp.float32)
    cbias = jnp.asarray(0.1 * rng.standard_normal(co), jnp.float32)
    act_bf16 = dtype == jnp.bfloat16

    def xla(x):
        wv, bv = group_norm_fold(x, scale, bias, 32, eps)
        return tail_pallas._reference(x, wv, bv, kernel, cbias, act_bf16)

    def fused(x):
        return tail_pallas.gn_silu_conv3x3(x, scale, bias, kernel, cbias,
                                           eps=eps, use_pallas=True)

    # numerics first
    a = np.asarray(jax.jit(xla)(x), np.float32)
    bo = np.asarray(jax.jit(fused)(x), np.float32)
    mse = float(np.mean((a - bo) ** 2))
    rng_db = 10 * np.log10(float(np.mean(a * a)) / max(mse, 1e-30))
    d = np.abs(a - bo)
    di = d[:, 2:-2, 2:-2]  # interior (edge rows/cols carry the halo logic)
    print(f"[tail] {name}: kernel-vs-XLA SNR {rng_db:.1f} dB "
          f"(max|diff| {d.max():.2e}; interior max {di.max():.2e}; "
          f"edge-row max {d[:, 0].max():.2e} / "
          f"edge-col max {d[:, :, 0].max():.2e}; "
          f"chunk-boundary row max {d[:, 8].max():.2e})", flush=True)
    assert tail_pallas.tail_available(shape, co), "kernel path not taken!"

    t_xla = bench(xla, x)
    t_fused = bench(fused, x)
    print(f"[tail] {name}: XLA {t_xla:.2f} ms -> fused {t_fused:.2f} ms "
          f"({t_xla / t_fused:.2f}x)", flush=True)
    return t_xla, t_fused


def main():
    print(f"[tail] device: {jax.devices()}", flush=True)
    check_and_time("decoder tail 256^2x128 bf16",
                   (64, 256, 256, 128), jnp.bfloat16, eps=1e-6)
    check_and_time("unet head 64^2x160 f32",
                   (64, 64, 64, 160), jnp.float32, eps=1e-5)


if __name__ == "__main__":
    main()
