"""Time one Swin BasicLayer (depth 2, the @64-squared level-1 config) on the
real chip — the unit PERF.md tracks across kernel-fusion rounds."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

B, HW, C = 64, 64, 192
N_ITER = 32
DT = jnp.bfloat16


def main():
    from resshift_tpu.models.swin import BasicLayer

    layer = BasicLayer(in_chans=160, embed_dim=C, num_heads=6, window_size=8,
                       depth=2, build_resolution=HW, dtype=DT)
    key = jax.random.PRNGKey(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x = (jax.random.normal(key, (B, HW, HW, 160), jnp.float32) * 0.5).astype(DT)
        params = layer.init(jax.random.PRNGKey(1), x)["params"]
    dev = jax.devices()[0]
    x, params = jax.device_put((x, params), dev)

    def fn(p, xx, k):
        def step(carry, kk):
            return jnp.mean(layer.apply({"params": p}, xx + carry.astype(DT))
                            .astype(jnp.float32)), ()

        out, _ = jax.lax.scan(step, jnp.float32(0), jax.random.split(k, N_ITER))
        return out

    f = jax.jit(fn)
    c = f.lower(params, x, key).compile()
    float(c(params, x, key))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(c(params, x, key))
        ts.append((time.perf_counter() - t0) / N_ITER)
    print(f"BasicLayer@{HW}^2 depth2 batch{B}: {min(ts) * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
