"""Training-step timing on the real chip: Pallas-forward (+XLA-recompute
backward via custom VJP) vs all-XLA — the measurement VERDICT #9 asks for.

Workload: realsr_v1-sized step (119M-param UNetSwin, frozen f4 VQGAN),
GT 256^2 / LQ 64^2, per-device batch like the reference's microbatch
(configs/realsr_swinunet_realesrgan256.yaml microbatch: 8).
"""

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

from resshift_tpu.pipeline import ResShiftPipeline
from resshift_tpu.trainer import TrainConfig, create_state, make_train_step

B = int(os.environ.get("TRAIN_BATCH", "8"))
N_ITER = 8


def build():
    pipe = ResShiftPipeline("realsr_v1", dtype=jnp.bfloat16)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = pipe.init_params(jax.random.PRNGKey(0))
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    tcfg = TrainConfig(iterations=1000, warmup_iterations=10)
    with jax.default_device(cpu):
        state = create_state(jax.device_get(params["unet"]), tcfg)
    state = jax.device_put(state, dev)
    step = make_train_step(pipe, tcfg)
    return pipe, params, state, step


def run(tag: str):
    pipe, params, state, step = build()

    def chained(state, vq, key):
        def body(carry, k):
            st, acc = carry
            batch = {
                "gt": jax.random.uniform(k, (B, 256, 256, 3), jnp.float32, -1, 1),
                "lq": jax.random.uniform(jax.random.fold_in(k, 1),
                                         (B, 64, 64, 3), jnp.float32, -1, 1),
            }
            st, metrics = step(st, vq, batch, k)
            return (st, acc + metrics["loss"]), ()

        (st, acc), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                    jax.random.split(key, N_ITER))
        return acc

    f = jax.jit(chained)
    key = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    c = f.lower(state, params["vqgan"], key).compile()
    print(f"{tag}: compiled in {time.perf_counter() - t0:.0f}s", flush=True)
    float(c(state, params["vqgan"], key))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(c(state, params["vqgan"], key))
        ts.append((time.perf_counter() - t0) / N_ITER)
    ms = min(ts) * 1e3
    print(f"{tag}: {ms:.1f} ms/step (batch {B}) -> "
          f"{B / (ms / 1e3):.1f} img/s", flush=True)
    return ms


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "pallas"):
        os.environ.pop("RSTPU_NO_PALLAS", None)
        run("pallas_fwd_xla_bwd")
    if which in ("both", "xla"):
        os.environ["RSTPU_NO_PALLAS"] = "1"
        run("all_xla")


if __name__ == "__main__":
    main()
