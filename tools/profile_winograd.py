"""Winograd F(2,3) vs XLA direct conv on the real chip.

Measures `ops/winograd.winograd_conv3x3` (fused Pallas: transforms + 16
matmuls + inverse transform on VMEM-resident blocks) against
`lax.conv_general_dilated` at the protocol workload's conv shapes
(PERF.md decoder/step censuses).  TF/s is computed from the DIRECT conv's
FLOPs for both, so the column is directly comparable (Winograd does 4/9
of the MACs; "beating the MFU roof" here means exceeding the direct
emitter's effective TF/s).

Run on TPU:  python tools/profile_winograd.py [--xla-formulation]
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
import numpy as np

from resshift_tpu.ops import winograd as wg

N_ITER = 32
DT = jnp.bfloat16

# (label, B, H, C, Co) — the conv families from PERF.md's censuses
SHAPES = [
    ("unet res@64  160ch", 64, 64, 160, 160),
    ("unet res@32  320ch", 64, 32, 320, 320),
    ("unet res@16  640ch", 64, 16, 640, 640),
    ("dec mid@64   512ch", 64, 64, 512, 512),
    ("dec up1@128  512->256", 64, 128, 512, 256),
    ("dec up1@128  256ch", 64, 128, 256, 256),
    ("dec up0@256  256->128", 64, 256, 256, 128),
    ("dec up0@256  128ch", 64, 256, 128, 128),
    ("enc down@128 128ch", 64, 128, 128, 128),
]


def timeit(fn, x, w, b):
    def body(x, keys):
        def step(carry, _):
            y = fn(carry, w, b)
            # feed a scalar of y back so iterations serialize
            return carry * (1.0 + 0.0 * jnp.mean(y.astype(jnp.float32))
                            ).astype(carry.dtype), ()

        out, _ = jax.lax.scan(step, x, keys)
        return jnp.mean(out.astype(jnp.float32))

    f = jax.jit(body)
    keys = jnp.arange(N_ITER)
    c = f.lower(x, keys).compile()
    float(c(x, keys))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(c(x, keys))
        ts.append((time.perf_counter() - t0) / N_ITER)
    return min(ts) * 1e3


def xla_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


def main():
    use_xla_form = "--xla-formulation" in sys.argv
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    shapes = [s for s in SHAPES if not only or any(k in s[0] for k in only)]
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}", flush=True)
    key = jax.random.PRNGKey(0)

    for label, bsz, hw, c, co in shapes:
        kx, kw, kb = jax.random.split(jax.random.fold_in(key, hash(label) % 997), 3)
        with jax.default_device(jax.devices("cpu")[0]):
            x = (jax.random.normal(kx, (bsz, hw, hw, c), jnp.float32) * 0.3).astype(DT)
            w = (jax.random.normal(kw, (3, 3, c, co), jnp.float32) * 0.05).astype(DT)
            b = jax.random.normal(kb, (co,), jnp.float32) * 0.1
        x, w, b = jax.device_put((x, w, b), dev)

        # correctness on a slice
        want = np.asarray(xla_conv(x[:2], w, b), np.float32)
        got = np.asarray(wg.winograd_conv3x3(x[:2], w, b), np.float32)
        scale = np.abs(want).max()
        rel = np.abs(got - want).max() / scale

        gf = 2 * bsz * hw * hw * 9 * c * co / 1e9
        ms_x = timeit(xla_conv, x, w, b)
        ms_w = timeit(wg.winograd_conv3x3, x, w, b)
        line = (f"{label:>22}: XLA {ms_x:7.3f} ms ({gf/ms_x:5.0f} TF/s)  "
                f"wino {ms_w:7.3f} ms ({gf/ms_w:5.0f} TF/s)  "
                f"speedup {ms_x/ms_w:4.2f}x  rel|diff| {rel:.2e}")
        if use_xla_form:
            ms_f = timeit(wg.winograd_conv3x3_xla, x, w, b)
            line += f"  [xla-form {ms_f:7.3f} ms]"
        print(line, flush=True)


if __name__ == "__main__":
    main()
