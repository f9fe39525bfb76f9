"""Prototype: can a Pallas 3x3-conv kernel beat XLA's native conv on v5e?

Measures a dy-decomposed im2col formulation (3 matmuls of K=3*C with the
W-axis shifts assembled in VMEM) against `lax.conv_general_dilated` on the
ResBlock@64^2 shape (batch 64, 160ch).  Decides whether a fused
GN+SiLU+conv ResBlock kernel is worth building.
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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, HW, C = 64, 64, 160
N_ITER = 32
DT = jnp.bfloat16


def _shift_w(x, dx):
    """(R, W, C) -> W-axis shift by dx with zero edges."""
    r, wdim, c = x.shape
    z = jnp.zeros((r, 1, c), x.dtype)
    if dx == -1:
        return jnp.concatenate([x[:, 1:], z], axis=1)
    if dx == 1:
        return jnp.concatenate([z, x[:, :-1]], axis=1)
    return x


def conv_kernel(top_ref, cur_ref, bot_ref, w_ref, o_ref, *, r):
    """o = 3x3 SAME conv. cur: (1, R, W, C); top/bot: (1, 1, W, C) halo rows
    (zero-masked at the image edge); w: (3, 3*C, Cout) per-dy matrices."""
    _, _, wdim, c = cur_ref.shape
    ri = pl.program_id(1)
    nri = pl.num_programs(1)
    top = top_ref[0]
    bot = bot_ref[0]
    top = jnp.where(ri == 0, jnp.zeros_like(top), top)
    bot = jnp.where(ri == nri - 1, jnp.zeros_like(bot), bot)
    cur = cur_ref[0]
    rows = jnp.concatenate([top, cur, bot], axis=0)  # (R+2, W, C)

    acc = None
    for dy in range(3):
        xr = rows[dy:dy + r]  # (R, W, C)
        m = jnp.concatenate(
            [_shift_w(xr, 1), xr, _shift_w(xr, -1)], axis=-1)  # (R, W, 3C)
        part = jnp.dot(m.reshape(r * wdim, 3 * c), w_ref[dy],
                       preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    o_ref[0] = acc.reshape(r, wdim, w_ref.shape[-1]).astype(o_ref.dtype)


def conv3x3_pallas(x, w, r=8):
    """x: (B, H, W, C) NHWC; w: (3, 3, C, Cout) HWIO."""
    b, h, wdim, c = x.shape
    cout = w.shape[-1]
    # per-dy matrices (3C, Cout): the natural HWIO flatten already orders
    # rows [dx=0 tap, dx=1, dx=2], matching the concat order
    # [shift+1 (x[w-1]), x, shift-1 (x[w+1])]
    wm = w.reshape(3, 3 * c, cout)
    grid = (b, h // r)
    return pl.pallas_call(
        functools.partial(conv_kernel, r=r),
        out_shape=jax.ShapeDtypeStruct((b, h, wdim, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, wdim, c), lambda bi, ri: (bi, (ri * r - 1) % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, wdim, c), lambda bi, ri: (bi, ri, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wdim, c), lambda bi, ri: (bi, (ri * r + r) % h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3 * c, cout), lambda bi, ri: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, wdim, cout), lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x, x, x, wm)


def timeit(name, body, P):
    def fn(p, key):
        def step(carry, k):
            return jnp.mean(body(p, carry).astype(jnp.float32)), ()

        out, _ = jax.lax.scan(step, jnp.float32(0), jax.random.split(key, N_ITER))
        return out

    f = jax.jit(fn)
    key = jax.random.PRNGKey(0)
    c = f.lower(P, key).compile()
    float(c(P, key))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(c(P, key))
        ts.append((time.perf_counter() - t0) / N_ITER)
    ms = min(ts) * 1e3
    gf = 2 * B * HW * HW * 9 * C * C / 1e9
    print(f"{name:>18}: {ms:.3f} ms  ({gf / ms:.0f} TF/s incl ~0.78ms relay)",
          flush=True)


def main():
    key = jax.random.PRNGKey(1)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        P = dict(
            x=(jax.random.normal(key, (B, HW, HW, C), jnp.float32) * 0.3).astype(DT),
            w=(jax.random.normal(jax.random.fold_in(key, 1), (3, 3, C, C),
                                 jnp.float32) * 0.05).astype(DT),
        )
    P = jax.device_put(P, jax.devices()[0])

    # correctness first (one small check on-chip)
    xs = P["x"][:2]
    want = jax.lax.conv_general_dilated(
        xs, P["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(DT)
    got = conv3x3_pallas(xs, P["w"])
    d = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    print("max|diff|:", d.max(), "(bf16 scale ~",
          float(np.abs(np.asarray(want, np.float32)).max()) / 256, ")",
          flush=True)

    timeit("xla_conv", lambda p, c: jax.lax.conv_general_dilated(
        p["x"] + c.astype(DT), p["w"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16), P)
    for r in (8, 16):
        timeit(f"pallas_conv r={r}",
               lambda p, c, r=r: conv3x3_pallas(p["x"] + c.astype(DT), p["w"], r), P)


if __name__ == "__main__":
    main()
