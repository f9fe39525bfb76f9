"""Isolate the VPU (transcendental) share of the fused swin kernels on the
real chip (follow-up to tools/profile_step_census.py, which showed the
swin@64 MLP kernels at 10.5 ms vs a ~4 ms matmul floor and attn at 7.2 ms
vs ~4 ms: the gap must be elementwise work — GELU-erf chain, softmax exp —
or per-step pipeline overhead).

Times `norm_mlp_residual_stats` / `norm_attn_residual_stats` on the
@64-level shape (B=64, T=4096, C=192) under controlled patches:
  mlp/baseline     A&S erf (exp + divide + deg-4 poly)      [shipping]
  mlp/cheb14       exp/divide-free Clenshaw erf (~6e-7)     [candidate]
  mlp/no-gelu      erf -> 0 (bounds the whole GELU cost)
  attn/baseline    shipping softmax (exp + bias add)
  attn/no-exp      exp -> identity (bounds softmax VPU cost)
  attn/gw4         RSTPU_ATTN_GW=4 super-window grouping

Patches swap module-level helpers before trace; each variant compiles its
own jit so nothing leaks. Measurement: 32 scan-chained calls, min of 3.
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

from resshift_tpu.ops import swin_block_pallas as sbp

B, T, C, NH = 64, 4096, 192, 6
N_ITER = 32
DT = jnp.bfloat16


def cheb14_erf(x):
    """erf via x*P(x^2), P = deg-14 Chebyshev on u=x^2 in [0,16] (Clenshaw);
    max abs err ~6e-7 in f32 — no exp, no divide."""
    coef = np.polynomial.chebyshev.chebfit(
        *(lambda g: (g * g / 8.0 - 1.0, np.vectorize(_erf64)(g) / g))(
            np.linspace(1e-8, 4.0, 200001)), 14,
        w=np.linspace(1e-8, 4.0, 200001))
    xc = jnp.clip(jnp.abs(x), 0.0, 4.0)
    v = xc * xc * np.float32(1 / 8.0) - 1.0
    b1 = jnp.zeros_like(v)
    b2 = jnp.zeros_like(v)
    for c in coef[:0:-1].astype(np.float32):
        b1, b2 = 2.0 * v * b1 - b2 + c, b1
    p = v * b1 - b2 + np.float32(coef[0])
    return jnp.sign(x) * xc * p


def _erf64(y):
    from math import erf
    return erf(y)


def timeit(name, fn, *args):
    def outer(a):
        def step(carry, _):
            out = fn(a[0] + carry.astype(a[0].dtype), *a[1:])
            out = out[0] if isinstance(out, tuple) else out
            return jnp.mean(out.astype(jnp.float32)), ()

        out, _ = jax.lax.scan(step, jnp.float32(0), None, length=N_ITER)
        return out

    jf = jax.jit(outer)
    c = jf.lower(args).compile()
    float(c(args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(c(args))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / N_ITER * 1e3
    print(f"{name:>18}: {ms:6.3f} ms/call", flush=True)
    return ms


def main():
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (B, T, C), jnp.float32) * 0.5).astype(DT)
    w = jnp.ones((B, C), jnp.float32)
    b = jnp.zeros((B, C), jnp.float32)
    w1 = (jax.random.normal(jax.random.PRNGKey(1), (C, 4 * C)) * 0.05).astype(DT)
    b1 = jnp.zeros((4 * C,), DT)
    w2 = (jax.random.normal(jax.random.PRNGKey(2), (4 * C, C)) * 0.05).astype(DT)
    b2 = jnp.zeros((C,), DT)

    r = {}
    r["mlp/baseline"] = timeit("mlp/baseline", sbp.norm_mlp_residual_stats,
                               x, w, b, w1, b1, w2, b2)
    orig_erf = sbp._erf
    try:
        sbp._erf = cheb14_erf
        r["mlp/cheb14"] = timeit("mlp/cheb14", sbp.norm_mlp_residual_stats,
                                 x, w, b, w1, b1, w2, b2)
        sbp._erf = lambda v: v * 0.0
        r["mlp/no-gelu"] = timeit("mlp/no-gelu", sbp.norm_mlp_residual_stats,
                                  x, w, b, w1, b1, w2, b2)
    finally:
        sbp._erf = orig_erf

    # numeric check of cheb14 vs exact on the fly (f32, CPU)
    with jax.default_device(jax.devices("cpu")[0]):
        g = jnp.linspace(-6, 6, 20001, dtype=jnp.float32)
        err = jnp.max(jnp.abs(cheb14_erf(g) - jax.lax.erf(g)))
        print(f"cheb14 max |err| vs lax.erf: {float(err):.3e}", flush=True)

    # ---- attention ----
    wqkv = (jax.random.normal(jax.random.PRNGKey(3), (C, 3 * C)) * 0.05).astype(DT)
    bqkv = jnp.zeros((3 * C,), DT)
    wproj = (jax.random.normal(jax.random.PRNGKey(4), (C, C)) * 0.05).astype(DT)
    bproj = jnp.zeros((C,), DT)
    bias = (jax.random.normal(jax.random.PRNGKey(5), (1, NH, 64, 64)) * 0.1
            ).astype(jnp.float32)

    def attn(xx, *a):
        return sbp.norm_attn_residual_stats(xx, *a, num_heads=NH, n_win=64)

    r["attn/baseline"] = timeit("attn/baseline", attn, x, w, b, wqkv, bqkv,
                                wproj, bproj, bias)
    orig_exp = sbp.jnp.exp
    try:
        sbp.jnp = _JnpPatched(orig_exp)
        r["attn/no-exp"] = timeit("attn/no-exp", attn, x, w, b, wqkv, bqkv,
                                  wproj, bproj, bias)
    finally:
        sbp.jnp = jnp
    os.environ["RSTPU_ATTN_GW"] = "4"
    try:
        r["attn/gw4"] = timeit("attn/gw4", attn, x, w, b, wqkv, bqkv,
                               wproj, bproj, bias)
    finally:
        del os.environ["RSTPU_ATTN_GW"]

    import json
    Path("/tmp/kernel_vpu.json").write_text(json.dumps(r, indent=2))
    print("-> /tmp/kernel_vpu.json")


class _JnpPatched:
    """jnp proxy whose exp is identity — bounds softmax exp cost."""

    def __init__(self, orig_exp):
        self._orig = jnp

    def __getattr__(self, k):
        if k == "exp":
            return lambda v: v
        return getattr(jnp, k)


if __name__ == "__main__":
    main()
