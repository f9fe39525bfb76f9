"""VQGAN decoder census by ABLATION (same method as profile_step_census):
compile the FULL f4 decode (batch 64, 64^2 latent -> 256^2 image, bf16 —
the protocol workload's 247 ms phase) plus a ladder of variants where one
component family at a time is collapsed to a shape-preserving identity,
all sharing one param tree.  Consecutive deltas attribute each family's
cost as composed (fusion/relayout interactions included) and sum to the
full phase by construction.

Families: VQ quantizer, mid attention (flash kernel), mid ResnetBlocks,
up2 blocks (512ch@64^2), up1 blocks (512->256@128^2), up0 blocks
(256->128@256^2), the two upsample convs, and the residual skeleton
(post_quant/conv_in/norm_out/conv_out/nearest-repeats).

Usage: python -u tools/profile_decoder_census.py [--reps 3] [--n-iter 4]
"""

from __future__ import annotations

import argparse
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

V5E_PEAK_BF16 = 197e12
B = 64


class Ablate:
    """Construction-time swap of vqgan component families for identities,
    keyed on module name (mid_*/up{N}_*) via the modules' own ablation
    fields (ResnetBlock.skip_only, AttnBlock.identity, Upsample.cheap)."""

    def __init__(self, resblock_prefixes=(), attn=False, upsample=False):
        self.resblock_prefixes = tuple(resblock_prefixes)
        self.attn = attn
        self.upsample = upsample

    def __enter__(self):
        from resshift_tpu.models import vqgan as V

        self._V = V
        self._orig = (V.ResnetBlock, V.AttnBlock, V.Upsample)
        abl = self
        OR, OA, OU = self._orig

        def resnet(*a, **kw):
            name = kw.get("name") or ""
            if any(name.startswith(p) for p in abl.resblock_prefixes):
                kw["skip_only"] = True
            return OR(*a, **kw)

        def attn(*a, **kw):
            if abl.attn:
                kw["identity"] = True
            return OA(*a, **kw)

        def upsample(*a, **kw):
            if abl.upsample:
                kw["cheap"] = True
            return OU(*a, **kw)

        V.ResnetBlock, V.AttnBlock, V.Upsample = resnet, attn, upsample
        return self

    def __exit__(self, *exc):
        (self._V.ResnetBlock, self._V.AttnBlock,
         self._V.Upsample) = self._orig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n-iter", type=int, default=4)
    args = ap.parse_args()

    from resshift_tpu.pipeline import ResShiftPipeline

    pipe = ResShiftPipeline("realsr_v1", dtype=jnp.bfloat16)
    cpus = jax.devices("cpu")
    with jax.default_device(cpus[0]):
        params = pipe.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    lat_h, lat_w = pipe._latent_hw(64, 64)

    def timed(make_body):
        def fn(p, key):
            def step(carry, k):
                return jnp.mean(make_body(p, k)).astype(jnp.float32), ()

            out, _ = jax.lax.scan(step, jnp.float32(0),
                                  jax.random.split(key, args.n_iter))
            return out

        compiled = jax.jit(fn).lower(params, jax.random.PRNGKey(7)).compile()
        try:
            an = compiled.cost_analysis()
            if isinstance(an, list):
                an = an[0]
            fl = float(an.get("flops", 0.0))
        except Exception:
            fl = 0.0
        key = jax.random.PRNGKey(7)
        float(compiled(params, key))  # warmup (host transfer = sync)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(compiled(params, key))
            times.append((time.perf_counter() - t0) / args.n_iter)
        return min(times) * 1e3, fl

    def dec_body(quantize):
        def body(p, k):
            z = jax.random.normal(k, (B, lat_h, lat_w, 3), jnp.float32)
            if quantize:
                return pipe._decode(p.get("vqgan"), z)
            return pipe.vq.apply({"params": p["vqgan"]}, z,
                                 method=lambda m, zz: m.decode(zz, True))
        return body

    ladder = [
        ("full decode (incl. VQ)", dict(), True),
        ("  - VQ quantizer", dict(), False),
        ("  - mid attention", dict(attn=True), False),
        ("  - mid resblocks", dict(attn=True,
                                   resblock_prefixes=("mid_",)), False),
        ("  - up2 blocks (512ch@64^2)",
         dict(attn=True, resblock_prefixes=("mid_", "up2_")), False),
        ("  - up1 blocks (512->256@128^2)",
         dict(attn=True, resblock_prefixes=("mid_", "up2_", "up1_")), False),
        ("  - up0 blocks (256->128@256^2)",
         dict(attn=True, resblock_prefixes=("mid_", "up2_", "up1_", "up0_")),
         False),
        ("  - upsample convs (skeleton)",
         dict(attn=True, resblock_prefixes=("mid_", "up2_", "up1_", "up0_"),
              upsample=True), False),
    ]

    rows, prev = [], None
    for label, abkw, quant in ladder:
        with Ablate(**abkw):
            # module construction happens inside apply (setup is lazy), so
            # the patch must be active during lower()
            ms, fl = timed(dec_body(quant))
        delta = None if prev is None else prev - ms
        rows.append((label, ms, fl, delta))
        prev = ms
        print(f"{label:38s} {ms:8.2f} ms   {fl/1e12:6.2f} TF"
              + (f"   family delta {delta:7.2f} ms" if delta is not None else ""),
              flush=True)

    print("\nAttribution (deltas + skeleton == full by construction):")
    total = rows[0][1]
    for i in range(1, len(rows)):
        name = rows[i][0].strip().lstrip("- ")
        print(f"  {name:34s} {rows[i][3]:7.2f} ms"
              f"  ({100*rows[i][3]/total:4.1f}%)")
    print(f"  {'skeleton (residual)':34s} {rows[-1][1]:7.2f} ms"
          f"  ({100*rows[-1][1]/total:4.1f}%)")
    print(f"  {'TOTAL':34s} {total:7.2f} ms")


if __name__ == "__main__":
    main()
