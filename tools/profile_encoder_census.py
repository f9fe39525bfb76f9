"""VQGAN ENCODER census by ablation — the encode phase's ~128 ms was the
one phase never attributed (VERDICT r4 #2: "the one phase never
attacked").  Same composed-ablation method as profile_decoder_census:
compile the FULL encode phase (batch 64: bicubic x4 upsample 64->256 +
f4 encoder 256^2 -> 64^2 latent + quant_conv, bf16, the protocol
workload), then a ladder collapsing one family at a time; consecutive
deltas attribute each family as composed and sum to the phase.

Families: bicubic upsample, down0 blocks (128ch@256^2), down1 blocks
(256ch@128^2), down2 blocks (512ch@64^2), mid blocks + attention, and
the residual skeleton (conv_in 3->128@256^2, the 3 stride-2 downsample
convs, conv_out, quant_conv).

Usage: python -u tools/profile_encoder_census.py [--reps 3] [--n-iter 4]
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

sys.path.insert(0, str(REPO / "tools"))
from profile_decoder_census import Ablate  # noqa: E402  (shared patcher)

B = 64


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n-iter", type=int, default=4)
    args = ap.parse_args()

    from resshift_tpu.ops.resize import resize
    from resshift_tpu.pipeline import ResShiftPipeline

    pipe = ResShiftPipeline("realsr_v1", dtype=jnp.bfloat16)
    cpus = jax.devices("cpu")
    with jax.default_device(cpus[0]):
        params = pipe.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])

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
        float(compiled(params, key))
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(compiled(params, key))
            times.append((time.perf_counter() - t0) / args.n_iter)
        return min(times) * 1e3, fl

    def enc_body(up_sample):
        def body(p, k):
            lq = jax.random.uniform(k, (B, 64, 64, 3), jnp.float32, -1., 1.)
            if up_sample:
                return pipe._encode(p.get("vqgan"), lq, up_sample=True)
            # pre-upsampled input: times the encoder minus the bicubic
            y = jax.random.uniform(k, (B, 256, 256, 3), jnp.float32, -1., 1.)
            return pipe._encode(p.get("vqgan"), y, up_sample=False)
        return body

    ladder = [
        ("full encode (bicubic + f4 enc)", dict(), True),
        ("  - bicubic x4 upsample", dict(), False),
        ("  - down0 blocks (128ch@256^2)",
         dict(resblock_prefixes=("down0_",)), False),
        ("  - down1 blocks (256ch@128^2)",
         dict(resblock_prefixes=("down0_", "down1_")), False),
        ("  - down2 blocks (512ch@64^2)",
         dict(resblock_prefixes=("down0_", "down1_", "down2_")), False),
        ("  - mid blocks + attention (skeleton)",
         dict(resblock_prefixes=("down0_", "down1_", "down2_", "mid_"),
              attn=True), False),
    ]

    rows, prev = [], None
    for label, abkw, up in ladder:
        with Ablate(**abkw):
            ms, fl = timed(enc_body(up))
        delta = None if prev is None else prev - ms
        rows.append((label, ms, fl, delta))
        prev = ms
        print(f"{label:42s} {ms:8.2f} ms   {fl/1e12:6.2f} TF"
              + (f"   family delta {delta:7.2f} ms" if delta is not None
                 else ""), flush=True)

    print("\nAttribution (deltas + skeleton == full by construction):")
    total = rows[0][1]
    for i in range(1, len(rows)):
        name = rows[i][0].strip().lstrip("- ")
        print(f"  {name:40s} {rows[i][3]:7.2f} ms"
              f"  ({100*rows[i][3]/total:4.1f}%)")
    print(f"  {'skeleton (conv_in/downs/out/quant)':40s} {rows[-1][1]:7.2f} ms"
          f"  ({100*rows[-1][1]/total:4.1f}%)")
    print(f"  {'TOTAL':40s} {total:7.2f} ms")


if __name__ == "__main__":
    main()
