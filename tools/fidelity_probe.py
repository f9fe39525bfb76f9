"""On-chip fidelity probe: full-model Pallas path vs all-XLA path.

The CPU test suite proves kernel==XLA in interpreter mode and JAX==torch
end-to-end; this probe closes the last gap — the REAL Mosaic-compiled
kernels inside the REAL 15-step sampler on the TPU.  Runs the identical
sampler twice (same params, same PRNG key) with the Pallas kernels on and
off and reports PSNR between the outputs.  bf16 LSB differences compound
through the chain, so ~40+ dB means the kernels are numerically faithful;
anything under ~30 dB would indicate a kernel bug.

Usage: python tools/fidelity_probe.py [--task realsr_v1] [--batch 8]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

if os.environ.get("JAX_PLATFORMS") == "axon":
    os.environ["JAX_PLATFORMS"] = "axon,cpu"

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="realsr_v1")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from resshift_tpu.pipeline import ResShiftPipeline

    # one param set, transferred once; two pipeline objects so the jit
    # caches (and the trace-time pallas_available decision) stay separate
    pipe0 = ResShiftPipeline(args.task, dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        params = pipe0.init_params(jax.random.PRNGKey(0))
        lq = jax.random.uniform(jax.random.PRNGKey(5),
                                (args.batch, 64, 64, 3), jnp.float32, -1, 1)
    params = jax.device_put(params, jax.devices()[0])
    lq = jax.device_put(lq, jax.devices()[0])

    outs, lats = {}, {}
    for mode in ("pallas", "xla"):
        if mode == "xla":
            os.environ["RSTPU_NO_PALLAS"] = "1"
        else:
            os.environ.pop("RSTPU_NO_PALLAS", None)
        pipe = ResShiftPipeline(args.task, dtype=jnp.bfloat16)
        out = pipe.sample(params, lq, jax.random.PRNGKey(9))
        outs[mode] = np.asarray(out, np.float64)

        # pre-quantization latent after the full 15-step chain: isolates the
        # fused kernels from the VQ-argmin amplifier (a one-LSB score change
        # can flip a code, which decodes to an O(1) pixel change under a
        # RANDOM codebook — real checkpoints decode near-identically)
        from resshift_tpu.diffusion import resshift as rs

        @jax.jit
        def latents(params, lq, key):
            p = pipe._compute_params(params)
            z_y = pipe._encode(p.get("vqgan"), lq, up_sample=True)

            def model_fn(x, t, **kw):
                return pipe.unet.apply({"params": p["unet"]}, x, t, **kw)

            return rs.sample_loop(pipe.sched, model_fn, z_y,
                                  jax.random.fold_in(key, 0),
                                  clip_denoised=False, model_kwargs={"lq": lq})

        lats[mode] = np.asarray(latents(params, lq, jax.random.PRNGKey(9)),
                                np.float64)
        print(f"{mode}: done", flush=True)

    def report(a, b, tag, peak):
        mse = float(np.mean((a - b) ** 2))
        psnr = 10 * np.log10(peak**2 / max(mse, 1e-12))
        print(f"{tag}: PSNR(pallas vs xla) = {psnr:.2f} dB, "
              f"max|diff| = {float(np.abs(a - b).max()):.4f}")
        return psnr

    p_img = report(outs["pallas"], outs["xla"], "image (post VQ-decode)", 2.0)
    rng = max(float(np.abs(lats["xla"]).max()), 1e-6)
    p_lat = report(lats["pallas"], lats["xla"], "latent (15-step chain)", rng)
    if p_lat < 35:
        print("FIDELITY PROBE FAILED (latent < 35 dB)", file=sys.stderr)
        sys.exit(1)
    print("fidelity probe OK")


if __name__ == "__main__":
    main()
