"""Pretrain a small VQGAN first stage on the bundled testdata (VERDICT r2 #1).

The reference ships its first stage as released LDM weights
(`/root/reference/configs/realsr_swinunet_realesrgan256.yaml:47-68`,
autoencoder_vq_f4.pth) and contains no AE training code; this environment
cannot fetch those weights, so the latent-path training proof needs a first
stage trained here.  This tool fits an f4-style VQModel (Encoder ->
quant_conv -> [VectorQuantizer in decode] -> Decoder, the exact module the
flagship config freezes) on 64px crops of the 16 GT images in
/root/reference/testdata/Bicubicx4/gt with the taming/LDM VQ objective its
checkpoints were trained with (recon + codebook + beta*commitment,
ldm/modules/vqvae/quantize.py:290-298) minus the GAN/perceptual terms — a
reconstruction-faithful first stage is all the diffusion proof requires.

Outputs (under --out):
  ae_ckpt/    orbax params {"vqgan": ...} loadable via `autoencoder.ckpt_path`
  report.json recon PSNR (through-quantize, i.e. the decode path the
              sampler runs), pre-quant latent std (the scale_factor
              calibration input), codebook usage

Usage: python tools/vqgan_pretrain.py --out /tmp/vq_pretrain --iters 4000
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

GT_DIR = "/root/reference/testdata/Bicubicx4/gt"

# f4 geometry (ch_mult length 3 => 4x downsample), shrunk channels: the
# flagship AE is ch=128 on 256px crops; this proof AE keeps the structure
# (two ResnetBlocks per level, mid attention, same quantizer contract) at
# ch=64 (the GroupNorm32 minimum granularity) so it trains to convergence
# on-chip in minutes.
DDCONFIG = dict(
    double_z=False, z_channels=3, resolution=64, in_channels=3, out_ch=3,
    ch=64, ch_mult=[1, 2, 4], num_res_blocks=2, attn_resolutions=[],
    dropout=0.0,
)
N_EMBED = 512
EMBED_DIM = 3


def load_images():
    from resshift_tpu.utils.image_io import imread

    ims = [imread(p) for p in sorted(Path(GT_DIR).glob("*.png"))]
    assert ims, f"no images under {GT_DIR}"
    return np.stack(ims)  # (16, 256, 256, 3) in [0,1]


def sample_batch(rng: np.random.Generator, ims: np.ndarray, bs: int, crop: int):
    n, h, w, _ = ims.shape
    idx = rng.integers(0, n, bs)
    ys = rng.integers(0, h - crop + 1, bs)
    xs = rng.integers(0, w - crop + 1, bs)
    out = np.stack([ims[i, y:y + crop, x:x + crop] for i, y, x in zip(idx, ys, xs)])
    # hflip / rot90 augment (matches the HQ augment the reference trains with)
    if rng.random() < 0.5:
        out = out[:, :, ::-1]
    out = np.rot90(out, k=int(rng.integers(0, 4)), axes=(1, 2))
    return np.ascontiguousarray(out) * 2.0 - 1.0  # [-1, 1]


def val_crops(ims: np.ndarray, crop: int) -> np.ndarray:
    """Center crops, the same held-out views train_proof validates on."""
    n, h, w, _ = ims.shape
    ch, cw = (h - crop) // 2, (w - crop) // 2
    return ims[:, ch:ch + crop, cw:cw + crop] * 2.0 - 1.0


def main():
    global N_EMBED
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/vq_pretrain")
    ap.add_argument("--iters", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--crop", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-embed", type=int, default=N_EMBED,
                    help="codebook size (the flagship f4 ships 8192; the "
                         "512 default was the round-3 first fit — its "
                         "quantization error capped the AE ceiling)")
    args = ap.parse_args()
    N_EMBED = args.n_embed

    import jax
    import jax.numpy as jnp
    import optax

    from resshift_tpu.checkpoint import save_params
    from resshift_tpu.models.vqgan import VQModel
    from resshift_tpu.utils.compile_cache import enable_compile_cache

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    enable_compile_cache(str(out / "xla_cache"))
    print(f"[vq] device: {jax.devices()}", flush=True)

    ims = load_images()
    model = VQModel(ddconfig={k: v for k, v in DDCONFIG.items()},
                    n_embed=N_EMBED, embed_dim=EMBED_DIM, dtype=jnp.bfloat16)
    rng = np.random.default_rng(args.seed)
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.zeros((1, args.crop, args.crop, 3)))["params"]

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=100, decay_steps=args.iters,
        end_value=args.lr * 1e-2)
    tx = optax.adam(sched, b1=0.5, b2=0.9)  # taming-style betas
    opt_state = tx.init(params)

    def loss_fn(p, batch):
        recon, vq_loss = model.apply({"params": p}, batch,
                                     method=model.training_recon)
        recon = recon.astype(jnp.float32)
        rec_mse = jnp.mean((recon - batch) ** 2)
        rec_l1 = jnp.mean(jnp.abs(recon - batch))
        loss = rec_mse + 0.1 * rec_l1 + vq_loss
        return loss, {"loss": loss, "rec_mse": rec_mse, "vq": vq_loss}

    @jax.jit
    def step(p, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, batch)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, metrics

    @jax.jit
    def batch_code_stats(p, batch):
        """Per-batch codebook usage + the batch's pre-quant latents (for
        dead-code revival)."""
        h = model.apply({"params": p}, batch, method=model.encode)
        flat = h.astype(jnp.float32).reshape(-1, EMBED_DIM)
        emb = p["quantize"]["embedding"]
        d = (jnp.sum(flat**2, 1, keepdims=True) + jnp.sum(emb**2, 1)
             - 2.0 * flat @ emb.T)
        idx = jnp.argmin(d, axis=1)
        used = jnp.zeros((N_EMBED,), jnp.int32).at[idx].add(1)
        return used, flat

    @jax.jit
    def evaluate(p, batch):
        """Recon through the real decode path (quantize inside decode) +
        pre-quant latent stats + per-pixel codebook index histogram input."""
        h = model.apply({"params": p}, batch, method=model.encode)
        recon = model.apply({"params": p}, h, method=model.decode)
        recon = jnp.clip(recon.astype(jnp.float32), -1, 1)
        mse = jnp.mean((recon - batch) ** 2, axis=(1, 2, 3))
        psnr = jnp.mean(-10.0 * jnp.log10(jnp.maximum(mse, 1e-12) / 4.0))
        emb = p["quantize"]["embedding"]
        flat = h.astype(jnp.float32).reshape(-1, EMBED_DIM)
        d = (jnp.sum(flat**2, 1, keepdims=True) + jnp.sum(emb**2, 1)
             - 2.0 * flat @ emb.T)
        idx = jnp.argmin(d, axis=1)
        used = jnp.zeros((N_EMBED,), jnp.int32).at[idx].add(1)
        return psnr, jnp.std(h.astype(jnp.float32)), used

    val = jnp.asarray(val_crops(ims, args.crop))
    t0 = time.time()
    t_log = t0
    log = []
    usage = np.zeros((N_EMBED,), np.int64)  # cumulative since last revival
    for it in range(args.iters):
        batch = jnp.asarray(sample_batch(rng, ims, args.batch, args.crop),
                            dtype=jnp.float32)
        params, opt_state, metrics = step(params, opt_state, batch)
        # dead-code revival (standard VQ-VAE practice; the released LDM
        # codebooks were trained at scale and don't need it, a 16-image
        # from-scratch fit does): codes unused over the window are re-seeded
        # from the current batch's encoder outputs, so the codebook tracks
        # the latent distribution instead of collapsing to a few codes
        if (it + 1) % 250 == 0 and it + 1 < args.iters - 500:
            used, flat = batch_code_stats(params, batch)
            usage += np.asarray(used)
            dead = np.flatnonzero(usage == 0)
            if dead.size:
                emb = np.array(params["quantize"]["embedding"])  # writable copy
                flat_np = np.asarray(flat)
                src = rng.integers(0, flat_np.shape[0], dead.size)
                emb[dead] = flat_np[src] + 0.01 * rng.standard_normal(
                    (dead.size, EMBED_DIM))
                params["quantize"]["embedding"] = jnp.asarray(emb)
            usage[:] = 0
        if (it + 1) % 500 == 0:
            psnr, lat_std, used = evaluate(params, val)
            m = {k: float(v) for k, v in metrics.items()}
            now = time.time()
            m.update(iter=it + 1, val_psnr=float(psnr),
                     latent_std=float(lat_std),
                     codes_used=int(jnp.sum(used > 0)),
                     ms_per_iter=round((now - t_log) / 500 * 1e3, 1))
            t_log = now
            log.append(m)
            print(f"[vq {it + 1}/{args.iters}] loss={m['loss']:.4f} "
                  f"recon_mse={m['rec_mse']:.5f} vq={m['vq']:.5f} "
                  f"val_psnr={m['val_psnr']:.2f} dB "
                  f"latent_std={m['latent_std']:.3f} "
                  f"codes={m['codes_used']}/{N_EMBED} "
                  f"({m['ms_per_iter']:.0f} ms/it)", flush=True)
    wall = time.time() - t0

    psnr, lat_std, used = evaluate(params, val)
    # scale_factor calibration: LDM convention 1/std(z) so the diffusion
    # sees ~unit-scale latents; the flagship config ships 1.0 because its
    # released f4 latents are already ~unit std
    scale_factor = float(1.0 / lat_std)
    save_params(out / "ae_ckpt", {"vqgan": params})
    report = {
        "iters": args.iters, "batch": args.batch, "wall_s": wall,
        "ddconfig": DDCONFIG, "n_embed": N_EMBED, "embed_dim": EMBED_DIM,
        "val_psnr_through_quantize": float(psnr),
        "latent_std": float(lat_std),
        "scale_factor": scale_factor,
        "codes_used": int(jnp.sum(used > 0)),
        "log": log,
    }
    (out / "report.json").write_text(json.dumps(report, indent=2))
    print(f"[vq] done in {wall:.0f}s: recon PSNR (through quantize) = "
          f"{float(psnr):.2f} dB, latent std = {float(lat_std):.3f} "
          f"=> scale_factor = {scale_factor:.4f}; "
          f"ckpt -> {out / 'ae_ckpt'}", flush=True)


if __name__ == "__main__":
    main()
