"""End-to-end ResShift pipeline: config -> models -> one-jit sampler.

The reference runs its reverse chain as a host loop with 15/4 separate
kernel-launch rounds plus VQGAN encode/decode round-trips
(models/gaussian_diffusion.py:367-472, sampler.py:119-165).  Here the whole
thing — bicubic upsample, VQGAN encode, prior sample, `lax.scan` over
timesteps, VQGAN decode, clamp — compiles to a single XLA program per input
shape.  Tiled ("chopped") inference for large images is likewise folded into
the same program via a static tile grid (ops/tiling.py), with tiles batched
through the sampler in fixed-size chunks via `lax.map`.

Task parity notes:
  * `clip_denoised` is False whenever an autoencoder is present
    (sampler.py:150 — clip_denoised=(autoencoder is None)).
  * Inputs are reflect-padded to a multiple of `padding_offset` (=lq_size)
    and cropped back (sampler.py:130-137,160-161).
  * Output clamped to [-1, 1] (sampler.py:165).
  * `noise_repeat` repeats sample-0's noise across the batch
    (gaussian_diffusion.py:359-360,447-448).
"""

from __future__ import annotations

import functools
import math
from typing import Any

import jax
import jax.numpy as jnp

from .config import task_config
from .diffusion import build_schedule
from .diffusion import resshift as rs
from .models import UNetModelSwin, VQModel
from .ops.resize import resize
from .ops.tiling import TileGrid


class ResShiftPipeline:
    """Holds model definitions + schedule; `sample` is the jitted entry."""

    def __init__(self, config: dict | str, dtype=jnp.bfloat16, use_autoencoder: bool = True,
                 quant_vqgan: str | None = None):
        if isinstance(config, str):
            config = task_config(config)
        self.config = config
        self.sf = int(config["sf"])
        d = config["diffusion"]
        # `variant: ddpm` selects the classic-DDPM/DDIM chain (the
        # reference's create_gaussian_diffusion_ddpm ablation path,
        # models/script_util.py:57-92) — reachable from any YAML config via
        # this key; everything else runs the ResShift residual-shifting
        # chain.  The variant swaps only the per-tile chain; padding,
        # tiling, sharded samplers and the CLI all route through unchanged.
        self.variant = d.get("variant", "resshift")
        self.scale_factor = float(d.get("scale_factor", 1.0))
        if self.variant == "ddpm":
            from .diffusion import ddpm as _ddpm

            self._ddpm = _ddpm
            self.ddpm_sampler = d.get("sampler", "ancestral")  # | "ddim"
            self.ddpm_eta = float(d.get("eta", 0.0))
            self.sched = _ddpm.build_ddpm_schedule(
                steps=d.get("steps", 1000),
                beta_start=d.get("beta_start", 1e-4),
                beta_end=d.get("beta_end", 0.02),
                predict_xstart=(d.get("predict_type", "epsilon") == "xstart"),
                timestep_respacing=d.get("timestep_respacing"),
                scale_factor=self.scale_factor, sf=self.sf,
            )
        elif self.variant != "resshift":
            raise ValueError(f"unknown diffusion.variant '{self.variant}'")
        if self.variant == "resshift":
            self.sched = build_schedule(
                schedule_name=d.get("schedule_name", "exponential"),
                steps=d["steps"], min_noise_level=d["min_noise_level"],
                etas_end=d.get("etas_end", 0.99), kappa=d.get("kappa", 1.0),
                power=d.get("power", 0.3),
                predict_type=d.get("predict_type", "xstart"),
                timestep_respacing=d.get("timestep_respacing"),
                mat_path=d.get("mat_path"),
                normalize_input=d.get("normalize_input", True),
                latent_flag=d.get("latent_flag", True),
                scale_factor=self.scale_factor, sf=self.sf,
            )
        m = dict(config["model"])
        m.pop("dims", None)
        m.pop("use_fp16", None)
        m.pop("ckpt_path", None)  # weights loaded separately (trainer/CLI)
        self.unet = UNetModelSwin(dtype=dtype, **m)
        self.cond_lq = m.get("cond_lq", True)
        self.cond_mask = m.get("cond_mask", False)
        # lax.scan unroll for the denoising loop (identical math; >1 lets
        # XLA schedule across steps — the tail of step i overlaps the head
        # of step i+1).  Swept on chip in tools/profile_unroll.py (round 5):
        # 1 -> 3.079 Mpx/s, 3 -> 3.091, 5 -> 3.108 (+0.9%), 15 -> 3.094;
        # 5 wins and costs only compile time (84 -> 102 s cold).
        # Part of any jit cache key via the traced sampler closure.
        self.scan_unroll = 5
        ae = config.get("autoencoder")
        if ae is not None and use_autoencoder:
            # quant_vqgan='int8': EXPERIMENTAL quantized conv backbones
            # (ops/quant.py; measured net-negative at the composed level —
            # PERF.md) — only the one-shot encode/decode halves are ever
            # quantized; the iterated denoiser always stays bf16/f32.
            self.vq = VQModel(ddconfig=ae["ddconfig"], n_embed=ae["n_embed"],
                              embed_dim=ae["embed_dim"], dtype=dtype,
                              quant=quant_vqgan)
        else:
            self.vq = None
        inf = config.get("inference", {})
        self.padding_offset = int(inf.get("padding_offset", m.get("lq_size", 64)))
        self.chop_size = int(inf.get("chop_size", 512))
        self.chop_stride = int(inf.get("chop_stride", 448))
        self._jit_cache: dict[Any, Any] = {}

    # ------------------------------------------------------------ params

    def init_params(self, key: jax.Array, lq_hw: tuple[int, int] | None = None) -> dict:
        """Random params (for benchmarking / training-from-scratch)."""
        h = w = self.config["model"].get("lq_size", 64)
        if lq_hw is not None:
            h, w = lq_hw
        ku, kv = jax.random.split(key)
        lat_h, lat_w = self._latent_hw(h, w)
        x = jnp.zeros((1, lat_h, lat_w, self.config["model"].get("in_channels", 3)))
        lq = jnp.zeros((1, h, w, 3))
        mask = jnp.zeros((1, h, w, 1)) if self.cond_mask else None
        t = jnp.zeros((1,), jnp.int32)
        kw = {"lq": lq} if self.cond_lq else {}
        if mask is not None:
            kw["mask"] = mask
        params = {"unet": self.unet.init(ku, x, t, **kw)["params"]}
        if self.vq is not None:
            img = jnp.zeros((1, h * self.sf, w * self.sf, 3))
            params["vqgan"] = self.vq.init(kv, img)["params"]
        return params

    def load_unet_checkpoint(self, path: str):
        """UNet params from a torch .pth (converted) or a native orbax dir.

        Mirrors the reference trainer's `model.ckpt_path` load
        (trainer.py:204-234) / sampler build (sampler.py:83-116).
        """
        if str(path).endswith(".pth"):
            from .convert import convert_unet_swin, load_torch_state_dict

            m = self.config["model"]
            return convert_unet_swin(
                load_torch_state_dict(path),
                image_size=m["image_size"], channel_mult=m["channel_mult"],
                num_res_blocks=m["num_res_blocks"],
                attention_resolutions=m["attention_resolutions"],
                swin_depth=m.get("swin_depth", 2), cond_lq=m.get("cond_lq", True),
                lq_size=m.get("lq_size", 64),
                resblock_updown=m.get("resblock_updown", False),
            )
        from .checkpoint import load_params

        p = load_params(path)
        return p["unet"] if isinstance(p, dict) and "unet" in p else p

    def load_vqgan_checkpoint(self, path: str):
        """Frozen-VQGAN params from a torch .pth or native orbax dir
        (reference `autoencoder.ckpt_path`, trainer.py:444-469)."""
        if str(path).endswith(".pth"):
            from .convert import convert_vqgan, load_torch_state_dict

            dd = self.config["autoencoder"]["ddconfig"]
            return convert_vqgan(
                load_torch_state_dict(path),
                ch_mult=dd["ch_mult"], num_res_blocks=dd["num_res_blocks"],
                attn_resolutions=dd.get("attn_resolutions", ()),
                resolution=dd.get("resolution", 256),
            )
        from .checkpoint import load_params

        p = load_params(path)
        return p["vqgan"] if isinstance(p, dict) and "vqgan" in p else p

    def load_torch_checkpoints(self, unet_path: str, vqgan_path: str | None = None) -> dict:
        """Load + convert the reference's released .pth checkpoints."""
        params = {"unet": self.load_unet_checkpoint(unet_path)}
        if vqgan_path is not None and self.vq is not None:
            params["vqgan"] = self.load_vqgan_checkpoint(vqgan_path)
        return params

    # ------------------------------------------------------------- core

    def _latent_hw(self, h: int, w: int) -> tuple[int, int]:
        """Latent spatial dims for an (h, w) LQ input: upsample by sf, then
        divide by the AE's downsampling factor."""
        if self.vq is None:
            return h * self.sf, w * self.sf
        f = 2 ** (len(self.config["autoencoder"]["ddconfig"]["ch_mult"]) - 1)
        return h * self.sf // f, w * self.sf // f

    def _encode(self, vq_params, y: jnp.ndarray, up_sample: bool) -> jnp.ndarray:
        if up_sample and self.sf != 1:
            n, h, w, c = y.shape
            y = resize(y, (h * self.sf, w * self.sf), "bicubic_torch")
        if self.vq is None:
            return y.astype(jnp.float32)
        z = self.vq.apply({"params": vq_params}, y, method=self.vq.encode)
        return z.astype(jnp.float32) * self.sched.scale_factor

    def _decode(self, vq_params, z: jnp.ndarray) -> jnp.ndarray:
        if self.vq is None:
            return z
        z = z / self.sched.scale_factor
        return self.vq.apply({"params": vq_params}, z, method=self.vq.decode).astype(jnp.float32)

    def _compute_params(self, params):
        """Pre-cast matmul/conv kernels to the compute dtype ONCE.

        Flax casts each f32 param at its use site; inside the 15-step
        `lax.scan` that cast re-runs every step (~0.7 GB of HBM traffic per
        step for the 119M-param UNet).  Casting ahead of the scan makes the
        in-loop casts no-ops.  Only "kernel" leaves are cast — GroupNorm
        scale/bias, rel-pos tables and the VQ codebook are consumed in f32
        math, and the UNet head conv (`out_conv`) runs in f32 by design.
        """
        if self.unet.dtype != jnp.bfloat16:
            return params

        def cast(path, leaf):
            names = [getattr(p, "key", "") for p in path]
            if names[-1] != "kernel" or "out_conv" in names:
                return leaf
            return leaf.astype(jnp.bfloat16)

        return jax.tree_util.tree_map_with_path(cast, params)

    def _cond_kwargs(self, params, lq, mask):
        """Denoiser conditioning kwargs.  When the model has an LQ feature
        pyramid (lq_size != image_size: faceir & friends), run it ONCE here
        and pass the timestep-invariant features to every step — the
        reference recomputes the pyramid per step (unet.py:692-702)."""
        model_kwargs = {}
        if not self.cond_lq:
            return model_kwargs
        mask = mask if self.cond_mask and mask is not None else None
        if self.unet.lq_size != self.unet.image_size:
            model_kwargs["lq_feat"] = self.unet.apply(
                {"params": params["unet"]}, None, None, lq=lq, mask=mask,
                features_only=True)
        else:
            model_kwargs["lq"] = lq
            if mask is not None:
                model_kwargs["mask"] = mask
        return model_kwargs

    def _sample_tile(self, params, lq, key, mask=None, noise_repeat=False):
        """Sampler for one (padded) tile batch — everything in latent space
        plus encode/decode; traced into the enclosing jit."""
        if self.variant == "ddpm":
            return self._sample_tile_ddpm(params, lq, key, mask)
        params = self._compute_params(params)
        z_y = self._encode(params.get("vqgan"), lq, up_sample=True)

        model_kwargs = self._cond_kwargs(params, lq, mask)

        def model_fn(x, t_orig, **kw):
            return self.unet.apply({"params": params["unet"]}, x, t_orig, **kw)

        key, kprior = jax.random.split(key)
        noise = jax.random.normal(kprior, z_y.shape, dtype=jnp.float32)
        if noise_repeat:
            noise = jnp.broadcast_to(noise[:1], noise.shape)
        z0 = rs.sample_loop(
            self.sched, model_fn, z_y, key, noise=noise,
            clip_denoised=(self.vq is None), model_kwargs=model_kwargs,
            noise_repeat=noise_repeat, unroll=self.scan_unroll,
        )
        img = self._decode(params.get("vqgan"), z0)
        return jnp.clip(img, -1.0, 1.0)

    def _sample_tile_ddpm(self, params, lq, key, mask=None):
        """Classic-DDPM/DDIM chain for one tile batch: pure-noise start at
        the latent shape, LQ conditioning via model kwargs, first-stage
        decode at the end — the reference's GaussianDiffusionDDPM
        p_sample_loop / ddim_sample_loop (gaussian_diffusion.py:894-935,
        1068-1099) as a single lax.scan."""
        params = self._compute_params(params)
        model_kwargs = self._cond_kwargs(params, lq, mask)

        def model_fn(x, t_orig, **kw):
            return self.unet.apply({"params": params["unet"]}, x, t_orig, **kw)

        b, h, w, _ = lq.shape
        lat_h, lat_w = self._latent_hw(h, w)
        shape = (b, lat_h, lat_w,
                 self.config["model"].get("in_channels", 3))
        clip = self.vq is None
        if self.ddpm_sampler == "ddim":
            z0 = self._ddpm.ddim_sample_loop(
                self.sched, model_fn, shape, key, eta=self.ddpm_eta,
                clip_denoised=clip, model_kwargs=model_kwargs)
        else:
            z0 = self._ddpm.p_sample_loop(
                self.sched, model_fn, shape, key, clip_denoised=clip,
                model_kwargs=model_kwargs)
        img = self._decode(params.get("vqgan"), z0)
        return jnp.clip(img, -1.0, 1.0)

    def _sample_padded(self, params, lq, key, mask, noise_repeat, chop_size,
                       chop_stride, tile_bs):
        """Pad -> (maybe tile) -> sample -> crop.  Static-shape core."""
        params = self._compute_params(params)  # once, outside the tile map
        b, h, w, c = lq.shape
        offset = self.padding_offset
        ph = math.ceil(h / offset) * offset - h
        pw = math.ceil(w / offset) * offset - w
        if ph or pw:
            lq = jnp.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        hp, wp = h + ph, w + pw

        if hp <= chop_size and wp <= chop_size:
            out = self._sample_tile(params, lq, key, mask, noise_repeat)
        else:
            grid = TileGrid(hp, wp, chop_size, chop_stride, sf=self.sf)
            tiles = grid.split(lq)  # (T*B, th, tw, C)
            mtiles = grid.split(mask) if mask is not None else None
            t_total = grid.num_tiles * b
            # never batch more tiles than exist (also keeps the wrap-around
            # pad below valid: pad_t < tile_bs <= t_total)
            tile_bs = max(1, min(int(tile_bs), t_total))
            n_chunks = math.ceil(t_total / tile_bs)
            pad_t = n_chunks * tile_bs - t_total
            if pad_t:
                tiles = jnp.concatenate([tiles, tiles[:pad_t]], axis=0)
                if mtiles is not None:
                    mtiles = jnp.concatenate([mtiles, mtiles[:pad_t]], axis=0)
            th, tw = grid.tile_hw
            tiles = tiles.reshape(n_chunks, tile_bs, th, tw, c)
            keys = jax.random.split(key, n_chunks)
            if mtiles is not None:
                mtiles = mtiles.reshape(n_chunks, tile_bs, th, tw, mtiles.shape[-1])

                def body(args):
                    tl, mk, k = args
                    return self._sample_tile(params, tl, k, mk, noise_repeat)

                outs = jax.lax.map(body, (tiles, mtiles, keys))
            else:

                def body(args):
                    tl, k = args
                    return self._sample_tile(params, tl, k, None, noise_repeat)

                outs = jax.lax.map(body, (tiles, keys))
            outs = outs.reshape(n_chunks * tile_bs, th * self.sf, tw * self.sf, c)
            if pad_t:
                outs = outs[:t_total]
            out = grid.gather(outs, b)

        return out[:, :h * self.sf, :w * self.sf, :]

    def sample_time_parallel(self, params, lq, key, mask=None, *,
                             sweeps: int | None = None, mesh=None):
        """Latency-oriented sampler: Picard-parallel reverse chain
        (rs.sample_loop_parallel).  The denoiser runs once per sweep on a
        (T*B) batch — sharded over the mesh's data axis when `mesh` is given
        — instead of T sequential times; `sweeps=T` is exactly
        :meth:`sample`, `sweeps≈T/3` is the paper's operating point.
        Input must fit one tile (no chopping).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = 1 if mesh is None else len(mesh.devices.ravel())
        # the compiled fn closes over the mesh -> full layout in the key
        sig = ("tpar", lq.shape, None if mask is None else mask.shape,
               sweeps, None if mesh is None else tuple(mesh.shape.items()))
        if sig not in self._jit_cache:
            shard_fn = None
            if mesh is not None:
                shd = NamedSharding(mesh, P("data"))

                def shard_fn(x):
                    return jax.lax.with_sharding_constraint(x, shd)

            def fn(params, lq, mask, key):
                params = self._compute_params(params)
                z_y = self._encode(params.get("vqgan"), lq, up_sample=True)
                model_kwargs = self._cond_kwargs(params, lq, mask)

                def model_fn(x, t_orig, **kw):
                    return self.unet.apply({"params": params["unet"]}, x, t_orig, **kw)

                # same PRNG consumption as _sample_tile, so sweeps=T
                # reproduces `sample` exactly
                key2, kprior = jax.random.split(key)
                noise = jax.random.normal(kprior, z_y.shape, dtype=jnp.float32)
                z0 = rs.sample_loop_parallel(
                    self.sched, model_fn, z_y, key2, sweeps=sweeps, noise=noise,
                    clip_denoised=(self.vq is None), model_kwargs=model_kwargs,
                    shard_fn=shard_fn,
                )
                img = self._decode(params.get("vqgan"), z0)
                return jnp.clip(img, -1.0, 1.0)

            self._jit_cache[sig] = jax.jit(fn)
        if mesh is not None:
            with mesh:
                return self._jit_cache[sig](params, lq, mask, key)
        return self._jit_cache[sig](params, lq, mask, key)

    def sample_progressive(self, params, lq, key, mask=None):
        """Reverse chain that also returns the decoded per-step x0 predictions
        (T, B, H*sf, W*sf, C) — the reference's progressive-sampling strip
        logged during validation (trainer.py:898-938 via
        p_sample_loop_progressive, gaussian_diffusion.py:421-472).

        Input must fit one tile (no chopping); intended for val-time strips.
        """
        sig = ("progressive", lq.shape, None if mask is None else mask.shape)
        if sig not in self._jit_cache:

            def fn(params, lq, mask, key):
                z_y = self._encode(params.get("vqgan"), lq, up_sample=True)
                model_kwargs = self._cond_kwargs(params, lq, mask)

                def model_fn(x, t_orig, **kw):
                    return self.unet.apply({"params": params["unet"]}, x, t_orig, **kw)

                z0, _, pred_x0s = rs.sample_loop_progressive(
                    self.sched, model_fn, z_y, key,
                    clip_denoised=(self.vq is None), model_kwargs=model_kwargs,
                )
                final = jnp.clip(self._decode(params.get("vqgan"), z0), -1.0, 1.0)
                strip = jax.lax.map(
                    lambda z: jnp.clip(self._decode(params.get("vqgan"), z), -1.0, 1.0),
                    pred_x0s,
                )
                return final, strip

            self._jit_cache[sig] = jax.jit(fn)
        return self._jit_cache[sig](params, lq, mask, key)

    # -------------------------------------------------------------- API

    def _tp_clone(self) -> "ResShiftPipeline":
        """Shallow pipeline clone whose modules pin `use_pallas=False`.

        GSPMD partitions XLA ops but treats Pallas custom calls as opaque,
        so the tensor-parallel sampler runs the (mathematically identical)
        XLA compositions.  The clone shares schedule/config; its jit cache
        is private.
        """
        import copy

        tp = copy.copy(self)
        tp.unet = self.unet.clone(use_pallas=False)
        if self.vq is not None:
            tp.vq = self.vq.clone(use_pallas=False)
        tp._jit_cache = {}
        return tp

    def sample_tp(self, params, lq, key, mesh, mask=None, *,
                  noise_repeat=False, chop_size: int | None = None,
                  chop_stride: int | None = None):
        """Tensor-parallel sampler: model weights sharded over the mesh's
        `model` axis (parallel/tp.py layout), optionally combined with batch
        sharding over a `data` axis (2-D DP x TP mesh).

        This is the batch-1 LATENCY lever the reference cannot express: a
        single image's denoising chain runs with every chip computing a
        channel/feature shard of each layer, collectives riding ICI —
        versus `sample_batch_sharded`/`sample_tiles_sharded`, which scale
        THROUGHPUT but leave one request at single-chip latency.

        Inputs larger than `chop_size` are chopped (ImageSpliterTh role,
        sampler.py:186-208): the tile grid is walked in chunks of
        `data`-axis size, each chunk's tiles computed tensor-parallel —
        chopped RealSet-style inputs keep the TP latency benefit per tile.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel import tp as tpmod

        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        if "model" not in axes:
            raise ValueError("sample_tp needs a mesh axis named 'model'")
        chop_size = chop_size or self.chop_size
        chop_stride = chop_stride or self.chop_stride
        params = tpmod.shard_params(params, mesh)
        n_data = axes.get("data", 1)
        b, h, w, c = lq.shape
        bspec = P("data") if n_data > 1 else P()

        if h <= chop_size and w <= chop_size:
            pad = (-b) % n_data
            if pad:
                lq = jnp.concatenate([lq, jnp.repeat(lq[-1:], pad, axis=0)], axis=0)
                if mask is not None:
                    mask = jnp.concatenate(
                        [mask, jnp.repeat(mask[-1:], pad, axis=0)], axis=0)
            lq = jax.device_put(lq, NamedSharding(mesh, bspec))
            if mask is not None:
                mask = jax.device_put(mask, NamedSharding(mesh, bspec))
            sig = ("tp", lq.shape, None if mask is None else mask.shape,
                   bool(noise_repeat), tuple(sorted(axes.items())))
            if sig not in self._jit_cache:
                tpp = self._tp_clone()
                self._jit_cache[sig] = jax.jit(
                    lambda p, x, k, m: tpp._sample_tile(p, x, k, m, noise_repeat),
                    out_shardings=NamedSharding(mesh, bspec))
            with mesh:
                out = self._jit_cache[sig](params, lq, key, mask)
            return out[:b]

        # ---- chopped TP path ----
        offset = self.padding_offset
        ph = math.ceil(h / offset) * offset - h
        pw = math.ceil(w / offset) * offset - w
        sig = ("tp-chop", lq.shape, None if mask is None else mask.shape,
               bool(noise_repeat), chop_size, chop_stride,
               tuple(sorted(axes.items())))
        if sig not in self._jit_cache:
            tpp = self._tp_clone()
            grid = TileGrid(h + ph, w + pw, chop_size, chop_stride, sf=self.sf)

            def fn(params, lq, mask, key):
                if ph or pw:
                    lq = jnp.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                 mode="reflect")
                    if mask is not None:
                        mask = jnp.pad(mask, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                       mode="reflect")
                tiles = grid.split(lq)
                mtiles = grid.split(mask) if mask is not None else None
                t_total = tiles.shape[0]
                pad_t = (-t_total) % n_data
                if pad_t:  # wrap-around pad (valid even when n_data > tiles)
                    idx = jnp.arange(t_total + pad_t) % t_total
                    tiles = tiles[idx]
                    if mtiles is not None:
                        mtiles = mtiles[idx]
                th, tw = grid.tile_hw
                n_chunks = tiles.shape[0] // n_data
                tiles = tiles.reshape(n_chunks, n_data, th, tw, c)
                keys = jax.random.split(key, n_chunks)
                shd = NamedSharding(mesh, bspec)

                if mtiles is not None:
                    mtiles = mtiles.reshape(n_chunks, n_data, th, tw,
                                            mtiles.shape[-1])

                    def body(args):
                        tl, mk, k = args
                        tl = jax.lax.with_sharding_constraint(tl, shd)
                        return tpp._sample_tile(params, tl, k, mk, noise_repeat)

                    outs = jax.lax.map(body, (tiles, mtiles, keys))
                else:

                    def body(args):
                        tl, k = args
                        tl = jax.lax.with_sharding_constraint(tl, shd)
                        return tpp._sample_tile(params, tl, k, None, noise_repeat)

                    outs = jax.lax.map(body, (tiles, keys))
                outs = outs.reshape(n_chunks * n_data, th * self.sf,
                                    tw * self.sf, c)
                if pad_t:
                    outs = outs[:t_total]
                return grid.gather(outs, b)[:, :h * self.sf, :w * self.sf, :]

            self._jit_cache[sig] = jax.jit(fn)
        with mesh:
            return self._jit_cache[sig](params, lq, mask, key)

    def sample_tiles_sharded(self, params, lq, key, mesh, mask=None, *,
                             chop_size: int | None = None,
                             chop_stride: int | None = None):
        """Tile-parallel inference over a device mesh.

        The reference's multi-GPU inference slices each dataloader batch by
        rank (sampler.py:273-283); its spatial-scaling mechanism (chopped
        tiles) stays a host loop.  Here the tile axis itself is sharded: all
        tiles of one (padded) image form a batch that is distributed over
        the mesh's data axis, each device runs the full 15/4-step sampler on
        its tiles, and the overlap-average gather runs on the replicated
        result — SURVEY §5.7's "ring-attention analog" as a first-class
        sharded-tiling module.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        chop_size = chop_size or self.chop_size
        chop_stride = chop_stride or self.chop_stride
        b, h, w, c = lq.shape
        offset = self.padding_offset
        ph = math.ceil(h / offset) * offset - h
        pw = math.ceil(w / offset) * offset - w
        if ph or pw:
            lq = jnp.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        hp, wp = h + ph, w + pw
        grid = TileGrid(hp, wp, chop_size, chop_stride, sf=self.sf)
        n_dev = len(mesh.devices.ravel())

        def fn(params, lq, mask, key):
            params = self._compute_params(params)
            tiles = grid.split(lq)
            mtiles = grid.split(mask) if mask is not None else None
            t_total = tiles.shape[0]
            pad_t = (-t_total) % n_dev
            if pad_t:
                tiles = jnp.concatenate([tiles, tiles[:pad_t]], axis=0)
                if mtiles is not None:
                    mtiles = jnp.concatenate([mtiles, mtiles[:pad_t]], axis=0)
            # shard the tile axis across devices
            shd = NamedSharding(mesh, P("data"))
            tiles = jax.lax.with_sharding_constraint(tiles, shd)
            out = self._sample_tile(params, tiles, key, mtiles)
            if pad_t:
                out = out[:t_total]
            return grid.gather(out, b)[:, :h * self.sf, :w * self.sf, :]

        sig = ("sharded", lq.shape, None if mask is None else mask.shape,
               chop_size, chop_stride, tuple(mesh.shape.items()))
        if sig not in self._jit_cache:
            self._jit_cache[sig] = jax.jit(fn)
        with mesh:
            return self._jit_cache[sig](params, lq, mask, key)

    def sample_spatial(self, params, lq, key, mesh, mask=None, *,
                       noise_repeat=False, axis: str = "space"):
        """Spatially-sharded inference: the image HEIGHT axis is sharded
        over the mesh's `axis` ("space") and the WHOLE sampler — bicubic
        upsample, VQGAN encode, the full reverse chain, decode — runs as one
        GSPMD program with XLA inserting halo exchanges for the convolution
        borders (collective-permute of edge rows over ICI).

        This is true sequence/context parallelism in the spatial domain
        (SURVEY §5.7): unlike chopped inference (`sample`/
        `sample_tiles_sharded`), which approximates seams by overlap
        averaging (reference util_image.py:963-979), the spatially-sharded
        program computes the mathematically EXACT unchopped result — no
        tile seams, no overlap recompute — while each device holds only
        1/n_space of every activation, so images too large for one chip's
        HBM fit.  Combines with a `data` mesh axis for batch sharding
        (2-D data x space mesh).

        Alignment: the padded latent height must divide by n_space; shard
        boundaries land on swin window rows when (H*sf/f) / n_space is a
        multiple of the window size (true for the flagship's 64-multiple
        padding at n_space <= 8) — misaligned levels still compute exactly,
        GSPMD just inserts extra resharding.  The Pallas kernels are opaque
        to the partitioner, so this path runs the XLA compositions (same
        trade as `sample_tp`).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = dict(zip(mesh.axis_names, mesh.devices.shape))
        if axis not in axes:
            raise ValueError(f"sample_spatial needs a mesh axis named {axis!r}")
        n_space = axes[axis]
        n_data = axes.get("data", 1)
        b, h, w, c = lq.shape
        offset = self.padding_offset
        ph = math.ceil(h / offset) * offset - h
        pw = math.ceil(w / offset) * offset - w
        lat_h, _ = self._latent_hw(h + ph, w + pw)
        if lat_h % n_space:
            raise ValueError(
                f"latent height {lat_h} (from padded input {h + ph}) does not "
                f"divide over {n_space} '{axis}' devices")
        pad_b = (-b) % n_data
        if pad_b:
            lq = jnp.concatenate([lq, jnp.repeat(lq[-1:], pad_b, axis=0)], axis=0)
            if mask is not None:
                mask = jnp.concatenate(
                    [mask, jnp.repeat(mask[-1:], pad_b, axis=0)], axis=0)
        bspec = "data" if n_data > 1 else None
        shd = NamedSharding(mesh, P(bspec, axis, None, None))

        sig = ("spatial", lq.shape, None if mask is None else mask.shape,
               bool(noise_repeat), tuple(mesh.shape.items()), axis)
        if sig not in self._jit_cache:
            spp = self._tp_clone()  # XLA-only clone (Pallas opaque to GSPMD)

            def fn(params, lq, mask, key):
                if ph or pw:
                    lq = jnp.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                 mode="reflect")
                    if mask is not None:
                        mask = jnp.pad(mask, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                       mode="reflect")
                lq = jax.lax.with_sharding_constraint(lq, shd)
                if mask is not None:
                    mask = jax.lax.with_sharding_constraint(mask, shd)
                out = spp._sample_tile(params, lq, key, mask, noise_repeat)
                return out[:, :h * self.sf, :w * self.sf, :]

            self._jit_cache[sig] = jax.jit(fn)
        with mesh:
            out = self._jit_cache[sig](params, lq, mask, key)
        return out[:b]

    def sample_pipelined(self, params, lq, key, mesh, mask=None, *,
                         noise_repeat=False, chop_size: int | None = None,
                         chop_stride: int | None = None, chunk_bs: int = 1,
                         axis: str = "stage"):
        """Pipeline-parallel inference: the reverse-diffusion chain is
        staged over the mesh's `stage` axis (GPipe streaming, parallel/pp.py).

        Stage 0 encodes chunk i and runs the first slice of the chain; the
        latent (+ its conditioning) flows stage-to-stage over ICI via
        `ppermute`; the last stage finishes the chain and decodes.  Each
        stage holds ONE in-flight chunk, so the per-device working set is
        a single chunk's activations regardless of how many images stream
        through, and the encode/denoise/decode phases of different chunks
        overlap in steady state.

        Chunking and per-chunk key derivation mirror `_sample_padded`
        exactly (tile grid, wrap-around pad, `jax.random.split(key,
        n_chunks)` with `chunk_bs` playing `tile_bs`), so the output
        matches `sample(..., tile_bs=chunk_bs)` up to float reduction
        order.  No reference counterpart (its multi-GPU inference is
        rank-sliced batches only, sampler.py:267-283).
        """
        from .parallel import pp

        chop_size = chop_size or self.chop_size
        chop_stride = chop_stride or self.chop_stride
        n_stages = mesh.shape[axis]
        # the compiled fn closes over THIS mesh -> the full mesh layout
        # must be part of the cache key, not just the stage count
        sig = ("pp", lq.shape, None if mask is None else mask.shape,
               bool(noise_repeat), chop_size, chop_stride, chunk_bs,
               tuple(mesh.shape.items()), axis)
        if sig not in self._jit_cache:
            T = self.sched.num_timesteps
            starts_l, counts_l = pp.stage_slices(T, n_stages)
            starts = jnp.asarray(starts_l, jnp.int32)
            counts = jnp.asarray(counts_l, jnp.int32)
            max_cnt = max(counts_l)
            clip_den = self.vq is None

            def ingest(ops, idx):
                params_c, chunks, mchunks, ckeys = ops
                lq_c = jax.lax.dynamic_index_in_dim(chunks, idx, 0,
                                                    keepdims=False)
                k = jax.lax.dynamic_index_in_dim(ckeys, idx, 0,
                                                 keepdims=False)
                # the exact key dance of _sample_tile + rs.sample_loop
                k1, kprior = jax.random.split(k)
                z_y = self._encode(params_c.get("vqgan"), lq_c,
                                   up_sample=True)
                noise = jax.random.normal(kprior, z_y.shape, jnp.float32)
                if noise_repeat:
                    noise = jnp.broadcast_to(noise[:1], noise.shape)
                x_T = rs.prior_sample(self.sched, z_y, noise)
                payload = {"x": x_T, "y": z_y, "lq": lq_c, "key": k1}
                if mchunks is not None:
                    payload["mask"] = jax.lax.dynamic_index_in_dim(
                        mchunks, idx, 0, keepdims=False)
                return payload

            def work(ops, s, payload):
                params_c = ops[0]
                k2, _ = jax.random.split(payload["key"])
                skeys = jax.random.split(k2, T)
                mk = self._cond_kwargs(params_c, payload["lq"],
                                       payload.get("mask"))

                def model_fn(x, t_orig, **kw):
                    return self.unet.apply(
                        {"params": params_c["unet"]}, x, t_orig, **kw)

                x = payload["x"]
                for j in range(max_cnt):
                    t_g = starts[s] - j

                    def do_step(x, t_g=t_g):
                        x_next, _ = rs.p_sample(
                            self.sched, model_fn, x, payload["y"], t_g,
                            skeys[T - 1 - t_g], clip_denoised=clip_den,
                            model_kwargs=mk, noise_repeat=noise_repeat)
                        return x_next

                    x = jax.lax.cond(j < counts[s], do_step,
                                     lambda x: x, x)
                return {**payload, "x": x}

            def emit(ops, payload):
                img = self._decode(ops[0].get("vqgan"), payload["x"])
                return jnp.clip(img, -1.0, 1.0)

            def fn(params, lq, mask, key):
                params_c = self._compute_params(params)
                b, h, w, c = lq.shape
                offset = self.padding_offset
                ph = math.ceil(h / offset) * offset - h
                pw = math.ceil(w / offset) * offset - w
                if ph or pw:
                    lq = jnp.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                 mode="reflect")
                    if mask is not None:
                        mask = jnp.pad(mask,
                                       ((0, 0), (0, ph), (0, pw), (0, 0)),
                                       mode="reflect")
                hp, wp = h + ph, w + pw

                if hp <= chop_size and wp <= chop_size:
                    tiles, mtiles, grid = lq, mask, None
                else:
                    grid = TileGrid(hp, wp, chop_size, chop_stride,
                                    sf=self.sf)
                    tiles = grid.split(lq)
                    mtiles = grid.split(mask) if mask is not None else None

                t_total = tiles.shape[0]
                cb = max(1, min(int(chunk_bs), t_total))
                n_chunks = math.ceil(t_total / cb)
                pad_t = n_chunks * cb - t_total
                if pad_t:
                    tiles = jnp.concatenate([tiles, tiles[:pad_t]], axis=0)
                    if mtiles is not None:
                        mtiles = jnp.concatenate(
                            [mtiles, mtiles[:pad_t]], axis=0)
                th, tw = tiles.shape[1:3]
                chunks = tiles.reshape(n_chunks, cb, th, tw, c)
                mchunks = (None if mtiles is None else
                           mtiles.reshape(n_chunks, cb, th, tw,
                                          mtiles.shape[-1]))
                # grid path (and any multi-chunk stream): per-chunk keys
                # exactly as _sample_padded; the single-chunk single-tile
                # path gets the undivided key, as _sample_tile does
                ckeys = (key[None] if grid is None and n_chunks == 1
                         else jax.random.split(key, n_chunks))

                if "data" in mesh.shape and mesh.shape["data"] > 1:
                    # hybrid PP x DP: each in-flight chunk's batch dim is
                    # sharded over `data` (GSPMD; the pipeline axis stays
                    # manual inside pp.pipeline_stream)
                    from jax.sharding import NamedSharding, PartitionSpec

                    shd = NamedSharding(mesh, PartitionSpec(None, "data"))
                    chunks = jax.lax.with_sharding_constraint(chunks, shd)
                    if mchunks is not None:
                        mchunks = jax.lax.with_sharding_constraint(
                            mchunks, shd)
                outs = pp.pipeline_stream(
                    mesh, axis, (params_c, chunks, mchunks, ckeys),
                    n_chunks=n_chunks, ingest=ingest, work=work, emit=emit)
                outs = outs.reshape(n_chunks * cb, th * self.sf,
                                    tw * self.sf, c)
                if pad_t:
                    outs = outs[:t_total]
                out = outs if grid is None else grid.gather(outs, b)
                return out[:, :h * self.sf, :w * self.sf, :]

            self._jit_cache[sig] = jax.jit(fn)
        with mesh:
            return self._jit_cache[sig](params, lq, mask, key)

    def sample_batch_sharded(self, params, lq, key, mesh, mask=None, *,
                             noise_repeat=False, chop_size: int | None = None,
                             chop_stride: int | None = None, tile_bs: int = 1):
        """Data-parallel batched inference: the image-batch axis is sharded
        over the mesh's `data` axis, so a multi-chip host runs `bs` images
        at once with zero cross-device traffic (each image's full sampler is
        local).  This is the reference's rank-sliced dataloader batch
        (sampler.py:267-283) done as SPMD sharding instead of rank slicing.

        The batch is padded up to a device multiple and cropped back.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = len(mesh.devices.ravel())
        b = lq.shape[0]
        pad = (-b) % n_dev
        if pad:
            lq = jnp.concatenate([lq, jnp.repeat(lq[-1:], pad, axis=0)], axis=0)
            if mask is not None:
                mask = jnp.concatenate([mask, jnp.repeat(mask[-1:], pad, axis=0)], axis=0)
        shd = NamedSharding(mesh, P("data"))
        lq = jax.device_put(lq, shd)
        if mask is not None:
            mask = jax.device_put(mask, shd)
        with mesh:
            out = self.sample(params, lq, key, mask, noise_repeat=noise_repeat,
                              chop_size=chop_size, chop_stride=chop_stride,
                              tile_bs=tile_bs)
        return out[:b]

    def sample(self, params, lq, key, mask=None, *, noise_repeat=False,
               chop_size: int | None = None, chop_stride: int | None = None,
               tile_bs: int = 1):
        """SR/restore a batch of LQ images (NHWC, [-1,1] float32).

        One compiled XLA program per distinct input shape; shapes are cached.
        """
        chop_size = chop_size or self.chop_size
        chop_stride = chop_stride or self.chop_stride
        sig = (lq.shape, None if mask is None else mask.shape, bool(noise_repeat),
               chop_size, chop_stride, tile_bs)
        if sig not in self._jit_cache:
            fn = functools.partial(
                self._sample_padded, noise_repeat=noise_repeat,
                chop_size=chop_size, chop_stride=chop_stride, tile_bs=tile_bs,
            )
            self._jit_cache[sig] = jax.jit(lambda p, x, k, m: fn(p, x, k, m))
        return self._jit_cache[sig](params, lq, key, mask)
