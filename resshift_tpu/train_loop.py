"""Training orchestrator — the reference's TrainerBase/TrainerDifIR
(trainer.py:39-950) rebuilt around one jitted SPMD step.

Flow per iteration (mirrors trainer.py:296-333):
  data batch (host loader, sharded by process) -> device degradation
  (RealESRGAN pipe) or passthrough -> jitted DP train step (encode,
  q_sample, UNet fwd/bwd, AdamW, EMA — one XLA program over the mesh) ->
  periodic logging / validation (full reverse sampler + PSNR/SSIM) /
  orbax checkpointing.

Multi-host: `jax.process_index()==0` gates logging/ckpt (replacing rank-0
checks); the loader shards by process (replacing DistributedSampler).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .checkpoint import restore_train_state, save_train_state
from .data.datasets import DataLoader, create_dataset
from .data.realesrgan import DegradationConfig, RealESRGANDegrader
from .ops.metrics import batch_psnr, batch_ssim
from .parallel.mesh import data_parallel_shardings, make_mesh
from .pipeline import ResShiftPipeline
from .trainer import State, TrainConfig, create_state, make_train_step
from .utils.image_io import from_model, imwrite


class Trainer:
    def __init__(self, config: dict, save_dir: str = "./save_dir",
                 resume: str | None = None, dtype=jnp.float32,
                 lpips_fn=None, seed: int = 123456):
        self.config = config
        self.save_dir = Path(save_dir)
        self.seed = seed
        self.rank0 = jax.process_index() == 0
        if self.rank0:
            (self.save_dir / "ckpts").mkdir(parents=True, exist_ok=True)
            (self.save_dir / "images").mkdir(parents=True, exist_ok=True)

        tcfg_raw = dict(config.get("train", {}))
        self.tcfg = TrainConfig(
            lr=float(tcfg_raw.get("lr", 5e-5)),
            lr_min=float(tcfg_raw.get("lr_min", 2e-5)),
            lr_schedule=tcfg_raw.get("lr_schedule"),
            warmup_iterations=int(tcfg_raw.get("warmup_iterations", 5000)),
            iterations=int(tcfg_raw.get("iterations", 300000)),
            weight_decay=float(tcfg_raw.get("weight_decay", 0.0)),
            ema_rate=float(tcfg_raw.get("ema_rate", 0.999)),
            microbatch=tcfg_raw.get("microbatch"),
            loss_coef=tuple(tcfg_raw.get("loss_coef", (1.0, 1.0))),
        )
        self.batch = int(tcfg_raw.get("batch", [16, 8])[0]
                         if isinstance(tcfg_raw.get("batch"), (list, tuple))
                         else tcfg_raw.get("batch", 16))
        self.save_freq = int(tcfg_raw.get("save_freq", 10000))
        self.log_freq = tcfg_raw.get("log_freq", [200, 2000])
        self.val_freq = int(tcfg_raw.get("val_freq", self.save_freq))

        # persistent XLA compilation cache: big win for the shape-varied
        # degradation stages across restarts
        try:
            cache_dir = str(self.save_dir / "xla_cache")
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except Exception:
            pass

        self.pipe = ResShiftPipeline(config, dtype=dtype)
        key = jax.random.PRNGKey(seed)
        self.params = self.pipe.init_params(key)
        self.state = create_state(self.params["unet"], self.tcfg)
        self.vq_params = self.params.get("vqgan")
        self.step_fn = make_train_step(self.pipe, self.tcfg, lpips_fn=lpips_fn)

        # mesh + shardings
        self.mesh = make_mesh()
        self.n_dev = len(self.mesh.devices.ravel())

        # data
        dcfg = config.get("data", {})
        train_cfg = dcfg.get("train")
        self.train_type = train_cfg["type"] if train_cfg else None
        if train_cfg:
            ds = create_dataset(train_cfg)
            self.loader = DataLoader(
                ds, batch_size=self.batch, shuffle=True, seed=seed,
                shard_id=jax.process_index(), num_shards=jax.process_count(),
                num_workers=int(tcfg_raw.get("num_workers", 0)),
            )
        self.val_cfg = dcfg.get("val")
        self.degrader = None
        if self.train_type == "realesrgan":
            deg_cfg = dict(config.get("degradation", {}))
            self.degrader = RealESRGANDegrader(DegradationConfig(
                **{k: tuple(v) if isinstance(v, list) else v
                   for k, v in deg_cfg.items() if k in DegradationConfig.__dataclass_fields__}))
        self.np_rng = np.random.default_rng(seed + jax.process_index())

        self._jstep = None
        self.start_iter = 0
        if resume:
            self.resume(resume)

    # ------------------------------------------------------------------

    def _compiled_step(self, batch):
        if self._jstep is None:
            state_sh, batch_sh = data_parallel_shardings(self.mesh, self.state, batch)
            vq_sh, _ = data_parallel_shardings(self.mesh, self.vq_params, batch)
            key_sh, _ = data_parallel_shardings(self.mesh, jax.random.PRNGKey(0), batch)
            self._jstep = jax.jit(self.step_fn,
                                  in_shardings=(state_sh, vq_sh, batch_sh, key_sh))
        return self._jstep

    def prepare_batch(self, raw: dict, key: jax.Array) -> dict:
        """Device degradation for realesrgan data; passthrough otherwise
        (trainer.py:526-704)."""
        if self.degrader is not None:
            return self.degrader(self.np_rng, key, raw)
        return {k: v for k, v in raw.items() if not isinstance(v, list)}

    def train(self):
        log_path = self.save_dir / "train_log.jsonl"
        it = self.start_iter
        data_iter = self.loader.infinite()
        t0 = time.time()
        while it < self.tcfg.iterations:
            raw = next(data_iter)
            key = jax.random.fold_in(jax.random.PRNGKey(self.seed), it)
            batch = self.prepare_batch(raw, jax.random.fold_in(key, 1))
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            with self.mesh:
                self.state, metrics = self._compiled_step(batch)(
                    self.state, self.vq_params, batch, jax.random.fold_in(key, 2))
            it += 1
            if self.rank0 and it % int(self.log_freq[0]) == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m.update(iter=it, ips=int(self.log_freq[0]) / (time.time() - t0))
                t0 = time.time()
                with open(log_path, "a") as f:
                    f.write(json.dumps(m) + "\n")
                print(f"[{it}/{self.tcfg.iterations}] " +
                      " ".join(f"{k}={v:.4g}" for k, v in m.items() if k != "iter"),
                      flush=True)
            if it % self.val_freq == 0 and self.val_cfg and self.rank0:
                self.validate(it)
            if it % self.save_freq == 0 and self.rank0:
                self.save(it)
        if self.rank0:
            self.save(it)
        return self.state

    # ------------------------------------------------------------------

    def validate(self, it: int, max_images: int = 8):
        """Full reverse chain on the val set + PSNR/SSIM (trainer.py:851-950),
        using the EMA params like `use_ema_val: True`."""
        ds = create_dataset(self.val_cfg)
        params = {"unet": self.state.ema_params}
        if self.vq_params is not None:
            params["vqgan"] = self.vq_params
        psnr = ssim = n = 0
        key = jax.random.PRNGKey(0)
        for i in range(min(len(ds), max_images)):
            item = ds[i]
            lq = jnp.asarray(item["lq"])[None]
            sr = self.pipe.sample(params, lq, jax.random.fold_in(key, i))
            sr01 = from_model(np.asarray(sr))
            if i == 0:
                imwrite(sr01[0], self.save_dir / "images" / f"val_{it:06d}.png")
            if "gt" in item:
                gt01 = from_model(np.asarray(item["gt"])[None])
                psnr += batch_psnr(sr01, gt01, ycbcr=True)
                ssim += batch_ssim(sr01, gt01, ycbcr=True)
                n += 1
        if n:
            print(f"[val @{it}] PSNR(Y)={psnr / n:.2f} SSIM(Y)={ssim / n:.4f}", flush=True)
            return psnr / n, ssim / n
        return None

    def save(self, it: int):
        save_train_state(self.save_dir / "ckpts", self.state, step=it)
        print(f"[ckpt] saved step {it}", flush=True)

    def resume(self, path: str):
        self.state = restore_train_state(path, self.state)
        self.start_iter = int(self.state.step)
        print(f"[resume] from {path} at step {self.start_iter}", flush=True)
