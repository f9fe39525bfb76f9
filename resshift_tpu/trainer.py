"""Training: optimizer, LR schedule, EMA, DP train step, checkpointing.

Reference semantics (zsyOAOA/ResShift trainer.py):
  * AdamW, lr 5e-5, weight_decay 0 (:194-200);
  * linear warmup over `warmup_iterations` then cosine to lr_min when
    `lr_schedule == 'cosin'`, else constant (:780-789);
  * gradient accumulation over microbatches with sync only at the end
    (:719-775) — here a `lax.scan` over microbatches inside one jit, so
    the all-reduce naturally happens once per step;
  * EMA rate 0.999 as a plain param average (:366-377);
  * frozen VQGAN (+ optional frozen LPIPS) — latents are computed inside
    the jitted step under `stop_gradient` (:444-485, gaussian_diffusion
    training_losses :531-596);
  * per-timestep loss bucketing for logging (:791-828).

TPU-first: the whole step (encode -> q_sample -> UNet fwd/bwd -> optimizer
-> EMA) is ONE jitted SPMD program over the mesh; bf16 compute with fp32
params needs no GradScaler (bf16 keeps fp32 range — SURVEY §2.7).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from .diffusion import resshift as rs
from .pipeline import ResShiftPipeline


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 5e-5
    lr_min: float = 2e-5
    lr_schedule: str | None = "cosin"
    warmup_iterations: int = 5000
    iterations: int = 300000
    weight_decay: float = 0.0
    ema_rate: float = 0.999
    microbatch: int | None = None  # per-device microbatch; None = no accumulation
    weighted_mse: bool = False
    loss_coef: tuple[float, float] = (1.0, 1.0)  # (mse, lpips)
    # Rematerialization (jax.checkpoint) on the denoiser apply: trades
    # recompute FLOPs for activation HBM, buying per-chip batch/resolution
    # headroom the reference gets from torch's checkpointing utilities.
    #   None    — store all activations (fastest, most memory);
    #   "dots"  — save matmul/conv outputs, recompute elementwise chains
    #             (jax.checkpoint_policies.checkpoint_dots) — the usual
    #             sweet spot: the f32 GN/SiLU chains dominate live memory;
    #   "full"  — save nothing, recompute the whole forward in the bwd.
    remat: str | None = None
    # FSDP (ZeRO-3-style) state sharding: params/EMA/optimizer moments
    # sharded over the mesh's data axis instead of replicated
    # (parallel/mesh.py:fsdp_shardings).  Same math as DP — XLA all-gathers
    # params at use and reduce-scatters gradients — but per-chip state
    # memory drops ~n_devices×, buying model-size headroom the 119M
    # flagship doesn't need but larger variants do.  train.fsdp: true.
    fsdp: bool = False


def lr_schedule_fn(cfg: TrainConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Warmup then cosine (trainer.py:780-789) as an optax-compatible fn."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum(1.0, (step + 1) / max(cfg.warmup_iterations, 1))
        if cfg.lr_schedule == "cosin":
            prog = jnp.clip(step / max(cfg.iterations, 1), 0.0, 1.0)
            base = cfg.lr_min + 0.5 * (cfg.lr - cfg.lr_min) * (1 + jnp.cos(math.pi * prog))
        else:
            base = jnp.asarray(cfg.lr)
        return base * warm

    return fn


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    # schedule-driven AdamW; the step count lives in opt_state, so resuming
    # from a checkpoint replays the LR exactly (trainer.py:165-167 semantics)
    return optax.adamw(lr_schedule_fn(cfg), b1=0.9, b2=0.999,
                       weight_decay=cfg.weight_decay)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class State:
    params: Any          # trainable UNet params
    opt_state: Any
    ema_params: Any
    step: jnp.ndarray    # scalar int32


def create_state(unet_params: Any, cfg: TrainConfig) -> State:
    tx = make_optimizer(cfg)
    return State(
        params=unet_params,
        opt_state=tx.init(unet_params),
        ema_params=jax.tree_util.tree_map(jnp.copy, unet_params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    pipe: ResShiftPipeline,
    cfg: TrainConfig,
    *,
    lpips_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
):
    """Build the jitted DP train step.

    batch = {'gt': (B,H,W,3), 'lq': (B,h,w,3) [, 'mask': (B,h,w,1)]} in [-1,1].
    Returns (state, metrics) -> metrics has loss + per-timestep-bucket means
    (t in {0, T/2, T-1}, mirroring trainer.py:791-828 logging buckets).
    """
    tx = make_optimizer(cfg)
    sched = pipe.sched
    lr_fn = lr_schedule_fn(cfg)
    # Train-path denoiser with the Swin Pallas kernels pinned OFF: under AD
    # the kernels' custom VJPs recompute the XLA composition anyway, so the
    # Pallas forward is pure extra work (measured +3% step time).  Pinning
    # via the module field (instead of a trace-scoped global) makes the
    # choice part of this closure — it cannot leak into, or be clobbered
    # by, inference traces of `pipe.unet` (whose own field stays `None` =
    # auto).  Same param tree, so state/checkpoints are unaffected.
    train_unet = pipe.unet.clone(use_pallas=False)

    # active dropout needs an rng stream + deterministic=False on the
    # train-path apply (reference ResBlock dropout, unet.py:110-206;
    # all shipped configs use dropout 0, where this stays a no-op)
    use_dropout = float(getattr(pipe.unet, "dropout", 0.0)) > 0.0

    def _apply(unet_params, x, t_orig, kd, kw):
        extra = ({"deterministic": False, "rngs": {"dropout": kd}}
                 if use_dropout else {})
        return train_unet.apply({"params": unet_params}, x, t_orig,
                                **extra, **kw)

    if cfg.remat:
        policies = {
            "dots": jax.checkpoint_policies.checkpoint_dots,
            "full": jax.checkpoint_policies.nothing_saveable,
        }
        if cfg.remat not in policies:
            raise ValueError(f"remat must be one of {sorted(policies)} or "
                             f"null, got {cfg.remat!r}")
        _apply = jax.checkpoint(_apply, policy=policies[cfg.remat])

    def loss_fn(unet_params, vq_params, batch, key):
        kt, kn, kd = jax.random.split(key, 3)
        gt, lq = batch["gt"], batch["lq"]
        b = gt.shape[0]
        # frozen first stage (trainer.py:455-469): no grads into the VQGAN
        z_y = jax.lax.stop_gradient(pipe._encode(vq_params, lq, up_sample=True))
        z0 = jax.lax.stop_gradient(pipe._encode(vq_params, gt, up_sample=False))
        t = jax.random.randint(kt, (b,), 0, sched.num_timesteps)
        noise = jax.random.normal(kn, z0.shape, dtype=jnp.float32)

        model_kwargs = {}
        if pipe.cond_lq:
            model_kwargs["lq"] = lq
        if pipe.cond_mask and "mask" in batch:
            model_kwargs["mask"] = batch["mask"]

        def model_fn(x, t_orig, **kw):
            return _apply(unet_params, x, t_orig, kd, kw)

        mse, z_t, pred_z0 = rs.training_losses(
            sched, model_fn, z0, z_y, t, noise,
            model_kwargs=model_kwargs, weighted_mse=cfg.weighted_mse,
        )
        loss = jnp.mean(mse) * cfg.loss_coef[0]
        metrics = {"mse": jnp.mean(mse)}
        if lpips_fn is not None:
            # TrainerDifIRLPIPS (trainer.py:952-988): decode pred z0, LPIPS vs gt
            x0_pred = pipe._decode(vq_params, pred_z0)
            lp = jnp.mean(lpips_fn(jnp.clip(x0_pred, -1, 1), gt))
            lp = jnp.nan_to_num(lp)  # NaN guard (trainer.py:970-979)
            loss = loss + cfg.loss_coef[1] * lp
            metrics["lpips"] = lp
        # per-timestep-bucket loss means for logging (trainer.py:791-828)
        for name, tt in (("loss_t0", 0), ("loss_tmid", sched.num_timesteps // 2),
                         ("loss_tlast", sched.num_timesteps - 1)):
            sel = (t == tt).astype(jnp.float32)
            metrics[name] = jnp.sum(mse * sel) / jnp.maximum(jnp.sum(sel), 1.0)
        metrics["loss"] = loss
        return loss, metrics

    def train_step(state: State, vq_params, batch, key):
        # the denoiser runs the XLA path (use_pallas=False pinned above);
        # the VQGAN's forward-only kernels (flash attn, VQ search) stay fused
        if cfg.microbatch:
            # grad accumulation: scan over microbatches (trainer.py:719-775)
            b = jax.tree_util.tree_leaves(batch)[0].shape[0]
            n_micro = max(1, b // cfg.microbatch)

            def micro(carry, inputs):
                grads_acc, metrics_acc = carry
                mb, k = inputs
                (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, vq_params, mb, k
                )
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                metrics_acc = jax.tree_util.tree_map(jnp.add, metrics_acc, metrics)
                return (grads_acc, metrics_acc), ()

            mbatch = jax.tree_util.tree_map(
                lambda x: x.reshape((n_micro, cfg.microbatch) + x.shape[1:]), batch
            )
            keys = jax.random.split(key, n_micro)
            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            zero_m = {k: jnp.zeros(()) for k in
                      ("mse", "loss", "loss_t0", "loss_tmid", "loss_tlast")}
            if lpips_fn is not None:
                zero_m["lpips"] = jnp.zeros(())
            (grads, metrics), _ = jax.lax.scan(micro, (zero_g, zero_m), (mbatch, keys))
            grads = jax.tree_util.tree_map(lambda g: g / n_micro, grads)
            metrics = jax.tree_util.tree_map(lambda m: m / n_micro, metrics)
        else:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, vq_params, batch, key
            )

        lr = lr_fn(state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        r = cfg.ema_rate
        ema = jax.tree_util.tree_map(
            lambda e, p: e * r + p.astype(e.dtype) * (1 - r), state.ema_params, params
        )
        metrics["lr"] = lr
        metrics["grad_norm"] = optax.global_norm(grads)
        return State(params, opt_state, ema, state.step + 1), metrics

    return train_step
