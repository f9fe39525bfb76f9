"""Compiler-verified communication census for every parallel mode.

Compiles each mode of the parallelism matrix on an 8-device virtual CPU
mesh, parses the optimized HLO (resshift_tpu/parallel/census.py), and
prints per-mode collective counts + bytes — converting SCALING.md's
communication claims ("1 ppermute per PP tick", "FSDP = all-gather at
use / reduce-scatter on grads", "SP = conv-border halo exchanges",
"batch/tile DP = zero collectives in the sampler") from prose into
compiler-checked facts.  The reference has no analog: DDP's NCCL
all-reduce is implicit in torch's C++ reducer (trainer.py:221) and
unauditable from Python.

Usage:  python tools/comm_census.py [--json /tmp/comm_census.json]
Tested: tests/test_comm_census.py pins the invariants per mode.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DEV = 8


def _force_cpu(n: int = N_DEV) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    assert len(jax.devices()) >= n, jax.devices()


class _CaptureCache(dict):
    """Drop-in for ResShiftPipeline._jit_cache that lowers+compiles each
    cached jit at its first call (inside the caller's mesh context) and
    keeps the optimized HLO text."""

    def __init__(self):
        super().__init__()
        self.hlos: list[str] = []

    def __setitem__(self, sig, fn):
        hlos = self.hlos

        def wrapped(*a, **kw):
            hlos.append(fn.lower(*a, **kw).compile().as_text())
            return fn(*a, **kw)

        super().__setitem__(sig, wrapped)


def _tiny_cfg() -> dict:
    """The dryrun's tiny-but-real config (full architecture family)."""
    return dict(
        task="census", sf=4,
        model=dict(
            image_size=16, in_channels=3, model_channels=32, out_channels=3,
            attention_resolutions=[16, 8], dropout=0.0, channel_mult=[1, 2],
            num_res_blocks=[1, 1], conv_resample=True, num_head_channels=16,
            use_scale_shift_norm=True, resblock_updown=False, swin_depth=2,
            swin_embed_dim=32, window_size=4, mlp_ratio=2, cond_lq=True,
            cond_mask=False, lq_size=16,
        ),
        diffusion=dict(schedule_name="exponential", steps=4,
                       min_noise_level=0.2, etas_end=0.99, kappa=2.0,
                       power=0.3, predict_type="xstart",
                       timestep_respacing=None, normalize_input=True,
                       latent_flag=True, scale_factor=1.0, sf=4),
        autoencoder=dict(embed_dim=3, n_embed=64, ddconfig=dict(
            double_z=False, z_channels=3, resolution=64, in_channels=3,
            out_ch=3, ch=32, ch_mult=[1, 2, 4], num_res_blocks=1,
            attn_resolutions=[], dropout=0.0)),
        inference=dict(chop_size=16, chop_stride=12, padding_offset=16),
    )


def compile_modes(n_devices: int = N_DEV) -> dict[str, str]:
    """{mode_name: optimized_hlo_text} for every parallel mode, compiled
    on an n-device virtual mesh with the tiny config."""
    _force_cpu(n_devices)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from resshift_tpu.parallel.mesh import (
        data_parallel_shardings, dp_sp_shardings, fsdp_shardings, make_mesh)
    from resshift_tpu.pipeline import ResShiftPipeline
    from resshift_tpu.trainer import TrainConfig, create_state, make_train_step

    pipe = ResShiftPipeline(_tiny_cfg(), dtype=jnp.float32)
    # per-TICK attribution needs the denoising scan to stay a while loop;
    # the production default (scan_unroll=5, tools/profile_unroll.py) fully
    # unrolls this 4-step census config and would fold the loop body into
    # the top-level computation
    pipe.scan_unroll = 1
    params = pipe.init_params(jax.random.PRNGKey(0))
    hlos: dict[str, str] = {}

    # ---------------- training modes: direct jit + .lower ----------------
    mesh = make_mesh(n_devices)
    b = 2 * n_devices
    batch = {"gt": jnp.zeros((b, 64, 64, 3), jnp.float32),
             "lq": jnp.zeros((b, 16, 16, 3), jnp.float32)}
    key = jax.random.PRNGKey(1)

    # DP with grad accumulation (2 microbatches)
    tcfg = TrainConfig(microbatch=n_devices, iterations=100,
                       warmup_iterations=2)
    state = create_state(params["unet"], tcfg)
    step = make_train_step(pipe, tcfg)
    st_sh, ba_sh = data_parallel_shardings(mesh, state, batch)
    vq_sh, _ = data_parallel_shardings(mesh, params["vqgan"], batch)
    key_sh, _ = data_parallel_shardings(mesh, key, batch)
    with mesh:
        hlos["dp_train"] = jax.jit(
            step, in_shardings=(st_sh, vq_sh, ba_sh, key_sh)
        ).lower(state, params["vqgan"], batch, key).compile().as_text()

    # FSDP (ZeRO-3-style), single-pass
    tcfg1 = TrainConfig(iterations=100, warmup_iterations=2)
    state1 = create_state(params["unet"], tcfg1)
    step1 = make_train_step(pipe, tcfg1)
    fs_sh, _ = fsdp_shardings(mesh, state1, batch, min_size=2 ** 12)
    with mesh:
        hlos["fsdp_train"] = jax.jit(
            step1, in_shardings=(fs_sh, vq_sh, ba_sh, key_sh),
            out_shardings=(fs_sh, None),
        ).lower(state1, params["vqgan"], batch, key).compile().as_text()

    # DP x SP (batch + image height sharded through fwd+bwd)
    sp_mesh = Mesh(np.array(jax.devices()[:n_devices]).reshape(
        n_devices // 2, 2), ("data", "space"))
    sps_sh, spb_sh = dp_sp_shardings(sp_mesh, state1, batch)
    spv_sh, _ = data_parallel_shardings(sp_mesh, params["vqgan"], batch)
    spk_sh, _ = data_parallel_shardings(sp_mesh, key, batch)
    with sp_mesh:
        hlos["dp_sp_train"] = jax.jit(
            step1, in_shardings=(sps_sh, spv_sh, spb_sh, spk_sh)
        ).lower(state1, params["vqgan"], batch, key).compile().as_text()

    # ------------- inference modes: capture the internal jits -------------
    def run_captured(name, fn):
        cache = _CaptureCache()
        pipe._jit_cache = cache
        out = fn()
        jax.block_until_ready(out)
        assert cache.hlos, f"{name}: no jit captured"
        # a mode may compile several programs (e.g. PP stages ingest);
        # concatenate — the census is over the whole mode's execution
        hlos[name] = "\n".join(cache.hlos)
        pipe._jit_cache = {}

    lq = jax.random.uniform(jax.random.PRNGKey(2), (n_devices, 16, 16, 3),
                            jnp.float32, -1.0, 1.0)

    run_captured("batch_infer", lambda: pipe.sample_batch_sharded(
        params, lq, key, mesh))
    lq_big = jax.random.uniform(jax.random.PRNGKey(3), (1, 40, 40, 3),
                                jnp.float32, -1.0, 1.0)
    run_captured("tile_infer", lambda: pipe.sample_tiles_sharded(
        params, lq_big, key, mesh))

    tp_mesh = Mesh(np.array(jax.devices()[:n_devices]).reshape(
        n_devices // 2, 2), ("data", "model"))
    run_captured("tp_infer", lambda: pipe.sample_tp(
        params, lq[:2], key, tp_mesh))

    pp_mesh = Mesh(np.array(jax.devices()[:n_devices]), ("stage",))
    run_captured("pp_infer", lambda: pipe.sample_pipelined(
        params, lq, key, pp_mesh, chunk_bs=1))

    sp1_mesh = Mesh(np.array(jax.devices()[:n_devices]), ("space",))
    run_captured("sp_infer", lambda: pipe.sample_spatial(
        params, lq[:1], key, sp1_mesh))

    return hlos


def main() -> None:
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="/tmp/comm_census.json")
    ap.add_argument("--n-devices", type=int, default=N_DEV)
    args = ap.parse_args()

    from resshift_tpu.parallel.census import census, format_table

    hlos = compile_modes(args.n_devices)
    per_mode = {m: census(h) for m, h in hlos.items()}
    print(format_table(per_mode))
    Path(args.json).write_text(json.dumps(per_mode, indent=2))
    print(f"-> {args.json}")


if __name__ == "__main__":
    main()
