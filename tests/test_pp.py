"""Pipeline-parallel sampler tests (parallel/pp.py, pipeline.sample_pipelined).

The pipeline stages the reverse-diffusion chain over a `stage` mesh axis;
`ppermute` moves latents stage-to-stage.  Staging never changes the math —
the chain is the same sequence of steps executed by different devices — so
the main test is exactness against the single-device sampler on the
virtual CPU mesh (same chunk/key split => identical noise draws).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from resshift_tpu.parallel import pp
from resshift_tpu.pipeline import ResShiftPipeline

from test_pipeline import tiny_config


def _mesh(n, name="stage"):
    return Mesh(np.array(jax.devices()[:n]), (name,))


def test_stage_slices_cover_chain():
    for t_steps, s in [(15, 8), (4, 8), (15, 3), (4, 4), (1, 2), (7, 2)]:
        starts, counts = pp.stage_slices(t_steps, s)
        ran = []
        for st, cn in zip(starts, counts):
            ran.extend(range(st, st - cn, -1))
        assert ran == list(range(t_steps - 1, -1, -1)), (t_steps, s)


def test_pipeline_stream_engine_identity():
    """The generic engine routes every chunk through every stage exactly
    once, in order: with work = add(stage-indexed increment), the output
    counts each stage's visit."""
    mesh = _mesh(4)
    chunks = jnp.arange(6, dtype=jnp.float32).reshape(6, 1) * 10.0
    incr = jnp.asarray([1.0, 2.0, 4.0, 8.0])

    def ingest(ops, idx):
        return {"v": jax.lax.dynamic_index_in_dim(ops[0], idx, 0, False)}

    def work(ops, s, payload):
        return {"v": payload["v"] + incr[s]}

    def emit(ops, payload):
        return payload["v"]

    out = pp.pipeline_stream(mesh, "stage", (chunks,), n_chunks=6,
                             ingest=ingest, work=work, emit=emit)
    want = np.asarray(chunks) + incr.sum()
    np.testing.assert_allclose(np.asarray(out), want)


def test_sample_pipelined_exact_vs_single_device_pixel_space():
    # pixel-space diffusion (no VQ argmin): staged-vs-single diffs are pure
    # float reduction order, so the comparison can be tight.  Batch of 4
    # streamed as 4 chunks through an 8-stage pipeline (4-step chain ->
    # half the stages carry one step, half carry none).
    pipe = ResShiftPipeline(tiny_config(sf=1), dtype=jnp.float32,
                            use_autoencoder=False)
    params = pipe.init_params(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3),
                            jnp.float32, -1.0, 1.0)
    key = jax.random.PRNGKey(2)
    mesh = _mesh(8)
    got = np.asarray(pipe.sample_pipelined(params, lq, key, mesh,
                                           chunk_bs=1))
    # same chunk/key split sequentially: split(key, 4), one image per chunk
    ckeys = jax.random.split(key, 4)
    want = np.concatenate([
        np.asarray(pipe.sample(params, lq[i:i + 1], ckeys[i]))
        for i in range(4)], axis=0)
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-5)


def test_sample_pipelined_full_pipeline_single_chunk():
    # full VQGAN pipeline, batch fits one tile and one chunk -> the
    # pipelined sampler must match `sample` with the SAME undivided key
    pipe = ResShiftPipeline(tiny_config(), dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3),
                            jnp.float32, -1.0, 1.0)
    key = jax.random.PRNGKey(2)
    want = np.asarray(pipe.sample(params, lq, key))
    got = np.asarray(pipe.sample_pipelined(params, lq, key, _mesh(4),
                                           chunk_bs=2))
    assert got.shape == want.shape == (2, 64, 64, 3)
    mse = float(np.mean((got - want) ** 2))
    psnr = 10 * np.log10(4.0 / mse) if mse > 0 else np.inf
    assert psnr >= 35.0, f"PP-vs-single PSNR {psnr:.1f} dB"


def test_sample_pipelined_chopped_matches_sequential_tile_walk():
    # 40x40 > chop 16 -> 9-tile grid streamed in 2-tile chunks; the
    # sequential reference with tile_bs=2 uses the identical chunk/key
    # split, so outputs agree to float noise.
    pipe = ResShiftPipeline(tiny_config(), dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (1, 40, 40, 3),
                            jnp.float32, -1.0, 1.0)
    key = jax.random.PRNGKey(2)
    want = np.asarray(pipe.sample(params, lq, key, tile_bs=2))
    got = np.asarray(pipe.sample_pipelined(params, lq, key, _mesh(4),
                                           chunk_bs=2))
    assert got.shape == want.shape == (1, 160, 160, 3)
    assert np.isfinite(got).all()
    mse = float(np.mean((got - want) ** 2))
    psnr = 10 * np.log10(4.0 / mse) if mse > 0 else np.inf
    assert psnr >= 35.0, f"chopped PP vs single PSNR {psnr:.1f} dB"


def test_sample_pipelined_hybrid_pp_x_dp_mesh():
    """2-D (stage x data) mesh: chunks stream through 4 stages while each
    chunk's batch dim is sharded 2-way over `data` (GSPMD auto axes inside
    the manual-stage shard_map).  Must match the 1-D pipeline exactly."""
    pipe = ResShiftPipeline(tiny_config(), dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    lq = jax.random.uniform(jax.random.PRNGKey(1), (4, 16, 16, 3),
                            jnp.float32, -1.0, 1.0)
    key = jax.random.PRNGKey(2)
    want = np.asarray(pipe.sample_pipelined(params, lq, key, _mesh(4),
                                            chunk_bs=2))
    mesh2 = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                 ("stage", "data"))
    got = np.asarray(pipe.sample_pipelined(params, lq, key, mesh2,
                                           chunk_bs=2))
    assert got.shape == want.shape == (4, 64, 64, 3)
    mse = float(np.mean((got - want) ** 2))
    psnr = 10 * np.log10(4.0 / mse) if mse > 0 else np.inf
    assert psnr >= 45.0, f"hybrid-vs-1D PP PSNR {psnr:.1f} dB"


def test_pipeline_stream_single_stage_and_short_stream():
    """Degenerate edges: a 1-stage 'pipeline' (no ppermute partners) and a
    stream shorter than the stage count (drain-dominated) both route every
    chunk through every stage exactly once."""
    chunks = jnp.arange(3, dtype=jnp.float32).reshape(3, 1) + 1.0

    def ingest(ops, idx):
        return {"v": jax.lax.dynamic_index_in_dim(ops[0], idx, 0, False)}

    def emit(ops, payload):
        return payload["v"]

    # S=1: work multiplies by 3; out = 3 * chunks
    out1 = pp.pipeline_stream(
        _mesh(1), "stage", (chunks,), n_chunks=3, ingest=ingest,
        work=lambda ops, s, p: {"v": p["v"] * 3.0}, emit=emit)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(chunks) * 3.0)

    # S=8 > N=3: heavy drain; each stage adds 1 -> out = chunks + 8
    out2 = pp.pipeline_stream(
        _mesh(8), "stage", (chunks,), n_chunks=3, ingest=ingest,
        work=lambda ops, s, p: {"v": p["v"] + 1.0}, emit=emit)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(chunks) + 8.0)
