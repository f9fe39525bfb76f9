"""Compiler-verified communication invariants for every parallel mode.

Compiles each mode of the parallelism matrix on the 8-device virtual mesh
(tools/comm_census.py) and asserts structural facts about the collectives
in the OPTIMIZED HLO — the strongest multi-chip communication evidence
obtainable without hardware, and a regression net against changes that
silently add collectives.  The reference's NCCL traffic (implicit in the
DDP C++ reducer, trainer.py:221) has no such audit surface.

Pins (SCALING.md "communication census" table):
  * batch/tile-sharded inference stays embarrassingly parallel,
  * DP grad sync rides the accumulation scan and moves ~param-volume,
  * FSDP gathers params at use and syncs grads,
  * PP ticks move exactly one chain handoff (2 tensor + 1 scalar permute),
  * SP per-tick permutes are halo-row-sized, never full activations.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from resshift_tpu.parallel.census import census, parse_collectives  # noqa: E402


@pytest.fixture(scope="module")
def hlos():
    from comm_census import compile_modes

    return compile_modes(8)


def _agg(hlos, mode):
    return census(hlos[mode])


def test_batch_and_tile_inference_embarrassingly_parallel(hlos):
    """Batch-DP inference: each device runs its images' full chain locally
    — ZERO collectives in the compiled program.  Tile sharding adds only
    the overlap-average output gather + tile routing, nothing per-step."""
    assert _agg(hlos, "batch_infer") == {}
    tile = _agg(hlos, "tile_infer")
    # no collective may run inside the denoising scan (per-tick cost 0)
    assert all(a["loop_count"] == 0 for a in tile.values()), tile
    # the output combine exists (overlap-average gather is replicated-out)
    assert tile, "tile mode lost its output combine — check gather path"


def test_dp_train_grad_sync_rides_the_scan(hlos):
    """DP training: gradient all-reduce happens inside the microbatch
    accumulation scan, once per tick, moving ~param volume; no other
    collective families appear."""
    import jax

    from comm_census import _tiny_cfg

    dp = _agg(hlos, "dp_train")
    assert set(dp) <= {"all-reduce", "all-gather"}, dp
    ar = dp["all-reduce"]
    assert ar["loop_count"] == ar["count"], "grad sync left the scan body"
    # volume: the tuple all-reduce carries every grad leaf (+ metrics);
    # compare against the actual param bytes of the census model
    import jax.numpy as jnp

    from resshift_tpu.pipeline import ResShiftPipeline

    pipe = ResShiftPipeline(_tiny_cfg(), dtype=jnp.float32)
    params = pipe.init_params(jax.random.PRNGKey(0))
    pbytes = sum(l.size * 4 for l in
                 jax.tree_util.tree_leaves(params["unet"]))
    assert pbytes <= ar["loop_bytes"] <= 1.15 * pbytes, (
        f"grad sync volume {ar['loop_bytes']} vs param bytes {pbytes}")


def test_fsdp_gathers_params_and_syncs_grads(hlos):
    """FSDP: params all-gathered at use (>= one gather per partitioned
    leaf), gradient sync present (reduce-scatter / all-to-all / all-reduce
    — GSPMD picks the lowering), zero collective-permute traffic."""
    fs = _agg(hlos, "fsdp_train")
    assert "collective-permute" not in fs, fs
    assert fs["all-gather"]["count"] >= 30  # >= n partitioned leaves
    grad_sync = sum(fs.get(op, {"bytes": 0})["bytes"] for op in
                    ("all-reduce", "reduce-scatter", "all-to-all"))
    assert grad_sync > 1 << 20, f"no gradient sync found: {fs}"


def test_pp_one_handoff_per_tick(hlos):
    """PP: the steady-state tick moves exactly ONE chain handoff =
    2 tensor collective-permutes (latent chunk + conditioning chunk) and
    1 scalar permute (chunk counter); output routing stays outside the
    loop.  A third in-loop tensor permute would mean the engine started
    re-sending state it should keep resident."""
    recs = [r for r in parse_collectives(hlos["pp_infer"])
            if r["in_loop"] and r["op"] == "collective-permute"]
    tensor = [r for r in recs if r["bytes"] > 64]
    scalar = [r for r in recs if r["bytes"] <= 64]
    assert len(tensor) == 2, recs
    assert len(scalar) <= 1, recs
    # the handoff is chunk-sized: chunk_bs=1 latent (1,16,16,3) f32
    assert all(r["bytes"] == 1 * 16 * 16 * 3 * 4 for r in tensor), recs
    # no all-gather inside the tick; the tick's only other collective is
    # (at most) small reduction bookkeeping
    others = [r for r in parse_collectives(hlos["pp_infer"])
              if r["in_loop"] and r["op"] != "collective-permute"]
    assert not others, others


def test_sp_halos_are_edge_rows_not_activations(hlos):
    """SP (height-sharded seam-exact sampler): every per-tick
    collective-permute is halo-sized — bounded by TWO border rows of the
    widest sharded activation — never a full-activation reshard.  The
    per-tick all-reduces are GroupNorm cross-shard statistics (small)."""
    recs = [r for r in parse_collectives(hlos["sp_infer"]) if r["in_loop"]]
    permutes = [r for r in recs if r["op"] == "collective-permute"]
    assert permutes, "SP lost its halo exchanges"
    # widest latent-space activation row in the census UNet: W=16, C=64,
    # f32 -> one row = 4096 B; halo <= 2 rows
    max_halo = 2 * 16 * 64 * 4
    assert all(r["bytes"] <= max_halo for r in permutes), permutes
    # full sharded activation (16x16x32 f32 / 8 devices * 8 = 32 KiB+)
    # never moves per tick
    total_per_tick = sum(r["bytes"] for r in permutes)
    assert total_per_tick < 16 * 16 * 32 * 4, total_per_tick


def test_tp_no_per_tick_surprises(hlos):
    """TP inference: Megatron-style pair sums (per-tick all-reduce) are
    the load-bearing collective; GSPMD additionally reshards activations
    between row- and column-sharded layouts (all-gather / all-to-all —
    measured, recorded in SCALING.md).  reduce-scatter would indicate the
    output specs regressed to scattered layouts."""
    tp = _agg(hlos, "tp_infer")
    assert "reduce-scatter" not in tp, tp
    assert tp.get("all-reduce", {"loop_count": 0})["loop_count"] > 0, tp
    # per-tick permutes stay tiny (layout bookkeeping, not activations)
    if "collective-permute" in tp:
        recs = [r for r in parse_collectives(hlos["tp_infer"])
                if r["in_loop"] and r["op"] == "collective-permute"]
        assert all(r["bytes"] <= 1024 for r in recs), recs


def test_census_parser_on_synthetic_hlo():
    """Parser unit check: shapes, tuples, while bodies, -done halves."""
    hlo = """\
HloModule jit_f, entry_computation_layout={()->f32[4]{0}}

%body.1 (p: (s32[], f32[4])) -> (s32[], f32[4]) {
  %cp = f32[4]{0} collective-permute(%x), source_target_pairs={{0,1}}
  %ar = (f32[4]{0}, f32[]) all-reduce(%a, %b), replica_groups={}
  ROOT %t = (s32[], f32[4]) tuple(%i, %cp)
}

ENTRY %main.2 () -> f32[4] {
  %w = (s32[], f32[4]) while(%init), condition=%cond.1, body=%body.1
  %ag = bf16[2,8]{1,0} all-gather-start(%y), dimensions={0}
  %agd = bf16[2,8]{1,0} all-gather-done(%ag)
  ROOT %r = f32[4]{0} get-tuple-element(%w), index=1
}
"""
    recs = parse_collectives(hlo)
    ops = {(r["op"], r["in_loop"], r["bytes"]) for r in recs}
    assert ("collective-permute", True, 16) in ops
    assert ("all-reduce", True, 20) in ops
    assert ("all-gather", False, 32) in ops
    assert len(recs) == 3  # -done not double-counted
