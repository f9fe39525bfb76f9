"""Compiler-verified communication census.

SCALING.md makes claims about what each parallel mode communicates
("FSDP all-gathers params at use / reduce-scatters grads", "PP moves one
ppermute per tick", "SP exchanges conv-border halos").  The reference
cannot audit its analogs — DDP's NCCL all-reduce is implicit in the C++
reducer (trainer.py:221) — but ours compile to HLO, so the claims are
checkable facts: this module parses the OPTIMIZED HLO of each mode's
compiled program and counts collective ops + bytes.  `tools/comm_census.py`
prints the table; `tests/test_comm_census.py` pins the invariants so a
regression that silently adds collectives fails CI.

HLO-text conventions handled:
  * collectives named `all-reduce[-start]`, `all-gather[-start]`,
    `reduce-scatter`, `collective-permute[-start]`, `all-to-all` (the
    `-done` halves of async pairs are not counted — one logical op each);
  * result bytes read from the op's result shape, `(tuple, shapes)`
    summed (an all-reduce over N params is one logical op moving the sum);
  * ops inside `while` bodies (lax.scan / lax.while_loop) are tallied
    separately — a body op executes once per loop TICK, so its static
    count is exactly the per-tick claim.
"""

from __future__ import annotations

import re
from typing import Any

__all__ = ["parse_collectives", "census", "format_table"]

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1, "u64": 8, "u32": 4, "u16": 2,
    "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

# one logical collective per start/sync pair; `-done` is bookkeeping
_COLL_RE = re.compile(
    r"\b(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(-start)?\(")
_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([0-9,]*)\]")


def _result_bytes(line: str) -> int:
    """Bytes of the op's RESULT shape(s): everything left of the `=`."""
    lhs = line.split(" = ", 1)
    shapes = lhs[1] if len(lhs) == 2 else line
    # the result type ends at the op name — cut at the collective keyword
    m = _COLL_RE.search(shapes)
    if m:
        shapes = shapes[: m.start()]
    total = 0
    for dt, dims in _SHAPE_RE.findall(shapes):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _computations(hlo: str) -> list[tuple[str, str]]:
    """Split HLO module text into [(computation_name, body_text)].

    Header lines look like `%name (args) -> type {` or `ENTRY %name (...) {`;
    args may contain nested parens (tuple types), so the name is taken from
    the first token rather than a full-header regex.  A list (not a dict)
    because concatenated modules (multi-program modes) can repeat names.
    """
    comps: list[tuple[str, str]] = []
    name, buf = None, []
    for line in hlo.splitlines():
        stripped = line.strip()
        if name is None:
            if stripped.endswith("{") and ("->" in stripped
                                           or stripped.startswith("ENTRY")):
                toks = stripped.split()
                tok = toks[1] if toks[0] == "ENTRY" else toks[0]
                name, buf = tok.lstrip("%").split("(")[0], []
        else:
            if stripped.startswith("}"):
                comps.append((name, "\n".join(buf)))
                name = None
            else:
                buf.append(line)
    return comps


def _while_bodies(hlo: str) -> set[str]:
    """Names of computations used as while-loop bodies (scan ticks)."""
    return set(re.findall(r"body=%?([\w.\-]+)", hlo))


def parse_collectives(hlo: str) -> list[dict[str, Any]]:
    """All collective ops in an optimized-HLO module text.

    Returns one record per logical collective:
      {op, bytes, in_loop, computation}
    where `in_loop` marks ops living in a while body (they run once per
    scan/while tick, so static count == per-tick count).
    """
    comps = _computations(hlo)
    bodies = _while_bodies(hlo)
    out = []
    for cname, body in comps:
        for line in body.splitlines():
            m = _COLL_RE.search(line)
            if not m or re.search(r"-done\(", line):
                continue
            out.append({
                "op": m.group(1),
                "bytes": _result_bytes(line),
                "in_loop": cname in bodies,
                "computation": cname,
            })
    return out


def census(hlo: str) -> dict[str, dict[str, int]]:
    """Aggregate: {op: {count, bytes, loop_count, loop_bytes}}."""
    agg: dict[str, dict[str, int]] = {}
    for rec in parse_collectives(hlo):
        a = agg.setdefault(rec["op"], dict(count=0, bytes=0,
                                           loop_count=0, loop_bytes=0))
        a["count"] += 1
        a["bytes"] += rec["bytes"]
        if rec["in_loop"]:
            a["loop_count"] += 1
            a["loop_bytes"] += rec["bytes"]
    return agg


def format_table(per_mode: dict[str, dict[str, dict[str, int]]]) -> str:
    """Markdown table: one row per (mode, op)."""
    lines = [
        "| mode | collective | count | bytes | of which per-tick (in loop) |",
        "|---|---|---|---|---|",
    ]
    for mode, agg in per_mode.items():
        if not agg:
            lines.append(f"| {mode} | — (none) | 0 | 0 | — |")
            continue
        for op in sorted(agg):
            a = agg[op]
            loop = (f"{a['loop_count']} × {_fmt_b(a['loop_bytes'] // max(a['loop_count'], 1))}"
                    if a["loop_count"] else "—")
            lines.append(
                f"| {mode} | {op} | {a['count']} | {_fmt_b(a['bytes'])} | {loop} |")
    return "\n".join(lines)


def _fmt_b(n: int) -> str:
    if n >= 1 << 20:
        return f"{n / (1 << 20):.1f} MiB"
    if n >= 1 << 10:
        return f"{n / (1 << 10):.1f} KiB"
    return f"{n} B"
