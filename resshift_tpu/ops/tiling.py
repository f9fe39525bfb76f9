"""Static tiled ("chopped") inference engine.

The reference scales to arbitrary image sizes by running the full sampler on
overlapping patches and averaging overlaps by pixel count
(`utils/util_image.py:889-979` ImageSpliterTh, driven by `sampler.py:186-208`).
That implementation is a host loop with dynamic shapes.

TPU-first redesign: the tile grid is *static* (computed on host from the
padded image shape), so
  * tile extraction is a stack of static slices — one XLA program, no
    host round-trips;
  * all tiles form one big batch axis that can be processed at once,
    micro-batched, or sharded across a device mesh (the reference's
    "sequence parallelism" analog, SURVEY §5.7);
  * the overlap-average divisor is a compile-time constant.
Start positions replicate `extract_starts` (util_image.py:921-930) exactly:
stride-spaced starts with the overhanging ones clamped to `length - tile`,
de-duplicated preserving order.
"""

from __future__ import annotations

import dataclasses
import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["TileGrid", "extract_starts"]


def extract_starts(length: int, tile: int, stride: int) -> list[int]:
    """Reference-exact start positions (util_image.py:921-930)."""
    if length <= tile:
        return [0]
    starts = list(range(0, length, stride))
    starts = [min(s, length - tile) for s in starts]
    # de-dup, preserve first-occurrence order
    seen: set[int] = set()
    out = []
    for s in starts:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Static overlapping tile grid over an (H, W) image, with `sf`-scaled
    output accumulation."""

    height: int
    width: int
    tile: int
    stride: int
    sf: int = 1

    def __post_init__(self):
        assert self.stride <= self.tile

    @functools.cached_property
    def starts(self) -> list[tuple[int, int]]:
        hs = extract_starts(self.height, self.tile, self.stride)
        ws = extract_starts(self.width, self.tile, self.stride)
        return [(i, j) for i in hs for j in ws]

    @property
    def num_tiles(self) -> int:
        return len(self.starts)

    @property
    def tile_hw(self) -> tuple[int, int]:
        t = min(self.tile, self.height), min(self.tile, self.width)
        return t

    @functools.cached_property
    def _count(self) -> np.ndarray:
        """(H*sf, W*sf, 1) overlap counts — a compile-time constant."""
        th, tw = self.tile_hw
        cnt = np.zeros((self.height * self.sf, self.width * self.sf, 1), np.float32)
        for (i, j) in self.starts:
            cnt[i * self.sf:(i + th) * self.sf, j * self.sf:(j + tw) * self.sf] += 1.0
        assert (cnt > 0).all()
        return cnt

    def split(self, im: jnp.ndarray) -> jnp.ndarray:
        """(B, H, W, C) -> (T*B, th, tw, C); tile-major like the reference
        (tiles of the whole batch are stacked per start position)."""
        b = im.shape[0]
        th, tw = self.tile_hw
        tiles = [im[:, i:i + th, j:j + tw, :] for (i, j) in self.starts]
        return jnp.concatenate(tiles, axis=0)

    def gather(self, tiles: jnp.ndarray, batch: int, channels: int | None = None) -> jnp.ndarray:
        """(T*B, th*sf, tw*sf, C) -> (B, H*sf, W*sf, C) overlap-averaged.

        The accumulation runs on a (B, H, W*C) canvas: merging W and C
        keeps each tile's contribution one contiguous static 2-D slice
        with a wide minor dim.  On the (B, H, W, 3) form, XLA's layout
        assignment put the 3-channel dim in the 128-lane position for
        large single-chunk grids (3 → 128 = 42× padding: the pad+add
        lowering of the scatter chain materialized an 8 GB temp for a
        2048² canvas and OOMed HBM — round-5 serving finding).
        """
        th, tw = self.tile_hw
        sf = self.sf
        c = channels or tiles.shape[-1]
        hh, ww = self.height * sf, self.width * sf
        out = jnp.zeros((batch, hh, ww * c), tiles.dtype)
        tiles = tiles.reshape(self.num_tiles * batch, th * sf, tw * sf * c)
        for n, (i, j) in enumerate(self.starts):
            out = out.at[:, i * sf:(i + th) * sf,
                         j * sf * c:(j + tw) * sf * c].add(
                tiles[n * batch:(n + 1) * batch]
            )
        out = out.reshape(batch, hh, ww, c)
        return out / jnp.asarray(self._count, dtype=tiles.dtype)
