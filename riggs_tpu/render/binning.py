"""Tile binning: assign depth-sorted Gaussians to screen tiles.

TPU-native replacement for the CUDA rasterizer's duplicate+radix-sort binning
(reference behavior at /root/reference/gaussian_renderer/__init__.py:133 call
site): instead of expanding (gaussian, tile) pairs and sorting 64-bit keys, we
  1. argsort all Gaussians by view depth once (global order; within any tile
     the restriction of the global order equals the CUDA per-tile order),
  2. compute the (tiles, N) bbox-overlap mask in depth order, and
  3. compact each tile's first MAX_PER_TILE hits with a cumsum+scatter
     (vmapped nonzero), yielding a dense (tiles, MAX) index table.

Everything is static-shape; overflow beyond MAX_PER_TILE is counted and
reported (transmittance saturation makes real truncation rare at sane MAX).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.render.project import Projected

TILE = 32  # 32x32 pixels = 1024 lanes per tile, a good VPU shape


class TileBins(NamedTuple):
    idx: jax.Array  # (T, MAX) gaussian indices into the unsorted arrays (may be None on the fast path)
    valid: jax.Array  # (T, MAX) slot validity
    count: jax.Array  # (T,) true hit count per tile (pre-truncation)
    tiles_x: int
    tiles_y: int
    overflow: jax.Array = None  # () extra diagnostic (e.g. truncated bbox cells)
    order: jax.Array = None  # (N,) depth permutation (fast path)
    didx: jax.Array = None  # (T, MAX) positions into depth order (fast path)

    def gather(self, packed: jax.Array) -> jax.Array:
        """Per-tile rows of ``packed`` (N, D) -> (T, MAX, D). On the fast path
        this pre-sorts by depth once (N rows) and gathers positions, saving a
        640k-element index translation per call."""
        if self.didx is not None:
            return packed[self.order][self.didx]
        return packed[self.idx]


def num_tiles(width: int, height: int, tile: int = TILE) -> tuple[int, int]:
    return -(-width // tile), -(-height // tile)


def bin_gaussians(
    proj: Projected,
    width: int,
    height: int,
    max_per_tile: int = 1024,
    tile: int = TILE,
) -> TileBins:
    tx_n, ty_n = num_tiles(width, height, tile)
    T = tx_n * ty_n

    order = jnp.argsort(jnp.where(proj.mask, proj.depth, jnp.inf))
    mean2d = proj.mean2d[order]
    radius = proj.radius[order]
    mask = proj.mask[order]

    # tile-range rectangle per gaussian (CUDA getRect semantics)
    lo = jnp.floor((mean2d - radius[:, None]) / tile).astype(jnp.int32)
    hi = jnp.floor((mean2d + radius[:, None]) / tile).astype(jnp.int32)
    lo = jnp.clip(lo, 0, jnp.array([tx_n - 1, ty_n - 1]))
    hi = jnp.clip(hi, 0, jnp.array([tx_n - 1, ty_n - 1]))

    tids = jnp.arange(T, dtype=jnp.int32)
    txs = (tids % tx_n)[:, None]  # (T, 1)
    tys = (tids // tx_n)[:, None]

    hit = (
        mask[None, :]
        & (txs >= lo[None, :, 0])
        & (txs <= hi[None, :, 0])
        & (tys >= lo[None, :, 1])
        & (tys <= hi[None, :, 1])
    )  # (T, N) in depth order

    count = jnp.sum(hit, axis=1).astype(jnp.int32)

    def compact(row):
        (pos,) = jnp.nonzero(row, size=max_per_tile, fill_value=-1)
        return pos

    slots = jax.vmap(compact)(hit)  # (T, MAX) positions into depth order, -1 pad
    valid = slots >= 0
    idx = jnp.where(valid, order[jnp.clip(slots, 0)], 0)
    return TileBins(
        idx=idx, valid=valid, count=count, tiles_x=tx_n, tiles_y=ty_n,
        overflow=jnp.zeros((), jnp.int32),
    )


def bin_gaussians_sorted(
    proj: Projected,
    width: int,
    height: int,
    max_per_tile: int = 1024,
    tile: int = TILE,
    max_tiles_per_gaussian: int = 16,
) -> TileBins:
    """Fast binning via one global (tile, depth) key sort — the XLA analog of
    the CUDA rasterizer's duplicate+radix-sort, replacing the dense (T, N)
    per-tile compaction (572 ms -> ~ms at N=100k).

    Each Gaussian emits up to ``max_tiles_per_gaussian`` (tile_id, depth_rank)
    keys covering its bbox rectangle (larger rectangles are truncated and
    counted in ``count`` overflow); one ascending sort groups keys by tile in
    depth order; per-tile windows are located with searchsorted.
    """
    tx_n, ty_n = num_tiles(width, height, tile)
    T = tx_n * ty_n
    N = proj.mean2d.shape[0]

    order = jnp.argsort(jnp.where(proj.mask, proj.depth, jnp.inf))
    # one fused gather of the reorder inputs (3 separate (N,) gathers cost
    # ~3x more on TPU than one (N, 4) row gather)
    pre = jnp.concatenate(
        [proj.mean2d, proj.radius[:, None], proj.mask[:, None].astype(jnp.float32)], axis=-1
    )[order]
    mx, my = pre[:, 0], pre[:, 1]
    radius = pre[:, 2]
    mask = pre[:, 3] > 0.5

    # scalar rect math — (N,) vectors, no (N, 2) lane-padded intermediates
    lox = jnp.clip(jnp.floor((mx - radius) / tile).astype(jnp.int32), 0, tx_n - 1)
    loy = jnp.clip(jnp.floor((my - radius) / tile).astype(jnp.int32), 0, ty_n - 1)
    hix = jnp.clip(jnp.floor((mx + radius) / tile).astype(jnp.int32), 0, tx_n - 1)
    hiy = jnp.clip(jnp.floor((my + radius) / tile).astype(jnp.int32), 0, ty_n - 1)
    w_rect = hix - lox + 1  # (N,)
    h_rect = hiy - loy + 1

    # enumerate rectangle cells in a fixed raster order (k -> (dx, dy))
    side = max(int(np.ceil(np.sqrt(max_tiles_per_gaussian))), 1)
    K = side * side
    ks = jnp.arange(K, dtype=jnp.int32)
    dx = (ks % side)[None, :]
    dy = (ks // side)[None, :]
    tx = lox[:, None] + dx  # (N, K)
    ty = loy[:, None] + dy
    cell_ok = mask[:, None] & (dx < w_rect[:, None]) & (dy < h_rect[:, None])
    tile_id = ty * tx_n + tx

    d_rank = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[:, None], (N, K))
    key = jnp.where(cell_ok, tile_id * N + d_rank, jnp.iinfo(jnp.int32).max)
    key_sorted = jnp.sort(key.reshape(-1))  # ascending: grouped by tile, depth order

    starts = jnp.searchsorted(key_sorted, jnp.arange(T, dtype=jnp.int32) * N)
    ends = jnp.searchsorted(key_sorted, (jnp.arange(T, dtype=jnp.int32) + 1) * N)
    count = (ends - starts).astype(jnp.int32)

    s = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    gather_pos = jnp.minimum(starts[:, None] + s, key_sorted.shape[0] - 1)
    picked = key_sorted[gather_pos]  # (T, MAX)
    valid = s < jnp.minimum(count, max_per_tile)[:, None]
    d = jnp.where(valid, picked % N, 0)

    # truncated-bbox cells are a separate overflow diagnostic (count stays the
    # true per-tile hit count, which also drives kernel chunk predication)
    rect_overflow = jnp.sum(jnp.where(mask, jnp.maximum(w_rect * h_rect - K, 0), 0))
    return TileBins(
        idx=None, valid=valid, count=count, tiles_x=tx_n, tiles_y=ty_n,
        overflow=rect_overflow.astype(jnp.int32), order=order, didx=d,
    )
