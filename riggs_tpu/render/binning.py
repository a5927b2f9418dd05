"""Tile binning: assign depth-sorted Gaussians to screen tiles.

TPU-native replacement for the CUDA rasterizer's duplicate+radix-sort binning
(reference behavior at /root/reference/gaussian_renderer/__init__.py:133 call
site). Two strategies:

  * ``bin_gaussians_sorted`` (fast path): each Gaussian emits up to
    ``max_tiles_per_gaussian`` (tile_id, depth, gid) instances covering its
    bbox rectangle; one multi-operand ``lax.sort`` with (tile_id, depth) as
    the key groups instances by tile in front-to-back order — the XLA analog
    of the CUDA 64-bit-key radix sort, with no tile_id*N product that could
    overflow int32 at large N (advisor round-1 finding). Per-tile windows are
    located with searchsorted and compacted to a dense (T, MAX) index table.
  * ``bin_gaussians`` (dense reference): exact (T, N) bbox-mask compaction,
    O(T*N) memory — the oracle-parity reference for tests.

Everything is static-shape. Truncation is *counted*, never silent:
``count`` carries the true per-tile hit count (beyond-MAX hits are dropped by
the blend but reported via the rasterizer's ``overflow``), and ``overflow``
here counts bbox cells dropped because a Gaussian covered more than
``max_tiles_per_gaussian`` tiles. Callers escalate (bigger MAX / K) when
nonzero — see render/tiles.py:rasterize_tiled(auto_escalate).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.render.project import Projected

TILE = 32  # 32x32 pixels = 1024 lanes per tile, a good VPU shape


def _extract_windows(src: jax.Array, starts: jax.Array, max_per_tile: int) -> jax.Array:
    """(T, MAX) windows ``src[starts[t] : starts[t]+MAX]`` of a 1-D int32 array.

    The windows are contiguous spans of the sorted instance array; the XLA
    gather of ``starts[:, None] + arange(MAX)`` runs at full HBM bandwidth on
    TPU (~0.03 ms at 625x1024 from a 1.6M source — measured; a hand-rolled
    Pallas DMA version was no faster and failed Mosaic lowering for 1-D
    refs). ``src`` must be padded by the caller so starts[t]+MAX never reads
    past the end.
    """
    s = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    return src[starts[:, None] + s]


class TileBins(NamedTuple):
    idx: jax.Array  # (T, MAX) gaussian indices into the (unsorted) input arrays
    valid: jax.Array  # (T, MAX) slot validity
    count: jax.Array  # (T,) true hit count per tile (pre-truncation)
    tiles_x: int
    tiles_y: int
    overflow: jax.Array = None  # () truncated bbox cells diagnostic

    def gather(self, packed: jax.Array) -> jax.Array:
        """Per-tile rows of ``packed`` (N, D) -> (T, MAX, D)."""
        return packed[self.idx]


def num_tiles(width: int, height: int, tile: int = TILE) -> tuple[int, int]:
    return -(-width // tile), -(-height // tile)


def _rects(proj: Projected, tx_n: int, ty_n: int, tile: int):
    """Clamped tile-rectangle bounds per gaussian (CUDA getRect semantics)."""
    mx, my = proj.mean2d[:, 0], proj.mean2d[:, 1]
    radius = proj.radius
    lox = jnp.clip(jnp.floor((mx - radius) / tile).astype(jnp.int32), 0, tx_n - 1)
    loy = jnp.clip(jnp.floor((my - radius) / tile).astype(jnp.int32), 0, ty_n - 1)
    hix = jnp.clip(jnp.floor((mx + radius) / tile).astype(jnp.int32), 0, tx_n - 1)
    hiy = jnp.clip(jnp.floor((my + radius) / tile).astype(jnp.int32), 0, ty_n - 1)
    return lox, loy, hix, hiy


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
    """Fast binning via one global (tile, depth) instance sort.

    Replaces the round-1 scheme (separate depth argsort + int32 key
    ``tile_id * N + d_rank`` sort): folding depth directly into a two-key
    ``lax.sort`` removes the (N,) argsort, the pre-gather of reorder inputs,
    and the ``tile_id * N`` product that silently overflowed int32 once
    T * N >= 2^31.
    """
    tx_n, ty_n = num_tiles(width, height, tile)
    T = tx_n * ty_n
    N = proj.mean2d.shape[0]

    lox, loy, hix, hiy = _rects(proj, tx_n, ty_n, tile)
    w_rect = hix - lox + 1  # (N,)
    h_rect = hiy - loy + 1

    # enumerate rectangle cells in a fixed raster order (k -> (dx, dy)).
    # (K, N) layout: K on sublanes, N on lanes — (N, K) would pad K=16 lanes
    # to the 128-lane register width (8x VPU waste).
    side = max(int(np.ceil(np.sqrt(max_tiles_per_gaussian))), 1)
    K = side * side
    ks = jnp.arange(K, dtype=jnp.int32)
    dx = (ks % side)[:, None]
    dy = (ks // side)[:, None]
    tx = lox[None, :] + dx  # (K, N)
    ty = loy[None, :] + dy
    cell_ok = proj.mask[None, :] & (dx < w_rect[None, :]) & (dy < h_rect[None, :])
    tile_id = jnp.where(cell_ok, ty * tx_n + tx, T).reshape(-1)  # invalid -> sentinel T
    depth = jnp.broadcast_to(proj.depth[None, :], (K, N)).reshape(-1)
    gid = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (K, N)).reshape(-1)

    tile_sorted, _, gid_sorted = jax.lax.sort(
        (tile_id, depth, gid), num_keys=2
    )  # grouped by tile, front-to-back within each tile

    tids = jnp.arange(T, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tids).astype(jnp.int32)
    ends = jnp.searchsorted(tile_sorted, tids + 1).astype(jnp.int32)
    count = (ends - starts).astype(jnp.int32)

    s = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    valid = s < jnp.minimum(count, max_per_tile)[:, None]
    win = _extract_windows(
        jnp.pad(gid_sorted, (0, max_per_tile)), starts, max_per_tile
    )
    idx = jnp.where(valid, win, 0)

    # truncated-bbox cells are a separate overflow diagnostic (count stays the
    # true per-tile hit count, which also drives kernel chunk predication)
    rect_overflow = jnp.sum(jnp.where(proj.mask, jnp.maximum(w_rect * h_rect - K, 0), 0))
    return TileBins(
        idx=idx, valid=valid, count=count, tiles_x=tx_n, tiles_y=ty_n,
        overflow=rect_overflow.astype(jnp.int32),
    )
