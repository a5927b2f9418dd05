"""Tile binning: assign depth-sorted Gaussians to screen tiles.

TPU-native replacement for the CUDA rasterizer's duplicate+radix-sort binning
(reference behavior at /root/reference/gaussian_renderer/__init__.py:133 call
site). Two strategies:

  * ``bin_gaussians_sorted`` (fast path): each Gaussian emits up to
    ``max_tiles_per_gaussian`` (tile_id, depth, gid) instances covering its
    bbox rectangle; one multi-operand ``lax.sort`` with (tile_id, depth,
    gid) as the key groups instances by tile in front-to-back order (gid
    breaks exact depth ties deterministically) — the XLA analog of the CUDA
    64-bit-key radix sort, with no tile_id*N product that could overflow
    int32 at large N (advisor round-1 finding). A single-int32-key packed
    variant (tile*N + depth-rank) was measured slower on-chip (25.4 vs 21.4
    ms at the 800p/100k bench, round 4) and deleted. Per-tile windows are
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


class CompactInfo(NamedTuple):
    """Structural by-product of ``bin_gaussians_compact`` that lets the
    instance-gather backward run as a gather + segment-sum instead of XLA's
    scatter-add (the round-1 profile's 11.6 ms bwd hotspot).

    "Slot" space: instances laid out contiguously per depth-ordered Gaussian
    (Gaussian g's instances occupy slots [offsets[g], offsets[g]+cnt[g])).
    """

    order: jax.Array  # (N,) gaussian ids in depth order
    invorder: jax.Array  # (N,) inverse permutation of order
    offsets: jax.Array  # (N,) slot-run start per depth-ordered gaussian
    cnt: jax.Array  # (N,) slot-run length per depth-ordered gaussian
    slot_tile: jax.Array  # (M,) tile id per slot (T sentinel when invalid)
    invperm: jax.Array  # (M,) sorted position of each slot
    starts: jax.Array  # (T,) start of each tile's window in the sorted array


class GridInfo(NamedTuple):
    """By-product of ``bin_gaussians_sorted2``: every instance is a cell of
    the padded (K, N) depth-ordered grid, so the instance-gather backward can
    scatter window gradients to their unique grid cells (a collision-free
    permutation scatter) and reduce over K — no scatter-add.
    """

    order: jax.Array  # (N,) gaussian ids in depth order
    invorder: jax.Array  # (N,) inverse of order
    drank_win: jax.Array  # (T, MAX) depth-rank per window slot
    grid_win: jax.Array  # (T, MAX) flat (k*N + drank) grid cell per slot
    # NOTE: the static K (padded cells per gaussian) is deliberately NOT a
    # field — a python-int leaf would be traced into an array when GridInfo
    # crosses the gather_grid custom_vjp boundary; callers pass K statically.


class RunsInfo(NamedTuple):
    """Aligned-runs instance layout (``bin_gaussians_runs``): each tile's
    depth-ordered instance run is padded to a multiple of the kernel chunk
    (128) inside ONE flat instance array, so the Pallas blend reads/writes
    (16, 128) blocks at scalar-prefetch-computed block offsets — no dense
    (T, MAX) window materialization on either side of the kernel."""

    gid: jax.Array  # (M2,) gaussian id per aligned slot; N sentinel when pad
    sblk: jax.Array  # (T,) first 128-block index of each tile's run


class TileBins(NamedTuple):
    idx: jax.Array  # (T, MAX) gaussian indices into the (unsorted) input arrays
    valid: jax.Array  # (T, MAX) slot validity
    count: jax.Array  # (T,) true hit count per tile (pre-truncation)
    tiles_x: int
    tiles_y: int
    overflow: jax.Array = None  # () truncated bbox cells diagnostic
    compact: CompactInfo = None  # set by bin_gaussians_compact
    grid: GridInfo = None  # set by bin_gaussians_sorted2
    runs: RunsInfo = None  # set by bin_gaussians_runs
    overflow_budget: jax.Array = None  # () instance-budget slots dropped
    starts: jax.Array = None  # (T,) window start per tile in gid_sorted (sort binner)
    gid_sorted: jax.Array = None  # (M,) tile-grouped depth-ordered gaussian ids

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


def _cell_cull(proj: Projected, opacity, tx, ty, tile: int):
    """Exact per-cell keep mask: can ANY pixel of tile (tx, ty) see alpha >=
    1/255 from this gaussian?  alpha = op * exp(power), power the (concave)
    EWA quadratic, so the cell is dead iff max(power over the tile's pixel
    rect) < log(1/(255*op)).  The max of a concave quadratic over a box is at
    the center if inside, else on an edge, where the 1-D maximizer has a
    closed form — evaluated for all 4 edges (exact, so culling never changes
    the rendered image; the CUDA rasterizer keeps every bbox cell and lets
    the blend's 1/255 threshold discard them per-pixel, paying list space +
    blend work for provably-dead cells).
    tx, ty: (K, N) tile coords; returns (K, N) keep mask."""
    mx, my = proj.mean2d[:, 0][None, :], proj.mean2d[:, 1][None, :]
    a = proj.conic[:, 0][None, :]
    b = proj.conic[:, 1][None, :]
    c = proj.conic[:, 2][None, :]
    lx = tx.astype(jnp.float32) * tile - mx  # pixel centers at integer coords
    ux = lx + (tile - 1)
    ly = ty.astype(jnp.float32) * tile - my
    uy = ly + (tile - 1)

    def pw(dx, dy):
        return -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy

    eps = 1e-12
    # four edges: clamp the 1-D unconstrained maximizer onto the edge
    dyx = jnp.clip(-b * lx / jnp.maximum(c, eps), ly, uy)
    dyu = jnp.clip(-b * ux / jnp.maximum(c, eps), ly, uy)
    dxl = jnp.clip(-b * ly / jnp.maximum(a, eps), lx, ux)
    dxu = jnp.clip(-b * uy / jnp.maximum(a, eps), lx, ux)
    pmax = jnp.maximum(
        jnp.maximum(pw(lx, dyx), pw(ux, dyu)),
        jnp.maximum(pw(dxl, ly), pw(dxu, uy)),
    )
    inside = (lx <= 0) & (ux >= 0) & (ly <= 0) & (uy >= 0)
    pmax = jnp.where(inside, 0.0, pmax)
    op = jnp.clip(opacity, 1.0 / 255.0 * 1e-3, 1.0)[None, :]
    thresh = jnp.log(1.0 / (255.0 * op))
    return pmax >= thresh


def bin_gaussians_sorted(
    proj: Projected,
    width: int,
    height: int,
    max_per_tile: int = 1024,
    tile: int = TILE,
    max_tiles_per_gaussian: int = 16,
    counts_via: str = "searchsorted",
    opacity: jax.Array | None = None,
    giant_cap: int = 256,
    giant_side: int = 12,
    mid_cap: int = 0,
    mid_side: int = 4,
) -> TileBins:
    """Fast binning via one global (tile, depth) instance sort.

    Replaces the round-1 scheme (separate depth argsort + int32 key
    ``tile_id * N + d_rank`` sort): folding depth directly into a two-key
    ``lax.sort`` removes the (N,) argsort, the pre-gather of reorder inputs,
    and the ``tile_id * N`` product that silently overflowed int32 once
    T * N >= 2^31. Per-tile counts/starts come from one MXU matmul of the
    per-axis interval indicators (``counts_via='histogram'``; the clipped
    rects make the histogram count exactly the *emitted* instances, matching
    the sort) instead of two searchsorted binary searches over the 1.6M-entry
    sorted array (``counts_via='searchsorted'``, kept for A/B).

    Tiered enumeration: most Gaussians cover 1–4 tiles, so padding every
    Gaussian to ``max_tiles_per_gaussian`` cells wastes sort work. With
    ``mid_cap > 0`` the primary window can shrink (e.g.
    ``max_tiles_per_gaussian=4`` -> 2x2) and Gaussians whose rect exceeds it
    get a second ``mid_side`` x ``mid_side`` enumeration of exactly the cells
    pass 1 missed (same structure as the giant pass, one tier down). At the
    800p/100k bench this cuts sorted instances 1.6M -> ~535k with identical
    output (the union of tier cells is exactly the clipped bbox rect).
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
    if opacity is not None:
        # exact culling of cells no pixel of which can reach alpha >= 1/255:
        # shrinks real per-tile counts (blend chunks, MAX pressure) at zero
        # output difference
        cell_ok &= _cell_cull(proj, opacity, tx, ty, tile)
    tile_id = jnp.where(cell_ok, ty * tx_n + tx, T).reshape(-1)  # invalid -> sentinel T
    depth = jnp.broadcast_to(proj.depth[None, :], (K, N)).reshape(-1)
    gid = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (K, N)).reshape(-1)

    # second enumeration pass for GIANT gaussians (rect > K cells): the CUDA
    # rasterizer duplicates unboundedly; here the few giants (static cap) get
    # a larger giant_side x giant_side window, enumerating exactly the cells
    # the first window missed (dx >= side or dy >= side). Without this, the
    # corner-anchored K-window of a giant near-camera splat drops its
    # *central* (brightest) cells — round-1 verdict item 4.
    # exact cells the side x side window misses: w*h - min(w,side)*min(h,side)
    rect_overflow_cells = jnp.where(
        proj.mask,
        w_rect * h_rect - jnp.minimum(w_rect, side) * jnp.minimum(h_rect, side),
        0,
    )

    def extra_tier(sel, cap, lo_side, hi_side, tile_id, depth, gid, rect_overflow_cells):
        """Enumerate, for up to ``cap`` selected Gaussians, the cells of a
        ``hi_side`` x ``hi_side`` corner-anchored window that every lower tier
        missed (dx >= lo_side or dy >= lo_side) — tier regions are disjoint
        and their union is exactly the clipped bbox rect."""
        (gsel,) = jnp.nonzero(sel, size=cap, fill_value=N)
        gok = gsel < N
        gi = jnp.clip(gsel, 0, N - 1)
        K2 = hi_side * hi_side
        ks2 = jnp.arange(K2, dtype=jnp.int32)
        dx2 = (ks2 % hi_side)[:, None]
        dy2 = (ks2 // hi_side)[:, None]
        tx2 = lox[gi][None, :] + dx2  # (K2, cap)
        ty2 = loy[gi][None, :] + dy2
        cell_ok2 = (
            gok[None, :]
            & (dx2 < w_rect[gi][None, :])
            & (dy2 < h_rect[gi][None, :])
            & ((dx2 >= lo_side) | (dy2 >= lo_side))  # only cells lower tiers missed
        )
        if opacity is not None:
            sub = Projected(
                mean2d=proj.mean2d[gi], depth=proj.depth[gi], conic=proj.conic[gi],
                radius=proj.radius[gi], mask=proj.mask[gi],
            )
            cell_ok2 &= _cell_cull(sub, opacity[gi], tx2, ty2, tile)
        tile_id2 = jnp.where(cell_ok2, ty2 * tx_n + tx2, T).reshape(-1)
        depth2 = jnp.broadcast_to(proj.depth[gi][None, :], (K2, cap)).reshape(-1)
        gid2 = jnp.broadcast_to(gi[None, :], (K2, cap)).reshape(-1)
        # residual truncation: selected beyond the cap or wider than hi_side
        handled = jnp.zeros((N,), bool).at[gi].set(gok, mode="drop")
        rect_overflow_cells = jnp.where(
            handled,
            w_rect * h_rect
            - jnp.minimum(w_rect, hi_side) * jnp.minimum(h_rect, hi_side),
            rect_overflow_cells,
        )
        return (
            jnp.concatenate([tile_id, tile_id2]),
            jnp.concatenate([depth, depth2]),
            jnp.concatenate([gid, gid2]),
            rect_overflow_cells,
            handled,
        )

    lo = side
    mid_handled = None
    if mid_cap > 0 and mid_side > side:
        sel = proj.mask & ((w_rect > side) | (h_rect > side))
        tile_id, depth, gid, rect_overflow_cells, mid_handled = extra_tier(
            sel, mid_cap, side, mid_side, tile_id, depth, gid, rect_overflow_cells
        )
        lo = mid_side
    if giant_cap > 0:
        sel = proj.mask & ((w_rect > lo) | (h_rect > lo))
        if mid_handled is not None:
            # a giant the mid tier's cap dropped is missing its [side, mid_side)
            # ring; skip it here so the overflow diagnostic keeps counting
            # those cells (escalation will re-render with bigger caps)
            sel &= mid_handled
        tile_id, depth, gid, rect_overflow_cells, _ = extra_tier(
            sel, giant_cap, lo, giant_side, tile_id, depth, gid, rect_overflow_cells
        )

    tile_sorted, _, gid_sorted = jax.lax.sort(
        (tile_id, depth, gid), num_keys=3
    )  # grouped by tile, front-to-back within each tile; gid as the 3rd
    # key breaks exact depth ties deterministically (~400 f32 collisions
    # per 100k random depths): a stable 2-key sort resolves ties by
    # instance EMISSION position, which differs between the plain and
    # tiered enumerations (a mid/giant-tier instance sits after every
    # pass-1 instance), so the same scene rendered tier-on vs tier-off
    # blended tied splats in different orders. gid-order ties also match
    # the CUDA rasterizer's stable radix sort over per-gaussian duplicate
    # emission (reference diff_gaussian_rasterization duplicateWithKeys)
    # and the sorted2 / compact binners' drank tie-break.

    if counts_via == "histogram" and opacity is None and giant_cap == 0:
        # emitted cells per gaussian are the rect clipped to side x side, so
        # clip the hi bounds before the histogram to match the sort exactly
        # (the histogram is separable and cannot express per-cell culling or
        # the giant second pass)
        hix_e = lox + jnp.minimum(w_rect, side) - 1
        hiy_e = loy + jnp.minimum(h_rect, side) - 1
        count, starts = _mxu_tile_histogram(proj, lox, hix_e, loy, hiy_e, tx_n, ty_n)
    else:
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

    # truncated-bbox cells beyond pass 1 + the giant second pass are the
    # rect-overflow diagnostic (count stays the true per-tile hit count,
    # which also drives kernel chunk predication)
    rect_overflow = jnp.sum(rect_overflow_cells)
    return TileBins(
        idx=idx, valid=valid, count=count, tiles_x=tx_n, tiles_y=ty_n,
        overflow=rect_overflow.astype(jnp.int32),
        starts=starts, gid_sorted=gid_sorted,
    )


def bin_gaussians_runs(
    proj: Projected,
    width: int,
    height: int,
    max_per_tile: int = 1024,
    tile: int = TILE,
    max_tiles_per_gaussian: int = 16,
    max_instances: int | None = None,
    chunk: int = 128,
) -> TileBins:
    """Aligned-runs binning: the sorted instance array, re-laid-out so each
    tile's run starts at a ``chunk``-aligned slot.

    Same (tile, depth) 2-key instance sort as ``bin_gaussians_sorted``, but
    instead of extracting dense (T, MAX) windows (640k slots at the 800p
    bench), the runs are repacked into one flat (M2,) array with per-tile
    128-block alignment (~270k slots): the Pallas blend kernel then addresses
    each tile's blocks directly through scalar-prefetched block offsets
    (``RunsInfo.sblk``), and the backward writes per-instance gradients to
    disjoint aligned blocks — the scatter-add back to Gaussians shrinks by
    the same ~2.4x. ``max_per_tile`` only bounds the kernel's chunk grid
    (truncation is counted in ``count`` vs that bound), not any materialized
    array.
    """
    tx_n, ty_n = num_tiles(width, height, tile)
    T = tx_n * ty_n
    N = proj.mean2d.shape[0]

    lox, loy, hix, hiy = _rects(proj, tx_n, ty_n, tile)
    w_rect = hix - lox + 1
    h_rect = hiy - loy + 1

    side = max(int(np.ceil(np.sqrt(max_tiles_per_gaussian))), 1)
    K = side * side
    ks = jnp.arange(K, dtype=jnp.int32)
    dx = (ks % side)[:, None]
    dy = (ks // side)[:, None]
    tx = lox[None, :] + dx
    ty = loy[None, :] + dy
    cell_ok = proj.mask[None, :] & (dx < w_rect[None, :]) & (dy < h_rect[None, :])
    tile_id = jnp.where(cell_ok, ty * tx_n + tx, T).reshape(-1)
    depth = jnp.broadcast_to(proj.depth[None, :], (K, N)).reshape(-1)
    gid = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (K, N)).reshape(-1)

    _, _, gid_sorted = jax.lax.sort((tile_id, depth, gid), num_keys=3)

    hix_e = lox + jnp.minimum(w_rect, side) - 1
    hiy_e = loy + jnp.minimum(h_rect, side) - 1
    count, starts = _mxu_tile_histogram(proj, lox, hix_e, loy, hiy_e, tx_n, ty_n)

    # aligned run layout: tile t's run occupies blocks [sblk[t], sblk[t]+blocks[t])
    blocks = -(-count // chunk)
    sblk = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(blocks)[:-1].astype(jnp.int32)])
    total_blocks = sblk[-1] + blocks[-1]

    if max_instances is None:
        max_instances = 4 * N
    # + T*chunk: per-tile alignment waste is < chunk slots per tile, so the
    # instance budget stays an instance count, not an aligned-slot count;
    # +chunk spare block: spurious (empty-tile) backward writes land there
    M2 = (-(-(max_instances + T * chunk) // chunk)) * chunk + chunk

    q = jnp.arange(M2, dtype=jnp.int32)
    starts_pad = sblk * chunk
    tile_q = jnp.searchsorted(starts_pad, q, side="right").astype(jnp.int32) - 1
    r = q - starts_pad[tile_q]
    src = starts[tile_q] + r
    KN = K * N
    # slots past max_per_tile carry the sentinel: the kernel's chunk grid
    # never writes their backward blocks, so they must not map to real ids
    validq = r < jnp.minimum(count[tile_q], max_per_tile)
    gid_runs = jnp.where(validq, gid_sorted[jnp.clip(src, 0, KN - 1)], N)

    rect_overflow = jnp.sum(jnp.where(proj.mask, jnp.maximum(w_rect * h_rect - K, 0), 0))
    budget_overflow = jnp.maximum(total_blocks * chunk - (M2 - chunk), 0)
    return TileBins(
        idx=None, valid=None, count=count, tiles_x=tx_n, tiles_y=ty_n,
        overflow=rect_overflow.astype(jnp.int32),
        overflow_budget=budget_overflow.astype(jnp.int32),
        runs=RunsInfo(gid=gid_runs, sblk=sblk),
    )


def _mxu_tile_histogram(proj: Projected, lox, hix, loy, hiy, tx_n: int, ty_n: int):
    """True per-tile hit counts via one MXU matmul of the per-axis interval
    indicators: counts(ty, tx) = sum_g Ly[g, ty] * Lx[g, tx]. Replaces two
    searchsorted passes over the sorted instance array."""
    txs = jnp.arange(tx_n, dtype=jnp.float32)[None, :]
    tys = jnp.arange(ty_n, dtype=jnp.float32)[None, :]
    m = proj.mask[:, None]
    Lx = (m & (txs >= lox[:, None]) & (txs <= hix[:, None])).astype(jnp.float32)
    Ly = (m & (tys >= loy[:, None]) & (tys <= hiy[:, None])).astype(jnp.float32)
    counts2d = jax.lax.dot_general(
        Ly, Lx, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    count = counts2d.reshape(-1).astype(jnp.int32)  # (T,)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(count)[:-1]])
    return count, starts


def bin_gaussians_sorted2(
    proj: Projected,
    width: int,
    height: int,
    max_per_tile: int = 1024,
    tile: int = TILE,
    max_tiles_per_gaussian: int = 16,
) -> TileBins:
    """Padded binning v2: depth pre-sort makes the instance sort single-key.

    The round-1 sorted binner paid for a 3-operand 2-key ``lax.sort`` over the
    padded (K*N) instances plus two searchsorted passes. Here the Gaussians
    are argsorted by depth once, so each instance's sort key packs
    (tile, depth-rank, cell) into one integer and the sort is a single-operand
    int sort with **no payload**: depth-rank and cell index are recovered from
    the key by modular arithmetic. Per-tile counts come from the MXU
    histogram. The (k, drank) grid structure is returned (GridInfo) so the
    instance-gather backward is a collision-free permutation scatter + K-axis
    reduction instead of XLA's scatter-add.
    """
    tx_n, ty_n = num_tiles(width, height, tile)
    T = tx_n * ty_n
    N = proj.mean2d.shape[0]

    lox, loy, hix, hiy = _rects(proj, tx_n, ty_n, tile)
    count, starts = _mxu_tile_histogram(proj, lox, hix, loy, hiy, tx_n, ty_n)

    order = jnp.argsort(jnp.where(proj.mask, proj.depth, jnp.inf)).astype(jnp.int32)
    lox_d, loy_d = lox[order], loy[order]
    w_d = (hix - lox + 1)[order]
    h_d = (hiy - loy + 1)[order]
    mask_d = proj.mask[order]

    side = max(int(np.ceil(np.sqrt(max_tiles_per_gaussian))), 1)
    K = side * side
    ks = jnp.arange(K, dtype=jnp.int32)
    dx = (ks % side)[:, None]
    dy = (ks // side)[:, None]
    tx = lox_d[None, :] + dx  # (K, N)
    ty = loy_d[None, :] + dy
    cell_ok = mask_d[None, :] & (dx < w_d[None, :]) & (dy < h_d[None, :])
    tile_id = jnp.where(cell_ok, ty * tx_n + tx, T)  # (K, N)

    drank = jax.lax.broadcasted_iota(jnp.int32, (K, N), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (K, N), 0)
    NK = N * K
    kdt = jnp.int64 if (T + 1) * NK >= 2**31 else jnp.int32
    key = (tile_id.astype(kdt) * N + drank) * K + kk
    key_sorted = jax.lax.sort(key.reshape(-1))
    j = (key_sorted % NK).astype(jnp.int32)  # drank * K + k, per sorted slot
    drank_sorted = j // K
    grid_flat_sorted = (j % K) * N + drank_sorted  # k * N + drank

    s = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    valid = s < jnp.minimum(count, max_per_tile)[:, None]
    drank_win = _extract_windows(jnp.pad(drank_sorted, (0, max_per_tile)), starts, max_per_tile)
    grid_win = _extract_windows(
        jnp.pad(grid_flat_sorted, (0, max_per_tile), constant_values=NK), starts, max_per_tile
    )
    drank_win = jnp.where(valid, drank_win, 0)
    grid_win = jnp.where(valid, grid_win, NK)  # sentinel -> dropped in scatter
    idx = order[drank_win]  # original gids (dead code unless a caller uses it)

    rect_overflow = jnp.sum(
        jnp.where(proj.mask, jnp.maximum((hix - lox + 1) * (hiy - loy + 1) - K, 0), 0)
    )
    return TileBins(
        idx=idx, valid=valid, count=count, tiles_x=tx_n, tiles_y=ty_n,
        overflow=rect_overflow.astype(jnp.int32),
        grid=GridInfo(
            order=order, invorder=jnp.argsort(order).astype(jnp.int32),
            drank_win=drank_win, grid_win=grid_win,
        ),
    )


def bin_gaussians_compact(
    proj: Projected,
    width: int,
    height: int,
    max_per_tile: int = 1024,
    tile: int = TILE,
    max_instances: int | None = None,
) -> TileBins:
    """Compact-then-sort binning: no per-Gaussian tile cap, ~3x less sort work.

    The round-1 scheme padded every Gaussian to ``max_tiles_per_gaussian``
    bbox cells and sorted the padded (K*N) instance array — 1.6M keys for the
    233k real instances of the 800p/100k bench, with a hard cap that silently
    truncated big splats (round-1 VERDICT Weak #3). Here instances are laid
    out *compactly* (one slot per real bbox cell, CUDA's unbounded-duplication
    semantics up to a single global ``max_instances`` budget):

      1. depth-order the Gaussians (single-operand argsort over N);
      2. slot -> gaussian map by scattering run-starts and a cumsum — no
         per-gaussian K loop, no padding;
      3. one single-key sort of M compact slots (tile in high bits, slot in
         low: slots are already depth-ordered so the packed key yields
         front-to-back order per tile);
      4. per-tile counts via an MXU histogram: counts(ty,tx) = Ly^T @ Lx of
         the per-axis interval indicators — replaces two searchsorted passes
         (~2.8 ms each on-chip) with a trivial (ty_n, N) @ (N, tx_n) matmul.

    Also returns the CompactInfo structure that turns the instance-gather
    backward into gather+segment-sum (see tiles.gather_instances).
    """
    tx_n, ty_n = num_tiles(width, height, tile)
    T = tx_n * ty_n
    N = proj.mean2d.shape[0]
    M = max_instances if max_instances is not None else 4 * N
    M = max(-(-M // 128) * 128, 128)  # lane-aligned instance budget

    lox, loy, hix, hiy = _rects(proj, tx_n, ty_n, tile)

    # per-tile true hit counts: MXU histogram over the interval indicators
    txs = jnp.arange(tx_n, dtype=jnp.float32)[None, :]
    tys = jnp.arange(ty_n, dtype=jnp.float32)[None, :]
    m = proj.mask[:, None]
    Lx = (m & (txs >= lox[:, None]) & (txs <= hix[:, None])).astype(jnp.float32)
    Ly = (m & (tys >= loy[:, None]) & (tys <= hiy[:, None])).astype(jnp.float32)
    counts2d = jax.lax.dot_general(
        Ly, Lx, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (ty_n, tx_n)
    count = counts2d.reshape(-1).astype(jnp.int32)  # (T,)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(count)[:-1]])

    # depth order + per-gaussian slot runs
    order = jnp.argsort(jnp.where(proj.mask, proj.depth, jnp.inf)).astype(jnp.int32)
    lox_d, loy_d = lox[order], loy[order]
    w_d = (hix - lox + 1)[order]
    cnt = jnp.where(proj.mask[order], w_d * (hiy - loy + 1)[order], 0).astype(jnp.int32)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(cnt)[:-1]])
    total = offsets[-1] + cnt[-1]

    # slot -> depth-rank map: +1 at every run start, cumsum, -1
    seg = jnp.zeros(M + 1, jnp.int32).at[jnp.minimum(offsets, M)].add(1)
    grank = jnp.cumsum(seg[:M]) - 1  # (M,) in [0, N)
    slot = jnp.arange(M, dtype=jnp.int32)
    valid_slot = slot < jnp.minimum(total, M)
    grank = jnp.clip(grank, 0, N - 1)
    k = slot - offsets[grank]
    w_g = jnp.maximum(w_d[grank], 1)
    tx_s = lox_d[grank] + k % w_g
    ty_s = loy_d[grank] + k // w_g
    slot_tile = jnp.where(valid_slot, ty_s * tx_n + tx_s, T)  # (M,)

    # single-key sort: tile in high bits, slot in low -> per-tile depth order
    kdt = jnp.int64 if (T + 1) * M >= 2**31 else jnp.int32
    key = slot_tile.astype(kdt) * M + slot
    key_sorted, grank_sorted = jax.lax.sort((key, grank), num_keys=1)
    slot_sorted = (key_sorted % M).astype(jnp.int32)
    gid_sorted = order[grank_sorted]

    # inverse permutation (slot -> sorted position) for the structural bwd
    _, invperm = jax.lax.sort((slot_sorted, slot), num_keys=1)

    s = jnp.arange(max_per_tile, dtype=jnp.int32)[None, :]
    valid = s < jnp.minimum(count, max_per_tile)[:, None]
    win = _extract_windows(jnp.pad(gid_sorted, (0, max_per_tile)), starts, max_per_tile)
    idx = jnp.where(valid, win, 0)

    overflow = jnp.maximum(total - M, 0)
    return TileBins(
        idx=idx, valid=valid, count=count, tiles_x=tx_n, tiles_y=ty_n,
        overflow=overflow.astype(jnp.int32),
        compact=CompactInfo(
            order=order,
            invorder=jnp.argsort(order).astype(jnp.int32),
            offsets=offsets, cnt=cnt, slot_tile=slot_tile,
            invperm=invperm, starts=starts,
        ),
    )
