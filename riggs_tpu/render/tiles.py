"""Tiled fast-path rasterizer: depth-sorted, per-tile GEMM-style blending.

The compute layout is chosen for the TPU memory hierarchy rather than ported
from the CUDA kernel:

  * pixels of a 32x32 tile are one flattened 1024-lane axis (VPU-shaped);
  * Gaussians are consumed in chunks of G_CHUNK along a lax.scan; within a
    chunk, sequential front-to-back compositing is re-expressed as an
    exclusive cumulative product of (1 - alpha) along the chunk axis, so the
    "loop" becomes cumprod + two small matmuls ((P,G)@(G,3) color accumulate),
    with a carried per-pixel transmittance between chunks;
  * early termination is a mask (T < 1e-4), matching the CUDA include set
    exactly (see render/oracle.py for the derivation).

This file is pure jnp, so XLA provides the backward pass; jax.checkpoint on
the per-chunk body keeps the (tiles, P, G) alpha tensor out of saved
residuals. A Pallas kernel with the same tile/chunk structure (alpha tile
resident in VMEM) is the planned drop-in replacement for the hot path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.camera.camera import Camera
from riggs_tpu.render.binning import TILE, CompactInfo, TileBins, bin_gaussians
from riggs_tpu.render.project import Projected, build_cov3d, project_gaussians

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
G_CHUNK = 128


@jax.custom_vjp
def gather_instances(packed: jax.Array, idx: jax.Array, compact: CompactInfo):
    """(N, D) packed rows -> (T, MAX, D) per-tile windows, with a structural
    backward: XLA differentiates a gather into a scatter-add (11.6 ms at the
    800p bench), but the compact binning knows each Gaussian's instances form
    a contiguous slot run — so the backward is an inverse-permutation row
    gather + one cumsum + run-boundary differences (a segment sum)."""
    return packed[idx]


def _gather_inst_fwd(packed, idx, compact):
    return packed[idx], compact


def _gather_inst_bwd(c, dg):
    T, MAX, D = dg.shape
    M = c.slot_tile.shape[0]
    p = c.invperm  # (M,) sorted position of each slot
    t = c.slot_tile  # (M,) tile per slot, sentinel T when invalid
    s = p - c.starts[jnp.clip(t, 0, T - 1)]
    ok = (t < T) & (s < MAX)
    row = jnp.where(ok, jnp.clip(t, 0, T - 1) * MAX + jnp.clip(s, 0, MAX - 1), 0)
    rows = jnp.where(ok[:, None], dg.reshape(T * MAX, D)[row], 0.0)  # (M, D)
    cs = jnp.cumsum(rows.astype(jnp.float32), axis=0)
    csz = jnp.concatenate([jnp.zeros((1, D), jnp.float32), cs])
    per_g = csz[c.offsets + c.cnt] - csz[c.offsets]  # (N, D) depth order
    _z = lambda x: np.zeros(x.shape, jax.dtypes.float0)  # int-arg cotangents
    return per_g[c.invorder], _z(jnp.zeros((T, MAX))), jax.tree.map(_z, c)


gather_instances.defvjp(_gather_inst_fwd, _gather_inst_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_grid(packed: jax.Array, grid, k: int):
    """(N, D) packed rows -> (T, MAX, D) windows via the depth-ordered padded
    grid (bin_gaussians_sorted2). Backward: window gradients scatter to their
    unique (k, drank) grid cells (collision-free permutation scatter, no
    scatter-add) and reduce over K. ``k`` is the static padded-cells-per-
    gaussian count (side**2 of max_tiles_per_gaussian)."""
    return packed[grid.order][grid.drank_win]


def _gather_grid_fwd(packed, grid, k):
    return packed[grid.order][grid.drank_win], grid


def _gather_grid_bwd(k, grid, dg):
    T, MAX, D = dg.shape
    N = grid.order.shape[0]
    NK = N * k
    dcells = jnp.zeros((NK + 1, D), jnp.float32).at[grid.grid_win.reshape(-1)].add(
        dg.reshape(T * MAX, D), mode="drop", unique_indices=True
    )  # sentinel NK lands in the extra row, dropped by the slice below
    per_g = dcells[:NK].reshape(k, N, D).sum(0)  # depth order
    _z = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return per_g[grid.invorder], jax.tree.map(_z, grid)


gather_grid.defvjp(_gather_grid_fwd, _gather_grid_bwd)


def _tile_pixel_coords(tiles_x: int, tiles_y: int, tile: int = TILE) -> jax.Array:
    """(T, tile*tile, 2) pixel centers for every tile."""
    t = jnp.arange(tiles_x * tiles_y, dtype=jnp.float32)
    ox = (t % tiles_x) * tile
    oy = (t // tiles_x) * tile
    yy, xx = jnp.meshgrid(jnp.arange(tile, dtype=jnp.float32), jnp.arange(tile, dtype=jnp.float32), indexing="ij")
    base = jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1)  # (P, 2)
    return base[None, :, :] + jnp.stack([ox, oy], -1)[:, None, :]


def _blend_tile_chunks(pix, mean2d, conic, opacity, colors, depths):
    """Composite one tile. pix: (P,2); gaussian arrays: (MAX, ...), depth-ordered.

    Returns (rgb (P,3), depth (P,), acc (P,)).
    """
    P = pix.shape[0]
    MAX = mean2d.shape[0]
    n_chunks = MAX // G_CHUNK

    def chunk_body(carry, inp):
        T_run, rgb, dep, acc = carry
        m2d, con, op, col, dth = inp
        d = pix[:, None, :] - m2d[None, :, :]
        dx, dy = d[..., 0], d[..., 1]
        power = -0.5 * (con[None, :, 0] * dx * dx + con[None, :, 2] * dy * dy) - con[None, :, 1] * dx * dy
        alpha = op[None, :] * jnp.exp(power)
        alpha = jnp.where(power > 0.0, 0.0, alpha)
        alpha = jnp.minimum(alpha, ALPHA_MAX)
        alpha = jnp.where(alpha < ALPHA_MIN, 0.0, alpha)  # (P, G)

        one_m = 1.0 - alpha
        Pc = jnp.cumprod(one_m, axis=-1)  # inclusive, within-chunk
        Texc = T_run[:, None] * (Pc / one_m)  # running transmittance before each g
        Pin = T_run[:, None] * Pc  # after each g
        w = alpha * Texc * (Pin >= T_EPS)
        # HIGHEST: this is the reference/fallback path (dead on TPU by
        # default) — at TPU default precision these dots run bf16 and the
        # path stops being a valid f32-grade parity reference for the
        # Pallas kernels (round-4 on-chip tier finding: 2.7e-3 image diff)
        hi = jax.lax.Precision.HIGHEST
        rgb = rgb + jnp.dot(w, col, preferred_element_type=jnp.float32, precision=hi)
        dep = dep + jnp.dot(w, dth, preferred_element_type=jnp.float32, precision=hi)
        acc = acc + jnp.sum(w, axis=-1)
        return (T_run * Pc[:, -1], rgb, dep, acc), None

    chunked = lambda a: a.reshape((n_chunks, G_CHUNK) + a.shape[1:])
    init = (jnp.ones(P), jnp.zeros((P, 3)), jnp.zeros(P), jnp.zeros(P))
    (_, rgb, dep, acc), _ = jax.lax.scan(
        jax.checkpoint(chunk_body),
        init,
        (chunked(mean2d), chunked(conic), chunked(opacity), chunked(colors), chunked(depths)),
    )
    # acc = sum of weights = 1 - T_at_the_last_included_gaussian, which is the
    # CUDA early-stop T (T_run itself keeps shrinking past the stop threshold).
    return rgb, dep, acc


def blend_tiles(
    pix_coords: jax.Array,
    mean2d: jax.Array,
    conic: jax.Array,
    opacity: jax.Array,
    colors: jax.Array,
    depths: jax.Array,
    tile_chunk: int = 64,
):
    """vmap the per-tile blend over tiles, chunked with lax.map to bound memory.

    pix_coords: (T, P, 2); per-tile gathered gaussian arrays: (T, MAX, ...).
    """
    def one(args):
        return jax.vmap(_blend_tile_chunks)(*args)

    T = pix_coords.shape[0]
    pad = (-T) % tile_chunk
    padded = lambda a: jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
    args = tuple(
        padded(a).reshape((-1, tile_chunk) + a.shape[1:])
        for a in (pix_coords, mean2d, conic, opacity, colors, depths)
    )
    rgb, dep, acc = jax.lax.map(one, args)
    unchunk = lambda a: a.reshape((-1,) + a.shape[2:])[:T]
    return unchunk(rgb), unchunk(dep), unchunk(acc)


def rasterize_tiled(
    cam: Camera,
    means3d: jax.Array,
    colors: jax.Array,
    opacity: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    bg: jax.Array,
    alive: jax.Array | None = None,
    scale_modifier: float = 1.0,
    cov3d: jax.Array | None = None,
    max_per_tile: int = 1024,
    tile_chunk: int = 64,
    mean2d_bias: jax.Array | None = None,
    binning: str = "sort",
    blend: str = "auto",
    max_tiles_per_gaussian: int = 16,
    max_instances: int | None = None,
    giant_cap: int = 256,
    giant_side: int = 12,
    mid_cap: int = 0,
    mid_side: int = 4,
    tile_ladder: tuple | None = None,
    tile_shard_mesh=None,
):
    """Fast-path render. Same contract as rasterize_oracle plus overflow count.

    binning='sort' (default) is the padded (tile, depth) 2-key-sort binner —
    measured fastest end-to-end on TPU v5e (45 ms fwd+bwd at 800p/100k vs 63
    compact / 80 sort2; scripts/perf_ab.py);
    binning='compact' the compact-then-sort binner with no per-Gaussian tile
    cap (CUDA's unbounded-duplication semantics up to one global
    ``max_instances`` budget) and a segment-sum gather backward — slower, but
    the escalation target when a scene has giant splats;
    binning='sort2' the depth-presorted padded binner (single-key no-payload
    sort, MXU histogram, collision-free-scatter backward) — kept for A/B;
    binning='dense' the exact dense-mask compaction (oracle-parity reference).
    blend='pallas' runs the fused VMEM-resident Pallas blend kernel with its
    analytic backward; 'jnp' the XLA scan path; 'auto' picks pallas on TPU
    and jnp on CPU (interpret-mode pallas is test-only).
    tile_shard_mesh: a Mesh with a 'tile' axis — the blend runs per-shard via
    shard_map with the shard's global tile offset (pixel parallelism; composes
    under a data-sharded vmap for 2D data x tile training steps).
    """
    if tile_ladder is not None and blend == "auto":
        # the laddered blend IS the permuted pallas kernel; run it in
        # interpret mode on CPU rather than silently dropping the ladder
        blend = "pallas"
    if blend == "auto":
        blend = "pallas" if jax.devices()[0].platform != "cpu" else "jnp"
    if tile_shard_mesh is not None:
        if tile_ladder is not None or binning == "runs":
            raise ValueError("tile_shard_mesh composes with the plain-window pallas blend only")
        # the sharded blend IS the pallas kernel (interpret-mode on CPU):
        # never fall back silently to the unsharded jnp path
        blend = "pallas"
    from riggs_tpu.render.binning import (
        bin_gaussians_compact,
        bin_gaussians_runs,
        bin_gaussians_sorted,
        bin_gaussians_sorted2,
    )

    if cov3d is None:
        from riggs_tpu.render.project import build_cov3d_packed

        cov3d = build_cov3d_packed(scales, rotations, scale_modifier)
    max_per_tile = -(-max_per_tile // G_CHUNK) * G_CHUNK  # multiple of the scan chunk
    proj = project_gaussians(cam, means3d, cov3d, alive, mean2d_bias)
    op_cull = jax.lax.stop_gradient(jnp.where(proj.mask, opacity, 0.0))
    if binning == "runs":
        bins = bin_gaussians_runs(
            proj, cam.width, cam.height, max_per_tile=max_per_tile,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            max_instances=max_instances,
        )
    elif binning == "compact":
        bins = bin_gaussians_compact(
            proj, cam.width, cam.height, max_per_tile=max_per_tile,
            max_instances=max_instances,
        )
    elif binning == "sort2":
        bins = bin_gaussians_sorted2(
            proj, cam.width, cam.height, max_per_tile=max_per_tile,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
        )
    elif binning == "sort":
        bins = bin_gaussians_sorted(
            proj, cam.width, cam.height, max_per_tile=max_per_tile,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            opacity=op_cull, giant_cap=giant_cap, giant_side=giant_side,
            mid_cap=mid_cap, mid_side=mid_side,
        )
    else:
        bins = bin_gaussians(proj, cam.width, cam.height, max_per_tile=max_per_tile)

    # one packed gather instead of five (HBM-gather bound at large N)
    op_masked = jnp.where(proj.mask, opacity, 0.0)
    packed = jnp.concatenate(
        [
            proj.mean2d,
            proj.conic,
            op_masked[:, None],
            colors,
            proj.depth[:, None],
        ],
        axis=-1,
    )  # (N, 10)
    ladder_overflow = None
    if tile_ladder is not None:
        # laddered windows: tiles sorted by hit count descending get
        # rank-dependent window capacities, shrinking the instance gather and
        # its scatter-add backward (both row-op-bound) to roughly the area
        # under the sorted-count curve instead of T * max(count). Each bucket
        # runs the permuted-tile Pallas blend (real tile ids via scalars);
        # outputs are un-permuted with one (T,)-row gather.
        if blend != "pallas" or bins.starts is None:
            raise ValueError("tile_ladder requires blend='pallas' and binning='sort'")
        from riggs_tpu.render.binning import _extract_windows
        from riggs_tpu.render.pallas_blend import pallas_blend_permuted_gm

        T = bins.tiles_x * bins.tiles_y
        if sum(n for n, _ in tile_ladder) != T:
            raise ValueError(
                f"tile_ladder bucket sizes must sum to the tile count {T}: {tile_ladder}"
            )
        interpret = jax.devices()[0].platform == "cpu"
        ordr = jnp.argsort(-bins.count).astype(jnp.int32)
        inv = jnp.argsort(ordr)
        cap_max = max(-(-cap // G_CHUNK) * G_CHUNK for _, cap in tile_ladder)
        gid_pad = jnp.pad(bins.gid_sorted, (0, cap_max))
        # pass 1: per-bucket window extraction (contiguous spans — full HBM
        # bandwidth) + plain row gathers (XLA scatter-add backward; a
        # collision-free enumeration-cell backward was measured SLOWER
        # on-chip — 33.8 vs 21.5 ms at the 800p/100k bench, round 4 — and
        # deleted: both scatter forms are row-op-bound and the structural
        # form needs strictly more row ops)
        bucket_meta = []  # (nb, rounded cap | 0, tids_b, counts_b)
        wins_l, valids_l = [], []
        r0 = 0
        for nb, cap in tile_ladder:
            tids_b = ordr[r0 : r0 + nb]
            counts_b = bins.count[tids_b]
            if cap == 0:
                bucket_meta.append((nb, 0, tids_b, counts_b))
            else:
                cap = -(-cap // G_CHUNK) * G_CHUNK
                starts_b = bins.starts[tids_b]
                wins_l.append(_extract_windows(gid_pad, starts_b, cap))
                valids_l.append(
                    jnp.arange(cap, dtype=jnp.int32)[None, :]
                    < jnp.minimum(counts_b, cap)[:, None]
                )
                bucket_meta.append((nb, cap, tids_b, counts_b))
            r0 += nb
        gathered = [packed[jnp.where(v, w, 0)] for w, v in zip(wins_l, valids_l)]
        outs = []
        ladder_overflow = jnp.zeros((), jnp.int32)
        bi = 0
        for nb, cap, tids_b, counts_b in bucket_meta:
            if cap == 0:
                # empty-tile bucket: no windows, no kernel — background only.
                # Any nonzero count here is truncation, counted for escalation.
                outs.append(jnp.zeros((nb, 8, TILE * TILE), jnp.float32))
                ladder_overflow += jnp.sum(counts_b)
                continue
            g_b = gathered[bi]  # (nb, cap, 10); invalid slots read row 0
            bi += 1
            # gaussian-major kernel (measured best, round 4: 21.3 vs 21.4 ms
            # channel-major): rows past the true count are masked IN-KERNEL
            # (their values are irrelevant and their grads are exactly zero,
            # so the backward ignores them either way); no host-side pad,
            # mask, or transpose of the gathered windows
            outs.append(
                pallas_blend_permuted_gm(
                    g_b, jnp.minimum(counts_b, cap), tids_b, bins.tiles_x, interpret
                )
            )
            ladder_overflow += jnp.sum(jnp.maximum(counts_b - cap, 0))
        out = jnp.concatenate(outs, axis=0)[inv]  # (T, 8, P) back in tile order
        rgb = jnp.transpose(out[:, 0:3, :], (0, 2, 1))
        dep = out[:, 3, :]
        acc = out[:, 4, :]
    elif bins.runs is not None:
        # aligned-runs path: one compact instance gather (M2 ~ 2.4x smaller
        # than the dense T*MAX windows), kernel addresses blocks via sblk
        from riggs_tpu.render.pallas_blend import pallas_blend_runs, PACK_ROWS

        packed_z = jnp.concatenate([packed, jnp.zeros((1, packed.shape[1]))], axis=0)
        attrs = packed_z[bins.runs.gid]  # (M2, 10); sentinel slots all-zero
        attrs = jnp.concatenate(
            [attrs, jnp.zeros(attrs.shape[:1] + (PACK_ROWS - attrs.shape[-1],), attrs.dtype)],
            axis=-1,
        )
        g_runs = jnp.transpose(attrs, (1, 0))  # (16, M2)
        interpret = jax.devices()[0].platform == "cpu"
        counts = jnp.minimum(bins.count, max_per_tile).astype(jnp.int32)
        out = pallas_blend_runs(
            g_runs, counts, bins.runs.sblk, max_per_tile // G_CHUNK,
            bins.tiles_x, interpret,
        )  # (T, 8, P)
        rgb = jnp.transpose(out[:, 0:3, :], (0, 2, 1))
        dep = out[:, 3, :]
        acc = out[:, 4, :]
    elif bins.compact is not None:
        g = gather_instances(packed, bins.idx, bins.compact)  # (T, MAX, 10)
    elif bins.grid is not None:
        side = max(int(np.ceil(np.sqrt(max_tiles_per_gaussian))), 1)
        g = gather_grid(packed, bins.grid, side * side)  # (T, MAX, 10)
    else:
        g = bins.gather(packed)  # (T, MAX, 10)

    if tile_ladder is not None or bins.runs is not None:
        pass  # blended above
    elif blend == "pallas":
        from riggs_tpu.render.pallas_blend import pallas_blend, PACK_ROWS

        g_masked = g.at[..., 5].set(jnp.where(bins.valid, g[..., 5], 0.0))
        gp = jnp.concatenate(
            [g_masked, jnp.zeros(g.shape[:2] + (PACK_ROWS - g.shape[-1],), g.dtype)], axis=-1
        )
        gp = jnp.transpose(gp, (0, 2, 1))  # (T, 16, MAX)
        interpret = jax.devices()[0].platform == "cpu"
        counts = jnp.minimum(bins.count, max_per_tile).astype(jnp.int32)
        if tile_shard_mesh is not None:
            from jax.sharding import PartitionSpec as _P
            from jax import shard_map as _shard_map

            from riggs_tpu.render.pallas_blend import pallas_blend_offset

            n_sh = tile_shard_mesh.shape["tile"]
            T0 = gp.shape[0]
            pad_t = (-T0) % n_sh
            gp_s = jnp.pad(gp, ((0, pad_t), (0, 0), (0, 0))) if pad_t else gp
            counts_s = jnp.pad(counts, (0, pad_t)) if pad_t else counts
            per_shard = gp_s.shape[0] // n_sh

            def _blend_shard(gp_l, counts_l):
                offset = jax.lax.axis_index("tile") * per_shard
                return pallas_blend_offset(gp_l, counts_l, offset, bins.tiles_x, interpret)

            out = _shard_map(
                _blend_shard,
                mesh=tile_shard_mesh,
                in_specs=(_P("tile"), _P("tile")),
                out_specs=_P("tile"),
                check_vma=False,
            )(gp_s, counts_s)[:T0]
        else:
            out = pallas_blend(gp, counts, bins.tiles_x, interpret)  # (T, 8, P)
        rgb = jnp.transpose(out[:, 0:3, :], (0, 2, 1))  # (T, P, 3)
        dep = out[:, 3, :]
        acc = out[:, 4, :]
    else:
        g_mean2d = g[..., 0:2]
        g_conic = g[..., 2:5]
        g_op = jnp.where(bins.valid, g[..., 5], 0.0)
        g_col = g[..., 6:9]
        g_depth = g[..., 9]
        pix = _tile_pixel_coords(bins.tiles_x, bins.tiles_y)
        rgb, dep, acc = blend_tiles(pix, g_mean2d, g_conic, g_op, g_col, g_depth, tile_chunk)

    # (T, P, C) -> (H, W, C) untile
    H, W = cam.height, cam.width
    Hp, Wp = bins.tiles_y * TILE, bins.tiles_x * TILE

    def untile(a):
        c = a.shape[-1] if a.ndim == 3 else 1
        a = a.reshape(bins.tiles_y, bins.tiles_x, TILE, TILE, c)
        a = a.transpose(0, 2, 1, 3, 4).reshape(Hp, Wp, c)
        return a[:H, :W]

    image = untile(rgb) + (1.0 - untile(acc[..., None])) * bg
    # truncation diagnostics, split by which capacity knob fixes them:
    #   overflow_tiles -> raise max_per_tile; overflow_rect -> raise
    #   max_tiles_per_gaussian (the CUDA rasterizer has no such caps — it
    #   duplicates unboundedly; render_auto() escalates to match)
    if ladder_overflow is not None:
        overflow_tiles = ladder_overflow
    else:
        overflow_tiles = jnp.sum(jnp.maximum(bins.count - max_per_tile, 0))
    overflow_rect = (
        bins.overflow if bins.overflow is not None else jnp.zeros((), jnp.int32)
    )
    overflow_budget = (
        bins.overflow_budget if bins.overflow_budget is not None else jnp.zeros((), jnp.int32)
    )
    return dict(
        image=image,
        depth=untile(dep[..., None])[..., 0],
        alpha=untile(acc[..., None])[..., 0],
        radii=proj.radius,
        proj=proj,
        overflow=overflow_tiles + overflow_rect + overflow_budget,
        overflow_tiles=overflow_tiles,
        overflow_rect=overflow_rect,
        overflow_budget=overflow_budget,
        max_count=jnp.max(bins.count),
        tile_counts=bins.count,  # (T,) true hit counts — ladder probing input
    )
