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

from riggs_tpu.camera.camera import Camera
from riggs_tpu.render.binning import TILE, TileBins, bin_gaussians
from riggs_tpu.render.project import Projected, build_cov3d, project_gaussians

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
G_CHUNK = 128


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
        rgb = rgb + jnp.dot(w, col, preferred_element_type=jnp.float32)
        dep = dep + jnp.dot(w, dth, preferred_element_type=jnp.float32)
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
):
    """Fast-path render. Same contract as rasterize_oracle plus overflow count.

    binning='sort' uses the global key-sort binner (fast path);
    binning='dense' the exact dense-mask compaction (oracle-parity reference).
    blend='pallas' runs the fused VMEM-resident Pallas blend kernel with its
    analytic backward; 'jnp' the XLA scan path; 'auto' picks pallas on TPU
    and jnp on CPU (interpret-mode pallas is test-only).
    """
    if blend == "auto":
        blend = "pallas" if jax.devices()[0].platform != "cpu" else "jnp"
    from riggs_tpu.render.binning import bin_gaussians_sorted

    if cov3d is None:
        from riggs_tpu.render.project import build_cov3d_packed

        cov3d = build_cov3d_packed(scales, rotations, scale_modifier)
    max_per_tile = -(-max_per_tile // G_CHUNK) * G_CHUNK  # multiple of the scan chunk
    proj = project_gaussians(cam, means3d, cov3d, alive, mean2d_bias)
    if binning == "sort":
        bins = bin_gaussians_sorted(
            proj, cam.width, cam.height, max_per_tile=max_per_tile,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
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
    g = bins.gather(packed)  # (T, MAX, 10)

    if blend == "pallas":
        from riggs_tpu.render.pallas_blend import pallas_blend, PACK_ROWS

        g_masked = g.at[..., 5].set(jnp.where(bins.valid, g[..., 5], 0.0))
        gp = jnp.concatenate(
            [g_masked, jnp.zeros(g.shape[:2] + (PACK_ROWS - g.shape[-1],), g.dtype)], axis=-1
        )
        gp = jnp.transpose(gp, (0, 2, 1))  # (T, 16, MAX)
        interpret = jax.devices()[0].platform == "cpu"
        counts = jnp.minimum(bins.count, max_per_tile).astype(jnp.int32)
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
    overflow_tiles = jnp.sum(jnp.maximum(bins.count - max_per_tile, 0))
    overflow_rect = (
        bins.overflow if bins.overflow is not None else jnp.zeros((), jnp.int32)
    )
    return dict(
        image=image,
        depth=untile(dep[..., None])[..., 0],
        alpha=untile(acc[..., None])[..., 0],
        radii=proj.radius,
        proj=proj,
        overflow=overflow_tiles + overflow_rect,
        overflow_tiles=overflow_tiles,
        overflow_rect=overflow_rect,
    )
