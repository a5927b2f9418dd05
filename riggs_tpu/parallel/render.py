"""Tile-parallel (pixel-sharded) rendering: one frame across many chips.

The second multi-chip axis from SURVEY.md §2.2: Gaussians stay replicated
(N<=150k ~ 50MB fp32 fits per chip), the per-tile work lists are sharded over
the mesh's 'tile' axis, and each chip runs the fused Pallas blend on its own
screen region (shard_map; the kernel receives its shard's global tile offset
through the scalar-prefetch channel). Only the final image assembly crosses
chips. Gradients of the replicated Gaussian parameters are psum'd by
shard_map's reverse-mode transfer of the replicated->sharded broadcast.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from riggs_tpu.camera.camera import Camera
from riggs_tpu.render.binning import TILE, bin_gaussians_sorted
from riggs_tpu.render.pallas_blend import PACK_ROWS, pallas_blend_offset
from riggs_tpu.render.project import build_cov3d_packed, project_gaussians
from riggs_tpu.render.tiles import G_CHUNK


def rasterize_tile_sharded(
    mesh: Mesh,
    cam: Camera,
    means3d: jax.Array,
    colors: jax.Array,
    opacity: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    bg: jax.Array,
    alive: jax.Array | None = None,
    max_per_tile: int = 1024,
    interpret: bool | None = None,
):
    """Single-frame render with tiles sharded over mesh axis 'tile'.

    The tile count is padded to a multiple of the axis size; projection and
    binning are computed replicated (cheap vs the blend), the packed per-tile
    data is shard-constrained, and the blend runs per-shard via shard_map.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    n_shards = mesh.shape["tile"]
    max_per_tile = -(-max_per_tile // G_CHUNK) * G_CHUNK

    cov3d = build_cov3d_packed(scales, rotations)
    proj = project_gaussians(cam, means3d, cov3d, alive)
    bins = bin_gaussians_sorted(proj, cam.width, cam.height, max_per_tile=max_per_tile)
    T = bins.idx.shape[0]
    pad_t = (-T) % n_shards

    op_masked = jnp.where(proj.mask, opacity, 0.0)
    packed = jnp.concatenate(
        [proj.mean2d, proj.conic, op_masked[:, None], colors, proj.depth[:, None]], axis=-1
    )
    g = bins.gather(packed)
    g = g.at[..., 5].set(jnp.where(bins.valid, g[..., 5], 0.0))
    gp = jnp.concatenate([g, jnp.zeros(g.shape[:2] + (PACK_ROWS - 10,), g.dtype)], axis=-1)
    gp = jnp.transpose(gp, (0, 2, 1))  # (T, 16, MAX)
    counts = jnp.minimum(bins.count, max_per_tile).astype(jnp.int32)
    if pad_t:
        gp = jnp.pad(gp, ((0, pad_t), (0, 0), (0, 0)))
        counts = jnp.pad(counts, (0, pad_t))
    per_shard = gp.shape[0] // n_shards

    def shard_fn(gp_l, counts_l):
        offset = jax.lax.axis_index("tile") * per_shard
        return pallas_blend_offset(gp_l, counts_l, offset, bins.tiles_x, interpret)

    out = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("tile"), P("tile")),
        out_specs=P("tile"),
        check_vma=False,
    )(gp, counts)  # (T_pad, 8, P)
    out = out[:T]

    rgb = jnp.transpose(out[:, 0:3, :], (0, 2, 1))
    dep = out[:, 3, :]
    acc = out[:, 4, :]

    H, W = cam.height, cam.width
    Hp, Wp = bins.tiles_y * TILE, bins.tiles_x * TILE

    def untile(a):
        c = a.shape[-1] if a.ndim == 3 else 1
        a = a.reshape(bins.tiles_y, bins.tiles_x, TILE, TILE, c)
        a = a.transpose(0, 2, 1, 3, 4).reshape(Hp, Wp, c)
        return a[:H, :W]

    image = untile(rgb) + (1.0 - untile(acc[..., None])) * bg
    return dict(
        image=image,
        depth=untile(dep[..., None])[..., 0],
        alpha=untile(acc[..., None])[..., 0],
        radii=proj.radius,
        overflow=jnp.sum(jnp.maximum(bins.count - max_per_tile, 0)) + bins.overflow,
    )
