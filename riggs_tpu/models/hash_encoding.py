"""Multi-resolution hash-grid encoding + hash deform network.

JAX equivalent of the reference's optional tinycudann path
(/root/reference/utils/time_utils.py:517-767 HashDeformNetwork with
ProgressiveBandHashGrid): L levels of hashed feature grids with trilinear
interpolation (instant-ngp construction), coarse-to-fine level masking, and a
compact MLP producing the deformation heads. Not used by any published
reference config (SURVEY.md §2.1) but part of the capability surface.

The table lookups are gathers of (8 corners x L levels) feature rows — on
TPU these vectorize over N points; tables live in HBM as (L, T, F) arrays.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.models.mlp import linear_apply, linear_init, mlp_hidden, mlp_init, positional_embed, embed_dim

_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)


@dataclasses.dataclass(frozen=True)
class HashGridDef:
    n_levels: int = 16
    log2_table: int = 17
    features: int = 2
    base_res: int = 16
    max_res: int = 512
    in_dim: int = 3

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table

    @property
    def growth(self) -> float:
        if self.n_levels == 1:
            return 1.0
        return float(np.exp(np.log(self.max_res / self.base_res) / (self.n_levels - 1)))

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.features


def init_hash_grid(key: jax.Array, grid: HashGridDef) -> jax.Array:
    """(L, T, F) tables, uniform +-1e-4 (instant-ngp init)."""
    return jax.random.uniform(
        key, (grid.n_levels, grid.table_size, grid.features), minval=-1e-4, maxval=1e-4
    )


def hash_encode(
    tables: jax.Array,
    grid: HashGridDef,
    x: jax.Array,
    bbox_min: jax.Array | float = 0.0,
    bbox_max: jax.Array | float = 1.0,
    level_mask: jax.Array | None = None,
) -> jax.Array:
    """x: (N, D<=3) -> (N, L*F) hashed trilinear features."""
    xn = jnp.clip((x - bbox_min) / (bbox_max - bbox_min), 0.0, 1.0)
    D = grid.in_dim
    n = xn.shape[0]
    outs = []
    corners = np.stack(np.meshgrid(*([np.arange(2)] * D), indexing="ij"), -1).reshape(-1, D)
    primes = jnp.asarray(_PRIMES[:D].astype(np.int64)).astype(jnp.uint32)
    for l in range(grid.n_levels):
        res = int(np.floor(grid.base_res * grid.growth**l))
        pos = xn * res
        p0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - p0
        feat = jnp.zeros((n, grid.features))
        for corner in corners:
            cp = p0 + jnp.asarray(corner, jnp.int32)
            h = jnp.zeros(n, jnp.uint32)
            for d in range(D):
                h = h ^ (cp[:, d].astype(jnp.uint32) * primes[d])
            idx = (h % grid.table_size).astype(jnp.int32)
            w = jnp.prod(
                jnp.where(jnp.asarray(corner, bool)[None, :], frac, 1.0 - frac), axis=-1
            )
            feat = feat + w[:, None] * tables[l, idx]
        outs.append(feat)
    enc = jnp.stack(outs, axis=1)  # (N, L, F)
    if level_mask is not None:
        enc = enc * level_mask[None, :, None]
    return enc.reshape(n, -1)


def progressive_level_mask(n_levels: int, step: int, start_level: int = 4, steps_per_level: int = 500) -> np.ndarray:
    """Coarse-to-fine unlock: level l active once step >= (l-start)*steps."""
    active = start_level + step // max(steps_per_level, 1)
    return (np.arange(n_levels) < active).astype(np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HashDeformNetwork:
    tables: jax.Array
    mlp: Any
    heads: Any  # dict of linear heads
    bbox_min: jax.Array
    bbox_max: jax.Array
    grid: HashGridDef = dataclasses.field(metadata=dict(static=True))
    t_multires: int = dataclasses.field(default=6, metadata=dict(static=True))
    width: int = dataclasses.field(default=64, metadata=dict(static=True))
    depth: int = dataclasses.field(default=2, metadata=dict(static=True))

    def params_dict(self):
        return {"tables": self.tables, "mlp": self.mlp, "heads": self.heads}

    def replace_params(self, p):
        return dataclasses.replace(self, tables=p["tables"], mlp=p["mlp"], heads=p["heads"])


def init_hash_deform(
    key: jax.Array,
    bbox_min=-1.5,
    bbox_max=1.5,
    grid: HashGridDef | None = None,
    t_multires: int = 6,
    width: int = 64,
    depth: int = 2,
) -> HashDeformNetwork:
    grid = grid or HashGridDef()
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    d_in = grid.out_dim + embed_dim(1, t_multires)
    mlp = mlp_init(k2, d_in, width, 0, depth, skips=(), hidden_kind="kaiming")
    mlp.pop("head")
    heads = {
        "warp": linear_init(k3, width, 3, kind="normal", std=1e-5),
        "scaling": linear_init(k4, width, 3, kind="normal", std=1e-8),
        "rotation": linear_init(k5, width, 4, kind="normal", std=1e-5),
    }
    return HashDeformNetwork(
        tables=init_hash_grid(k1, grid),
        mlp=mlp,
        heads=heads,
        bbox_min=jnp.asarray(bbox_min, jnp.float32),
        bbox_max=jnp.asarray(bbox_max, jnp.float32),
        grid=grid,
        t_multires=t_multires,
        width=width,
        depth=depth,
    )


def apply_hash_deform(net: HashDeformNetwork, x: jax.Array, t: jax.Array, level_mask=None) -> dict:
    t = jnp.asarray(t)
    if t.ndim == 0:
        t = jnp.broadcast_to(t, (x.shape[0], 1))
    enc = hash_encode(net.tables, net.grid, x, net.bbox_min, net.bbox_max, level_mask)
    t_emb = positional_embed(t, net.t_multires)
    h = mlp_hidden(net.mlp, jnp.concatenate([enc, t_emb], axis=-1), skips=())
    return {
        "d_xyz": linear_apply(net.heads["warp"], h),
        "d_rotation": linear_apply(net.heads["rotation"], h),
        "d_scaling": linear_apply(net.heads["scaling"], h),
        "d_opacity": None,
        "d_color": None,
        "hidden": h,
    }
