"""Device mesh construction and sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2.2: no torch.distributed,
no NCCL); multi-chip scaling is new, TPU-first design territory:

  * ``data`` axis  — frame parallelism: each chip renders/losses a different
    (camera, time) pair; parameter gradients are all-reduced by XLA (psum over
    ICI) because parameters are replicated while the batch is sharded.
  * ``tile`` axis — pixel parallelism within a frame: the per-tile work lists
    of the rasterizer are sharded along their leading tile axis, so the blend
    runs on disjoint screen regions per chip and only the final image gather
    crosses chips.

Everything is expressed with jax.sharding (Mesh + NamedSharding +
with_sharding_constraint); XLA inserts the collectives.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, tile: int = 1, devices: Sequence | None = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * tile
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(data, tile)
    return Mesh(arr, axis_names=("data", "tile"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    """Leading axis over the data axis (frame batches)."""
    return NamedSharding(mesh, P("data"))


def shard_batch(tree, mesh: Mesh):
    """Place a stacked (leading batch axis) pytree with the batch sharded over
    'data' and everything else replicated."""
    sh = data_sharded(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def constrain_tiles(tree, mesh: Mesh):
    """Inside jit: constrain leading (tile) axes to be sharded over 'tile'."""
    return jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, NamedSharding(mesh, P("tile"))), tree
    )
