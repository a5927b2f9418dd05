"""Farthest point sampling as a lax.fori_loop (static sample count).

Replaces the reference's torch loop (/root/reference/utils/time_utils.py:461
farthest_point_sample): iteratively pick the point farthest from the chosen
set, tracking a running min-distance array. Supports padded inputs via a
validity mask so it can run inside jit with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sample(
    points: jax.Array,
    num_samples: int,
    mask: jax.Array | None = None,
    init_idx: int | jax.Array = 0,
) -> jax.Array:
    """Sample ``num_samples`` indices from points (N, D) by FPS.

    mask: optional (N,) boolean; masked-out points are never selected.
    Deterministic: starts from ``init_idx`` (the reference seeds with a random
    index; pass one in for that behavior).
    """
    n = points.shape[0]
    valid = jnp.ones(n, bool) if mask is None else mask
    start = jnp.asarray(init_idx, jnp.int32)
    # make sure the start index is valid
    start = jnp.where(valid[start], start, jnp.argmax(valid))

    def body(i, state):
        min_d2, selected = state
        last = selected[i - 1]
        d2 = jnp.sum((points - points[last]) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, d2)
        cand = jnp.where(valid, min_d2, -jnp.inf)
        selected = selected.at[i].set(jnp.argmax(cand).astype(jnp.int32))
        return min_d2, selected

    selected0 = jnp.zeros(num_samples, jnp.int32).at[0].set(start)
    min_d2 = jnp.full(n, jnp.inf)
    _, selected = jax.lax.fori_loop(1, num_samples, body, (min_d2, selected0))
    return selected
