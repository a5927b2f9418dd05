"""K-nearest-neighbor / chamfer primitives, pure XLA.

TPU-native replacements for the reference's CUDA neighbor ops:
  * ``knn``            <- pytorch3d.ops.knn_points (/root/reference/utils/time_utils.py:950)
  * ``mean_knn_dist2`` <- simple_knn._C.distCUDA2 (/root/reference/scene/gaussian_model.py:170)
  * ``chamfer_distance`` <- pytorch3d.loss.chamfer_distance (/root/reference/train_rig.py:27,313)

Strategy: the query sets here are small on one side (512 nodes, <=200 skeleton
pixels projections) or used once at init (distCUDA2), so exact pairwise
distances + top_k tiles perfectly onto the MXU/VPU; large-N cases are chunked
with lax.map to bound memory. No grid hashing needed at these sizes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pairwise_dist2(x: jax.Array, y: jax.Array) -> jax.Array:
    """Squared euclidean distances. x: (N, D), y: (M, D) -> (N, M).

    Uses the |x|^2 - 2xy + |y|^2 expansion so the cross term is a matmul
    (MXU), with a clamp against negative round-off.
    """
    x2 = jnp.sum(x * x, axis=-1, keepdims=True)
    y2 = jnp.sum(y * y, axis=-1, keepdims=True)
    d2 = x2 - 2.0 * jnp.dot(x, y.T, preferred_element_type=jnp.float32) + y2.T
    return jnp.maximum(d2, 0.0)


def _small_k(d2: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """k smallest entries per row of d2 (N, M), ascending, via k iterative
    (argmin, mask) passes.

    Bit-equal to ``lax.top_k(-d2, k)`` including tie order (argmin picks the
    first minimal index; masking then surfaces the next one), but each pass is
    a bandwidth-bound VPU reduce instead of the sort network top_k lowers to
    on TPU — measured 58.5 -> ~4 ms on the 131k x 512 stage-1 KNN blend
    (round-5 step decomposition)."""
    m = d2.shape[-1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    vals, idxs = [], []
    cur = d2
    for _ in range(k):
        i = jnp.argmin(cur, axis=-1).astype(jnp.int32)
        v = jnp.take_along_axis(cur, i[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(i)
        cur = jnp.where(cols == i[..., None], jnp.inf, cur)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)


# above this k, one sort beats k reduce passes
_ITER_K_MAX = 8


def _row_k(d2: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    if k <= _ITER_K_MAX:
        return _small_k(d2, k)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx


def knn(x: jax.Array, y: jax.Array, k: int, chunk: int = 8192) -> tuple[jax.Array, jax.Array]:
    """For each x, the k nearest points in y.

    Returns (dist2 (N, k), idx (N, k)) sorted ascending by distance.
    Chunked over x to bound the (chunk, M) distance tile.
    """
    n = x.shape[0]
    if n <= chunk:
        return _row_k(pairwise_dist2(x, y), k)

    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xc = xp.reshape(-1, chunk, x.shape[-1])

    def body(xb):
        return _row_k(pairwise_dist2(xb, y), k)

    d2c, idxc = jax.lax.map(body, xc)
    return d2c.reshape(-1, k)[:n], idxc.reshape(-1, k)[:n]


def mean_knn_dist2(points: jax.Array, k: int = 3, chunk: int = 4096) -> jax.Array:
    """Mean squared distance of each point to its k nearest *other* points.

    distCUDA2 equivalent: used once per init to set Gaussian scales
    (scales = log(sqrt(clamp(dist2, 1e-7)))).
    """
    d2, _ = knn(points, points, k + 1, chunk=chunk)  # includes self at d=0
    return jnp.mean(d2[:, 1:], axis=-1)


def chamfer_distance(
    x: jax.Array,
    y: jax.Array,
    x_mask: jax.Array | None = None,
    y_mask: jax.Array | None = None,
    norm: int = 1,
) -> jax.Array:
    """Symmetric chamfer distance between point sets x (N, D) and y (M, D).

    norm=1 uses L1 point distances (the reference's projection loss setting);
    norm=2 uses squared L2. Masks allow static-shape padded point sets: masked
    points neither query nor serve as neighbors.
    """
    diff = x[:, None, :] - y[None, :, :]
    if norm == 1:
        d = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        d = jnp.sum(diff * diff, axis=-1)
    big = jnp.asarray(1e12, d.dtype)
    if y_mask is not None:
        d = jnp.where(y_mask[None, :], d, big)
    dx = jnp.min(d, axis=1)  # (N,) nearest y for each x
    if x_mask is not None:
        dy = jnp.min(jnp.where(x_mask[:, None], d, big), axis=0)
        mean_x = jnp.sum(jnp.where(x_mask, dx, 0.0)) / jnp.maximum(jnp.sum(x_mask), 1)
    else:
        dy = jnp.min(d, axis=0)
        mean_x = jnp.mean(dx)
    if y_mask is not None:
        mean_y = jnp.sum(jnp.where(y_mask, dy, 0.0)) / jnp.maximum(jnp.sum(y_mask), 1)
    else:
        mean_y = jnp.mean(dy)
    return mean_x + mean_y


def ball_query(
    x: jax.Array, y: jax.Array, radius: float, k: int
) -> tuple[jax.Array, jax.Array]:
    """Up to k neighbors of each x within radius in y (pytorch3d.ops.ball_query
    equivalent, /root/reference/utils/deform_utils.py:206). Returns (dist2, idx)
    with idx = -1 and dist2 = inf where no neighbor qualifies."""
    d2, idx = knn(x, y, k)
    ok = d2 <= radius * radius
    return jnp.where(ok, d2, jnp.inf), jnp.where(ok, idx, -1)
