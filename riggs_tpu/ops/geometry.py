"""Geometric primitives: point-to-segment distances, Procrustes rotation fit.

Reference behaviors re-implemented TPU-first:
  * ``point_segment_dist2`` <- line_segment_distance
    (/root/reference/skeleton_utils/skeleton_warp.py:215-238), used for
    distance-to-bone skinning weights.
  * ``fit_rotations``       <- weighted Procrustes with det-flip fix
    (/root/reference/utils/deform_utils.py:123-159 estimate_rotation), used by
    the ARAP losses; batched jnp.linalg.svd is XLA-native (no CUDA batched-SVD
    extension needed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def point_segment_dist2(a: jax.Array, b: jax.Array, points: jax.Array) -> jax.Array:
    """Squared distance from each point to each segment [a_j, b_j].

    a, b: (K, D) segment endpoints; points: (N, D). Returns (N, K).
    """
    ab = b - a  # (K, D)
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-6)  # (K,)
    ap = points[:, None, :] - a[None, :, :]  # (N, K, D)
    t = jnp.sum(ap * ab[None], axis=-1) / denom  # (N, K)
    t = jnp.clip(t, 0.0, 1.0)
    closest = a[None] + t[..., None] * ab[None]  # (N, K, D)
    diff = closest - points[:, None, :]
    return jnp.sum(diff * diff, axis=-1)


def fit_rotations(cov: jax.Array) -> jax.Array:
    """Best-fit rotations from correlation matrices (..., 3, 3).

    Solves the orthogonal Procrustes problem: the R maximizing trace(R^T cov),
    i.e. for cov = sum_k (R p_k) p_k^T the result is R. With cov = U S V^T the
    polar-rotation solution is R = U diag(1, 1, det(U V^T)) V^T (reflection
    fix keeps det(R) = +1).
    """
    u, _, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("...ab,...bc->...ac", u, vt))
    d = jnp.ones(cov.shape[:-2] + (3,), cov.dtype).at[..., -1].set(det)
    return jnp.einsum("...ab,...b,...bc->...ac", u, d, vt)


def safe_norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2 norm with a zero (not NaN) gradient at the origin.

    torch.norm backward returns a 0 subgradient at 0; jnp.linalg.norm returns
    NaN. Training losses that can hit exactly-zero vectors (e.g. the
    acceleration regularizer at MLP init) must use this.
    """
    s = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(s + eps)


def to_homogeneous(x: jax.Array) -> jax.Array:
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def from_homogeneous(x: jax.Array) -> jax.Array:
    return x[..., :3] / x[..., 3:4]
