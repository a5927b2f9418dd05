"""SO(3)/SE(3) exponential and logarithm maps.

Parity with /root/reference/utils/rigid_utils.py (exp_so3 / exp_se3 and the
homogeneous helpers; the exp maps back the 'mlp' deform type's optional 6-DoF
parameterization). Batched, jit-safe near the identity (Taylor guards).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from riggs_tpu.ops.geometry import from_homogeneous, to_homogeneous  # noqa: F401 (re-export)


def skew(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
        ],
        axis=-2,
    )


def exp_so3(w: jax.Array, theta: jax.Array | None = None) -> jax.Array:
    """Rodrigues: axis-angle (..., 3) -> rotation matrix (..., 3, 3)."""
    if theta is None:
        theta = jnp.linalg.norm(w, axis=-1)
        w = w / jnp.maximum(theta[..., None], 1e-12)
    W = skew(w)
    th = theta[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3), W.shape)
    return eye + jnp.sin(th) * W + (1.0 - jnp.cos(th)) * (W @ W)


def exp_se3(S: jax.Array) -> jax.Array:
    """Twist (..., 6) = (w, v) -> homogeneous transform (..., 4, 4).

    Pure-translation-safe: the V-matrix coefficients use their Taylor limits
    as |w| -> 0 so t -> v exactly."""
    w, v = S[..., :3], S[..., 3:]
    theta = jnp.linalg.norm(w, axis=-1)
    th_safe = jnp.maximum(theta, 1e-12)
    wn = w / th_safe[..., None]
    W = skew(wn)
    th = theta[..., None, None]
    small = th < 1e-6
    eye = jnp.broadcast_to(jnp.eye(3), W.shape)
    R = eye + jnp.sin(th) * W + (1.0 - jnp.cos(th)) * (W @ W)
    a = jnp.where(small, th / 2.0, (1.0 - jnp.cos(th)) / jnp.maximum(th, 1e-12))
    b = jnp.where(small, th * th / 6.0, (th - jnp.sin(th)) / jnp.maximum(th, 1e-12))
    A = eye + a * W + b * (W @ W)
    t = jnp.einsum("...ab,...b->...a", A, v)
    out = jnp.zeros(S.shape[:-1] + (4, 4), S.dtype)
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3].set(t)
    out = out.at[..., 3, 3].set(1.0)
    return out


def log_so3(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3)."""
    tr = jnp.clip((R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(tr)
    s = jnp.where(jnp.abs(jnp.sin(theta)) < 1e-7, 1.0, 2.0 * jnp.sin(theta))
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    ) / s[..., None]
    return w * theta[..., None]
