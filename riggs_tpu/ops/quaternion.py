"""Quaternion / rotation / dual-quaternion math, batched and jit-friendly.

Convention: quaternions are (w, x, y, z), matching the reference framework's
storage convention (see /root/reference/utils/general_utils.py:137 build_rotation,
/root/reference/utils/dual_quaternion.py). All functions broadcast over leading
batch dimensions; the quaternion axis is the last one.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_normalize(q: jax.Array, eps: float = _EPS) -> jax.Array:
    """Normalize to unit quaternion. q: (..., 4).

    Uses sqrt(|q|^2 + eps^2) so the gradient at q = 0 is zero instead of NaN
    (zero quats appear in dead capacity-padding slots; torch's F.normalize
    also has a benign subgradient there)."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps * eps)
    return q / norm


def quat_conjugate(q: jax.Array) -> jax.Array:
    """(w, x, y, z) -> (w, -x, -y, -z)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b. a, b: (..., 4) broadcastable."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (..., 3) by unit quaternions q (..., 4)."""
    qvec = q[..., 1:]
    uv = jnp.cross(qvec, v)
    uuv = jnp.cross(qvec, uv)
    return v + 2.0 * (q[..., :1] * uv + uuv)


def quat_to_rotmat(q: jax.Array, normalize: bool = True) -> jax.Array:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    if normalize:
        q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0.

    Branch-free Shepperd-style construction (safe under jit): compute all four
    candidate quaternions and pick the numerically best by the largest diagonal
    combination.
    """
    m00 = m[..., 0, 0]
    m11 = m[..., 1, 1]
    m22 = m[..., 2, 2]
    # Four squared magnitudes (up to scale 4): w², x², y², z²
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, _EPS))

    # candidate built from w
    w_w = _safe_sqrt(qw2) * 0.5
    c_w = jnp.stack(
        [
            4.0 * w_w * w_w / 2.0 / jnp.maximum(2.0 * w_w, _EPS),  # = w_w
            (m[..., 2, 1] - m[..., 1, 2]) / jnp.maximum(4.0 * w_w, _EPS),
            (m[..., 0, 2] - m[..., 2, 0]) / jnp.maximum(4.0 * w_w, _EPS),
            (m[..., 1, 0] - m[..., 0, 1]) / jnp.maximum(4.0 * w_w, _EPS),
        ],
        axis=-1,
    )
    # candidate built from x
    x_x = _safe_sqrt(qx2) * 0.5
    c_x = jnp.stack(
        [
            (m[..., 2, 1] - m[..., 1, 2]) / jnp.maximum(4.0 * x_x, _EPS),
            x_x,
            (m[..., 0, 1] + m[..., 1, 0]) / jnp.maximum(4.0 * x_x, _EPS),
            (m[..., 0, 2] + m[..., 2, 0]) / jnp.maximum(4.0 * x_x, _EPS),
        ],
        axis=-1,
    )
    # candidate built from y
    y_y = _safe_sqrt(qy2) * 0.5
    c_y = jnp.stack(
        [
            (m[..., 0, 2] - m[..., 2, 0]) / jnp.maximum(4.0 * y_y, _EPS),
            (m[..., 0, 1] + m[..., 1, 0]) / jnp.maximum(4.0 * y_y, _EPS),
            y_y,
            (m[..., 1, 2] + m[..., 2, 1]) / jnp.maximum(4.0 * y_y, _EPS),
        ],
        axis=-1,
    )
    # candidate built from z
    z_z = _safe_sqrt(qz2) * 0.5
    c_z = jnp.stack(
        [
            (m[..., 1, 0] - m[..., 0, 1]) / jnp.maximum(4.0 * z_z, _EPS),
            (m[..., 0, 2] + m[..., 2, 0]) / jnp.maximum(4.0 * z_z, _EPS),
            (m[..., 1, 2] + m[..., 2, 1]) / jnp.maximum(4.0 * z_z, _EPS),
            z_z,
        ],
        axis=-1,
    )
    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([c_w, c_x, c_y, c_z], axis=-2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0.0, -1.0, 1.0)


def quat_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation between unit quats. t broadcastable scalar in [0,1]."""
    q0 = quat_normalize(q0)
    q1 = quat_normalize(q1)
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0.0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - 1e-7))
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == q0.ndim - 1 else jnp.asarray(t)
    # fall back to lerp for nearly-parallel quats
    use_lerp = sin_theta < 1e-5
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, 1e-12))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, 1e-12))
    return quat_normalize(w0 * q0 + w1 * q1)


# ---------------------------------------------------------------------------
# Dual quaternions (capability parity with reference utils/dual_quaternion.py:
# quat+trans <-> dual quat, DQ blending for skinning).
# A dual quaternion is a pair (q_r, q_d) each (..., 4).
# ---------------------------------------------------------------------------

def qt_to_dq(q: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(rotation quat, translation) -> dual quaternion (q_r, q_d)."""
    q = quat_normalize(q)
    t_quat = jnp.concatenate([jnp.zeros_like(t[..., :1]), t], axis=-1)
    q_d = 0.5 * quat_multiply(t_quat, q)
    return q, q_d


def dq_to_qt(q_r: jax.Array, q_d: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dual quaternion -> (rotation quat, translation)."""
    norm = jnp.linalg.norm(q_r, axis=-1, keepdims=True)
    q_r = q_r / jnp.maximum(norm, _EPS)
    q_d = q_d / jnp.maximum(norm, _EPS)
    t_quat = 2.0 * quat_multiply(q_d, quat_conjugate(q_r))
    return q_r, t_quat[..., 1:]


def dq_blend(q_r: jax.Array, q_d: jax.Array, w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dual-quaternion linear blending.

    q_r, q_d: (..., K, 4) per-bone dual quats; w: (..., K) skinning weights.
    Returns the normalized blended dual quaternion.
    """
    # align hemispheres against the first bone
    ref = q_r[..., :1, :]
    sign = jnp.where(jnp.sum(q_r * ref, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    q_r = q_r * sign
    q_d = q_d * sign
    b_r = jnp.sum(w[..., None] * q_r, axis=-2)
    b_d = jnp.sum(w[..., None] * q_d, axis=-2)
    norm = jnp.linalg.norm(b_r, axis=-1, keepdims=True)
    return b_r / jnp.maximum(norm, _EPS), b_d / jnp.maximum(norm, _EPS)


def dq_apply(q_r: jax.Array, q_d: jax.Array, x: jax.Array) -> jax.Array:
    """Apply a unit dual quaternion rigid transform to points x (..., 3)."""
    _, t = dq_to_qt(q_r, q_d)
    return quat_rotate(q_r, x) + t
