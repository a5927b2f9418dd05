"""EWA projection of 3D Gaussians to screen space.

The geometry stage of the splatting pipeline, shared by the oracle renderer
and the tiled fast path. Reproduces the math of the CUDA rasterizer the
reference depends on (submodule declared at /root/reference/.gitmodules:1-7;
behavior reconstructed from the call sites in
/root/reference/gaussian_renderer/__init__.py:57-151):

  cov3D = R S S^T R^T                  (quat + log-scales -> world covariance)
  cov2D = J W cov3D W^T J^T + 0.3 I    (perspective-Jacobian EWA, dilation)
  conic = inverse(cov2D)
  radius = ceil(3 * sqrt(max eigenvalue))
  alpha(px) = opacity * exp(-0.5 d^T conic d)

Everything is batched over all N Gaussians in a handful of fused VPU ops —
there is no per-Gaussian control flow, invisible Gaussians are masked.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from riggs_tpu.camera.camera import Camera
from riggs_tpu.ops.quaternion import quat_to_rotmat


class Projected(NamedTuple):
    """Screen-space Gaussians (all arrays length N)."""

    mean2d: jax.Array  # (N, 2) pixel coords
    depth: jax.Array  # (N,) view-space z
    conic: jax.Array  # (N, 3) upper-triangular inverse 2D covariance (a, b, c)
    radius: jax.Array  # (N,) float screen radius (3 sigma)
    mask: jax.Array  # (N,) visible & valid


def build_cov3d(scales: jax.Array, rotations: jax.Array, scale_modifier: float = 1.0) -> jax.Array:
    """World covariance from activated scales (N,3) and unit quats (N,4).

    Returns the symmetric (N, 3, 3) matrix (the reference packs 6 uniques;
    we keep 3x3 — XLA fuses either way).
    """
    R = quat_to_rotmat(rotations)
    S = scales * scale_modifier
    M = R * S[:, None, :]  # R @ diag(S)
    return jnp.einsum("nab,ncb->nac", M, M)


def project_gaussians(
    cam: Camera,
    means3d: jax.Array,
    cov3d: jax.Array,
    alive: jax.Array | None = None,
    mean2d_bias: jax.Array | None = None,
) -> Projected:
    """Project all Gaussians; cull those behind the near plane or off screen."""
    f32 = jnp.float32
    w2c = cam.w2c.astype(f32)
    view = means3d @ w2c[:3, :3].T + w2c[:3, 3]  # (N, 3)
    tx, ty, tz = view[:, 0], view[:, 1], view[:, 2]
    fx, fy = cam.intrinsics[0], cam.intrinsics[1]
    cx, cy = cam.intrinsics[2], cam.intrinsics[3]

    in_front = tz > 0.2  # matches the CUDA near-culling threshold
    tz_safe = jnp.maximum(tz, 1e-6)

    # frustum clamp of the Jacobian evaluation point (1.3x fov guard band)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    txz = jnp.clip(tx / tz_safe, -limx, limx) * tz_safe
    tyz = jnp.clip(ty / tz_safe, -limy, limy) * tz_safe

    # perspective Jacobian rows (2x3), J = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    J = jnp.stack(
        [
            jnp.stack([fx * inv_z, jnp.zeros_like(tz), -fx * txz * inv_z2], -1),
            jnp.stack([jnp.zeros_like(tz), fy * inv_z, -fy * tyz * inv_z2], -1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    W = w2c[:3, :3]
    T = jnp.einsum("nab,bc->nac", J, W)  # (N, 2, 3)
    cov2d = jnp.einsum("nab,nbc,ndc->nad", T, cov3d, T)  # (N, 2, 2)
    # low-pass dilation: ensure each splat covers ~a pixel
    cov2d = cov2d + 0.3 * jnp.eye(2, dtype=f32)

    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1]
    det = a * c - b * b
    det_ok = det > 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.maximum(det, 1e-12), 0.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], -1)

    mid = 0.5 * (a + c)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    mean2d = jnp.stack(
        [fx * tx * inv_z + cx - 0.5, fy * ty * inv_z + cy - 0.5], -1
    )
    if mean2d_bias is not None:
        # zeros passed by the caller; its gradient cotangent is dL/d(mean2d),
        # feeding the densification statistics (replaces torch retain_grad on
        # the dummy screenspace_points tensor).
        mean2d = mean2d + mean2d_bias

    on_screen = (
        (mean2d[:, 0] + radius > 0)
        & (mean2d[:, 0] - radius < cam.width)
        & (mean2d[:, 1] + radius > 0)
        & (mean2d[:, 1] - radius < cam.height)
    )
    mask = in_front & det_ok & on_screen
    if alive is not None:
        mask = mask & alive
    return Projected(
        mean2d=mean2d,
        depth=tz,
        conic=conic,
        radius=jnp.where(mask, radius, 0.0),
        mask=mask,
    )
