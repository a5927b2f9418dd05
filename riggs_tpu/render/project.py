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

    Returns the symmetric (N, 3, 3) matrix (compatibility surface; the fast
    path uses build_cov3d_packed).
    """
    R = quat_to_rotmat(rotations)
    S = scales * scale_modifier
    M = R * S[:, None, :]  # R @ diag(S)
    return jnp.einsum("nab,ncb->nac", M, M)


def build_cov3d_packed(scales: jax.Array, rotations: jax.Array, scale_modifier: float = 1.0) -> jax.Array:
    """Packed upper-triangle covariance (N, 6): [c00, c01, c02, c11, c12, c22].

    Struct-of-arrays scalar algebra — every op on (N,) vectors (full 128-lane
    occupancy), no (N, 3, 3) intermediates.
    """
    from riggs_tpu.ops.quaternion import quat_normalize

    q = quat_normalize(rotations)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0 = (scales[:, 0] * scale_modifier) ** 2
    s1 = (scales[:, 1] * scale_modifier) ** 2
    s2 = (scales[:, 2] * scale_modifier) ** 2
    c00 = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    c01 = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    c02 = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    c11 = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    c12 = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    c22 = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return jnp.stack([c00, c01, c02, c11, c12, c22], axis=-1)


def project_gaussians(
    cam: Camera,
    means3d: jax.Array,
    cov3d: jax.Array,
    alive: jax.Array | None = None,
    mean2d_bias: jax.Array | None = None,
) -> Projected:
    """Project all Gaussians; cull those behind the near plane or off screen.

    Written in struct-of-arrays scalar form: (N, 3, 3)/(N, 2, 3) tensor ops
    pad their tiny last dims to the 128-lane register width on TPU (~40x VPU
    waste); explicit per-component algebra keeps every op on (N,) vectors.
    """
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

    # T = J @ W with J = [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]] — rows as
    # six (N,) scalars
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * txz * inv_z2
    j11 = fy * inv_z
    j12 = -fy * tyz * inv_z2
    W = w2c[:3, :3]
    t00 = j00 * W[0, 0] + j02 * W[2, 0]
    t01 = j00 * W[0, 1] + j02 * W[2, 1]
    t02 = j00 * W[0, 2] + j02 * W[2, 2]
    t10 = j11 * W[1, 0] + j12 * W[2, 0]
    t11 = j11 * W[1, 1] + j12 * W[2, 1]
    t12 = j11 * W[1, 2] + j12 * W[2, 2]

    if cov3d.ndim == 3:
        s00 = cov3d[:, 0, 0]
        s01 = cov3d[:, 0, 1]
        s02 = cov3d[:, 0, 2]
        s11 = cov3d[:, 1, 1]
        s12 = cov3d[:, 1, 2]
        s22 = cov3d[:, 2, 2]
    else:  # packed (N, 6) upper triangle
        s00, s01, s02, s11, s12, s22 = (cov3d[:, i] for i in range(6))

    # cov2d = T Sigma T^T (+0.3 I dilation)
    u0 = t00 * s00 + t01 * s01 + t02 * s02
    u1 = t00 * s01 + t01 * s11 + t02 * s12
    u2 = t00 * s02 + t01 * s12 + t02 * s22
    v0 = t10 * s00 + t11 * s01 + t12 * s02
    v1 = t10 * s01 + t11 * s11 + t12 * s12
    v2 = t10 * s02 + t11 * s12 + t12 * s22
    a = u0 * t00 + u1 * t01 + u2 * t02 + 0.3
    b = u0 * t10 + u1 * t11 + u2 * t12
    c = v0 * t10 + v1 * t11 + v2 * t12 + 0.3
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
