"""Camera model: extrinsics + pinhole intrinsics as a jit-friendly pytree.

Equivalent capability to the reference Camera (/root/reference/scene/cameras.py:18)
and projection builders (/root/reference/utils/graphics_utils.py:34-100), but
designed TPU-first: a camera is a flat pytree of arrays (stackable into
struct-of-arrays batches for frame-parallel sharding), and projection is done
directly with (fx, fy, cx, cy) pinhole math instead of chained 4x4 NDC
matrices. The reference's NDC + viewport convention reduces to

    pix = f * (x_view / z_view) + c - 0.5,   c = (W/2, H/2) by default

(derived from its getProjectionMatrix / from_K + the rasterizer's
((ndc+1)*S-1)/2 viewport transform), which this module reproduces exactly.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """One camera (or a leading-batch of cameras when arrays carry a batch dim).

    w2c:  (4, 4) world-to-camera (column-vector convention: x_cam = w2c @ x_w).
    intrinsics: (4,) = (fx, fy, cx, cy) in pixels.
    fid:  () normalized frame time in [0, 1].
    width/height/znear/zfar are static (hashable) metadata.
    """

    w2c: jax.Array
    intrinsics: jax.Array
    fid: jax.Array
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    znear: float = dataclasses.field(default=0.01, metadata=dict(static=True))
    zfar: float = dataclasses.field(default=100.0, metadata=dict(static=True))

    @property
    def fx(self):
        return self.intrinsics[..., 0]

    @property
    def fy(self):
        return self.intrinsics[..., 1]

    @property
    def cx(self):
        return self.intrinsics[..., 2]

    @property
    def cy(self):
        return self.intrinsics[..., 3]

    @property
    def tanfovx(self):
        return 0.5 * self.width / self.fx

    @property
    def tanfovy(self):
        return 0.5 * self.height / self.fy


def make_camera(
    R: np.ndarray,
    T: np.ndarray,
    width: int,
    height: int,
    fovx: float | None = None,
    fovy: float | None = None,
    K: np.ndarray | None = None,
    fid: float = 0.0,
    znear: float = 0.01,
    zfar: float = 100.0,
) -> Camera:
    """Build a Camera from the reference's (R, T) convention.

    R is the camera-to-world rotation (stored transposed in w2c, matching
    getWorld2View2), T the world-to-camera translation.
    """
    w2c = np.zeros((4, 4), dtype=np.float32)
    w2c[:3, :3] = np.asarray(R, np.float32).T
    w2c[:3, 3] = np.asarray(T, np.float32)
    w2c[3, 3] = 1.0
    if K is not None:
        intr = np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], np.float32)
    else:
        assert fovx is not None and fovy is not None
        intr = np.array(
            [fov2focal(fovx, width), fov2focal(fovy, height), width / 2.0, height / 2.0],
            np.float32,
        )
    return Camera(
        w2c=jnp.asarray(w2c),
        intrinsics=jnp.asarray(intr),
        fid=jnp.asarray(fid, jnp.float32),
        width=int(width),
        height=int(height),
        znear=float(znear),
        zfar=float(zfar),
    )


def world_to_view(w2c: jax.Array, points: jax.Array) -> jax.Array:
    """Transform world points (N, 3) to view space with w2c (4, 4)."""
    return points @ w2c[:3, :3].T + w2c[:3, 3]


def project_points(cam: Camera, points: jax.Array) -> tuple[jax.Array, jax.Array]:
    """World points (N, 3) -> pixel coordinates (N, 2) (x, y) and view depth (N,)."""
    view = world_to_view(cam.w2c, points)
    z = view[..., 2]
    f = cam.intrinsics[:2]
    c = cam.intrinsics[2:]
    pix = view[..., :2] * f / jnp.maximum(z, 1e-6)[..., None] + c - 0.5
    return pix, z


def camera_center(cam: Camera) -> jax.Array:
    """World-space camera position: -R^T t of the w2c transform."""
    return -cam.w2c[:3, :3].T @ cam.w2c[:3, 3]


def depth2normal(cam: Camera, depth: jax.Array) -> jax.Array:
    """Per-pixel normals from a depth map via central differences of the
    backprojected point cloud (reference utils/other_utils.py:78 depth2normal).
    depth: (H, W) view-space z -> (H, W, 3) unit normals in view space."""
    H, W = depth.shape
    fx, fy, cx, cy = cam.intrinsics
    xs = (jnp.arange(W, dtype=jnp.float32) - cx + 0.5) / fx
    ys = (jnp.arange(H, dtype=jnp.float32) - cy + 0.5) / fy
    pts = jnp.stack(
        [xs[None, :] * depth, ys[:, None] * depth, depth], axis=-1
    )  # (H, W, 3) view-space positions
    dx = jnp.gradient(pts, axis=1)
    dy = jnp.gradient(pts, axis=0)
    n = jnp.cross(dx, dy)
    return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)


def project_nodes_2d(cam: Camera, nodes: jax.Array) -> jax.Array:
    """Project nodes to (row, col) pixel coordinates for the thinned-skeleton
    chamfer loss. Matches /root/reference/utils/other_utils.py:101-127 exactly:
    principal point at S/2 (no half-pixel shift) and (y, x) ordering to align
    with np.argwhere of the thinned mask."""
    view = world_to_view(cam.w2c, nodes)
    z = jnp.maximum(view[..., 2], 1e-6)
    px = cam.intrinsics[0] * view[..., 0] / z + cam.intrinsics[2]
    py = cam.intrinsics[1] * view[..., 1] / z + cam.intrinsics[3]
    return jnp.stack([py, px], -1)
