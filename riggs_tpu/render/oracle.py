"""Oracle rasterizer: exact, pure-jnp, O(N * pixels).

The correctness reference for the tiled fast path (SURVEY.md §7 step 3). It
reproduces the CUDA rasterizer's per-pixel front-to-back compositing rules
exactly, but vectorized: the sequential early-termination loop becomes a
cumulative product along the depth-sorted Gaussian axis —

  P_i   = prod_{j<=i} (1 - a_j)          (a_j already 1/255-thresholded)
  T_i   = P_{i-1}                         (exclusive)
  w_i   = a_i * T_i * [P_i >= 1e-4]       (the CUDA early-stop condition:
                                           P monotone => break iff P_i < 1e-4)
  color = sum_i w_i c_i ; alpha = sum_i w_i ; image = color + (1-alpha) * bg

which is bit-for-bit the same include/exclude set as the sequential kernel.
Pixels are processed in chunks to bound the (chunk, N) alpha tile.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from riggs_tpu.camera.camera import Camera
from riggs_tpu.render.project import Projected, build_cov3d, project_gaussians

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _pixel_alphas(pix: jax.Array, mean2d: jax.Array, conic: jax.Array, opacity: jax.Array) -> jax.Array:
    """Evaluate splat alphas for a chunk of pixels. pix: (P, 2); returns (P, N)."""
    d = pix[:, None, :] - mean2d[None, :, :]  # (P, N, 2)
    dx, dy = d[..., 0], d[..., 1]
    power = -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy) - conic[None, :, 1] * dx * dy
    alpha = opacity[None, :] * jnp.exp(power)
    alpha = jnp.where(power > 0.0, 0.0, alpha)
    alpha = jnp.minimum(alpha, ALPHA_MAX)
    return jnp.where(alpha < ALPHA_MIN, 0.0, alpha)


def composite(alphas: jax.Array, colors: jax.Array, depths: jax.Array):
    """Front-to-back composite along the last (depth-sorted) axis.

    alphas: (P, N); colors: (N, 3); depths: (N,).
    Returns (rgb (P,3), depth (P,), acc_alpha (P,)).
    """
    one_m = 1.0 - alphas
    P = jnp.cumprod(one_m, axis=-1)
    T = P / one_m  # exclusive cumprod; safe: alpha <= 0.99 so one_m >= 0.01
    include = P >= T_EPS
    w = alphas * T * include
    rgb = w @ colors
    depth = w @ depths
    acc = jnp.sum(w, axis=-1)
    return rgb, depth, acc


def rasterize_oracle(
    cam: Camera,
    means3d: jax.Array,
    colors: jax.Array,
    opacity: jax.Array,
    scales: jax.Array,
    rotations: jax.Array,
    bg: jax.Array,
    alive: jax.Array | None = None,
    scale_modifier: float = 1.0,
    cov3d: jax.Array | None = None,
    pixel_chunk: int = 1024,
    mean2d_bias: jax.Array | None = None,
):
    """Render one view. colors: (N, 3) precomputed RGB; opacity: (N,) activated.

    Returns dict(image (H,W,3), depth (H,W), alpha (H,W), radii (N,), proj).
    """
    if cov3d is None:
        from riggs_tpu.render.project import build_cov3d_packed

        cov3d = build_cov3d_packed(scales, rotations, scale_modifier)
    proj = project_gaussians(cam, means3d, cov3d, alive, mean2d_bias)

    order = jnp.argsort(jnp.where(proj.mask, proj.depth, jnp.inf))
    mean2d_s = proj.mean2d[order]
    conic_s = proj.conic[order]
    depth_s = proj.depth[order]
    op_s = jnp.where(proj.mask, opacity, 0.0)[order]
    col_s = colors[order]

    H, W = cam.height, cam.width
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)  # (H*W, 2)

    npix = H * W
    pad = (-npix) % pixel_chunk
    pixp = jnp.pad(pix, ((0, pad), (0, 0)))
    chunks = pixp.reshape(-1, pixel_chunk, 2)

    def body(pc):
        alphas = _pixel_alphas(pc, mean2d_s, conic_s, op_s)
        return composite(alphas, col_s, depth_s)

    rgb, dep, acc = jax.lax.map(body, chunks)
    rgb = rgb.reshape(-1, 3)[:npix].reshape(H, W, 3)
    dep = dep.reshape(-1)[:npix].reshape(H, W)
    acc = acc.reshape(-1)[:npix].reshape(H, W)
    image = rgb + (1.0 - acc)[..., None] * bg
    return dict(image=image, depth=dep, alpha=acc, radii=proj.radius, proj=proj)
