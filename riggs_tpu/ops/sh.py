"""Real spherical harmonics for view-dependent Gaussian color.

Hardcoded real SH bases for degrees 0..3 (16 coefficients), the range used by
3DGS-style models (reference: /root/reference/utils/sh_utils.py:57-120 supports
deg<=4 but the models use sh_degree=3). Colors are stored as SH coefficients
per channel; ``eval_sh`` evaluates along unit view directions and the caller
adds 0.5 and clamps to >= 0 (the 3DGS convention).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def sh_dim(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(degree: int, sh: jax.Array, dirs: jax.Array) -> jax.Array:
    """Evaluate SH colors.

    Args:
      degree: active SH degree (0..3); static.
      sh: (..., K, C) coefficients with K >= (degree+1)^2.
      dirs: (..., 3) unit directions.
    Returns: (..., C).
    """
    result = C0 * sh[..., 0, :]
    if degree >= 1:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (
            result
            - C1 * y * sh[..., 1, :]
            + C1 * z * sh[..., 2, :]
            - C1 * x * sh[..., 3, :]
        )
        if degree >= 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + C2[0] * xy * sh[..., 4, :]
                + C2[1] * yz * sh[..., 5, :]
                + C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + C2[3] * xz * sh[..., 7, :]
                + C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if degree >= 3:
                result = (
                    result
                    + C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + C3[1] * xy * z * sh[..., 10, :]
                    + C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                    + C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
    return result


def eval_sh_dyn(sh: jax.Array, dirs: jax.Array, active_degree: jax.Array) -> jax.Array:
    """``eval_sh`` with a *traced* active degree.

    Evaluates the full degree implied by the coefficient count and zeroes the
    bands above ``active_degree`` — numerically identical to
    ``eval_sh(active_degree, ...)`` (truncation == zero-weighting) but one
    compiled program for the whole SH warmup schedule, instead of one
    recompile of the enclosing training step per degree bump
    (reference oneupSHdegree, train_gui.py:1001).
    """
    K = sh.shape[-2]
    max_degree = int(round(K**0.5)) - 1
    band = jnp.floor(jnp.sqrt(jnp.arange(K, dtype=jnp.float32) + 0.5)).astype(jnp.int32)
    mask = (band <= active_degree).astype(sh.dtype)
    return eval_sh(max_degree, sh * mask[:, None], dirs)


def rgb_to_sh_dc(rgb: jax.Array) -> jax.Array:
    """RGB in [0,1] -> DC SH coefficient."""
    return (rgb - 0.5) / C0


def sh_dc_to_rgb(sh_dc: jax.Array) -> jax.Array:
    return sh_dc * C0 + 0.5
