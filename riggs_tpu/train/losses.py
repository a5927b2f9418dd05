"""Photometric losses and image metrics, pure jnp.

Behavior parity with /root/reference/utils/loss_utils.py (l1/l2/kl, 11x11
gaussian-window SSIM with same-padding) and /root/reference/utils/
image_utils.py:30 (PSNR over flattened per-image MSE). Images are (H, W, C)
or batched (B, H, W, C); SSIM's depthwise convolution maps to
lax.conv_general_dilated with feature_group_count = C, which XLA lowers to
MXU-friendly convs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(x - y))


def l2_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean((x - y) ** 2)


def psnr(img: jax.Array, gt: jax.Array) -> jax.Array:
    """PSNR with per-image MSE (matches the reference's view-flattened mean)."""
    mse = jnp.mean((img - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise_conv_same(img: jax.Array, window: jax.Array) -> jax.Array:
    """img: (B, H, W, C); window: (k, k). Same-padding depthwise conv."""
    c = img.shape[-1]
    k = window.shape[0]
    kernel = jnp.tile(window[:, :, None, None], (1, 1, 1, c))  # (k, k, 1, C)
    return jax.lax.conv_general_dilated(
        img,
        kernel,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """Windowed SSIM, averaged. Accepts (H, W, C) or (B, H, W, C) in [0, 1]."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    w = jnp.asarray(_gaussian_window(window_size))
    mu1 = _depthwise_conv_same(img1, w)
    mu2 = _depthwise_conv_same(img2, w)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _depthwise_conv_same(img1 * img1, w) - mu1_sq
    s2 = _depthwise_conv_same(img2 * img2, w) - mu2_sq
    s12 = _depthwise_conv_same(img1 * img2, w) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return jnp.mean(ssim_map)


def photometric_loss(
    img: jax.Array, gt: jax.Array, lambda_dssim: float = 0.2
) -> jax.Array:
    """The standard 3DGS objective: (1-l)*L1 + l*(1 - SSIM)."""
    return (1.0 - lambda_dssim) * l1_loss(img, gt) + lambda_dssim * (1.0 - ssim(img, gt))


def kl_divergence(rho: float, rho_hat_logits: jax.Array) -> jax.Array:
    rho_hat = jnp.mean(jax.nn.sigmoid(rho_hat_logits), axis=0)
    rho = jnp.full_like(rho_hat, rho)
    return jnp.mean(
        rho * jnp.log(rho / (rho_hat + 1e-5))
        + (1.0 - rho) * jnp.log((1.0 - rho) / (1.0 - rho_hat + 1e-5))
    )
