"""Photometric losses and image metrics, pure jnp.

Behavior parity with /root/reference/utils/loss_utils.py (l1/l2/kl, 11x11
gaussian-window SSIM with same-padding) and /root/reference/utils/
image_utils.py:30 (PSNR over flattened per-image MSE). Images are (H, W, C)
or batched (B, H, W, C); SSIM's separable gaussian blur is applied as two
banded-matrix contractions (MXU matmuls) — an 11-tap depthwise conv lowers
to a slow VPU shuffle chain on TPU (round-5 step decomposition: ~52 ms ->
sub-ms for SSIM's five blurs at 800²).
"""
from __future__ import annotations

from functools import lru_cache, partial

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


@lru_cache(maxsize=8)
def _band_matrix(n: int, window_size: int, sigma: float) -> np.ndarray:
    """(n, n) banded matrix of the 1D gaussian with zero ('same') padding:
    row i holds g[j - i + r] for |j - i| <= r. Left-multiplying convolves a
    column axis with exactly the semantics of a zero-padded depthwise conv."""
    x = np.arange(window_size) - window_size // 2
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    g = (g / g.sum()).astype(np.float32)
    r = window_size // 2
    T = np.zeros((n, n), np.float32)
    for o in range(-r, r + 1):
        if abs(o) >= n:  # window wider than the image (ms-ssim tail scales)
            continue
        d = np.full(n - abs(o), g[o + r], np.float32)
        T += np.diag(d, k=o)
    return T


def _depthwise_conv_same(img: jax.Array, window_size: int = 11, sigma: float = 1.5) -> jax.Array:
    """img: (B, H, W, C) -> zero-padded gaussian blur, as two MXU matmuls.

    The gaussian window is separable, and an 11-tap depthwise conv lowers to
    a VPU shuffle-multiply chain on TPU (measured ~52 ms fwd+bwd for SSIM's
    five blurs at 800² — round-5 step decomposition). Contracting with banded
    (H, H)/(W, W) matrices instead runs on the MXU: ~1.5 GFLOP per blur,
    sub-ms, numerically the same zero-padded convolution."""
    h, w = img.shape[1], img.shape[2]
    Th = jnp.asarray(_band_matrix(h, window_size, sigma))
    Tw = jnp.asarray(_band_matrix(w, window_size, sigma))
    out = jnp.einsum("hH,bHwc->bhwc", Th, img, preferred_element_type=jnp.float32)
    return jnp.einsum("wW,bhWc->bhwc", Tw, out, preferred_element_type=jnp.float32)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """Windowed SSIM, averaged. Accepts (H, W, C) or (B, H, W, C) in [0, 1]."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    mu1 = _depthwise_conv_same(img1, window_size)
    mu2 = _depthwise_conv_same(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # E[x^2] - mu^2 cancels catastrophically in f32 when the render contains
    # large HDR transients (post-clone/opacity-reset pixels >> 1): variances
    # land NEGATIVE at magnitudes >> C2 and the ratio of two negatives pushes
    # SSIM past 1 (observed as a negative total loss in the round-5 refpoint
    # run; the reference's torch SSIM has the identical hazard, merely
    # unobserved). Clamp variances at 0 — exact in exact arithmetic, inert on
    # in-range images.
    s1 = jnp.maximum(_depthwise_conv_same(img1 * img1, window_size) - mu1_sq, 0.0)
    s2 = jnp.maximum(_depthwise_conv_same(img2 * img2, window_size) - mu2_sq, 0.0)
    s12 = _depthwise_conv_same(img1 * img2, window_size) - mu1_mu2
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
