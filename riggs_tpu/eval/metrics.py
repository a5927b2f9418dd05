"""Image quality metrics: PSNR, SSIM, MS-SSIM, LPIPS (JAX).

Metric surface parity with the reference evaluation stack
(/root/reference/train_utils.py:101-106, render_rig.py:165-169,
utils/image_utils.py:14-36): PSNR, windowed SSIM, MS-SSIM, LPIPS (alex & vgg).

MS-SSIM is the standard 5-scale variant (pytorch_msssim semantics). LPIPS is
implemented natively (AlexNet / VGG16 feature stacks + learned linear heads);
pretrained weights cannot be downloaded in this zero-egress environment, so
``LpipsModel.from_torch_file`` imports a torch checkpoint when the user
provides one and ``lpips_*`` report None otherwise (documented degradation —
the architecture and tests are in place).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.train.losses import psnr, ssim, _depthwise_conv_same

__all__ = ["psnr", "ssim", "ms_ssim", "LpipsModel", "evaluate_image"]

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _avg_pool2(img: jax.Array) -> jax.Array:
    """2x2 average pool with stride 2 (NHWC)."""
    return jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def _ssim_cs(img1, img2, window_size=11):
    mu1 = _depthwise_conv_same(img1, window_size)
    mu2 = _depthwise_conv_same(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    # variance clamp: see train.losses.ssim (f32 cancellation on HDR pixels)
    s1 = jnp.maximum(_depthwise_conv_same(img1 * img1, window_size) - mu1_sq, 0.0)
    s2 = jnp.maximum(_depthwise_conv_same(img2 * img2, window_size) - mu2_sq, 0.0)
    s12 = _depthwise_conv_same(img1 * img2, window_size) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    cs = (2 * s12 + C2) / (s1 + s2 + C2)
    ssim_map = ((2 * mu1_mu2 + C1) / (mu1_sq + mu2_sq + C1)) * cs
    return jnp.mean(ssim_map), jnp.mean(cs)


def ms_ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11) -> jax.Array:
    """Multi-scale SSIM over 5 dyadic scales. Accepts (H,W,C) or (B,H,W,C)."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    vals = []
    for i in range(len(_MSSSIM_WEIGHTS)):
        s, cs = _ssim_cs(img1, img2, window_size)
        vals.append(s if i == len(_MSSSIM_WEIGHTS) - 1 else cs)
        if i < len(_MSSSIM_WEIGHTS) - 1:
            img1, img2 = _avg_pool2(img1), _avg_pool2(img2)
    vals = jnp.stack(vals)
    return jnp.prod(jnp.maximum(vals, 1e-6) ** weights)


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------

_IMAGENET_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_IMAGENET_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (out_channels, kernel, stride, pad) per conv; 'M' = maxpool
_ALEX_CFG = [(64, 11, 4, 2), "M", (192, 5, 1, 2), "M", (384, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1)]
_ALEX_TAPS = [0, 1, 2, 3, 4]  # conv indices whose relu output feeds LPIPS (relu1..relu5)
_VGG_CFG = [
    (64, 3, 1, 1), (64, 3, 1, 1), "M",
    (128, 3, 1, 1), (128, 3, 1, 1), "M",
    (256, 3, 1, 1), (256, 3, 1, 1), (256, 3, 1, 1), "M",
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1), "M",
    (512, 3, 1, 1), (512, 3, 1, 1), (512, 3, 1, 1),
]
_VGG_TAPS = [1, 3, 6, 9, 12]


@dataclasses.dataclass
class LpipsModel:
    """Feature-distance perceptual metric. params: conv kernels + linear heads."""

    net: str  # 'alex' | 'vgg'
    convs: list  # [{'w': (kh,kw,cin,cout), 'b': (cout,)}]
    lins: list  # [(1,1,c,1) kernels]

    @classmethod
    def random_init(cls, key: jax.Array, net: str = "alex") -> "LpipsModel":
        """Untrained weights — for shape/invariance tests only (a real metric
        needs imported pretrained weights)."""
        cfg = _ALEX_CFG if net == "alex" else _VGG_CFG
        taps = _ALEX_TAPS if net == "alex" else _VGG_TAPS
        convs = []
        cin = 3
        ks = jax.random.split(key, 32)
        ki = 0
        channels = []
        for item in cfg:
            if item == "M":
                continue
            cout, k, s, p = item
            convs.append(
                {
                    "w": jax.random.normal(ks[ki], (k, k, cin, cout)) * (1.0 / np.sqrt(k * k * cin)),
                    "b": jnp.zeros(cout),
                }
            )
            channels.append(cout)
            cin = cout
            ki += 1
        lins = [
            jnp.abs(jax.random.normal(ks[ki + i], (1, 1, channels[t], 1))) * 0.01
            for i, t in enumerate(taps)
        ]
        return cls(net=net, convs=convs, lins=lins)

    @classmethod
    def from_torch_state_dicts(cls, sd: dict, lsd: dict, net: str = "alex") -> "LpipsModel":
        """Build from in-memory torch state dicts (torchvision backbone +
        lpips linear heads), keyed by LAYER NAME — not dict iteration order.

        Backbone conv keys are ``[features.]<i>.weight`` (torchvision modules
        and plain Sequential checkpoints both match); heads are
        ``lin<i>[.model.<j>].weight`` as saved by the lpips package
        (/root/reference/lpipsPyTorch/modules/lpips.py:8-37). Layers are
        ordered by the embedded integer index, so permuting the dict cannot
        scramble the mapping (round-1 advisor finding). Validated numerically
        against a torch forward in tests/test_io_metrics.py."""
        import re

        def _np(v):
            return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

        cfg = _ALEX_CFG if net == "alex" else _VGG_CFG
        n_convs = sum(1 for c in cfg if c != "M")
        conv_items = []
        for k, v in sd.items():
            m = re.match(r"^(?:features\.)?(\d+)\.weight$", k)
            if m and _np(v).ndim == 4:
                conv_items.append((int(m.group(1)), k, v))
        conv_items.sort(key=lambda t: t[0])
        if len(conv_items) < n_convs:
            raise ValueError(
                f"backbone state dict has {len(conv_items)} conv layers, need {n_convs}"
            )
        convs = []
        for idx, wkey, w in conv_items[:n_convs]:
            bkey = wkey[: -len("weight")] + "bias"
            convs.append(
                {
                    # torch OIHW -> jax HWIO
                    "w": jnp.asarray(_np(w).transpose(2, 3, 1, 0)),
                    "b": jnp.asarray(_np(sd[bkey])),
                }
            )
        lin_items = []
        for k, v in lsd.items():
            m = re.match(r"^lin(\d+)\b", k)
            if m and _np(v).ndim == 4:
                lin_items.append((int(m.group(1)), v))
        lin_items.sort(key=lambda t: t[0])
        lins = [jnp.asarray(_np(v).transpose(2, 3, 1, 0)) for _, v in lin_items]
        taps = _ALEX_TAPS if net == "alex" else _VGG_TAPS
        if len(lins) != len(taps):
            raise ValueError(f"expected {len(taps)} linear heads, got {len(lins)}")
        return cls(net=net, convs=convs, lins=lins)

    @classmethod
    def from_torch_file(cls, backbone_path: str, lpips_path: str, net: str = "alex") -> "LpipsModel":
        """Import torchvision backbone + lpips linear-head checkpoint files."""
        import torch

        sd = torch.load(backbone_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        lsd = torch.load(lpips_path, map_location="cpu")
        return cls.from_torch_state_dicts(sd, lsd, net=net)

    def _features(self, img: jax.Array) -> list[jax.Array]:
        """img: (B, H, W, 3) in [0, 1] -> list of tapped relu feature maps."""
        x = (2.0 * img - 1.0 - _IMAGENET_SHIFT) / _IMAGENET_SCALE
        cfg = _ALEX_CFG if self.net == "alex" else _VGG_CFG
        taps = set(_ALEX_TAPS if self.net == "alex" else _VGG_TAPS)
        feats = []
        ci = 0
        for item in cfg:
            if item == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
                continue
            cout, k, s, p = item
            x = jax.lax.conv_general_dilated(
                x,
                self.convs[ci]["w"],
                (s, s),
                [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + self.convs[ci]["b"]
            x = jax.nn.relu(x)
            if ci in taps:
                feats.append(x)
            ci += 1
        return feats

    def __call__(self, img1: jax.Array, img2: jax.Array) -> jax.Array:
        """LPIPS distance. Accepts (H,W,3) or (B,H,W,3) in [0,1]."""
        if img1.ndim == 3:
            img1, img2 = img1[None], img2[None]
        f1 = self._features(img1)
        f2 = self._features(img2)
        total = 0.0
        for a, b, lin in zip(f1, f2, self.lins):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10)
            d = (a - b) ** 2
            val = jax.lax.conv_general_dilated(
                d, lin, (1, 1), [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            total = total + jnp.mean(val, axis=(1, 2, 3))
        return jnp.mean(total)


def evaluate_image(img: jax.Array, gt: jax.Array, lpips_model: LpipsModel | None = None) -> dict:
    """The reference's metric bundle for one image pair."""
    out = {
        "psnr": float(psnr(img, gt)),
        "ssim": float(ssim(img, gt)),
        "ms_ssim": float(ms_ssim(img, gt)),
    }
    if lpips_model is not None:
        out[f"lpips_{lpips_model.net}"] = float(lpips_model(img, gt))
    return out
