"""Optical-flow (RAFT) supervision loader.

The reference wires per-train-camera flow files at scene/__init__.py:87-91:
``raft_neighbouring/<image_name>.<suffix>_<partner_name>.npy`` holds the
(H', W', 2) pixel flow from this frame to a neighbouring frame, and
``raft_masks/<same>.png`` the [cycle_consistency, occlusion, ...] validity
channels; one candidate is chosen at random every step and resized to the
render resolution (train_gui.py:1078-1121).

Here the scan happens once at load; ``FlowStore.sample`` does the per-step
random choice + npy/png read + bilinear resize host-side (numpy only) and
returns arrays ready to drop into ``Frame.flow`` / ``flow_mask`` /
``flow_partner_fid``.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
from PIL import Image


def _resize_bilinear(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """(H, W, C) -> (h, w, C) bilinear, numpy-only (reference uses
    F.interpolate at train_gui.py:1090-1092)."""
    H, W = arr.shape[:2]
    if (H, W) == (h, w):
        return arr
    ys = (np.arange(h) + 0.5) * H / h - 0.5
    xs = (np.arange(w) + 0.5) * W / w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    x1 = np.minimum(x0 + 1, W - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = arr[np.ix_(y0, x0)]
    b = arr[np.ix_(y0, x1)]
    c = arr[np.ix_(y1, x0)]
    d = arr[np.ix_(y1, x1)]
    return (
        a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
    ).astype(arr.dtype)


class FlowStore:
    """Per-train-frame flow candidates, sampled lazily each step."""

    def __init__(self, source_path: str | Path, image_names: list[str], fids: list[float]):
        self.flow_dir = Path(source_path) / "raft_neighbouring"
        self.mask_dir = Path(source_path) / "raft_masks"
        self.fid_by_name = dict(zip(image_names, fids))
        entries = sorted(self.flow_dir.iterdir()) if self.flow_dir.exists() else []
        # candidates[i] = flow files whose stem starts with "<image_name>."
        self.candidates: list[list[Path]] = [
            [e for e in entries if e.name.startswith(name + ".")] for name in image_names
        ]

    def has_flow(self, i: int) -> bool:
        return bool(self.candidates[i])

    def partner_name(self, flow_path: Path) -> str | None:
        """Partner frame name encoded in the flow filename. The reference takes
        the last '_'-token of the basename (train_gui.py:1093); image names may
        themselves contain underscores (D-NeRF 'r_000'), so prefer the longest
        known image name the stem ends with, falling back to the last token."""
        stem = flow_path.stem  # "<image_name>.<suffix>_<partner>"
        tail = stem.split(".", 1)[1] if "." in stem else stem
        matches = [n for n in self.fid_by_name if tail.endswith(n)]
        if matches:
            return max(matches, key=len)
        return stem.split("_")[-1]

    def sample(self, i: int, rng: np.random.Generator, height: int, width: int):
        """Random candidate for train frame i -> (flow (H,W,2) px, mask (H,W),
        partner_fid) or None when the partner frame is unknown
        (train_gui.py:1095 'Only considering the case with existing files')."""
        cands = self.candidates[i]
        if not cands:
            return None
        pick = cands[rng.integers(len(cands))]
        partner = self.partner_name(pick)
        if partner not in self.fid_by_name:
            return None
        flow = np.load(pick).astype(np.float32)
        mask_path = self.mask_dir / pick.name.replace(".npy", ".png")
        if mask_path.exists():
            masks = np.asarray(Image.open(mask_path), np.float32) / 255.0
            if masks.ndim == 2:
                masks = masks[..., None].repeat(2, axis=-1)
        else:
            masks = np.ones(flow.shape[:2] + (2,), np.float32)
        flow = _resize_bilinear(flow, height, width)
        masks = _resize_bilinear(masks, height, width)
        # valid where cycle-consistent OR occlusion-flagged (train_gui.py:1102-1104)
        valid = ((masks[..., 0] > 0) | (masks[..., 1] > 0)).astype(np.float32)
        return flow, valid, np.float32(self.fid_by_name[partner])
