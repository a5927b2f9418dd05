"""Dataset container: cameras + supervision payloads with static-shape padding.

The reference's CameraInfo/Camera carry optional per-frame payloads — image,
alpha mask, thinned 2D-skeleton pixels, semantic segmentation, SMPL reference
points (/root/reference/scene/dataset_readers.py:35-51, scene/cameras.py:18).
Here a Frame is a pytree whose ragged payloads (thinned pixel lists) are
padded to a per-dataset maximum with validity masks, so any frame can be fed
to the same jitted train step — and frames can be stacked into
struct-of-arrays batches for frame-parallel sharding across chips.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.camera.camera import Camera


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Frame:
    cam: Camera
    image: jax.Array  # (H, W, 3) float32 in [0,1]
    alpha_mask: jax.Array | None = None  # (H, W) float32
    thinned: jax.Array | None = None  # (P, 2) (row, col) float32, padded
    thinned_mask: jax.Array | None = None  # (P,) bool
    semantic_seg: jax.Array | None = None  # (H, W) int32
    reference_points: jax.Array | None = None  # (M, 3)
    # optical-flow supervision (RAFT outputs, train_gui.py:1080-1121): flow to
    # a neighbouring frame in pixels, a validity mask (cycle-consistency |
    # occlusion), and the neighbour's fid + camera packed by the loader
    flow: jax.Array | None = None  # (H, W, 2) pixel flow to the partner frame
    flow_mask: jax.Array | None = None  # (H, W) bool/float validity
    flow_partner_fid: jax.Array | None = None  # () partner frame time

    @property
    def fid(self):
        return self.cam.fid


def pad_thinned(coords: np.ndarray, max_points: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad a (P, 2) pixel-coordinate list to (max_points, 2) + mask."""
    p = coords.shape[0]
    if p >= max_points:
        sel = np.linspace(0, p - 1, max_points).astype(np.int64)
        return coords[sel].astype(np.float32), np.ones(max_points, bool)
    out = np.zeros((max_points, 2), np.float32)
    out[:p] = coords
    mask = np.zeros(max_points, bool)
    mask[:p] = True
    return out, mask


def thin_mask_skeleton(mask: np.ndarray) -> np.ndarray:
    """2D skeleton = morphological thinning of the foreground mask, returning
    (row, col) coordinates of skeleton pixels (the offline preprocessing of
    /root/reference/process_data/cal_2d_skeleton.py:10-18; Zhang-Suen
    implementation in data/thinning.py since skimage is unavailable)."""
    from riggs_tpu.data.thinning import skeleton_pixels

    return skeleton_pixels(mask)


@dataclasses.dataclass
class SceneData:
    """Host-side scene: frames plus global metadata."""

    train_frames: list[Frame]
    test_frames: list[Frame]
    init_points: np.ndarray
    init_colors: np.ndarray
    cameras_extent: float
    is_blender: bool = True
    white_background: bool = False
    # per-train-frame image names (flow-file matching, raft_neighbouring/
    # layout keys off them — /root/reference/scene/__init__.py:87-91)
    train_image_names: list[str] | None = None

    @property
    def time_interval(self) -> float:
        return 1.0 / max(len(self.train_frames), 1)
