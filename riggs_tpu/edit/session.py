"""Stateful drag-keypoint ARAP editing session — the library behind the
viewer's interactive editing endpoints.

Mirrors the reference drag workflow (interactive_GUI.py:1268
callback_keypoint_drag -> lap_deform.py:212 deform_arap -> blend to
gaussians): a sparse set of FPS control points carries an ARAP graph; picking
selects the control point nearest a click (in screen space); dragging moves
the selected handle group in the camera's image plane; the local-global ARAP
solve (edit/arap_deform.py) repositions all control points, and the dense
Gaussian cloud follows by Gaussian-kernel KNN blending of the control-point
displacements (the cal_nn_weight scheme of utils/time_utils.py:934-967).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from riggs_tpu.camera.camera import Camera, project_nodes_2d, world_to_view
from riggs_tpu.edit.arap_deform import make_deformer, deform_arap
from riggs_tpu.edit.keypoints import DeformKeypoints
from riggs_tpu.ops.fps import farthest_point_sample
from riggs_tpu.ops.knn import knn


class EditSession:
    """Drag-editing state over a Gaussian cloud (optionally seeded with
    existing control nodes instead of FPS samples)."""

    def __init__(
        self,
        gs_xyz: np.ndarray,
        n_ctrl: int = 256,
        k_blend: int = 4,
        ctrl_points: np.ndarray | None = None,
    ):
        xyz = jnp.asarray(gs_xyz)
        if ctrl_points is not None:
            ctrl = jnp.asarray(ctrl_points)
        else:
            n_ctrl = min(n_ctrl, xyz.shape[0])
            idx = farthest_point_sample(xyz, n_ctrl)
            ctrl = xyz[idx]
        self.ctrl_rest = np.asarray(ctrl)
        self.deformer = make_deformer(ctrl)
        d2, nn = knn(xyz, ctrl, k=min(k_blend, ctrl.shape[0]))
        # per-control radius = median distance of its blend queries (a stable
        # analog of the learned node radius)
        sigma2 = jnp.maximum(jnp.mean(d2, axis=0, keepdims=True)[..., :1], 1e-8)
        w = jnp.exp(-d2 / (2.0 * sigma2))
        self.blend_idx = np.asarray(nn)
        self.blend_w = np.asarray(w / jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-12))
        self.kps = DeformKeypoints()
        self.ctrl_cur = self.ctrl_rest.copy()
        self.d_xyz = np.zeros_like(np.asarray(gs_xyz))

    # -- picking -----------------------------------------------------------
    def pick(self, cam: Camera, px: float, py: float, thresh_px: float = 25.0, expand: bool = False) -> int:
        """Select the control point nearest the clicked pixel (col=px, row=py).
        Returns the control index, or -1 if nothing within ``thresh_px``."""
        rc = np.asarray(project_nodes_2d(cam, jnp.asarray(self.ctrl_cur)))
        d = np.hypot(rc[:, 0] - py, rc[:, 1] - px)
        i = int(np.argmin(d))
        if d[i] > thresh_px:
            return -1
        self.kps.add_kpts(self.ctrl_cur[i], i, expand=expand)
        return i

    # -- dragging ----------------------------------------------------------
    def drag(self, cam: Camera, dpx: float, dpy: float) -> None:
        """Move the selected handle group by a screen-space delta (pixels),
        mapped to world units in the camera's image plane at the handle depth,
        then re-solve ARAP and re-blend."""
        sel = self.kps.get_selective_keypoints_idx()
        if not sel:
            return
        R = np.asarray(cam.w2c)[:3, :3]  # rows: camera x/y/z axes in world
        anchor = np.mean([self.kps.keypoints[i] for i in self.kps.selective_keypoints_idx_list], axis=0)
        depth = float(np.asarray(world_to_view(cam.w2c, jnp.asarray(anchor)[None]))[0, 2])
        fx = float(np.asarray(cam.intrinsics[0]))
        fy = float(np.asarray(cam.intrinsics[1]))
        scale = max(depth, 1e-6)
        delta = R[0] * (dpx * scale / fx) + R[1] * (dpy * scale / fy)
        self.kps.update_selective_keypoints(delta)
        self.solve()

    def solve(self) -> None:
        idxs = np.asarray(self.kps.get_kpt_idx(), np.int32)
        pos = np.asarray(self.kps.get_kpt(), np.float32).reshape(-1, 3)
        p_new, _rot = deform_arap(self.deformer, jnp.asarray(idxs), jnp.asarray(pos))
        self.ctrl_cur = np.asarray(p_new)
        disp = self.ctrl_cur - self.ctrl_rest  # (M, 3)
        self.d_xyz = np.einsum(
            "nk,nkd->nd", self.blend_w, disp[self.blend_idx]
        ).astype(np.float32)

    def clear(self) -> None:
        self.kps.clear()
        self.ctrl_cur = self.ctrl_rest.copy()
        self.d_xyz[:] = 0.0
