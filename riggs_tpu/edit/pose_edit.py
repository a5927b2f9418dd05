"""Skeleton pose editing: rotate joints about the view axis, compose with the
PoseMLP output, and save/load/interpolate key poses.

Parity with /root/reference/interactive_GUI.py:296-447 and :1216-1261: an
edit is a per-joint delta quaternion composed onto the current local rotation
by quaternion multiplication; saved poses can be SLERP-interpolated into a
playback sequence (skeleton/interpolation.py).
"""
from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from riggs_tpu.ops.quaternion import quat_multiply, quat_normalize


def axis_angle_quat(axis: np.ndarray, angle: float) -> np.ndarray:
    axis = np.asarray(axis, np.float32)
    axis = axis / max(np.linalg.norm(axis), 1e-12)
    half = angle / 2.0
    return np.concatenate([[np.cos(half)], np.sin(half) * axis]).astype(np.float32)


def rotate_joint(
    local_rotation: jnp.ndarray, joint_idx: int, view_axis: np.ndarray, angle: float
) -> jnp.ndarray:
    """Compose a rotation of ``angle`` about ``view_axis`` (typically the
    camera forward axis) onto joint ``joint_idx``'s local rotation
    (update_skeleton_pose_by_rotation, interactive_GUI.py:296-344)."""
    dq = jnp.asarray(axis_angle_quat(view_axis, angle))
    updated = quat_normalize(quat_multiply(dq, local_rotation[joint_idx]))
    return local_rotation.at[joint_idx].set(updated)


def compose_pose_edit(base_rotation: jnp.ndarray, edit_rotation: jnp.ndarray) -> jnp.ndarray:
    """Apply saved per-joint edit quats onto a PoseMLP output
    (interactive_GUI.py:397-447 quaternion_multiply composition)."""
    return quat_normalize(quat_multiply(edit_rotation, base_rotation))


def retarget_pose(
    src_joints: np.ndarray,
    dst_joints: np.ndarray,
    local_rotation: np.ndarray,
    global_trans: np.ndarray,
):
    """Drive one skeleton with a pose edited on another (reference-skeleton
    retargeting, interactive_GUI.py:449+): when joint counts match, rotations
    transfer 1:1; otherwise each destination joint takes the rotation of its
    nearest source joint (rest-pose nearest neighbor)."""
    src_joints = np.asarray(src_joints)
    dst_joints = np.asarray(dst_joints)
    rot = np.asarray(local_rotation)
    if len(src_joints) == len(dst_joints):
        return rot.copy(), np.asarray(global_trans).copy()
    d = ((dst_joints[:, None] - src_joints[None]) ** 2).sum(-1)
    nearest = d.argmin(1)
    return rot[nearest], np.asarray(global_trans).copy()


class PoseLibrary:
    """Save/load named skeleton poses to JSON (interactive_GUI pose files)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.poses: dict[str, dict] = {}
        if self.path.exists():
            self.load()

    def add(self, name: str, local_rotation, global_trans):
        self.poses[name] = {
            "local_rotation": np.asarray(local_rotation).tolist(),
            "global_trans": np.asarray(global_trans).tolist(),
        }

    def get(self, name: str):
        p = self.poses[name]
        return np.asarray(p["local_rotation"], np.float32), np.asarray(p["global_trans"], np.float32)

    def save(self):
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.path.write_text(json.dumps(self.poses))

    def load(self):
        self.poses = json.loads(self.path.read_text())

    def interpolate(self, names: list[str], frames_per_segment: int = 20):
        """SLERP through the named poses -> (rotations, translations) sequence."""
        from riggs_tpu.skeleton.interpolation import interpolate_key_poses

        rots = jnp.stack([jnp.asarray(self.get(n)[0]) for n in names])
        trans = jnp.stack([jnp.asarray(self.get(n)[1]) for n in names])
        return interpolate_key_poses(rots, trans, frames_per_segment)
