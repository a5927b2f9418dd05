"""Stage-2 evaluation & synthesis: test-set metrics, time sweeps, random motion.

Library behind the render_rig CLI — capability parity with
/root/reference/render_rig.py:111-393:
  * ``render_test_set``: per-frame render + metrics + skinning-weight-colored
    render, accumulated into a numerical_res table;
  * ``interpolate_time``: uniform time sweep at a fixed view;
  * ``generate_random_motion``: continuous random per-joint quaternion sweeps
    on ~30% of joints driven through deform_by_pose (novel pose synthesis);
  * skinning-weight visualization colors.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.camera.camera import Camera
from riggs_tpu.data.dataset import Frame
from riggs_tpu.io.obj import jet_colormap
from riggs_tpu.models import skeleton_warp as SW
from riggs_tpu.render.api import render
from riggs_tpu.eval.metrics import evaluate_image


def skinning_colors(nn_idx: jax.Array, nn_weight: jax.Array, n_joints: int) -> jax.Array:
    """Per-Gaussian colors blending distinct joint colors by skinning weight
    (render_rig.py get_color_for_skinning_weights equivalent)."""
    joint_colors = jnp.asarray(jet_colormap(np.linspace(0.0, 1.0, n_joints)))
    return jnp.sum(joint_colors[nn_idx] * nn_weight[..., None], axis=1)


def dump_skinning_weights_ply(
    path, gs, skel: SW.SkeletonWarp, t: jax.Array | float = 0.0
):
    """Colored point cloud of skinning weights (vis_blending_weight_all,
    /root/reference/skeleton_utils/visualization.py:60-129)."""
    from riggs_tpu.io.obj import write_colored_pointcloud_ply

    pose = SW.pose_at(skel, jnp.asarray(t))
    d = SW.deform_by_pose(skel, gs.xyz, pose["local_rotation"], pose["global_trans"], gs.motion_mask)
    colors = skinning_colors(d["nn_idx"], d["nn_weight"], skel.net.n_joints)
    alive = np.asarray(gs.alive)
    write_colored_pointcloud_ply(
        path, np.asarray(gs.xyz + d["d_xyz"])[alive], np.asarray(colors)[alive]
    )


def render_rigged(
    gs,
    skel: SW.SkeletonWarp,
    cam: Camera,
    t: jax.Array | None = None,
    pose: dict | None = None,
    bg: jax.Array | None = None,
    active_sh: int | None = None,
    with_skinning_vis: bool = False,
    max_per_tile: int = 1024,
) -> dict:
    """Render the rigged model at time t OR an explicit pose dict."""
    bg = jnp.zeros(3) if bg is None else bg
    active_sh = gs.max_sh_degree if active_sh is None else active_sh
    if pose is None:
        pose = SW.pose_at(skel, t)
    d = SW.deform_by_pose(
        skel, gs.xyz, pose["local_rotation"], pose["global_trans"], gs.motion_mask
    )
    common = dict(
        d_xyz=d["d_xyz"],
        d_rotation=d["d_rotation"],
        d_scaling=jnp.zeros_like(d["d_scaling"]),
        active_sh_degree=active_sh,
        max_per_tile=max_per_tile,
    )
    out = render(cam, gs, bg, **common)
    result = {"render": out["render"], "depth": out["depth"], "alpha": out["alpha"], "d": d}
    if with_skinning_vis:
        colors = skinning_colors(d["nn_idx"], d["nn_weight"], skel.net.n_joints)
        sk = render(cam, gs, bg, override_color=colors, **common)
        result["skinning_render"] = sk["render"]
    return result


def render_test_set(
    gs,
    skel: SW.SkeletonWarp,
    frames: list[Frame],
    bg: jax.Array | None = None,
    lpips_model=None,
    with_skinning_vis: bool = True,
    max_per_tile: int = 1024,
) -> tuple[list[dict], dict, list[np.ndarray]]:
    """Evaluate every frame. Returns (per-frame metrics, means, renders)."""
    rows, images = [], []
    fn = jax.jit(
        lambda t, w2c, intr: render_rigged(
            gs,
            skel,
            dataclasses.replace(frames[0].cam, w2c=w2c, intrinsics=intr, fid=t),
            t=t,
            with_skinning_vis=with_skinning_vis,
            bg=bg,
            max_per_tile=max_per_tile,
        )
    )
    for f in frames:
        out = fn(f.fid, f.cam.w2c, f.cam.intrinsics)
        m = evaluate_image(out["render"], f.image, lpips_model)
        rows.append(m)
        images.append(np.asarray(out["render"]))
    means = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    return rows, means, images


def format_numerical_res(rows: list[dict], means: dict) -> str:
    """The reference's numerical_res.txt per-frame table (render_rig.py:200-217)."""
    keys = list(rows[0])
    lines = ["frame\t" + "\t".join(keys)]
    for i, r in enumerate(rows):
        lines.append(f"{i}\t" + "\t".join(f"{r[k]:.6f}" for k in keys))
    lines.append("mean\t" + "\t".join(f"{means[k]:.6f}" for k in keys))
    return "\n".join(lines) + "\n"


def interpolate_time(
    gs, skel: SW.SkeletonWarp, cam: Camera, n_frames: int = 200, bg=None, max_per_tile: int = 1024
) -> list[np.ndarray]:
    """Uniform time sweep at a fixed view (render_rig.py:337-393)."""
    fn = jax.jit(lambda t: render_rigged(gs, skel, cam, t=t, bg=bg, max_per_tile=max_per_tile)["render"])
    return [np.asarray(fn(jnp.asarray(t))) for t in np.linspace(0.0, 1.0, n_frames)]


def continuous_random_quats(key: np.random.Generator, n: int) -> np.ndarray:
    """(n, 4) wxyz quats sweeping a random axis from -pi/6 to +pi/6
    (render_rig.py:234-247)."""
    axis = key.random(3)
    axis /= np.linalg.norm(axis)
    angles = -np.pi / 6 + np.arange(n) * (np.pi / 3) / n
    half = angles / 2.0
    q = np.zeros((n, 4), np.float32)
    q[:, 0] = np.cos(half)
    q[:, 1:] = np.sin(half)[:, None] * axis[None, :]
    return q


def generate_random_motion(
    gs,
    skel: SW.SkeletonWarp,
    cam: Camera,
    seed: int = 0,
    pose_num: int = 60,
    change_ratio: float = 0.3,
    min_joint: int = 5,
    bg=None,
    with_skinning_vis: bool = False,
    max_per_tile: int = 1024,
) -> tuple[list[np.ndarray], list[dict]]:
    """Novel-pose synthesis: sweep random continuous rotations on a random
    ~30% subset of joints (render_rig.py:249-334)."""
    rng = np.random.default_rng(seed)
    J = skel.net.n_joints
    lo = min(min_joint, max(J - 1, 1))
    n_change = max(1, int(change_ratio * J))
    candidates = np.arange(lo, J)
    if len(candidates) == 0:
        candidates = np.arange(1, J)
    chosen = rng.choice(candidates, size=min(n_change, len(candidates)), replace=False)
    sweeps = {int(j): continuous_random_quats(rng, pose_num) for j in chosen}

    fn = jax.jit(
        lambda rot: render_rigged(
            gs,
            skel,
            cam,
            pose={"local_rotation": rot, "global_trans": jnp.zeros(3)},
            bg=bg,
            with_skinning_vis=with_skinning_vis,
            max_per_tile=max_per_tile,
        )
    )
    images, poses = [], []
    ident = np.tile(np.array([1.0, 0, 0, 0], np.float32), (J, 1))
    for i in range(pose_num):
        rot = ident.copy()
        for j, qs in sweeps.items():
            rot[j] = qs[i]
        out = fn(jnp.asarray(rot))
        images.append(np.asarray(out["render"]))
        poses.append({"local_rotation": rot, "global_trans": np.zeros(3)})
    return images, poses
