"""Stage-1 evaluation & synthesis (the render.py equivalent).

Parity with /root/reference/render.py:83-235: test-set rendering of the node
deformation model with metrics, fixed-view time interpolation, and spiral
pose+time sweeps (interpolate_all), plus node OBJ / 2D-projection dumps.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.camera.camera import Camera, make_camera, focal2fov
from riggs_tpu.camera.poses import spherical_ring
from riggs_tpu.data.dataset import Frame
from riggs_tpu.eval.metrics import evaluate_image
from riggs_tpu.models import node_warp as NW
from riggs_tpu.render.api import render


def render_deformed(gs, warp: NW.NodeWarp, cam: Camera, t, bg=None, active_sh=None, max_per_tile=1024):
    bg = jnp.zeros(3) if bg is None else bg
    active_sh = gs.max_sh_degree if active_sh is None else active_sh
    d = NW.warp_forward(
        warp, gs.xyz, jnp.asarray(t), gs.feature, gs.motion_mask, local_frame=warp.net.local_frame
    )
    out = render(
        cam,
        gs,
        bg,
        d_xyz=d["d_xyz"],
        d_rotation=d["d_rotation"],
        d_scaling=jnp.zeros_like(d["d_scaling"]),
        active_sh_degree=active_sh,
        max_per_tile=max_per_tile,
    )
    out["d_nodes"] = d["d_nodes"]
    return out


def render_test_set_stage1(gs, warp, frames: list[Frame], bg=None, lpips_model=None, max_per_tile=1024):
    rows, images = [], []
    fn = jax.jit(
        lambda t, w2c, intr: render_deformed(
            gs,
            warp,
            dataclasses.replace(frames[0].cam, w2c=w2c, intrinsics=intr, fid=t),
            t,
            bg=bg,
            max_per_tile=max_per_tile,
        )["render"]
    )
    for f in frames:
        img = fn(f.fid, f.cam.w2c, f.cam.intrinsics)
        rows.append(evaluate_image(img, f.image, lpips_model))
        images.append(np.asarray(img))
    means = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]} if rows else {}
    return rows, means, images


def interpolate_time_stage1(gs, warp, cam: Camera, n_frames: int = 150, bg=None, max_per_tile=1024):
    """150-frame time sweep at a fixed view (render.py interpolate_time)."""
    fn = jax.jit(lambda t: render_deformed(gs, warp, cam, t, bg=bg, max_per_tile=max_per_tile)["render"])
    return [np.asarray(fn(jnp.asarray(t))) for t in np.linspace(0.0, 1.0, n_frames)]


def interpolate_all_stage1(
    gs,
    warp,
    width: int = 800,
    height: int = 800,
    fov: float = 0.9,
    n_frames: int = 90,
    radius: float = 4.0,
    bg=None,
    max_per_tile=1024,
):
    """Spiral pose + time sweep (render.py interpolate_all): the camera orbits
    while time advances."""
    from riggs_tpu.data.blender import _nerf_c2w_to_rt

    poses = spherical_ring(n_frames, radius=radius)
    images = []
    for i, c2w in enumerate(poses):
        R, T = _nerf_c2w_to_rt(c2w)
        cam = make_camera(R, T, width, height, fovx=fov, fovy=fov, fid=i / n_frames)
        out = render_deformed(gs, warp, cam, i / n_frames, bg=bg, max_per_tile=max_per_tile)
        images.append(np.asarray(out["render"]))
    return images
