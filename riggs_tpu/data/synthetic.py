"""Procedural articulated test scenes with exact ground truth.

No datasets ship with this environment, so tests and benches use synthetic
scenes: a capsule-limb "stick figure" of Gaussians animated by a known
skeleton, rendered to ground-truth images by our own oracle renderer. This
gives an end-to-end supervision signal whose true solution is known — the
test strategy SURVEY.md §4 calls for (the reference itself has zero tests).

Also doubles as the parity fixture generator: any renderer change must still
reproduce these images.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.camera.camera import Camera, make_camera
from riggs_tpu.ops.quaternion import quat_to_rotmat
from riggs_tpu.ops.fk import forward_kinematics
from riggs_tpu.render.oracle import rasterize_oracle


def ring_cameras(
    n: int,
    radius: float = 3.0,
    height: float = 0.6,
    width: int = 128,
    image_height: int = 128,
    fov: float = 0.9,
    fids: np.ndarray | None = None,
) -> list[Camera]:
    """n cameras on a ring looking at the origin (blender-style orbit)."""
    cams = []
    for i in range(n):
        a = 2 * np.pi * i / n
        pos = np.array([radius * np.cos(a), height, radius * np.sin(a)])
        z = -pos / np.linalg.norm(pos)  # forward (towards origin)
        up = np.array([0.0, -1.0, 0.0])  # view-space y points down
        x = np.cross(up, z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=1)  # c2w rotation
        T = -R.T @ pos
        fid = float(fids[i]) if fids is not None else 0.0
        cams.append(make_camera(R, T, width, image_height, fovx=fov, fovy=fov, fid=fid))
    return cams


@dataclasses.dataclass
class StickFigure:
    """An articulated figure of Gaussian blobs with known skinning."""

    points: np.ndarray  # (N, 3) rest positions
    colors: np.ndarray  # (N, 3)
    scales: np.ndarray  # (N, 3)
    opacity: np.ndarray  # (N,)
    joints: np.ndarray  # (J, 3) rest joints
    parents: tuple  # (J,)
    skin_idx: np.ndarray  # (N,) rigid bone assignment (joint index)
    # animation spec: (joint, axis(0|1|2), amplitude scale, phase) — drives
    # pose_at_time; empty = the classic 2-segment chain animation
    anim: tuple = ()


def make_stick_figure(seed: int = 0, points_per_seg: int = 120) -> StickFigure:
    rng = np.random.default_rng(seed)
    # chain of joints: root at origin, child up, grandchild up again
    joints = np.array([[0.0, -0.6, 0.0], [0.0, 0.0, 0.0], [0.0, 0.6, 0.0]], np.float32)
    parents = (0, 0, 1)
    segs = [(joints[0], joints[1], 1), (joints[1], joints[2], 2)]
    pts, cols, skin = [], [], []
    palette = np.array([[0.9, 0.2, 0.2], [0.2, 0.8, 0.3], [0.2, 0.3, 0.9]], np.float32)
    for a, b, j in segs:
        t = rng.uniform(size=(points_per_seg, 1)).astype(np.float32)
        core = a + t * (b - a)
        off = rng.normal(size=(points_per_seg, 3)).astype(np.float32) * 0.05
        pts.append(core + off)
        cols.append(np.tile(palette[j][None], (points_per_seg, 1)))
        skin.append(np.full(points_per_seg, j))
    points = np.concatenate(pts)
    n = points.shape[0]
    return StickFigure(
        points=points,
        colors=np.concatenate(cols),
        scales=np.full((n, 3), 0.035, np.float32),
        opacity=np.full(n, 0.9, np.float32),
        joints=joints,
        parents=parents,
        skin_idx=np.concatenate(skin),
    )


def make_biped_figure(seed: int = 0, points_per_seg: int = 120) -> StickFigure:
    """An 11-joint biped (torso, head, 2 two-segment arms, 2 two-segment
    legs) — the richer synthetic workload for reference-scale runs: its
    skeleton extraction must recover limbs, not just a chain."""
    rng = np.random.default_rng(seed)
    joints = np.array(
        [
            [0.0, -0.10, 0.0],   # 0 pelvis (root)
            [0.0, 0.35, 0.0],    # 1 chest
            [0.0, 0.70, 0.0],    # 2 head
            [-0.35, 0.33, 0.0],  # 3 L elbow
            [-0.62, 0.08, 0.0],  # 4 L hand
            [0.35, 0.33, 0.0],   # 5 R elbow
            [0.62, 0.08, 0.0],   # 6 R hand
            [-0.16, -0.50, 0.0], # 7 L knee
            [-0.20, -0.92, 0.0], # 8 L foot
            [0.16, -0.50, 0.0],  # 9 R knee
            [0.20, -0.92, 0.0],  # 10 R foot
        ],
        np.float32,
    )
    parents = (0, 0, 1, 1, 3, 1, 5, 0, 7, 0, 9)
    segs = [(parents[j], j) for j in range(1, len(parents))]
    rng_cols = np.random.default_rng(7)
    palette = rng_cols.uniform(0.15, 0.95, size=(len(parents), 3)).astype(np.float32)
    pts, cols, skin = [], [], []
    for p, j in segs:
        t = rng.uniform(size=(points_per_seg, 1)).astype(np.float32)
        core = joints[p] + t * (joints[j] - joints[p])
        off = rng.normal(size=(points_per_seg, 3)).astype(np.float32) * 0.04
        pts.append(core + off)
        cols.append(np.tile(palette[j][None], (points_per_seg, 1)))
        skin.append(np.full(points_per_seg, j))
    points = np.concatenate(pts)
    n = points.shape[0]
    # (joint, axis, amp, phase): swinging arms/legs in anti-phase + head nod
    anim = (
        (3, 2, 1.0, 0.0), (5, 2, -1.0, 0.0),     # shoulders (z swing)
        (4, 2, 0.5, 0.9), (6, 2, -0.5, 0.9),     # elbows
        (7, 0, 0.8, np.pi), (9, 0, -0.8, np.pi), # hips (x swing)
        (8, 0, 0.4, 1.2), (10, 0, -0.4, 1.2),    # knees
        (2, 0, 0.25, 0.5), (1, 2, 0.15, 2.0),    # head nod, torso sway
    )
    return StickFigure(
        points=points,
        colors=np.concatenate(cols),
        scales=np.full((n, 3), 0.030, np.float32),
        opacity=np.full(n, 0.9, np.float32),
        joints=joints,
        parents=parents,
        skin_idx=np.concatenate(skin),
        anim=anim,
    )


def pose_at_time(fig: StickFigure, t: float, amplitude: float = 0.7) -> np.ndarray:
    """Ground-truth per-joint local rotations (J, 4) for normalized time t."""
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (len(fig.parents), 1))
    if fig.anim:
        axes = np.eye(3, dtype=np.float32)
        for j, ax, amp, phase in fig.anim:
            ang = amplitude * amp * np.sin(2 * np.pi * t + phase)
            a = axes[ax] * np.sin(ang / 2)
            quats[j] = [np.cos(ang / 2), a[0], a[1], a[2]]
        return quats
    angle1 = amplitude * np.sin(2 * np.pi * t)
    angle2 = 0.5 * amplitude * np.sin(2 * np.pi * t + 1.3)
    for j, ang in ((1, angle1), (2, angle2)):
        quats[j] = [np.cos(ang / 2), 0.0, 0.0, np.sin(ang / 2)]  # rotate about z
    return quats


def deform_points(fig: StickFigure, quats: np.ndarray) -> np.ndarray:
    """Rigid-skin the points by their bone's global transform (exact LBS)."""
    rots = quat_to_rotmat(jnp.asarray(quats))
    posed, G = forward_kinematics(rots, jnp.asarray(fig.joints), fig.parents)
    G = np.asarray(G)
    x = fig.points
    Rg = G[fig.skin_idx, :3, :3]
    tg = G[fig.skin_idx, :3, 3]
    return np.einsum("nab,nb->na", Rg, x) + tg


def render_frame(
    fig: StickFigure,
    cam: Camera,
    t: float | None = None,
    bg: np.ndarray | None = None,
) -> np.ndarray:
    """Ground-truth render at time t (None = rest pose)."""
    pts = fig.points if t is None else deform_points(fig, pose_at_time(fig, t))
    bg = np.zeros(3, np.float32) if bg is None else bg
    n = pts.shape[0]
    out = rasterize_oracle(
        cam,
        jnp.asarray(pts),
        jnp.asarray(fig.colors),
        jnp.asarray(fig.opacity),
        jnp.asarray(fig.scales),
        jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        jnp.asarray(bg),
    )
    return np.asarray(out["image"])


def make_dataset(
    n_cams: int = 8,
    n_frames: int = 8,
    width: int = 128,
    height: int = 128,
    seed: int = 0,
    dynamic: bool = True,
):
    """A tiny D-NeRF-style dataset: one camera per (view, time) pair."""
    fig = make_stick_figure(seed)
    fids = np.linspace(0, 1, n_frames, endpoint=False) if dynamic else np.zeros(n_frames)
    cams = ring_cameras(n_cams, width=width, image_height=height)
    data = []
    for i in range(n_frames):
        cam = dataclasses.replace(cams[i % n_cams], fid=jnp.asarray(fids[i], jnp.float32))
        img = render_frame(fig, cam, fids[i] if dynamic else None)
        data.append((cam, img))
    return fig, data


def make_scene_data(
    n_train: int = 12,
    n_test: int = 3,
    n_cams: int = 8,
    width: int = 96,
    height: int = 96,
    seed: int = 0,
    max_thinned: int = 256,
    n_init_points: int = 300,
    render_gt: bool = True,
    figure: str = "chain",
    points_per_seg: int = 120,
):
    """A full SceneData with masks + thinned 2D skeletons, D-NeRF style."""
    from riggs_tpu.data.dataset import Frame, SceneData, pad_thinned, thin_mask_skeleton
    from riggs_tpu.ops.quaternion import quat_to_rotmat as _q2m  # noqa: F401 (parity cite)
    from riggs_tpu.render.oracle import rasterize_oracle
    from riggs_tpu.train.static import compute_scene_extent

    mk = make_biped_figure if figure == "biped" else make_stick_figure
    fig = mk(seed, points_per_seg=points_per_seg)
    rng = np.random.default_rng(seed)
    cams = ring_cameras(n_cams, width=width, image_height=height)

    def build_frames(fids, cam_offset=0):
        frames = []
        for i, t in enumerate(fids):
            cam = dataclasses.replace(
                cams[(i + cam_offset) % n_cams], fid=jnp.asarray(t, jnp.float32)
            )
            if not render_gt:
                # cameras/shapes only (driver compile checks) — skip the
                # oracle GT rendering entirely
                frames.append(
                    Frame(
                        cam=cam,
                        image=jnp.zeros((height, width, 3)),
                        alpha_mask=jnp.zeros((height, width)),
                        thinned=jnp.zeros((max_thinned, 2)),
                        thinned_mask=jnp.zeros(max_thinned, bool),
                    )
                )
                continue
            pts = deform_points(fig, pose_at_time(fig, t))
            n = pts.shape[0]
            out = rasterize_oracle(
                cam,
                jnp.asarray(pts),
                jnp.asarray(fig.colors),
                jnp.asarray(fig.opacity),
                jnp.asarray(fig.scales),
                jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
                jnp.zeros(3),
            )
            img = np.asarray(out["image"])
            alpha = np.asarray(out["alpha"])
            thinned = thin_mask_skeleton(alpha > 0.5)
            tp, tm = pad_thinned(thinned, max_thinned)
            frames.append(
                Frame(
                    cam=cam,
                    image=jnp.asarray(img),
                    alpha_mask=jnp.asarray(alpha),
                    thinned=jnp.asarray(tp),
                    thinned_mask=jnp.asarray(tm),
                )
            )
        return frames

    train_fids = np.linspace(0, 1, n_train, endpoint=False)
    test_fids = rng.uniform(size=n_test)
    train = build_frames(train_fids)
    test = build_frames(test_fids, cam_offset=3)

    # honor the REQUESTED cloud size: upsample with replacement when the
    # figure has fewer surface points (the 0.02 jitter de-duplicates) — the
    # reference operating point needs >=60k-gaussian init clouds and the
    # biped figure only has ~4k surface samples (round-5 refpoint finding)
    sel = rng.choice(len(fig.points), n_init_points, replace=len(fig.points) < n_init_points)
    init_pts = fig.points[sel] + rng.normal(size=(len(sel), 3)).astype(np.float32) * 0.02
    scene = SceneData(
        train_frames=train,
        test_frames=test,
        init_points=init_pts,
        init_colors=fig.colors[sel],
        cameras_extent=compute_scene_extent(cams),
        is_blender=True,
        white_background=False,
    )
    return fig, scene
