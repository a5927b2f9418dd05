"""ZJU-MoCap (HumanNeRF-format) dataset reader.

Parity with /root/reference/scene/dataset_readers.py:1000-1145
(readZJUCameras / readZJUMovingMonocularCams / readZJUInfo): cameras.pkl +
mesh_infos.pkl, image undistortion, the SMPL global transform (Rh/Th) folded
into the extrinsics, per-frame SMPL vertex priors (SMPL_prior/*.npy as
reference_points), thinned skeletons and semantic segmentations, 6 rotating
train views + 17 test views, random init cloud from points3d.ply when
present.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from riggs_tpu.camera.camera import make_camera
from riggs_tpu.data.dataset import Frame, SceneData, pad_thinned

ZJU_TEST_CAMERA_IDS = [2, 3, 4, 6, 7, 8, 10, 11, 12, 14, 15, 16, 18, 19, 20, 22, 23]


def _rodrigues(r: np.ndarray) -> np.ndarray:
    """Axis-angle -> rotation matrix (cv.Rodrigues equivalent)."""
    theta = np.linalg.norm(r)
    if theta < 1e-12:
        return np.eye(3)
    k = r / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def apply_global_tfm_to_camera(E: np.ndarray, Rh: np.ndarray, Th: np.ndarray) -> np.ndarray:
    """Fold the SMPL global transform into the extrinsics (dataset_readers.py:1000-1017)."""
    global_tfms = np.eye(4)
    global_rot = _rodrigues(np.asarray(Rh).reshape(3)).T
    global_tfms[:3, :3] = global_rot
    global_tfms[:3, 3] = -global_rot @ np.asarray(Th).reshape(3)
    E4 = np.eye(4)
    E4[: E.shape[0], : E.shape[1]] = E
    return E4 @ np.linalg.inv(global_tfms)


def read_zju_cameras(
    path: str | Path,
    smpl_path: str | Path,
    white_background: bool = False,
    train_num: int = -1,
    with_smpl_pose: bool = True,
    max_thinned: int = 4096,
) -> tuple[list[Frame], int]:
    import cv2 as cv
    from PIL import Image

    path = Path(path)
    smpl_path = Path(smpl_path)
    with open(path / "cameras.pkl", "rb") as f:
        cameras = pickle.load(f)
    with open(path / "mesh_infos.pkl", "rb") as f:
        mesh_infos = pickle.load(f)
    if train_num < 0:
        train_num = len(cameras)

    frames = []
    for fname in cameras:
        idx = int(fname.split("_")[-1])
        image = np.asarray(Image.open(path / "images" / f"{fname}.png"))
        mask = np.asarray(Image.open(path / "masks" / f"{fname}.png"))
        intrin = np.asarray(cameras[fname]["intrinsics"])
        extrin = np.asarray(cameras[fname]["extrinsics"])
        D = np.asarray(cameras[fname]["distortions"])
        image = cv.undistort(image, intrin, D)
        mask = cv.undistort(mask, intrin, D)
        mask = (mask[..., 0] > 0) if mask.ndim == 3 else (mask > 0)
        image = image.astype(np.float32)
        image[~mask] = 255.0 if white_background else 0.0
        rgb = image[..., :3] / 255.0

        thinned = thinned_mask = None
        tp_path = path / "train_thinned" / f"{fname}_thinned.png"
        if tp_path.exists():
            tarr = np.asarray(Image.open(tp_path).convert("L"))
            coords = np.argwhere(tarr > 0).astype(np.float32)
            if len(coords):
                tp, tm = pad_thinned(coords, max_thinned)
                thinned, thinned_mask = jnp.asarray(tp), jnp.asarray(tm)

        seg = None
        seg_path = path / "semantic_seg" / f"{fname}_seg.npy"
        if seg_path.exists():
            seg = jnp.asarray(np.load(seg_path)[0].astype(np.int32))

        ref_pts = None
        rp_path = smpl_path / "SMPL_prior" / f"{fname}.npy"
        if rp_path.exists():
            ref_pts = jnp.asarray(np.load(rp_path).astype(np.float32))

        if with_smpl_pose:
            mi = mesh_infos[fname]
            extrin = apply_global_tfm_to_camera(extrin, mi["Rh"], mi["Th"])
        R = extrin[:3, :3].T
        T = extrin[:3, 3]
        cam = make_camera(
            R, T, rgb.shape[1], rgb.shape[0], K=intrin, fid=idx / max(train_num - 1, 1)
        )
        frames.append(
            Frame(
                cam=cam,
                image=jnp.asarray(rgb),
                alpha_mask=jnp.asarray(mask.astype(np.float32)),
                thinned=thinned,
                thinned_mask=thinned_mask,
                semantic_seg=seg,
                reference_points=ref_pts,
            )
        )
    return frames, train_num


def load_zju_scene(
    path: str | Path,
    white_background: bool = False,
    test_camera_ids: list[int] | None = None,
    n_init_points: int = 100_000,
    seed: int = 0,
) -> SceneData:
    path = Path(path)
    train, train_num = read_zju_cameras(path / "train", path, white_background)
    test = []
    for cid in test_camera_ids or ZJU_TEST_CAMERA_IDS:
        view = path / "test" / f"view_{cid:02d}"
        if view.exists():
            fr, _ = read_zju_cameras(view, path, white_background, train_num=train_num)
            test += fr

    ply = path / "points3d.ply"
    if ply.exists():
        from riggs_tpu.io.ply import read_ply

        cols = read_ply(ply)
        pts = np.stack([cols["x"], cols["y"], cols["z"]], -1)
        rgbs = (
            np.stack([cols[k] for k in ("red", "green", "blue")], -1) / 255.0
            if "red" in cols
            else np.full((len(pts), 3), 0.5, np.float32)
        )
    else:
        rng = np.random.default_rng(seed)
        pts = rng.random((n_init_points, 3)).astype(np.float32) * 2.6 - 1.3
        rgbs = rng.random((n_init_points, 3)).astype(np.float32)

    from riggs_tpu.train.static import compute_scene_extent

    return SceneData(
        train_frames=train,
        test_frames=test,
        init_points=pts,
        init_colors=rgbs,
        cameras_extent=compute_scene_extent([f.cam for f in train]),
        is_blender=False,
        white_background=white_background,
    )
