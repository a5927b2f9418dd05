"""DTU / plenopticVideo (Neu3D) / CMU dataset readers.

The three remaining scene-type callbacks from the reference's
``sceneLoadTypeCallbacks`` (/root/reference/scene/dataset_readers.py:1171-1183)
not covered by data/{blender,colmap,zju,nerfies}.py:

  * DTU (Tensor4D NeuS format):  readNeuSDTUInfo / readDTUCameras
    (dataset_readers.py:433-520) — cameras_sphere.npz with per-image
    world_mat/scale_mat/fid, masked images, projection-matrix decomposition.
  * plenopticVideo (Neu3D):  readPlenopticVideoDataset / readCamerasFromNpy
    (dataset_readers.py:827-912) — LLFF-style poses_bounds.npy, per-camera
    frame directories, hold-out camera split.
  * CMU (panoptic):  readCMUSceneInfo / readCMUInfo
    (dataset_readers.py:914-999) — train/test_meta.json with per-timestep
    per-camera K/w2c, seg masks as alpha, camera normalization and
    point-cloud recentering from init_pt_cld.npz.

All decompositions are pure numpy (no cv2 in this image): the OpenCV
``decomposeProjectionMatrix`` used by the reference's ``load_K_Rt_from_P``
(dataset_readers.py:62-82) is replaced by an RQ decomposition.
"""
from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from PIL import Image

from riggs_tpu.camera.camera import focal2fov, make_camera
from riggs_tpu.data.dataset import Frame, SceneData


def _nerfpp_radius(cams) -> float:
    from riggs_tpu.train.static import compute_scene_extent

    return compute_scene_extent(cams)


def decompose_projection(P: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(K, R, camera_center) from a 3x4 projection matrix — numpy equivalent
    of cv2.decomposeProjectionMatrix (used at dataset_readers.py:71)."""
    M = P[:3, :3]
    # RQ decomposition via QR of the exchanged/transposed matrix
    E = np.asarray([[0, 0, 1], [0, 1, 0], [1, 0, 0]], dtype=M.dtype)
    Q, R_ = np.linalg.qr((E @ M).T)
    K = E @ R_.T @ E
    R = E @ Q.T
    # positive-diagonal convention
    S = np.diag(np.sign(np.diag(K)))
    K = K @ S
    R = S @ R
    if np.linalg.det(R) < 0:
        K, R = -K, -R
    center = -np.linalg.solve(M, P[:3, 3])
    return K, R, center


def load_K_Rt_from_P(P: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """K and the 4x4 camera pose (R^T | center), the reference contract at
    dataset_readers.py:62-82."""
    K, R, center = decompose_projection(P)
    K = K / K[2, 2]
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T
    pose[:3, 3] = center
    return K, pose


def load_dtu_scene(
    path: str | Path,
    render_camera: str = "cameras_sphere.npz",
    white_background: bool = False,
    n_init_points: int = 100_000,
    seed: int = 0,
) -> SceneData:
    """DTU/NeuS reader (readNeuSDTUInfo, dataset_readers.py:490-520).

    Pose post-processing (axis swaps, y/z flips, 0.5x translation scaling)
    follows readDTUCameras at dataset_readers.py:433-487 exactly.
    """
    path = Path(path)
    cams_npz = np.load(path / render_camera)
    images = sorted((path / "image").glob("*.png"))
    masks = sorted((path / "mask").glob("*.png"))
    n_images = len(images)
    frames, names = [], []
    for idx, (img_path, msk_path) in enumerate(zip(images, masks)):
        image = np.asarray(Image.open(img_path), np.float32) / 255.0
        mask = np.asarray(Image.open(msk_path), np.float32) / 255.0
        if mask.ndim == 3:
            mask = mask[..., 0]
        rgb = image[..., :3] * mask[..., None]
        world_mat = cams_npz[f"world_mat_{idx}"].astype(np.float32)
        scale_mat = cams_npz[f"scale_mat_{idx}"].astype(np.float32)
        fid = float(cams_npz[f"fid_{idx}"]) / (n_images / 12 - 1)
        P = (world_mat @ scale_mat)[:3, :4]
        K, pose = load_K_Rt_from_P(P)

        # the reference's in-place pose axis gymnastics (dataset_readers.py:455-472)
        a, b, c = pose[0:1], pose[1:2], pose[2:3]
        pose = np.concatenate([a, -c, -b, pose[3:]], 0)
        S = np.eye(3, dtype=np.float32)
        S[1, 1] = S[2, 2] = -1
        pose[1, 3] = -pose[1, 3]
        pose[2, 3] = -pose[2, 3]
        pose[:3, :3] = S @ pose[:3, :3] @ S
        a, b, c = pose[0:1], pose[1:2], pose[2:3]
        pose = np.concatenate([a, c, b, pose[3:]], 0)
        pose[:, 3] *= 0.5

        matrix = np.linalg.inv(pose)
        R = -matrix[:3, :3].T
        R[:, 0] = -R[:, 0]
        T = -matrix[:3, 3]

        H, W = rgb.shape[:2]
        fovy = focal2fov(K[0, 0], H)
        fovx = focal2fov(K[0, 0], W)
        cam = make_camera(R, T, W, H, fovx=fovx, fovy=fovy, fid=fid)
        frames.append(Frame(cam=cam, image=jnp.asarray(rgb), alpha_mask=jnp.asarray(mask)))
        names.append(img_path.stem)

    rng = np.random.default_rng(seed)
    pts = (rng.random((n_init_points, 3)).astype(np.float32) * 2.6) - 1.3
    cols = rng.random((n_init_points, 3)).astype(np.float32)
    return SceneData(
        train_frames=frames,
        test_frames=[],
        init_points=pts,
        init_colors=cols,
        cameras_extent=_nerfpp_radius([f.cam for f in frames]),
        is_blender=False,
        white_background=white_background,
        train_image_names=names,
    )


def load_plenoptic_scene(
    path: str | Path,
    num_images: int = 24,
    hold_id: tuple[int, ...] = (0,),
    eval_split: bool = True,
    white_background: bool = False,
    n_init_points: int = 100_000,
    seed: int = 0,
) -> SceneData:
    """Neu3D/plenoptic-video reader (readPlenopticVideoDataset,
    dataset_readers.py:827-912): LLFF poses_bounds.npy, one directory of
    frames per camera, cameras in ``hold_id`` held out for test."""
    path = Path(path)
    poses_bounds = np.load(path / "poses_bounds.npy")
    poses = poses_bounds[:, :15].reshape(-1, 3, 5)
    H, W, focal = poses[0, :, -1]
    n_cameras = poses.shape[0]
    poses = np.concatenate([poses[..., 1:2], -poses[..., :1], poses[..., 2:4]], -1)
    bottoms = np.broadcast_to(np.array([0, 0, 0, 1.0]), (n_cameras, 1, 4))
    poses = np.concatenate([poses, bottoms], axis=1) @ np.diag([1.0, -1, -1, 1])

    video_paths = sorted((path / "frames").iterdir())

    def read_split(cam_ids):
        frames, names = [], []
        for i in cam_ids:
            c2w = poses[i]
            matrix = np.linalg.inv(c2w)
            R = matrix[:3, :3].T
            T = matrix[:3, 3]
            image_names = sorted(p.name for p in video_paths[i].iterdir())[:num_images]
            for idx, image_name in enumerate(image_names):
                img = np.asarray(Image.open(video_paths[i] / image_name).convert("RGB"), np.float32) / 255.0
                fid = idx / (num_images - 1)
                h, w = img.shape[:2]
                cam = make_camera(
                    R, T, w, h, fovx=focal2fov(focal, w), fovy=focal2fov(focal, h), fid=fid
                )
                frames.append(Frame(cam=cam, image=jnp.asarray(img)))
                names.append(f"{video_paths[i].name}_{Path(image_name).stem}")
        return frames, names

    test_ids = sorted(set(hold_id) & set(range(n_cameras)))
    train_ids = sorted(set(range(n_cameras)) - set(hold_id))
    train, train_names = read_split(train_ids)
    test, _ = read_split(test_ids)
    if not eval_split:
        train, test = train + test, []

    rng = np.random.default_rng(seed)
    pts = (rng.random((n_init_points, 3)).astype(np.float32) * 2.6) - 1.3
    cols = rng.random((n_init_points, 3)).astype(np.float32)
    return SceneData(
        train_frames=train,
        test_frames=test,
        init_points=pts,
        init_colors=cols,
        cameras_extent=_nerfpp_radius([f.cam for f in train]),
        is_blender=False,
        white_background=white_background,
        train_image_names=train_names,
    )


def load_cmu_scene(
    path: str | Path,
    num_timesteps: int = 20,
    apply_cam_norm: bool = True,
    recenter_by_pcl: bool = True,
    white_background: bool = False,
) -> SceneData:
    """CMU-panoptic reader (readCMUSceneInfo/readCMUInfo,
    dataset_readers.py:914-999): {train,test}_meta.json with per-timestep
    per-camera intrinsics/extrinsics, seg/ masks as alpha, init_pt_cld.npz
    initial points with camera normalization + point-cloud recentering."""
    path = Path(path)

    def read_split(split):
        md = json.loads((path / f"{split}_meta.json").read_text())
        frames, names = [], []
        nt = min(num_timesteps, len(md["fn"]))
        for t in range(nt):
            for c in range(len(md["fn"][t])):
                w, h, k, w2c = md["w"], md["h"], md["k"][t][c], np.asarray(md["w2c"][t][c], np.float32)
                name = md["fn"][t][c]
                img = np.asarray(Image.open(path / "ims" / name).convert("RGB"), np.float32) / 255.0
                seg_path = path / "seg" / name.replace(".jpg", ".png")
                seg = None
                if seg_path.exists():
                    seg = np.asarray(Image.open(seg_path), np.float32)
                    if seg.ndim == 3:
                        seg = seg[..., 0]
                fx, fy = k[0][0], k[1][1]
                cam = make_camera(
                    w2c[:3, :3].T,
                    w2c[:3, 3],
                    w,
                    h,
                    fovx=2 * np.arctan(w / (2 * fx)),
                    fovy=2 * np.arctan(h / (2 * fy)),
                    fid=t / 150.0,
                )
                frames.append(
                    Frame(
                        cam=cam,
                        image=jnp.asarray(img),
                        alpha_mask=None if seg is None else jnp.asarray(seg),
                    )
                )
                names.append(name)
        return frames, names

    train, train_names = read_split("train")
    test, _ = read_split("test") if (path / "test_meta.json").exists() else ([], [])

    cams = [f.cam for f in train]
    radius = _nerfpp_radius(cams)
    centers = np.stack([np.linalg.inv(np.asarray(c.w2c))[:3, 3] for c in cams])
    translate = -centers.mean(0)

    pcd = np.load(path / "init_pt_cld.npz")["data"]
    xyz = pcd[:, :3].astype(np.float32)
    cols = pcd[:, 3:6].astype(np.float32)

    def retranslate(frames, delta, scale=1.0):
        out = []
        for f in frames:
            w2c = np.asarray(f.cam.w2c)
            c2w = np.linalg.inv(w2c)
            c2w[:3, 3] = (c2w[:3, 3] + delta) / scale
            new_w2c = np.linalg.inv(c2w).astype(np.float32)
            cam = make_camera(
                new_w2c[:3, :3].T,
                new_w2c[:3, 3],
                f.cam.width,
                f.cam.height,
                fovx=2 * np.arctan(f.cam.width / (2 * float(f.cam.intrinsics[0]))),
                fovy=2 * np.arctan(f.cam.height / (2 * float(f.cam.intrinsics[1]))),
                fid=float(f.cam.fid),
            )
            out.append(
                Frame(cam=cam, image=f.image, alpha_mask=f.alpha_mask)
            )
        return out

    if apply_cam_norm:
        train = retranslate(train, translate, radius)
        test = retranslate(test, translate, radius) if test else []
        xyz = (xyz + translate) / radius
    if recenter_by_pcl:
        center = xyz.mean(0)
        train = retranslate(train, -center)
        test = retranslate(test, -center) if test else []
        xyz = xyz - center

    return SceneData(
        train_frames=train,
        test_frames=test,
        init_points=xyz,
        init_colors=cols,
        cameras_extent=_nerfpp_radius([f.cam for f in train]),
        is_blender=False,
        white_background=white_background,
        train_image_names=train_names,
    )
