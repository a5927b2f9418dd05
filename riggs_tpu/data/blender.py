"""Blender / D-NeRF dataset reader (transforms_train.json format).

Parity with /root/reference/scene/dataset_readers.py:284-380
(readCamerasFromTransforms / readNerfSyntheticInfo): NeRF c2w matrices
converted with the same axis flips, per-frame time from the 'time' field (or
frame index), alpha-composited images, thinned 2D skeletons from
train_thinned/<name>_thinned.png (or computed on the fly from the alpha mask
with the built-in Zhang-Suen thinning), semantic segmentations from
semantic_seg/<name>_seg.npy, and a random 100k-point init cloud.
"""
from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from PIL import Image

from riggs_tpu.camera.camera import make_camera, focal2fov, fov2focal
from riggs_tpu.data.dataset import Frame, SceneData, pad_thinned, thin_mask_skeleton


def _nerf_c2w_to_rt(c2w: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """NeRF/blender c2w -> (R, T) in the reference's convention
    (dataset_readers.py:305-308)."""
    matrix = np.linalg.inv(np.asarray(c2w))
    R = -matrix[:3, :3].T
    R[:, 0] = -R[:, 0]
    T = -matrix[:3, 3]
    return R, T


def read_transforms(
    path: str | Path,
    transforms_file: str,
    white_background: bool = False,
    resolution: int = 1,
    max_thinned: int = 2048,
    compute_thinned: bool = True,
) -> list[Frame]:
    path = Path(path)
    contents = json.loads((path / transforms_file).read_text())
    fovx = contents["camera_angle_x"]
    frames_json = sorted(
        contents["frames"],
        key=lambda x: int(Path(x["file_path"]).name.split(".")[0].split("_")[-1]),
    )
    frames = []
    names = []
    for idx, fr in enumerate(frames_json):
        fp = fr["file_path"]
        img_path = path / (fp if fp.endswith((".png", ".jpg")) else fp + ".png")
        fid = fr.get("time", idx / len(frames_json))
        image = Image.open(img_path)
        if resolution > 1:
            image = image.resize((image.width // resolution, image.height // resolution), Image.LANCZOS)
        im = np.asarray(image.convert("RGBA"), np.float32) / 255.0
        mask = im[..., 3]
        bg = np.ones(3, np.float32) if white_background else np.zeros(3, np.float32)
        rgb = im[..., :3] * im[..., 3:4] + bg * (1.0 - im[..., 3:4])

        R, T = _nerf_c2w_to_rt(fr["transform_matrix"])
        H, W = rgb.shape[:2]
        fovy = focal2fov(fov2focal(fovx, W), H)
        cam = make_camera(R, T, W, H, fovx=fovx, fovy=fovy, fid=float(fid))

        name = img_path.stem
        thinned_path = path / "train_thinned" / f"{name}_thinned.png"
        if thinned_path.exists():
            tarr = np.asarray(Image.open(thinned_path).convert("L"))
            if resolution > 1:
                coords = np.argwhere(tarr > 0).astype(np.float32) / resolution
            else:
                coords = np.argwhere(tarr > 0).astype(np.float32)
        elif compute_thinned:
            coords = thin_mask_skeleton(mask)
        else:
            coords = None
        if coords is not None and len(coords) > 0:
            tp, tm = pad_thinned(coords, max_thinned)
            thinned, thinned_mask = jnp.asarray(tp), jnp.asarray(tm)
        else:
            thinned, thinned_mask = None, None

        seg_path = path / "semantic_seg" / f"{name}_seg.npy"
        seg = None
        if seg_path.exists():
            seg = jnp.asarray(np.load(seg_path)[0].astype(np.int32))

        frames.append(
            Frame(
                cam=cam,
                image=jnp.asarray(rgb),
                alpha_mask=jnp.asarray(mask),
                thinned=thinned,
                thinned_mask=thinned_mask,
                semantic_seg=seg,
            )
        )
        names.append(name)
    return frames, names


def load_blender_scene(
    path: str | Path,
    white_background: bool = False,
    resolution: int = 1,
    n_init_points: int = 100_000,
    seed: int = 0,
    max_thinned: int = 2048,
) -> SceneData:
    """Full D-NeRF scene: train + test transforms + random init cloud
    (dataset_readers.py readNerfSyntheticInfo)."""
    path = Path(path)
    train, train_names = read_transforms(
        path, "transforms_train.json", white_background, resolution, max_thinned
    )
    test_file = path / "transforms_test.json"
    test = (
        read_transforms(path, "transforms_test.json", white_background, resolution, max_thinned)[0]
        if test_file.exists()
        else []
    )
    rng = np.random.default_rng(seed)
    # reference: random 100k points in [-1.3, 1.3]^3 with random SH colors
    pts = (rng.random((n_init_points, 3)).astype(np.float32) * 2.6) - 1.3
    cols = rng.random((n_init_points, 3)).astype(np.float32)

    from riggs_tpu.train.static import compute_scene_extent

    return SceneData(
        train_frames=train,
        test_frames=test,
        init_points=pts,
        init_colors=cols,
        cameras_extent=compute_scene_extent([f.cam for f in train]),
        is_blender=True,
        white_background=white_background,
        train_image_names=train_names,
    )
