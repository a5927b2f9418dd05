"""Nerfies / HyperNeRF dataset reader (dataset.json + per-camera json).

Parity with the reference's readNerfiesCameras path (sceneLoadTypeCallbacks
'nerfies', /root/reference/scene/dataset_readers.py): scene layout
  dataset.json   {ids, train_ids, val_ids}
  metadata.json  {id: {time_id / appearance_id, camera_id}}
  scene.json     {scale, center} (optional)
  camera/<id>.json {orientation (3,3 w2c rows), position, focal_length,
                    principal_point, image_size}
  rgb/<N>x/<id>.png
"""
from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from PIL import Image

from riggs_tpu.camera.camera import make_camera
from riggs_tpu.data.dataset import Frame, SceneData, pad_thinned, thin_mask_skeleton


def load_nerfies_scene(
    path: str | Path,
    scale_dir: int = 2,
    white_background: bool = False,
    n_init_points: int = 100_000,
    seed: int = 0,
    max_thinned: int = 2048,
    compute_thinned: bool = False,
) -> SceneData:
    path = Path(path)
    ds = json.loads((path / "dataset.json").read_text())
    meta = json.loads((path / "metadata.json").read_text())
    scene_meta = {}
    if (path / "scene.json").exists():
        scene_meta = json.loads((path / "scene.json").read_text())
    coord_scale = scene_meta.get("scale", 1.0)
    scene_center = np.asarray(scene_meta.get("center", [0.0, 0.0, 0.0]))

    all_ids = ds["ids"]
    train_ids = set(ds.get("train_ids", all_ids))
    max_time = max(int(meta[i].get("time_id", meta[i].get("warp_id", 0))) for i in all_ids) or 1

    def build(img_id):
        cam_js = json.loads((path / "camera" / f"{img_id}.json").read_text())
        orientation = np.asarray(cam_js["orientation"])  # w2c rotation rows
        position = np.asarray(cam_js["position"])
        focal = cam_js["focal_length"] / scale_dir
        pp = np.asarray(cam_js.get("principal_point", [0, 0])) / scale_dir

        img_path = path / "rgb" / f"{scale_dir}x" / f"{img_id}.png"
        rgb = np.asarray(Image.open(img_path).convert("RGB"), np.float32) / 255.0
        H, W = rgb.shape[:2]

        position = (position - scene_center) * coord_scale
        R = orientation.T  # store c2w rotation (reference convention)
        T = -orientation @ position
        K = np.array(
            [[focal, 0, pp[0] if pp[0] > 0 else W / 2], [0, focal, pp[1] if pp[1] > 0 else H / 2], [0, 0, 1]],
            np.float32,
        )
        fid = int(meta[img_id].get("time_id", meta[img_id].get("warp_id", 0))) / max_time
        cam = make_camera(R, T, W, H, K=K, fid=fid)
        thinned = thinned_mask = None
        if compute_thinned:
            coords = thin_mask_skeleton(rgb.sum(-1) > 0.05)
            if len(coords):
                tp, tm = pad_thinned(coords, max_thinned)
                thinned, thinned_mask = jnp.asarray(tp), jnp.asarray(tm)
        return Frame(cam=cam, image=jnp.asarray(rgb), thinned=thinned, thinned_mask=thinned_mask)

    train = [build(i) for i in all_ids if i in train_ids]
    test = [build(i) for i in all_ids if i not in train_ids]

    if (path / "points.npy").exists():
        pts = np.load(path / "points.npy").astype(np.float32)
        pts = (pts - scene_center) * coord_scale
        cols = np.full((len(pts), 3), 0.5, np.float32)
    else:
        rng = np.random.default_rng(seed)
        pts = rng.random((n_init_points, 3)).astype(np.float32) * 2.6 - 1.3
        cols = rng.random((n_init_points, 3)).astype(np.float32)

    from riggs_tpu.train.static import compute_scene_extent

    return SceneData(
        train_frames=train,
        test_frames=test,
        init_points=pts,
        init_colors=cols,
        cameras_extent=compute_scene_extent([f.cam for f in train]),
        is_blender=False,
        white_background=white_background,
    )
