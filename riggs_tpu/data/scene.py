"""Scene loading dispatch — the sceneLoadTypeCallbacks equivalent.

Parity with /root/reference/scene/__init__.py:46-70: sniff the source
directory to pick the reader (transforms_train.json -> blender/D-NeRF;
sparse/ -> COLMAP; cameras.pkl under train/ -> ZJU).
"""
from __future__ import annotations

from pathlib import Path

from riggs_tpu.data.dataset import SceneData


def load_scene(source_path: str | Path, white_background: bool = False, resolution: int = 1, **kwargs) -> SceneData:
    p = Path(source_path)
    if (p / "transforms_train.json").exists():
        from riggs_tpu.data.blender import load_blender_scene

        return load_blender_scene(p, white_background=white_background, resolution=max(resolution, 1), **kwargs)
    if (p / "train" / "cameras.pkl").exists():
        from riggs_tpu.data.zju import load_zju_scene

        return load_zju_scene(p, white_background=white_background, **kwargs)
    if (p / "dataset.json").exists():
        from riggs_tpu.data.nerfies import load_nerfies_scene

        return load_nerfies_scene(p, white_background=white_background, **kwargs)
    if (p / "sparse").exists() or (p / "colmap_sparse").exists():
        from riggs_tpu.data.colmap import load_colmap_scene

        return load_colmap_scene(p, resolution=max(resolution, 1), **kwargs)
    if (p / "cameras_sphere.npz").exists():
        from riggs_tpu.data.more_readers import load_dtu_scene

        return load_dtu_scene(p, white_background=white_background, **kwargs)
    if (p / "poses_bounds.npy").exists():
        from riggs_tpu.data.more_readers import load_plenoptic_scene

        return load_plenoptic_scene(p, white_background=white_background, **kwargs)
    if (p / "train_meta.json").exists():
        from riggs_tpu.data.more_readers import load_cmu_scene

        return load_cmu_scene(p, white_background=white_background, **kwargs)
    raise FileNotFoundError(f"could not infer scene type for {source_path}")
