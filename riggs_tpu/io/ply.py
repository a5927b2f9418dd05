"""Binary PLY codec for Gaussian clouds — reference-compatible field layout.

Self-contained reader/writer (no plyfile dependency) producing the exact
schema of the reference's save_ply/load_ply (/root/reference/scene/
gaussian_model.py:253-336): float32 little-endian vertex element with fields
  x y z nx ny nz f_dc_0..2 f_rest_0..(3R-1) opacity scale_* rot_0..3 fea_*
where f_dc/f_rest are stored channel-major (the torch transpose(1,2) layout),
so checkpoints interchange bidirectionally with the reference implementation.
"""
from __future__ import annotations

import io
from pathlib import Path

import numpy as np

from riggs_tpu.models.gaussians import Gaussians


def write_ply(path: str | Path, arrays: dict[str, np.ndarray]):
    """Write named float32 columns as a binary_little_endian PLY vertex element."""
    n = next(iter(arrays.values())).shape[0]
    names = list(arrays)
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {n}"]
    header += [f"property float {name}" for name in names]
    header += ["end_header", ""]
    rec = np.zeros(n, dtype=[(name, "<f4") for name in names])
    for name in names:
        rec[name] = np.asarray(arrays[name], np.float32).reshape(n)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        f.write(rec.tobytes())


def read_ply(path: str | Path) -> dict[str, np.ndarray]:
    """Read a float32 binary PLY vertex element into named columns."""
    data = Path(path).read_bytes()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii").splitlines()
    n = None
    names = []
    fmt = None
    for line in header:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element" and parts[1] == "vertex":
            n = int(parts[2])
        elif parts[0] == "property" and len(parts) == 3:
            assert parts[1] in ("float", "float32"), f"unsupported property type {parts[1]}"
            names.append(parts[2])
    assert fmt == "binary_little_endian", f"unsupported format {fmt}"
    rec = np.frombuffer(data[end:], dtype=[(name, "<f4") for name in names], count=n)
    return {name: np.array(rec[name]) for name in names}


def save_gaussians_ply(path: str | Path, gs: Gaussians):
    """Reference-layout export of the ALIVE Gaussians."""
    alive = np.asarray(gs.alive)
    xyz = np.asarray(gs.xyz)[alive]
    n = xyz.shape[0]
    f_dc = np.asarray(gs.features_dc)[alive]  # (n, 1, 3)
    f_rest = np.asarray(gs.features_rest)[alive]  # (n, R, 3)
    # torch layout: transpose(1,2) then flatten -> channel-major
    f_dc_flat = np.transpose(f_dc, (0, 2, 1)).reshape(n, -1)
    f_rest_flat = np.transpose(f_rest, (0, 2, 1)).reshape(n, -1)
    cols: dict[str, np.ndarray] = {}
    for i, name in enumerate("xyz"):
        cols[name] = xyz[:, i]
    for i, name in enumerate(["nx", "ny", "nz"]):
        cols[name] = np.zeros(n, np.float32)
    for i in range(f_dc_flat.shape[1]):
        cols[f"f_dc_{i}"] = f_dc_flat[:, i]
    for i in range(f_rest_flat.shape[1]):
        cols[f"f_rest_{i}"] = f_rest_flat[:, i]
    cols["opacity"] = np.asarray(gs.opacity)[alive][:, 0]
    scaling = np.asarray(gs.scaling)[alive]
    for i in range(scaling.shape[1]):
        cols[f"scale_{i}"] = scaling[:, i]
    rot = np.asarray(gs.rotation)[alive]
    for i in range(4):
        cols[f"rot_{i}"] = rot[:, i]
    feat = np.asarray(gs.feature)[alive]
    for i in range(feat.shape[1]):
        cols[f"fea_{i}"] = feat[:, i]
    write_ply(path, cols)


def load_gaussians_ply(
    path: str | Path,
    capacity: int | None = None,
    max_sh_degree: int = 3,
    isotropic: bool = False,
    with_motion_mask: bool = True,
) -> Gaussians:
    """Load a reference-layout PLY into a capacity-padded Gaussians pytree."""
    import jax.numpy as jnp

    cols = read_ply(path)
    n = cols["x"].shape[0]
    capacity = capacity or 1 << (n - 1).bit_length()
    capacity = max(capacity, n)

    xyz = np.stack([cols["x"], cols["y"], cols["z"]], -1)
    f_dc_names = sorted((k for k in cols if k.startswith("f_dc_")), key=lambda s: int(s.split("_")[-1]))
    f_rest_names = sorted((k for k in cols if k.startswith("f_rest_")), key=lambda s: int(s.split("_")[-1]))
    rest_per_ch = len(f_rest_names) // 3
    f_dc = np.stack([cols[k] for k in f_dc_names], -1).reshape(n, 3, 1).transpose(0, 2, 1)
    f_rest = (
        np.stack([cols[k] for k in f_rest_names], -1).reshape(n, 3, rest_per_ch).transpose(0, 2, 1)
    )
    scale_names = sorted((k for k in cols if k.startswith("scale_")), key=lambda s: int(s.split("_")[-1]))
    scaling = np.stack([cols[k] for k in scale_names], -1)
    if isotropic:
        scaling = scaling[:, :1]
    rot = np.stack([cols[f"rot_{i}"] for i in range(4)], -1)
    fea_names = sorted((k for k in cols if k.startswith("fea_")), key=lambda s: int(s.split("_")[-1]))
    feat = (
        np.stack([cols[k] for k in fea_names], -1) if fea_names else np.zeros((n, 0), np.float32)
    )

    def pad(a, fill=0.0):
        return np.concatenate([a, np.full((capacity - n,) + a.shape[1:], fill, a.dtype)], 0)

    rot_pad = np.tile(np.array([1, 0, 0, 0], np.float32), (capacity, 1))
    rot_pad[:n] = rot
    return Gaussians(
        xyz=jnp.asarray(pad(xyz)),
        features_dc=jnp.asarray(pad(f_dc)),
        features_rest=jnp.asarray(pad(f_rest)),
        scaling=jnp.asarray(pad(scaling)),
        rotation=jnp.asarray(rot_pad),
        opacity=jnp.asarray(pad(cols["opacity"][:, None])),
        feature=jnp.asarray(pad(feat)),
        alive=jnp.arange(capacity) < n,
        max_sh_degree=max_sh_degree,
        isotropic=isotropic,
        with_motion_mask=with_motion_mask and feat.shape[1] > 0,
    )
