"""Checkpoint / resume for full training states.

The reference checkpoints four separate artifacts and loses optimizer state
(SURVEY.md §5: PLY + .pth state_dicts + skeleton_tree.npz + cfg_args, Adam
moments not saved). Here a checkpoint is the WHOLE pytree — model params,
alive masks, Adam moments, densify statistics — flattened to a single .npz
with path-encoded keys, plus the config JSON. Resume is bit-exact.

Directory layout (reference-compatible where it matters):
  <model_path>/point_cloud/iteration_N/point_cloud.ply   (interchange PLY)
  <model_path>/checkpoints/iteration_N/state.npz         (full pytree)
  <model_path>/skeleton_tree.npz                         (joints/parents/...)
  <model_path>/cfg.json
"""
from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any

import jax
import numpy as np


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = jax.tree_util.keystr(path)
        flat[key] = np.asarray(leaf)
    return flat


def save_state_npz(path: str | Path, tree: Any):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **_flatten(tree))


def load_state_npz(path: str | Path, template: Any) -> Any:
    """Restore a pytree saved by save_state_npz into the structure of
    ``template`` (shapes/dtypes must match)."""
    data = np.load(path)
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for path_elems, leaf in leaves_paths:
        key = jax.tree_util.keystr(path_elems)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key}")
        arr = data[key]
        if arr.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch for {key}: ckpt {arr.shape} vs template {np.shape(leaf)}")
        new_leaves.append(jax.numpy.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_skeleton_tree(model_path: str | Path, joints, parents, indices, template_idx: int):
    """skeleton_tree.npz with the reference's key names (train_rig.py:233)."""
    p = Path(model_path)
    p.mkdir(parents=True, exist_ok=True)
    np.savez(
        p / "skeleton_tree.npz",
        nodes=np.asarray(joints),
        parents=np.asarray(parents),
        indices=np.asarray(indices),
        template_idx=int(template_idx),
    )


def load_skeleton_tree(model_path: str | Path):
    d = np.load(Path(model_path) / "skeleton_tree.npz")
    return d["nodes"], d["parents"], d["indices"], int(d["template_idx"])


def search_max_iteration(folder: str | Path) -> int | None:
    """Latest iteration_N subdirectory (reference searchForMaxIteration)."""
    folder = Path(folder)
    if not folder.exists():
        return None
    iters = []
    for child in folder.iterdir():
        m = re.fullmatch(r"iteration_(\d+)", child.name)
        if m:
            iters.append(int(m.group(1)))
    return max(iters) if iters else None


def save_checkpoint(model_path: str | Path, iteration: int, state: Any, gs=None, cfg=None):
    """Save the full state (+ optional interchange PLY and config)."""
    base = Path(model_path)
    save_state_npz(base / "checkpoints" / f"iteration_{iteration}" / "state.npz", state)
    if gs is not None:
        from riggs_tpu.io.ply import save_gaussians_ply

        save_gaussians_ply(base / "point_cloud" / f"iteration_{iteration}" / "point_cloud.ply", gs)
    if cfg is not None:
        (base / "cfg.json").write_text(cfg.to_json())


def load_checkpoint(model_path: str | Path, template: Any, iteration: int = -1) -> tuple[Any, int]:
    base = Path(model_path) / "checkpoints"
    it = search_max_iteration(base) if iteration == -1 else iteration
    if it is None:
        raise FileNotFoundError(f"no checkpoints under {base}")
    return load_state_npz(base / f"iteration_{it}" / "state.npz", template), it


# ---------------------------------------------------------------------------
# Sharded-aware checkpoints (orbax)
# ---------------------------------------------------------------------------


def save_checkpoint_sharded(model_path: str | Path, iteration: int, state: Any):
    """Sharded-aware full-state checkpoint via orbax.

    Unlike the host-gathered .npz path, each process writes only the shards
    it owns — the multi-host form of SURVEY.md §5's "orbax-style checkpoint
    of the full pytree incl. optimizer state". On a single host this is a
    drop-in alternative; on a pod it avoids gathering the replicated state
    through one host. Synchronous (waits for the write to land).
    """
    import orbax.checkpoint as ocp

    path = (Path(model_path) / "orbax" / f"iteration_{iteration}").absolute()
    # orbax refuses zero-size arrays (e.g. (C, 0) feature planes when
    # hyper_dim == 0); they carry no data, so stand in a scalar and rebuild
    # from the template's shape/dtype at load
    state = jax.tree.map(
        lambda x: np.zeros((), np.float32) if getattr(x, "size", 1) == 0 else x, state
    )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def load_checkpoint_sharded(
    model_path: str | Path, template: Any, iteration: int = -1
) -> tuple[Any, int]:
    """Restore a sharded orbax checkpoint onto ``template``'s shardings.

    Each leaf is restored with the sharding carried by the corresponding
    template leaf (e.g. replicated over a fresh Mesh), so a pod restart can
    re-shard directly from storage without a host-memory gather.
    """
    import orbax.checkpoint as ocp

    base = Path(model_path) / "orbax"
    it = search_max_iteration(base) if iteration == -1 else iteration
    if it is None:
        raise FileNotFoundError(f"no orbax checkpoints under {base}")
    def abstract_leaf(x):
        if not hasattr(x, "shape"):
            return x
        if getattr(x, "size", 1) == 0:  # saved as a scalar stand-in
            return jax.ShapeDtypeStruct((), np.float32)
        return jax.ShapeDtypeStruct(tuple(x.shape), x.dtype, sharding=getattr(x, "sharding", None))

    abstract = jax.tree.map(abstract_leaf, template)
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore((base / f"iteration_{it}").absolute(), abstract)
    ckptr.close()
    # rebuild zero-size leaves (their content is fully determined by the
    # template's shape/dtype/sharding)
    import jax.numpy as jnp

    out = jax.tree.map(
        lambda t, o: jax.device_put(jnp.zeros(t.shape, t.dtype), getattr(t, "sharding", None))
        if getattr(t, "size", 1) == 0
        else o,
        template,
        out,
    )
    return out, it
