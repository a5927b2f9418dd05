"""SkeletonWarp: skeleton-driven deformation for stage 2 (the rigged model).

Functional re-design of /root/reference/skeleton_utils/skeleton_warp.py:10-300
and network_utils.py:6-150:
  * PoseMLP maps time -> per-joint local quaternions (+[1,0,0,0] bias) and a
    global translation;
  * the kinematic chain poses the joints (ops/fk.py — depth-level batched
    matmuls instead of the sequential python loop at skeleton_warp.py:257-263);
  * Gaussians are skinned to *bones* by Gaussian-kernel distance-to-segment
    weights (point_segment_dist2), optionally modulated by a WeightMLP;
  * LBS blend of global joint transforms + quaternion-blend rotation residual;
  * a DeformMLP "detail net" predicts per-Gaussian template offsets from
    (position, pose).

The joint tree (parents) is static; joints are non-trainable (only their
radii, the MLPs and the pose net train). ``deform_by_pose`` drives rendering
from arbitrary pose dicts — the API used for interpolation / random-motion
synthesis / interactive editing.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.models.mlp import (
    embed_dim,
    linear_apply,
    linear_init,
    mlp_hidden,
    mlp_init,
    positional_embed,
)
from riggs_tpu.ops.fk import forward_kinematics
from riggs_tpu.ops.geometry import point_segment_dist2
from riggs_tpu.ops.quaternion import quat_to_rotmat, rotmat_to_quat

ROT_BIAS = np.array([1.0, 0.0, 0.0, 0.0], np.float32)


@dataclasses.dataclass(frozen=True)
class SkeletonNetDef:
    """Static architecture description for the three stage-2 MLPs."""

    n_joints: int
    parents: tuple  # length J; parents[0] == 0 (root)
    K: int = -1  # bones per point; <=0 = dense (all bones)
    use_skinning_mlp: bool = True
    use_template_offsets: bool = True
    pose_depth: int = 8
    pose_width: int = 256
    pose_multires: int = 8
    weight_depth: int = 8
    weight_width: int = 256
    weight_multires: int = 10
    detail_depth: int = 8
    detail_width: int = 256
    detail_multires_x: int = 4

    @property
    def n_bones(self) -> int:
        return self.n_joints - 1

    @property
    def pose_out(self) -> int:
        return self.n_joints * 4


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SkeletonWarp:
    joints: jax.Array  # (J, 3) rest joints — fixed
    node_radius_log: jax.Array  # (J,) log per-joint kernel radius — trainable
    pose_mlp: Any
    weight_mlp: Any  # None when not use_skinning_mlp
    detail_mlp: Any  # None when not use_template_offsets
    control_nodes: jax.Array  # (C, 3) buffer (FPS of the gaussians; vis/detail)
    net: SkeletonNetDef = dataclasses.field(metadata=dict(static=True))

    @property
    def node_radius(self) -> jax.Array:
        return jnp.exp(self.node_radius_log)

    def params_dict(self) -> dict:
        p = {"radius": self.node_radius_log, "pose": self.pose_mlp}
        if self.net.use_skinning_mlp:
            p["skinning_mlp"] = self.weight_mlp
        if self.net.use_template_offsets:
            p["detail_net"] = self.detail_mlp
        return p

    def replace_params(self, p: dict) -> "SkeletonWarp":
        return dataclasses.replace(
            self,
            node_radius_log=p["radius"],
            pose_mlp=p["pose"],
            weight_mlp=p.get("skinning_mlp", self.weight_mlp),
            detail_mlp=p.get("detail_net", self.detail_mlp),
        )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_skeleton_warp(
    key: jax.Array,
    joints: np.ndarray,
    parents,
    node_radius_log: np.ndarray | None = None,
    K: int = -1,
    use_skinning_mlp: bool = True,
    use_template_offsets: bool = True,
    n_control_nodes: int = 512,
) -> SkeletonWarp:
    J = joints.shape[0]
    net = SkeletonNetDef(
        n_joints=J,
        parents=tuple(int(p) for p in parents),
        K=K,
        use_skinning_mlp=use_skinning_mlp,
        use_template_offsets=use_template_offsets,
    )
    k1, k2, k3 = jax.random.split(key, 3)

    # PoseMLP: trunk torch-default init, heads torch-default (network_utils:115-150)
    t_dim = embed_dim(1, net.pose_multires)
    pose = mlp_init(k1, t_dim, net.pose_width, 0, net.pose_depth, skips=(net.pose_depth // 2,), hidden_kind="torch_default")
    pose.pop("head")
    kk = jax.random.split(k1, 2)
    pose["rotation"] = linear_init(kk[0], net.pose_width, net.pose_out, kind="torch_default")
    pose["translation"] = linear_init(kk[1], net.pose_width, 3, kind="torch_default")

    weight = None
    if use_skinning_mlp:
        x_dim = embed_dim(3, net.weight_multires)
        weight = mlp_init(k2, x_dim, net.weight_width, 0, net.weight_depth, skips=(net.weight_depth // 2,), hidden_kind="torch_default")
        weight.pop("head")
        weight["head"] = linear_init(jax.random.fold_in(k2, 1), net.weight_width, net.n_bones, kind="torch_default")

    detail = None
    if use_template_offsets:
        # DeformMLP(xyz_input_ch=3, time_input_ch=J*4, t_multires=-1, multires=4)
        d_in = embed_dim(3, net.detail_multires_x) + net.pose_out
        detail = mlp_init(k3, d_in, net.detail_width, 3, net.detail_depth, skips=(net.detail_depth // 2,), out_kind="normal", out_std=1e-5)

    if node_radius_log is None:
        rng_span = float(np.ptp(np.asarray(joints)))
        node_radius_log = np.log(0.1 * rng_span + 1e-7) * np.ones(J, np.float32)

    return SkeletonWarp(
        joints=jnp.asarray(joints, jnp.float32),
        node_radius_log=jnp.asarray(node_radius_log, jnp.float32),
        pose_mlp=pose,
        weight_mlp=weight,
        detail_mlp=detail,
        control_nodes=jnp.zeros((n_control_nodes, 3)),
        net=net,
    )


# ---------------------------------------------------------------------------
# networks
# ---------------------------------------------------------------------------


def pose_at(warp: SkeletonWarp, t: jax.Array) -> dict:
    """PoseMLP(t) -> local rotations (J, 4) incl. the [1,0,0,0] bias, and
    global translation (3,)."""
    net = warp.net
    t_emb = positional_embed(jnp.reshape(t, (1, 1)), net.pose_multires)
    h = mlp_hidden(warp.pose_mlp, t_emb, skips=(net.pose_depth // 2,))
    rot = linear_apply(warp.pose_mlp["rotation"], h).reshape(net.n_joints, 4)
    trans = linear_apply(warp.pose_mlp["translation"], h)[0]
    return {"local_rotation": rot + jnp.asarray(ROT_BIAS), "global_trans": trans}


def skinning_mlp_weights(warp: SkeletonWarp, x: jax.Array) -> jax.Array:
    """(N, n_bones) sigmoid multiplicative offsets (WeightMLP)."""
    net = warp.net
    x_emb = positional_embed(x, net.weight_multires)
    h = mlp_hidden(warp.weight_mlp, x_emb, skips=(net.weight_depth // 2,))
    return jax.nn.sigmoid(linear_apply(warp.weight_mlp["head"], h))


def detail_offsets(warp: SkeletonWarp, x: jax.Array, pose_vec: jax.Array) -> jax.Array:
    """(N, 3) template offsets from DeformMLP(x, pose)."""
    net = warp.net
    x_emb = positional_embed(x, net.detail_multires_x)
    pose = jnp.broadcast_to(pose_vec[None, :], (x.shape[0], pose_vec.shape[0]))
    inp = jnp.concatenate([x_emb, pose], axis=-1)
    h = mlp_hidden(warp.detail_mlp, inp, skips=(net.detail_depth // 2,))
    return linear_apply(warp.detail_mlp["head"], h)


# ---------------------------------------------------------------------------
# skinning
# ---------------------------------------------------------------------------


def bone_dist2(warp: SkeletonWarp, x: jax.Array, joints: jax.Array | None = None) -> jax.Array:
    """Squared distance of each point to each bone segment (N, n_bones).

    Bone j (j = 1..J-1) runs from joints[parents[j]] to joints[j]."""
    joints = warp.joints if joints is None else joints
    parents = np.asarray(warp.net.parents)
    b = joints[1:]
    a = joints[parents[1:]]
    return point_segment_dist2(a, b, x)


def cal_nn_weight_skeleton(
    warp: SkeletonWarp,
    x: jax.Array,
    joints: jax.Array | None = None,
    use_skinning_mlp: bool | jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Skinning weights (skeleton_warp.py:41-76).

    Returns (weight (N, K'), dist2 (N, K'), joint_idx (N, K')) where joint_idx
    points at the bone's child joint (bone index + 1)."""
    use_sm = warp.net.use_skinning_mlp if use_skinning_mlp is None else use_skinning_mlp
    if warp.weight_mlp is None:
        use_sm = False
    # traced 0/1 weight: w_sm=0 blends offs -> 1 (exact no-op), so the staged
    # skinning-MLP unlock (train_rig.py:398-408) reuses one compiled program
    # instead of recompiling the whole training step. `False` (python bool)
    # keeps the MLP out of the graph entirely for nets that never enable it.
    mlp_in_graph = not (isinstance(use_sm, bool) and not use_sm)
    d2 = bone_dist2(warp, jax.lax.stop_gradient(x), joints)
    if warp.net.K > 0:
        K = warp.net.K
        neg, bone_idx = jax.lax.top_k(-d2, K)
        nn_d2 = -neg
        joint_idx = bone_idx + 1
        if mlp_in_graph:
            offs = skinning_mlp_weights(warp, x)
            offs = jnp.take_along_axis(offs, bone_idx, axis=1)
        else:
            offs = None
    else:
        nn_d2 = d2
        joint_idx = jnp.broadcast_to(
            jnp.arange(1, warp.net.n_joints, dtype=jnp.int32)[None, :], d2.shape
        )
        offs = skinning_mlp_weights(warp, x) if mlp_in_graph else None

    radius = warp.node_radius[joint_idx]
    w = jnp.exp(-nn_d2 / (2.0 * radius**2))
    if offs is not None:
        w_sm = jnp.float32(use_sm)
        w = w * (1.0 + w_sm * (offs - 1.0))
    w = w + 1e-7
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return w, nn_d2, joint_idx


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _dense_skin_weights(
    warp: SkeletonWarp,
    x: jax.Array,
    joints: jax.Array | None = None,
    use_skinning_mlp: bool | jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Dense (N, B) skinning weights over all bones with an exact top-K mask.

    Same kernel/+1e-7/normalization as :func:`cal_nn_weight_skeleton`; masked
    entries are exactly 0 so (N, B) @ (B, C) blends match the gathered sums
    up to f32 reassociation (the gathered form's backward is a scatter-add —
    see deform_by_pose). Returns (w_dense, d2, bone_idx (N, K'))."""
    from riggs_tpu.ops.knn import _small_k

    use_sm = warp.net.use_skinning_mlp if use_skinning_mlp is None else use_skinning_mlp
    if warp.weight_mlp is None:
        use_sm = False
    mlp_in_graph = not (isinstance(use_sm, bool) and not use_sm)
    d2 = bone_dist2(warp, jax.lax.stop_gradient(x), joints)
    B = d2.shape[-1]
    if warp.net.K > 0 and warp.net.K < B:
        _, bone_idx = _small_k(jax.lax.stop_gradient(d2), warp.net.K)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
        mask = jnp.zeros(d2.shape, bool)
        for k in range(warp.net.K):
            mask = mask | (cols == bone_idx[:, k : k + 1])
    else:
        bone_idx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[None, :], d2.shape)
        mask = None
    radius_b = warp.node_radius[1:]  # per-bone child-joint radius
    w = jnp.exp(-d2 / (2.0 * radius_b[None, :] ** 2))
    if mlp_in_graph:
        offs = skinning_mlp_weights(warp, x)  # (N, B) — already dense
        w_sm = jnp.float32(use_sm)
        w = w * (1.0 + w_sm * (offs - 1.0))
    if mask is not None:
        w = jnp.where(mask, w + 1e-7, 0.0)
    else:
        w = w + 1e-7
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return w, d2, bone_idx


def deform_by_pose(
    warp: SkeletonWarp,
    x: jax.Array,
    local_rotation: jax.Array,
    global_trans: jax.Array,
    motion_mask: jax.Array,
    enable_template_offsets: bool | jax.Array | None = None,
    enable_skinning_mlp: bool | jax.Array | None = None,
) -> dict:
    """Pose the skeleton and skin the Gaussians (skeleton_warp.py:130-172).

    The enable_* flags implement the reference's staged unlocking
    (train_rig.py:398-408: template offsets + skinning MLP are switched off
    until iteration 15000). They accept traced 0/1 arrays so the unlock does
    not recompile the training step (exact: weight-form no-ops at 0); the
    param pytree keeps both MLPs either way so optimizer state stays
    structure-stable across the unlock."""
    use_to = warp.net.use_template_offsets if enable_template_offsets is None else enable_template_offsets
    use_sm = warp.net.use_skinning_mlp if enable_skinning_mlp is None else enable_skinning_mlp
    x = jax.lax.stop_gradient(x)
    rot_mats = quat_to_rotmat(local_rotation)
    posed_joints, G = forward_kinematics(rot_mats, warp.joints, warp.net.parents)
    Grot = G[:, :3, :3]
    Gtrans = G[:, :3, 3]
    node_rot = rotmat_to_quat(jax.lax.stop_gradient(Grot))

    # dense masked skinning (round 5, same reshaping as node_warp.warp_forward):
    # blend weights live dense over the B bones with an exact top-K mask, so
    # the LBS average and the quat blend are (N, B) @ (B, C) MXU matmuls —
    # the gathered form's backward is a scatter-add into the bone tables,
    # row-op bound over N*K rows.
    w_dense, _, bone_idx = _dense_skin_weights(warp, x, use_skinning_mlp=use_sm)
    nn_idx = bone_idx + 1
    nn_weight = jnp.take_along_axis(w_dense, bone_idx, axis=-1)  # sparse view
    B = Grot.shape[0] - 1
    table = jnp.concatenate(
        [Grot[1:].reshape(B, 9), Gtrans[1:], node_rot[1:]], axis=-1
    )  # (B, 16)
    blended = jnp.dot(w_dense, table, preferred_element_type=jnp.float32)
    WR = blended[:, :9].reshape(-1, 3, 3)
    Ax_avg = jnp.einsum("nab,nb->na", WR, x) + blended[:, 9:12]

    # traced 0/1 weight (same one-compiled-program rationale as the skinning
    # MLP above); a python-bool False keeps the detail MLP out of the graph
    if warp.detail_mlp is not None and not (isinstance(use_to, bool) and not use_to):
        pose_vec = jax.lax.stop_gradient(local_rotation).reshape(-1)
        template_offsets = jnp.float32(use_to) * detail_offsets(warp, x, pose_vec)
    else:
        template_offsets = jnp.zeros_like(x)
    Ax_avg = Ax_avg + global_trans + template_offsets

    translate = (Ax_avg - x) * motion_mask
    rotation = blended[:, 12:16] * motion_mask
    return {
        "d_xyz": translate,
        "d_rotation": rotation,
        "d_scaling": jnp.zeros_like(x),
        "d_nodes": posed_joints + global_trans,
        "nn_idx": nn_idx,
        "nn_weight": nn_weight,
        "local_rotation": local_rotation,
        "global_trans": global_trans,
        "template_offsets": template_offsets,
        "d_opacity": None,
        "d_color": None,
    }


def skeleton_forward(
    warp: SkeletonWarp,
    x: jax.Array,
    t: jax.Array,
    motion_mask: jax.Array,
    enable_template_offsets: bool | jax.Array | None = None,
    enable_skinning_mlp: bool | jax.Array | None = None,
) -> dict:
    """Full forward: pose_net(t) then deform_by_pose (skeleton_warp.py:112-126)."""
    pose = pose_at(warp, t)
    return deform_by_pose(
        warp,
        x,
        pose["local_rotation"],
        pose["global_trans"],
        motion_mask,
        enable_template_offsets=enable_template_offsets,
        enable_skinning_mlp=enable_skinning_mlp,
    )


def deform_by_pose_dq(
    warp: SkeletonWarp,
    x: jax.Array,
    local_rotation: jax.Array,
    global_trans: jax.Array,
    motion_mask: jax.Array,
) -> dict:
    """Dual-quaternion skinning variant of deform_by_pose.

    The reference ships a full DQ toolkit that its trainers never wire up
    (/root/reference/utils/dual_quaternion.py, SURVEY.md §2.6 'capability to
    keep'); here it is a first-class alternative: per-bone global transforms
    become unit dual quaternions, blended with the skinning weights (DQB),
    avoiding LBS candy-wrapper artifacts on twisting joints.
    """
    from riggs_tpu.ops.quaternion import dq_blend, dq_apply, qt_to_dq

    x = jax.lax.stop_gradient(x)
    rot_mats = quat_to_rotmat(local_rotation)
    nn_weight, _, nn_idx = cal_nn_weight_skeleton(warp, x)
    posed_joints, G = forward_kinematics(rot_mats, warp.joints, warp.net.parents)
    q_global = rotmat_to_quat(G[:, :3, :3])
    q_r, q_d = qt_to_dq(q_global, G[:, :3, 3])  # (J, 4) each

    b_r, b_d = dq_blend(q_r[nn_idx], q_d[nn_idx], nn_weight)  # (N, 4)
    new_x = dq_apply(b_r, b_d, x) + global_trans
    translate = (new_x - x) * motion_mask
    rotation = jax.lax.stop_gradient(b_r) * motion_mask
    return {
        "d_xyz": translate,
        "d_rotation": rotation,
        "d_scaling": jnp.zeros_like(x),
        "d_nodes": posed_joints + global_trans,
        "nn_idx": nn_idx,
        "nn_weight": nn_weight,
        "local_rotation": local_rotation,
        "global_trans": global_trans,
        "template_offsets": jnp.zeros_like(x),
        "d_opacity": None,
        "d_color": None,
    }


def node_deformation(warp: SkeletonWarp, local_rotation: jax.Array, global_trans: jax.Array) -> jax.Array:
    """Posed joints only (skeleton-only visualization, skeleton_warp.py:186-205)."""
    rot_mats = quat_to_rotmat(local_rotation)
    posed, _ = forward_kinematics(rot_mats, warp.joints, warp.net.parents)
    return posed + global_trans
