"""ControlNodeWarp: node-based deformation field (the SC-GS stage-1 heart).

Functional re-design of /root/reference/utils/time_utils.py:770-1389:
sparse control nodes carry a learnable position (+hyper coords), radius and
weight; a DeformNetwork queried at the nodes yields per-node residuals which
are blended onto Gaussians with Gaussian-kernel KNN weights
(exp(-d^2 / 2 r^2), node-weight modulated, normalized). Includes the
local-frame rotation mode, d_rot_as_res switch, and the trajectory
regularizers (ARAP / elastic / acceleration) with explicit PRNG keys.

All state is a pytree (NodeWarp); every method of the torch module becomes a
pure function here. Time enters as (M, 1) per-node scalars; vmapped queries
over (M, T) node-time grids replace the reference's reshape gymnastics.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.models.deform_mlp import (
    DeformNetworkDef,
    apply_deform_network,
    init_deform_network,
)
from riggs_tpu.ops import arap as A
from riggs_tpu.ops.fps import farthest_point_sample
from riggs_tpu.ops.knn import knn
from riggs_tpu.ops.geometry import safe_norm
from riggs_tpu.ops.quaternion import quat_multiply, quat_to_rotmat

ROT_BIAS = np.array([1.0, 0.0, 0.0, 0.0], np.float32)

# stage-1 ARAP lambda schedule (time_utils.py:791-795)
LAMBDA_ARAP_LANDMARKS = (1e-4, 1e-4, 1e-5, 1e-5, 0)
LAMBDA_ARAP_STEPS = (0, 5000, 10000, 20000, 20001)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NodeWarp:
    nodes: jax.Array  # (M, 3 + hyper_dim) learnable positions + hyper coords
    node_radius_log: jax.Array  # (M,) log radius
    node_weight_logit: jax.Array  # (M, 1)
    mlp: Any  # DeformNetwork params
    net: DeformNetworkDef = dataclasses.field(metadata=dict(static=True))
    K: int = dataclasses.field(default=3, metadata=dict(static=True))
    hyper_dim: int = dataclasses.field(default=2, metadata=dict(static=True))
    d_rot_as_res: bool = dataclasses.field(default=True, metadata=dict(static=True))
    with_node_weight: bool = dataclasses.field(default=True, metadata=dict(static=True))

    @property
    def node_num(self) -> int:
        return self.nodes.shape[0]

    @property
    def node_radius(self) -> jax.Array:
        return jnp.exp(self.node_radius_log)

    @property
    def node_weight(self) -> jax.Array:
        return jax.nn.sigmoid(self.node_weight_logit)

    def params_dict(self) -> dict:
        return {
            "nodes": self.nodes,
            "radius": self.node_radius_log,
            "weight": self.node_weight_logit,
            "mlp": self.mlp,
        }

    def replace_params(self, p: dict) -> "NodeWarp":
        return dataclasses.replace(
            self, nodes=p["nodes"], node_radius_log=p["radius"], node_weight_logit=p["weight"], mlp=p["mlp"]
        )


def init_node_warp(
    key: jax.Array,
    init_pcl: np.ndarray,
    node_num: int,
    net: DeformNetworkDef | None = None,
    hyper_dim: int = 2,
    K: int = 3,
    d_rot_as_res: bool = True,
    with_node_weight: bool = True,
    keep_all: bool = False,
) -> NodeWarp:
    """FPS-sample node positions from the point cloud; radius = log(0.1*range)
    (reference init, time_utils.py:886-927)."""
    net = net or DeformNetworkDef()
    pcl = jnp.asarray(init_pcl, jnp.float32)
    if keep_all or node_num >= pcl.shape[0]:
        node_xyz = pcl
        node_num = pcl.shape[0]
    else:
        idx = farthest_point_sample(pcl, node_num)
        node_xyz = pcl[idx]
    nodes = jnp.concatenate([node_xyz, 1e-2 * jnp.ones((node_num, hyper_dim))], axis=-1)
    scene_range = jnp.max(pcl) - jnp.min(pcl)
    radius_log = jnp.log(0.1 * scene_range + 1e-7) * jnp.ones(node_num)
    return NodeWarp(
        nodes=nodes,
        node_radius_log=radius_log,
        node_weight_logit=jnp.zeros((node_num, 1)),
        mlp=init_deform_network(key, net),
        net=net,
        K=K,
        hyper_dim=hyper_dim,
        d_rot_as_res=d_rot_as_res,
        with_node_weight=with_node_weight,
    )


def cal_nn_weight(
    warp: NodeWarp,
    x: jax.Array,
    feature: jax.Array | None = None,
    K: int | None = None,
    nodes: jax.Array | None = None,
    gs_kernel: bool = True,
    temperature: float = 1.0,
):
    """Gaussian-kernel KNN blending weights (N, K) (time_utils.py:934-967).

    With hyper coords, KNN runs in (xyz.detach ++ hyper) space; node xyz is
    frozen w.r.t. the query (stop_gradient) while hyper coords stay live.
    """
    K = warp.K if K is None else K
    node_key = jax.lax.stop_gradient(warp.nodes[:, :3]) if nodes is None else nodes[:, :3]
    q = jax.lax.stop_gradient(x)
    if feature is not None and warp.hyper_dim > 0 and feature.shape[-1] >= warp.hyper_dim:
        q = jnp.concatenate([q, feature[:, : warp.hyper_dim]], axis=-1)
        node_key = jnp.concatenate([node_key, warp.nodes[:, 3:]], axis=-1)
    # straight-through neighbor distances: the VALUE comes from the knn on
    # stop-gradient inputs (identical forward numerics), the GRADIENT from a
    # recompute over only the K selected pairs. Without this the backward
    # materializes a dense (N, M) cotangent and mirrors the pairwise matmul —
    # the dominant cost of the full 131k x 512 train step on chip (round-5
    # step decomposition; d|q-n|^2 flows to node hyper coords AND gaussian
    # features, both preserved exactly by the recompute).
    nn_dist2, nn_idx = knn(jax.lax.stop_gradient(q), jax.lax.stop_gradient(node_key), K)
    d2_re = jnp.sum((q[:, None, :] - node_key[nn_idx]) ** 2, axis=-1)
    nn_dist2 = nn_dist2 + (d2_re - jax.lax.stop_gradient(d2_re))
    if gs_kernel:
        nn_radius = warp.node_radius[nn_idx]
        w = jnp.exp(-nn_dist2 / (2.0 * nn_radius**2))
        if warp.with_node_weight:
            w = w * warp.node_weight[nn_idx][..., 0]
        w = w + 1e-7
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        return w, nn_dist2, nn_idx
    return jax.nn.softmax(-nn_dist2 / temperature, axis=-1), nn_dist2, nn_idx


def node_deform(warp: NodeWarp, t: jax.Array, detach_node: bool = True, band_mask=None) -> dict:
    """Query the deform MLP at node positions. t: scalar, (M,1) or (M,T,1)."""
    nodes = warp.nodes[:, :3]
    if detach_node:
        nodes = jax.lax.stop_gradient(nodes)
    t = jnp.asarray(t)
    if t.ndim == 0:
        t = jnp.broadcast_to(t, (warp.node_num, 1))
    if t.ndim == 3:  # (M, T, 1): broadcast nodes over the time axis
        nodes = jnp.broadcast_to(nodes[:, None, :], (warp.node_num, t.shape[1], 3))
    return apply_deform_network(warp.mlp, warp.net, nodes, t, band_mask=band_mask)


def get_trajectory(warp: NodeWarp, t_samp_num: int = 8) -> jax.Array:
    """(M, T, 3) node trajectory over uniform times in [0, 1]."""
    t = jnp.linspace(0.0, 1.0, t_samp_num)
    t = jnp.broadcast_to(t[None, :, None], (warp.node_num, t_samp_num, 1))
    d = node_deform(warp, t)
    return jax.lax.stop_gradient(warp.nodes[:, None, :3]) + d["d_xyz"]


def warp_forward(
    warp: NodeWarp,
    x: jax.Array,
    t: jax.Array,
    feature: jax.Array | None,
    motion_mask: jax.Array,
    band_mask: jax.Array | None = None,
    local_frame: bool = False,
) -> dict:
    """Blend node residuals onto Gaussians at positions x (time_utils.py:1133-1236).

    Returns d_xyz / d_rotation / d_scaling / d_nodes (+None opacity/color).

    TPU-first dense formulation (round 5): instead of gathering the K=3
    selected node rows per gaussian (whose backward is a scatter-add into the
    node tables — row-op bound, the dominant cost of the 131k x 512 train
    step), the blend weights live DENSE over all M nodes with an exact top-K
    mask, and every blend is an (N, M) @ (M, C) MXU matmul. The masked
    weights are numerically the cal_nn_weight weights (same kernel, same
    +1e-7, same normalization); masked entries are exactly 0 so the matmul
    contributions match the gathered sum up to f32 reassociation.
    """
    from riggs_tpu.ops.knn import _small_k, pairwise_dist2

    x = jax.lax.stop_gradient(x)
    M = warp.node_num
    node_key = jax.lax.stop_gradient(warp.nodes[:, :3])
    q = x
    if feature is not None and warp.hyper_dim > 0 and feature.shape[-1] >= warp.hyper_dim:
        q = jnp.concatenate([q, feature[:, : warp.hyper_dim]], axis=-1)
        node_key = jnp.concatenate([node_key, warp.nodes[:, 3:]], axis=-1)
    d2 = pairwise_dist2(q, node_key)  # (N, M); grads ride the MXU matmul
    _, nn_idx = _small_k(jax.lax.stop_gradient(d2), warp.K)

    # exact top-K mask (union of one-hot columns; selection is stop-grad)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, M), 1)
    mask = jnp.zeros(d2.shape, bool)
    for k in range(warp.K):
        mask = mask | (cols == nn_idx[:, k : k + 1])

    w = jnp.exp(-d2 / (2.0 * warp.node_radius[None, :] ** 2))
    if warp.with_node_weight:
        w = w * warp.node_weight[None, :, 0]
    w = jnp.where(mask, w + 1e-7, 0.0)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    nn_weight = jnp.take_along_axis(w, nn_idx, axis=-1)  # K-sparse view (viz)

    attrs = node_deform(warp, t, band_mask=band_mask)
    node_trans, node_rot, node_scale = attrs["d_xyz"], attrs["d_rotation"], attrs["d_scaling"]
    rot_bias = jnp.asarray(ROT_BIAS)

    # pack every blended channel into ONE (M, C) table -> one MXU matmul
    chans = [node_trans, node_rot, node_scale]
    extra = []
    if attrs.get("d_opacity") is not None:
        extra.append(("d_opacity", attrs["d_opacity"]))
    if attrs.get("d_color") is not None:
        extra.append(("d_color", attrs["d_color"]))
    chans += [a for _, a in extra]
    if local_frame:
        local_rot = attrs["local_rotation"] + rot_bias
        Rl = quat_to_rotmat(local_rot)  # (M, 3, 3)
        p = jax.lax.stop_gradient(warp.nodes[:, :3])
        # sum_m w_nm [Rl_m (x_n - p_m) + p_m + t_m]
        #   = (sum_m w_nm Rl_m) x_n + sum_m w_nm (p_m - Rl_m p_m + t_m)
        const = p - jnp.einsum("mab,mb->ma", Rl, p) + node_trans
        chans += [Rl.reshape(M, 9), const]
    table = jnp.concatenate(chans, axis=-1)
    blended = jnp.dot(w, table, preferred_element_type=jnp.float32)  # (N, C)

    ofs = 0

    def take(n):
        nonlocal ofs
        out = blended[:, ofs : ofs + n]
        ofs += n
        return out

    b_trans, b_rot, b_scale = take(3), take(4), take(3)
    b_extra = {name: take(a.shape[-1]) for name, a in extra}

    if local_frame:
        WR = take(9).reshape(-1, 3, 3)
        Wc = take(3)
        # sum_m w = 1, so subtracting x recovers the residual translation
        translate = jnp.einsum("nab,nb->na", WR, x) + Wc - x
    else:
        translate = b_trans
    translate = translate * motion_mask

    deformed_nodes = warp.nodes[:, :3] + node_trans

    if warp.d_rot_as_res:
        rotation = b_rot * motion_mask
    else:
        # blend of (node_rot + bias) = b_rot + bias since sum_m w = 1
        rotation = b_rot * motion_mask + rot_bias
    scale = b_scale * motion_mask

    out = {
        "d_xyz": translate,
        "d_rotation": rotation,
        "d_scaling": scale,
        "d_nodes": deformed_nodes,
        "nn_idx": nn_idx,
        "nn_weight": nn_weight,
        "d_opacity": None,
        "d_color": None,
    }
    for name, _ in extra:
        out[name] = b_extra[name] * motion_mask
    return out


def p2dR(warp: NodeWarp, p: jax.Array, p0: jax.Array, K: int = 8) -> jax.Array:
    """Estimate per-node rotations from displaced node positions via
    trajectory-KNN weighted Procrustes (time_utils.py:1044-1078, 'trajectory'
    mode): neighbors are nearest in flattened-trajectory space, edge fans from
    p0 to p give the best-fit rotation. Returns (M, 4) quats."""
    from riggs_tpu.ops.geometry import fit_rotations
    from riggs_tpu.ops.quaternion import rotmat_to_quat

    traj = get_trajectory(warp, t_samp_num=4).reshape(warp.node_num, -1)
    d2, idx = knn(traj, traj, K + 1)
    d2, idx = d2[:, 1:], idx[:, 1:]
    w = jax.nn.softmax(d2 / jnp.mean(d2), axis=-1)
    e0 = p0[idx] - p0[:, None]
    e1 = p[idx] - p[:, None]
    n = lambda e: e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-5)
    cov = jnp.einsum("nka,nk,nkb->nab", n(e1), w, n(e0))
    return rotmat_to_quat(fit_rotations(cov))


def warp_forward_animated(
    warp: NodeWarp,
    x: jax.Array,
    t: jax.Array,
    feature: jax.Array | None,
    motion_mask: jax.Array,
    node_trans_bias: jax.Array,
    K: int = 8,
    temperature: float = 1e-3,
) -> dict:
    """Animation path (time_utils.py:1197-1222): after editing/dragging moves
    the posed nodes by ``node_trans_bias``, re-bind each Gaussian to the posed
    nodes by geodesic (floyd) KNN, estimate node rotation deltas with p2dR,
    and rigidly carry the Gaussians with their nodes — used to drag/animate a
    stage-1 model without retraining."""
    base = warp_forward(warp, x, t, feature, motion_mask)
    cur_node = jax.lax.stop_gradient(warp.nodes[:, :3] + node_deform(warp, t)["d_xyz"])
    cur_gs = jax.lax.stop_gradient(x + base["d_xyz"])

    # geodesic KNN weights to the posed nodes (cal_nn_weight_floyd semantics)
    dist_mat = A.geodesic_floyd(cur_node, K=3)
    d2_g, idx_g = knn(cur_gs, cur_node, 1)
    nn1 = idx_g[:, 0]
    geo = dist_mat[nn1] + jnp.sqrt(jnp.maximum(d2_g, 0.0))  # (N, M)
    neg, cur_idx = jax.lax.top_k(-geo, K)
    cur_w = jax.nn.softmax(neg / temperature, axis=-1)

    nodes_t = cur_node + node_trans_bias
    rot_bias = jnp.asarray(ROT_BIAS)
    node_rot_bias = p2dR(warp, nodes_t, cur_node, K=8)
    Rb = quat_to_rotmat(node_rot_bias)

    gs_t = nodes_t[cur_idx] + jnp.einsum(
        "gkab,gkb->gka", Rb[cur_idx], cur_gs[:, None] - cur_node[cur_idx]
    )
    gs_avg = jnp.sum(gs_t * cur_w[..., None], axis=1)
    d_rotation_bias = (
        jnp.sum(node_rot_bias[cur_idx] * cur_w[..., None], axis=1) - rot_bias
    ) * motion_mask + rot_bias

    out = dict(base)
    out["d_xyz"] = (gs_avg - x) * motion_mask
    out["d_rotation_bias"] = d_rotation_bias
    out["d_nodes"] = nodes_t
    return out


# ---------------------------------------------------------------------------
# Trajectory regularizers (time_utils.py:1035-1120)
# ---------------------------------------------------------------------------


def arap_loss(
    warp: NodeWarp, key: jax.Array, t: jax.Array | None = None, delta_t: float = 0.05, t_samp_num: int = 2
) -> jax.Array:
    k1, k2 = jax.random.split(key)
    t0 = jax.random.uniform(k1, ()) if t is None else jnp.squeeze(t) + delta_t * (jax.random.uniform(k1, ()) - 0.5)
    t_samp = jax.random.uniform(k2, (t_samp_num,)) * delta_t + t0 - 0.5 * delta_t
    t_samp = jnp.broadcast_to(t_samp[None, :, None], (warp.node_num, t_samp_num, 1))
    node_trans = node_deform(warp, t_samp)["d_xyz"]
    nodes_t = jax.lax.stop_gradient(warp.nodes[:, None, :3]) + node_trans  # (M, T, 3)
    conn = A.connectivity_from_points(jax.lax.stop_gradient(nodes_t[:, 0]), K=min(10, warp.node_num - 1))
    return A.arap_error(jnp.swapaxes(nodes_t, 0, 1), conn)


def arap_loss_with_rot(warp: NodeWarp, key: jax.Array, t_samp_num: int = 8) -> jax.Array:
    k1, k2 = jax.random.split(key)
    t_samp = jax.random.uniform(k1, (t_samp_num,))
    t_samp = jnp.broadcast_to(t_samp[None, :, None], (warp.node_num, t_samp_num, 1))
    d = node_deform(warp, t_samp)
    trajectory = jax.lax.stop_gradient(warp.nodes[:, None, :3]) + d["d_xyz"]
    traj_rot = d["d_rotation"] + jnp.asarray(ROT_BIAS) if not warp.d_rot_as_res else None
    err, rot_err = A.arap_deformation_loss(trajectory, k2, trajectory_rot=traj_rot)
    return err + rot_err


def elastic_loss(
    warp: NodeWarp, key: jax.Array, t: jax.Array | None = None, delta_t: float = 0.005, K: int = 2, t_samp_num: int = 8
) -> jax.Array:
    """Variance of node-to-neighbor edge lengths over a small time window."""
    k1, k2 = jax.random.split(key)
    t0 = jax.random.uniform(k1, ()) if t is None else jnp.squeeze(t) + delta_t * (jax.random.uniform(k1, ()) - 0.5)
    t_samp = jax.random.uniform(k2, (t_samp_num,)) * delta_t + t0 - 0.5 * delta_t
    t_samp = jnp.broadcast_to(t_samp[None, :, None], (warp.node_num, t_samp_num, 1))
    node_trans = node_deform(warp, t_samp)["d_xyz"]
    nodes_t = jax.lax.stop_gradient(warp.nodes[:, None, :3]) + node_trans  # (M, T, 3)

    nn_weight, _, nn_idx = cal_nn_weight(
        warp, jax.lax.stop_gradient(warp.nodes[:, :3]), feature=warp.nodes[:, 3:], K=K + 1
    )
    nn_weight, nn_idx = nn_weight[:, 1:], nn_idx[:, 1:]
    edge_t = safe_norm(nodes_t[nn_idx] - nodes_t[:, None], axis=-1)  # (M, K, T)
    var = jnp.var(edge_t, axis=2, ddof=1)
    var = var / (jax.lax.stop_gradient(var) + 1e-5)
    return jnp.mean(jnp.sum(var * nn_weight, axis=1))


def acc_loss(warp: NodeWarp, key: jax.Array, t: jax.Array | None = None, delta_t: float = 0.005) -> jax.Array:
    """Second finite difference of the node trajectory (acceleration)."""
    t0 = jax.random.uniform(key, ()) if t is None else jnp.squeeze(t) + delta_t * (jax.random.uniform(key, ()) - 0.5)
    ts = jnp.stack([t0 - delta_t, t0, t0 + delta_t])
    ts = jnp.broadcast_to(ts[None, :, None], (warp.node_num, 3, 1))
    node_trans = node_deform(warp, ts)["d_xyz"]
    nodes_t = jax.lax.stop_gradient(warp.nodes[:, None, :3]) + node_trans
    acc = safe_norm(nodes_t[:, 0] + nodes_t[:, 2] - 2 * nodes_t[:, 1], axis=-1)
    acc = acc / (jax.lax.stop_gradient(acc) + 1e-5)
    return jnp.mean(acc)
