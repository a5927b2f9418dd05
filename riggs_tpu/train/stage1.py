"""Stage-1 trainer: canonical Gaussians + node deformation field (SC-GS).

Orchestration parity with /root/reference/train_gui.py:963-1565 (GUI.train):
  phase A (train_node_rendering_step, :1224): nodes trained *as* isotropic
    shared-scale Gaussians — photometric + elastic/acc/ARAP trajectory
    regularizers + (late) 2D-skeleton chamfer; node-gaussian densification;
    hyper-space FPS downsampling at ``iterations_node_sampling``; node
    positions finalized into the warp at the end of the phase.
  phase B (train_step, :1000): full scene Gaussians deformed by the node
    warp — photometric + ARAP reg (landmark-scheduled) + motion-mask loss +
    2D-skeleton chamfer; Gaussian + node densification; SH warmup; opacity
    resets.

TPU design: two jitted step functions with static phase flags (a handful of
recompiles per run, none per step); all densification events are jitted
masked updates; the host loop only draws random frames and schedules.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.camera.camera import Camera, project_nodes_2d
from riggs_tpu.data.dataset import Frame, SceneData
from riggs_tpu.models import gaussians as G
from riggs_tpu.models import node_warp as NW
from riggs_tpu.models.deform_mlp import DeformNetworkDef, apply_deform_network
from riggs_tpu.ops.fps import farthest_point_sample
from riggs_tpu.ops.knn import chamfer_distance
from riggs_tpu.render.api import render, tier_kwargs
from riggs_tpu.train import losses as L
from riggs_tpu.train import optim as O
from riggs_tpu.train import schedule as S
from riggs_tpu.train.config import Config
from riggs_tpu.train.static import compute_scene_extent, densify_step as gs_densify_step


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Stage1State:
    gs: G.Gaussians
    node_gs: G.Gaussians
    warp: NW.NodeWarp
    opt_gs: O.AdamState
    opt_node: O.AdamState
    opt_warp: O.AdamState
    stats_gs: G.DensifyStats
    stats_node: G.DensifyStats
    # device-side iteration counter: the auto step functions derive every
    # lr/lambda schedule and the per-step RNG key from it ON DEVICE, so the
    # train loop ships zero scalars per step (each host->device put costs
    # ~25-35 ms over the tunneled chip — round-5 measurement)
    it: jax.Array = dataclasses.field(default_factory=lambda: jnp.zeros((), jnp.int32))


def init_stage1(
    key: jax.Array,
    scene: SceneData,
    cfg: Config,
    net: DeformNetworkDef | None = None,
) -> Stage1State:
    m = cfg.model
    gs = G.create_from_pcd(
        scene.init_points,
        scene.init_colors,
        capacity=m.capacity,
        max_sh_degree=m.sh_degree,
        isotropic=m.use_isotropic_gs,
        fea_dim=m.hyper_dim,
        with_motion_mask=m.gs_with_motion_mask,
    )
    net = net or DeformNetworkDef(is_blender=scene.is_blender)
    warp = NW.init_node_warp(
        key,
        scene.init_points,
        node_num=m.node_num,
        net=net,
        hyper_dim=m.hyper_dim,
        d_rot_as_res=m.d_rot_as_res,
    )
    # node gaussians: isotropic shared-scale sh0 cloud at the node positions,
    # with headroom for phase-A densification (node_max_num_ratio_during_init)
    node_cap = m.node_num * cfg.opt.node_max_num_ratio_during_init
    node_xyz = np.asarray(warp.nodes[:, :3])
    node_gs = G.create_from_pcd(
        node_xyz,
        np.zeros_like(node_xyz),
        capacity=node_cap,
        max_sh_degree=0,
        isotropic=True,
        with_motion_mask=False,
        shared_scale=True,
    )
    # reference sets node-gaussian scale to log(1e-2) (time_utils.py:1256)
    node_gs = dataclasses.replace(node_gs, scaling=jnp.full_like(node_gs.scaling, np.log(1e-2)))
    return Stage1State(
        gs=gs,
        node_gs=node_gs,
        warp=warp,
        opt_gs=O.adam_init(gs.params_dict()),
        opt_node=O.adam_init(node_gs.params_dict()),
        opt_warp=O.adam_init(warp.params_dict()),
        stats_gs=G.init_densify_stats(gs.capacity),
        stats_node=G.init_densify_stats(node_cap),
    )


def stage1_lr_fns(cfg: Config):
    o = cfg.opt
    deform_init = o.position_lr_init * 5.0 * o.deform_lr_scale  # spatial_lr_scale=5
    mlp_sched = S.expon_lr(
        deform_init,
        o.position_lr_final * o.deform_lr_scale,
        lr_delay_mult=o.position_lr_delay_mult,
        max_steps=o.deform_lr_max_steps,
    )
    gs_xyz = S.expon_lr(
        o.position_lr_init,
        o.position_lr_final,
        lr_delay_mult=o.position_lr_delay_mult,
        max_steps=o.position_lr_max_steps,
    )

    def gauss_lrs(it):
        return {
            "xyz": gs_xyz(it),
            "f_dc": o.feature_lr,
            "f_rest": o.feature_lr / 20.0,
            "opacity": o.opacity_lr,
            "scaling": o.scaling_lr,
            "rotation": o.rotation_lr,
            "feature": o.feature_lr,
        }

    def warp_lrs(it):
        # reference quirk (deform_model.py:60-65): only the mlp group is
        # rescheduled; the nodes group keeps its initial lr forever.
        return {
            "mlp": mlp_sched(it),
            "nodes": deform_init,
            "radius": deform_init,
            "weight": deform_init,
        }

    return gauss_lrs, warp_lrs


def _to_device_lrs(d):
    return jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), d)


def stage1_lr_fns_jit(cfg: Config):
    """Traced-step twin of :func:`stage1_lr_fns`: each returned fn maps a
    device iteration counter to a dict of on-device lr scalars, so the whole
    schedule lives inside the compiled step (zero per-step host puts)."""
    o = cfg.opt
    deform_init = o.position_lr_init * 5.0 * o.deform_lr_scale
    mlp_sched = S.expon_lr_jit(
        deform_init,
        o.position_lr_final * o.deform_lr_scale,
        lr_delay_mult=o.position_lr_delay_mult,
        max_steps=o.deform_lr_max_steps,
    )
    gs_xyz = S.expon_lr_jit(
        o.position_lr_init,
        o.position_lr_final,
        lr_delay_mult=o.position_lr_delay_mult,
        max_steps=o.position_lr_max_steps,
    )

    def gauss_lrs(it):
        c = lambda v: jnp.float32(v)
        return {
            "xyz": gs_xyz(it),
            "f_dc": c(o.feature_lr),
            "f_rest": c(o.feature_lr / 20.0),
            "opacity": c(o.opacity_lr),
            "scaling": c(o.scaling_lr),
            "rotation": c(o.rotation_lr),
            "feature": c(o.feature_lr),
        }

    def warp_lrs(it):
        # reference quirk (deform_model.py:60-65): only the mlp group is
        # rescheduled; the nodes group keeps its initial lr forever.
        return {
            "mlp": mlp_sched(it),
            "nodes": jnp.float32(deform_init),
            "radius": jnp.float32(deform_init),
            "weight": jnp.float32(deform_init),
        }

    return gauss_lrs, warp_lrs


def make_phase_a_auto(cfg: Config, time_interval: float):
    """Phase-A step with every schedule on device (see Stage1State.it).

    The host passes only (state, frame, bg, base_key): lrs, the warmup
    detach, the chamfer unlock, regularizer gating and the step RNG are all
    computed from ``state.it`` inside ONE compiled program."""
    gauss_lrs_j, warp_lrs_j = stage1_lr_fns_jit(cfg)
    o = cfg.opt
    no_arap = o.no_arap_loss
    p = cfg.pipe
    tiers = (p.max_tiles_per_gaussian, p.mid_cap, p.mid_side)

    @partial(jax.jit, static_argnames=("lambda_dssim", "max_per_tile"))
    def step(state, frame, bg, sk, lambda_dssim=0.2, max_per_tile=256):
        # sk comes from the host-maintained split chain: a key is a device
        # array (no transfer), and preserving the round-4 stream keeps every
        # RNG-sensitive fixture (skeleton topology &c.) on its pinned path
        it = state.it
        new_state, metrics = phase_a_step(
            state, frame, bg, gauss_lrs_j(it), warp_lrs_j(it), sk, time_interval,
            lambda_chamfer=o.lambda_deformed_node_prjection,
            detach_dxyz=it < o.node_warm_up,
            use_chamfer=it > o.iterations_node_sampling,
            use_reg=(it > o.node_warm_up) if not no_arap else False,
            lambda_dssim=lambda_dssim,
            max_per_tile=max_per_tile,
            tiers=tiers,
        )
        return dataclasses.replace(new_state, it=it + 1), metrics

    return step


def make_phase_ref_auto(cfg: Config):
    """ZJU reference-points phase-A step with on-device warp lrs."""
    _, warp_lrs_j = stage1_lr_fns_jit(cfg)
    o = cfg.opt

    @partial(jax.jit, static_argnames=("use_chamfer", "max_per_tile"))
    def step(state, frame, bg, use_chamfer=True, max_per_tile=1024):
        it = state.it
        new_state, metrics = phase_ref_step(
            state, frame, bg, warp_lrs_j(it),
            lambda_chamfer=o.lambda_deformed_node_prjection,
            use_chamfer=use_chamfer, max_per_tile=max_per_tile,
        )
        return dataclasses.replace(new_state, it=it + 1), metrics

    return step


def make_phase_b_auto(cfg: Config):
    """Phase-B step with every schedule on device: lrs, lambda_arap/motion/
    flow landmarks, SH warmup, the warm-up detach and the step RNG all derive
    from ``state.it`` in-jit. The remaining static args are per-RUN constants
    (scene payloads, rasterizer shape), so the whole phase compiles ONCE per
    ladder refit instead of per schedule boundary."""
    gauss_lrs_j, warp_lrs_j = stage1_lr_fns_jit(cfg)
    o = cfg.opt
    p = cfg.pipe
    tiers = (p.max_tiles_per_gaussian, p.mid_cap, p.mid_side)

    @partial(
        jax.jit,
        static_argnames=(
            "use_chamfer",
            "use_motion_loss",
            "use_flow_loss",
            "lambda_dssim",
            "max_per_tile",
            "isotropic",
            "tile_ladder",
        ),
    )
    def step(
        state,
        frame,
        bg,
        sk,
        use_chamfer=False,
        use_motion_loss=False,
        use_flow_loss=False,
        lambda_dssim=0.2,
        max_per_tile=1024,
        isotropic=False,
        tile_ladder=None,
    ):
        # sk: host-maintained split chain (device array, no transfer) — see
        # make_phase_a_auto
        it = state.it
        lam_arap = S.landmark_interpolate_jit(NW.LAMBDA_ARAP_LANDMARKS, NW.LAMBDA_ARAP_STEPS, it)
        lam_motion = S.landmark_interpolate_jit(
            o.lambda_motion_mask_landmarks, o.lambda_motion_mask_steps, it, "log"
        )
        lam_flow = (
            S.landmark_interpolate_jit(o.lambda_optical_landmarks, o.lambda_optical_steps, it)
            if use_flow_loss
            else 0.0
        )
        new_state, metrics = phase_b_step(
            state, frame, bg, gauss_lrs_j(it), warp_lrs_j(it), sk,
            lam_arap, lam_motion, lambda_flow=lam_flow,
            lambda_chamfer=o.lambda_deformed_node_prjection,
            warm=it < o.warm_up,
            active_sh=jnp.minimum(it // o.oneupSHdegree_step, cfg.model.sh_degree),
            use_chamfer=use_chamfer,
            use_motion_loss=use_motion_loss,
            use_flow_loss=use_flow_loss,
            lambda_dssim=lambda_dssim,
            max_per_tile=max_per_tile,
            isotropic=isotropic,
            tile_ladder=tile_ladder,
            tiers=tiers,
        )
        return dataclasses.replace(new_state, it=it + 1), metrics

    return step


# ---------------------------------------------------------------------------
# Phase A: node-as-gaussians rendering
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("lambda_dssim", "max_per_tile", "tiers"),
)
def phase_a_step(
    state: Stage1State,
    frame: Frame,
    bg: jax.Array,
    lrs_node: dict,
    lrs_warp: dict,
    key: jax.Array,
    time_interval: float,
    lambda_chamfer: float = 1e-3,
    detach_dxyz: bool | jax.Array = False,
    use_chamfer: bool | jax.Array = False,
    use_reg: bool | jax.Array = True,
    lambda_dssim: float = 0.2,
    max_per_tile: int = 256,
    tiers: tuple | None = None,
):
    """The detach/chamfer/reg toggles are TRACED 0/1 weights, not static
    args: the whole phase-A schedule (warmup detach, chamfer after node
    sampling, reg after warmup) runs in ONE compiled program. Weight-form is
    exact: ``w*x + (1-w)*stop_grad(x)`` equals stop_gradient at w=0 and
    identity at w=1, and a 0-weighted loss term contributes zero gradient.
    On the axon chip each avoided jit variant saves minutes of remote
    compile."""
    m2b = jnp.zeros_like(state.node_gs.xyz[:, :2])
    kr1, kr2, kr3 = jax.random.split(key, 3)
    w_grad = 1.0 - jnp.float32(detach_dxyz)
    w_ch = jnp.float32(use_chamfer)
    w_reg = jnp.float32(use_reg)

    def loss_fn(params, mean2d_bias):
        node_gs = state.node_gs.replace_params(params["node_gs"])
        warp = state.warp.replace_params(params["warp"])
        t = jnp.broadcast_to(frame.fid, (node_gs.capacity, 1))
        d = apply_deform_network(warp.mlp, warp.net, jax.lax.stop_gradient(node_gs.xyz), t)
        d_xyz = d["d_xyz"] * node_gs.motion_mask
        d_xyz = w_grad * d_xyz + (1.0 - w_grad) * jax.lax.stop_gradient(d_xyz)
        out = render(
            frame.cam,
            node_gs,
            bg,
            d_xyz=d_xyz,
            active_sh_degree=0,
            mean2d_bias=mean2d_bias,
            max_per_tile=max_per_tile,
            **tier_kwargs(tiers),
        )
        loss = L.photometric_loss(out["render"], frame.image, lambda_dssim)
        aux = {"img_loss": loss}
        if frame.thinned is not None:
            proj = project_nodes_2d(frame.cam, node_gs.xyz + d_xyz)
            cd = chamfer_distance(
                proj, frame.thinned, x_mask=node_gs.alive, y_mask=frame.thinned_mask, norm=1
            )
            loss = loss + lambda_chamfer * w_ch * cd
            aux["chamfer"] = cd
        reg = 1e-3 * NW.elastic_loss(warp, kr1, t=frame.fid, delta_t=time_interval)
        reg = reg + 1e-5 * NW.acc_loss(warp, kr2, t=frame.fid, delta_t=3 * time_interval)
        reg = reg + 1e-2 * NW.arap_loss(warp, kr3)
        loss = loss + w_reg * reg
        return loss, (out, aux)

    params = {"node_gs": state.node_gs.params_dict(), "warp": state.warp.params_dict()}
    (loss, (out, aux)), (gp, gm2b) = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(params, m2b)
    new_node_p, opt_node = O.adam_update(gp["node_gs"], state.opt_node, params["node_gs"], lrs_node)
    new_warp_p, opt_warp = O.adam_update(gp["warp"], state.opt_warp, params["warp"], lrs_warp)
    stats = G.add_densification_stats(
        state.stats_node, gm2b, out["radii"], out["visibility_filter"],
        frame.cam.width, frame.cam.height,
    )
    new_state = dataclasses.replace(
        state,
        node_gs=state.node_gs.replace_params(new_node_p),
        warp=state.warp.replace_params(new_warp_p),
        opt_node=opt_node,
        opt_warp=opt_warp,
        stats_node=stats,
    )
    metrics = {"loss": loss, "psnr": L.psnr(out["render"], frame.image), "n_node_gs": state.node_gs.num_alive}
    return new_state, metrics


@partial(jax.jit, static_argnames=("use_chamfer", "max_per_tile"))
def phase_ref_step(
    state: Stage1State,
    frame: Frame,
    bg: jax.Array,
    lrs_warp: dict,
    lambda_chamfer: float = 1e-3,
    use_chamfer: bool = True,
    max_per_tile: int = 1024,
):
    """ZJU variant of phase A (train_with_reference_points,
    /root/reference/train_gui.py:1401-1565): the deformation is supervised
    directly by per-frame SMPL vertex priors — L2(reference_points - xyz,
    d_xyz) + the 2D-skeleton chamfer on projected nodes. Gaussian positions
    are frozen; only the warp trains."""

    def loss_fn(warp_params):
        warp = state.warp.replace_params(warp_params)
        gs = state.gs
        d = NW.warp_forward(
            warp,
            jax.lax.stop_gradient(gs.xyz),
            frame.fid,
            gs.feature,
            gs.motion_mask,
            local_frame=warp.net.local_frame,
        )
        gt_d_xyz = frame.reference_points - jax.lax.stop_gradient(gs.xyz)
        loss = jnp.mean(jnp.where(gs.alive[:, None], (gt_d_xyz - d["d_xyz"]) ** 2, 0.0))
        aux = {"ref_loss": loss}
        if use_chamfer and frame.thinned is not None:
            proj = project_nodes_2d(frame.cam, d["d_nodes"])
            cd = chamfer_distance(proj, frame.thinned, y_mask=frame.thinned_mask, norm=1)
            loss = loss + lambda_chamfer * cd
            aux["chamfer"] = cd
        return loss, aux

    params = state.warp.params_dict()
    (loss, aux), gp = jax.value_and_grad(loss_fn, has_aux=True)(params)
    new_p, opt_warp = O.adam_update(gp, state.opt_warp, params, lrs_warp)
    new_state = dataclasses.replace(state, warp=state.warp.replace_params(new_p), opt_warp=opt_warp)
    return new_state, {"loss": loss, **aux}


def downsample_nodes(state: Stage1State, cfg: Config, time_num: int = 16) -> Stage1State:
    """'samp_hyper' node downsampling (train_gui.py:1344-1366): FPS in the
    trajectory hyper-space of the phase-A node gaussians, keep node_num of
    them as the final control nodes, prune the rest of the node gaussians."""
    node_gs = state.node_gs
    warp = state.warp
    x = node_gs.xyz
    t_samp = jnp.linspace(0.0, 1.0, time_num)

    def at_t(t):
        t_in = jnp.broadcast_to(t, (x.shape[0], 1))
        return apply_deform_network(warp.mlp, warp.net, x, t_in)["d_xyz"]

    trans = jax.vmap(at_t)(t_samp)  # (T, N, 3)
    hyper = jnp.transpose(trans + x[None], (1, 0, 2)).reshape(x.shape[0], -1)
    idx = farthest_point_sample(hyper, cfg.model.node_num, mask=node_gs.alive)
    new_nodes = jnp.concatenate(
        [x[idx], 1e-2 * jnp.ones((cfg.model.node_num, warp.hyper_dim))], axis=-1
    )
    scene_range = jnp.max(x[idx]) - jnp.min(x[idx])
    warp = dataclasses.replace(
        warp,
        nodes=new_nodes,
        node_radius_log=jnp.log(0.1 * scene_range + 1e-7) * jnp.ones(cfg.model.node_num),
        node_weight_logit=jnp.zeros((cfg.model.node_num, 1)),
    )
    keep = jnp.zeros(node_gs.capacity, bool).at[idx].set(True)
    node_gs = dataclasses.replace(node_gs, alive=node_gs.alive & keep)
    return dataclasses.replace(
        state,
        warp=warp,
        node_gs=node_gs,
        opt_warp=O.adam_init(warp.params_dict()),
        opt_node=O.adam_init(node_gs.params_dict()),
        stats_node=G.init_densify_stats(node_gs.capacity),
    )


def node_densify_prune(state: Stage1State, cfg: Config, max_grad: float) -> Stage1State:
    """Node densify/prune (time_utils.py:1272-1389 cal_node_importance +
    densify): average the gaussian-gradient importance onto each node's KNN
    fan; add a node at the weighted mean position of every node whose
    importance exceeds the threshold; drop nodes no gaussian references.

    Node counts are static under jit, so this is a host-side rebuild (it runs
    once at node_force_densify_prune_step by default — one re-jit per event);
    Adam moments of retained nodes are carried over, new nodes start fresh.
    """
    gs, warp = state.gs, state.warp
    stats_grad = np.asarray(
        jnp.where(state.stats_gs.denom > 0, state.stats_gs.xyz_gradient_accum / jnp.maximum(state.stats_gs.denom, 1.0), 0.0)
    )
    x = np.asarray(gs.xyz)
    alive = np.asarray(gs.alive)
    weights_g = np.where(alive, stats_grad, 0.0)

    nn_weight, _, nn_idx = NW.cal_nn_weight(warp, gs.xyz, gs.feature)
    nn_weight = np.asarray(nn_weight) * alive[:, None]
    nn_idx = np.asarray(nn_idx)

    M = warp.node_num
    importance = np.zeros(M)
    edge_count = np.zeros(M)
    avg_x = np.zeros((M, x.shape[1]))
    np.add.at(importance, nn_idx.reshape(-1), (nn_weight * weights_g[:, None]).reshape(-1))
    np.add.at(edge_count, nn_idx.reshape(-1), nn_weight.reshape(-1))
    np.add.at(
        avg_x,
        nn_idx.reshape(-1),
        (nn_weight * weights_g[:, None]).reshape(-1, 1) * np.repeat(x, nn_idx.shape[1], axis=0),
    )
    avg_x = avg_x / np.maximum(importance[:, None], 1e-12)
    importance = importance / (edge_count + 1e-7)

    add_mask = (importance > max_grad) & np.isfinite(avg_x).all(axis=1)
    keep_mask = edge_count > 0
    if add_mask.sum() == 0 and keep_mask.all():
        return state

    old_nodes = np.asarray(warp.nodes)
    old_radius = np.asarray(warp.node_radius_log)
    old_weight = np.asarray(warp.node_weight_logit)
    hyper = warp.hyper_dim
    new_nodes = np.concatenate(
        [old_nodes[keep_mask], np.concatenate([avg_x[add_mask, :3], 1e-2 * np.ones((add_mask.sum(), hyper))], -1)]
    )
    new_radius = np.concatenate([old_radius[keep_mask], old_radius[add_mask]])
    new_weight = np.concatenate([old_weight[keep_mask], old_weight[add_mask]])
    new_warp = dataclasses.replace(
        warp,
        nodes=jnp.asarray(new_nodes, jnp.float32),
        node_radius_log=jnp.asarray(new_radius, jnp.float32),
        node_weight_logit=jnp.asarray(new_weight, jnp.float32),
    )
    # carry Adam moments for kept nodes; fresh for added ones
    opt = state.opt_warp

    def carry(mu_leaf, old_arr, name):
        arr = np.asarray(mu_leaf)
        if arr.shape[:1] != (M,):
            return mu_leaf
        fresh = np.zeros((new_nodes.shape[0],) + arr.shape[1:], arr.dtype)
        fresh[: keep_mask.sum()] = arr[keep_mask]
        return jnp.asarray(fresh)

    new_mu = dict(opt.mu)
    new_nu = dict(opt.nu)
    for k2 in ("nodes", "radius", "weight"):
        new_mu[k2] = carry(opt.mu[k2], None, k2)
        new_nu[k2] = carry(opt.nu[k2], None, k2)
    new_opt = O.AdamState(mu=new_mu, nu=new_nu, count=opt.count)
    print(f"node densify: +{int(add_mask.sum())} -{int((~keep_mask).sum())} -> {new_nodes.shape[0]} nodes")
    return dataclasses.replace(state, warp=new_warp, opt_warp=new_opt)


def finalize_nodes(state: Stage1State) -> Stage1State:
    """End of phase A: adopt the trained node-gaussian positions as the warp's
    control nodes (train_gui.py:1373-1375). Requires a prior downsample so
    alive node gaussians == node_num."""
    idx = jnp.nonzero(np.asarray(state.node_gs.alive), size=state.warp.node_num, fill_value=0)[0]
    nodes = state.warp.nodes.at[:, :3].set(state.node_gs.xyz[idx])
    return dataclasses.replace(state, warp=dataclasses.replace(state.warp, nodes=nodes))


# ---------------------------------------------------------------------------
# Phase B: full deformable training
# ---------------------------------------------------------------------------


def stage1_frame_loss(
    params,
    state: "Stage1State",
    frame: Frame,
    bg: jax.Array,
    mean2d_bias: jax.Array,
    key: jax.Array,
    lambda_arap: jax.Array,
    lambda_motion: jax.Array,
    lambda_flow: jax.Array | float = 0.0,
    lambda_chamfer: float = 1e-3,
    warm: bool | jax.Array = False,
    active_sh: int | jax.Array = 0,
    use_chamfer: bool | jax.Array = False,
    use_motion_loss: bool = False,
    use_flow_loss: bool = False,
    lambda_dssim: float = 0.2,
    max_per_tile: int = 1024,
    isotropic: bool = False,
    tile_ladder: tuple | None = None,
    tiers: tuple | None = None,
):
    """Stage-1 phase-B per-frame loss (train_gui.py:1025-1145 semantics) —
    shared by the single-chip ``phase_b_step`` and the frame-parallel
    ``parallel.train.make_dp_stage1_step``.

    ``warm``, ``active_sh`` and ``use_chamfer`` are traced (0/1 weight /
    banded-SH forms, numerically exact) so the warmup boundary, the SH
    warmup schedule and the chamfer unlock reuse ONE compiled step.
    ``use_flow_loss`` / ``use_motion_loss`` stay static: each gates a whole
    second render pass worth avoiding when off for the entire run."""
    gs = state.gs.replace_params(params["gs"])
    warp = state.warp.replace_params(params["warp"])
    d = NW.warp_forward(
        warp,
        jax.lax.stop_gradient(gs.xyz),
        frame.fid,
        gs.feature,
        gs.motion_mask,
        local_frame=warp.net.local_frame,
    )
    d_xyz, d_rot = d["d_xyz"], d["d_rotation"]
    w_grad = 1.0 - jnp.float32(warm)
    d_xyz = w_grad * d_xyz + (1.0 - w_grad) * jax.lax.stop_gradient(d_xyz)
    d_rot = w_grad * d_rot + (1.0 - w_grad) * jax.lax.stop_gradient(d_rot)
    d_scaling = jnp.zeros_like(d["d_scaling"])  # train_gui.py:1053 zeroes it
    if isotropic:
        d_rot = jnp.zeros_like(d_rot)
    out = render(
        frame.cam,
        gs,
        bg,
        d_xyz=d_xyz,
        d_rotation=d_rot,
        d_scaling=d_scaling,
        active_sh_degree=active_sh,
        mean2d_bias=mean2d_bias,
        max_per_tile=max_per_tile,
        tile_ladder=tile_ladder,
        **tier_kwargs(tiers),
    )
    loss = L.photometric_loss(out["render"], frame.image, lambda_dssim)
    aux = {"img_loss": loss}
    # ARAP regularizer with landmark-scheduled lambda (dynamic scalar)
    aux["arap"] = NW.arap_loss(warp, key)
    loss = loss + lambda_arap * aux["arap"]
    if use_flow_loss and frame.flow is not None:
        # optical-flow loss (train_gui.py:1080-1121): render the NDC scene
        # flow between this frame's pose and the partner frame's pose and
        # L1-match the RAFT flow where the motion is solid & consistent
        from riggs_tpu.render.api import render_flow

        d2 = NW.warp_forward(
            warp,
            jax.lax.stop_gradient(gs.xyz),
            frame.flow_partner_fid,
            gs.feature,
            gs.motion_mask,
            local_frame=warp.net.local_frame,
        )
        fout = render_flow(
            frame.cam, frame.cam, gs, d_xyz, d2["d_xyz"], d_rot, max_per_tile=max_per_tile
        )
        size = jnp.asarray([frame.cam.width, frame.cam.height], jnp.float32)
        gt_flow_ndc = frame.flow / size * 2.0
        pair_w = jnp.clip(
            jnp.cos(jnp.abs(frame.fid - frame.flow_partner_fid) * jnp.pi / 2.0), 0.2, 1.0
        )
        solid = jax.lax.stop_gradient(fout["alpha"] > 0.9)
        # down-weight pixels the photometric loss already explains poorly
        l1w = jnp.cos(
            jnp.mean(jnp.abs(jax.lax.stop_gradient(out["render"]) - frame.image), axis=-1)
            * jnp.pi
            / 2.0
        )
        m = (solid & (frame.flow_mask > 0)).astype(jnp.float32) * pair_w * l1w
        flow_l1 = L.l1_loss(m[..., None] * gt_flow_ndc, m[..., None] * fout["render"][..., :2])
        loss = loss + lambda_flow * flow_l1
        aux["flow"] = flow_l1
    if use_motion_loss and frame.alpha_mask is not None:
        mout = render(
            frame.cam,
            gs,
            bg,
            d_xyz=d_xyz,
            d_rotation=d_rot,
            d_scaling=d_scaling,
            render_motion=True,
            detach_xyz=True,
            detach_rot=True,
            detach_scale=True,
            detach_opacity=True,
            max_per_tile=max_per_tile,
            **tier_kwargs(tiers),
        )
        loss = loss + lambda_motion * L.l1_loss(mout["render"][..., 0], frame.alpha_mask)
    if frame.thinned is not None:
        proj = project_nodes_2d(frame.cam, d["d_nodes"])
        cd = chamfer_distance(proj, frame.thinned, y_mask=frame.thinned_mask, norm=1)
        loss = loss + lambda_chamfer * jnp.float32(use_chamfer) * cd
        aux["chamfer"] = cd
    return loss, (out, aux)


@partial(
    jax.jit,
    static_argnames=(
        "use_motion_loss",
        "use_flow_loss",
        "lambda_dssim",
        "max_per_tile",
        "isotropic",
        "tile_ladder",
        "tiers",
    ),
)
def phase_b_step(
    state: Stage1State,
    frame: Frame,
    bg: jax.Array,
    lrs_gs: dict,
    lrs_warp: dict,
    key: jax.Array,
    lambda_arap: jax.Array,
    lambda_motion: jax.Array,
    lambda_flow: jax.Array | float = 0.0,
    lambda_chamfer: float = 1e-3,
    warm: bool = False,
    active_sh: int = 0,
    use_chamfer: bool = False,
    use_motion_loss: bool = False,
    use_flow_loss: bool = False,
    lambda_dssim: float = 0.2,
    max_per_tile: int = 1024,
    isotropic: bool = False,
    tile_ladder: tuple | None = None,
    tiers: tuple | None = None,
):
    m2b = jnp.zeros_like(state.gs.xyz[:, :2])

    def loss_fn(params, mean2d_bias):
        return stage1_frame_loss(
            params, state, frame, bg, mean2d_bias, key, lambda_arap, lambda_motion,
            lambda_flow, lambda_chamfer, warm=warm, active_sh=active_sh,
            use_chamfer=use_chamfer, use_motion_loss=use_motion_loss,
            use_flow_loss=use_flow_loss, lambda_dssim=lambda_dssim,
            max_per_tile=max_per_tile, isotropic=isotropic, tile_ladder=tile_ladder,
            tiers=tiers,
        )

    params = {"gs": state.gs.params_dict(), "warp": state.warp.params_dict()}
    (loss, (out, aux)), (gp, gm2b) = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(params, m2b)
    new_gs_p, opt_gs = O.adam_update(gp["gs"], state.opt_gs, params["gs"], lrs_gs)
    new_warp_p, opt_warp = O.adam_update(gp["warp"], state.opt_warp, params["warp"], lrs_warp)
    stats = G.add_densification_stats(
        state.stats_gs, gm2b, out["radii"], out["visibility_filter"],
        frame.cam.width, frame.cam.height,
    )
    new_state = dataclasses.replace(
        state,
        gs=state.gs.replace_params(new_gs_p),
        warp=state.warp.replace_params(new_warp_p),
        opt_gs=opt_gs,
        opt_warp=opt_warp,
        stats_gs=stats,
    )
    metrics = {"loss": loss, "psnr": L.psnr(out["render"], frame.image), "n_gs": state.gs.num_alive}
    metrics.update({k: v for k, v in aux.items() if k != "img_loss"})
    # ladder policy inputs (tile_counts is non-scalar — filtered from logging)
    metrics["overflow_tiles"] = out["overflow_tiles"]
    metrics["tile_counts"] = out["tile_counts"]
    return new_state, metrics


# ---------------------------------------------------------------------------
# Host loop
# ---------------------------------------------------------------------------


def train_stage1(
    scene: SceneData,
    cfg: Config,
    seed: int = 0,
    log_every: int = 0,
    eval_every: int = 0,
    eval_fn=None,
    step_callback=None,
    source_path: str | None = None,
):
    o = cfg.opt
    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)
    state = init_stage1(ik, scene, cfg)
    bg = jnp.ones(3) if scene.white_background else jnp.zeros(3)
    rng = np.random.default_rng(seed)
    frames = scene.train_frames
    ti = scene.time_interval
    history = []
    from riggs_tpu.train.sampling import FrameSampler

    sampler = FrameSampler(frames, rng)

    # ---- phase A --------------------------------------------------------
    # zero-host-traffic steps: all schedules derive from state.it on device
    # (each per-step scalar put costs ~25-35 ms over the tunneled chip); the
    # RNG keeps the host split chain (device arrays, no transfer) so streams
    # match the pre-refactor trainer exactly
    step_a = make_phase_a_auto(cfg, ti)
    step_ref = make_phase_ref_auto(cfg)
    use_ref_points = frames[0].reference_points is not None
    for it in range(o.iterations_node_rendering):
        frame = frames[
            sampler.sample(
                it,
                o.progressive_train_node,
                o.progressive_stage_ratio,
                o.progressive_stage_steps,
                warmup_until=o.node_warm_up if o.progressive_train_node else 0,
            )
        ]
        key, sk = jax.random.split(key)  # before the branch: round-4 stream order
        if use_ref_points:
            # ZJU path: SMPL-prior supervision replaces node rendering
            state, metrics = step_ref(
                state,
                frame,
                bg,
                use_chamfer=frame.thinned is not None,
                max_per_tile=cfg.pipe.max_per_tile,
            )
            if log_every and it % log_every == 0:
                history.append(("A", it, {k: float(v) for k, v in metrics.items()}))
                m = history[-1][2]
                print(f"[A-ref {it}] loss={m['loss']:.5f}")
            continue
        state, metrics = step_a(
            state,
            frame,
            bg,
            sk,
            lambda_dssim=o.lambda_dssim,
            max_per_tile=cfg.pipe.max_per_tile,
        )
        if it < o.iterations_node_sampling and it > 0 and it % o.densification_interval == 0:
            key, sk = jax.random.split(key)
            st = gs_densify_step(
                Stage1TrainView(state.node_gs, state.opt_node, state.stats_node),
                sk,
                o.densify_grad_threshold,
                scene.cameras_extent,
                percent_dense=o.percent_dense,
            )
            state = dataclasses.replace(state, node_gs=st.gs, opt_node=st.opt, stats_node=st.stats)
        if it == o.iterations_node_sampling:
            state = downsample_nodes(state, cfg)
        if log_every and it % log_every == 0:
            history.append(("A", it, {k: float(v) for k, v in metrics.items()}))
            m = history[-1][2]
            print(f"[A {it}] loss={m['loss']:.4f} psnr={m['psnr']:.2f} nodes={int(m['n_node_gs'])}")
    if not use_ref_points and o.iterations_node_rendering > o.iterations_node_sampling:
        state = finalize_nodes(state)

    # ---- phase B --------------------------------------------------------
    # RAFT flow files (raft_neighbouring/, scene/__init__.py:87-91): sample a
    # random partner's flow each step and attach it to the frame pytree
    flow_store = None
    if source_path is not None and scene.train_image_names is not None:
        from riggs_tpu.data.flow import FlowStore

        fs = FlowStore(
            source_path, scene.train_image_names, [float(f.fid) for f in frames]
        )
        if any(fs.has_flow(i) for i in range(len(frames))):
            flow_store = fs

    sampler = FrameSampler(frames, rng)
    # count-adaptive window ladder (render/ladder.py LadderPolicy): probe
    # rides the first steps, refit on counted overflow (see train_stage2)
    ladder_pol = None
    if cfg.pipe.use_tile_ladder and cfg.pipe.rasterizer == "tiled":
        from riggs_tpu.render.ladder import LadderPolicy

        ladder_pol = LadderPolicy(
            n_buckets=cfg.pipe.ladder_buckets, margin=cfg.pipe.ladder_margin
        )
    densified_at = -1
    # phase-B schedules restart at 0: reset the device-side counter
    state = dataclasses.replace(state, it=jnp.zeros((), jnp.int32))
    step_b = make_phase_b_auto(cfg)
    use_chamfer = frames[0].thinned is not None
    use_motion = o.gt_alpha_mask_as_dynamic_mask and frames[0].alpha_mask is not None
    # overflow is checked EVERY step but read ONE step late: the d2h sync of
    # step N-1's scalar overlaps step N's execution, keeping the device
    # pipeline full (a blocking same-step read costs a full tunnel round
    # trip per iteration). A stale ladder therefore truncates at most two
    # steps before the refit lands — still never silent.
    prev = None  # (it, metrics) of the previous step
    for it in range(o.iterations):
        fidx = sampler.sample(
            it, o.progressive_train, o.progressive_stage_ratio, o.progressive_stage_steps
        )
        frame = frames[fidx]
        # flow scenes keep ONE jit signature: the frame always carries flow
        # arrays (zeros when this step draws no partner) and the loss is
        # gated by the traced lam_flow / flow_mask, not by pytree structure
        if flow_store is not None:
            sampled = None
            lam_flow_h = S.landmark_interpolate(
                o.lambda_optical_landmarks, o.lambda_optical_steps, it
            )
            if it >= o.warm_up and lam_flow_h > 0:
                sampled = flow_store.sample(fidx, rng, frame.cam.height, frame.cam.width)
            if sampled is not None:
                fl, fm, pfid = sampled
            else:
                # zero mask kills the flow term exactly (m == 0 everywhere)
                fl = np.zeros((frame.cam.height, frame.cam.width, 2), np.float32)
                fm = np.zeros((frame.cam.height, frame.cam.width), np.float32)
                pfid = float(frame.fid)
            frame = dataclasses.replace(
                frame,
                flow=jnp.asarray(fl),
                flow_mask=jnp.asarray(fm),
                flow_partner_fid=jnp.asarray(pfid, jnp.float32),
            )
        key, sk = jax.random.split(key)
        state, metrics = step_b(
            state,
            frame,
            bg,
            sk,
            use_chamfer=use_chamfer,
            use_motion_loss=use_motion,
            use_flow_loss=flow_store is not None,
            lambda_dssim=o.lambda_dssim,
            max_per_tile=cfg.pipe.max_per_tile,
            isotropic=cfg.model.use_isotropic_gs,
            tile_ladder=ladder_pol.ladder if ladder_pol is not None else None,
        )
        if ladder_pol is not None and prev is not None:
            p_it, p_metrics = prev
            overflow = int(p_metrics["overflow_tiles"])
            if (
                ladder_pol.ladder is None
                or overflow > 0
                or p_it % cfg.pipe.ladder_check_every == 0
                or p_it == densified_at + 1
            ):
                ladder_pol.observe(p_metrics["tile_counts"], overflow)
        prev = (it, metrics)
        node_dp = (
            o.node_enable_densify_prune
            and o.node_densify_from_iter < it < o.node_densify_until_iter
            and it % o.node_densification_interval == 0
            and it > o.warm_up
        ) or it == o.node_force_densify_prune_step
        if node_dp:
            state = node_densify_prune(state, cfg, o.densify_grad_threshold)
        if o.densify_from_iter < it < o.densify_until_iter and it % o.densification_interval == 0:
            key, sk = jax.random.split(key)
            st = gs_densify_step(
                Stage1TrainView(state.gs, state.opt_gs, state.stats_gs),
                sk,
                o.densify_grad_threshold,
                scene.cameras_extent,
                percent_dense=o.percent_dense,
            )
            state = dataclasses.replace(state, gs=st.gs, opt_gs=st.opt, stats_gs=st.stats)
            densified_at = it
            if ladder_pol is not None and ladder_pol.ladder is not None:
                # ride ahead of the growth: one anticipatory refit instead of
                # overflow-triggered churn (each refit recompiles the step)
                before = float(metrics["n_gs"])
                after = float(st.gs.num_alive)
                if before > 0 and after > before:
                    ladder_pol.anticipate(after / before)
        if it > 0 and it % o.opacity_reset_interval == 0:
            gs = G.reset_opacity(state.gs)
            opt = O.AdamState(
                mu=dict(state.opt_gs.mu, opacity=jnp.zeros_like(state.opt_gs.mu["opacity"])),
                nu=dict(state.opt_gs.nu, opacity=jnp.zeros_like(state.opt_gs.nu["opacity"])),
                count=state.opt_gs.count,
            )
            state = dataclasses.replace(state, gs=gs, opt_gs=opt)
        if log_every and it % log_every == 0:
            history.append(
                ("B", it, {k: float(v) for k, v in metrics.items() if getattr(v, "ndim", 0) == 0})
            )
            m = history[-1][2]
            print(f"[B {it}] loss={m['loss']:.4f} psnr={m['psnr']:.2f} gs={int(m['n_gs'])}")
        if eval_every and eval_fn is not None and it > 0 and it % eval_every == 0:
            eval_fn(state, it)
        if step_callback is not None:
            step_callback(state, it)
    if ladder_pol is not None:
        if prev is not None:  # flush the last step's delayed overflow check
            ladder_pol.observe(prev[1]["tile_counts"], int(prev[1]["overflow_tiles"]))
        # final ladder telemetry (refit count under densification is a key
        # operating-point health signal — BASELINE.md)
        print(f"[S1 ladder] refits={ladder_pol.refits} ladder={ladder_pol.ladder}")
    return state, history


def Stage1TrainView(gs, opt, stats):
    """Adapter: reuse the static trainer's densify_step on any (gs, opt, stats)."""
    from riggs_tpu.train.static import TrainState

    return TrainState(gs=gs, opt=opt, stats=stats)
