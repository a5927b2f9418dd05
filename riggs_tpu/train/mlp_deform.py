"""Trainer for the 'mlp' deform type (per-Gaussian DeformNetwork baseline).

The reference's train path when --deform_type mlp (train_gui.py:1031-1038):
a warm-up with zero deformation, then photometric training of Gaussians +
the time-conditioned MLP queried at every Gaussian, with standard
densification. One jitted step; host loop mirrors train/static.py.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.data.dataset import Frame, SceneData
from riggs_tpu.models import gaussians as G
from riggs_tpu.models.simple_deform import MlpDeform, init_mlp_deform, mlp_deform_forward
from riggs_tpu.models.deform_mlp import DeformNetworkDef
from riggs_tpu.render.api import render
from riggs_tpu.train import losses as L
from riggs_tpu.train import optim as O
from riggs_tpu.train.config import Config
from riggs_tpu.train.stage1 import stage1_lr_fns, _to_device_lrs
from riggs_tpu.train.static import densify_step as gs_densify_step, TrainState as _GsView


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MlpDeformState:
    gs: G.Gaussians
    deform: MlpDeform
    opt_gs: O.AdamState
    opt_deform: O.AdamState
    stats: G.DensifyStats


@partial(jax.jit, static_argnames=("lambda_dssim", "max_per_tile"))
def mlp_deform_step(
    state: MlpDeformState,
    frame: Frame,
    bg: jax.Array,
    lrs_gs: dict,
    lrs_deform,
    warm: bool | jax.Array = False,
    active_sh: int | jax.Array = 0,
    lambda_dssim: float = 0.2,
    max_per_tile: int = 1024,
):
    m2b = jnp.zeros_like(state.gs.xyz[:, :2])
    # warm is a traced 0/1 weight (0-weighted deform == the old static-args
    # canonical warmup, exactly): one compiled program across the boundary
    w = 1.0 - jnp.float32(warm)

    def loss_fn(params, mean2d_bias):
        gs = state.gs.replace_params(params["gs"])
        deform = state.deform.replace_params(params["deform"])
        d = mlp_deform_forward(deform, gs.xyz, frame.fid, gs.motion_mask)
        d_xyz, d_rot, d_scale = w * d["d_xyz"], w * d["d_rotation"], w * d["d_scaling"]
        out = render(
            frame.cam,
            gs,
            bg,
            d_xyz=d_xyz,
            d_rotation=d_rot,
            d_scaling=d_scale,
            active_sh_degree=active_sh,
            mean2d_bias=mean2d_bias,
            max_per_tile=max_per_tile,
        )
        return L.photometric_loss(out["render"], frame.image, lambda_dssim), out

    params = {"gs": state.gs.params_dict(), "deform": state.deform.params_dict()}
    (loss, out), (gp, gm2b) = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(params, m2b)
    new_gs_p, opt_gs = O.adam_update(gp["gs"], state.opt_gs, params["gs"], lrs_gs)
    new_d_p, opt_d = O.adam_update(gp["deform"], state.opt_deform, params["deform"], lrs_deform)
    stats = G.add_densification_stats(
        state.stats, gm2b, out["radii"], out["visibility_filter"],
        frame.cam.width, frame.cam.height,
    )
    # freeze the deform net during warmup (traced select — even Adam's moment
    # decay must not run, matching the old static-args freeze exactly)
    def keep_old(old, new):
        return jax.tree.map(lambda a, b: jnp.where(jnp.bool_(warm), a, b), old, new)

    new_state = MlpDeformState(
        gs=state.gs.replace_params(new_gs_p),
        deform=keep_old(state.deform, state.deform.replace_params(new_d_p)),
        opt_gs=opt_gs,
        opt_deform=keep_old(state.opt_deform, opt_d),
        stats=stats,
    )
    metrics = {"loss": loss, "psnr": L.psnr(out["render"], frame.image), "n_gs": state.gs.num_alive}
    return new_state, metrics


def train_mlp_deform(scene: SceneData, cfg: Config, seed: int = 0, log_every: int = 0):
    o = cfg.opt
    key = jax.random.PRNGKey(seed)
    gs = G.create_from_pcd(
        scene.init_points,
        scene.init_colors,
        capacity=cfg.model.capacity,
        max_sh_degree=cfg.model.sh_degree,
        isotropic=cfg.model.use_isotropic_gs,
        fea_dim=cfg.model.hyper_dim,
        with_motion_mask=cfg.model.gs_with_motion_mask,
    )
    key, dk = jax.random.split(key)
    deform = init_mlp_deform(dk, DeformNetworkDef(is_blender=scene.is_blender))
    state = MlpDeformState(
        gs=gs,
        deform=deform,
        opt_gs=O.adam_init(gs.params_dict()),
        opt_deform=O.adam_init(deform.params_dict()),
        stats=G.init_densify_stats(gs.capacity),
    )
    gauss_lrs, warp_lrs = stage1_lr_fns(cfg)
    bg = jnp.ones(3) if scene.white_background else jnp.zeros(3)
    rng = np.random.default_rng(seed)
    history = []
    for it in range(o.iterations):
        frame = scene.train_frames[rng.integers(len(scene.train_frames))]
        state, metrics = mlp_deform_step(
            state,
            frame,
            bg,
            _to_device_lrs(gauss_lrs(it)),
            jnp.asarray(warp_lrs(it)["mlp"], jnp.float32),
            warm=it < o.warm_up,
            active_sh=min(it // o.oneupSHdegree_step, cfg.model.sh_degree),
            lambda_dssim=o.lambda_dssim,
            max_per_tile=cfg.pipe.max_per_tile,
        )
        if o.densify_from_iter < it < o.densify_until_iter and it % o.densification_interval == 0:
            key, sk = jax.random.split(key)
            st = gs_densify_step(
                _GsView(state.gs, state.opt_gs, state.stats),
                sk,
                o.densify_grad_threshold,
                scene.cameras_extent,
                percent_dense=o.percent_dense,
            )
            state = dataclasses.replace(state, gs=st.gs, opt_gs=st.opt, stats=st.stats)
        if log_every and it % log_every == 0:
            history.append((it, {k: float(v) for k, v in metrics.items()}))
            m = history[-1][1]
            print(f"[mlp {it}] loss={m['loss']:.4f} psnr={m['psnr']:.2f}")
    return state, history
