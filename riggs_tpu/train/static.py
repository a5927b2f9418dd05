"""Static 3DGS training: the minimum end-to-end slice (SURVEY.md §7 step 5).

Fits a Gaussians pytree to posed images: data -> render -> loss -> grads ->
Adam -> densify, all on-device. The jitted train step is shape-stable across
the whole run (capacity padding); densification is a second jitted function
invoked every ``densification_interval`` steps from the host loop, mirroring
the reference cadence (/root/reference/train_gui.py:1182-1196) with masked
scatters instead of tensor surgery.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from riggs_tpu.camera.camera import Camera
from riggs_tpu.models import gaussians as G
from riggs_tpu.render.api import render
from riggs_tpu.train import losses as L
from riggs_tpu.train import optim as O
from riggs_tpu.train import schedule as S
from riggs_tpu.train.config import Config


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    gs: G.Gaussians
    opt: O.AdamState
    stats: G.DensifyStats


def init_state(gs: G.Gaussians) -> TrainState:
    return TrainState(gs=gs, opt=O.adam_init(gs.params_dict()), stats=G.init_densify_stats(gs.capacity))


def make_lr_schedules(cfg: Config, spatial_lr_scale: float = 1.0):
    o = cfg.opt
    xyz = S.expon_lr(
        o.position_lr_init * spatial_lr_scale,
        o.position_lr_final * spatial_lr_scale,
        lr_delay_mult=o.position_lr_delay_mult,
        max_steps=o.position_lr_max_steps,
    )
    return {
        "xyz": xyz,
        "f_dc": lambda s: o.feature_lr,
        "f_rest": lambda s: o.feature_lr / 20.0,
        "opacity": lambda s: o.opacity_lr,
        "scaling": lambda s: o.scaling_lr,
        "rotation": lambda s: o.rotation_lr,
        "feature": lambda s: o.feature_lr,
    }


@partial(jax.jit, static_argnames=("lambda_dssim", "rasterizer", "max_per_tile"))
def train_step(
    state: TrainState,
    cam: Camera,
    gt_image: jax.Array,
    bg: jax.Array,
    lrs: dict,
    active_sh: int | jax.Array = 0,  # traced: SH warmup reuses one program
    lambda_dssim: float = 0.2,
    rasterizer: str = "tiled",
    max_per_tile: int = 1024,
):
    m2b = jnp.zeros_like(state.gs.xyz[:, :2])

    def loss_fn(params, mean2d_bias):
        gs = state.gs.replace_params(params)
        out = render(
            cam,
            gs,
            bg,
            active_sh_degree=active_sh,
            mean2d_bias=mean2d_bias,
            rasterizer=rasterizer,
            max_per_tile=max_per_tile,
        )
        loss = L.photometric_loss(out["render"], gt_image, lambda_dssim)
        return loss, out

    params = state.gs.params_dict()
    (loss, out), (gp, gm2b) = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(params, m2b)
    new_params, new_opt = O.adam_update(gp, state.opt, params, lrs)
    new_stats = G.add_densification_stats(
        state.stats, gm2b, out["radii"], out["visibility_filter"], cam.width, cam.height
    )
    new_state = TrainState(gs=state.gs.replace_params(new_params), opt=new_opt, stats=new_stats)
    metrics = {
        "loss": loss,
        "psnr": L.psnr(out["render"], gt_image),
        "num_alive": state.gs.num_alive,
        "overflow": out["overflow"],
    }
    return new_state, metrics


@partial(jax.jit, static_argnames=("percent_dense", "max_screen_size"))
def densify_step(
    state: TrainState,
    key: jax.Array,
    grad_threshold: float,
    scene_extent: float,
    min_opacity: float = 0.005,
    max_screen_size: float = 0.0,
    percent_dense: float = 0.01,
):
    stats_grad = jnp.where(
        state.stats.denom > 0, state.stats.xyz_gradient_accum / jnp.maximum(state.stats.denom, 1.0), 0.0
    )
    gs, dest_c = G.densify_clone(state.gs, stats_grad, grad_threshold, scene_extent, percent_dense)
    gs, dest_s = G.densify_split(gs, stats_grad, grad_threshold, scene_extent, key, percent_dense=percent_dense)
    gs = G.prune_by_opacity(gs, min_opacity, state.stats.max_radii2d, max_screen_size, scene_extent)
    opt = O.zero_rows(state.opt, jnp.concatenate([dest_c[None], dest_s], axis=0).reshape(-1))
    return TrainState(gs=gs, opt=opt, stats=G.init_densify_stats(gs.capacity))


@jax.jit
def reset_opacity_step(state: TrainState) -> TrainState:
    gs = G.reset_opacity(state.gs)
    # fresh moments for the opacity leaf (reference replace_tensor_to_optimizer)
    opt = O.AdamState(
        mu=dict(state.opt.mu, opacity=jnp.zeros_like(state.opt.mu["opacity"])),
        nu=dict(state.opt.nu, opacity=jnp.zeros_like(state.opt.nu["opacity"])),
        count=state.opt.count,
    )
    return TrainState(gs=gs, opt=opt, stats=state.stats)


def compute_scene_extent(cams: list[Camera]) -> float:
    """NeRF++-style radius of the camera rig (reference getNerfppNorm)."""
    centers = np.stack([np.asarray(-np.asarray(c.w2c)[:3, :3].T @ np.asarray(c.w2c)[:3, 3]) for c in cams])
    center = centers.mean(0)
    return float(np.max(np.linalg.norm(centers - center, axis=-1)) * 1.1)


def train_static(
    data: list[tuple[Camera, np.ndarray]],
    cfg: Config,
    iterations: int,
    init_points: np.ndarray,
    init_colors: np.ndarray,
    seed: int = 0,
    bg: np.ndarray | None = None,
    log_every: int = 0,
):
    """Host training loop for the static case. Returns (state, history)."""
    o = cfg.opt
    gs = G.create_from_pcd(
        init_points,
        init_colors,
        capacity=cfg.model.capacity,
        max_sh_degree=cfg.model.sh_degree,
        isotropic=cfg.model.use_isotropic_gs,
        with_motion_mask=cfg.model.gs_with_motion_mask,
    )
    state = init_state(gs)
    lr_fns = make_lr_schedules(cfg)
    scene_extent = compute_scene_extent([c for c, _ in data])
    key = jax.random.PRNGKey(seed)
    bg = jnp.zeros(3) if bg is None else jnp.asarray(bg)
    rng = np.random.default_rng(seed)
    history = []

    for it in range(iterations):
        cam, img = data[rng.integers(len(data))]
        active_sh = min(it // o.oneupSHdegree_step, cfg.model.sh_degree)
        lrs = {k: jnp.asarray(fn(it), jnp.float32) for k, fn in lr_fns.items()}
        state, metrics = train_step(
            state,
            cam,
            jnp.asarray(img),
            bg,
            lrs,
            active_sh=active_sh,
            lambda_dssim=o.lambda_dssim,
            rasterizer=cfg.pipe.rasterizer,
            max_per_tile=cfg.pipe.max_per_tile,
        )
        if o.densify_from_iter <= it < o.densify_until_iter and it % o.densification_interval == 0 and it > 0:
            key, sub = jax.random.split(key)
            # big-splat pruning (screen-size 20 + 0.1*extent world prune)
            # activates after the first opacity reset, mirroring
            # /root/reference/train_gui.py:1190-1192
            state = densify_step(
                state,
                sub,
                o.densify_grad_threshold,
                scene_extent,
                max_screen_size=20.0 if it > o.opacity_reset_interval else 0.0,
                percent_dense=o.percent_dense,
            )
        if it > 0 and it % o.opacity_reset_interval == 0:
            state = reset_opacity_step(state)
        if log_every and it % log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            history.append((it, m))
            print(f"[{it}] loss={m['loss']:.4f} psnr={m['psnr']:.2f} alive={int(m['num_alive'])}")
    return state, history
