"""Frame-parallel stage-2 TRAINING LOOP over a device mesh.

Runs the full reference stage-2 schedule (train_rig.py:370-533: warmup
distillation, staged template-offset/skinning-MLP unlock with control-node
FPS reset, per-group LR schedules, densification, robust-chamfer buffer,
best-PSNR checkpoints) with the frame-parallel ``make_dp_stage2_step``:
each step shards a batch of B = |mesh 'data' axis| frames across devices,
parameters stay replicated, and the mean gradient psums over ICI — B
reference iterations of sample throughput per step.

Iteration accounting: the loop advances the reference iteration counter by
B per dp step, so schedules, warmup/unlock boundaries and densification
cadence land at the same *sample counts* as the single-chip trainer.
Schedule flags cross their boundaries as traced step arguments
(``stage2_flags``), so the whole run uses ONE compiled step.

Host-side phases (densification, opacity resets, FPS control-node reset,
eval) operate on the replicated state exactly as single-chip — a replicated
pytree is a valid input to any single-chip jit.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from riggs_tpu.data.dataset import SceneData
from riggs_tpu.models import gaussians as G
from riggs_tpu.ops.fps import farthest_point_sample
from riggs_tpu.parallel.mesh import shard_batch
from riggs_tpu.parallel.train import (
    make_dp_stage2_step,
    stack_frames,
    stage2_flags,
)
from riggs_tpu.train import schedule as S
from riggs_tpu.train.config import Config
from riggs_tpu.train.stage2 import evaluate_stage2, init_stage2
from riggs_tpu.train.static import densify_step as gs_densify_step, TrainState as _GsView


def train_stage2_dp(
    stage1_state,
    scene: SceneData,
    cfg: Config,
    mesh: Mesh,
    seed: int = 0,
    log_every: int = 0,
    test_every: int = 0,
    model_path=None,
    step_callback=None,
    init=None,
):
    o = cfg.opt
    B = mesh.shape["data"]
    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)
    if init is not None:
        state, info, frames = init  # prebuilt (tests / resume paths)
    else:
        state, info, frames = init_stage2(ik, stage1_state, scene, cfg)
    bg = jnp.ones(3) if scene.white_background else jnp.zeros(3)
    rng = np.random.default_rng(seed)

    gs_lr = S.expon_lr(
        o.position_lr_init,
        o.position_lr_final,
        lr_delay_mult=o.position_lr_delay_mult,
        max_steps=o.position_lr_max_steps,
    )
    skel_lr = S.expon_lr(
        o.deform_mlp_lr_init,
        o.deform_mlp_lr_final,
        lr_delay_mult=o.deform_mlp_lr_delay_mult,
        max_steps=o.deform_mlp_lr_max_steps,
    )
    pre_d_xyz = np.asarray(info.d_xyz)
    pre_d_joints = np.asarray(info.d_joints)
    history = []
    best_psnr = -1.0
    densified_at = -B - 1  # last iter a densify step changed the cloud
    use_chamfer = (
        frames[0].thinned is not None and o.lambda_deformed_node_prjection > 1e-8
    )
    # count-adaptive window ladder (render/ladder.py LadderPolicy): probe
    # rides the first steps with plain windows; a fit/refit rebuilds the step.
    # The ladder doesn't compose with tile-sharding (make_dp_stage2_step
    # keeps plain windows when tile_parallel), so skip the policy there.
    tile_parallel = mesh.shape.get("tile", 1) > 1
    ladder_pol = None
    if cfg.pipe.use_tile_ladder and cfg.pipe.rasterizer == "tiled" and not tile_parallel:
        from riggs_tpu.render.ladder import LadderPolicy

        ladder_pol = LadderPolicy(
            n_buckets=cfg.pipe.ladder_buckets, margin=cfg.pipe.ladder_margin
        )

    def build_step():
        return make_dp_stage2_step(
            mesh,
            use_chamfer=use_chamfer,
            lambda_chamfer=o.lambda_deformed_node_prjection,
            lambda_rendering=o.lambda_rendering_image,
            lambda_dssim=o.lambda_dssim,
            max_per_tile=cfg.pipe.max_per_tile,
            isotropic=cfg.model.use_isotropic_gs,
            # 2D mesh: also shard each frame's blend over the 'tile' axis
            tile_parallel=tile_parallel,
            tile_ladder=ladder_pol.ladder if ladder_pol is not None else None,
        )

    step = build_step()
    from riggs_tpu.train.sampling import FrameSampler

    sampler = FrameSampler(frames, rng)
    unlocked = False

    n_iters = o.iterations if o.iterations_stage2 is None else o.iterations_stage2
    for it in range(0, n_iters, B):
        warm = it < o.skeleton_warm_up
        if not unlocked and it >= o.optimize_template_offsets_iters:
            # staged unlocking + control-node FPS reset (train_rig.py:398-408)
            idx = farthest_point_sample(
                state.gs.xyz, cfg.model.skeleton_gs_sample_num, mask=state.gs.alive
            )
            state = dataclasses.replace(
                state, skel=dataclasses.replace(state.skel, control_nodes=state.gs.xyz[idx])
            )
            unlocked = True
        enable_to = cfg.model.use_template_offsets and it >= o.optimize_template_offsets_iters
        enable_sm = cfg.model.use_skinning_weight_mlp and it > o.optimize_template_offsets_iters

        uids = np.array(
            [
                sampler.sample(
                    it + b, o.progressive_train, o.progressive_stage_ratio, o.progressive_stage_steps
                )
                for b in range(B)
            ],
            np.int32,
        )
        lam_to = np.full(
            (B,), o.lambda_template_offsets, np.float32
        ) * np.where(uids == info.template_idx, 1e3, 1.0).astype(np.float32)
        lam_tf = np.where(
            uids == info.template_idx, o.lambda_template_fixed, 0.0
        ).astype(np.float32)
        lrs_gs = {
            "xyz": jnp.asarray(gs_lr(it), jnp.float32),
            "f_dc": jnp.asarray(o.feature_lr),
            "f_rest": jnp.asarray(o.feature_lr / 20.0),
            "opacity": jnp.asarray(o.opacity_lr),
            "scaling": jnp.asarray(o.scaling_lr),
            "rotation": jnp.asarray(o.rotation_lr),
            "feature": jnp.asarray(o.feature_lr),
        }
        lr_s = 5e-4 if warm else skel_lr(max(0, it - o.skeleton_warm_up))
        batch = shard_batch(stack_frames([frames[u] for u in uids]), mesh)
        state, metrics = step(
            state,
            batch,
            jnp.asarray(uids),
            bg,
            lrs_gs,
            jnp.asarray(lr_s, jnp.float32),
            shard_batch(jnp.asarray(pre_d_xyz[uids]), mesh),
            shard_batch(jnp.asarray(pre_d_joints[uids]), mesh),
            shard_batch(jnp.asarray(lam_to), mesh),
            shard_batch(jnp.asarray(lam_tf), mesh),
            stage2_flags(
                warm=warm,
                active_sh=min(it // o.oneupSHdegree_step, cfg.model.sh_degree),
                enable_to=enable_to,
                enable_sm=enable_sm,
            ),
        )
        if ladder_pol is not None:
            # overflow is checked EVERY step (one scalar sync): a stale ladder
            # must never truncate renders for longer than the step that
            # detects it (ADVICE r3 #1). tile_counts (T,) transfers only when
            # a refit is actually considered.
            overflow = int(metrics["overflow_tiles"])
            if (
                ladder_pol.ladder is None
                or overflow > 0
                or (it // B) % max(cfg.pipe.ladder_check_every // B, 1) == 0
                or it == densified_at + B
            ):
                if ladder_pol.observe(metrics["tile_counts"], overflow):
                    step = build_step()
        if (
            not warm
            and o.gs_densification_iterations < it < o.densify_until_iter
            and it > o.densify_from_iter
            and (it // B) % max(o.densification_interval // B, 1) == 0
        ):
            key, sk = jax.random.split(key)
            st = gs_densify_step(
                _GsView(state.gs, state.opt_gs, state.stats_gs),
                sk,
                o.densify_grad_threshold,
                scene.cameras_extent,
                percent_dense=o.percent_dense,
            )
            state = dataclasses.replace(state, gs=st.gs, opt_gs=st.opt, stats_gs=st.stats)
            densified_at = it
        if log_every and (it // B) % max(log_every // B, 1) == 0:
            m = {k: float(v) for k, v in metrics.items() if getattr(v, "ndim", 0) == 0}
            history.append((it, m))
            print(
                f"[S2dp {it}] loss={m['loss']:.4f} psnr={m['psnr']:.2f}"
                + (" (warm)" if warm else "")
            )
        if (
            test_every
            and it > 0
            and (it // B) % max(test_every // B, 1) == 0
            and scene.test_frames
        ):
            means = evaluate_stage2(state, scene.test_frames, bg)
            print("[S2dp %d] test: " % it + " ".join(f"{k}={v:.4f}" for k, v in means.items()))
            if means.get("psnr", 0.0) > best_psnr and model_path is not None:
                best_psnr = means["psnr"]
                from riggs_tpu.io.checkpoint import save_checkpoint

                save_checkpoint(model_path, it, state, gs=state.gs)
        if step_callback is not None:
            step_callback(state, it)
    return state, info, history
