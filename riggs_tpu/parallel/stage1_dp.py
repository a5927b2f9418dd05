"""Frame-parallel stage-1 TRAINING LOOP over a device mesh.

Phase A (node-as-gaussians bootstrap, train_gui.py:864-1010) is short and
densify-heavy, so it runs single-chip via ``train.stage1.train_stage1``
(with phase B suppressed). Phase B — the long full-deformable phase
(train_gui.py:1025-1200) — then runs frame-parallel: each step shards
B = |mesh 'data' axis| frames over devices with replicated state
(``make_dp_stage1_step``), advancing the reference iteration counter by B
per step so landmark schedules, densification cadence and opacity resets
land at the same sample counts as the single-chip trainer. Schedule flags
(warm, active SH) cross their boundaries as traced step arguments — one
compiled step for the whole phase.

With ``source_path`` pointing at a scene with ``raft_neighbouring/`` flow
files, each batch frame draws a flow partner host-side exactly like the
single-chip trainer, and a per-frame lambda weights the flow term (zero for
frames that drew none this step) — the dp step carries the full loss set.
"""
from __future__ import annotations

import copy
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from riggs_tpu.data.dataset import SceneData
from riggs_tpu.models import gaussians as G
from riggs_tpu.parallel.mesh import shard_batch
from riggs_tpu.parallel.train import make_dp_stage1_step, stack_frames, stage1_flags
from riggs_tpu.train import optim as O
from riggs_tpu.train import schedule as S
from riggs_tpu.train.config import Config
from riggs_tpu.models import node_warp as NW


def train_stage1_dp(
    scene: SceneData,
    cfg: Config,
    mesh: Mesh,
    seed: int = 0,
    log_every: int = 0,
    step_callback=None,
    init=None,
    source_path=None,
):
    from riggs_tpu.train.stage1 import (
        Stage1TrainView,
        node_densify_prune,
        stage1_lr_fns,
        train_stage1,
    )
    from riggs_tpu.train.static import densify_step as gs_densify_step

    o = cfg.opt
    B = mesh.shape["data"]
    key = jax.random.PRNGKey(seed)
    bg = jnp.ones(3) if scene.white_background else jnp.zeros(3)
    rng = np.random.default_rng(seed)
    frames = scene.train_frames

    if init is not None:
        state = init  # phase-A-complete state (tests / resume)
    else:
        # phase A single-chip: suppress phase B by zeroing its budget
        cfg_a = copy.deepcopy(cfg)
        cfg_a.opt.iterations = 0
        state, _ = train_stage1(scene, cfg_a, seed=seed, log_every=log_every)

    # RAFT flow (raft_neighbouring/, scene/__init__.py:87-91): host-side
    # per-frame partner sampling, identical to the single-chip trainer
    flow_store = None
    if source_path is not None and scene.train_image_names is not None:
        from riggs_tpu.data.flow import FlowStore

        fs = FlowStore(
            source_path, scene.train_image_names, [float(f.fid) for f in frames]
        )
        if any(fs.has_flow(i) for i in range(len(frames))):
            flow_store = fs

    gauss_lrs, warp_lrs = stage1_lr_fns(cfg)

    # count-adaptive window ladder (render/ladder.py LadderPolicy): the probe
    # rides the first steps with plain windows; a fit/refit rebuilds the step
    # (same jit cache keying as the single-chip trainer's static arg)
    ladder_pol = None
    if cfg.pipe.use_tile_ladder and cfg.pipe.rasterizer == "tiled":
        from riggs_tpu.render.ladder import LadderPolicy

        ladder_pol = LadderPolicy(
            n_buckets=cfg.pipe.ladder_buckets, margin=cfg.pipe.ladder_margin
        )

    def build_step():
        return make_dp_stage1_step(
            mesh,
            use_chamfer=frames[0].thinned is not None,
            use_motion_loss=o.gt_alpha_mask_as_dynamic_mask and frames[0].alpha_mask is not None,
            use_flow_loss=flow_store is not None,
            lambda_chamfer=o.lambda_deformed_node_prjection,
            lambda_dssim=o.lambda_dssim,
            max_per_tile=cfg.pipe.max_per_tile,
            isotropic=cfg.model.use_isotropic_gs,
            tile_ladder=ladder_pol.ladder if ladder_pol is not None else None,
        )

    step = build_step()
    from riggs_tpu.train.sampling import FrameSampler

    sampler = FrameSampler(frames, rng)
    history = []
    densified_at = -B - 1  # last iter a densify/prune changed the cloud

    def _dev_lrs(d):
        return {k: jnp.asarray(v, jnp.float32) for k, v in d.items()}

    for it in range(0, o.iterations, B):
        uids = [
            sampler.sample(
                it + b, o.progressive_train, o.progressive_stage_ratio, o.progressive_stage_steps
            )
            for b in range(B)
        ]
        key, sk = jax.random.split(key)
        lam_arap = S.landmark_interpolate(NW.LAMBDA_ARAP_LANDMARKS, NW.LAMBDA_ARAP_STEPS, it)
        lam_motion = S.landmark_interpolate(
            o.lambda_motion_mask_landmarks, o.lambda_motion_mask_steps, it, interpolation="log"
        )
        lam_flow = S.landmark_interpolate(o.lambda_optical_landmarks, o.lambda_optical_steps, it)
        batch_frames = [frames[u] for u in uids]
        lam_flow_b = np.zeros(B, np.float32)
        if flow_store is not None:
            for b, u in enumerate(uids):
                f = batch_frames[b]
                sampled = None
                if it >= o.warm_up and lam_flow > 0:
                    sampled = flow_store.sample(u, rng, f.cam.height, f.cam.width)
                if sampled is not None:
                    fl, fm, pfid = sampled
                    lam_flow_b[b] = lam_flow
                else:
                    fl = np.zeros((f.cam.height, f.cam.width, 2), np.float32)
                    fm = np.zeros((f.cam.height, f.cam.width), np.float32)
                    pfid = float(f.fid)
                batch_frames[b] = dataclasses.replace(
                    f,
                    flow=jnp.asarray(fl),
                    flow_mask=jnp.asarray(fm),
                    flow_partner_fid=jnp.asarray(pfid, jnp.float32),
                )
        batch = shard_batch(stack_frames(batch_frames), mesh)
        state, metrics = step(
            state,
            batch,
            bg,
            _dev_lrs(gauss_lrs(it)),
            _dev_lrs(warp_lrs(it)),
            shard_batch(jax.random.split(sk, B), mesh),
            jnp.asarray(lam_arap, jnp.float32),
            jnp.asarray(lam_motion, jnp.float32),
            shard_batch(jnp.asarray(lam_flow_b, jnp.float32), mesh),
            stage1_flags(
                warm=it < o.warm_up,
                active_sh=min(it // o.oneupSHdegree_step, cfg.model.sh_degree),
            ),
        )
        steps_done = it // B
        if ladder_pol is not None:
            # overflow is checked EVERY step (one scalar sync): a stale ladder
            # must never truncate renders for longer than the step that
            # detects it (ADVICE r3 #1). tile_counts (T,) transfers only when
            # a refit is actually considered.
            overflow = int(metrics["overflow_tiles"])
            if (
                ladder_pol.ladder is None
                or overflow > 0
                or steps_done % max(cfg.pipe.ladder_check_every // B, 1) == 0
                or it == densified_at + B
            ):
                if ladder_pol.observe(metrics["tile_counts"], overflow):
                    step = build_step()
        node_dp = (
            o.node_enable_densify_prune
            and o.node_densify_from_iter < it < o.node_densify_until_iter
            and steps_done % max(o.node_densification_interval // B, 1) == 0
            and it > o.warm_up
        ) or (it <= o.node_force_densify_prune_step < it + B)
        if node_dp:
            state = node_densify_prune(state, cfg, o.densify_grad_threshold)
            densified_at = it
        if (
            o.densify_from_iter < it < o.densify_until_iter
            and steps_done % max(o.densification_interval // B, 1) == 0
        ):
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
        if it > 0 and steps_done % max(o.opacity_reset_interval // B, 1) == 0:
            gs = G.reset_opacity(state.gs)
            opt = O.AdamState(
                mu=dict(state.opt_gs.mu, opacity=jnp.zeros_like(state.opt_gs.mu["opacity"])),
                nu=dict(state.opt_gs.nu, opacity=jnp.zeros_like(state.opt_gs.nu["opacity"])),
                count=state.opt_gs.count,
            )
            state = dataclasses.replace(state, gs=gs, opt_gs=opt)
        if log_every and steps_done % max(log_every // B, 1) == 0:
            m = {k: float(v) for k, v in metrics.items() if getattr(v, "ndim", 0) == 0}
            history.append(("Bdp", it, m))
            print(f"[S1dp {it}] loss={m['loss']:.4f} psnr={m['psnr']:.2f}")
        if step_callback is not None:
            step_callback(state, it)
    return state, history
