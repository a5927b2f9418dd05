"""Sharded training steps: frame-parallel (dp) + tile-parallel rendering.

The multi-chip train step batches B frames, vmaps the per-frame
render-and-loss, and takes the mean; with the frame batch sharded over the
mesh's 'data' axis and parameters replicated, XLA turns the mean-gradient
into a psum over ICI — the design SURVEY.md §2.2 prescribes instead of the
reference's (non-existent) distributed path.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from riggs_tpu.data.dataset import Frame
from riggs_tpu.models import gaussians as G
from riggs_tpu.models import node_warp as NW
from riggs_tpu.models import skeleton_warp as SW
from riggs_tpu.render.api import render
from riggs_tpu.train import losses as L
from riggs_tpu.train import optim as O
from riggs_tpu.train.stage2 import Stage2State


def stack_frames(frames: list[Frame]) -> Frame:
    """Stack a list of Frames into one struct-of-arrays Frame batch."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *frames)


def stage2_flags(warm=False, active_sh=0, enable_to=True, enable_sm=True) -> dict:
    """Traced schedule-flag pytree for the dp stage-2 step: the values are
    step ARGUMENTS (0/1 weights + banded-SH degree), so warmup, staged unlock
    and SH bumps reuse one compiled step (see train.stage2.stage2_frame_loss)."""
    return dict(
        warm=jnp.asarray(warm, jnp.bool_),
        active_sh=jnp.asarray(active_sh, jnp.int32),
        enable_to=jnp.asarray(enable_to, jnp.bool_),
        enable_sm=jnp.asarray(enable_sm, jnp.bool_),
    )


def stage1_flags(warm=False, active_sh=0) -> dict:
    """Traced schedule-flag pytree for the dp stage-1 phase-B step."""
    return dict(
        warm=jnp.asarray(warm, jnp.bool_),
        active_sh=jnp.asarray(active_sh, jnp.int32),
    )


def make_dp_stage2_step(
    mesh: Mesh,
    use_chamfer: bool = False,
    lambda_chamfer: float = 1e-3,
    lambda_rendering: float = 1.0,
    lambda_dssim: float = 0.2,
    max_per_tile: int = 256,
    isotropic: bool = False,
    tile_parallel: bool = False,
    tile_ladder: tuple | None = None,
):
    """Build a jitted frame-parallel stage-2 training step over ``mesh``.

    This is the REAL stage-2 step (train_rig.py:386-533 semantics), not a
    photometric demo slice: it carries the full loss set of
    ``train.stage2.stage2_frame_loss`` (warmup distillation to the pretrained
    deformation, robust per-frame-weighted 2D chamfer, template-offset and
    template-fixed-pose losses), per-group LR schedules (``lrs_gs`` dict +
    skeleton LR), densification-stat accumulation summed over the frame
    batch, and the per-frame robust-chamfer loss-buffer update.

    The returned step(state, frame_batch, uids, bg, lrs_gs, lrs_skel,
    pre_d_xyz_b, pre_d_joints_b, lambda_to, lambda_tf) shards frame_batch /
    uids / pre-deformation targets over 'data', keeps state replicated, and
    all-reduces gradients implicitly through the mean over frames. With a
    batch of B frames one step applies the mean gradient of B reference
    steps; per-frame densification stats accumulate exactly as B sequential
    reference iterations would (grads rescaled by B to undo the mean).
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    from riggs_tpu.train.stage2 import stage2_frame_loss

    def loss_fn(params, state, frame_batch, uids, bg, m2b, pre_dx, pre_dj, lam_to, lam_tf, flags):
        def one(frame, uid, m2b_f, pdx, pdj, l_to, l_tf):
            loss, (out, aux, _d) = stage2_frame_loss(
                params, state, frame, uid, bg, m2b_f, pdx, pdj, l_to, l_tf,
                lambda_chamfer=lambda_chamfer,
                lambda_rendering=lambda_rendering,
                warm=flags["warm"],
                active_sh=flags["active_sh"],
                enable_to=flags["enable_to"],
                enable_sm=flags["enable_sm"],
                use_chamfer=use_chamfer,
                lambda_dssim=lambda_dssim,
                max_per_tile=max_per_tile,
                isotropic=isotropic,
                tile_shard_mesh=mesh if tile_parallel else None,
                # ladder and tile-sharding don't compose (the ladder permutes
                # tiles by count rank; the shards split by tile index) — the
                # tile-parallel step keeps plain windows
                tile_ladder=None if tile_parallel else tile_ladder,
            )
            per_frame = {
                "radii": out["radii"],
                "visible": out["visibility_filter"],
                "psnr": L.psnr(out["render"], frame.image),
                "chamfer": aux.get("chamfer", jnp.zeros(())),
                "overflow_tiles": out["overflow_tiles"],
                "tile_counts": out["tile_counts"],
            }
            return loss, per_frame

        # 2D parallelism: with tile_parallel each frame's blend is ALSO
        # shard_map'd over 'tile' (pixel axis) inside the data-sharded vmap —
        # spmd_axis_name ties the batch dim to the mesh 'data' axis so the
        # inner shard_map sees only its data-row's frames
        vm = jax.vmap(one, spmd_axis_name="data") if tile_parallel else jax.vmap(one)
        losses, pf = vm(frame_batch, uids, m2b, pre_dx, pre_dj, lam_to, lam_tf)
        return jnp.mean(losses), pf

    @partial(
        jax.jit,
        in_shardings=(
            repl, batch_sh, batch_sh, repl, repl, repl, batch_sh, batch_sh, batch_sh, batch_sh,
            repl,
        ),
        out_shardings=(repl, repl),
    )
    def step(
        state: Stage2State,
        frame_batch: Frame,
        uids: jax.Array,
        bg: jax.Array,
        lrs_gs: dict,
        lrs_skel,
        pre_d_xyz_b: jax.Array,
        pre_d_joints_b: jax.Array,
        lambda_to: jax.Array,  # (B,) per-frame (template-frame 1e3 boost)
        lambda_tf: jax.Array,  # (B,) per-frame (template frame only)
        flags: dict,
    ):
        B = uids.shape[0]
        params = {"gs": state.gs.params_dict(), "skel": state.skel.params_dict()}
        m2b = jnp.zeros((B,) + state.gs.xyz[:, :2].shape)
        (loss, pf), (gp, gm2b) = jax.value_and_grad(loss_fn, argnums=(0, 5), has_aux=True)(
            params, state, frame_batch, uids, bg, m2b, pre_d_xyz_b, pre_d_joints_b,
            lambda_to, lambda_tf, flags,
        )
        new_skel_p, opt_skel = O.adam_update(gp["skel"], state.opt_skel, params["skel"], lrs_skel)
        upd_gs_p, upd_opt_gs = O.adam_update(gp["gs"], state.opt_gs, params["gs"], lrs_gs)
        w = jnp.bool_(flags["warm"])
        new_gs_p = jax.tree.map(lambda a, b: jnp.where(w, a, b), params["gs"], upd_gs_p)
        opt_gs = jax.tree.map(lambda a, b: jnp.where(w, a, b), state.opt_gs, upd_opt_gs)
        # densification stats: accumulate every frame of the batch (B reference
        # iterations worth); d(mean)/dm2b[b] carries a 1/B factor — undo it
        stats = state.stats_gs
        for b in range(B):
            stats = G.add_densification_stats(
                stats,
                gm2b[b] * B,
                pf["radii"][b],
                pf["visible"][b],
                frame_batch.cam.width,
                frame_batch.cam.height,
            )
        proj_loss = state.proj_loss
        if use_chamfer:
            proj_loss = proj_loss.at[uids].set(pf["chamfer"])
        new_state = dataclasses.replace(
            state,
            gs=state.gs.replace_params(new_gs_p),
            skel=state.skel.replace_params(new_skel_p),
            opt_gs=opt_gs,
            opt_skel=opt_skel,
            stats_gs=stats,
            proj_loss=proj_loss,
            # one dp batch advances the schedule clock by B frames, matching
            # B sequential single-chip stage2_steps (it+1 each)
            it=state.it + B,
        )
        return new_state, {
            "loss": loss,
            "psnr": jnp.mean(pf["psnr"]),
            "overflow_tiles": jnp.sum(pf["overflow_tiles"]),
            "tile_counts": pf["tile_counts"],  # (B, T) — ladder-policy input
        }

    return step


def make_dp_stage1_step(
    mesh: Mesh,
    use_chamfer: bool = False,
    use_motion_loss: bool = False,
    use_flow_loss: bool = False,
    lambda_chamfer: float = 1e-3,
    lambda_dssim: float = 0.2,
    max_per_tile: int = 1024,
    isotropic: bool = False,
    tile_ladder: tuple | None = None,
):
    """Build a jitted frame-parallel stage-1 phase-B training step over
    ``mesh``.

    Carries the full ``train.stage1.stage1_frame_loss`` set (photometric +
    landmark-scheduled ARAP + motion-mask + 2D-skeleton chamfer — the
    train_gui.py:1025-1145 semantics), per-group LR dicts for the Gaussian
    and warp param groups, and densification-stat accumulation summed over
    the frame batch exactly as B sequential single-chip ``phase_b_step``
    iterations would (mean-gradient 1/B factor undone). Frames, ARAP keys
    and the per-frame lambdas shard over 'data'; state is replicated, so the
    mean over frames becomes a psum over ICI.

    With ``use_flow_loss`` the batch frames carry RAFT flow arrays (zeros
    when a frame drew no partner this step — structure is constant) and a
    per-frame (B,) ``lambda_flow`` weights each frame's flow term, so a
    batch can mix frames with and without real flow exactly like B
    sequential single-chip steps.
    """
    from riggs_tpu.train.stage1 import Stage1State, stage1_frame_loss

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))

    def loss_fn(params, state, frame_batch, bg, m2b, keys, lambda_arap, lambda_motion,
                lambda_flow_b, flags):
        def one(frame, m2b_f, key, lam_flow):
            loss, (out, aux) = stage1_frame_loss(
                params, state, frame, bg, m2b_f, key, lambda_arap, lambda_motion,
                lambda_flow=lam_flow,
                lambda_chamfer=lambda_chamfer,
                warm=flags["warm"],
                active_sh=flags["active_sh"],
                use_chamfer=use_chamfer,
                use_motion_loss=use_motion_loss,
                use_flow_loss=use_flow_loss,
                lambda_dssim=lambda_dssim,
                max_per_tile=max_per_tile,
                isotropic=isotropic,
                tile_ladder=tile_ladder,
            )
            per_frame = {
                "radii": out["radii"],
                "visible": out["visibility_filter"],
                "psnr": L.psnr(out["render"], frame.image),
                "overflow_tiles": out["overflow_tiles"],
                "tile_counts": out["tile_counts"],
            }
            return loss, per_frame

        losses, pf = jax.vmap(one)(frame_batch, m2b, keys, lambda_flow_b)
        return jnp.mean(losses), pf

    @partial(
        jax.jit,
        in_shardings=(repl, batch_sh, repl, repl, repl, batch_sh, repl, repl, batch_sh, repl),
        out_shardings=(repl, repl),
    )
    def step(
        state: Stage1State,
        frame_batch: Frame,
        bg: jax.Array,
        lrs_gs: dict,
        lrs_warp: dict,
        keys: jax.Array,  # (B, 2) ARAP subsampling keys
        lambda_arap: jax.Array,
        lambda_motion: jax.Array,
        lambda_flow_b: jax.Array,  # (B,) per-frame flow weight (0 = no flow drawn)
        flags: dict,
    ):
        B = keys.shape[0]
        params = {"gs": state.gs.params_dict(), "warp": state.warp.params_dict()}
        m2b = jnp.zeros((B,) + state.gs.xyz[:, :2].shape)
        (loss, pf), (gp, gm2b) = jax.value_and_grad(loss_fn, argnums=(0, 4), has_aux=True)(
            params, state, frame_batch, bg, m2b, keys, lambda_arap, lambda_motion,
            lambda_flow_b, flags
        )
        new_gs_p, opt_gs = O.adam_update(gp["gs"], state.opt_gs, params["gs"], lrs_gs)
        new_warp_p, opt_warp = O.adam_update(gp["warp"], state.opt_warp, params["warp"], lrs_warp)
        stats = state.stats_gs
        for b in range(B):
            stats = G.add_densification_stats(
                stats,
                gm2b[b] * B,
                pf["radii"][b],
                pf["visible"][b],
                frame_batch.cam.width,
                frame_batch.cam.height,
            )
        new_state = dataclasses.replace(
            state,
            gs=state.gs.replace_params(new_gs_p),
            warp=state.warp.replace_params(new_warp_p),
            opt_gs=opt_gs,
            opt_warp=opt_warp,
            stats_gs=stats,
        )
        return new_state, {
            "loss": loss,
            "psnr": jnp.mean(pf["psnr"]),
            "overflow_tiles": jnp.sum(pf["overflow_tiles"]),
            "tile_counts": pf["tile_counts"],  # (B, T) — ladder-policy input
        }

    return step


def make_dp_static_step(
    mesh: Mesh,
    active_sh: int = 0,
    lambda_dssim: float = 0.2,
    max_per_tile: int = 256,
):
    """Frame-parallel static-3DGS step (the minimum multi-chip slice)."""
    from riggs_tpu.train.static import TrainState

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))

    def loss_fn(params, state, frame_batch: Frame, bg):
        def one(frame):
            gs = state.gs.replace_params(params)
            out = render(
                frame.cam, gs, bg, active_sh_degree=active_sh, max_per_tile=max_per_tile
            )
            return L.photometric_loss(out["render"], frame.image, lambda_dssim)

        return jnp.mean(jax.vmap(one)(frame_batch))

    @partial(jax.jit, in_shardings=(repl, batch_sh, repl, repl), out_shardings=(repl, repl))
    def step(state: TrainState, frame_batch: Frame, bg, lr):
        params = state.gs.params_dict()
        loss, grads = jax.value_and_grad(loss_fn)(params, state, frame_batch, bg)
        new_p, opt = O.adam_update(grads, state.opt, params, lr)
        return TrainState(gs=state.gs.replace_params(new_p), opt=opt, stats=state.stats), loss

    return step
