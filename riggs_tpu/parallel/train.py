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


def make_dp_stage2_step(
    mesh: Mesh,
    active_sh: int = 0,
    lambda_dssim: float = 0.2,
    max_per_tile: int = 256,
    enable_to: bool = True,
    enable_sm: bool = True,
):
    """Build a jitted frame-parallel stage-2 training step over ``mesh``.

    The returned step(state, frame_batch, bg, lr) shards frame_batch over
    'data', keeps state replicated, and all-reduces gradients implicitly.
    """
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))

    def per_frame_loss(params, state, frame: Frame, bg):
        gs = state.gs.replace_params(params["gs"])
        skel = state.skel.replace_params(params["skel"])
        d = SW.skeleton_forward(
            skel,
            jax.lax.stop_gradient(gs.xyz),
            frame.fid,
            gs.motion_mask,
            enable_template_offsets=enable_to,
            enable_skinning_mlp=enable_sm,
        )
        out = render(
            frame.cam,
            gs,
            bg,
            d_xyz=d["d_xyz"],
            d_rotation=d["d_rotation"],
            d_scaling=jnp.zeros_like(d["d_scaling"]),
            active_sh_degree=active_sh,
            max_per_tile=max_per_tile,
        )
        return L.photometric_loss(out["render"], frame.image, lambda_dssim)

    def loss_fn(params, state, frame_batch: Frame, bg):
        losses = jax.vmap(lambda f: per_frame_loss(params, state, f, bg))(frame_batch)
        return jnp.mean(losses)

    @partial(
        jax.jit,
        in_shardings=(repl, batch_sh, repl, repl),
        out_shardings=(repl, repl),
    )
    def step(state: Stage2State, frame_batch: Frame, bg, lr):
        params = {"gs": state.gs.params_dict(), "skel": state.skel.params_dict()}
        loss, grads = jax.value_and_grad(loss_fn)(params, state, frame_batch, bg)
        new_gs_p, opt_gs = O.adam_update(grads["gs"], state.opt_gs, params["gs"], lr)
        new_skel_p, opt_skel = O.adam_update(grads["skel"], state.opt_skel, params["skel"], lr)
        new_state = dataclasses.replace(
            state,
            gs=state.gs.replace_params(new_gs_p),
            skel=state.skel.replace_params(new_skel_p),
            opt_gs=opt_gs,
            opt_skel=opt_skel,
        )
        return new_state, loss

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
