"""DeformNetwork: the time-conditioned deformation field MLP.

Architecture parity with /root/reference/utils/time_utils.py:310-458:
  * positional enc: x 10 freqs; t 6 freqs (blender) else 10;
  * blender path runs the t embedding through a 2-layer "timenet" -> 30 dims;
  * trunk D=8, W=256, skip-concat after layer D/2;
  * heads d_xyz / d_scaling / d_rotation (+optional d_opacity, d_color,
    local_rotation) with tiny-std init so deformation starts near zero;
  * optional tanh clamp of d_scaling to log(max_d_scale);
  * optional progressive-band time encoding (coarse-to-fine mask by step).

Functional: params is a dict pytree; apply is shape-polymorphic over leading
batch dims and jit/vmap/shard-friendly.
"""
from __future__ import annotations

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
    positional_embed_masked,
    progressive_band_mask,
)


import dataclasses


@dataclasses.dataclass(frozen=True)
class DeformNetworkDef:
    """Static architecture description (hashable; passed through jit statically)."""

    is_blender: bool = True
    depth: int = 8
    width: int = 256
    multires_x: int = 10
    local_frame: bool = False
    pred_opacity: bool = False
    pred_color: bool = False
    progressive_band_time: bool = False
    max_d_scale: float = -1.0

    @property
    def t_multires(self) -> int:
        return 6 if self.is_blender else 10

    @property
    def skips(self) -> tuple:
        return (self.depth // 2,)

    @property
    def x_dim(self) -> int:
        return embed_dim(3, self.multires_x)

    @property
    def t_dim(self) -> int:
        # masked (progressive-band) encoding has no raw channel
        return 2 * self.t_multires if self.progressive_band_time else embed_dim(1, self.t_multires)

    @property
    def time_out(self) -> int:
        return 30 if self.is_blender else self.t_dim


def init_deform_network(key: jax.Array, net: DeformNetworkDef) -> dict:
    keys = jax.random.split(key, 8)
    d_in = net.x_dim + net.time_out
    params: dict[str, Any] = {
        "trunk": mlp_init(
            keys[0], d_in, net.width, 0, net.depth, skips=net.skips, out_kind="normal"
        ),
        "warp": linear_init(keys[1], net.width, 3, kind="normal", std=1e-5),
        "scaling": linear_init(keys[2], net.width, 3, kind="normal", std=1e-8),
        "rotation": linear_init(keys[3], net.width, 4, kind="normal", std=1e-5),
    }
    params["trunk"].pop("head")  # heads are separate; trunk is hidden-only
    if net.is_blender:
        params["timenet"] = [
            linear_init(keys[4], net.t_dim, 256, kind="torch_default"),
            linear_init(keys[5], 256, net.time_out, kind="torch_default"),
        ]
    if net.local_frame:
        params["local_rotation"] = linear_init(keys[6], net.width, 4, kind="normal", std=1e-4)
    if net.pred_opacity:
        params["opacity"] = linear_init(keys[7], net.width, 1, kind="normal", std=1e-5)
    if net.pred_color:
        params["color"] = linear_init(jax.random.fold_in(key, 99), net.width, 3, kind="normal", std=1e-5)
    return params


def apply_deform_network(
    params: dict,
    net: DeformNetworkDef,
    x: jax.Array,
    t: jax.Array,
    band_mask: jax.Array | None = None,
) -> dict[str, jax.Array | None]:
    """x: (..., 3), t: (..., 1) -> dict of deformation residuals."""
    if net.progressive_band_time:
        mask = band_mask if band_mask is not None else jnp.ones(net.t_multires)
        t_emb = positional_embed_masked(t, net.t_multires, mask)
    else:
        t_emb = positional_embed(t, net.t_multires)
    if net.is_blender:
        h = jax.nn.relu(linear_apply(params["timenet"][0], t_emb))
        t_emb = linear_apply(params["timenet"][1], h)
    x_emb = positional_embed(x, net.multires_x)
    inp = jnp.concatenate([x_emb, t_emb], axis=-1)
    h = mlp_hidden(params["trunk"], inp, skips=net.skips)

    d_scaling = linear_apply(params["scaling"], h)
    if net.max_d_scale > 0:
        d_scaling = jnp.tanh(d_scaling) * np.log(net.max_d_scale)
    out: dict[str, Any] = {
        "d_xyz": linear_apply(params["warp"], h),
        "d_rotation": linear_apply(params["rotation"], h),
        "d_scaling": d_scaling,
        "hidden": h,
        "d_opacity": linear_apply(params["opacity"], h) if net.pred_opacity else None,
        "d_color": linear_apply(params["color"], h) if net.pred_color else None,
    }
    if net.local_frame:
        out["local_rotation"] = linear_apply(params["local_rotation"], h)
    return out
