"""Per-Gaussian MLP deformation ('mlp') and static ('static') deform types.

The reference's DeformModel dispatches over {'mlp': DeformNetwork, 'node':
ControlNodeWarp, 'static': StaticNetwork} (/root/reference/scene/
deform_model.py:9). The node type lives in models/node_warp.py; this module
provides the other two: 'mlp' queries the DeformNetwork directly at every
Gaussian position (the D-3DGS/SC-GS baseline), 'static' returns zeros.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from riggs_tpu.models.deform_mlp import (
    DeformNetworkDef,
    apply_deform_network,
    init_deform_network,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MlpDeform:
    mlp: Any
    net: DeformNetworkDef = dataclasses.field(metadata=dict(static=True))

    def params_dict(self) -> dict:
        return {"mlp": self.mlp}

    def replace_params(self, p: dict) -> "MlpDeform":
        return dataclasses.replace(self, mlp=p["mlp"])


def init_mlp_deform(key: jax.Array, net: DeformNetworkDef | None = None) -> MlpDeform:
    net = net or DeformNetworkDef()
    return MlpDeform(mlp=init_deform_network(key, net), net=net)


def mlp_deform_forward(deform: MlpDeform, x: jax.Array, t: jax.Array, motion_mask=None, band_mask=None) -> dict:
    """Query the deformation at each Gaussian. x: (N, 3); t scalar or (N, 1)."""
    t = jnp.asarray(t)
    if t.ndim == 0:
        t = jnp.broadcast_to(t, (x.shape[0], 1))
    out = apply_deform_network(deform.mlp, deform.net, jax.lax.stop_gradient(x), t, band_mask=band_mask)
    if motion_mask is not None:
        for k in ("d_xyz", "d_rotation", "d_scaling"):
            out[k] = out[k] * motion_mask
    return out


def static_forward(x: jax.Array) -> dict:
    """StaticNetwork equivalent (utils/time_utils.py:288-307)."""
    return {
        "d_xyz": jnp.zeros_like(x),
        "d_rotation": jnp.zeros(x.shape[:-1] + (4,)),
        "d_scaling": jnp.zeros_like(x),
        "d_opacity": None,
        "d_color": None,
    }
