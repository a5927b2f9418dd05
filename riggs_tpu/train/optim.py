"""Adam with per-leaf learning rates and capacity-row surgery.

The reference keeps one torch.optim.Adam with named param groups whose ``lr``
fields are mutated every step (/root/reference/train_gui.py:1198-1207,
/root/reference/scene/deform_model.py:27-38) and whose moment tensors are
sliced/concatenated during densification (/root/reference/scene/
gaussian_model.py:356-416). Here the optimizer is a pure pytree:

  * per-leaf LRs are passed as a pytree of scalars at each update (computed
    host-side from schedules — dynamic inputs, so no re-jit per step);
  * densification surgery is ``zero_rows``: moments of re-allocated capacity
    slots are zeroed in place, equivalent to "fresh Adam state for new
    points".
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdamState:
    mu: Any
    nu: Any
    count: jax.Array


def adam_init(params: Any) -> AdamState:
    z = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=z, nu=jax.tree.map(jnp.zeros_like, params), count=jnp.zeros((), jnp.int32))


def adam_update(
    grads: Any,
    state: AdamState,
    params: Any,
    lrs: Any,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    update_mask: Any = None,
) -> tuple[Any, AdamState]:
    """One Adam step. ``lrs`` is a pytree of scalars matching params (or a
    scalar). ``update_mask``: optional pytree of per-leaf bool scalars; a
    False freezes that leaf entirely (params AND moments), the staged-unlock
    equivalent of the reference's enabling/disabling of param groups."""
    count = state.count + 1
    c1 = 1.0 - b1**count.astype(jnp.float32)
    c2 = 1.0 - b2**count.astype(jnp.float32)

    def leaf(g, mu, nu, p, lr, m):
        new_mu = b1 * mu + (1 - b1) * g
        new_nu = b2 * nu + (1 - b2) * g * g
        step = lr * (new_mu / c1) / (jnp.sqrt(new_nu / c2) + eps)
        if m is not None:
            keep = jnp.asarray(m)
            new_mu = jnp.where(keep, new_mu, mu)
            new_nu = jnp.where(keep, new_nu, nu)
            step = jnp.where(keep, step, 0.0)
        return p - step, new_mu, new_nu

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_mu = treedef.flatten_up_to(state.mu)
    flat_nu = treedef.flatten_up_to(state.nu)
    flat_lr = _flatten_prefix(lrs, params, treedef)
    flat_m = _flatten_prefix(update_mask, params, treedef)
    out = [leaf(g, mu, nu, p, lr, m) for g, mu, nu, p, lr, m in zip(flat_g, flat_mu, flat_nu, flat_p, flat_lr, flat_m)]
    new_p = treedef.unflatten([o[0] for o in out])
    new_mu = treedef.unflatten([o[1] for o in out])
    new_nu = treedef.unflatten([o[2] for o in out])
    return new_p, AdamState(mu=new_mu, nu=new_nu, count=count)


def _flatten_prefix(prefix: Any, params: Any, treedef) -> list:
    """Flatten ``prefix`` (a tree-prefix of params — e.g. one scalar lr per
    param *group* whose leaf may cover a whole parameter subtree) into one
    value per params leaf."""
    if prefix is None or not isinstance(prefix, (dict, list, tuple)):
        return [prefix] * treedef.num_leaves
    pref_leaves, pref_def = jax.tree.flatten(prefix)
    out = []
    for leaf_val, subtree in zip(pref_leaves, pref_def.flatten_up_to(params)):
        out.extend([leaf_val] * len(jax.tree.leaves(subtree)))
    return out


def zero_rows(state: AdamState, dest: jax.Array) -> AdamState:
    """Zero the Adam moments of capacity rows ``dest`` (out-of-range indices
    are dropped) — fresh state for newly allocated Gaussians."""

    def z(a):
        if a.ndim == 0:
            return a
        return a.at[dest].set(0.0, mode="drop")

    return AdamState(mu=jax.tree.map(z, state.mu), nu=jax.tree.map(z, state.nu), count=state.count)
