"""Functional MLP primitives: positional embedding + init/apply pairs.

Matches the reference building blocks (/root/reference/utils/time_utils.py:
208-256 Embedder/get_embedder, 259-287 ProgressiveBandFrequency) with torch
initializer parity (kaiming-uniform fan-in hidden layers, tiny-std normal
output heads) so trained behavior is comparable. Params are plain dicts of
arrays — pure pytrees, shardable, no module framework.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def embed_dim(input_dim: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dim * (2 * num_freqs + (1 if include_input else 0))


def positional_embed(x: jax.Array, num_freqs: int, include_input: bool = True) -> jax.Array:
    """NeRF positional encoding: [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{m-1} x), cos(...)].

    Ordering matches the torch Embedder (per-frequency sin-then-cos blocks).
    """
    if num_freqs <= 0:
        return x
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    xf = x[..., None, :] * freqs[:, None]  # (..., F, D)
    enc = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1)  # (..., F, 2D)
    enc = enc.reshape(x.shape[:-1] + (-1,))
    return jnp.concatenate([x, enc], axis=-1) if include_input else enc


def progressive_band_mask(num_freqs: int, step: int, n_masking_step: int) -> np.ndarray:
    """Coarse-to-fine frequency mask (ProgressiveBandFrequency.update_step)."""
    if n_masking_step <= 0:
        return np.ones(num_freqs, np.float32)
    x = np.clip(step / n_masking_step * num_freqs - np.arange(num_freqs), 0, 1)
    return ((1.0 - np.cos(np.pi * x)) / 2.0).astype(np.float32)


def positional_embed_masked(x: jax.Array, num_freqs: int, mask: jax.Array) -> jax.Array:
    """Progressive-band encoding: per-frequency mask, NO raw input channel
    (matches ProgressiveBandFrequency.forward)."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    xf = x[..., None, :] * freqs[:, None]
    enc = jnp.concatenate([jnp.sin(xf), jnp.cos(xf)], axis=-1) * mask[:, None]
    return enc.reshape(x.shape[:-1] + (-1,))


def linear_init(key: jax.Array, d_in: int, d_out: int, kind: str = "kaiming", std: float = 1e-5):
    """One linear layer {w (d_in, d_out), b (d_out,)}.

    kind='kaiming': torch kaiming_uniform fan-in relu (bound sqrt(6/fan_in));
    kind='normal': N(0, std) head init; kind='torch_default': torch's default
    Linear init (uniform +-1/sqrt(fan_in)) for weights AND bias.
    """
    wkey, bkey = jax.random.split(key)
    if kind == "kaiming":
        bound = math.sqrt(6.0 / d_in)
        w = jax.random.uniform(wkey, (d_in, d_out), minval=-bound, maxval=bound)
        b = jnp.zeros(d_out)
    elif kind == "normal":
        w = std * jax.random.normal(wkey, (d_in, d_out))
        b = jnp.zeros(d_out)
    elif kind == "torch_default":
        bound = 1.0 / math.sqrt(d_in)
        w = jax.random.uniform(wkey, (d_in, d_out), minval=-bound, maxval=bound)
        b = jax.random.uniform(bkey, (d_out,), minval=-bound, maxval=bound)
    else:
        raise ValueError(kind)
    return {"w": w, "b": b}


def linear_apply(p: dict, x: jax.Array) -> jax.Array:
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32) + p["b"]


def mlp_init(
    key: jax.Array,
    d_in: int,
    d_hidden: int,
    d_out: int,
    depth: int,
    skips: Sequence[int] = (),
    out_kind: str = "normal",
    out_std: float = 1e-5,
    hidden_kind: str = "kaiming",
) -> dict:
    """Plain relu MLP with skip-concat layers (NeRF style).

    Layer i>0 takes d_hidden (+ d_in if (i-1) in skips — i.e. the skip concat
    happens AFTER relu of layer i-1, matching the torch loop).
    """
    keys = jax.random.split(key, depth + 1)
    layers = []
    for i in range(depth):
        di = d_in if i == 0 else (d_hidden + d_in if (i - 1) in skips else d_hidden)
        layers.append(linear_init(keys[i], di, d_hidden, kind=hidden_kind))
    head = linear_init(keys[-1], d_hidden, d_out, kind=out_kind, std=out_std)
    return {"layers": layers, "head": head}


def mlp_hidden(p: dict, x: jax.Array, skips: Sequence[int] = ()) -> jax.Array:
    """Run the trunk, returning the final hidden features. ``skips`` is static
    (kept out of the param pytree so tree_map sees only arrays)."""
    h = x
    for i, layer in enumerate(p["layers"]):
        h = jax.nn.relu(linear_apply(layer, h))
        if i in skips:
            h = jnp.concatenate([x, h], axis=-1)
    return h


def mlp_apply(p: dict, x: jax.Array, skips: Sequence[int] = ()) -> jax.Array:
    return linear_apply(p["head"], mlp_hidden(p, x, skips))
