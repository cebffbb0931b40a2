"""Elementwise / normalization primitives shared by the model.

Numerics match the reference's torch modules: LayerNorm uses eps=1e-5 with
biased variance (torch default, reference model.py:189-190), dropout is
inverted dropout with 1/(1-p) scaling (torch nn.Dropout semantics).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

LN_EPS = 1e-5


def layernorm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    """LayerNorm over the trailing feature axis; scale/bias broadcast from the
    left (supports per-modality stacked (M, C) params against (M, B, T, C)).

    Statistics always compute in f32 (mixed-precision stability); the result
    returns in the activation dtype."""
    dt = x.dtype
    acc = jnp.float64 if dt == jnp.float64 else jnp.float32
    xf = x.astype(acc)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    normed = (xf - mean) * inv
    scale = scale.astype(acc)
    bias = bias.astype(acc)
    if scale.ndim < x.ndim and scale.ndim > 1:
        # (M, C) -> (M, 1, 1, C) style broadcast
        expand = (slice(None),) + (None,) * (x.ndim - scale.ndim) + (slice(None),)
        scale = scale[expand]
        bias = bias[expand]
    return (normed * scale + bias).astype(dt)


def dropout(
    x: jax.Array, rate: float, key: Optional[jax.Array], train: bool
) -> jax.Array:
    """Inverted dropout. Identity when not training or rate == 0."""
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


class KeyGen:
    """Deterministic per-site key splitter threaded through the forward pass.

    Trace-time Python state: each call splits off a fresh subkey, so the same
    master key always yields the same per-site keys.
    """

    __slots__ = ("key",)

    def __init__(self, key: Optional[jax.Array]):
        self.key = key

    def __call__(self) -> Optional[jax.Array]:
        if self.key is None:
            return None
        self.key, sub = jax.random.split(self.key)
        return sub
