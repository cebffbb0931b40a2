"""Experimental/research components kept for API parity.

The reference ships two experimental pieces that its active model does not
use (reference: model.py:247-282): a fixed (non-learnable) embedding whose
entries are drawn from a small set of configured values (fed by the
``fixed_values`` system-config field), and a ``long_tanh`` activation.
They are preserved here so research code written against the reference has
equivalents.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_fixed_embedding_table(
    key: jax.Array, vocab_size: int, embed_size: int, fixed_values: Sequence[float]
) -> jax.Array:
    """Non-learnable embedding table with entries sampled uniformly from
    ``fixed_values`` (reference: model.py:256-268). Treat the result as a
    constant (do not include it in the trained parameter pytree)."""
    vals = jnp.asarray(list(fixed_values), dtype=jnp.float32)
    idx = jax.random.randint(key, (vocab_size, embed_size), 0, vals.shape[0])
    return vals[idx]


def fixed_embedding_lookup(table: jax.Array, tokens: jax.Array) -> jax.Array:
    """(B, T) int tokens -> (B, T, embed_size) fixed embeddings
    (reference: model.py:270-277)."""
    return table[tokens]


def long_tanh(x: jax.Array) -> jax.Array:
    """tanh then truncation to integers in {-1, 0, 1}
    (reference: model.py:280-282). int64 when x64 is enabled, else int32 —
    the values fit either way."""
    dtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
    return jnp.tanh(x).astype(dtype)
