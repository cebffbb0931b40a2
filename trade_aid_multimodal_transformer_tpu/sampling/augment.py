"""Device-side token augmentation (randomness injection).

Reference semantics: data_utils.py:293-358 (add_rand_to_data_points) — each
token id v with ``rand_size < v < vocab_size - rand_size`` is shifted by a
uniform draw from {0, ±1, …, ±rand_size}; ids near the vocabulary edges are
left untouched. A uniform integer draw over [-k, k] is the same distribution
as the reference's ``random.choice([0, 1, -1, …, k, -k])``.

Applied to gathered (batch, block+1) windows on device instead of the full
train list on host (fixing the reference's O(dataset)-per-step cost, Quirk
Q2) — per-token the distribution is identical.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp


def augment_tokens(
    key: jax.Array, tokens: jax.Array, rand_size: int, vocab_size: int
) -> jax.Array:
    """Shift guarded tokens by uniform ±rand_size (jit-safe, any shape)."""
    k = int(rand_size)
    shifts = jax.random.randint(key, tokens.shape, -k, k + 1, dtype=tokens.dtype)
    guard = (tokens > k) & (tokens < vocab_size - k)
    return tokens + shifts * guard


def augment_windows(
    key: jax.Array,
    windows: jax.Array,
    rand_sizes: Sequence[Optional[int]],
    vocab_sizes: Sequence[int],
) -> jax.Array:
    """Per-modality augmentation over stacked (M, B, T+1) windows.

    Modalities with rand_size None pass through unchanged. The per-modality
    structure is static, so the loop unrolls at trace time.
    """
    out: List[jax.Array] = []
    keys = jax.random.split(key, windows.shape[0])
    for m in range(windows.shape[0]):
        if rand_sizes[m] is None:
            out.append(windows[m])
        else:
            out.append(
                augment_tokens(keys[m], windows[m], rand_sizes[m], vocab_sizes[m])
            )
    return jnp.stack(out)
