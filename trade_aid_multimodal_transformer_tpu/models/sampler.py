"""Fast autoregressive sampling: the whole token loop as one device program.

The reference's ``generate`` (reference: model.py:404-446) — and the faithful
port in ``models/transformer.py`` — runs one Python-level forward per new
token: every step pays a host→device dispatch and a device→host sync. On TPU
the idiomatic form keeps the rolling context window device-resident and runs
the token loop as a single ``lax.scan`` program: zero host round-trips, static
shapes, and the window update is an in-register roll.

Semantics are EXACTLY the reference's generate (pinned by
tests/test_model.py::TestFastGenerate equivalence against the step-by-step
port): crop to the last ``block_size`` tokens, sample the target modality
from the softmax of the last position (``jax.random.categorical`` ==
multinomial-over-softmax), and keep the other modalities length-consistent by
repeating their own last token (reference: model.py:434-444). The PRNG key
schedule (split per step, sample with the subkey) matches ``generate`` so the
two paths produce identical token sequences for identical inputs.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .config import ModelConfig
from .transformer import forward


@functools.partial(jax.jit, static_argnames=("cfg", "modality_to_generate"))
def _single_step(
    params: Dict[str, Any],
    cfg: ModelConfig,
    window: jax.Array,
    key: jax.Array,
    modality_to_generate: int,
) -> Tuple[jax.Array, jax.Array]:
    """One sampling step on a (M, B, t) window; returns (key', new column).

    The new column carries the sampled token for the target modality and each
    other modality's repeated last token (reference: model.py:425-444).
    """
    key, sub = jax.random.split(key)
    logits_list, _ = forward(params, cfg, window, train=False)
    logits = logits_list[modality_to_generate][:, -1, :]
    nxt = jax.random.categorical(sub, logits, axis=-1).astype(window.dtype)
    col = window[:, :, -1].at[modality_to_generate].set(nxt)  # (M, B)
    return key, col


@functools.partial(
    jax.jit, static_argnames=("cfg", "modality_to_generate", "n_steps")
)
def _scan_steps(
    params: Dict[str, Any],
    cfg: ModelConfig,
    window: jax.Array,
    key: jax.Array,
    modality_to_generate: int,
    n_steps: int,
) -> Tuple[jax.Array, jax.Array]:
    """n_steps sampling steps fused into one scan over a full-size window.

    window: (M, B, block_size). Returns (final window, (n_steps, M, B) cols).
    """

    def body(carry, _):
        window, key = carry
        key, col = _single_step(params, cfg, window, key, modality_to_generate)
        window = jnp.concatenate([window[:, :, 1:], col[:, :, None]], axis=-1)
        return (window, key), col

    (window, _), cols = jax.lax.scan(body, (window, key), None, length=n_steps)
    return window, cols


def generate_fast(
    params: Dict[str, Any],
    cfg: ModelConfig,
    idx: jax.Array,
    key: jax.Array,
    max_new_tokens: int = 1,
    modality_to_generate: int = 0,
) -> jax.Array:
    """Generate ``max_new_tokens`` tokens for one modality, device-side.

    idx: (M, B, T0) stacked equal-length token ids (the reference keeps
    modality lengths equal by construction; main.py:260-269 enforces it).
    Returns (M, B, T0 + max_new_tokens).

    While the context is shorter than ``block_size`` the loop steps one token
    at a time at the true (growing) length — numerically identical to the
    reference, at most ``block_size`` distinct compilations, all cached. Once
    the window is full, all remaining tokens come from ONE fused scan program.
    """
    seq = jnp.asarray(idx)
    if seq.ndim != 3:
        raise ValueError("idx must be (num_modalities, B, T) stacked ids")
    produced = 0

    # Warmup: context still growing toward block_size.
    while seq.shape[-1] < cfg.block_size and produced < max_new_tokens:
        key, col = _single_step(params, cfg, seq, key, modality_to_generate)
        seq = jnp.concatenate([seq, col[:, :, None]], axis=-1)
        produced += 1

    remaining = max_new_tokens - produced
    if remaining > 0:
        window = seq[:, :, -cfg.block_size :]
        _, cols = _scan_steps(
            params, cfg, window, key, modality_to_generate, remaining
        )
        seq = jnp.concatenate([seq, jnp.moveaxis(cols, 0, -1)], axis=-1)
    return seq
