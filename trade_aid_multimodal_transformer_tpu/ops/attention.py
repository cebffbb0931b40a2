"""Causal attention cores.

The model's attention internals are NOT standard GPT attention: Q/K/V come
from small tanh MLPs and the output projection is a tanh MLP
(reference: model.py:30-159, SURVEY Quirk Q6) — those projections live in
models/transformer.py where XLA fuses them into the surrounding matmuls.
This module owns the score/softmax/weighted-sum core:

    aff = q @ k^T * head_size**-0.5 ; causal mask ; softmax ;
    dropout(aff) ; aff @ v                     (reference: model.py:60-73)

Two interchangeable implementations:
- ``jnp``: dense reference implementation (used for training with attention
  dropout, and as the numerical oracle in kernel equivalence tests)
- ``pallas``: blockwise flash-attention TPU kernel (ops/pallas_attention.py)
  that never materializes the (T, T) affinity matrix in HBM.

Dispatch: ``impl='auto'`` picks the Pallas kernel on TPU when shapes are
kernel-eligible, else jnp.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .layers import dropout as _dropout


def causal_attention_jnp(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    """Dense causal attention over trailing (T, head_size) axes.

    Leading axes broadcast (q may have fewer leading dims than k/v — used by
    cross-attention where one query stream attends to J stacked KV streams).
    """
    t_q = q.shape[-2]
    t_k = k.shape[-2]
    dt = q.dtype
    if dt == jnp.bfloat16:
        try:
            on_cpu = jax.default_backend() == "cpu"
        except Exception:  # pragma: no cover
            on_cpu = True
        if on_cpu:
            # CPU XLA lacks BF16 x BF16 = F32 dots; compute in f32 there.
            out = causal_attention_jnp(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), dropout_rate, dropout_key, train,
            )
            return out.astype(dt)
    acc = jnp.float64 if dt == jnp.float64 else jnp.float32
    scale = k.shape[-1] ** -0.5
    # scores accumulate and softmax in >=f32 (mixed-precision stability)
    aff = jnp.matmul(
        q, jnp.swapaxes(k, -1, -2), preferred_element_type=acc
    ) * scale
    mask = jnp.tril(jnp.ones((t_q, t_k), dtype=bool))
    aff = jnp.where(mask, aff, -jnp.inf)
    aff = jax.nn.softmax(aff.astype(acc), axis=-1)
    aff = _dropout(aff, dropout_rate, dropout_key, train)
    out = jnp.matmul(aff.astype(dt), v, preferred_element_type=acc)
    return out.astype(dt)


def causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    train: bool = False,
    impl: str = "auto",
) -> jax.Array:
    """Causal attention with implementation dispatch."""
    if impl == "jnp":
        return causal_attention_jnp(q, k, v, dropout_rate, dropout_key, train)
    if impl in ("auto", "pallas"):
        from .pallas_attention import flash_attention_eligible, flash_causal_attention

        if flash_attention_eligible(q, k, v) and (impl == "pallas" or _on_tpu()):
            use_dropout = train and dropout_rate > 0.0
            return flash_causal_attention(
                q, k, v,
                dropout_rate=dropout_rate if use_dropout else 0.0,
                dropout_key=dropout_key if use_dropout else None,
            )
        return causal_attention_jnp(q, k, v, dropout_rate, dropout_key, train)
    raise ValueError(f"Unknown attention impl: {impl}")


def cross_causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    train: bool = False,
    impl: str = "auto",
) -> jax.Array:
    """Causal attention of one query stream against J KV streams, SUMMED
    over streams (the model's cross-attention core; reference: model.py:158).

    q: (..., T, hs); k, v: (J, ..., T, hs). On TPU with kernel-eligible
    shapes and no attention dropout this fuses the per-stream attention and
    the stream sum into one Pallas kernel (ops/pallas_attention.py); else it
    broadcasts q against the streams in the dense core and sums.
    """
    if impl in ("auto", "pallas"):
        from .pallas_attention import flash_cross_attention, flash_cross_eligible

        if flash_cross_eligible(q, k, v) and (impl == "pallas" or _on_tpu()):
            use_dropout = train and dropout_rate > 0.0
            return flash_cross_attention(
                q, k, v,
                dropout_rate=dropout_rate if use_dropout else 0.0,
                dropout_key=dropout_key if use_dropout else None,
            )
    out = causal_attention_jnp(q[None], k, v, dropout_rate, dropout_key, train)
    return out.sum(axis=0)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
