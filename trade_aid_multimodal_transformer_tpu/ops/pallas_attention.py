"""Blockwise (flash) causal attention Pallas TPU kernel.

Placeholder gate for the initial end-to-end slice: eligibility returns False
until the kernel lands, so ``impl='auto'`` routes to the jnp core. The real
kernel is implemented in the kernels milestone (see ops/attention.py for the
dispatch contract).
"""

from __future__ import annotations

import jax


def flash_attention_eligible(q: jax.Array, k: jax.Array, v: jax.Array) -> bool:
    return False


def flash_causal_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    raise NotImplementedError("Pallas flash attention kernel lands in the kernels milestone")
