"""Compute ops: attention cores (jnp + Pallas TPU kernels) and primitives."""

from .attention import causal_attention, causal_attention_jnp
from .layers import KeyGen, dropout, layernorm

__all__ = [
    "causal_attention",
    "causal_attention_jnp",
    "KeyGen",
    "dropout",
    "layernorm",
]
