"""Ring (context-parallel) causal attention over a mesh axis.

The reference is single-device with block_size 4-64 (reference:
config.yaml:99, config_manager.py:131), so sequence parallelism is beyond
capability parity — this is the forward-looking long-context component
(SURVEY §5.7): shard the SEQUENCE axis across devices and attend with a
ring of KV exchanges, so no device ever holds the full (T, T) problem or
even the full sequence.

Layout: inside ``shard_map`` over axis ``axis_name`` (size P), each device
holds the contiguous sequence chunk [rank·c, (rank+1)·c) of q, k, v
(c = T/P). Causality means device r only needs KV chunks from ranks ≤ r:

  step 0: attend to the local chunk (triangular mask);
  step s>0: receive the KV chunk of rank (r−s) mod P via ``ppermute``
    (a neighbor exchange that rides ICI), attend with a FULL mask if the
    source rank < r, and skip (zero-contribution) if it wrapped to a rank
    > r — the online-softmax running (m, l, acc) state merges each
    contribution exactly, in any arrival order.

The per-chunk core is the same dense math as ops.causal_attention_jnp
(f32 accumulation, exact softmax); equivalence with single-device attention
is pinned by tests/test_ring_attention.py on an 8-device CPU mesh.

The hot per-chunk score/weighted-sum math can later drop into the Pallas
flash kernel (ops/pallas_attention.py is already blockwise); the ring
structure here is kernel-agnostic.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

_NEG_INF = float("-inf")


def _chunk_attention_stats(q, k, v, mask):
    """Unnormalized attention of q against one KV chunk.

    q: (..., cq, hs); k, v: (..., ck, hs); mask: (cq, ck) bool (True = may
    attend). Returns (m, l, acc): rowwise max of masked scores, sum of
    exp(s - m), and exp(s - m) @ v — the online-softmax partial state.
    """
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum(
        "...qh,...kh->...qk", q, k, preferred_element_type=jnp.float32
    ) * scale
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    # fully-masked rows have m = -inf; exp(-inf - -inf) would be NaN
    m_safe = jnp.maximum(m, -1e30)
    p = jnp.exp(s - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "...qk,...kh->...qh", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return m_safe, l, acc


def _merge(state, other):
    """Merge two online-softmax partial states exactly."""
    m1, l1, a1 = state
    m2, l2, a2 = other
    m = jnp.maximum(m1, m2)
    c1 = jnp.exp(m1 - m)
    c2 = jnp.exp(m2 - m)
    return m, l1 * c1 + l2 * c2, a1 * c1 + a2 * c2


def ring_causal_attention_local(
    q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str
) -> jax.Array:
    """Per-device body: causal attention with ring KV exchange.

    Call inside shard_map/pmap over ``axis_name``; q, k, v are the LOCAL
    sequence chunks (..., c, hs) and the result is the local output chunk.
    """
    p_size = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)
    c = q.shape[-2]
    dt = q.dtype
    qf = q.astype(jnp.float32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    tri = rows >= cols  # local (diagonal) chunk mask

    # step 0: the local chunk
    state = _chunk_attention_stats(qf, k.astype(jnp.float32), v, tri)

    if p_size > 1:
        perm = [(i, (i + 1) % p_size) for i in range(p_size)]

        def body(s, carry):
            state, kv = carry
            # rotate KV one hop around the ring (rides ICI on TPU); after s
            # hops this device holds rank (rank - s) mod P's chunk
            kv = jax.lax.ppermute(kv, axis_name, perm)
            src = (rank - s) % p_size
            ks, vs = kv
            # ranks after ours are entirely in the causal future: an
            # all-False mask makes their contribution exactly zero, so the
            # merge is a no-op for them (no data-dependent control flow)
            may_attend = jnp.broadcast_to(src < rank, (c, c))
            contrib = _chunk_attention_stats(
                qf, ks.astype(jnp.float32), vs, may_attend
            )
            return _merge(state, contrib), kv

        state, _ = jax.lax.fori_loop(1, p_size, body, (state, (k, v)))
    m, l, acc = state
    # rows with no attendable keys (cannot happen for causal: position 0
    # attends to itself) would have l = 0; guard anyway
    return (acc / jnp.maximum(l, 1e-30)).astype(dt)


def make_ring_attention(mesh: Mesh, axis_name: str = "data"):
    """Jitted full-sequence causal attention sharded over ``axis_name``.

    Returns fn(q, k, v) taking FULL (..., T, hs) arrays; the sequence axis
    (second-to-last) is sharded across the mesh axis, each device runs the
    ring body, and the output comes back with the same sharding. T must be
    divisible by the axis size.
    """
    def call(q, k, v):
        lead = (None,) * (q.ndim - 2)
        spec = P(*lead, axis_name, None)
        fn = shard_map(
            functools.partial(ring_causal_attention_local, axis_name=axis_name),
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            check_rep=False,
        )
        return fn(q, k, v)

    return jax.jit(call)
