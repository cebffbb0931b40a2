"""Ring (context-parallel) causal attention over a mesh axis — differentiable.

The reference is single-device with block_size 4-64 (reference:
config.yaml:99, config_manager.py:131), so sequence parallelism is beyond
capability parity — this is the forward-looking long-context component
(SURVEY §5.7): shard the SEQUENCE axis across devices and attend with a ring
of KV exchanges, so no device ever holds the full (T, T) problem or even the
full sequence.

Layout: inside ``shard_map`` over axis ``axis_name`` (size P), each device
holds the contiguous sequence chunk [rank·c, (rank+1)·c) of q, k, v (c = T/P).
Causality means device r only needs KV chunks from ranks ≤ r.

Forward (per device): attend the local chunk with a causal mask, then P−1
``ppermute`` hops rotate (k, v) around the ring (each hop rides one ICI
neighbor link); chunks from ranks < r attend with a FULL mask, wrapped
chunks from ranks > r contribute nothing. Partial results carry explicit
logsumexp and merge exactly: out ← out·e^(lse−lse') + out_s·e^(lse_s−lse').

Backward: the exact ring-attention gradient. With the final merged lse,
P = exp(S − lse) decomposes the global softmax per chunk, so each
(query-chunk, KV-chunk) pair contributes independently via the flash
backward identities (dS = P∘(g·Vᵀ − D), D = rowsum(g∘out)). dq accumulates
locally; (dk, dv) travel the ring WITH (k, v) — each device adds its
contribution to a visiting chunk's gradient, and after P hops the
accumulated (dk, dv) arrive back at the owner. Communication: fwd moves
2·(c·hs) per hop, bwd 4·(c·hs), all neighbor-to-neighbor.

The per-chunk core is SHARED with the blockwise flash kernels
(ops.attention.chunk_fwd/_bwd): on TPU with kernel-eligible chunk shapes it
IS the Pallas kernel (ops/pallas_attention.py flash_chunk_fwd/_bwd, causal
and full-mask variants); elsewhere the dense jnp mirror of the same math.
Attention dropout uses the same in-chunk keep-mask semantics as the kernels
(denominator unmasked), keyed per (rank, source-chunk) pair so forward and
backward regenerate identical masks with no mask tensor stored.

Equivalence with single-device attention — values AND gradients — is pinned
by tests/test_ring_attention.py on 2/4/8-device CPU meshes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops.attention import chunk_bwd, chunk_fwd


def _pair_seed(seed, rank, src, p_size):
    """Distinct dropout stream per (query-rank, kv-source) chunk pair."""
    if seed is None:
        return None
    return seed + rank * p_size + src


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ring(q, k, v, seed, axis_name, impl, rate):
    out, _ = _ring_fwd_impl(q, k, v, seed, axis_name, impl, rate)
    return out


def _ring_fwd_impl(q, k, v, seed, axis_name, impl, rate):
    p_size = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)

    out, lse = chunk_fwd(
        q, k, v, causal=True,
        seed=_pair_seed(seed, rank, rank, p_size), rate=rate, impl=impl,
    )
    out = out.astype(jnp.float32)

    if p_size > 1:
        perm = [(i, (i + 1) % p_size) for i in range(p_size)]

        def body(s, carry):
            (out, lse), kv = carry
            # rotate KV one hop around the ring (one ICI neighbor link per
            # hop on TPU); after s hops this device holds rank (rank−s)%P's
            # chunk
            kv = jax.lax.ppermute(kv, axis_name, perm)
            src = (rank - s) % p_size
            o_s, lse_s = chunk_fwd(
                q, kv[0], kv[1], causal=False,
                seed=_pair_seed(seed, rank, src, p_size), rate=rate, impl=impl,
            )
            # ranks after ours are entirely in the causal future — their
            # contribution is dropped by the select (no data-dependent
            # control flow; the compute is wasted but the ring stays
            # uniform, which is what SPMD wants)
            valid = src < rank
            lse_new = jnp.where(valid, jnp.logaddexp(lse, lse_s), lse)
            merged = (
                out * jnp.exp(lse - lse_new)[..., None]
                + o_s.astype(jnp.float32) * jnp.exp(lse_s - lse_new)[..., None]
            )
            out = jnp.where(valid, merged, out)
            lse = lse_new
            return (out, lse), kv

        (out, lse), _ = jax.lax.fori_loop(
            1, p_size, body, ((out, lse), (k, v))
        )

    return out.astype(q.dtype), lse


def _ring_fwd(q, k, v, seed, axis_name, impl, rate):
    out, lse = _ring_fwd_impl(q, k, v, seed, axis_name, impl, rate)
    return out, (q, k, v, out, lse, seed)


def _ring_bwd(axis_name, impl, rate, res, g):
    q, k, v, out, lse, seed = res
    p_size = jax.lax.axis_size(axis_name)
    rank = jax.lax.axis_index(axis_name)

    # local causal chunk
    dq, dk, dv = chunk_bwd(
        q, k, v, out, lse, g, causal=True,
        seed=_pair_seed(seed, rank, rank, p_size), rate=rate, impl=impl,
    )
    dq = dq.astype(jnp.float32)
    dk = dk.astype(jnp.float32)
    dv = dv.astype(jnp.float32)

    if p_size > 1:
        perm = [(i, (i + 1) % p_size) for i in range(p_size)]

        def body(s, carry):
            dq, kv_travel = carry
            # (k, v, dk, dv) travel together: each device adds its gradient
            # contribution to the visiting chunk, and after P hops the
            # accumulated (dk, dv) are home
            kv_travel = jax.lax.ppermute(kv_travel, axis_name, perm)
            k_c, v_c, dk_c, dv_c = kv_travel
            src = (rank - s) % p_size
            dq_s, dk_s, dv_s = chunk_bwd(
                q, k_c.astype(q.dtype), v_c.astype(q.dtype), out, lse, g,
                causal=False,
                seed=_pair_seed(seed, rank, src, p_size), rate=rate, impl=impl,
            )
            valid = src < rank
            dq = dq + jnp.where(valid, dq_s.astype(jnp.float32), 0.0)
            dk_c = dk_c + jnp.where(valid, dk_s.astype(jnp.float32), 0.0)
            dv_c = dv_c + jnp.where(valid, dv_s.astype(jnp.float32), 0.0)
            return dq, (k_c, v_c, dk_c, dv_c)

        dq, kv_travel = jax.lax.fori_loop(
            1, p_size, body, (dq, (k, v, dk, dv))
        )
        # one final hop returns each chunk's accumulated gradient to its owner
        _, _, dk, dv = jax.lax.ppermute(kv_travel, axis_name, perm)

    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_ring.defvjp(_ring_fwd, _ring_bwd)


def ring_causal_attention_local(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    impl: str = "auto",
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    """Per-device body: causal attention with ring KV exchange.

    Call inside shard_map/pmap over ``axis_name``; q, k, v are the LOCAL
    sequence chunks (..., c, hs) and the result is the local output chunk.
    Differentiable (custom VJP implements the exact ring backward).
    """
    rate = float(dropout_rate) if train else 0.0
    if rate > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 requires dropout_key")
        from ..ops.pallas_attention import seed_from_key

        seed = seed_from_key(dropout_key)
    else:
        seed = None
    return _ring(q, k, v, seed, axis_name, impl, rate)


def make_ring_attention(mesh: Mesh, axis_name: str = "data", impl: str = "auto"):
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
            functools.partial(
                ring_causal_attention_local, axis_name=axis_name, impl=impl
            ),
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            check_rep=False,
        )
        return fn(q, k, v)

    return jax.jit(call)
