"""Blockwise (flash) causal attention as a Pallas TPU kernel.

The reference materializes the full (T, T) affinity matrix per head in HBM
(reference: model.py:65-72). For the shipped tiny block sizes (4-64) that is
irrelevant, but this framework targets production/serving scale where T
reaches thousands — there the dense form is HBM-bandwidth-bound and O(T²)
memory. This kernel computes softmax(q·kᵀ/√d)·v blockwise with the online
(running max / running sum) reformulation, never writing the affinity matrix
to HBM, and skipping fully-masked key blocks (upper triangle) entirely —
≈2× fewer FLOPs than the dense form on top of the memory win.

Grid: (N, T/BQ) where N collapses all leading dims (modality, batch, head).
Each program holds one query block in VMEM and streams key/value blocks for
its row; the causal structure bounds the inner loop at the diagonal block.

Backward: recompute-based custom VJP — the forward saves only (out, q, k, v)
and the backward re-derives gradients with the dense jnp formulation under
remat-style recomputation. A fully blockwise backward kernel is a later
optimization; this keeps training numerics exact while the forward already
runs blockwise.

Numerics: f32 accumulation (preferred_element_type), exact softmax (no
approximations); equivalence with the dense jnp core is pinned by
tests/test_kernels.py in interpret mode and on-TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Query/key block sizes. 128 matches the MXU tile edge; 8-row sublane
# granularity makes BQ=128/BK=128 safe for f32.
DEFAULT_BQ = 128
DEFAULT_BK = 128
MIN_FLASH_SEQ_LEN = 256  # below this the dense core is faster (tiny matmuls)

_NEG_INF = float("-inf")


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, bq: int, bk: int, scale: float):
    """One (sequence-row, query-block) program of causal flash attention."""
    iq = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32)  # (bq, hs)
    hs = q.shape[-1]
    t_k = k_ref.shape[1]

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, hs), jnp.float32)

    q_offset = iq * bq

    def body(jk, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(jk * bk, bk), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(jk * bk, bk), :].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk)

        # causal mask: query position q_offset+r attends to key ≤ itself
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q_offset
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + jk * bk
        s = jnp.where(rows >= cols, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p, v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    # only key blocks at or before the diagonal block contribute
    num_kv_blocks = jnp.minimum((q_offset + bq + bk - 1) // bk, t_k // bk)
    m, l, acc = jax.lax.fori_loop(0, num_kv_blocks, body, (m0, l0, acc0))
    # replace running max with final softmax normalization
    del m
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_forward(q, k, v, bq: int, bk: int, interpret: bool) -> jax.Array:
    """q, k, v: (N, T, hs) — leading dims already collapsed."""
    n, t, hs = q.shape
    scale = hs ** -0.5
    kernel = functools.partial(_flash_kernel, bq=bq, bk=bk, scale=scale)

    grid = (n, t // bq)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hs), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t, hs), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t, hs), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, hs), lambda i, j: (i, j, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * t * t * hs // 2,  # qk^T + pv over the causal half
            bytes_accessed=4 * n * t * hs * 4,
            transcendentals=n * t * t // 2,
        ),
    )(q, k, v)


def _dense_reference(q, k, v):
    """Dense causal attention used for the recompute backward."""
    t_q, t_k = q.shape[-2], k.shape[-2]
    scale = k.shape[-1] ** -0.5
    s = jnp.matmul(q, jnp.swapaxes(k, -1, -2)) * scale
    mask = jnp.tril(jnp.ones((t_q, t_k), dtype=bool))
    s = jnp.where(mask, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.matmul(p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash3(q, k, v, bq, bk, interpret):
    return _flash_forward(q, k, v, bq, bk, interpret)


def _flash3_fwd(q, k, v, bq, bk, interpret):
    return _flash_forward(q, k, v, bq, bk, interpret), (q, k, v)


def _flash3_bwd(bq, bk, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(_dense_reference, q, k, v)
    return vjp(g)


_flash3.defvjp(_flash3_fwd, _flash3_bwd)


def flash_attention_eligible(q: jax.Array, k: jax.Array, v: jax.Array) -> bool:
    """Kernel eligibility: self-attention layout (q/k/v same shape), long
    enough sequence to beat the dense core, block-aligned T, lane-friendly
    head size. The cross-attention broadcast layout (q has fewer leading
    dims) falls back to the dense core for now."""
    if q.shape != k.shape or q.shape != v.shape:
        return False
    if q.ndim < 3:
        return False
    t, hs = q.shape[-2], q.shape[-1]
    if t < MIN_FLASH_SEQ_LEN or t % DEFAULT_BQ != 0 or t % DEFAULT_BK != 0:
        return False
    if hs > 256:
        return False
    return True


def flash_causal_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False
) -> jax.Array:
    """Causal flash attention over trailing (T, hs); leading dims collapse."""
    lead = q.shape[:-2]
    t, hs = q.shape[-2], q.shape[-1]
    n = 1
    for d in lead:
        n *= d
    q3 = q.reshape(n, t, hs)
    k3 = k.reshape(n, t, hs)
    v3 = v.reshape(n, t, hs)
    bq = min(DEFAULT_BQ, t)
    bk = min(DEFAULT_BK, t)
    out = _flash3(q3, k3, v3, bq, bk, interpret)
    return out.reshape(*lead, t, hs)
