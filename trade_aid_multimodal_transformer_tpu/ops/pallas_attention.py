"""Blockwise (flash) causal attention as Pallas TPU kernels.

The reference materializes the full (T, T) affinity matrix per head in HBM
(reference: model.py:65-72). For the shipped tiny block sizes (4-64) that is
irrelevant, but this framework targets production/serving scale where T
reaches thousands — there the dense form is HBM-bandwidth-bound and O(T²)
memory. These kernels compute softmax(q·kᵀ/√d)·v blockwise with the online
(running max / running sum) reformulation, never writing the affinity matrix
to HBM, and skipping fully-masked key blocks (upper triangle) entirely —
≈2× fewer FLOPs than the dense form on top of the memory win.

Forward grid: (N, T/BQ) where N collapses all leading dims (modality, batch,
head). Each program holds one query block in VMEM and streams key/value
blocks for its row; the causal structure bounds the inner loop at the
diagonal block. The forward also emits the per-row logsumexp L = m + log(l)
so the backward can reconstruct P = exp(S − L) blockwise.

Backward, three dispatch tiers by VMEM footprint —
  fused kernel (default, whole q/dO rows + f32 dQ row resident): grid
    (N, T/BK); for key block j, stream query blocks i ≥ j, recompute
    P = exp(S − L) ONCE per block pair and emit dV_j += Pᵀ·dO,
    dK_j += dSᵀ·Q·scale AND dQ_i += dS·K·scale into a VMEM-revisited dQ
    row output — 5 matmuls + 1 exp per pair;
  split kernels (FlashAttention-2 style, when the fused residency exceeds
    VMEM): a dQ kernel over query blocks and a dK/dV kernel over key
    blocks, each recomputing P — 7 matmuls + 2 exp per pair;
  streamed kernels (very long T): KV/Q block-streamed over a third grid
    axis, O(block) VMEM.
In all tiers dS = P ∘ (dO·Vᵀ − D) with D = rowsum(dO ∘ O), a cheap
elementwise pass outside the kernels. Nothing of size T² ever touches HBM
in either direction.

Cross-attention variant: the model's cross-attention attends one query
stream against J KV streams and SUMS the per-stream outputs (reference:
model.py:119-159). ``flash_cross_attention`` fuses that sum into the kernel:
grid (J, N, T/BQ) with the output block mapped to the same location for
every j — the kernel initializes at j==0 and accumulates afterward, so the
per-stream attention outputs are never materialized separately.

Numerics: f32 accumulation (preferred_element_type), exact softmax (no
approximations); equivalence with the dense jnp core — values AND gradients —
is pinned by tests/test_kernels.py in interpret mode and on-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Query/key block sizes.
# Measured on v5e at T=4096/hs=64: 512-blocks run the full fwd+bwd 2.5x
# faster than 128-blocks (36.3 -> 14.6 ms) and the streamed fwd 3.2x faster
# — per-program overhead (loop carry, mask iota, softmax reductions)
# amortizes over 16x more work, and the extra causal waste inside coarser
# diagonal blocks is small at bk << T. Blocks clamp to the sequence length
# and fall back in 128 steps to divide T (`_pick_block`).
DEFAULT_BQ = 512
DEFAULT_BK = 512
BLOCK_STEP = 128


def _pick_block(t: int, target: int) -> int:
    """Largest multiple of BLOCK_STEP <= target that divides t (t itself
    when t < BLOCK_STEP — eligibility guarantees t % BLOCK_STEP == 0 for
    every kernel caller, so this terminates at BLOCK_STEP)."""
    b = min(target, t)
    while t % b:
        b -= BLOCK_STEP
    return b


# Floor for the BLOCKWISE kernels: below this the (T/block)² grid degenerates
# and per-program overhead dominates the tiny matmuls. The short whole-row
# kernel owns 8..512 (dispatch tries it first); scan-amortized standalone
# timing shows dense/flash parity at 256..1024 and decisive flash wins from
# 2048 (tools/flash_crossover.py).
MIN_FLASH_SEQ_LEN = 256


def seed_from_key(key: jax.Array) -> jax.Array:
    """(1,) int32 dropout seed from a typed PRNG key OR a raw uint32 salt
    array (the KeyGen v2 site format, ops/layers.py)."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return jax.lax.bitcast_convert_type(
            jax.random.bits(key, (1,), "uint32"), jnp.int32
        )
    data = key.reshape(-1).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((data[0] ^ data[-1])[None], jnp.int32)

# Above this many bytes for one K+V sequence row, the kernels switch from
# whole-row-in-VMEM (optimal HBM traffic: K/V read once per collapsed batch
# row) to KV-block streaming over a third grid dimension (traffic O(T²·hs/BQ)
# but O(block) VMEM — lifts the T≲16k row ceiling). ~16 MB VMEM/core; leave
# room for q/o blocks, scratch, and pipeline double-buffering.
KV_ROW_VMEM_BUDGET = 4 * 1024 * 1024

_NEG_INF = float("-inf")


def hash_keep_mask(seed, n_idx, iq, jk, shape, rate: float):
    """Pure-jnp deterministic dropout keep-mask (integer-mixing hash).

    Used (a) by the kernels in interpret mode, where ``pltpu.prng_*`` cannot
    lower, and (b) by the jnp chunk core (ops/attention.py chunk_fwd/_bwd)
    so ring/context-parallel attention regenerates bit-identical masks in its
    forward and backward without ever storing a mask tensor. Same seeding
    structure as the on-TPU PRNG path; different bit stream (the dropout
    stream is implementation-defined either way).
    """
    threshold = np.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 2)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
    u32 = lambda a: jnp.asarray(a).astype(jnp.uint32)  # noqa: E731
    x = (
        u32(seed) * np.uint32(2654435761)
        ^ (u32(n_idx) * np.uint32(40503))
        ^ (u32(iq) * np.uint32(1000003))
        ^ (u32(jk) * np.uint32(97))
    )
    h = r * np.uint32(2246822519) + c * np.uint32(3266489917) + x
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(2654435761)
    h = h ^ (h >> np.uint32(16))
    return h >= threshold


def _keep_mask(seed, n_idx, iq, jk, shape, rate: float, interpret: bool):
    """Deterministic per-(program, block) dropout keep-mask.

    Seeded by (run seed, collapsed batch·head index, query block, key block),
    so the forward and BOTH backward kernels regenerate bit-identical masks —
    no T² mask tensor ever exists in HBM (the reference stores the full
    dropout mask; torch semantics, reference: model.py:68-69).

    On TPU the bits come from the core's native PRNG. Interpret mode (CPU
    tests) uses ``hash_keep_mask`` — same seeding structure, different bit
    stream.
    """
    # NOTE: constants must stay numpy/python scalars — jnp scalars traced
    # inside a kernel become jaxpr constvars, which pallas refuses to lower
    # (and which silently disable interpret mode).
    threshold = np.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    if not interpret:
        # Mosaic supports at most 2 seed words — mix (seed, n) and (iq, jk)
        # injectively: odd-constant multiply is a bijection mod 2^32, and
        # jk < 1000003 for any realistic T/BK.
        s1 = seed ^ (n_idx * np.int32(40503))
        s2 = iq * np.int32(1000003) + jk
        pltpu.prng_seed(s1, s2)
        bits = pltpu.prng_random_bits(shape)  # uint32
        return pltpu.bitcast(bits, jnp.uint32) >= threshold  # P(keep) = 1-rate
    return hash_keep_mask(seed, n_idx, iq, jk, shape, rate)


# --------------------------------------------------------------------- forward


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, seed_ref, o_ref, lse_ref,
    *, bq: int, bk: int, scale: float, rate: float, interpret: bool,
    causal: bool = True,
):
    """One (sequence-row, query-block) program of flash attention.

    ``causal=False`` attends to every key (used for the off-diagonal chunks
    of ring/context-parallel attention, where whole-chunk causality is
    resolved at the ring level) — the inner loop then covers all key blocks
    and no mask is applied.

    With rate > 0, attention dropout runs IN-KERNEL: the keep-mask applies to
    the unnormalized exp-scores inside the accumulation while the softmax
    denominator accumulates unmasked, which equals dropout(softmax(S)) @ V
    because the per-row 1/l scaling commutes with the elementwise mask.
    """
    n_idx = pl.program_id(0)
    iq = pl.program_id(1)
    # dot inputs stay in their NATIVE dtype (bf16 on the production path)
    # with f32 accumulation — f32 dot inputs cost ~4x MXU throughput, and at
    # long T the flash kernels are compute-bound (measured ~33 TF/s before
    # this change)
    q = q_ref[0]  # (bq, hs)
    hs = q.shape[-1]
    t_k = k_ref.shape[1]

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, hs), jnp.float32)

    q_offset = iq * bq

    def body(jk, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(jk * bk, bk), :]
        v_blk = v_ref[0, pl.ds(jk * bk, bk), :]

        s = jax.lax.dot_general(
            q, k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk)

        if causal:
            # causal mask: query position q_offset+r attends to key ≤ itself
            rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q_offset
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + jk * bk
            s = jnp.where(rows >= cols, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            keep = _keep_mask(
                seed_ref[0], n_idx, iq, jk, (bq, bk), rate, interpret
            )
            p_acc = jnp.where(keep, p, 0.0)
        else:
            p_acc = p
        acc = acc * corr + jax.lax.dot_general(
            p_acc.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    if causal:
        # only key blocks at or before the diagonal block contribute
        num_kv_blocks = jnp.minimum((q_offset + bq + bk - 1) // bk, t_k // bk)
    else:
        num_kv_blocks = t_k // bk
    m, l, acc = jax.lax.fori_loop(0, num_kv_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / (l * (1.0 - rate))).astype(o_ref.dtype)
    # logsumexp of each row's scores — the backward's softmax reconstruction.
    # lse is laid out (n, 1, T) with a full-row block: TPU tiling requires
    # the last two block dims be (8k, 128k) or equal to the array dims, so a
    # (1, bq) block is not lowerable; the (1, T) row block is, and is
    # revisited in VMEM across the j grid dimension.
    lse_ref[0, 0, pl.ds(q_offset, bq)] = (m + jnp.log(l))[:, 0]


def _flash_forward(
    q, k, v, seed, bq: int, bk: int, rate: float, interpret: bool,
    causal: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """q, k, v: (N, T, hs) — leading dims already collapsed; seed: (1,) i32.

    Returns (out (N, T, hs), logsumexp (N, 1, T))."""
    n, t, hs = q.shape
    scale = hs ** -0.5
    kernel = functools.partial(
        _flash_fwd_kernel, bq=bq, bk=bk, scale=scale, rate=rate,
        interpret=interpret, causal=causal,
    )

    t_k = k.shape[1]
    causal_div = 2 if causal else 1
    grid = (n, t // bq)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((n, 1, t), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hs), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, t_k, hs), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, t_k, hs), lambda i, j: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, hs), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * t * t_k * hs // causal_div,  # qk^T + pv
            bytes_accessed=4 * n * t * hs * 4,
            transcendentals=n * t * t_k // causal_div,
        ),
    )(q, k, v, seed)


# --------------------------------------------------- forward, KV-streamed
#
# Same math as _flash_fwd_kernel, but the key/value blocks arrive through a
# third grid dimension instead of a whole-row VMEM block: pallas's pipeline
# double-buffers the (1, bk, hs) fetches, (m, l) carry in VMEM scratch, and
# the output block (revisited across jk) accumulates in place with the
# online-softmax rescaling. Causality: the K/V index maps CLAMP jk to the
# diagonal block (a repeated index fetches nothing new), and pl.when skips
# the compute — upper-triangle blocks cost neither bandwidth nor FLOPs.
# Dropout keying (seed, n, iq, jk) is identical to the row kernels, so both
# paths produce the same masks.


def _flash_fwd_kernel_streamed(
    q_ref, k_ref, v_ref, seed_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, bq: int, bk: int, n_k: int, scale: float, rate: float,
    interpret: bool, causal: bool,
):
    n_idx = pl.program_id(0)
    iq = pl.program_id(1)
    jk = pl.program_id(2)
    q_offset = iq * bq

    @pl.when(jk == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    if causal:
        last_valid = jnp.minimum((q_offset + bq - 1) // bk, n_k - 1)
        run = jk <= last_valid
    else:
        last_valid = n_k - 1
        run = jk <= last_valid  # always true; keeps one code path

    @pl.when(run)
    def _():
        q = q_ref[0]
        k_blk = k_ref[0]
        v_blk = v_ref[0]
        s = jax.lax.dot_general(
            q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q_offset
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + jk * bk
            s = jnp.where(rows >= cols, s, _NEG_INF)
        m = m_scr[:, :1]
        l = l_scr[:, :1]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            keep = _keep_mask(seed_ref[0], n_idx, iq, jk, (bq, bk), rate, interpret)
            p_acc = jnp.where(keep, p, 0.0)
        else:
            p_acc = p
        acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
            p_acc.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[:, :1] = m_new
        l_scr[:, :1] = l_new

    @pl.when(jk == last_valid)
    def _():
        m = m_scr[:, :1]
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / (l * (1.0 - rate))).astype(o_ref.dtype)
        lse_ref[0, 0, pl.ds(q_offset, bq)] = (m + jnp.log(l))[:, 0]


def _kv_clamped_index(bq: int, bk: int, n_k: int, causal: bool):
    """Index map for streamed K/V blocks: clamp to the diagonal so skipped
    upper-triangle programs re-reference the previous block (no DMA)."""
    if not causal:
        return lambda i, iq, jk: (i, jk, 0)

    def index(i, iq, jk):
        last_valid = jnp.minimum((iq * bq + bq - 1) // bk, n_k - 1)
        return (i, jnp.minimum(jk, last_valid), 0)

    return index


def _flash_forward_streamed(
    q, k, v, seed, bq: int, bk: int, rate: float, interpret: bool,
    causal: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """KV-streamed forward: O(block) VMEM, any T."""
    n, t, hs = q.shape
    t_k = k.shape[1]
    n_k = t_k // bk
    scale = hs ** -0.5
    causal_div = 2 if causal else 1
    kernel = functools.partial(
        _flash_fwd_kernel_streamed, bq=bq, bk=bk, n_k=n_k, scale=scale,
        rate=rate, interpret=interpret, causal=causal,
    )
    kv_index = _kv_clamped_index(bq, bk, n_k, causal)
    grid = (n, t // bq, n_k)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((n, 1, t), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hs), lambda i, iq, jk: (i, iq, 0)),
            pl.BlockSpec((1, bk, hs), kv_index),
            pl.BlockSpec((1, bk, hs), kv_index),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, hs), lambda i, iq, jk: (i, iq, 0)),
            pl.BlockSpec((1, 1, t), lambda i, iq, jk: (i, 0, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # running max (col 0 used)
            pltpu.VMEM((bq, 128), jnp.float32),  # running sum (col 0 used)
            pltpu.VMEM((bq, hs), jnp.float32),   # f32 output accumulator
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * t * t_k * hs // causal_div,
            bytes_accessed=n * t * hs * 4 * 2 + n * t * t_k * hs * 4 // (bq * causal_div),
            transcendentals=n * t * t_k // causal_div,
        ),
    )(q, k, v, seed)


# -------------------------------------------------------------------- backward


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref, dq_ref,
    *, bq: int, bk: int, scale: float, rate: float, interpret: bool,
    causal: bool = True,
):
    """dQ for one query block: stream key blocks up to the diagonal
    (all key blocks when ``causal=False``)."""
    n_idx = pl.program_id(0)
    iq = pl.program_id(1)
    q = q_ref[0]            # (bq, hs)
    do = do_ref[0]          # (bq, hs)
    hs = q.shape[-1]
    t_k = k_ref.shape[1]
    q_offset = iq * bq
    lse = lse_ref[0, 0, pl.ds(q_offset, bq)][:, None]      # (bq, 1)
    delta = delta_ref[0, 0, pl.ds(q_offset, bq)][:, None]  # (bq, 1)

    def body(jk, dq):
        k_blk = k_ref[0, pl.ds(jk * bk, bk), :]
        v_blk = v_ref[0, pl.ds(jk * bk, bk), :]
        s = jax.lax.dot_general(
            q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q_offset
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + jk * bk
            # exp(-inf - lse) = 0 handles the masked entries exactly
            p = jnp.where(rows >= cols, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            # dS = P ∘ (mask/keep ∘ (dO·Vᵀ) − D); regenerate the forward's
            # keep-mask from the same (seed, n, iq, jk) tuple
            keep = _keep_mask(
                seed_ref[0], n_idx, iq, jk, (bq, bk), rate, interpret
            )
            dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
        ds = (p * (dp - delta)).astype(k_blk.dtype)
        return dq + jax.lax.dot_general(
            ds, k_blk, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    if causal:
        num_kv_blocks = jnp.minimum((q_offset + bq + bk - 1) // bk, t_k // bk)
    else:
        num_kv_blocks = t_k // bk
    dq = jax.lax.fori_loop(
        0, num_kv_blocks, body, jnp.zeros((bq, hs), jnp.float32)
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref, dk_ref, dv_ref,
    *, bq: int, bk: int, scale: float, rate: float, interpret: bool,
    causal: bool = True,
):
    """dK/dV for one key block: stream query blocks from the diagonal down
    (all query blocks when ``causal=False``)."""
    n_idx = pl.program_id(0)
    jk = pl.program_id(1)
    k_blk = k_ref[0]        # (bk, hs)
    v_blk = v_ref[0]        # (bk, hs)
    hs = k_blk.shape[-1]
    t_q = q_ref.shape[1]
    k_offset = jk * bk
    n_q_blocks = t_q // bq

    def body(iq, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(iq * bq, bq), :]
        do = do_ref[0, pl.ds(iq * bq, bq), :]
        lse = lse_ref[0, 0, pl.ds(iq * bq, bq)][:, None]
        delta = delta_ref[0, 0, pl.ds(iq * bq, bq)][:, None]
        s = jax.lax.dot_general(
            q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk)
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + iq * bq
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + k_offset
            p = jnp.where(rows >= cols, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            keep = _keep_mask(
                seed_ref[0], n_idx, iq, jk, (bq, bk), rate, interpret
            )
            pd = jnp.where(keep, p / (1.0 - rate), 0.0)   # dropped probs
            dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
        else:
            pd = p
        dv = dv + jax.lax.dot_general(
            pd.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta)).astype(q.dtype)
        dk = dk + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        return dk, dv

    # only query blocks at or after this key block's diagonal contribute
    first_q_block = k_offset // bq if causal else 0
    dk, dv = jax.lax.fori_loop(
        first_q_block,
        n_q_blocks,
        body,
        (jnp.zeros((bk, hs), jnp.float32), jnp.zeros((bk, hs), jnp.float32)),
    )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, seed, bq, bk, rate, interpret,
                    causal: bool = True):
    """lse: (n, 1, t) as produced by the forward kernel."""
    n, t, hs = q.shape
    t_k = k.shape[1]
    causal_div = 2 if causal else 1
    scale = hs ** -0.5
    # D = rowsum(dO ∘ O) — one elementwise pass, fused by XLA
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[:, None, :]  # (n, 1, t) to match the lse row-block layout

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, bq=bq, bk=bk, scale=scale, rate=rate,
            interpret=interpret, causal=causal,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(n, t // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hs), lambda i, j: (i, j, 0)),   # q
            pl.BlockSpec((1, t_k, hs), lambda i, j: (i, 0, 0)),  # k
            pl.BlockSpec((1, t_k, hs), lambda i, j: (i, 0, 0)),  # v
            pl.BlockSpec((1, bq, hs), lambda i, j: (i, j, 0)),   # dO
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),     # lse
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),     # delta
            pl.BlockSpec(memory_space=pltpu.SMEM),               # seed
        ],
        out_specs=pl.BlockSpec((1, bq, hs), lambda i, j: (i, j, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * n * t * t_k * hs // causal_div,
            bytes_accessed=6 * n * t * hs * 4,
            transcendentals=n * t * t_k // causal_div,
        ),
    )(q, k, v, g, lse, delta, seed)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, bq=bq, bk=bk, scale=scale, rate=rate,
            interpret=interpret, causal=causal,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(n, t_k // bk),
        in_specs=[
            pl.BlockSpec((1, t, hs), lambda i, j: (i, 0, 0)),    # q
            pl.BlockSpec((1, bk, hs), lambda i, j: (i, j, 0)),   # k
            pl.BlockSpec((1, bk, hs), lambda i, j: (i, j, 0)),   # v
            pl.BlockSpec((1, t, hs), lambda i, j: (i, 0, 0)),    # dO
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),     # lse
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),     # delta
            pl.BlockSpec(memory_space=pltpu.SMEM),               # seed
        ],
        out_specs=(
            pl.BlockSpec((1, bk, hs), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bk, hs), lambda i, j: (i, j, 0)),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * n * t * t_k * hs // causal_div,
            bytes_accessed=6 * n * t * hs * 4,
            transcendentals=n * t * t_k // causal_div,
        ),
    )(q, k, v, g, lse, delta, seed)
    return dq, dk, dv


# ------------------------------------------------- backward, fused dQ+dK+dV


def _flash_bwd_fused_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref,
    dq_ref, dk_ref, dv_ref,
    *, bq: int, bk: int, scale: float, rate: float, interpret: bool,
    causal: bool = True,
):
    """dQ, dK and dV in ONE kernel sharing a single P = exp(S − L) recompute.

    Key-block-major like the dK/dV kernel — grid (N, T_k/BK) — but the full
    f32 dQ row rides along as a VMEM-resident output revisited by every jk
    program of the same n: the dQ block index ignores jk, and jk is the
    inner grid axis, so revisits are consecutive — zero the row at jk == 0,
    accumulate per query block inside the loop, and Pallas writes it back
    to HBM once per n. Each (iq, jk) block pair then pays ONE S matmul, ONE
    exp pass, ONE dO·Vᵀ matmul and ONE dropout keep-mask instead of the two
    each that the split dQ / dK+dV kernels pay (both recompute P
    independently): 5 MXU matmuls + 1 exp per pair instead of 7 + 2. At
    hs = 64 the exp pass is VPU-bound and comparable to a matmul, so this
    is the kernel family round 4's T=1024 anatomy called for
    (TECHNICAL_NOTES.md: fused multi-pass backward sharing one exp
    recompute). Semantics unchanged vs reference model.py:65-72.
    """
    n_idx = pl.program_id(0)
    jk = pl.program_id(1)

    @pl.when(jk == 0)
    def _():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    k_blk = k_ref[0]        # (bk, hs)
    v_blk = v_ref[0]        # (bk, hs)
    hs = k_blk.shape[-1]
    t_q = q_ref.shape[1]
    k_offset = jk * bk
    n_q_blocks = t_q // bq

    def body(iq, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(iq * bq, bq), :]
        do = do_ref[0, pl.ds(iq * bq, bq), :]
        lse = lse_ref[0, 0, pl.ds(iq * bq, bq)][:, None]
        delta = delta_ref[0, 0, pl.ds(iq * bq, bq)][:, None]
        s = jax.lax.dot_general(
            q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk)
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + iq * bq
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + k_offset
            p = jnp.where(rows >= cols, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            keep = _keep_mask(
                seed_ref[0], n_idx, iq, jk, (bq, bk), rate, interpret
            )
            pd = jnp.where(keep, p / (1.0 - rate), 0.0)
            dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
        else:
            pd = p
        dv = dv + jax.lax.dot_general(
            pd.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta)).astype(q.dtype)
        dk = dk + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        dq_blk = dq_ref[0, pl.ds(iq * bq, bq), :]
        dq_ref[0, pl.ds(iq * bq, bq), :] = dq_blk + jax.lax.dot_general(
            ds, k_blk, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        return dk, dv

    first_q_block = k_offset // bq if causal else 0
    dk, dv = jax.lax.fori_loop(
        first_q_block,
        n_q_blocks,
        body,
        (jnp.zeros((bk, hs), jnp.float32), jnp.zeros((bk, hs), jnp.float32)),
    )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# VMEM gate for the fused backward: per-n resident bytes are the q and dO
# rows (input dtype), the f32 dQ row, and the f32 lse/delta rows — Pallas
# double-buffers them across n, and the k/v/dk/dv blocks + compute scratch
# need headroom inside the ~16 MB/core. bf16 passes up to T≈9.8k (T=8192:
# 8.5 MB), f32 up to T≈6.7k; beyond that the split two-kernel backward
# (half the per-n residency) still applies until streaming takes over.
FUSED_BWD_VMEM_BUDGET = 10 * 1024 * 1024


def _fused_bwd_fits(t_q: int, hs: int, itemsize: int) -> bool:
    resident = t_q * hs * (2 * itemsize + 4) + 2 * 4 * t_q
    return 2 * resident <= FUSED_BWD_VMEM_BUDGET


def _flash_backward_fused(q, k, v, out, lse, g, seed, bq, bk, rate, interpret,
                          causal: bool = True):
    """Single-kernel dQ/dK/dV backward (see _flash_bwd_fused_kernel).

    lse: (n, 1, t) as produced by the forward kernel. Equivalence with the
    split backward (and the dense core) — values, gradients, and the exact
    in-kernel dropout bitstream, which is keyed by the same
    (seed, n, iq, jk) tuple — is pinned by tests/test_kernels.py.
    """
    n, t, hs = q.shape
    t_k = k.shape[1]
    causal_div = 2 if causal else 1
    scale = hs ** -0.5
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[:, None, :]  # (n, 1, t)

    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_fused_kernel, bq=bq, bk=bk, scale=scale, rate=rate,
            interpret=interpret, causal=causal,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, jnp.float32),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(n, t_k // bk),
        in_specs=[
            pl.BlockSpec((1, t, hs), lambda i, j: (i, 0, 0)),    # q
            pl.BlockSpec((1, bk, hs), lambda i, j: (i, j, 0)),   # k
            pl.BlockSpec((1, bk, hs), lambda i, j: (i, j, 0)),   # v
            pl.BlockSpec((1, t, hs), lambda i, j: (i, 0, 0)),    # dO
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),     # lse
            pl.BlockSpec((1, 1, t), lambda i, j: (i, 0, 0)),     # delta
            pl.BlockSpec(memory_space=pltpu.SMEM),               # seed
        ],
        out_specs=(
            pl.BlockSpec((1, t, hs), lambda i, j: (i, 0, 0)),    # dq (f32 row)
            pl.BlockSpec((1, bk, hs), lambda i, j: (i, j, 0)),   # dk
            pl.BlockSpec((1, bk, hs), lambda i, j: (i, j, 0)),   # dv
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * n * t * t_k * hs // causal_div,
            bytes_accessed=9 * n * t * hs * 4,
            transcendentals=n * t * t_k // causal_div,
        ),
    )(q, k, v, g, lse, delta, seed)
    return dq.astype(q.dtype), dk, dv


# --------------------------------------------------- backward, KV-streamed


def _flash_bwd_dq_kernel_streamed(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref, dq_ref, dq_scr,
    *, bq: int, bk: int, n_k: int, scale: float, rate: float,
    interpret: bool, causal: bool,
):
    """dQ with key/value blocks streamed through the third grid dimension."""
    n_idx = pl.program_id(0)
    iq = pl.program_id(1)
    jk = pl.program_id(2)
    q_offset = iq * bq

    @pl.when(jk == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    if causal:
        last_valid = jnp.minimum((q_offset + bq - 1) // bk, n_k - 1)
    else:
        last_valid = n_k - 1

    @pl.when(jk <= last_valid)
    def _():
        q = q_ref[0]
        do = do_ref[0]
        k_blk = k_ref[0]
        v_blk = v_ref[0]
        lse = lse_ref[0, 0, pl.ds(q_offset, bq)][:, None]
        delta = delta_ref[0, 0, pl.ds(q_offset, bq)][:, None]
        s = jax.lax.dot_general(
            q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q_offset
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + jk * bk
            p = jnp.where(rows >= cols, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            keep = _keep_mask(seed_ref[0], n_idx, iq, jk, (bq, bk), rate, interpret)
            dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
        ds = (p * (dp - delta)).astype(k_blk.dtype)
        dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
            ds, k_blk, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(jk == last_valid)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel_streamed(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, seed_ref, dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, bq: int, bk: int, n_q: int, scale: float, rate: float,
    interpret: bool, causal: bool,
):
    """dK/dV for one key block with query/dO blocks streamed through the
    third grid dimension."""
    n_idx = pl.program_id(0)
    jk = pl.program_id(1)
    iq = pl.program_id(2)
    k_offset = jk * bk

    @pl.when(iq == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    first_valid = (k_offset // bq) if causal else 0

    @pl.when(iq >= first_valid)
    def _():
        k_blk = k_ref[0]
        v_blk = v_ref[0]
        q = q_ref[0]
        do = do_ref[0]
        lse = lse_ref[0, 0, pl.ds(iq * bq, bq)][:, None]
        delta = delta_ref[0, 0, pl.ds(iq * bq, bq)][:, None]
        s = jax.lax.dot_general(
            q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + iq * bq
            cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + k_offset
            p = jnp.where(rows >= cols, jnp.exp(s - lse), 0.0)
        else:
            p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            keep = _keep_mask(seed_ref[0], n_idx, iq, jk, (bq, bk), rate, interpret)
            pd = jnp.where(keep, p / (1.0 - rate), 0.0)
            dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
        else:
            pd = p
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            pd.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta)).astype(q.dtype)
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

    @pl.when(iq == n_q - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _q_clamped_index(bq: int, bk: int, causal: bool):
    """Index map for streamed Q/dO blocks in the dK/dV kernel: clamp iq up
    to the key block's diagonal so skipped programs fetch nothing new."""
    if not causal:
        return lambda i, jk, iq: (i, iq, 0)

    def index(i, jk, iq):
        return (i, jnp.maximum(iq, (jk * bk) // bq), 0)

    return index


def _flash_backward_streamed(q, k, v, out, lse, g, seed, bq, bk, rate,
                             interpret, causal: bool = True):
    """KV/Q-streamed backward: O(block) VMEM, any T."""
    n, t, hs = q.shape
    t_k = k.shape[1]
    n_k = t_k // bk
    n_q = t // bq
    causal_div = 2 if causal else 1
    scale = hs ** -0.5
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )[:, None, :]
    kv_index = _kv_clamped_index(bq, bk, n_k, causal)
    q_index = _q_clamped_index(bq, bk, causal)

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel_streamed, bq=bq, bk=bk, n_k=n_k, scale=scale,
            rate=rate, interpret=interpret, causal=causal,
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(n, n_q, n_k),
        in_specs=[
            pl.BlockSpec((1, bq, hs), lambda i, iq, jk: (i, iq, 0)),   # q
            pl.BlockSpec((1, bk, hs), kv_index),                       # k
            pl.BlockSpec((1, bk, hs), kv_index),                       # v
            pl.BlockSpec((1, bq, hs), lambda i, iq, jk: (i, iq, 0)),   # dO
            pl.BlockSpec((1, 1, t), lambda i, iq, jk: (i, 0, 0)),      # lse
            pl.BlockSpec((1, 1, t), lambda i, iq, jk: (i, 0, 0)),      # delta
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # seed
        ],
        out_specs=pl.BlockSpec((1, bq, hs), lambda i, iq, jk: (i, iq, 0)),
        scratch_shapes=[pltpu.VMEM((bq, hs), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * n * t * t_k * hs // causal_div,
            bytes_accessed=4 * n * t * hs * 4 + n * t * t_k * hs * 4 // (bq * causal_div),
            transcendentals=n * t * t_k // causal_div,
        ),
    )(q, k, v, g, lse, delta, seed)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel_streamed, bq=bq, bk=bk, n_q=n_q, scale=scale,
            rate=rate, interpret=interpret, causal=causal,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(n, n_k, n_q),
        in_specs=[
            pl.BlockSpec((1, bq, hs), q_index),                        # q
            pl.BlockSpec((1, bk, hs), lambda i, jk, iq: (i, jk, 0)),   # k
            pl.BlockSpec((1, bk, hs), lambda i, jk, iq: (i, jk, 0)),   # v
            pl.BlockSpec((1, bq, hs), q_index),                        # dO
            pl.BlockSpec((1, 1, t), lambda i, jk, iq: (i, 0, 0)),      # lse
            pl.BlockSpec((1, 1, t), lambda i, jk, iq: (i, 0, 0)),      # delta
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # seed
        ],
        out_specs=(
            pl.BlockSpec((1, bk, hs), lambda i, jk, iq: (i, jk, 0)),
            pl.BlockSpec((1, bk, hs), lambda i, jk, iq: (i, jk, 0)),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, hs), jnp.float32),
            pltpu.VMEM((bk, hs), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * n * t * t_k * hs // causal_div,
            bytes_accessed=4 * n * t * hs * 4 + n * t * t_k * hs * 4 // (bk * causal_div),
            transcendentals=n * t * t_k // causal_div,
        ),
    )(q, k, v, g, lse, delta, seed)
    return dq, dk, dv


def _use_streaming(t_k: int, hs: int, itemsize: int) -> bool:
    """Whole K+V row bytes exceed the VMEM budget → stream blocks."""
    return 2 * t_k * hs * itemsize > KV_ROW_VMEM_BUDGET


def _fwd_dispatch(q, k, v, seed, bq, bk, rate, interpret, causal=True):
    if _use_streaming(k.shape[1], k.shape[2], k.dtype.itemsize):
        return _flash_forward_streamed(
            q, k, v, seed, bq, bk, rate, interpret, causal=causal
        )
    return _flash_forward(q, k, v, seed, bq, bk, rate, interpret, causal=causal)


def _bwd_dispatch(q, k, v, out, lse, g, seed, bq, bk, rate, interpret,
                  causal=True):
    if _use_streaming(k.shape[1], k.shape[2], k.dtype.itemsize):
        return _flash_backward_streamed(
            q, k, v, out, lse, g, seed, bq, bk, rate, interpret, causal=causal
        )
    if _fused_bwd_fits(q.shape[1], q.shape[2], q.dtype.itemsize):
        return _flash_backward_fused(
            q, k, v, out, lse, g, seed, bq, bk, rate, interpret, causal=causal
        )
    return _flash_backward(
        q, k, v, out, lse, g, seed, bq, bk, rate, interpret, causal=causal
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash3(q, k, v, seed, bq, bk, rate, interpret):
    out, _ = _fwd_dispatch(q, k, v, seed, bq, bk, rate, interpret)
    return out


def _flash3_fwd(q, k, v, seed, bq, bk, rate, interpret):
    out, lse = _fwd_dispatch(q, k, v, seed, bq, bk, rate, interpret)
    return out, (q, k, v, out, lse, seed)


def _flash3_bwd(bq, bk, rate, interpret, res, g):
    q, k, v, out, lse, seed = res
    dq, dk, dv = _bwd_dispatch(
        q, k, v, out, lse, g, seed, bq, bk, rate, interpret
    )
    return dq, dk, dv, None


_flash3.defvjp(_flash3_fwd, _flash3_bwd)


# ------------------------------------------------------- cross-attention fused


# per-stream seed offset (odd prime; injective for any realistic J)
_STREAM_SEED_STRIDE = np.int32(1000003)


def _flash_cross_kernel(
    q_ref, k_ref, v_ref, seed_ref, o_ref,
    *, bq: int, bk: int, scale: float, rate: float, interpret: bool,
):
    """Causal flash attention for one KV stream, SUMMED into the output.

    Grid (J, N, T/BQ): the output block index ignores j, so successive j
    programs revisit the same output block — initialize at j==0, accumulate
    after (the per-stream outputs are never materialized; reference sums them
    post-hoc: model.py:158).

    Dropout masks are keyed by (seed + (j+1)·stride, n, iq, jk) — the SAME
    tuple the self-attention kernels use with a shifted seed, so the
    backward can reproduce stream j's masks by running the blockwise self
    backward with the shifted seed.
    """
    jj = pl.program_id(0)
    n_idx = pl.program_id(1)
    iq = pl.program_id(2)
    stream_seed = seed_ref[0] + (jj + 1) * _STREAM_SEED_STRIDE
    q = q_ref[0, 0]  # (bq, hs)
    hs = q.shape[-1]
    t_k = k_ref.shape[2]

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, hs), jnp.float32)
    q_offset = iq * bq

    def body(jk, carry):
        m, l, acc = carry
        k_blk = k_ref[0, 0, pl.ds(jk * bk, bk), :]
        v_blk = v_ref[0, 0, pl.ds(jk * bk, bk), :]
        s = jax.lax.dot_general(
            q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q_offset
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + jk * bk
        s = jnp.where(rows >= cols, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            keep = _keep_mask(
                stream_seed, n_idx, iq, jk, (bq, bk), rate, interpret
            )
            p_acc = jnp.where(keep, p, 0.0)
        else:
            p_acc = p
        acc = acc * corr + jax.lax.dot_general(
            p_acc.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    num_kv_blocks = jnp.minimum((q_offset + bq + bk - 1) // bk, t_k // bk)
    m, l, acc = jax.lax.fori_loop(0, num_kv_blocks, body, (m0, l0, acc0))
    stream_out = (acc / (l * (1.0 - rate))).astype(o_ref.dtype)

    @pl.when(jj == 0)
    def _():
        o_ref[0, 0] = stream_out

    @pl.when(jj > 0)
    def _():
        o_ref[0, 0] = o_ref[0, 0] + stream_out


def _flash_cross_kernel_res(
    q_ref, k_ref, v_ref, seed_ref, o_ref, os_ref, lse_ref,
    *, bq: int, bk: int, scale: float, rate: float, interpret: bool,
):
    """_flash_cross_kernel + per-stream residuals (out_j, lse_j).

    Used on the GRAD path (custom_vjp fwd): the backward needs each
    stream's output (for D_j = rowsum(dO ∘ O_j)) and logsumexp — emitting
    them here costs one extra (bq, hs) store per program, while the
    recompute they replace cost a full per-stream blockwise forward
    (measured 36 extra kernels ≈ 10 ms/step at T=1024 production, round 5).
    The primal-only path keeps the sum-only kernel.
    """
    jj = pl.program_id(0)
    n_idx = pl.program_id(1)
    iq = pl.program_id(2)
    stream_seed = seed_ref[0] + (jj + 1) * _STREAM_SEED_STRIDE
    q = q_ref[0, 0]  # (bq, hs)
    hs = q.shape[-1]
    t_k = k_ref.shape[2]

    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, hs), jnp.float32)
    q_offset = iq * bq

    def body(jk, carry):
        m, l, acc = carry
        k_blk = k_ref[0, 0, pl.ds(jk * bk, bk), :]
        v_blk = v_ref[0, 0, pl.ds(jk * bk, bk), :]
        s = jax.lax.dot_general(
            q, k_blk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q_offset
        cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1) + jk * bk
        s = jnp.where(rows >= cols, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        if rate > 0.0:
            keep = _keep_mask(
                stream_seed, n_idx, iq, jk, (bq, bk), rate, interpret
            )
            p_acc = jnp.where(keep, p, 0.0)
        else:
            p_acc = p
        acc = acc * corr + jax.lax.dot_general(
            p_acc.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    num_kv_blocks = jnp.minimum((q_offset + bq + bk - 1) // bk, t_k // bk)
    m, l, acc = jax.lax.fori_loop(0, num_kv_blocks, body, (m0, l0, acc0))
    stream_out = (acc / (l * (1.0 - rate))).astype(o_ref.dtype)

    os_ref[0, 0] = stream_out
    lse_ref[0, 0, 0, pl.ds(q_offset, bq)] = (m + jnp.log(l))[:, 0]

    @pl.when(jj == 0)
    def _():
        o_ref[0, 0] = stream_out

    @pl.when(jj > 0)
    def _():
        o_ref[0, 0] = o_ref[0, 0] + stream_out


def _flash_cross_forward_res(q, k, v, seed, bq, bk, rate, interpret):
    """Grad-path cross forward: (sum output, per-stream outs, per-stream
    lses) — see _flash_cross_kernel_res."""
    j, n, t, hs = k.shape
    scale = hs ** -0.5
    kernel = functools.partial(
        _flash_cross_kernel_res, bq=bq, bk=bk, scale=scale, rate=rate,
        interpret=interpret,
    )
    out, outs, lses = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n, t, hs), q.dtype),
            jax.ShapeDtypeStruct((j, n, t, hs), q.dtype),
            jax.ShapeDtypeStruct((j, n, 1, t), jnp.float32),
        ),
        grid=(j, n, t // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, hs), lambda jj, i, iq: (0, i, iq, 0)),
            pl.BlockSpec((1, 1, t, hs), lambda jj, i, iq: (jj, i, 0, 0)),
            pl.BlockSpec((1, 1, t, hs), lambda jj, i, iq: (jj, i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, bq, hs), lambda jj, i, iq: (0, i, iq, 0)),
            pl.BlockSpec((1, 1, bq, hs), lambda jj, i, iq: (jj, i, iq, 0)),
            pl.BlockSpec((1, 1, 1, t), lambda jj, i, iq: (jj, i, 0, 0)),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * j * n * t * t * hs // 2,
            bytes_accessed=(3 * j + 2) * n * t * hs * 4,
            transcendentals=j * n * t * t // 2,
        ),
    )(q[None], k, v, seed)
    return out[0], outs, lses


def _flash_cross_forward(q, k, v, seed, bq, bk, rate, interpret):
    """q: (N, T, hs); k, v: (J, N, T, hs). Returns sum_j attn(q, k_j, v_j)."""
    j, n, t, hs = k.shape
    scale = hs ** -0.5
    kernel = functools.partial(
        _flash_cross_kernel, bq=bq, bk=bk, scale=scale, rate=rate,
        interpret=interpret,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n, t, hs), q.dtype),
        grid=(j, n, t // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, hs), lambda jj, i, iq: (0, i, iq, 0)),
            pl.BlockSpec((1, 1, t, hs), lambda jj, i, iq: (jj, i, 0, 0)),
            pl.BlockSpec((1, 1, t, hs), lambda jj, i, iq: (jj, i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, hs), lambda jj, i, iq: (0, i, iq, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * j * n * t * t * hs // 2,
            bytes_accessed=(2 * j + 2) * n * t * hs * 4,
            transcendentals=j * n * t * t // 2,
        ),
    )(q[None], k, v, seed)
    return out[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_cross(q, k, v, seed, bq, bk, rate, interpret):
    return _flash_cross_forward(q, k, v, seed, bq, bk, rate, interpret)


def _flash_cross_fwd(q, k, v, seed, bq, bk, rate, interpret):
    # grad path: the res kernel additionally emits per-stream (out_j, lse_j)
    # so the backward never recomputes a forward (rounds 1-4 recomputed
    # 36 per-stream forwards ≈ 10 ms/step at T=1024 production)
    out, outs, lses = _flash_cross_forward_res(
        q, k, v, seed, bq, bk, rate, interpret
    )
    return out, (q, k, v, seed, outs, lses)


def _flash_cross_bwd(bq, bk, rate, interpret, res, g):
    # Blockwise per-stream backward: out = Σ_j attn(q, k_j, v_j) with
    # independent softmaxes, so d/d(q, k_j, v_j) decomposes per stream with
    # the SAME cotangent g. Stream j differentiates through the fused
    # dQ/dK/dV kernel against its saved (out_j, lse_j) residuals — nothing
    # of size T² touches HBM and nothing recomputes. Stream j's dropout
    # masks reproduce from the shifted seed (same keying as the forward).
    # The J loop unrolls at trace time (J = num_modalities - 1, small by
    # construction; a J-batched single-call variant measured neutral —
    # per-row kernel rates are identical at N=48 and N=144 — while paying
    # q/dO broadcasts, so the loop stays).
    q, k, v, seed, outs, lses = res
    dq = jnp.zeros_like(q)
    dks, dvs = [], []
    for j in range(k.shape[0]):
        seed_j = seed + (j + 1) * _STREAM_SEED_STRIDE
        dq_j, dk_j, dv_j = _bwd_dispatch(
            q, k[j], v[j], outs[j], lses[j], g, seed_j, bq, bk, rate,
            interpret,
        )
        dq = dq + dq_j
        dks.append(dk_j)
        dvs.append(dv_j)
    return dq, jnp.stack(dks), jnp.stack(dvs), None


_flash_cross.defvjp(_flash_cross_fwd, _flash_cross_bwd)


def flash_cross_eligible(q: jax.Array, k: jax.Array, v: jax.Array) -> bool:
    """Fused-cross eligibility: k/v carry one extra leading stream axis."""
    if k.shape != v.shape or k.ndim != q.ndim + 1 or k.shape[1:] != q.shape:
        return False
    if q.ndim < 2:
        return False
    t, hs = q.shape[-2], q.shape[-1]
    if t < MIN_FLASH_SEQ_LEN or t % BLOCK_STEP != 0:
        return False
    if hs > 256:
        return False
    return True


def flash_cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Sum over J KV streams of causal attention, fused in one kernel.

    q: (..., T, hs); k, v: (J, ..., T, hs). Differentiable: the custom VJP
    runs the blockwise dQ / dK+dV kernels per stream (independent softmaxes
    decompose the gradient), so forward AND backward are O(T) memory.
    Attention dropout (dropout_rate > 0) runs in-kernel with per-stream
    seeds, like ``flash_causal_attention``.
    """
    jdim = k.shape[0]
    lead = q.shape[:-2]
    t, hs = q.shape[-2], q.shape[-1]
    n = 1
    for d in lead:
        n *= d
    q3 = q.reshape(n, t, hs)
    k4 = k.reshape(jdim, n, t, hs)
    v4 = v.reshape(jdim, n, t, hs)
    bq = _pick_block(t, DEFAULT_BQ)
    bk = _pick_block(t, DEFAULT_BK)
    rate = float(dropout_rate)
    if rate > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 requires dropout_key")
        seed = seed_from_key(dropout_key)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _flash_cross(q3, k4, v4, seed, bq, bk, rate, interpret)
    return out.reshape(*lead, t, hs)


# --------------------------------------------------- short-context fused kernel
#
# Below MIN_FLASH_SEQ_LEN the blockwise kernels lose to the dense core —
# but the dense core itself is the production bottleneck at short T: XLA
# expands softmax(QK^T)V fwd+bwd into ~a dozen small sequential fused
# regions PER LAYER PER DIRECTION (measured: attention is ~3.7 ms of the
# 11 ms production fwd+bwd at T=64, spread over thousands of ~2 us ops).
# At short T a whole (T, hs) row — indeed G of them — fits in VMEM, so the
# entire attention collapses into ONE program: no online softmax, no lse
# output, and the backward is a SINGLE kernel producing dq/dk/dv together
# (everything needed is already resident). G batch rows per program
# amortize the per-program dispatch overhead that makes one-row-per-program
# kernels slower than dense at these sizes.
#
# Dropout follows the house rule (mask on unnormalized exp-scores, softmax
# denominator unmasked, regenerated — never stored): one (G, T, T) bit
# tensor per program, seeded by (seed, program id), identical in fwd and
# bwd. Interpret mode uses hash_keep_mask keyed by the global collapsed row
# index (the chunk-core convention, ops/attention.py:_chunk_keep_mask).

SHORT_MIN_SEQ_LEN = 8    # sublane alignment
SHORT_MAX_SEQ_LEN = 512  # above this the blockwise kernels take over anyway


def _short_keep_mask(seed, pid, g: int, shape, rate: float, interpret: bool):
    threshold = np.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    if not interpret:
        pltpu.prng_seed(seed ^ (pid * np.int32(40503)), np.int32(7919))
        bits = pltpu.prng_random_bits(shape)
        return pltpu.bitcast(bits, jnp.uint32) >= threshold
    n_idx = pid * g + jax.lax.broadcasted_iota(jnp.int32, (g, 1, 1), 0)
    return hash_keep_mask(seed, n_idx, 0, 0, shape, rate)


def _short_recompute(q, k, scale: float):
    """(g, t, t) masked scores -> (p = exp(s - m), l) shared by fwd and bwd.

    One closed-form softmax (no online accumulation): the fwd and bwd call
    the same expression on the same operands, so the backward's
    reconstruction is bit-identical to the forward.

    Operands stay in their NATIVE dtype (bf16 on the production path) with
    f32 accumulation — upcasting dot inputs to f32 costs ~4x MXU throughput
    on TPU for no accuracy the f32 accumulator doesn't already provide."""
    g, t, _ = q.shape
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, t, t), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, t, t), 2)
    s = jnp.where(rows >= cols, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return p, l


def _short_recompute_t(q, kT, scale: float):
    """``_short_recompute`` for a TRANSPOSED key block kT: (g, hs, t_k).

    The scores dot contracts q's minor dim against kT's sublane dim — the
    MXU-native NN form — so no in-VMEM relayout of k is needed at all."""
    g, t, _ = q.shape
    s = jax.lax.dot_general(
        q, kT, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, t, t), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, t, t), 2)
    s = jnp.where(rows >= cols, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    return p, l


def _short_fwd_kernel(
    q_ref, k_ref, v_ref, seed_ref, o_ref,
    *, g: int, scale: float, rate: float, interpret: bool,
):
    pid = pl.program_id(0)
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    t = q.shape[1]
    p, l = _short_recompute(q, k, scale)
    if rate > 0.0:
        keep = _short_keep_mask(seed_ref[0], pid, g, (g, t, t), rate, interpret)
        p = jnp.where(keep, p, 0.0)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (o / (l * (1.0 - rate))).astype(o_ref.dtype)


def _short_bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, seed_ref, dq_ref, dk_ref, dv_ref,
    *, g: int, scale: float, rate: float, interpret: bool,
):
    """dq, dk, dv in ONE program.

    With W = keep .* softmax(s) / (1-rate) (the matrix that multiplied v):
      dv = W^T do
      ds = P .* (keep .* (do v^T)/(1-rate) - D),  D = rowsum(do .* o)
      dq = scale * ds k;   dk = scale * ds^T q
    (the D trick works because rowsum(dP .* P) over the FULL softmax P
    equals rowsum(do .* o) — masked entries of s have P-contribution zero.)
    """
    pid = pl.program_id(0)
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    o = o_ref[...]
    do = do_ref[...]
    t = q.shape[1]
    inv = 1.0 / (1.0 - rate)
    p, l = _short_recompute(q, k, scale)
    if rate > 0.0:
        keep = _short_keep_mask(seed_ref[0], pid, g, (g, t, t), rate, interpret)
        w = jnp.where(keep, p, 0.0) * (inv / l)
    else:
        w = p / l
    w = w.astype(v.dtype)
    dv = jax.lax.dot_general(  # (g, t_k, hs) = w^T do
        w, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(  # (g, t, t) = do v^T
        do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        dp = jnp.where(keep, dp, 0.0) * inv
    d_cap = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # (g, t, 1)
    ds = ((p / l) * (dp - d_cap)).astype(v.dtype)
    dq = scale * jax.lax.dot_general(
        ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk = scale * jax.lax.dot_general(
        ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _short_pick_g(n: int, t: int, hs: int, itemsize: int = 2) -> int:
    """Largest divisor of n keeping the program's VMEM estimate bounded:
    ~8 (t, hs) blocks + ~4 (t, t) intermediates per batch row, scaled by
    the operand itemsize (x2 headroom). Calibrated on the bf16 production
    path (itemsize 2 reproduces the long-validated sizing); f32 operands
    halve g — Mosaic's scoped-VMEM accounting for the backward measured
    ~2x the bf16 footprint (a 17.1 MB stack at the bf16-tuned g exceeded
    the 16 MB limit)."""
    budget = 8 * 1024 * 1024
    per_row = (8 * t * hs + 4 * t * t) * itemsize * 2
    for g in (64, 32, 16, 8, 4, 2, 1):
        if n % g == 0 and g * per_row <= budget:
            return g
    return 1


def _short_fwd_call(q, k, v, seed, g, rate, interpret):
    n, t, hs = q.shape
    kernel = functools.partial(
        _short_fwd_kernel, g=g, scale=hs ** -0.5, rate=rate,
        interpret=interpret,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, t, hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, t, hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, t, hs), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((g, t, hs), lambda i: (i, 0, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * t * t * hs // 2,
            bytes_accessed=4 * n * t * hs * 4,
            transcendentals=n * t * t // 2,
        ),
    )(q, k, v, seed)


def _short_bwd_call(q, k, v, o, do, seed, g, rate, interpret):
    n, t, hs = q.shape
    kernel = functools.partial(
        _short_bwd_kernel, g=g, scale=hs ** -0.5, rate=rate,
        interpret=interpret,
    )
    spec = pl.BlockSpec((g, t, hs), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(n // g,),
        in_specs=[spec, spec, spec, spec, spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(spec, spec, spec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * n * t * t * hs // 2,
            bytes_accessed=8 * n * t * hs * 4,
            transcendentals=n * t * t // 2,
        ),
    )(q, k, v, o, do, seed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _short3(q, k, v, seed, g, rate, interpret):
    return _short_fwd_call(q, k, v, seed, g, rate, interpret)


def _short3_fwd(q, k, v, seed, g, rate, interpret):
    out = _short_fwd_call(q, k, v, seed, g, rate, interpret)
    return out, (q, k, v, out, seed)


def _short3_bwd(g, rate, interpret, res, grad):
    q, k, v, out, seed = res
    dq, dk, dv = _short_bwd_call(q, k, v, out, grad, seed, g, rate, interpret)
    return dq, dk, dv, None


_short3.defvjp(_short3_fwd, _short3_bwd)


def short_attention_eligible(q: jax.Array, k: jax.Array, v: jax.Array) -> bool:
    """Self-attention layout, sublane-aligned T in the short-context band."""
    if q.shape != k.shape or q.shape != v.shape or q.ndim < 3:
        return False
    t, hs = q.shape[-2], q.shape[-1]
    if t < SHORT_MIN_SEQ_LEN or t > SHORT_MAX_SEQ_LEN or t % 8 != 0:
        return False
    return hs <= 256


def short_causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Whole-row fused causal attention for short T; leading dims collapse.

    One XLA op forward, one backward (dq+dk+dv in a single kernel) —
    replacing the ~dozen dense-core regions per direction that dominate the
    short-T production step. Same contract as flash_causal_attention
    (in-kernel regenerated dropout; stream is implementation-defined)."""
    lead = q.shape[:-2]
    t, hs = q.shape[-2], q.shape[-1]
    n = 1
    for d in lead:
        n *= d
    g = _short_pick_g(n, t, hs, q.dtype.itemsize)
    rate = float(dropout_rate)
    if rate > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 requires dropout_key")
        seed = seed_from_key(dropout_key)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    q3 = q.reshape(n, t, hs)
    k3 = k.reshape(n, t, hs)
    v3 = v.reshape(n, t, hs)
    out = _short3(q3, k3, v3, seed, g, rate, interpret)
    return out.reshape(*lead, t, hs)


def _short_cross_fwd_kernel(
    q_ref, k_ref, v_ref, seed_ref, o_ref,
    *, g: int, scale: float, rate: float, interpret: bool, kv_t: bool = False,
):
    """ALL KV streams' whole-row attention, summed, in ONE program.

    The stream loop is a trace-time Python loop (J = num_modalities - 1 is
    tiny and static), so one program computes the full per-row stream sum
    with the output resident in registers/VMEM — no output-block revisits,
    no per-(i, j) program dispatch (a grid-axis-j variant measured ~69 us
    per fwd call against a ~15 us traffic floor; this form removes the
    flush/refetch and amortizes the per-program overhead over J streams).
    Per-stream dropout seeds follow the flash-cross convention
    (seed + (j+1)·stride) with the standalone short kernel's per-program
    keying, so masks are bit-identical to J separate short calls.

    ``kv_t=True`` takes k/v blocks TRANSPOSED — (jdim, g, hs, t) — and
    relayouts them in VMEM (a batched last-two-dim transpose, ~free on
    Mosaic). The transposed HBM layout is the one the model's KV projection
    einsum produces naturally, so accepting it deletes a physical relayout
    copy per tensor per layer that XLA otherwise inserts between the einsum
    and this kernel (measured ~310 us/step on the production config)."""
    i = pl.program_id(0)
    q = q_ref[...]
    t = q.shape[1]
    jdim = k_ref.shape[0]
    acc = None
    for jj in range(jdim):
        k = k_ref[jj]
        v = v_ref[jj]
        if kv_t:
            p, l = _short_recompute_t(q, k, scale)
        else:
            p, l = _short_recompute(q, k, scale)
        if rate > 0.0:
            seed_j = seed_ref[0] + np.int32(jj + 1) * _STREAM_SEED_STRIDE
            keep = _short_keep_mask(seed_j, i, g, (g, t, t), rate, interpret)
            p = jnp.where(keep, p, 0.0)
        # kv_t: v block is (g, hs, t_k) — contract t_k on both (NT form;
        # Mosaic relayouts the stationary operand in-VMEM, measured cheaper
        # than an explicit batched transpose + NN dot)
        o_dims = (((2,), (2,)), ((0,), (0,))) if kv_t else (((2,), (1,)), ((0,), (0,)))
        o = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=o_dims,
            preferred_element_type=jnp.float32,
        ) / (l * (1.0 - rate))
        acc = o if acc is None else acc + o
    o_ref[...] = acc.astype(o_ref.dtype)


def _short_cross_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, seed_ref, dq_ref, dk_ref, dv_ref,
    *, g: int, scale: float, rate: float, interpret: bool, kv_t: bool = False,
):
    """dq (summed over streams) and every dk_j/dv_j in ONE program.

    Same math as _short_bwd_kernel per stream with a trace-time stream
    loop (see the forward); the per-stream D = rowsum(do ∘ o_j) is obtained
    as rowsum(w ∘ (do v^T)) from operands already resident — the fused
    forward never materializes per-stream outputs and the identity saves
    recomputing each o_j with a (t, t, hs) dot.

    ``kv_t=True`` mirrors the forward's transposed-KV contract: k/v blocks
    arrive (jdim, g, hs, t) and dk/dv are STORED transposed, so the
    KV-projection einsum's backward consumes them without a relayout."""
    i = pl.program_id(0)
    q = q_ref[...]
    do = do_ref[...]
    t = q.shape[1]
    jdim = k_ref.shape[0]
    inv = 1.0 / (1.0 - rate)
    dq_acc = None
    for jj in range(jdim):
        k = k_ref[jj]
        v = v_ref[jj]
        if kv_t:
            p, l = _short_recompute_t(q, k, scale)
        else:
            p, l = _short_recompute(q, k, scale)
        if rate > 0.0:
            seed_j = seed_ref[0] + np.int32(jj + 1) * _STREAM_SEED_STRIDE
            keep = _short_keep_mask(seed_j, i, g, (g, t, t), rate, interpret)
            w = jnp.where(keep, p, 0.0) * (inv / l)
        else:
            w = p / l
        w = w.astype(v.dtype)
        # dp_raw = do v^T, UNMASKED. kv_t: v is (g, hs, t_k), contract hs —
        # the MXU-native NN form; untransposed contracts the two minor dims.
        dp_dims = (((2,), (1,)), ((0,), (0,))) if kv_t else (((2,), (2,)), ((0,), (0,)))
        dp_raw = jax.lax.dot_general(
            do, v, dimension_numbers=dp_dims,
            preferred_element_type=jnp.float32,
        )
        # D = rowsum(do ∘ o_j) without recomputing o_j: since o_j = w v,
        # rowsum_e(do ∘ (w v)) = rowsum_k(w ∘ (do v^T)) = rowsum(w ∘ dp_raw)
        # — saves a whole (t, t, hs) dot per stream (the fused forward never
        # materializes per-stream outputs, so o_j used to be recomputed).
        d_cap = jnp.sum(
            w.astype(jnp.float32) * dp_raw, axis=-1, keepdims=True
        )
        dp = jnp.where(keep, dp_raw, 0.0) * inv if rate > 0.0 else dp_raw
        ds = ((p / l) * (dp - d_cap)).astype(v.dtype)
        if kv_t:
            # dq = scale * ds k with kT resident: contract t_k on both (NT)
            dq = scale * jax.lax.dot_general(
                ds, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            # transposed grads written DIRECTLY — operand order swapped in
            # the same TN dots, no in-VMEM transpose of the results
            dk = scale * jax.lax.dot_general(  # (g, hs, t_k) = (ds^T q)^T
                q, ds, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dv = jax.lax.dot_general(  # (g, hs, t_k) = (w^T do)^T
                do, w, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        else:
            dq = scale * jax.lax.dot_general(
                ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dk = scale * jax.lax.dot_general(
                ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dv = jax.lax.dot_general(  # (g, t_k, hs) = w^T do
                w, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        dq_acc = dq if dq_acc is None else dq_acc + dq
        dk_ref[jj] = dk.astype(dk_ref.dtype)
        dv_ref[jj] = dv.astype(dv_ref.dtype)
    dq_ref[...] = dq_acc.astype(dq_ref.dtype)


def _short_cross_pick_g(n: int, jdim: int, t: int, hs: int,
                        itemsize: int = 2) -> int:
    """Like _short_pick_g with J resident KV streams per program (same
    itemsize scaling — the f32 cross backward at the bf16-tuned g was the
    observed scoped-VMEM overflow)."""
    budget = 8 * 1024 * 1024
    per_row = ((4 + 4 * jdim) * t * hs + 5 * t * t) * itemsize * 2
    for g in (64, 32, 16, 8, 4, 2, 1):
        if n % g == 0 and g * per_row <= budget:
            return g
    return 1


def _short_cross_fwd_call(q, k, v, seed, g, rate, interpret, kv_t=False):
    if kv_t:
        jdim, n, hs, t = k.shape
    else:
        jdim, n, t, hs = k.shape
    kernel = functools.partial(
        _short_cross_fwd_kernel, g=g, scale=hs ** -0.5, rate=rate,
        interpret=interpret, kv_t=kv_t,
    )
    qspec = pl.BlockSpec((g, t, hs), lambda i: (i, 0, 0))
    kvblk = (jdim, g, hs, t) if kv_t else (jdim, g, t, hs)
    kvspec = pl.BlockSpec(kvblk, lambda i: (0, i, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(n // g,),
        in_specs=[qspec, kvspec, kvspec, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=qspec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=jdim * 2 * 2 * n * t * t * hs // 2,
            bytes_accessed=(2 * jdim + 2) * n * t * hs * 4,
            transcendentals=jdim * n * t * t // 2,
        ),
    )(q, k, v, seed)


def _short_cross_bwd_call(q, k, v, do, seed, g, rate, interpret, kv_t=False):
    if kv_t:
        jdim, n, hs, t = k.shape
    else:
        jdim, n, t, hs = k.shape
    kernel = functools.partial(
        _short_cross_bwd_kernel, g=g, scale=hs ** -0.5, rate=rate,
        interpret=interpret, kv_t=kv_t,
    )
    qspec = pl.BlockSpec((g, t, hs), lambda i: (i, 0, 0))
    kvblk = (jdim, g, hs, t) if kv_t else (jdim, g, t, hs)
    kvspec = pl.BlockSpec(kvblk, lambda i: (0, i, 0, 0))
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(n // g,),
        in_specs=[qspec, kvspec, kvspec, qspec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(qspec, kvspec, kvspec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=jdim * 6 * 2 * n * t * t * hs // 2,
            bytes_accessed=(3 * jdim + 5) * n * t * hs * 4,
            transcendentals=jdim * n * t * t // 2,
        ),
    )(q, k, v, do, seed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _short_cross3(q, k, v, seed, g, rate, interpret):
    return _short_cross_fwd_call(q, k, v, seed, g, rate, interpret)


def _short_cross3_fwd(q, k, v, seed, g, rate, interpret):
    out = _short_cross_fwd_call(q, k, v, seed, g, rate, interpret)
    return out, (q, k, v, seed)


def _short_cross3_bwd(g, rate, interpret, res, grad):
    q, k, v, seed = res
    dq, dk, dv = _short_cross_bwd_call(q, k, v, grad, seed, g, rate, interpret)
    return dq, dk, dv, None


_short_cross3.defvjp(_short_cross3_fwd, _short_cross3_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _short_cross3_t(q, kT, vT, seed, g, rate, interpret):
    return _short_cross_fwd_call(q, kT, vT, seed, g, rate, interpret, kv_t=True)


def _short_cross3_t_fwd(q, kT, vT, seed, g, rate, interpret):
    out = _short_cross_fwd_call(q, kT, vT, seed, g, rate, interpret, kv_t=True)
    return out, (q, kT, vT, seed)


def _short_cross3_t_bwd(g, rate, interpret, res, grad):
    q, kT, vT, seed = res
    dq, dkT, dvT = _short_cross_bwd_call(
        q, kT, vT, grad, seed, g, rate, interpret, kv_t=True
    )
    return dq, dkT, dvT, None


_short_cross3_t.defvjp(_short_cross3_t_fwd, _short_cross3_t_bwd)


# ------------------------------------- fused QKV-projection + attention kernel
#
# The production step at short T is dominated not by FLOPs but by the HBM
# round-trips and layout copies BETWEEN the factored q/k/v projections and
# the attention core (measured: the projection einsums + tanh + packing
# copies around the packed short kernel cost ~0.7 ms/step on top of the
# kernel itself). This kernel computes the ENTIRE self-attention core per
# (modality, batch-block) program:
#
#   t   = tanh(x @ w1 + b1)            # (gb·T, 3D), contraction C — MXU-deep
#   qkv = t @ w2 per virtual head      # (3H, gb·T, hs)
#   o   = causal-softmax attention     # whole-row, closed-form (short T)
#
# x is read once, o written once; t and qkv exist only in VMEM. The backward
# is ONE program per (m, ib) producing dx plus dw1/db1/dw2, with the weight
# gradients ACCUMULATED across the batch grid dimension (ib innermost;
# output blocks revisited: initialize at ib == 0, add after) — so the weight
# grads arrive f32-reduced without any XLA-side tree of partial sums.
#
# Reference semantics: factored tanh projections model.py:36-50, attention
# model.py:60-73. Numerics: f32 matmul accumulation, f32 tanh/softmax;
# operands feed the MXU in their native dtype.


def _fqkv_project(x2, w1, b1, w2, gb: int, t: int, H: int):
    """Shared fwd/bwd recompute: x2 (gb·T, C) -> t2 (f32 tanh output for the
    bwd), t3 (head-major factored activations), qkv (3H, gb·T, hs).

    Weights arrive in their STORAGE dtype (f32 master params) and cast to
    the compute dtype in VMEM — so the custom VJP can return f32 weight
    gradients (cotangent dtype must match the primal) while the MXU still
    sees fast bf16 operands.

    The head-major relayout runs as 2D transpose + LEADING split + batched
    transpose: Mosaic rejects a direct minor-dim split ((gb·T, 3D) ->
    (gb·T, 3H, hs2) is an "unsupported shape cast" in infer-vector-layout),
    but full 2D transposes, leading-dim splits, and batched last-two-dim
    transposes all lower and cost ~nothing (probed on v5e). A
    block-diagonalized single deep matmul was also probed and measured
    SLOWER than the 3H-way batched dot inside Mosaic (fwd 180 vs 109 us at
    the production shape) — the zero-block FLOPs don't pay for themselves."""
    w1 = w1.astype(x2.dtype)
    w2 = w2.astype(x2.dtype)
    pre = jax.lax.dot_general(
        x2, w1, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1.astype(jnp.float32)[None, :]
    t2 = jnp.tanh(pre)                                   # (gb·T, 3D) f32
    t2c = t2.astype(x2.dtype)
    hs2 = w2.shape[1]
    t3 = jnp.transpose(
        t2c.T.reshape(3 * H, hs2, gb * t), (0, 2, 1)
    )                                                    # (3H, gb·T, hs2)
    qkv = jax.lax.dot_general(
        t3, w2, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(x2.dtype)                                   # (3H, gb·T, hs)
    return t2, t3, qkv


def _fqkv_split(qkv, gb: int, t: int, H: int):
    hs = qkv.shape[-1]
    q5 = qkv.reshape(3, H * gb, t, hs)
    return q5[0], q5[1], q5[2]


def _fqkv_fwd_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, seed_ref, o_ref,
    *, gb: int, H: int, scale: float, rate: float, interpret: bool,
):
    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    x = x_ref[0]                                   # (gb, T, C)
    t = x.shape[1]
    x2 = x.reshape(gb * t, x.shape[2])
    _, _, qkv = _fqkv_project(x2, w1_ref[0], b1_ref[0, 0], w2_ref[0], gb, t, H)
    q, k, v = _fqkv_split(qkv, gb, t, H)           # (H·gb, t, hs) each
    g = gb * H
    p, l = _short_recompute(q, k, scale)
    if rate > 0.0:
        keep = _short_keep_mask(seed_ref[0], pid, g, (g, t, t), rate, interpret)
        p = jnp.where(keep, p, 0.0)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    hs = v.shape[-1]
    o_ref[0] = (o / (l * (1.0 - rate))).astype(o_ref.dtype).reshape(
        H, gb, t, hs
    )


def _fqkv_bwd_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, o_ref, do_ref, seed_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref,
    *, gb: int, H: int, scale: float, rate: float, interpret: bool,
):
    ib = pl.program_id(1)
    pid = pl.program_id(0) * pl.num_programs(1) + ib
    x = x_ref[0]
    t = x.shape[1]
    c = x.shape[2]
    x2 = x.reshape(gb * t, c)
    w1 = w1_ref[0]
    w2 = w2_ref[0]
    t2, t3, qkv = _fqkv_project(x2, w1, b1_ref[0, 0], w2, gb, t, H)
    q, k, v = _fqkv_split(qkv, gb, t, H)
    hs = v.shape[-1]
    g = gb * H
    o = o_ref[0].reshape(g, t, hs)
    do = do_ref[0].reshape(g, t, hs)

    # ------- attention backward (same math as _short_bwd_kernel)
    inv = 1.0 / (1.0 - rate)
    p, l = _short_recompute(q, k, scale)
    if rate > 0.0:
        keep = _short_keep_mask(seed_ref[0], pid, g, (g, t, t), rate, interpret)
        w = jnp.where(keep, p, 0.0) * (inv / l)
    else:
        w = p / l
    w = w.astype(v.dtype)
    dv = jax.lax.dot_general(
        w, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        dp = jnp.where(keep, dp, 0.0) * inv
    d_cap = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )
    ds = ((p / l) * (dp - d_cap)).astype(v.dtype)
    dq = scale * jax.lax.dot_general(
        ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk = scale * jax.lax.dot_general(
        ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dqkv = jnp.concatenate(
        [dq[None], dk[None], dv[None]], axis=0
    ).astype(x.dtype).reshape(3 * H, gb * t, hs)

    # ------- projection backward (weights cast to compute dtype in VMEM)
    w1 = w1.astype(x.dtype)
    w2 = w2.astype(x.dtype)
    dt3 = jax.lax.dot_general(  # (3H, gb·T, hs2) = dqkv @ w2^T per head
        dqkv, w2, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dw2 = jax.lax.dot_general(  # (3H, hs2, hs) = t3^T dqkv per head
        t3, dqkv, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    hs2 = w2.shape[1]
    # inverse of the forward's head-major relayout (see _fqkv_project)
    dt2 = (
        jnp.transpose(dt3.astype(x.dtype), (0, 2, 1))
        .reshape(3 * H * hs2, gb * t).T
    )
    dpre = dt2.astype(jnp.float32) * (1.0 - t2 * t2)  # f32 (gb·T, 3D)
    db1 = jnp.sum(dpre, axis=0)                   # (3D,)
    dprec = dpre.astype(x.dtype)
    dx2 = jax.lax.dot_general(                    # (gb·T, C)
        dprec, w1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dw1 = jax.lax.dot_general(                    # (C, 3D)
        x2, dprec, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ref[0] = dx2.astype(dx_ref.dtype).reshape(gb, t, c)

    @pl.when(ib == 0)
    def _():
        dw1_ref[0] = dw1
        db1_ref[0, 0] = db1
        dw2_ref[0] = dw2

    @pl.when(ib > 0)
    def _():
        dw1_ref[0] = dw1_ref[0] + dw1
        db1_ref[0, 0] = db1_ref[0, 0] + db1
        dw2_ref[0] = dw2_ref[0] + dw2


def _fqkv_pick_gb(nb: int, H: int, t: int, hs: int, c: int,
                  itemsize: int = 2) -> int:
    """Largest divisor of B within a VMEM estimate: attention intermediates
    (like the packed kernel) plus the projection activations. Calibrated
    on the bf16 production path (itemsize 2 reproduces that sizing); f32
    operands double the estimate and halve gb (the observed f32 backward
    scoped-VMEM footprint is ~2x bf16's)."""
    budget = 7 * 1024 * 1024
    att_row = (10 * t * hs + 5 * t * t) * 2 * itemsize * H
    proj_row = t * (c + 3 * H * (hs // 2) * 3) * 2 * itemsize
    for gb in (32, 16, 8, 4, 2, 1):
        if nb % gb == 0 and gb * (att_row + proj_row) <= budget:
            return gb
    return 1


def _fqkv_fwd_call(x, w1, b1, w2, seed, gb, H, rate, interpret):
    M, B, t, c = x.shape
    hs = w2.shape[-1]
    kernel = functools.partial(
        _fqkv_fwd_kernel, gb=gb, H=H, scale=hs ** -0.5, rate=rate,
        interpret=interpret,
    )
    d3 = w1.shape[-1]
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, H, B, t, hs), x.dtype),
        grid=(M, B // gb),
        in_specs=[
            pl.BlockSpec((1, gb, t, c), lambda m, ib: (m, ib, 0, 0)),
            pl.BlockSpec((1, c, d3), lambda m, ib: (m, 0, 0)),
            pl.BlockSpec((1, 1, d3), lambda m, ib: (m, 0, 0)),
            pl.BlockSpec(
                (1, 3 * H, w2.shape[-2], hs), lambda m, ib: (m, 0, 0, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, gb, t, hs), lambda m, ib: (m, 0, ib, 0, 0)
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * M * B * t * (
                c * d3 + 3 * H * (w2.shape[-2] * hs) + H * t * hs
            ),
            bytes_accessed=2 * M * B * t * (c + H * hs) * 2,
            transcendentals=M * B * t * (d3 + H * t // 2),
        ),
    )(x, w1, b1[:, None, :], w2, seed)


def _fqkv_bwd_call(x, w1, b1, w2, o, do, seed, gb, H, rate, interpret):
    M, B, t, c = x.shape
    hs = w2.shape[-1]
    d3 = w1.shape[-1]
    kernel = functools.partial(
        _fqkv_bwd_kernel, gb=gb, H=H, scale=hs ** -0.5, rate=rate,
        interpret=interpret,
    )
    ospec = pl.BlockSpec((1, H, gb, t, hs), lambda m, ib: (m, 0, ib, 0, 0))
    dx, dw1, db1, dw2 = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((M, 1, d3), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
        ),
        grid=(M, B // gb),
        in_specs=[
            pl.BlockSpec((1, gb, t, c), lambda m, ib: (m, ib, 0, 0)),
            pl.BlockSpec((1, c, d3), lambda m, ib: (m, 0, 0)),
            pl.BlockSpec((1, 1, d3), lambda m, ib: (m, 0, 0)),
            pl.BlockSpec((1, 3 * H, w2.shape[-2], hs), lambda m, ib: (m, 0, 0, 0)),
            ospec,
            ospec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, gb, t, c), lambda m, ib: (m, ib, 0, 0)),
            pl.BlockSpec((1, c, d3), lambda m, ib: (m, 0, 0)),
            pl.BlockSpec((1, 1, d3), lambda m, ib: (m, 0, 0)),
            pl.BlockSpec((1, 3 * H, w2.shape[-2], hs), lambda m, ib: (m, 0, 0, 0)),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * M * B * t * (
                c * d3 + 3 * H * (w2.shape[-2] * hs) + H * t * hs
            ),
            bytes_accessed=4 * M * B * t * (c + H * hs) * 2,
            transcendentals=M * B * t * (d3 + H * t // 2),
        ),
    )(x, w1, b1[:, None, :], w2, o, do, seed)
    return dx, dw1, db1[:, 0, :], dw2


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _fqkv(x, w1, b1, w2, seed, gb, H, rate, interpret):
    return _fqkv_fwd_call(x, w1, b1, w2, seed, gb, H, rate, interpret)


def _fqkv_fwd(x, w1, b1, w2, seed, gb, H, rate, interpret):
    out = _fqkv_fwd_call(x, w1, b1, w2, seed, gb, H, rate, interpret)
    return out, (x, w1, b1, w2, out, seed)


def _fqkv_bwd(gb, H, rate, interpret, res, grad):
    x, w1, b1, w2, out, seed = res
    dx, dw1, db1, dw2 = _fqkv_bwd_call(
        x, w1, b1, w2, out, grad, seed, gb, H, rate, interpret
    )
    return (
        dx,
        dw1.astype(w1.dtype),
        db1.astype(b1.dtype),
        dw2.astype(w2.dtype),
        None,
    )


_fqkv.defvjp(_fqkv_fwd, _fqkv_bwd)


def fused_qkv_attention(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    n_head: int,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Factored QKV projection + whole-row causal attention, ONE kernel.

    x: (M, B, T, C) normalized input; w1: (M, C, 3D) with D = H·hs/2;
    b1: (M, 3D); w2: (M, 3H, hs/2, hs) (q/k/v head groups concatenated).
    Returns (M, H, B, T, hs) — head-major so the output projection contracts
    without a layout copy. Differentiable wrt (x, w1, b1, w2); weight
    gradients accumulate f32 in-kernel across the batch grid."""
    M, B, t, c = x.shape
    hs = w2.shape[-1]
    gb = _fqkv_pick_gb(B, n_head, t, hs, c, x.dtype.itemsize)
    rate = float(dropout_rate)
    if rate > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 requires dropout_key")
        seed = seed_from_key(dropout_key)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return _fqkv(x, w1, b1, w2, seed, gb, n_head, rate, interpret)


def fused_qkv_eligible(t: int, hs: int) -> bool:
    """Same short-T band as the packed kernel; hs even (factored hs/2)."""
    return (
        SHORT_MIN_SEQ_LEN <= t <= SHORT_MAX_SEQ_LEN
        and t % 8 == 0
        and hs <= 256
        and hs % 2 == 0
    )


# ------------------------------------------------ packed-QKV short self kernel
#
# The model's fused QKV projection naturally produces one (M, B, 3H, T, hs)
# tensor (q heads, then k heads, then v heads along one axis). Feeding the
# short kernel that tensor DIRECTLY — one kernel operand, split in VMEM —
# removes the stacked-axis einsum layout copies and the three separate
# HBM operands of the q/k/v form (measured: the 6D stacked-w2 einsum + its
# backward cost ~0.7 ms/step of the production config's 12 ms). The
# backward writes d(qkv) packed, feeding the projection's backward with no
# re-stacking.


def _short_packed_fwd_kernel(
    qkv_ref, seed_ref, o_ref,
    *, gb: int, H: int, scale: float, rate: float, interpret: bool,
):
    pid = pl.program_id(0)
    qkv = qkv_ref[...]  # (gb, 3H, t, hs)
    t, hs = qkv.shape[2], qkv.shape[3]
    g = gb * H
    q = qkv[:, :H].reshape(g, t, hs)
    k = qkv[:, H:2 * H].reshape(g, t, hs)
    v = qkv[:, 2 * H:].reshape(g, t, hs)
    p, l = _short_recompute(q, k, scale)
    if rate > 0.0:
        keep = _short_keep_mask(seed_ref[0], pid, g, (g, t, t), rate, interpret)
        p = jnp.where(keep, p, 0.0)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = (o / (l * (1.0 - rate))).astype(o_ref.dtype).reshape(
        gb, H, t, hs
    )


def _short_packed_bwd_kernel(
    qkv_ref, o_ref, do_ref, seed_ref, dqkv_ref,
    *, gb: int, H: int, scale: float, rate: float, interpret: bool,
):
    """d(qkv) packed in ONE program — same math as _short_bwd_kernel."""
    pid = pl.program_id(0)
    qkv = qkv_ref[...]
    t, hs = qkv.shape[2], qkv.shape[3]
    g = gb * H
    q = qkv[:, :H].reshape(g, t, hs)
    k = qkv[:, H:2 * H].reshape(g, t, hs)
    v = qkv[:, 2 * H:].reshape(g, t, hs)
    o = o_ref[...].reshape(g, t, hs)
    do = do_ref[...].reshape(g, t, hs)
    inv = 1.0 / (1.0 - rate)
    p, l = _short_recompute(q, k, scale)
    if rate > 0.0:
        keep = _short_keep_mask(seed_ref[0], pid, g, (g, t, t), rate, interpret)
        w = jnp.where(keep, p, 0.0) * (inv / l)
    else:
        w = p / l
    w = w.astype(v.dtype)
    dv = jax.lax.dot_general(
        w, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        dp = jnp.where(keep, dp, 0.0) * inv
    d_cap = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )
    ds = ((p / l) * (dp - d_cap)).astype(v.dtype)
    dq = scale * jax.lax.dot_general(
        ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dk = scale * jax.lax.dot_general(
        ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dt = dqkv_ref.dtype
    dqkv_ref[:, :H] = dq.astype(dt).reshape(gb, H, t, hs)
    dqkv_ref[:, H:2 * H] = dk.astype(dt).reshape(gb, H, t, hs)
    dqkv_ref[:, 2 * H:] = dv.astype(dt).reshape(gb, H, t, hs)


def _short_packed_pick_gb(nb: int, H: int, t: int, hs: int,
                          itemsize: int = 2) -> int:
    """Largest divisor of nb (the collapsed M·B axis) within the VMEM budget
    (same accounting as _short_pick_g with g = gb·H, itemsize-scaled)."""
    budget = 8 * 1024 * 1024
    per_row = (8 * t * hs + 4 * t * t) * 2 * itemsize * H
    for gb in (64, 32, 16, 8, 4, 2, 1):
        if nb % gb == 0 and gb * per_row <= budget:
            return gb
    return 1


def _short_packed_fwd_call(qkv, seed, gb, H, rate, interpret):
    nb, h3, t, hs = qkv.shape
    kernel = functools.partial(
        _short_packed_fwd_kernel, gb=gb, H=H, scale=hs ** -0.5, rate=rate,
        interpret=interpret,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb, H, t, hs), qkv.dtype),
        grid=(nb // gb,),
        in_specs=[
            pl.BlockSpec((gb, h3, t, hs), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((gb, H, t, hs), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * nb * H * t * t * hs // 2,
            bytes_accessed=4 * nb * H * t * hs * 4,
            transcendentals=nb * H * t * t // 2,
        ),
    )(qkv, seed)


def _short_packed_bwd_call(qkv, o, do, seed, gb, H, rate, interpret):
    nb, h3, t, hs = qkv.shape
    kernel = functools.partial(
        _short_packed_bwd_kernel, gb=gb, H=H, scale=hs ** -0.5, rate=rate,
        interpret=interpret,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
        grid=(nb // gb,),
        in_specs=[
            pl.BlockSpec((gb, h3, t, hs), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((gb, H, t, hs), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((gb, H, t, hs), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((gb, h3, t, hs), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * nb * H * t * t * hs // 2,
            bytes_accessed=8 * nb * H * t * hs * 4,
            transcendentals=nb * H * t * t // 2,
        ),
    )(qkv, o, do, seed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _short_packed(qkv, seed, gb, H, rate, interpret):
    return _short_packed_fwd_call(qkv, seed, gb, H, rate, interpret)


def _short_packed_fwd(qkv, seed, gb, H, rate, interpret):
    out = _short_packed_fwd_call(qkv, seed, gb, H, rate, interpret)
    return out, (qkv, out, seed)


def _short_packed_bwd(gb, H, rate, interpret, res, grad):
    qkv, out, seed = res
    dqkv = _short_packed_bwd_call(qkv, out, grad, seed, gb, H, rate, interpret)
    return dqkv, None


_short_packed.defvjp(_short_packed_fwd, _short_packed_bwd)


def short_packed_eligible(t: int, hs: int) -> bool:
    """Shape-only eligibility for the packed short self kernel."""
    return SHORT_MIN_SEQ_LEN <= t <= SHORT_MAX_SEQ_LEN and t % 8 == 0 and hs <= 256


def short_causal_attention_packed(
    qkv: jax.Array,
    n_head: int,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Whole-row fused causal self-attention over a PACKED qkv tensor.

    qkv: (..., 3H, T, hs) with q/k/v head groups along the packed axis (the
    fused projection's natural output). Returns (..., H, T, hs). One kernel
    operand forward, one packed gradient backward."""
    lead = qkv.shape[:-3]
    h3, t, hs = qkv.shape[-3], qkv.shape[-2], qkv.shape[-1]
    H = n_head
    assert h3 == 3 * H, (h3, H)
    nb = 1
    for d in lead:
        nb *= d
    gb = _short_packed_pick_gb(nb, H, t, hs, qkv.dtype.itemsize)
    rate = float(dropout_rate)
    if rate > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 requires dropout_key")
        seed = seed_from_key(dropout_key)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    qkv4 = qkv.reshape(nb, h3, t, hs)
    out = _short_packed(qkv4, seed, gb, H, rate, interpret)
    return out.reshape(*lead, H, t, hs)


def short_cross_eligible(q: jax.Array, k: jax.Array, v: jax.Array) -> bool:
    """Cross layout (k/v carry a leading stream axis) in the short-T band."""
    if k.shape != v.shape or k.ndim != q.ndim + 1 or k.shape[1:] != q.shape:
        return False
    if q.ndim < 2:
        return False
    t, hs = q.shape[-2], q.shape[-1]
    if t < SHORT_MIN_SEQ_LEN or t > SHORT_MAX_SEQ_LEN or t % 8 != 0:
        return False
    return hs <= 256


def short_cross_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Sum over J KV streams of short fused causal attention — ONE kernel.

    Each program holds its row block's q and ALL J KV streams in VMEM and
    computes the full stream sum with a trace-time loop: one op forward,
    one backward (dq + every dk_j/dv_j). The J-sequential-calls formulation
    measured ~1.4 ms/step of the production config's 12 ms (per-call
    dispatch, J separate (n,t,hs) intermediates, the add chain); a
    grid-axis-j variant with output revisiting still paid per-(i,j)
    program overhead and output flushes. Per-stream seeds follow the
    flash-cross convention (seed + (j+1)*_STREAM_SEED_STRIDE), keyed per
    program exactly like the standalone short kernel, so masks match the
    unfused formulation bit-for-bit."""
    rate = float(dropout_rate)
    if rate > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 requires dropout_key")
        seed = seed_from_key(dropout_key)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    lead = q.shape[:-2]
    t, hs = q.shape[-2], q.shape[-1]
    n = 1
    for d in lead:
        n *= d
    jdim = k.shape[0]
    g = _short_cross_pick_g(n, jdim, t, hs, q.dtype.itemsize)
    q3 = q.reshape(n, t, hs)
    k4 = k.reshape(jdim, n, t, hs)
    v4 = v.reshape(jdim, n, t, hs)
    out = _short_cross3(q3, k4, v4, seed, g, rate, interpret)
    return out.reshape(*lead, t, hs)


def short_cross_t_eligible(t: int, hs: int) -> bool:
    """Shape-only eligibility for the transposed-KV short cross kernel —
    callable at model trace time BEFORE the projections are emitted (the
    point of the transposed contract is to change what the model emits)."""
    if t < SHORT_MIN_SEQ_LEN or t > SHORT_MAX_SEQ_LEN or t % 8 != 0:
        return False
    return hs % 8 == 0 and hs <= 256


def short_cross_attention_t(
    q: jax.Array,
    kT: jax.Array,
    vT: jax.Array,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """``short_cross_attention`` with k/v accepted TRANSPOSED: (J, ..., hs, T).

    The model's KV-projection einsum naturally produces its output with the
    sequence axis minor (XLA layout {3,4,1,2,0} on the (J,B,H,T,hs) logical
    shape); the standard-layout contract of the untransposed kernel forces a
    physical relayout copy per k/v tensor per layer. Accepting the logical
    transpose makes the einsum's natural layout THE kernel input layout, and
    the backward symmetrically hands the einsum's grad the layout it wants.
    In-kernel, blocks relayout with a batched last-two-dim transpose (~free
    on Mosaic — see TECHNICAL_NOTES "Mosaic layout rules").

    Same dropout keying as ``short_cross_attention`` per (program, stream);
    with identical row collapse order the two are bit-identical."""
    rate = float(dropout_rate)
    if rate > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 requires dropout_key")
        seed = seed_from_key(dropout_key)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    lead = q.shape[:-2]
    t, hs = q.shape[-2], q.shape[-1]
    if kT.shape != vT.shape or kT.shape[1:] != (*lead, hs, t):
        raise ValueError(f"transposed kv shape mismatch: {kT.shape} vs q {q.shape}")
    n = 1
    for d in lead:
        n *= d
    jdim = kT.shape[0]
    g = _short_cross_pick_g(n, jdim, t, hs, q.dtype.itemsize)
    q3 = q.reshape(n, t, hs)
    k4 = kT.reshape(jdim, n, hs, t)
    v4 = vT.reshape(jdim, n, hs, t)
    out = _short_cross3_t(q3, k4, v4, seed, g, rate, interpret)
    return out.reshape(*lead, t, hs)


# --------------------------------------------------------- decode (serving)
#
# KV-cached decode is one query position against an (S, hs) cache row with
# a visibility band col <= pos. The dense expression costs ~10 XLA regions
# per layer per generated token — dispatch-bound inside the serving scan.
# This kernel fuses score/mask/softmax/PV into ONE op, G collapsed rows per
# program. Forward-only (inference path, never differentiated); numerics
# mirror models/cache._attn_cached (f32 scores+softmax, probabilities cast
# to the activation dtype before PV, f32 accumulation).


def _decode_kernel(q_ref, k_ref, v_ref, pos_ref, o_ref, *, g: int, scale: float):
    # the t=1 query axis stays: Mosaic's dot_general needs a non-contracting
    # lhs dim alongside the batch dim. K is NOT upcast to f32 here — the dot
    # accumulates in f32 via preferred_element_type, which matches the dense
    # cached path's arithmetic under TPU default matmul precision while
    # avoiding a (g, S, hs) f32 copy in VMEM (at S=1024/g=16 that copy alone
    # is 4 MB and pushed the program over the 16 MB scoped-VMEM limit).
    q = q_ref[...]                       # (g, 1, hs)
    k = k_ref[...]                       # (g, S, hs)
    s_len = k.shape[1]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32) * scale        # (g, 1, S)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, 1, s_len), 2)
    s = jnp.where(cols <= pos_ref[0], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
    out = jax.lax.dot_general(
        w, v_ref[...], dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                    # (g, 1, hs)
    o_ref[...] = out.astype(o_ref.dtype)


def decode_attention_eligible(q: jax.Array, k: jax.Array) -> bool:
    """One new query position against a cache row: q (..., 1, hs),
    k (..., S, hs) with matching leading dims (broadcast them first)."""
    if q.ndim != k.ndim or q.ndim < 3 or q.shape[-2] != 1:
        return False
    if q.shape[:-2] != k.shape[:-2] or q.shape[-1] != k.shape[-1]:
        return False
    return q.shape[-1] <= 256 and k.shape[-2] % 8 == 0


def decode_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, pos, interpret: bool = False
) -> jax.Array:
    """Fused single-position cached-decode attention.

    q: (..., 1, hs); k, v: (..., S, hs); cache column j visible iff
    j <= pos (a traced scalar). Returns (..., 1, hs) in q.dtype."""
    lead = q.shape[:-2]
    hs = q.shape[-1]
    s_len = k.shape[-2]
    n = 1
    for d in lead:
        n *= d
    q3 = q.reshape(n, 1, hs)
    k3 = k.reshape(n, s_len, hs)
    v3 = v.reshape(n, s_len, hs)
    # g rows per program, bounded by the K+V VMEM footprint. The K and V
    # blocks are DOUBLE-BUFFERED by the pipeline (x2), and the softmax
    # intermediates (scores/iota/probabilities, f32) add ~16*S bytes/row;
    # budget against the 16 MB scoped-VMEM limit with ~50% headroom for
    # compiler scratch (an earlier 6 MB single-buffer budget compiled to a
    # 16.03 MB scoped allocation at S=1024/bf16/g=16 and was rejected).
    budget = 8 * 1024 * 1024
    per_row = 2 * 2 * s_len * hs * k3.dtype.itemsize + 16 * s_len
    g = 1
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if n % cand == 0 and cand * per_row <= budget:
            g = cand
            break
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    kernel = functools.partial(_decode_kernel, g=g, scale=hs ** -0.5)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1, hs), q.dtype),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, 1, hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, s_len, hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, s_len, hs), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((g, 1, hs), lambda i: (i, 0, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * s_len * hs,
            bytes_accessed=2 * n * s_len * hs * k3.dtype.itemsize,
            transcendentals=n * s_len,
        ),
    )(q3, k3, v3, pos_arr)
    return out.reshape(*lead, 1, hs)


# ------------------------------------------------- decode, transposed cache
#
# The straight decode kernel reads (..., S, hs) cache blocks. With hs = 64
# and bf16, the TPU's (8, 128) tiled layout pads the 64-lane minor dim to
# 128 — every cache byte fetched twice. That padding is exactly the
# measured 2.4x gap to the fetch floor (300 us/layer vs 123 us at S=1024,
# TECHNICAL_NOTES "Serving roofline"). Storing the cache TRANSPOSED as
# (..., hs, S) puts the long S axis on the lanes (S >= 128, no padding):
# the same fetch moves half the bytes and the kernel runs at the true
# floor. The score dot contracts hs as sublanes, the PV product contracts
# S as lanes — both Mosaic-native forms.


def _decode_t_kernel(q_ref, k_ref, v_ref, pos_ref, o_ref, *, g: int, scale: float):
    q = q_ref[...]                       # (g, 1, hs)
    kt = k_ref[...]                      # (g, hs, S)
    s_len = kt.shape[2]
    s = jax.lax.dot_general(
        q, kt, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(jnp.float32) * scale        # (g, 1, S)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, 1, s_len), 2)
    s = jnp.where(cols <= pos_ref[0], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    w = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v_ref.dtype)
    out = jax.lax.dot_general(
        w, v_ref[...], dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                    # (g, 1, hs)
    o_ref[...] = out.astype(o_ref.dtype)


def decode_attention_t_eligible(q: jax.Array, kt: jax.Array) -> bool:
    """One new query position against a TRANSPOSED cache row: q (..., 1, hs),
    kt (..., hs, S) with matching leading dims. S must fill whole lane tiles
    (multiple of 128) for the layout to pay."""
    if q.ndim != kt.ndim or q.ndim < 3 or q.shape[-2] != 1:
        return False
    if q.shape[:-2] != kt.shape[:-2] or q.shape[-1] != kt.shape[-2]:
        return False
    return q.shape[-1] <= 256 and kt.shape[-1] % 128 == 0


def decode_attention_t(
    q: jax.Array, kt: jax.Array, vt: jax.Array, pos, interpret: bool = False
) -> jax.Array:
    """Fused single-position cached-decode attention over transposed caches.

    q: (..., 1, hs); kt, vt: (..., hs, S); cache column j visible iff
    j <= pos (a traced scalar). Returns (..., 1, hs) in q.dtype. Numerics
    identical to ``decode_attention`` (f32 scores/softmax, probabilities in
    the cache dtype for PV, f32 accumulation)."""
    lead = q.shape[:-2]
    hs = q.shape[-1]
    s_len = kt.shape[-1]
    n = 1
    for d in lead:
        n *= d
    q3 = q.reshape(n, 1, hs)
    k3 = kt.reshape(n, hs, s_len)
    v3 = vt.reshape(n, hs, s_len)
    # K/V blocks double-buffered (x2); f32 softmax intermediates ~16*S/row.
    # Unlike the (S, hs) form, (hs, S) blocks occupy exactly their logical
    # bytes in VMEM (no lane padding), so the same budget admits 2x the g.
    budget = 8 * 1024 * 1024
    per_row = 2 * 2 * s_len * hs * k3.dtype.itemsize + 16 * s_len
    g = 1
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if n % cand == 0 and cand * per_row <= budget:
            g = cand
            break
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    kernel = functools.partial(_decode_t_kernel, g=g, scale=hs ** -0.5)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1, hs), q.dtype),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, 1, hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, hs, s_len), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, hs, s_len), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((g, 1, hs), lambda i: (i, 0, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * s_len * hs,
            bytes_accessed=2 * n * s_len * hs * k3.dtype.itemsize,
            transcendentals=n * s_len,
        ),
    )(q3, k3, v3, pos_arr)
    return out.reshape(*lead, 1, hs)


# --------------------------------------------------- decode, PACKED cache
#
# The production serving layout (models/cache.py): positions pair up along
# the lanes — (..., S/pack, pack*hs) with pack*hs == 128 — so the cache
# reads at its logical bytes (like the transposed form) AND single-position
# appends stay in-place sublane writes (unlike the transposed form, whose
# lane-axis dynamic_update_slice measured a full-buffer rewrite per token:
# 2.27 ms/step of DUS at S=1024/B=16). The kernel slices the packed lane
# axis into its `pack` static sub-blocks, computes each half's masked
# scores, and merges them through one global max/sum — exactly the dense
# softmax over all S positions.


def _decode_p_kernel(
    q_ref, kp_ref, vp_ref, pos_ref, o_ref, *, g: int, pack: int, scale: float
):
    q = q_ref[...]                       # (g, 1, hs)
    kp = kp_ref[...]                     # (g, Sp, pack*hs)
    hs = q.shape[-1]
    sp = kp.shape[1]
    parts = []
    for j in range(pack):
        kj = jax.lax.slice_in_dim(kp, j * hs, (j + 1) * hs, axis=2)
        s = jax.lax.dot_general(
            q, kj, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32) * scale    # (g, 1, Sp)
        cols = jax.lax.broadcasted_iota(jnp.int32, (g, 1, sp), 2) * pack + j
        parts.append(jnp.where(cols <= pos_ref[0], s, _NEG_INF))
    m = parts[0]
    for s in parts[1:]:
        m = jnp.maximum(m, s)
    m = jnp.max(m, axis=-1, keepdims=True)
    l = jnp.zeros_like(m)
    out = None
    vp = vp_ref[...]
    for j, s in enumerate(parts):
        p = jnp.exp(s - m)
        l = l + jnp.sum(p, axis=-1, keepdims=True)
        vj = jax.lax.slice_in_dim(vp, j * hs, (j + 1) * hs, axis=2)
        o = jax.lax.dot_general(
            p.astype(vj.dtype), vj,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                # (g, 1, hs)
        out = o if out is None else out + o
    o_ref[...] = (out / l).astype(o_ref.dtype)


def decode_attention_packed_eligible(q: jax.Array, kp: jax.Array) -> bool:
    """q (..., 1, hs); kp (..., Sp, pack*hs) with pack*hs == 128 (full lane
    tile) and Sp a multiple of 8 (whole sublane tiles)."""
    if q.ndim != kp.ndim or q.ndim < 3 or q.shape[-2] != 1:
        return False
    hs = q.shape[-1]
    if q.shape[:-2] != kp.shape[:-2]:
        return False
    if kp.shape[-1] != 128 or 128 % hs != 0 or hs >= 128:
        return False
    return kp.shape[-2] % 8 == 0


def decode_attention_packed(
    q: jax.Array, kp: jax.Array, vp: jax.Array, pos, interpret: bool = False
) -> jax.Array:
    """Fused single-position cached-decode attention over PACKED caches.

    q: (..., 1, hs); kp, vp: (..., S/pack, pack*hs) where sequence position
    ``i`` lives at row ``i // pack``, lane block ``i % pack``. Cache column
    i is visible iff i <= pos. Returns (..., 1, hs) in q.dtype; numerics
    match the dense masked softmax over all S positions (f32 scores and
    softmax, probabilities cast to the cache dtype for PV, f32
    accumulation)."""
    lead = q.shape[:-2]
    hs = q.shape[-1]
    pack = kp.shape[-1] // hs
    sp = kp.shape[-2]
    n = 1
    for d in lead:
        n *= d
    q3 = q.reshape(n, 1, hs)
    k3 = kp.reshape(n, sp, pack * hs)
    v3 = vp.reshape(n, sp, pack * hs)
    # larger budget -> larger g (fewer grid programs, better DMA overlap).
    # At S=1024/bf16 the per-row estimate (~1.07 MB) keeps g=8 either way
    # (measured flat); the headroom pays at smaller contexts, and the int8
    # twin of this kernel measured +3% from its doubled g.
    budget = 11 * 1024 * 1024
    per_row = 2 * 2 * sp * pack * hs * k3.dtype.itemsize + 16 * sp * pack
    g = 1
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if n % cand == 0 and cand * per_row <= budget:
            g = cand
            break
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    kernel = functools.partial(
        _decode_p_kernel, g=g, pack=pack, scale=hs ** -0.5
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1, hs), q.dtype),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, 1, hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, sp, pack * hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, sp, pack * hs), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((g, 1, hs), lambda i: (i, 0, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * sp * pack * hs,
            bytes_accessed=2 * n * sp * pack * hs * k3.dtype.itemsize,
            transcendentals=n * sp * pack,
        ),
    )(q3, k3, v3, pos_arr)
    return out.reshape(*lead, 1, hs)


# ------------------------------------------- decode, PACKED int8 KV cache
#
# Serving-only quantized cache (models/cache.py kv_dtype='int8'): K/V store
# as int8 with one f32 scale per PACKED ROW (pack positions share a scale —
# the row is rebuilt whole at append time, so both positions quantize
# together). Decode traffic halves, which doubles the HBM-bound serving
# ceiling; the kernel dequantizes in VMEM (upcast + per-row scale) and then
# runs the exact packed-decode math. Opt-in: quantization perturbs scores
# ~0.4% per element, so the exact paths never use it.


def _decode_p8_kernel(
    q_ref, kp_ref, vp_ref, ks_ref, vs_ref, pos_ref, o_ref,
    *, g: int, pack: int, scale: float,
):
    q = q_ref[...]                         # (g, 1, hs)
    inv = 1.0 / 127.0
    # scales stay LANE-MAJOR (g, 1, Sp) — one padded-to-128 lane row per
    # batch row — and fold into the scores / probabilities elementwise
    # (same shape), so the int8 K/V only ever upcast, never re-scale per
    # row. An earlier (g, Sp, 1) layout tile-padded the minor dim 128x and
    # its host-side reshape materialized 25 MB per call (4.3 ms/step).
    ks = ks_ref[...].astype(jnp.float32) * inv   # (g, 1, Sp)
    vs = vs_ref[...].astype(jnp.float32) * inv   # (g, 1, Sp)
    kp = kp_ref[...].astype(q.dtype)             # int8 -> compute dtype
    hs = q.shape[-1]
    sp = kp.shape[1]
    parts = []
    for j in range(pack):
        kj = jax.lax.slice_in_dim(kp, j * hs, (j + 1) * hs, axis=2)
        sj = jax.lax.dot_general(
            q, kj, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.float32) * scale
        sj = sj * ks                                # per-packed-row dequant
        cols = jax.lax.broadcasted_iota(jnp.int32, (g, 1, sp), 2) * pack + j
        parts.append(jnp.where(cols <= pos_ref[0], sj, _NEG_INF))
    m = parts[0]
    for sj in parts[1:]:
        m = jnp.maximum(m, sj)
    m = jnp.max(m, axis=-1, keepdims=True)
    l = jnp.zeros_like(m)
    vp = vp_ref[...].astype(q.dtype)
    out = None
    for j, sj in enumerate(parts):
        p = jnp.exp(sj - m)
        l = l + jnp.sum(p, axis=-1, keepdims=True)
        vj = jax.lax.slice_in_dim(vp, j * hs, (j + 1) * hs, axis=2)
        o = jax.lax.dot_general(
            (p * vs).astype(vj.dtype), vj,          # fold V scale into P
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        out = o if out is None else out + o
    o_ref[...] = (out / l).astype(o_ref.dtype)


def decode_attention_packed_q8(
    q: jax.Array, kp: jax.Array, vp: jax.Array, k_scale, v_scale, pos,
    interpret: bool = False,
) -> jax.Array:
    """Packed decode attention over an int8 cache with per-packed-row f32
    scales. q (..., 1, hs); kp/vp (..., S/pack, pack*hs) int8;
    k_scale/v_scale (..., S/pack). Same contract as
    ``decode_attention_packed`` after dequantization."""
    lead = q.shape[:-2]
    hs = q.shape[-1]
    pack = kp.shape[-1] // hs
    sp = kp.shape[-2]
    n = 1
    for d in lead:
        n *= d
    q3 = q.reshape(n, 1, hs)
    k3 = kp.reshape(n, sp, pack * hs)
    v3 = vp.reshape(n, sp, pack * hs)
    ks3 = k_scale.reshape(n, 1, sp)   # lane-major: Sp on the lanes
    vs3 = v_scale.reshape(n, 1, sp)
    # int8 blocks are small (64 KB per K/V row at Sp=512); a larger budget
    # doubles g (fewer grid programs, better DMA overlap) and still sits
    # well under the 16 MB scoped-VMEM limit after the bf16 dequant copies
    budget = 11 * 1024 * 1024
    # int8 K/V double-buffered + their upcast copies + f32 softmax rows
    per_row = (2 * 2 + 2 * 2) * sp * pack * hs + 24 * sp * pack
    g = 1
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if n % cand == 0 and cand * per_row <= budget:
            g = cand
            break
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    kernel = functools.partial(
        _decode_p8_kernel, g=g, pack=pack, scale=hs ** -0.5
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1, hs), q.dtype),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, 1, hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, sp, pack * hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, sp, pack * hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, 1, sp), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, 1, sp), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((g, 1, hs), lambda i: (i, 0, 0)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * sp * pack * hs,
            bytes_accessed=2 * n * sp * pack * hs,
            transcendentals=n * sp * pack,
        ),
    )(q3, k3, v3, ks3, vs3, pos_arr)
    return out.reshape(*lead, 1, hs)


# ----------------------------------------------------------------- entry points


def flash_attention_eligible(q: jax.Array, k: jax.Array, v: jax.Array) -> bool:
    """Kernel eligibility: self-attention layout (q/k/v same shape), long
    enough sequence to beat the dense core, block-aligned T, lane-friendly
    head size. The cross-attention broadcast layout (q has fewer leading
    dims) goes through ``flash_cross_attention`` instead."""
    if q.shape != k.shape or q.shape != v.shape:
        return False
    if q.ndim < 3:
        return False
    t, hs = q.shape[-2], q.shape[-1]
    if t < MIN_FLASH_SEQ_LEN or t % BLOCK_STEP != 0:
        return False
    if hs > 256:
        return False
    return True


def flash_causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    interpret: bool = False,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Causal flash attention over trailing (T, hs); leading dims collapse.

    Fully differentiable: the custom VJP runs the blockwise dQ and dK/dV
    kernels — nothing of size T² touches HBM in forward or backward.

    With dropout_rate > 0 (and a dropout_key), attention dropout runs
    in-kernel from the TPU's native PRNG: the keep-mask is regenerated
    deterministically per (seed, batch·head, query-block, key-block) in the
    forward and both backward kernels, so — unlike the dense core — no
    (T, T) mask is ever stored. The mask stream differs from the jnp
    dropout's (different PRNG), which only changes which units drop, not the
    distribution."""
    lead = q.shape[:-2]
    t, hs = q.shape[-2], q.shape[-1]
    n = 1
    for d in lead:
        n *= d
    q3 = q.reshape(n, t, hs)
    k3 = k.reshape(n, t, hs)
    v3 = v.reshape(n, t, hs)
    bq = _pick_block(t, DEFAULT_BQ)
    bk = _pick_block(t, DEFAULT_BK)
    rate = float(dropout_rate)
    if rate > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 requires dropout_key")
        seed = seed_from_key(dropout_key)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    out = _flash3(q3, k3, v3, seed, bq, bk, rate, interpret)
    return out.reshape(*lead, t, hs)


# ------------------------------------------------- chunk primitives (ring/CP)
#
# Ring (context-parallel) attention decomposes the full sequence into
# per-device chunks and needs, per (query-chunk, KV-chunk) pair:
#   fwd: (out, lse) with a causal mask (diagonal chunk) or no mask (earlier
#        chunks) — merged at the ring level via the logsumexp identity;
#   bwd: (dq, dk, dv) given the FINAL (post-merge) lse and delta — exact,
#        because P = exp(S − lse_final) decomposes the softmax per chunk.
# These wrappers expose the blockwise kernels above at chunk granularity so
# parallel/ring_attention.py shares the same math (and the same in-kernel
# dropout keying) as single-device flash attention.


def flash_chunk_eligible(q: jax.Array, k: jax.Array) -> bool:
    """Chunk kernel eligibility: block-aligned chunk lengths, lane-friendly
    head size. (The MIN_FLASH_SEQ_LEN heuristic is the caller's concern —
    ring chunks are usually long by construction.)"""
    t_q, hs = q.shape[-2], q.shape[-1]
    t_k = k.shape[-2]
    if t_q % BLOCK_STEP != 0 or t_k % BLOCK_STEP != 0:
        return False
    if hs > 256:
        return False
    return True


def _collapse(x):
    lead = x.shape[:-2]
    n = 1
    for d in lead:
        n *= d
    return x.reshape(n, *x.shape[-2:]), lead


def flash_chunk_fwd(
    q: jax.Array, k: jax.Array, v: jax.Array, causal: bool,
    seed: Optional[jax.Array] = None, rate: float = 0.0,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """One chunk-vs-chunk flash forward. q: (..., t_q, hs); k, v:
    (..., t_k, hs). Returns (out (..., t_q, hs), lse (..., t_q))."""
    q3, lead = _collapse(q)
    k3, _ = _collapse(k)
    v3, _ = _collapse(v)
    bq = _pick_block(q3.shape[1], DEFAULT_BQ)
    bk = _pick_block(k3.shape[1], DEFAULT_BK)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    out, lse = _fwd_dispatch(
        q3, k3, v3, seed, bq, bk, rate, interpret, causal=causal
    )
    return out.reshape(*lead, *q.shape[-2:]), lse[:, 0, :].reshape(*lead, q.shape[-2])


def flash_chunk_bwd(
    q: jax.Array, k: jax.Array, v: jax.Array, out: jax.Array,
    lse: jax.Array, g: jax.Array, causal: bool,
    seed: Optional[jax.Array] = None, rate: float = 0.0,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One chunk-vs-chunk flash backward given the final (post-merge) lse.

    lse: (..., t_q) — typically the RING-MERGED logsumexp, which makes the
    per-chunk gradients decompose exactly. Returns (dq, dk, dv)."""
    q3, lead = _collapse(q)
    k3, _ = _collapse(k)
    v3, _ = _collapse(v)
    out3, _ = _collapse(out)
    g3, _ = _collapse(g)
    lse3 = lse.reshape(q3.shape[0], 1, q3.shape[1])
    bq = _pick_block(q3.shape[1], DEFAULT_BQ)
    bk = _pick_block(k3.shape[1], DEFAULT_BK)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    dq, dk, dv = _bwd_dispatch(
        q3, k3, v3, out3, lse3, g3, seed, bq, bk, rate, interpret,
        causal=causal,
    )
    return (
        dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape)
    )
