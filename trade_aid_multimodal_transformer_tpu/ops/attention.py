"""Causal attention cores.

The model's attention internals are NOT standard GPT attention: Q/K/V come
from small tanh MLPs and the output projection is a tanh MLP
(reference: model.py:30-159, SURVEY Quirk Q6) — those projections live in
models/transformer.py where XLA fuses them into the surrounding matmuls.
This module owns the score/softmax/weighted-sum core:

    aff = q @ k^T * head_size**-0.5 ; causal mask ; softmax ;
    dropout(aff) ; aff @ v                     (reference: model.py:60-73)

Interchangeable implementations:
- ``jnp``: dense reference implementation (the numerical oracle in kernel
  equivalence tests, and the core everywhere off-TPU)
- ``pallas`` (ops/pallas_attention.py), two regimes: the whole-row
  short-context kernel for 8 <= T <= 512 (one fwd op, one dq+dk+dv bwd op)
  and the blockwise flash kernels at longer T that never materialize the
  (T, T) affinity matrix in HBM. Both run attention dropout in-kernel.

Dispatch: ``impl='auto'`` picks a Pallas kernel on TPU when shapes are
kernel-eligible — the short whole-row kernel wherever it applies (it wins
the 256-512 overlap band in-model by 45-58%), the blockwise flash kernels
above it — else jnp.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .layers import dropout as _dropout

# --------------------------------------------------- context-parallel dispatch
#
# When a context-parallel scope is active (opened by the trainer around its
# traced step, config surface: tpu_options.context_parallel), the attention
# cores below route through ring attention (parallel/ring_attention.py):
# the sequence axis shards over the mesh's 'seq' axis and KV chunks rotate
# via ppermute. The scope is trace-time state — entering it inside the traced
# function guarantees every (re)trace sees it.

_CP_SCOPE: Optional[tuple] = None  # (Mesh, axis_name)


@contextlib.contextmanager
def context_parallel_scope(mesh, axis_name: str = "seq"):
    """Route causal/cross attention through ring attention over
    ``mesh[axis_name]`` for the duration of the (trace-time) scope."""
    global _CP_SCOPE
    prev = _CP_SCOPE
    _CP_SCOPE = (mesh, axis_name)
    try:
        yield
    finally:
        _CP_SCOPE = prev


def _cp_active(q) -> Optional[tuple]:
    cp = _CP_SCOPE
    if cp is None:
        return None
    mesh, axis = cp
    size = mesh.shape.get(axis, 1)
    if size <= 1 or q.shape[-2] % size != 0:
        return None
    return mesh, axis, size


def _maybe_axis(mesh, name: str, dim: int) -> Optional[str]:
    """Mesh axis name if it exists, is >1, and divides the dim; else None."""
    s = mesh.shape.get(name, 1)
    return name if (s > 1 and dim % s == 0) else None


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


def fold_key(key: jax.Array, i) -> jax.Array:
    """``jax.random.fold_in`` that also accepts KeyGen v2 raw uint32 salt
    arrays (ops/layers.py): the (possibly traced) index is murmur-mixed with
    scalar ops and xored into the trailing salt word."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return jax.random.fold_in(key, i)
    import numpy as np

    h = jnp.asarray(i).astype(jnp.uint32)
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(2246822519)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(3266489917)
    h = h ^ (h >> np.uint32(16))
    salt = key.reshape(-1).astype(jnp.uint32)
    return salt.at[-1].set(salt[-1] ^ h)


def _cp_self_attention(q, k, v, mesh, axis, dropout_rate, dropout_key, train, impl):
    """Ring attention over the 'seq' mesh axis for the self-attention layout
    (q/k/v: (M, B, H, T, hs) or (B, H, T, hs)). Batch/head dims co-shard over
    'data'/'model' when those axes exist, so CP composes with DP/TP."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.ring_attention import ring_causal_attention_local

    nd = q.ndim
    b_ax = _maybe_axis(mesh, "data", q.shape[-4]) if nd >= 4 else None
    h_ax = _maybe_axis(mesh, "model", q.shape[-3]) if nd >= 3 else None
    lead = (None,) * (nd - 4) + (b_ax, h_ax) if nd >= 4 else (h_ax,)
    spec = P(*lead, axis, None)

    def body(q, k, v, key):
        if key is not None:
            # decorrelate dropout across data/model shards (the ring already
            # folds the seq rank per chunk pair)
            for other in ("data", "model"):
                if mesh.shape.get(other, 1) > 1:
                    key = fold_key(key, jax.lax.axis_index(other))
        return ring_causal_attention_local(
            q, k, v, axis_name=axis, impl=impl,
            dropout_rate=dropout_rate, dropout_key=key, train=train,
        )

    use_drop = train and dropout_rate > 0.0
    if use_drop:
        fn = shard_map(
            body, mesh=mesh, in_specs=(spec, spec, spec, P()),
            out_specs=spec, check_rep=False,
        )
        return fn(q, k, v, dropout_key)
    fn = shard_map(
        lambda q, k, v: body(q, k, v, None), mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec, check_rep=False,
    )
    return fn(q, k, v)


def _cp_cross_attention(q, k, v, mesh, axis, dropout_rate, dropout_key, train, impl):
    """Ring attention per KV stream, summed over streams (the model's
    cross-attention core) under context parallelism.

    q: (B, H, T, hs); k, v: (J, B, H, T, hs)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.ring_attention import ring_causal_attention_local

    b_ax = _maybe_axis(mesh, "data", q.shape[-4]) if q.ndim >= 4 else None
    h_ax = _maybe_axis(mesh, "model", q.shape[-3]) if q.ndim >= 3 else None
    lead = (None,) * (q.ndim - 4) + (b_ax, h_ax) if q.ndim >= 4 else (h_ax,)
    q_spec = P(*lead, axis, None)
    kv_spec = P(None, *lead, axis, None)

    def body(q, k, v, key):
        if key is not None:
            for other in ("data", "model"):
                if mesh.shape.get(other, 1) > 1:
                    key = fold_key(key, jax.lax.axis_index(other))
        out = None
        for j in range(k.shape[0]):
            kj = fold_key(key, j) if key is not None else None
            o = ring_causal_attention_local(
                q, k[j], v[j], axis_name=axis, impl=impl,
                dropout_rate=dropout_rate, dropout_key=kj, train=train,
            )
            out = o if out is None else out + o
        return out

    use_drop = train and dropout_rate > 0.0
    if use_drop:
        fn = shard_map(
            body, mesh=mesh, in_specs=(q_spec, kv_spec, kv_spec, P()),
            out_specs=q_spec, check_rep=False,
        )
        return fn(q, k, v, dropout_key)
    fn = shard_map(
        lambda q, k, v: body(q, k, v, None), mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec), out_specs=q_spec, check_rep=False,
    )
    return fn(q, k, v)


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
    cp = _cp_active(q)
    if cp is not None and q.shape == k.shape:
        mesh, axis, _ = cp
        return _cp_self_attention(
            q, k, v, mesh, axis, dropout_rate, dropout_key, train, impl
        )
    if impl == "jnp":
        return causal_attention_jnp(q, k, v, dropout_rate, dropout_key, train)
    if impl in ("auto", "pallas"):
        from .pallas_attention import (
            flash_attention_eligible,
            flash_causal_attention,
            short_attention_eligible,
            short_causal_attention,
        )

        use_dropout = train and dropout_rate > 0.0
        # Short whole-row kernel FIRST where both are eligible (256 <= T <=
        # 512): in-model it beats the blockwise kernels by 45-58% there
        # (production config, B=16: 40.5 vs 25.7 steps/s at T=256, 15.9 vs
        # 11.0 at T=512) — one program computes the closed-form softmax with
        # no online-accumulation bookkeeping at sizes where whole rows fit
        # in VMEM.
        if short_attention_eligible(q, k, v) and _on_tpu():
            return short_causal_attention(
                q, k, v,
                dropout_rate=dropout_rate if use_dropout else 0.0,
                dropout_key=dropout_key if use_dropout else None,
            )
        if flash_attention_eligible(q, k, v) and (impl == "pallas" or _on_tpu()):
            return flash_causal_attention(
                q, k, v,
                dropout_rate=dropout_rate if use_dropout else 0.0,
                dropout_key=dropout_key if use_dropout else None,
            )
        return causal_attention_jnp(q, k, v, dropout_rate, dropout_key, train)
    raise ValueError(f"Unknown attention impl: {impl}")


def packed_attention_active(t: int, hs: int, impl: str = "auto") -> bool:
    """True when self-attention will take the PACKED short kernel — the
    model uses this (trace-time) to emit the packed (M, B, 3H, T, hs)
    projection instead of the stacked (3, M, B, H, T, hs) one."""
    if impl not in ("auto", "pallas") or _CP_SCOPE is not None or not _on_tpu():
        return False
    from .pallas_attention import short_packed_eligible

    return short_packed_eligible(t, hs)


def fused_qkv_attention_active(t: int, hs: int, impl: str = "auto") -> bool:
    """True when self-attention will run the fused projection+attention
    kernel (ops/pallas_attention.fused_qkv_attention) — the model checks
    this at trace time to hand the kernel raw weights instead of emitting
    the projection einsums."""
    if impl not in ("auto", "pallas") or _CP_SCOPE is not None or not _on_tpu():
        return False
    from .pallas_attention import fused_qkv_eligible

    return fused_qkv_eligible(t, hs)


def cross_t_attention_active(t: int, hs: int, impl: str = "auto") -> bool:
    """True when cross-attention will take the transposed-KV short kernel
    (ops/pallas_attention.short_cross_attention_t) — the model checks this
    at trace time to emit the KV projection in its einsum-natural
    (J, B, H, hs, T) form instead of paying a relayout copy per tensor."""
    if impl not in ("auto", "pallas") or _CP_SCOPE is not None or not _on_tpu():
        return False
    from .pallas_attention import short_cross_t_eligible

    return short_cross_t_eligible(t, hs)


def causal_attention_packed(
    qkv: jax.Array,
    n_head: int,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    train: bool = False,
    impl: str = "auto",
) -> jax.Array:
    """Causal self-attention over packed (..., 3H, T, hs) q/k/v head groups.

    On TPU in the short-T band this is ONE kernel operand in, one packed
    gradient out (ops/pallas_attention.short_causal_attention_packed);
    elsewhere it splits the packed axis and reuses ``causal_attention``."""
    H = n_head
    t, hs = qkv.shape[-2], qkv.shape[-1]
    if packed_attention_active(t, hs, impl):
        from .pallas_attention import short_causal_attention_packed

        use_dropout = train and dropout_rate > 0.0
        return short_causal_attention_packed(
            qkv, H,
            dropout_rate=dropout_rate if use_dropout else 0.0,
            dropout_key=dropout_key if use_dropout else None,
        )
    q = qkv[..., :H, :, :]
    k = qkv[..., H:2 * H, :, :]
    v = qkv[..., 2 * H:, :, :]
    return causal_attention(q, k, v, dropout_rate, dropout_key, train, impl)


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
    cp = _cp_active(q)
    if cp is not None:
        mesh, axis, _ = cp
        return _cp_cross_attention(
            q, k, v, mesh, axis, dropout_rate, dropout_key, train, impl
        )
    if impl in ("auto", "pallas"):
        from .pallas_attention import (
            flash_cross_attention,
            flash_cross_eligible,
            short_cross_attention,
            short_cross_eligible,
        )

        use_dropout = train and dropout_rate > 0.0
        # short before flash where both are eligible — see causal_attention
        if short_cross_eligible(q, k, v) and _on_tpu():
            return short_cross_attention(
                q, k, v,
                dropout_rate=dropout_rate if use_dropout else 0.0,
                dropout_key=dropout_key if use_dropout else None,
            )
        if flash_cross_eligible(q, k, v) and (impl == "pallas" or _on_tpu()):
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


# ------------------------------------------------- chunk core (ring/CP shared)
#
# Ring (context-parallel) attention needs per-(query-chunk, KV-chunk)
# primitives with explicit logsumexp so partial results merge exactly
# (parallel/ring_attention.py). Two implementations of the SAME math:
# the blockwise Pallas kernels (ops/pallas_attention.py flash_chunk_fwd/_bwd)
# on TPU, and the dense jnp mirror below everywhere else. Both use identical
# dropout semantics: keep-mask on the unnormalized exp-scores, softmax
# denominator unmasked, regenerated deterministically in fwd and bwd
# (hash_keep_mask keying) — no mask tensor is ever stored.


def _chunk_mask_and_scores(q, k, causal):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum(
        "...qh,...kh->...qk", q.astype(jnp.float32), k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * scale
    if causal:
        t_q, t_k = q.shape[-2], k.shape[-2]
        mask = jnp.tril(jnp.ones((t_q, t_k), dtype=bool))
        s = jnp.where(mask, s, -jnp.inf)
    return s


def _chunk_keep_mask(shape, seed, rate):
    """Per-leading-slice hash keep-mask matching the kernels' seeding
    structure (seed, n, iq, jk) with chunk-level granularity (iq = jk = 0;
    the ring caller folds the chunk pair into the seed). Every leading slice
    gets a distinct linearized index, like the kernels' collapsed N axis."""
    from .pallas_attention import hash_keep_mask

    lead = shape[:-2]
    n_idx = 0
    stride = 1
    for d in range(len(lead) - 1, -1, -1):
        n_idx = n_idx + jax.lax.broadcasted_iota(
            jnp.int32, lead + (1, 1), d
        ) * stride
        stride *= lead[d]
    return hash_keep_mask(seed, n_idx, 0, 0, shape, rate)


def chunk_fwd_jnp(
    q: jax.Array, k: jax.Array, v: jax.Array, causal: bool,
    seed: Optional[jax.Array] = None, rate: float = 0.0,
) -> tuple:
    """Dense chunk forward: returns (out (..., t_q, hs), lse (..., t_q))."""
    s = _chunk_mask_and_scores(q, k, causal)
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    lse = (m + jnp.log(l))[..., 0]
    if rate > 0.0:
        keep = _chunk_keep_mask(s.shape, seed, rate)
        p = jnp.where(keep, p, 0.0)
        l = l * (1.0 - rate)
    out = jnp.einsum(
        "...qk,...kh->...qh", p, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) / l
    return out.astype(q.dtype), lse


def chunk_bwd_jnp(
    q: jax.Array, k: jax.Array, v: jax.Array, out: jax.Array,
    lse: jax.Array, g: jax.Array, causal: bool,
    seed: Optional[jax.Array] = None, rate: float = 0.0,
) -> tuple:
    """Dense chunk backward given the final (post-merge) lse.

    Mirrors the blockwise kernels' math: P = exp(S − lse), D = rowsum(g∘out),
    dS = P ∘ (keep∘(g·Vᵀ)/(1−rate) − D). Returns (dq, dk, dv) in q/k/v dtypes.
    """
    scale = q.shape[-1] ** -0.5
    s = _chunk_mask_and_scores(q, k, causal)
    p = jnp.exp(s - lse[..., :, None])  # masked entries: exp(-inf) = 0
    g32 = g.astype(jnp.float32)
    delta = jnp.sum(g32 * out.astype(jnp.float32), axis=-1, keepdims=True)
    dp = jnp.einsum(
        "...qh,...kh->...qk", g32, v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        keep = _chunk_keep_mask(s.shape, seed, rate)
        pd = jnp.where(keep, p / (1.0 - rate), 0.0)
        dp = jnp.where(keep, dp / (1.0 - rate), 0.0)
    else:
        pd = p
    dv = jnp.einsum(
        "...qk,...qh->...kh", pd, g32, preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dq = jnp.einsum(
        "...qk,...kh->...qh", ds, k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * scale
    dk = jnp.einsum(
        "...qk,...qh->...kh", ds, q.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _chunk_use_pallas(q, k, impl: str) -> bool:
    from .pallas_attention import MIN_FLASH_SEQ_LEN, flash_chunk_eligible

    if impl == "jnp":
        return False
    if not flash_chunk_eligible(q, k):
        return False
    if impl == "pallas":
        return True
    return _on_tpu() and q.shape[-2] >= MIN_FLASH_SEQ_LEN


def chunk_fwd(q, k, v, causal, seed=None, rate: float = 0.0, impl: str = "auto"):
    """Chunk forward with implementation dispatch (pallas on TPU, else jnp)."""
    if _chunk_use_pallas(q, k, impl):
        from .pallas_attention import flash_chunk_fwd

        return flash_chunk_fwd(q, k, v, causal, seed=seed, rate=rate)
    return chunk_fwd_jnp(q, k, v, causal, seed=seed, rate=rate)


def chunk_bwd(q, k, v, out, lse, g, causal, seed=None, rate: float = 0.0,
              impl: str = "auto"):
    """Chunk backward with implementation dispatch (pallas on TPU, else jnp)."""
    if _chunk_use_pallas(q, k, impl):
        from .pallas_attention import flash_chunk_bwd

        return flash_chunk_bwd(q, k, v, out, lse, g, causal, seed=seed, rate=rate)
    return chunk_bwd_jnp(q, k, v, out, lse, g, causal, seed=seed, rate=rate)
