"""KV-cached incremental decoding for serving-scale generation.

The faithful ``generate`` (reference: model.py:404-446) and the fused-scan
``generate_fast`` both recompute the FULL context window for every new token
— O(T) forward work per token. This module adds a decode path that caches
per-block attention keys/values so each new token costs one single-position
forward: O(1) matmul work against O(T) cached bandwidth, the standard
serving structure.

Exactness boundary (important): the model uses ABSOLUTE learned positions
over a window cropped to ``block_size`` (reference: model.py:285-319 crops,
then embeds positions 0..T-1 of the crop). While the context is still
GROWING toward ``block_size`` the window start is pinned at 0, tokens only
append, and cached decoding is numerically IDENTICAL to the faithful path
(pinned by tests/test_model.py::TestCachedGenerate). Once the window is
full, the faithful path slides it — every token's position index changes
each step, which invalidates all cached K/V (they were computed from
position-dependent embeddings). Two policies are offered past that point:

- ``generate_cached`` (exact): falls back to the fused full-window scan for
  the remaining tokens — always token-identical to ``generate``.
- ``generate_serve`` (serving): chunked refresh. Every ``refresh`` tokens it
  recomputes the cache from the last ``block_size - refresh`` tokens at
  positions ``0..block_size-refresh-1`` and decodes the next ``refresh``
  tokens incrementally — amortizing one prefill over ``refresh`` cached
  steps. During a chunk the model sees a slightly shorter history than the
  faithful slide (the oldest ``refresh - t`` tokens are absent at intra-
  chunk step ``t``); this is the documented standard sliding-window-serving
  approximation, NOT bit-faithful, and is opt-in only.

Prefill (cache population from a prompt) runs attention through the standard
dispatching cores (``ops.attention.causal_attention`` / ``cross_causal_
attention``) over the new tokens — with an empty cache the visibility mask
reduces to pure causal, so on TPU at prompt length >= MIN_FLASH_SEQ_LEN the
Pallas flash kernels carry the prefill (O(T) memory) instead of the masked
dense read of the whole cache window. Decode steps (t=1) stay the banded
matvec against the cache.

Cache layout per block (S = block_size) — PACKED, `pack` positions per
lane row (pack = 128 // hs when head size divides the 128-lane tile):
  sa_k / sa_v: (M, B, H, S/pack, pack*hs) self-attention keys/values
  cross[i]["k"/"v"]: (J, B, H, S/pack, pack*hs) cross K/V for querying
  modality i over its J KV modalities — cross K/V derive from the OTHER
  modalities' post-SA/FF activations (reference: model.py:229-242),
  produced fresh for the new position during the same cached step.
Position i lives at row i // pack, lane block i % pack. Shapes where the
packing is impossible (128 % hs != 0, ragged S) keep the plain
(..., S, hs) layout and the straight decode kernel.

Why packed (both alternatives measured, v5e, S=1024/B=16/hs=64/bf16):
- plain (..., S, hs): the 64-lane minor dim pads to 128 under the TPU's
  (8, 128) tiling — every decode fetches the cache at TWICE its logical
  bytes; the kernel measured 2.4x the fetch floor (300 us/layer vs 123).
- transposed (..., hs, S): reads at the true floor (~140 us/layer
  measured), but the per-token append becomes a LANE-axis
  dynamic_update_slice, which lowers to a full-buffer rewrite —
  2.27 ms/step of DUS, erasing the read win.
- packed (..., S/pack, pack*hs): reads at the floor (128-lane rows, no
  padding) AND appends stay in-place sublane writes (the lane offset is
  one of `pack` static branches). Kernel:
  ops/pallas_attention.decode_attention_packed.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import causal_attention, cross_causal_attention
from ..ops.layers import KeyGen, layernorm
from .config import ModelConfig
from .sampler import _scan_steps
from .transformer import _mm, _proj_mlp, _qkv_project, feed_forward, logits_heads


def cache_pack(hs: int, S: int) -> int:
    """Positions per packed lane row: 128 // hs when hs divides the 128-lane
    tile and S packs into whole sublane-aligned rows; else 1 (plain layout)."""
    if hs >= 128 or 128 % hs != 0:
        return 1
    pack = 128 // hs
    if S % pack != 0 or (S // pack) % 8 != 0:
        return 1
    return pack


def init_cache(
    cfg: ModelConfig, batch: int, params: Dict[str, Any],
    kv_dtype: str = None,
) -> List[Dict]:
    """Zero-filled cache pytree matching ``params['blocks']`` structure.

    ``kv_dtype='int8'`` (serving-only, packed layouts only): K/V quantize
    to int8 with one f32 scale per packed row — decode-time cache traffic
    halves, doubling the HBM-bound serving ceiling. Opt-in approximation
    (scores perturb ~0.4%/element); the exact generate paths never use it.
    """
    M, H, S, hs = cfg.num_modalities, cfg.n_head, cfg.block_size, cfg.head_size
    dt = cfg.activation_dtype if hasattr(cfg, "activation_dtype") else (
        jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    )
    pack = cache_pack(hs, S)
    q8 = kv_dtype == "int8"
    if q8 and pack == 1:
        raise ValueError(
            "kv_dtype='int8' requires the packed cache layout "
            f"(head_size {hs} / block_size {S} pack to {pack})"
        )
    store_dt = jnp.int8 if q8 else dt
    shape_tail = (S // pack, pack * hs)
    caches = []
    for block in params["blocks"]:
        bc: Dict[str, Any] = {
            "sa_k": jnp.zeros((M, batch, H) + shape_tail, store_dt),
            "sa_v": jnp.zeros((M, batch, H) + shape_tail, store_dt),
            "cross": {},
        }
        if pack > 1:
            # rolling tail of the last `pack` written columns — decode-time
            # appends rebuild their packed row from it instead of reading
            # the cache (_cache_append); always full-precision so later
            # rewrites of the same row requantize from exact values
            bc["sa_k_tail"] = jnp.zeros((M, batch, H, pack, hs), dt)
            bc["sa_v_tail"] = jnp.zeros((M, batch, H, pack, hs), dt)
        if q8:
            bc["sa_k_scale"] = jnp.zeros((M, batch, H, S // pack), jnp.float32)
            bc["sa_v_scale"] = jnp.zeros((M, batch, H, S // pack), jnp.float32)
        if block["cross"]:
            for i_str in block["cross"]:
                kv_idx = cfg.kv_modalities(int(i_str))
                if not kv_idx:
                    continue
                J = len(kv_idx)
                bc["cross"][i_str] = {
                    "k": jnp.zeros((J, batch, H) + shape_tail, store_dt),
                    "v": jnp.zeros((J, batch, H) + shape_tail, store_dt),
                }
                if pack > 1:
                    bc["cross"][i_str]["k_tail"] = jnp.zeros(
                        (J, batch, H, pack, hs), dt
                    )
                    bc["cross"][i_str]["v_tail"] = jnp.zeros(
                        (J, batch, H, pack, hs), dt
                    )
                if q8:
                    bc["cross"][i_str]["k_scale"] = jnp.zeros(
                        (J, batch, H, S // pack), jnp.float32
                    )
                    bc["cross"][i_str]["v_scale"] = jnp.zeros(
                        (J, batch, H, S // pack), jnp.float32
                    )
        caches.append(bc)
    return caches


def _quantize_rows(rows):
    """(..., r, pack*hs) f32/bf16 -> (int8 rows, (..., r) f32 scales)."""
    a = rows.astype(jnp.float32)
    scale = jnp.max(jnp.abs(a), axis=-1) + 1e-12
    q = jnp.clip(
        jnp.round(a * (127.0 / scale[..., None])), -127.0, 127.0
    ).astype(jnp.int8)
    return q, scale


def _unpack_cache(c, hs: int):
    """(..., S/pack, pack*hs) -> (..., S, hs) view (row-major reshape)."""
    pack = c.shape[-1] // hs
    if pack == 1:
        return c
    sp = c.shape[-2]
    return c.reshape(*c.shape[:-2], sp * pack, hs)


def _cache_append(c, tail, new, start, scale=None):
    """Write ``new`` (..., t, hs) at positions start..start+t-1 of cache
    ``c``; returns ``(c, tail, scale)``.

    With an int8 cache (``scale`` is its per-packed-row f32 scale buffer,
    shape (..., S/pack)), every written row quantizes via _quantize_rows —
    the full-precision tail makes later rewrites of a partially-filled row
    requantize from exact values.

    Plain layout (pack == 1): one in-place dynamic_update_slice along the
    second-minor sequence axis (``tail`` is ignored and returned as-is).

    Packed layout: ``tail`` (..., pack, hs) carries the last ``pack``
    written columns. Every single-position append rebuilds its FULL packed
    row from the tail — block j <= pos%pack comes from the tail (a roll),
    higher blocks hold stale values that the pos-mask hides — and writes it
    with one full-minor dynamic_update_slice at a (possibly traced)
    second-minor row index: the form XLA updates in place. Two measured
    dead ends this replaces: a lax.switch over per-lane-offset DUS branches
    (44 us per write — the conditional blocks in-place aliasing) and a
    read-blend-write of the live row (in-place, but the dynamic_slice READ
    made XLA flip the cache to a row-major-most layout, inserting a
    full-cache layout-conversion copy at every Pallas decode call —
    1.87 ms/step). Static starts (prefill) bulk-write whole packed rows via
    one contiguous reshape.
    """
    hs = new.shape[-1]
    t = new.shape[-2]
    pack = c.shape[-1] // hs
    q8 = c.dtype == jnp.int8
    if not q8:
        new = new.astype(c.dtype)
    if pack == 1:
        return (
            jax.lax.dynamic_update_slice_in_dim(c, new, start, axis=c.ndim - 2),
            tail,
            scale,
        )
    row_axis = c.ndim - 2
    static_start = isinstance(start, (int, np.integer))

    def store_rows(c, scale, rows, row0):
        # rows: (..., r, pack*hs) whole packed rows at packed-row index row0
        # (row0 may be traced; for q8 the matching scales write alongside)
        if q8:
            rows, rscale = _quantize_rows(rows)
            scale = jax.lax.dynamic_update_slice_in_dim(
                scale, rscale.astype(scale.dtype), row0, axis=scale.ndim - 1
            )
        idx = [0] * c.ndim if isinstance(row0, int) else [jnp.int32(0)] * c.ndim
        idx[row_axis] = row0
        return jax.lax.dynamic_update_slice(c, rows.astype(c.dtype), tuple(idx)), scale

    def write_one(c, tail, scale, tok, pos):
        # tok: (..., 1, hs) at sequence position pos (traced or static)
        tail = jnp.concatenate([tail[..., 1:, :], tok.astype(tail.dtype)], axis=-2)
        pos = jnp.asarray(pos, jnp.int32)
        # tail[k] holds position pos - (pack-1) + k; block j of the row
        # needs position pos - pos%pack + j -> roll by (pos%pack) + 1
        row_blocks = jnp.roll(tail, pos % pack + 1, axis=-2)
        if q8:
            # blocks j > pos%pack are stale (a previous row's token, hidden
            # by the pos-mask on reads) — zero them so the int8 scale covers
            # only live lanes; a stale outlier would otherwise transiently
            # coarsen the newest token's quantization until the row fills
            # (advisor r4)
            j_idx = jnp.arange(pack, dtype=jnp.int32)
            live = (j_idx <= pos % pack)[:, None]
            row_blocks = jnp.where(live, row_blocks, 0)
        row = row_blocks.reshape(*row_blocks.shape[:-2], 1, pack * hs)
        c, scale = store_rows(c, scale, row, pos // pack)
        return c, tail, scale

    if static_start:
        start = int(start)
        # leading partial row (start not on a pack boundary)
        lead = min((-start) % pack, t)
        for i in range(lead):
            c, tail, scale = write_one(
                c, tail, scale, new[..., i:i + 1, :], start + i
            )
        rest = new[..., lead:, :]
        start += lead
        t -= lead
        # bulk: whole packed rows via one contiguous reshape
        bulk = (t // pack) * pack
        if bulk:
            rows = rest[..., :bulk, :].reshape(
                *rest.shape[:-2], bulk // pack, pack * hs
            )
            c, scale = store_rows(c, scale, rows, start // pack)
            tail = jnp.concatenate(
                [tail, rest[..., :bulk, :].astype(tail.dtype)], axis=-2
            )[..., -pack:, :]
        # trailing remainder
        for i in range(bulk, t):
            c, tail, scale = write_one(
                c, tail, scale, rest[..., i:i + 1, :], start + i
            )
        return c, tail, scale

    if t != 1:
        raise NotImplementedError(
            "packed cache append with a traced start requires t == 1"
        )
    return write_one(c, tail, scale, new, start)


def _attn_cached(q, kc, vc, start, t_new: int, k_scale=None, v_scale=None):
    """Masked attention of ``t_new`` new queries against a PACKED
    (..., S/pack, pack*hs) — or plain (..., S, hs) — cache (see module
    docstring for the layout rationale).

    Rows sit at absolute positions start..start+t_new-1; cache column j is
    visible iff j <= row position. Unwritten cache slots are masked out, so
    their zero contents never contribute (exp(-inf) == 0 exactly). Numerics
    mirror ops.attention.causal_attention_jnp: f32 scores/softmax, weighted
    sum accumulated in f32, result in the activation dtype.

    Single-position decode (t_new == 1) on TPU runs as ONE fused Pallas op
    (ops/pallas_attention.decode_attention_packed / decode_attention) — the
    dense expression below costs ~10 dispatch-bound XLA regions per layer
    inside the serving scan.
    """
    hs = q.shape[-1]
    q8 = kc.dtype == jnp.int8
    if t_new == 1:
        from ..ops.attention import _on_tpu
        from ..ops.pallas_attention import (
            decode_attention,
            decode_attention_eligible,
            decode_attention_packed,
            decode_attention_packed_eligible,
            decode_attention_packed_q8,
        )

        qb = jnp.broadcast_to(q, kc.shape[:-2] + q.shape[-2:])
        if _on_tpu():
            # eligibility is shape-only; a ShapeDtypeStruct stands in for
            # the int8 cache so no (traced) array is built just to read
            # its shape
            if q8 and decode_attention_packed_eligible(
                qb, jax.ShapeDtypeStruct(kc.shape, q.dtype)
            ):
                return decode_attention_packed_q8(
                    qb, kc, vc, k_scale, v_scale, start
                )
            if not q8 and kc.shape[-1] != hs and decode_attention_packed_eligible(qb, kc):
                return decode_attention_packed(qb, kc, vc, start)
            if not q8 and kc.shape[-1] == hs and decode_attention_eligible(qb, kc):
                return decode_attention(qb, kc, vc, start)
    if q8:
        pack = kc.shape[-1] // hs
        inv = 1.0 / 127.0
        kc = (kc.astype(jnp.float32) * (k_scale[..., None] * inv)).astype(q.dtype)
        vc = (vc.astype(jnp.float32) * (v_scale[..., None] * inv)).astype(q.dtype)
    kc = _unpack_cache(kc, hs)
    vc = _unpack_cache(vc, hs)
    dt = q.dtype
    acc = jnp.float32
    scale = hs ** -0.5
    s = jnp.einsum("...qh,...kh->...qk", q, kc, preferred_element_type=acc) * scale
    rows = start + jnp.arange(t_new, dtype=jnp.int32)
    cols = jnp.arange(kc.shape[-2], dtype=jnp.int32)
    mask = cols[None, :] <= rows[:, None]
    s = jnp.where(mask, s.astype(acc), -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "...qk,...kh->...qh", p.astype(dt), vc, preferred_element_type=acc
    )
    return out.astype(dt)


def _sa_cached(x_norm, sa, cfg: ModelConfig, entry, start, prefill: bool = False):
    """Self-attention with cache append. x_norm: (M, B, t, C).

    ``prefill=True`` (static; requires start == 0 and an empty cache) runs
    the attention through the standard dispatch (``causal_attention``) over
    the new tokens only — on TPU at T >= MIN_FLASH_SEQ_LEN that is the Pallas
    flash kernel, making long-prompt prefill O(T) in memory instead of the
    masked dense read of the whole cache. Equivalent because with an empty
    cache the visibility mask reduces to pure causal over the new tokens.
    """
    M, B, t, _ = x_norm.shape
    H, hs = cfg.n_head, cfg.head_size
    hs2 = hs // 2
    k_new = _qkv_project(x_norm, sa["w1_k"], sa["b1_k"], sa["w2_k"], H, hs2)
    q = _qkv_project(x_norm, sa["w1_q"], sa["b1_q"], sa["w2_q"], H, hs2)
    v_new = _qkv_project(x_norm, sa["w1_v"], sa["b1_v"], sa["w2_v"], H, hs2)
    kc, ktl, ksc = _cache_append(
        entry["sa_k"], entry.get("sa_k_tail"), k_new, start,
        scale=entry.get("sa_k_scale"),
    )
    vc, vtl, vsc = _cache_append(
        entry["sa_v"], entry.get("sa_v_tail"), v_new, start,
        scale=entry.get("sa_v_scale"),
    )
    if prefill:
        att = causal_attention(q, k_new, v_new, impl=cfg.attn_impl)
    else:
        att = _attn_cached(q, kc, vc, start, t, ksc, vsc)  # (M, B, H, t, hs)
    out = att.transpose(0, 1, 3, 2, 4).reshape(M, B, t, H * hs)
    out = _proj_mlp(out, sa["proj_w1"], sa["proj_b1"], sa["proj_w2"], sa["proj_b2"])
    new_entry = {"sa_k": kc, "sa_v": vc}
    if ktl is not None:
        new_entry["sa_k_tail"] = ktl
        new_entry["sa_v_tail"] = vtl
    if ksc is not None:
        new_entry["sa_k_scale"] = ksc
        new_entry["sa_v_scale"] = vsc
    return out, new_entry


def _cross_cached(y, kv_x_new, cp, cfg: ModelConfig, entry, start,
                  prefill: bool = False):
    """Cross-attention with cache append.

    y: (B, t, C) LN_cross output of the querying modality;
    kv_x_new: (J, B, t, C) the new position's post-SA/FF activations of the
    KV modalities. Per-stream softmax then SUM over streams, matching
    ops.attention.cross_causal_attention (reference: model.py:158).
    """
    B, t, _ = y.shape
    hs = cp["q_w"].shape[-1]
    q = _mm("btc,hce->bhte", y, cp["q_w"])  # (B, H, t, hs)
    k_new = _mm("jbtc,jhcf->jbhtf", kv_x_new, cp["kv_w"][..., :hs])
    v_new = _mm("jbtc,jhcf->jbhtf", kv_x_new, cp["kv_w"][..., hs:])
    kc, ktl, ksc = _cache_append(
        entry["k"], entry.get("k_tail"), k_new, start,
        scale=entry.get("k_scale"),
    )
    vc, vtl, vsc = _cache_append(
        entry["v"], entry.get("v_tail"), v_new, start,
        scale=entry.get("v_scale"),
    )
    if prefill:  # empty cache: pure causal over new tokens (flash-eligible)
        att = cross_causal_attention(q, k_new, v_new, impl=cfg.attn_impl)
    else:
        att = _attn_cached(
            q[None], kc, vc, start, t, ksc, vsc
        ).sum(axis=0)  # (B, H, t, hs)
    out = att.transpose(0, 2, 1, 3).reshape(B, t, -1)
    out = _proj_mlp(out, cp["proj_w1"], cp["proj_b1"], cp["proj_w2"], cp["proj_b2"])
    new_entry = {"k": kc, "v": vc}
    if ktl is not None:
        new_entry["k_tail"] = ktl
        new_entry["v_tail"] = vtl
    if ksc is not None:
        new_entry["k_scale"] = ksc
        new_entry["v_scale"] = vsc
    return out, new_entry


def block_forward_cached(x, block, cache, start, cfg: ModelConfig,
                         prefill: bool = False):
    """One MultimodalBlock over new positions only, reading/writing the cache.

    Same update order as block_forward (reference: model.py:214-244):
    x += SA(LN1(x)); x += FF(LN2(x)); cross reads the frozen post-SA/FF x.
    Inference only (train=False — dropout layers are identity).
    """
    keys = KeyGen(None)
    sa_out, new_sa = _sa_cached(
        layernorm(x, block["ln1"]["scale"], block["ln1"]["bias"]),
        block["sa"], cfg, cache, start, prefill,
    )
    x = x + sa_out
    x = x + feed_forward(
        layernorm(x, block["ln2"]["scale"], block["ln2"]["bias"]),
        block["ffwd"], cfg, keys, False,
    )
    new_cache: Dict[str, Any] = dict(new_sa)
    new_cache["cross"] = {}
    if block["cross"]:
        updates = {}
        for i_str, cp in block["cross"].items():
            i = int(i_str)
            kv_idx = cfg.kv_modalities(i)
            if not kv_idx:
                continue
            kv_x = x[jnp.array(kv_idx)] if len(kv_idx) > 1 else x[kv_idx[0]][None]
            y = layernorm(x[i], cp["ln_scale"], cp["ln_bias"])
            cc = cache["cross"][i_str]
            out, new_cc = _cross_cached(y, kv_x, cp, cfg, cc, start, prefill)
            updates[i] = x[i] + out
            new_cache["cross"][i_str] = new_cc
        if updates:
            x = jnp.stack(
                [updates.get(i, x[i]) for i in range(cfg.num_modalities)]
            )
    return x, new_cache


def embed_at(params: Dict[str, Any], cfg: ModelConfig, idx, start):
    """Token + positional embedding for positions start..start+t-1.

    idx: (M, B, t) int32; start may be traced (dynamic slice into pos_emb).
    """
    t = idx.shape[-1]
    pos = jax.lax.dynamic_slice_in_dim(params["pre"]["pos_emb"], start, t, axis=0)
    xs = [
        params["pre"]["tok_emb"][m][idx[m]] + pos
        for m in range(cfg.num_modalities)
    ]
    x = jnp.stack(xs)
    if cfg.compute_dtype == "bfloat16":
        x = x.astype(jnp.bfloat16)
    return x


def forward_cached(
    params: Dict[str, Any],
    cfg: ModelConfig,
    idx,
    cache: List[Dict],
    start,
    head_modality: Optional[int] = None,
    prefill: bool = False,
) -> Tuple[Any, List[Dict]]:
    """Forward over new positions only. idx: (M, B, t).

    Returns (logits, new_cache): logits is the last-position logits of
    ``head_modality`` (B, V) when given, else the full per-modality list of
    (B, t, V) logits. ``prefill=True`` requires start == 0 / empty cache and
    routes attention through the flash-dispatching cores.
    """
    x = embed_at(params, cfg, idx, start)
    new_caches = []
    for block, bc in zip(params["blocks"], cache):
        x, nb = block_forward_cached(x, block, bc, start, cfg, prefill)
        new_caches.append(nb)
    if head_modality is None:
        return logits_heads(params, cfg, x), new_caches
    post = params["post"]
    m = head_modality
    h = layernorm(x[m][:, -1:, :], post["ln_scale"][m], post["ln_bias"][m])
    head = post["heads"][m]
    logits = _proj_mlp(h, head["w1"], head["b1"], head["w2"], head["b2"])[:, 0, :]
    if logits.dtype == jnp.bfloat16:
        logits = logits.astype(jnp.float32)
    return logits, new_caches


@functools.partial(
    jax.jit, static_argnames=("cfg", "modality_to_generate", "kv_dtype")
)
def _prefill(params, cfg: ModelConfig, idx, modality_to_generate: int,
             kv_dtype: str = None):
    """Populate the cache from the prompt; return last-position logits."""
    cache = init_cache(cfg, idx.shape[1], params, kv_dtype=kv_dtype)
    logits, cache = forward_cached(
        params, cfg, idx, cache, 0, head_modality=modality_to_generate,
        prefill=True,
    )
    return logits, cache


@functools.partial(
    jax.jit, static_argnames=("cfg", "modality_to_generate", "n_steps")
)
def _decode_steps(
    params, cfg: ModelConfig, cache, start, logits0, last_col, key,
    modality_to_generate: int, n_steps: int,
):
    """n_steps cached decode steps fused into one scan.

    Carry: (cache, position, last logits (B, V), last column (M, B), key).
    Step t: sample token position start+t from the carried logits (identical
    key schedule to generate/_single_step: split, then categorical on the
    subkey), build the new column (other modalities repeat their last
    token), run ONE cached forward at that position for the next logits.
    Emits the sampled columns (n_steps, M, B).
    """

    def body(carry, _):
        cache, pos, logits, col_prev, key = carry
        key, sub = jax.random.split(key)
        nxt = jax.random.categorical(sub, logits, axis=-1).astype(col_prev.dtype)
        col = col_prev.at[modality_to_generate].set(nxt)  # (M, B)
        logits, cache = forward_cached(
            params, cfg, col[:, :, None], cache, pos,
            head_modality=modality_to_generate,
        )
        return (cache, pos + 1, logits, col, key), col

    (cache, start, logits, _, key), cols = jax.lax.scan(
        body, (cache, start, logits0, last_col, key), None, length=n_steps
    )
    return cols, cache, logits, key


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "modality_to_generate", "refresh", "n_chunks", "kv_dtype"
    ),
)
def _serve_chunks(
    params, cfg: ModelConfig, window, key,
    modality_to_generate: int, refresh: int, n_chunks: int,
    kv_dtype: str = None,
):
    """``n_chunks`` steady refresh chunks — one prefill over the last
    S-refresh tokens plus ``refresh`` cached decode steps each — fused into
    ONE device program (a lax.scan over chunks; the chunk body compiles
    once). Token stream and key schedule are identical to the host-level
    chunk loop (pinned by tests/test_model.py); what changes is dispatch:
    the host loop costs 2 jit calls per chunk, ~25 ms each on the tunneled
    TPU — ~0.4 ms per generated step at refresh=128 — which this removes.

    window: (M, B, S - refresh) — the last S-refresh tokens before the
    steady phase. Returns (cols (n_chunks*refresh, M, B), advanced key).
    """
    W = cfg.block_size - refresh

    def chunk(carry, _):
        window, key = carry
        cache = init_cache(cfg, window.shape[1], params, kv_dtype=kv_dtype)
        logits0, cache = forward_cached(
            params, cfg, window, cache, 0,
            head_modality=modality_to_generate, prefill=True,
        )

        def body(c, _):
            cache, pos, logits, col_prev, key = c
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, logits, axis=-1).astype(
                col_prev.dtype
            )
            col = col_prev.at[modality_to_generate].set(nxt)
            logits, cache = forward_cached(
                params, cfg, col[:, :, None], cache, pos,
                head_modality=modality_to_generate,
            )
            return (cache, pos + 1, logits, col, key), col

        (cache, _, logits, _, key), cols = jax.lax.scan(
            body, (cache, W, logits0, window[:, :, -1], key), None,
            length=refresh,
        )
        new_window = jnp.concatenate(
            [window, jnp.moveaxis(cols, 0, -1)], axis=-1
        )[:, :, -W:]
        return (new_window, key), cols

    (window, key), cols = jax.lax.scan(
        chunk, (window, key), None, length=n_chunks
    )
    return cols.reshape(n_chunks * refresh, *cols.shape[2:]), key


def generate_cached(
    params: Dict[str, Any],
    cfg: ModelConfig,
    idx: jax.Array,
    key: jax.Array,
    max_new_tokens: int = 1,
    modality_to_generate: int = 0,
) -> jax.Array:
    """Token-exact generation with KV-cached decode while the window grows.

    idx: (M, B, T0) stacked equal-length token ids. Returns
    (M, B, T0 + max_new_tokens), token-identical to ``generate`` /
    ``generate_fast`` for the same key. Tokens generated while the context
    is shorter than ``block_size`` cost one single-position forward each;
    any remainder past the full window falls back to the faithful fused
    full-window scan (see module docstring for why).
    """
    seq = jnp.asarray(idx)
    if seq.ndim != 3:
        raise ValueError("idx must be (num_modalities, B, T) stacked ids")
    t0 = seq.shape[-1]
    S = cfg.block_size
    n_cached = max(0, min(max_new_tokens, S - t0))
    if n_cached > 0:
        logits0, cache = _prefill(params, cfg, seq, modality_to_generate)
        cols, _, _, key = _decode_steps(
            params, cfg, cache, t0, logits0, seq[:, :, -1], key,
            modality_to_generate, n_cached,
        )
        seq = jnp.concatenate([seq, jnp.moveaxis(cols, 0, -1)], axis=-1)
        # one key split was consumed per sampled token, exactly like the
        # faithful loop; _decode_steps already advanced `key` accordingly
    remaining = max_new_tokens - n_cached
    if remaining > 0:
        window = seq[:, :, -S:]
        if window.shape[-1] < S:  # prompt shorter than S and tokens exhausted
            return seq
        _, cols = _scan_steps(
            params, cfg, window, key, modality_to_generate, remaining
        )
        seq = jnp.concatenate([seq, jnp.moveaxis(cols, 0, -1)], axis=-1)
    return seq


def generate_serve(
    params: Dict[str, Any],
    cfg: ModelConfig,
    idx: jax.Array,
    key: jax.Array,
    max_new_tokens: int,
    modality_to_generate: int = 0,
    refresh: Optional[int] = None,
    kv_dtype: Optional[str] = None,
    fuse_chunks: bool = True,
) -> jax.Array:
    """Serving-mode generation: cached decode everywhere, chunked refresh
    once the window is full (NOT bit-faithful past that point — see module
    docstring). ``refresh`` defaults to block_size // 8 (min 1).

    ``kv_dtype='int8'`` additionally quantizes the K/V cache (one f32 scale
    per packed row) — decode cache traffic halves, roughly doubling the
    HBM-bound throughput ceiling, at a ~0.4%-per-element score perturbation
    on top of serving mode's chunked-refresh approximation.
    """
    seq = jnp.asarray(idx)
    if seq.ndim != 3:
        raise ValueError("idx must be (num_modalities, B, T) stacked ids")
    S = cfg.block_size
    refresh = max(1, refresh if refresh is not None else S // 8)
    if refresh >= S:
        raise ValueError("refresh must be < block_size")

    # exact phase while the window grows
    t0 = seq.shape[-1]
    n_exact = max(0, min(max_new_tokens, S - t0))
    produced = 0
    if n_exact > 0:
        logits0, cache = _prefill(
            params, cfg, seq, modality_to_generate, kv_dtype=kv_dtype
        )
        cols, _, _, key = _decode_steps(
            params, cfg, cache, t0, logits0, seq[:, :, -1], key,
            modality_to_generate, n_exact,
        )
        seq = jnp.concatenate([seq, jnp.moveaxis(cols, 0, -1)], axis=-1)
        produced = n_exact

    # chunked-refresh phase: prefill last S-refresh tokens, decode `refresh`.
    # All FULL chunks fuse into one device program (_serve_chunks); only a
    # sub-refresh tail falls back to the per-chunk dispatch path (also used
    # with fuse_chunks=False, which tests diff against the fused stream).
    n_full = (max_new_tokens - produced) // refresh
    if fuse_chunks and n_full >= 1:
        window = seq[:, :, -(S - refresh):]
        cols, key = _serve_chunks(
            params, cfg, window, key, modality_to_generate, refresh,
            n_full, kv_dtype=kv_dtype,
        )
        seq = jnp.concatenate([seq, jnp.moveaxis(cols, 0, -1)], axis=-1)
        produced += n_full * refresh
    while produced < max_new_tokens:
        n = min(refresh, max_new_tokens - produced)
        window = seq[:, :, -(S - refresh):]
        logits0, cache = _prefill(
            params, cfg, window, modality_to_generate, kv_dtype=kv_dtype
        )
        cols, _, _, key = _decode_steps(
            params, cfg, cache, S - refresh, logits0, seq[:, :, -1], key,
            modality_to_generate, n,
        )
        seq = jnp.concatenate([seq, jnp.moveaxis(cols, 0, -1)], axis=-1)
        produced += n
    return seq
