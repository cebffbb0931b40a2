"""The multimodal transformer: functional forward pass over a pure pytree.

Architecture parity with the reference model (reference: model.py:30-446),
including its nonstandard internals (SURVEY Quirk Q6):

- factored QKV: Linear(C, hs/2) -> tanh -> Linear(hs/2, hs, no bias) per
  projection (reference: model.py:36-50)
- attention: q·k^T * hs**-0.5, causal mask, softmax, dropout on the affinity
  matrix, then ·v (reference: model.py:60-73)
- output projection: Linear(H*hs, C/2) -> tanh -> Linear(C/2, C) + dropout
  (reference: model.py:82-92)
- cross-attention: per head a single no-bias query Linear; per KV modality a
  no-bias Linear(C, 2hs) split into k,v; per-modality attention outputs are
  SUMMED across KV modalities (reference: model.py:119-159); KV inputs are
  the *post-SA/FF* activations of the other modalities in the same block
  (reference: model.py:229-242)
- block order: x += SA(LN1(x)); x += FF(LN2(x)); then cross-attention
  (note FF before cross — reference: model.py:222-226)
- post block: LN -> Linear(C, V/2) -> tanh -> Linear(V/2, V)
  (reference: model.py:330-337)
- loss: per-modality mean cross-entropy over (B*T); total loss is the sum
  (reference: model.py:392-400, main.py:645-646)

TPU mapping: modality-uniform compute (SA/FF/LN) is stacked over a leading
modality axis M so every matmul batches (M*B*T) rows onto the MXU; ragged
pieces (embeddings, vocab heads, cross-attention) unroll per modality at
trace time.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import (
    causal_attention,
    causal_attention_packed,
    cross_causal_attention,
    cross_t_attention_active,
    fused_qkv_attention_active,
    packed_attention_active,
)
from ..ops.layers import KeyGen, dropout, layernorm
from .config import ModelConfig


def _bf16_mixed_dot_supported() -> bool:
    # CPU XLA lacks BF16 x BF16 = F32 dot support; TPU has it natively.
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


def _mm(eq, a, b):
    """einsum with >=f32 accumulation, result in the activation dtype."""
    if a.dtype == jnp.bfloat16 and not _bf16_mixed_dot_supported():
        out = jnp.einsum(eq, a.astype(jnp.float32), b.astype(jnp.float32))
        return out.astype(jnp.bfloat16)
    if a.dtype == jnp.bfloat16:
        # bf16 dot emitted DIRECTLY in bf16: the MXU always accumulates in
        # f32 internally, so this is bit-identical forward to
        # preferred_element_type=f32 + round — but the autodiff graph
        # differs: the f32-intermediate form hands every upstream einsum an
        # f32 COTANGENT, which XLA then transposes at f32 width and feeds
        # to mixed f32xbf16 backward dots that run as multi-pass f32 on the
        # MXU. Measured at production T=1024 (B=8): 22.5 ms/step of f32
        # transpose VJPs alone. Keeping the result bf16 keeps the whole
        # backward chain bf16 (weight grads round once through bf16 per
        # einsum before their f32 cast — standard mixed-precision training).
        return jnp.einsum(eq, a, b.astype(a.dtype))
    acc = jnp.float64 if a.dtype == jnp.float64 else jnp.float32
    return jnp.einsum(eq, a, b.astype(a.dtype), preferred_element_type=acc).astype(a.dtype)


def _qkv_project(h: jax.Array, w1, b1, w2, H: int, hs2: int) -> jax.Array:
    """Factored tanh-MLP projection for all modalities/heads at once.

    h: (M, B, T, C) -> (M, B, H, T, hs)
    """
    M, B, T, _ = h.shape
    t = _mm("mbtc,mcd->mbtd", h, w1) + b1.astype(h.dtype)[:, None, None, :]
    t = jnp.tanh(t).reshape(M, B, T, H, hs2)
    # output order (M,B,H,T,hs) straight from the einsum — a separate
    # transpose materializes a physical copy per call (measured ~26 us each
    # on v5e; 18 calls/layer-sweep add up)
    return _mm("mbthd,mhde->mbhte", t, w2)


def _qkv_project_fused(h: jax.Array, sa, H: int, hs2: int):
    """All three factored q/k/v projections in TWO einsums instead of six.

    The per-projection weights concatenate at trace time ((M,C,D)x3 →
    (M,C,3D) — a cheap weight-sized copy), turning three half-size matmul
    chains into one. At production scale the step is op-dispatch-bound
    (~10k executed HLO ops, ~1.3 us average), so fewer, larger MXU ops win
    even with identical FLOPs. Returns q, k, v: (M, B, H, T, hs).
    """
    M, B, T, _ = h.shape
    w1 = jnp.concatenate([sa["w1_q"], sa["w1_k"], sa["w1_v"]], axis=-1)
    b1 = jnp.concatenate([sa["b1_q"], sa["b1_k"], sa["b1_v"]], axis=-1)
    t = _mm("mbtc,mcd->mbtd", h, w1) + b1.astype(h.dtype)[:, None, None, :]
    t = jnp.tanh(t).reshape(M, B, T, 3, H, hs2)
    w2 = jnp.stack([sa["w2_q"], sa["w2_k"], sa["w2_v"]])  # (3, M, H, hs2, hs)
    out = _mm("mbtihd,imhde->imbhte", t, w2)
    return out[0], out[1], out[2]


def _qkv_project_packed(h: jax.Array, sa, H: int, hs2: int) -> jax.Array:
    """Fused q/k/v projection emitting the PACKED (M, B, 3H, T, hs) layout.

    Treats the three projections as 3H "virtual heads" so the second matmul
    is a standard 5D batched einsum (the (3, M, ...) stacked form lowers to
    a 6D dot whose fwd+bwd layout copies measured ~0.7 ms/step on the
    production config). The packed output feeds the packed short kernel
    directly — no unstack, and the kernel's backward returns d(qkv) packed."""
    M, B, T, _ = h.shape
    w1 = jnp.concatenate([sa["w1_q"], sa["w1_k"], sa["w1_v"]], axis=-1)
    b1 = jnp.concatenate([sa["b1_q"], sa["b1_k"], sa["b1_v"]], axis=-1)
    t = _mm("mbtc,mcd->mbtd", h, w1) + b1.astype(h.dtype)[:, None, None, :]
    t = jnp.tanh(t).reshape(M, B, T, 3 * H, hs2)
    w2 = jnp.concatenate([sa["w2_q"], sa["w2_k"], sa["w2_v"]], axis=1)
    return _mm("mbthd,mhde->mbhte", t, w2)  # (M, B, 3H, T, hs)


def _proj_mlp(out: jax.Array, w1, b1, w2, b2) -> jax.Array:
    """tanh-MLP output projection, broadcasting over stacked leading dims."""
    dt = out.dtype
    if w1.ndim == 3:  # stacked over modality: (M, ...)
        t = jnp.tanh(_mm("mbtd,mde->mbte", out, w1) + b1.astype(dt)[:, None, None, :])
        return _mm("mbte,mec->mbtc", t, w2) + b2.astype(dt)[:, None, None, :]
    t = jnp.tanh(_mm("...d,de->...e", out, w1) + b1.astype(dt))
    return _mm("...e,ec->...c", t, w2) + b2.astype(dt)


def _proj_mlp_heads(
    att: jax.Array, w1, b1, w2, b2, H: int, hs: int, head_major: bool = False
) -> jax.Array:
    """Output projection taking attention output in (…, H, T, hs) layout.

    Contracts (head, head_feature) against w1 reshaped (…, H, hs, C2) — the
    transpose-back-and-reshape of the head-major attention output fuses into
    the matmul's dimension numbers instead of materializing a copy.
    ``head_major=True`` accepts the fused kernel's (M, H, B, T, hs) layout.
    """
    dt = att.dtype
    if w1.ndim == 3:  # stacked over modality: att (M,B,H,T,hs) / (M,H,B,T,hs)
        M = att.shape[0]
        w1r = w1.reshape(M, H, hs, w1.shape[-1])
        eq = "mhbte,mhec->mbtc" if head_major else "mbhte,mhec->mbtc"
        t = jnp.tanh(
            _mm(eq, att, w1r) + b1.astype(dt)[:, None, None, :]
        )
        return _mm("mbtc,mcd->mbtd", t, w2) + b2.astype(dt)[:, None, None, :]
    w1r = w1.reshape(H, hs, w1.shape[-1])  # att (B,H,T,hs) / (H,B,T,hs)
    eq = "hbte,hec->btc" if head_major else "bhte,hec->btc"
    t = jnp.tanh(_mm(eq, att, w1r) + b1.astype(dt))
    return _mm("btc,cd->btd", t, w2) + b2.astype(dt)


def self_attention(
    x_norm: jax.Array,
    sa: Dict[str, jax.Array],
    cfg: ModelConfig,
    keys: KeyGen,
    train: bool,
) -> jax.Array:
    """Multi-head self-attention for all modalities (x_norm: (M, B, T, C))."""
    M, B, T, C = x_norm.shape
    H, hs = cfg.n_head, cfg.head_size
    hs2 = hs // 2

    if fused_qkv_attention_active(T, hs, cfg.attn_impl):
        # short-T TPU path: the ENTIRE attention core (factored tanh q/k/v
        # projections + whole-row causal attention) runs as ONE kernel —
        # x is read once, t/qkv never touch HBM, weight grads accumulate
        # f32 in-kernel (ops/pallas_attention.fused_qkv_attention)
        from ..ops.pallas_attention import fused_qkv_attention

        w1 = jnp.concatenate([sa["w1_q"], sa["w1_k"], sa["w1_v"]], axis=-1)
        b1 = jnp.concatenate([sa["b1_q"], sa["b1_k"], sa["b1_v"]], axis=-1)
        w2 = jnp.concatenate([sa["w2_q"], sa["w2_k"], sa["w2_v"]], axis=1)
        use_dropout = train and cfg.dropout > 0.0
        k_att = keys()  # consume the site unconditionally (stable numbering)
        att_hm = fused_qkv_attention(
            x_norm, w1, b1, w2, H,
            dropout_rate=cfg.dropout if use_dropout else 0.0,
            dropout_key=k_att if use_dropout else None,
        )  # (M, H, B, T, hs)
        out = _proj_mlp_heads(
            att_hm, sa["proj_w1"], sa["proj_b1"], sa["proj_w2"],
            sa["proj_b2"], H, hs, head_major=True,
        )
        return dropout(out, cfg.dropout, keys(), train)
    if packed_attention_active(T, hs, cfg.attn_impl):
        # short-T TPU path: packed projection -> packed kernel, one operand
        # each direction (see _qkv_project_packed)
        qkv = _qkv_project_packed(x_norm, sa, H, hs2)
        att = causal_attention_packed(
            qkv, H,
            dropout_rate=cfg.dropout,
            dropout_key=keys(),
            train=train,
            impl=cfg.attn_impl,
        )  # (M, B, H, T, hs)
    else:
        # measured on v5e (production config): fused 10.76 vs split 11.20 ms
        # fwd+bwd; batching the three projections wins despite the layout
        # copy the stacked-w2 einsum introduces
        q, k, v = _qkv_project_fused(x_norm, sa, H, hs2)

        att = causal_attention(
            q, k, v,
            dropout_rate=cfg.dropout,
            dropout_key=keys(),
            train=train,
            impl=cfg.attn_impl,
        )  # (M, B, H, T, hs)

    out = _proj_mlp_heads(
        att, sa["proj_w1"], sa["proj_b1"], sa["proj_w2"], sa["proj_b2"], H, hs
    )
    return dropout(out, cfg.dropout, keys(), train)


def cross_attention(
    query_x: jax.Array,
    kv_x: jax.Array,
    cp: Dict[str, jax.Array],
    cfg: ModelConfig,
    keys: KeyGen,
    train: bool,
) -> jax.Array:
    """Cross-attention for one modality.

    query_x: (B, T, C) — LN_cross output of the querying modality
    kv_x: (J, B, T, C) — post-SA/FF activations of the other modalities
    """
    B, T, C = query_x.shape
    H, hs = cfg.n_head, cfg.head_size
    hs_q = cp["q_w"].shape[-1]

    if cross_t_attention_active(T, hs_q, cfg.attn_impl):
        # short-T TPU path: emit q head-major and k/v in the projection
        # einsum's NATURAL layout — logical (J,H,B,hs,T), whose standard
        # layout is the physical form XLA's dot prefers — and hand them to
        # the transposed-KV kernel. The untransposed contract forces a
        # relayout copy per k/v tensor per layer between the einsum and the
        # kernel (measured ~310 us/step, production config).
        from ..ops.pallas_attention import short_cross_attention_t

        q = _mm("btc,hce->hbte", query_x, cp["q_w"])              # (H,B,T,hs)
        kT = _mm("jbtc,jhcf->jhbft", kv_x, cp["kv_w"][..., :hs_q])
        vT = _mm("jbtc,jhcf->jhbft", kv_x, cp["kv_w"][..., hs_q:])
        use_dropout = train and cfg.dropout > 0.0
        k_att = keys()  # consume the site unconditionally (stable numbering)
        att = short_cross_attention_t(
            q, kT, vT,
            dropout_rate=cfg.dropout if use_dropout else 0.0,
            dropout_key=k_att if use_dropout else None,
        )  # (H, B, T, hs)
        out = _proj_mlp_heads(
            att, cp["proj_w1"], cp["proj_b1"], cp["proj_w2"], cp["proj_b2"],
            H, hs, head_major=True,
        )
        return dropout(out, cfg.dropout, keys(), train)

    q = _mm("btc,hce->bhte", query_x, cp["q_w"])          # (B,H,T,hs)
    # split the WEIGHT (cheap) instead of slicing the (J,B,H,T,2hs)
    # activation in half — avoids two big activation copies per layer
    k = _mm("jbtc,jhcf->jbhtf", kv_x, cp["kv_w"][..., :hs_q])
    v = _mm("jbtc,jhcf->jbhtf", kv_x, cp["kv_w"][..., hs_q:])

    # One query stream against J KV streams, summed over J (reference:
    # model.py:158) — fused in-kernel on TPU when shapes are eligible.
    att = cross_causal_attention(
        q, k, v,
        dropout_rate=cfg.dropout,
        dropout_key=keys(),
        train=train,
        impl=cfg.attn_impl,
    )  # (B, H, T, hs)

    out = _proj_mlp_heads(
        att, cp["proj_w1"], cp["proj_b1"], cp["proj_w2"], cp["proj_b2"], H, hs
    )
    return dropout(out, cfg.dropout, keys(), train)


def feed_forward(
    x_norm: jax.Array, ff: Dict[str, jax.Array], cfg: ModelConfig, keys: KeyGen, train: bool
) -> jax.Array:
    """C -> 4C -> ReLU -> C -> dropout (reference: model.py:162-175)."""
    dt = x_norm.dtype
    h = _mm("mbtc,mcd->mbtd", x_norm, ff["w1"]) + ff["b1"].astype(dt)[:, None, None, :]
    h = jax.nn.relu(h)
    h = _mm("mbtd,mdc->mbtc", h, ff["w2"]) + ff["b2"].astype(dt)[:, None, None, :]
    return dropout(h, cfg.dropout, keys(), train)


def block_forward(
    x: jax.Array,
    block: Dict[str, Any],
    key: Optional[jax.Array],
    cfg: ModelConfig,
    train: bool,
) -> jax.Array:
    """One MultimodalBlock (reference: model.py:214-244). x: (M, B, T, C).

    Takes a per-block dropout key (not a shared splitter) so the block is a
    self-contained function of (x, block-params, key) — the unit
    ``jax.checkpoint`` rematerializes when cfg.remat is on.
    """
    keys = KeyGen(key)
    x = x + self_attention(
        layernorm(x, block["ln1"]["scale"], block["ln1"]["bias"]),
        block["sa"], cfg, keys, train,
    )
    x = x + feed_forward(
        layernorm(x, block["ln2"]["scale"], block["ln2"]["bias"]),
        block["ffwd"], cfg, keys, train,
    )

    if block["cross"]:
        # KV inputs are the post-SA/FF activations (x), frozen for all
        # modalities before any cross update is applied. Per-modality
        # unrolling measured FASTER than batching the querying modalities
        # over a leading axis (10.76 vs 11.28 ms fwd+bwd, production config,
        # v5e): batching forces a (N,J,B,T,C) activation gather and 6-D
        # batched matmuls whose layout copies outweigh the saved op count.
        updates = {}
        for i_str, cp in block["cross"].items():
            i = int(i_str)
            kv_idx = cfg.kv_modalities(i)
            if not kv_idx:
                continue
            kv_x = x[jnp.array(kv_idx)] if len(kv_idx) > 1 else x[kv_idx[0]][None]
            y = layernorm(x[i], cp["ln_scale"], cp["ln_bias"])
            updates[i] = x[i] + cross_attention(y, kv_x, cp, cfg, keys, train)
        if updates:
            x = jnp.stack(
                [updates.get(i, x[i]) for i in range(cfg.num_modalities)]
            )
    return x


@jax.custom_vjp
def _embed_lookup(tab: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched table lookup with a MATMUL backward.

    Forward is the natural batched gather. The autodiff backward of a gather
    is a scatter-add into the (M, Vp, C) table — measured ~102 us/step on
    the production config (v5e), vs ~30 us for the algebraically identical
    one-hot contraction dTab = Σ_bt onehot ⊗ dx, which runs on the MXU.
    Every product is exact (×1 or ×0, f32 accumulation), so gradients equal
    the scatter up to summation order."""
    return jax.vmap(lambda t, i: t[i])(tab, idx)


def _embed_lookup_fwd(tab, idx):
    # tab rides the residuals only for its shape/dtype (it is a live
    # parameter — no extra memory)
    return _embed_lookup(tab, idx), (idx, tab)


def _embed_lookup_bwd(res, g):
    idx, tab = res
    tab_dtype = tab.dtype
    Vp = tab.shape[-2]
    onehot = (idx[..., None] == jnp.arange(Vp, dtype=idx.dtype)).astype(g.dtype)
    acc = jnp.float64 if g.dtype == jnp.float64 else jnp.float32
    dtab = jnp.einsum(
        "mbtv,mbtc->mvc", onehot, g, preferred_element_type=acc
    ).astype(tab_dtype)
    return dtab, None


_embed_lookup.defvjp(_embed_lookup_fwd, _embed_lookup_bwd)


def embed(params: Dict[str, Any], cfg: ModelConfig, idx: jax.Array) -> jax.Array:
    """Token + shared positional embedding (reference: model.py:285-319).

    idx: (M, B, T) int32 -> (M, B, T, C)
    """
    T = idx.shape[-1]
    pos = params["pre"]["pos_emb"][:T]
    tabs = params["pre"]["tok_emb"]
    Vp = _round128(max(cfg.vocab_sizes))
    # pad the ragged per-modality tables to one (M, Vp, C) buffer so the
    # lookup is ONE batched gather instead of M gathers + a stack
    tab = jnp.stack([jnp.pad(t, ((0, Vp - t.shape[0]), (0, 0))) for t in tabs])
    if cfg.compute_dtype == "bfloat16":
        # cast table+pos BEFORE the lookup: the gather output (M,B,T,C) is
        # the largest embed buffer, and bf16 halves its HBM write/read
        tab = tab.astype(jnp.bfloat16)
        pos = pos.astype(jnp.bfloat16)
    return _embed_lookup(tab, idx) + pos


_HEAD_PAD_NEG = -1e30  # padded-class logit; exp(-1e30 - max) underflows to 0.0
                       # EXACTLY in f32/f64, so padded log_softmax is
                       # bit-identical to the unpadded one on real classes


def _round128(n: int) -> int:
    return ((n + 127) // 128) * 128


def logits_heads_padded(
    params: Dict[str, Any], cfg: ModelConfig, x: jax.Array
) -> jax.Array:
    """All vocab heads in ONE batched matmul chain over a padded vocab.

    The per-modality heads have ragged vocab sizes (e.g. 500/120/24/48); the
    reference runs them as four separate module calls (model.py:322-352).
    Here the head weights pad at trace time to a shared lane-aligned width
    and stack over the modality axis, so LN + both head matmuls + the
    cross-entropy log_softmax run batched. Padded classes get a -1e30 bias
    through zeroed weight columns — exp underflows to exactly 0.0, so
    softmax/CE/argmax over the real classes are bit-identical to the
    unpadded computation (pinned by the float64 reference-parity test).

    Returns (M, B, T, Vp) logits in f32 (f64 under the float64 path).
    """
    post = params["post"]
    M = cfg.num_modalities
    Vs = list(cfg.vocab_sizes)
    Hs = [v // 2 for v in Vs]
    Vp = _round128(max(Vs))
    Hp = _round128(max(Hs))

    w1 = jnp.stack([
        jnp.pad(h["w1"], ((0, 0), (0, Hp - h["w1"].shape[1])))
        for h in post["heads"]
    ])                                                       # (M, C, Hp)
    b1 = jnp.stack([
        jnp.pad(h["b1"], (0, Hp - h["b1"].shape[0])) for h in post["heads"]
    ])                                                       # (M, Hp)
    w2 = jnp.stack([
        jnp.pad(h["w2"], ((0, Hp - h["w2"].shape[0]), (0, Vp - h["w2"].shape[1])))
        for h in post["heads"]
    ])                                                       # (M, Hp, Vp)
    b2 = jnp.stack([
        jnp.pad(h["b2"], (0, Vp - h["b2"].shape[0]),
                constant_values=_HEAD_PAD_NEG)
        for h in post["heads"]
    ])                                                       # (M, Vp)

    h = layernorm(x, post["ln_scale"], post["ln_bias"])
    dt = h.dtype
    t = jnp.tanh(_mm("mbtc,mch->mbth", h, w1) + b1.astype(dt)[:, None, None, :])
    logits = _mm("mbth,mhv->mbtv", t, w2)
    acc = jnp.float64 if dt == jnp.float64 else jnp.float32
    return logits.astype(acc) + b2.astype(acc)[:, None, None, :]


def logits_heads(
    params: Dict[str, Any], cfg: ModelConfig, x: jax.Array
) -> List[jax.Array]:
    """Per-modality LN + vocab//2 tanh-MLP head (reference: model.py:322-352).

    API-compatible list view over the batched padded computation."""
    padded = logits_heads_padded(params, cfg, x)
    return [padded[m, ..., : v] for m, v in enumerate(cfg.vocab_sizes)]


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean token-level CE over all positions (reference: model.py:392-400)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll.mean()


def cross_entropy_padded(logits_pad: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-modality mean CE over padded batched logits.

    logits_pad: (M, B, T, Vp) with -1e30 on padded classes (exactly zero
    probability mass); targets: (M, B, T) < real vocab size. Returns (M,).
    """
    logp = jax.nn.log_softmax(logits_pad, axis=-1)
    # one-hot select + reduce instead of take_along_axis: a last-axis gather
    # of single elements is lane-hostile on TPU (measured 120 us/step on the
    # production config vs ~25 us for the select-reduce, which fuses with
    # the log_softmax read). where(==) picks exactly one element per row, so
    # the result is bit-identical to the gather in every dtype.
    Vp = logp.shape[-1]
    onehot = targets[..., None] == jnp.arange(Vp, dtype=targets.dtype)
    nll = -jnp.sum(jnp.where(onehot, logp, jnp.zeros((), logp.dtype)), axis=-1)
    return nll.mean(axis=(1, 2))


def forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    idx: jax.Array,
    targets: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> Tuple[List[jax.Array], Optional[List[jax.Array]]]:
    """Full forward pass.

    idx: (M, B, T) int32 stacked token ids (all modalities share B, T).
    Returns (logits_list, losses_list) like the reference's
    ``MultimodalTransformer.forward`` (model.py:380-402); losses_list is None
    when targets is None.
    """
    keys = KeyGen(rng)
    x = embed(params, cfg, idx)
    blk = block_forward
    if cfg.remat and train:
        # Recompute each block in the backward pass instead of storing its
        # activations (optional: trades recompute FLOPs for HBM traffic —
        # useful at long block_size / large batch). prevent_cse is safe to
        # disable under jit/scan.
        blk = jax.checkpoint(
            block_forward,
            static_argnums=(3, 4),
            policy=jax.checkpoint_policies.nothing_saveable,
            prevent_cse=False,
        )
    for block in params["blocks"]:
        x = blk(x, block, keys(), cfg, train)
    padded = logits_heads_padded(params, cfg, x)
    logits_list = [padded[m, ..., : v] for m, v in enumerate(cfg.vocab_sizes)]

    if targets is None:
        return logits_list, None
    # batched CE over the padded logits (one log_softmax for all modalities;
    # the per-modality slicing above is dead code under the training loss
    # and folds away)
    losses = cross_entropy_padded(padded, targets)
    losses_list = [losses[m] for m in range(cfg.num_modalities)]
    return logits_list, losses_list


def total_loss(
    params: Dict[str, Any],
    cfg: ModelConfig,
    idx: jax.Array,
    targets: jax.Array,
    rng: Optional[jax.Array] = None,
    train: bool = True,
) -> Tuple[jax.Array, List[jax.Array]]:
    """Summed multimodal loss (reference: main.py:645-646)."""
    _, losses = forward(params, cfg, idx, targets, rng, train)
    return jnp.sum(jnp.stack(losses)), losses


def generate(
    params: Dict[str, Any],
    cfg: ModelConfig,
    idx_list: Sequence[jax.Array],
    key: jax.Array,
    max_new_tokens: int = 1,
    modality_to_generate: int = 0,
) -> List[jax.Array]:
    """Autoregressive sampling for one modality (reference: model.py:404-446).

    Other modalities are kept length-consistent by repeating their last token
    (reference: model.py:434-444). Sampling is multinomial over the softmax of
    the last position (jax.random.categorical == multinomial-over-softmax).
    """
    seqs = [jnp.asarray(x) for x in idx_list]
    for _ in range(max_new_tokens):
        cond = [s[:, -cfg.block_size :] for s in seqs]
        t = max(c.shape[1] for c in cond)
        # pad shorter streams on the left by repeating their first token so
        # shapes stack; the reference keeps lengths equal by construction.
        cond = [
            jnp.pad(c, ((0, 0), (t - c.shape[1], 0)), mode="edge") for c in cond
        ]
        logits_list, _ = forward(params, cfg, jnp.stack(cond), train=False)
        logits = logits_list[modality_to_generate][:, -1, :]
        key, sub = jax.random.split(key)
        idx_next = jax.random.categorical(sub, logits, axis=-1)[:, None]
        seqs[modality_to_generate] = jnp.concatenate(
            [seqs[modality_to_generate], idx_next], axis=1
        )
        target_len = seqs[modality_to_generate].shape[1]
        for i in range(cfg.num_modalities):
            if i == modality_to_generate:
                continue
            if seqs[i].shape[1] < target_len:
                seqs[i] = jnp.concatenate([seqs[i], seqs[i][:, -1:]], axis=1)
            elif seqs[i].shape[1] > target_len:
                seqs[i] = seqs[i][:, :target_len]
    return seqs
