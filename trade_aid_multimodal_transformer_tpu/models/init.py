"""Parameter initialization for the multimodal transformer.

Weight distribution matches the reference: every Linear weight and embedding
table ~ N(0, 0.02), biases zero, LayerNorm scale 1 / bias 0
(reference: model.py:370-378). Exact draws differ (different RNG), which is
fine — parity tests load converted reference checkpoints instead
(utils/torch_compat.py).

Parameter layout (pure pytree of jnp arrays; M = num_modalities,
C = n_embd, H = n_head, hs = C//H, hs2 = hs//2, C2 = C//2):

    pre:
      tok_emb: [ (V_i, C) per modality ]        # ragged -> python list
      pos_emb: (block_size, C)                  # shared positional table
    blocks: [ per layer:
      ln1/ln2:  scale (M, C), bias (M, C)
      sa:       w1_{k,q,v} (M, C, H*hs2), b1_* (M, H*hs2),
                w2_{k,q,v} (M, H, hs2, hs)      # factored tanh-MLP QKV (Q6)
                proj_w1 (M, H*hs, C2), proj_b1 (M, C2),
                proj_w2 (M, C2, C),   proj_b2 (M, C)
      ffwd:     w1 (M, C, 4C), b1 (M, 4C), w2 (M, 4C, C), b2 (M, C)
      cross:    { str(i): per cross-enabled modality i:
                  q_w (H, C, hs),
                  kv_w (J_i, H, C, 2*hs),       # J_i = other modalities
                  proj_w1 (H*hs, C2), proj_b1 (C2,),
                  proj_w2 (C2, C),    proj_b2 (C,),
                  ln_scale (C,), ln_bias (C,) }
    ]
    post:
      ln_scale (M, C), ln_bias (M, C)
      heads: [ per modality: w1 (C, V_i//2), b1 (V_i//2,),
                             w2 (V_i//2, V_i), b2 (V_i,) ]

Self-attention/FFN params are stacked over the modality axis so all
modalities run as one batched matmul set on the MXU; ragged structures
(embeddings, vocab heads, cross-attention) stay per-modality.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .config import ModelConfig

INIT_STD = 0.02


def _normal(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * INIT_STD


def init_params(key: jax.Array, cfg: ModelConfig) -> Dict[str, Any]:
    M = cfg.num_modalities
    C = cfg.n_embd
    H = cfg.n_head
    hs = cfg.head_size
    hs2 = hs // 2
    C2 = C // 2

    def nk():
        nonlocal key
        key, sub = jax.random.split(key)
        return sub

    params: Dict[str, Any] = {
        "pre": {
            "tok_emb": [_normal(nk(), (V, C)) for V in cfg.vocab_sizes],
            "pos_emb": _normal(nk(), (cfg.block_size, C)),
        },
        "blocks": [],
    }

    for _ in range(cfg.n_layer):
        block: Dict[str, Any] = {
            "ln1": {"scale": jnp.ones((M, C)), "bias": jnp.zeros((M, C))},
            "ln2": {"scale": jnp.ones((M, C)), "bias": jnp.zeros((M, C))},
            "sa": {
                "proj_w1": _normal(nk(), (M, H * hs, C2)),
                "proj_b1": jnp.zeros((M, C2)),
                "proj_w2": _normal(nk(), (M, C2, C)),
                "proj_b2": jnp.zeros((M, C)),
            },
            "ffwd": {
                "w1": _normal(nk(), (M, C, 4 * C)),
                "b1": jnp.zeros((M, 4 * C)),
                "w2": _normal(nk(), (M, 4 * C, C)),
                "b2": jnp.zeros((M, C)),
            },
            "cross": {},
        }
        for name in ("k", "q", "v"):
            block["sa"][f"w1_{name}"] = _normal(nk(), (M, C, H * hs2))
            block["sa"][f"b1_{name}"] = jnp.zeros((M, H * hs2))
            block["sa"][f"w2_{name}"] = _normal(nk(), (M, H, hs2, hs))

        for i in range(M):
            if cfg.cross_attention[i] and M > 1:
                J = M - 1
                block["cross"][str(i)] = {
                    "q_w": _normal(nk(), (H, C, hs)),
                    "kv_w": _normal(nk(), (J, H, C, 2 * hs)),
                    "proj_w1": _normal(nk(), (H * hs, C2)),
                    "proj_b1": jnp.zeros((C2,)),
                    "proj_w2": _normal(nk(), (C2, C)),
                    "proj_b2": jnp.zeros((C,)),
                    "ln_scale": jnp.ones((C,)),
                    "ln_bias": jnp.zeros((C,)),
                }
        params["blocks"].append(block)

    params["post"] = {
        "ln_scale": jnp.ones((M, C)),
        "ln_bias": jnp.zeros((M, C)),
        "heads": [
            {
                "w1": _normal(nk(), (C, V // 2)),
                "b1": jnp.zeros((V // 2,)),
                "w2": _normal(nk(), (V // 2, V)),
                "b2": jnp.zeros((V,)),
            }
            for V in cfg.vocab_sizes
        ],
    }
    return params


def count_params(params) -> int:
    """Exact trainable parameter count."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
