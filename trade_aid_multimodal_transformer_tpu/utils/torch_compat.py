"""Reference (PyTorch) checkpoint conversion.

Users migrating from the reference framework have ``model.pth`` state_dicts
saved by ``torch.save(m.state_dict(), ...)`` (reference: main.py:627-637).
This module maps that layout onto this framework's parameter pytree
(models/init.py docstring) so training can resume from reference weights and
— used in reverse by the test suite — so our forward pass can be checked
bit-for-bit against reference logits.

Reference module tree (state_dict key prefixes, reference: model.py):
    pre_block.token_embedding_tables.{i}.weight        (V_i, C)
    pre_block.position_embedding_table.weight          (block, C)
    blocks.{l}.sa_layers.{m}.heads.{h}.{key|query|value}.0.{weight,bias}
    blocks.{l}.sa_layers.{m}.heads.{h}.{key|query|value}.2.weight
    blocks.{l}.sa_layers.{m}.proj.{0,2}.{weight,bias}
    blocks.{l}.ffwd_layers.{m}.net.{0,2}.{weight,bias}
    blocks.{l}.{ln1|ln2}_layers.{m}.{weight,bias}
    blocks.{l}.cross_attention_layers.{i}.heads.{h}.query.weight
    blocks.{l}.cross_attention_layers.{i}.heads.{h}.kv_projections.{j}.weight
    blocks.{l}.cross_attention_layers.{i}.proj.{0,2}.{weight,bias}
    blocks.{l}.ln_cross_layers.{i}.{weight,bias}
    post_block.fin_norm_layers.{m}.{weight,bias}
    post_block.soft_score_layers.{m}.{0,2}.{weight,bias}

torch Linear stores weight as (out, in); our layout is (in, out) so every
weight transposes. Per-head Linears concatenate head-major. ``tril`` buffers
are masks, not parameters — skipped.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np
import jax.numpy as jnp

from ..models.config import ModelConfig


def _t(a: np.ndarray) -> np.ndarray:
    return np.asarray(a).T


def convert_reference_state_dict(
    state: Mapping[str, np.ndarray], cfg: ModelConfig
) -> Dict[str, Any]:
    """Build this framework's parameter pytree from a reference state_dict
    (values as numpy arrays)."""
    M, C, H = cfg.num_modalities, cfg.n_embd, cfg.n_head
    hs = cfg.head_size
    hs2 = hs // 2

    def get(key):
        return np.asarray(state[key])

    params: Dict[str, Any] = {
        "pre": {
            "tok_emb": [
                jnp.asarray(get(f"pre_block.token_embedding_tables.{i}.weight"))
                for i in range(M)
            ],
            "pos_emb": jnp.asarray(get("pre_block.position_embedding_table.weight")),
        },
        "blocks": [],
    }

    for l in range(cfg.n_layer):
        pb = f"blocks.{l}"
        block: Dict[str, Any] = {"sa": {}, "cross": {}}

        for name, torch_name in (("k", "key"), ("q", "query"), ("v", "value")):
            w1 = np.stack(
                [
                    np.concatenate(
                        [
                            _t(get(f"{pb}.sa_layers.{m}.heads.{h}.{torch_name}.0.weight"))
                            for h in range(H)
                        ],
                        axis=1,
                    )
                    for m in range(M)
                ]
            )  # (M, C, H*hs2)
            b1 = np.stack(
                [
                    np.concatenate(
                        [
                            get(f"{pb}.sa_layers.{m}.heads.{h}.{torch_name}.0.bias")
                            for h in range(H)
                        ]
                    )
                    for m in range(M)
                ]
            )
            w2 = np.stack(
                [
                    np.stack(
                        [
                            _t(get(f"{pb}.sa_layers.{m}.heads.{h}.{torch_name}.2.weight"))
                            for h in range(H)
                        ]
                    )
                    for m in range(M)
                ]
            )  # (M, H, hs2, hs)
            block["sa"][f"w1_{name}"] = jnp.asarray(w1)
            block["sa"][f"b1_{name}"] = jnp.asarray(b1)
            block["sa"][f"w2_{name}"] = jnp.asarray(w2)

        block["sa"]["proj_w1"] = jnp.asarray(
            np.stack([_t(get(f"{pb}.sa_layers.{m}.proj.0.weight")) for m in range(M)])
        )
        block["sa"]["proj_b1"] = jnp.asarray(
            np.stack([get(f"{pb}.sa_layers.{m}.proj.0.bias") for m in range(M)])
        )
        block["sa"]["proj_w2"] = jnp.asarray(
            np.stack([_t(get(f"{pb}.sa_layers.{m}.proj.2.weight")) for m in range(M)])
        )
        block["sa"]["proj_b2"] = jnp.asarray(
            np.stack([get(f"{pb}.sa_layers.{m}.proj.2.bias") for m in range(M)])
        )

        block["ffwd"] = {
            "w1": jnp.asarray(
                np.stack([_t(get(f"{pb}.ffwd_layers.{m}.net.0.weight")) for m in range(M)])
            ),
            "b1": jnp.asarray(
                np.stack([get(f"{pb}.ffwd_layers.{m}.net.0.bias") for m in range(M)])
            ),
            "w2": jnp.asarray(
                np.stack([_t(get(f"{pb}.ffwd_layers.{m}.net.2.weight")) for m in range(M)])
            ),
            "b2": jnp.asarray(
                np.stack([get(f"{pb}.ffwd_layers.{m}.net.2.bias") for m in range(M)])
            ),
        }
        for ln in ("ln1", "ln2"):
            block[ln] = {
                "scale": jnp.asarray(
                    np.stack([get(f"{pb}.{ln}_layers.{m}.weight") for m in range(M)])
                ),
                "bias": jnp.asarray(
                    np.stack([get(f"{pb}.{ln}_layers.{m}.bias") for m in range(M)])
                ),
            }

        for i in range(M):
            if not (cfg.cross_attention[i] and M > 1):
                continue
            cb = f"{pb}.cross_attention_layers.{i}"
            J = M - 1
            block["cross"][str(i)] = {
                "q_w": jnp.asarray(
                    np.stack(
                        [_t(get(f"{cb}.heads.{h}.query.weight")) for h in range(H)]
                    )
                ),
                "kv_w": jnp.asarray(
                    np.stack(
                        [
                            np.stack(
                                [
                                    _t(get(f"{cb}.heads.{h}.kv_projections.{j}.weight"))
                                    for h in range(H)
                                ]
                            )
                            for j in range(J)
                        ]
                    )
                ),
                "proj_w1": jnp.asarray(_t(get(f"{cb}.proj.0.weight"))),
                "proj_b1": jnp.asarray(get(f"{cb}.proj.0.bias")),
                "proj_w2": jnp.asarray(_t(get(f"{cb}.proj.2.weight"))),
                "proj_b2": jnp.asarray(get(f"{cb}.proj.2.bias")),
                "ln_scale": jnp.asarray(get(f"{pb}.ln_cross_layers.{i}.weight")),
                "ln_bias": jnp.asarray(get(f"{pb}.ln_cross_layers.{i}.bias")),
            }
        params["blocks"].append(block)

    params["post"] = {
        "ln_scale": jnp.asarray(
            np.stack([get(f"post_block.fin_norm_layers.{m}.weight") for m in range(M)])
        ),
        "ln_bias": jnp.asarray(
            np.stack([get(f"post_block.fin_norm_layers.{m}.bias") for m in range(M)])
        ),
        "heads": [
            {
                "w1": jnp.asarray(_t(get(f"post_block.soft_score_layers.{m}.0.weight"))),
                "b1": jnp.asarray(get(f"post_block.soft_score_layers.{m}.0.bias")),
                "w2": jnp.asarray(_t(get(f"post_block.soft_score_layers.{m}.2.weight"))),
                "b2": jnp.asarray(get(f"post_block.soft_score_layers.{m}.2.bias")),
            }
            for m in range(M)
        ],
    }
    return params


def load_reference_checkpoint(path: str, cfg: ModelConfig) -> Dict[str, Any]:
    """Load a reference ``model.pth`` into this framework's pytree."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return convert_reference_state_dict(
        {k: v.numpy() for k, v in state.items()}, cfg
    )
