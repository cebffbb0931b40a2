"""Measure the MXU default-precision deviation on real TPU hardware.

TPU MXUs multiply in bfloat16 by default even for float32 operands
(accumulation stays f32). The reference's torch-CPU matmuls are true f32
(reference: model.py:65-72), so f32 training on TPU carries a small numeric
deviation unless ``tpu_options.matmul_precision: float32`` is set. This
script quantifies it: one attention layer's forward under 'default' vs
'float32' matmul precision, both diffed against a float64 oracle.

Run on a TPU host:  python tools/tpu_precision_check.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from trade_aid_multimodal_transformer_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()
import numpy as np

from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
from trade_aid_multimodal_transformer_tpu.models.init import init_params
from trade_aid_multimodal_transformer_tpu.models.transformer import forward


def main():
    print(f"backend: {jax.default_backend()}")
    cfg = ModelConfig(
        vocab_sizes=(64, 64), cross_attention=(True, False),
        n_embd=128, n_head=4, n_layer=1, block_size=512, dropout=0.0,
        attn_impl="jnp",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        np.stack([rng.integers(0, v, (4, cfg.block_size)) for v in cfg.vocab_sizes])
        .astype(np.int32)
    )

    def logits0(p, i):
        return forward(p, cfg, i, train=False)[0][0]

    outs = {}
    for name in ("default", "float32"):
        with jax.default_matmul_precision(name):
            outs[name] = np.asarray(jax.jit(logits0)(params, idx), np.float64)

    # float64 oracle (CPU path: enable x64 in a subprocess-free way by
    # upcasting params/embeddings and running the same math in f64 on host)
    jax.config.update("jax_enable_x64", True)
    try:
        p64 = jax.tree.map(lambda x: np.asarray(x, np.float64), params)
        with jax.default_matmul_precision("highest"):
            oracle = np.asarray(
                jax.jit(logits0, backend="cpu")(p64, np.asarray(idx)), np.float64
            )
    finally:
        jax.config.update("jax_enable_x64", False)

    for name, out in outs.items():
        err = np.max(np.abs(out - oracle))
        print(f"matmul_precision={name!r}: max |logits - f64 oracle| = {err:.3e}")
    gap = np.max(np.abs(outs["default"] - outs["float32"]))
    print(f"default vs float32 on-chip gap: {gap:.3e}")


if __name__ == "__main__":
    main()
