"""Ablate the dropout implementation to attribute its step-time cost.

Modes (TAID_DROPOUT_ABLATE): scale (no mask — pure elementwise),
trivial (key-free iota mask — mask structure without hashing),
bernoulli (PRNG-bits mask), hash (default — salted integer hash).

Run on a TPU host:  python tools/dropout_ablation.py <mode>
"""

import os
import sys
import time
from pathlib import Path

mode = sys.argv[1] if len(sys.argv) > 1 else "hash"
if mode != "hash":
    os.environ["TAID_DROPOUT_ABLATE"] = mode

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

import jax
import jax.numpy as jnp

from trade_aid_multimodal_transformer_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def dsync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def main():
    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.models.transformer import total_loss

    n = 30
    rng = np.random.default_rng(0)
    B, T = 32, 64

    cfg = ModelConfig(
        vocab_sizes=(500, 120, 24, 48),
        cross_attention=(True, True, False, False),
        n_embd=384, n_head=6, n_layer=6, block_size=T,
        dropout=0.2, compute_dtype="bfloat16",
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    xb = jnp.asarray(np.stack(
        [rng.integers(0, v, (B, T)) for v in cfg.vocab_sizes]).astype(np.int32))
    yb = jnp.asarray(np.stack(
        [rng.integers(0, v, (B, T)) for v in cfg.vocab_sizes]).astype(np.int32))

    key = jax.random.wrap_key_data(
        jnp.tile(jnp.asarray([0, 1], jnp.uint32), 2)[:4], impl="unsafe_rbg"
    ) if jax.default_backend() == "tpu" else jax.random.PRNGKey(0)

    def bench(name, grad):
        if grad:
            @jax.jit
            def run(params, key):
                def body(c, k):
                    (l, _), g = jax.value_and_grad(total_loss, has_aux=True)(
                        params, cfg, xb, yb, k, True)
                    keep = sum(jnp.sum(x.astype(jnp.float32))
                               for x in jax.tree_util.tree_leaves(g))
                    return c, (l, keep)
                _, out = jax.lax.scan(body, 0, jax.random.split(key, n))
                return out
        else:
            @jax.jit
            def run(params, key):
                def body(c, k):
                    return c, total_loss(params, cfg, xb, yb, k, True)[0]
                _, out = jax.lax.scan(body, 0, jax.random.split(key, n))
                return out

        out = run(params, key)
        dsync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            dsync(run(params, key))
            best = min(best, (time.perf_counter() - t0) / n)
        print(f"{mode:<12}{name:<12}{best*1e3:8.3f} ms/step", flush=True)

    bench("fwd", False)
    bench("fwd+bwd", True)


if __name__ == "__main__":
    main()
