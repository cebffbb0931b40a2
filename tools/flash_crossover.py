"""Measure the flash-vs-dense crossover on the real chip.

The auto dispatch (ops/attention.py) should route to the Pallas kernel only
where the kernel actually wins. This sweeps fwd+bwd time for both
implementations across sequence lengths at the flagship head shape and
prints the ratio per T — the data behind MIN_FLASH_SEQ_LEN.

Run on a TPU host:  python tools/flash_crossover.py [--dtype bfloat16]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

from trade_aid_multimodal_transformer_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def dsync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--hs", type=int, default=64)
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from trade_aid_multimodal_transformer_tpu.ops.attention import causal_attention

    print(f"backend={jax.default_backend()} shape=(B={args.batch},H={args.heads},"
          f"T,hs={args.hs}) dtype={args.dtype}")
    print(f"{'T':>6} {'dense ms':>10} {'flash ms':>10} {'ratio':>7}")
    # 64/128 exercise the short-context whole-row kernel; >=256 the
    # blockwise flash kernels (ops/pallas_attention.py dispatch bands)
    for t in (64, 128, 256, 512, 1024, 2048, 4096, 8192):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(s, (args.batch, args.heads, t, args.hs), dt)
                   for s in ks)

        def fwd_bwd(impl):
            f = jax.jit(jax.grad(
                lambda q, k, v: (causal_attention(q, k, v, impl=impl) ** 2)
                .sum().astype(jnp.float32),
                argnums=(0, 1, 2)))
            dsync(f(q, k, v))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                dsync(f(q, k, v))
                best = min(best, time.perf_counter() - t0)
            return best

        td = fwd_bwd("jnp")
        tf = fwd_bwd("pallas")
        print(f"{t:>6} {td*1e3:>10.3f} {tf*1e3:>10.3f} {td/tf:>7.2f}")


if __name__ == "__main__":
    main()
