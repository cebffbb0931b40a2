"""Measure the flash-vs-dense crossover on the real chip.

The auto dispatch (ops/attention.py) should route to a Pallas kernel only
where the kernel actually wins. This sweeps fwd+bwd time for the dense core,
the blockwise flash kernels, and the short-context whole-row kernel across
sequence lengths at the flagship head shape and prints ms + ratio per T —
the data behind MIN_FLASH_SEQ_LEN and the short-kernel band.

Timing method: the tunneled TPU adds ~25 ms of host dispatch/sync per jitted
call — far more than the op under test at small T — so each timed unit is
ONE dispatch of a lax.scan over REPS fwd+bwd applications chained through
the carry (dq feeds the next q, preventing hoisting/overlap). An earlier
per-call version of this tool carried that dispatch latency in every number,
which compressed all ratios toward 1 and misplaced the crossover.

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


def make_timer(core, k, v, reps):
    """Scan-amortized fwd+bwd seconds/application for one attention core."""
    g = jax.grad(
        lambda q, k, v: (core(q, k, v) ** 2).sum().astype(jnp.float32),
        argnums=(0, 1, 2),
    )

    def body(qc, _):
        dq, _, _ = g(qc, k, v)
        qc = dq * jax.lax.rsqrt(
            jnp.mean(dq.astype(jnp.float32) ** 2) + 1e-6
        ).astype(dq.dtype)
        return qc, ()

    def run(q):
        f = jax.jit(lambda q: jax.lax.scan(body, q, (), length=reps)[0])
        dsync(f(q))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            dsync(f(q))
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--hs", type=int, default=64)
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from trade_aid_multimodal_transformer_tpu.ops.attention import (
        causal_attention_jnp,
    )
    from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (
        flash_attention_eligible,
        flash_causal_attention,
        short_attention_eligible,
        short_causal_attention,
    )

    print(f"backend={jax.default_backend()} shape=(B={args.batch},H={args.heads},"
          f"T,hs={args.hs}) dtype={args.dtype} (scan-amortized)")
    print(f"{'T':>6} {'dense ms':>10} {'flash ms':>10} {'short ms':>10} "
          f"{'dense/flash':>12} {'dense/short':>12}")
    for t in (64, 128, 256, 512, 1024, 2048, 4096, 8192):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(s, (args.batch, args.heads, t, args.hs), dt)
                   for s in ks)
        # keep each timed dispatch ~10 flash-applications of work at T=4096
        reps = max(2, min(32, (4096 * 10) // t))

        td = make_timer(causal_attention_jnp, k, v, reps)(q)
        tf = (make_timer(flash_causal_attention, k, v, reps)(q)
              if flash_attention_eligible(q, k, v) else None)
        tsh = (make_timer(short_causal_attention, k, v, reps)(q)
               if short_attention_eligible(q, k, v) else None)

        fm = f"{tf*1e3:>10.3f}" if tf else f"{'—':>10}"
        sm = f"{tsh*1e3:>10.3f}" if tsh else f"{'—':>10}"
        fr = f"{td/tf:>12.2f}" if tf else f"{'—':>12}"
        sr = f"{td/tsh:>12.2f}" if tsh else f"{'—':>12}"
        print(f"{t:>6} {td*1e3:>10.3f} {fm} {sm} {fr} {sr}")


if __name__ == "__main__":
    main()
