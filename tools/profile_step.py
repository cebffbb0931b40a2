"""Decompose the production train step's time on the real chip.

Times, separately jitted (amortized over inner lax.scan iterations so
per-dispatch overhead doesn't pollute the attribution):
- forward loss only
- forward + backward (value_and_grad)
- optimizer update only (grads precomputed)
- batch sample + augment only
- the full fused train step (the trainer's real program)

Usage:  python tools/profile_step.py [--dtype bfloat16] [--steps 50]
"""

import argparse
import sys
import time
from pathlib import Path

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
    return x


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dropout", type=float, default=0.2)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.models.transformer import total_loss
    from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
    from trade_aid_multimodal_transformer_tpu.train.metrics import build_metric_specs
    from trade_aid_multimodal_transformer_tpu.train.steps import (
        Trainer, make_optimizer, to_impl_key,
    )

    cfg = ModelConfig(
        vocab_sizes=(500, 120, 24, 48), cross_attention=(True, True, False, False),
        n_embd=384, n_head=6, n_layer=6, block_size=args.block,
        dropout=args.dropout, compute_dtype=args.dtype, remat=args.remat,
    )
    rng = np.random.default_rng(0)
    n_rows, n_val = 1_000_000, 100_000
    train = [rng.integers(0, v, n_rows - n_val).astype(np.int32) for v in cfg.vocab_sizes]
    val = [rng.integers(0, v, n_val).astype(np.int32) for v in cfg.vocab_sizes]
    feed = BatchFeed(train, val, [n_rows], cfg.block_size, args.batch,
                     is_percents=False, rand_sizes=[2, 2, None, None],
                     vocab_sizes=list(cfg.vocab_sizes))
    optimizer = make_optimizer(1e-3, "bfloat16", "bfloat16")
    specs = build_metric_specs(
        [np.linspace(-1, 1, v).tolist() for v in cfg.vocab_sizes],
        [False] * 4, cfg.block_size)
    trainer = Trainer(cfg, feed, optimizer, specs, 40)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)

    n = args.steps
    key = to_impl_key(jax.random.PRNGKey(0), trainer.rng_impl)
    xb, yb = feed._sample_impl(key, split="train", augment=True)

    def timeit(name, fn, *a, repeats=3):
        out = fn(*a)
        dsync(out)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            dsync(fn(*a))
            best = min(best, (time.perf_counter() - t0) / n)
        print(f"{name:<28}{best*1e3:8.3f} ms/step")
        return best

    # 1) forward only (train-mode dropout active)
    @jax.jit
    def fwd_scan(params, key):
        def body(c, k):
            return c, total_loss(params, cfg, xb, yb, k, True)[0]
        _, losses = jax.lax.scan(body, 0, jax.random.split(key, n))
        return losses

    # 2) forward+backward (sum-reduce every grad leaf so none is DCE'd)
    @jax.jit
    def grad_scan(params, key):
        def body(c, k):
            (l, _), g = jax.value_and_grad(total_loss, has_aux=True)(
                params, cfg, xb, yb, k, True)
            keep = sum(jnp.sum(x.astype(jnp.float32))
                       for x in jax.tree_util.tree_leaves(g))
            return c, (l, keep)
        _, out = jax.lax.scan(body, 0, jax.random.split(key, n))
        return out

    # 3) optimizer update only
    grads = jax.jit(
        lambda p, k: jax.grad(total_loss, has_aux=True)(p, cfg, xb, yb, k, True)[0]
    )(params, key)
    dsync(grads)

    @jax.jit
    def opt_scan(params, opt_state, grads):
        def body(c, _):
            p, o = c
            updates, o = optimizer.update(grads, o, p)
            import optax
            p = optax.apply_updates(p, updates)
            return (p, o), updates["pre"]["pos_emb"][0, 0]
        (p, o), u = jax.lax.scan(body, (params, opt_state), None, length=n)
        return u

    # 4) sample+augment only (sum so gathers aren't DCE'd)
    @jax.jit
    def sample_scan(key):
        def body(c, k):
            xb, yb = feed._sample_impl(k, split="train", augment=True)
            return c, xb.sum() + yb.sum()
        _, out = jax.lax.scan(body, 0, jax.random.split(key, n))
        return out

    # 5) the real fused train chunk
    def full(params, opt_state, key):
        return trainer.train_chunk(params, opt_state, key, n)

    t_fwd = timeit("forward only", fwd_scan, params, key)
    t_grad = timeit("forward+backward", grad_scan, params, key)
    t_opt = timeit("optimizer update", opt_scan, params, opt_state, grads)
    t_samp = timeit("sample+augment", sample_scan, key)

    # full step donates; run it last with copies
    p2 = jax.tree.map(jnp.array, params)
    o2 = jax.tree.map(jnp.array, opt_state)
    out = full(p2, o2, jax.random.PRNGKey(1))
    dsync(out)
    p2, o2, _ = out
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = full(p2, o2, jax.random.PRNGKey(2 + i))
        dsync(out)
        p2, o2, _ = out
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{'full train step':<28}{best*1e3:8.3f} ms/step  "
          f"({1.0/best:.1f} steps/s)")
    print(f"bwd/fwd ratio: {(t_grad - t_fwd) / t_fwd:.2f}x extra over forward "
          f"(total {t_grad / t_fwd:.2f}x)")
    print(f"sum of parts (grad+opt+sample): {(t_grad + t_opt + t_samp)*1e3:.3f} ms")


if __name__ == "__main__":
    main()
