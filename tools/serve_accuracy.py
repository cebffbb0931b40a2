"""Measure the serving-mode approximation's stream impact per `refresh`.

``generate_serve`` trades exactness for throughput past a full window: every
``refresh`` tokens it rebuilds the cache from the last ``block_size -
refresh`` tokens, so intra-chunk decodes see a slightly shorter history than
the faithful sliding window (models/cache.py module docstring). This tool
quantifies that: it briefly trains the production-shaped model on synthetic
data (so logits are peaked — an untrained model would hide any divergence),
generates the SAME prompt + key with the faithful full-window path
(``generate_fast``) and with ``generate_serve`` at each refresh value, and
reports token agreement over the generated stream — the end-to-end metric a
serving user cares about: identical sampling keys, so the first disagreement
is the first time the window approximation changed a sampled token.

Run on a TPU host:
  python tools/serve_accuracy.py [--new 512] [--refresh 128 256 512]
"""

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--new", type=int, default=512)
    ap.add_argument("--refresh", type=int, nargs="+", default=[64, 128, 256, 512])
    ap.add_argument("--train-steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from trade_aid_multimodal_transformer_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from trade_aid_multimodal_transformer_tpu.models.cache import generate_serve
    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.models.sampler import generate_fast
    from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
    from trade_aid_multimodal_transformer_tpu.train.metrics import (
        build_metric_specs,
    )
    from trade_aid_multimodal_transformer_tpu.train.steps import (
        Trainer,
        make_optimizer,
    )

    def fetch(x):
        return np.asarray(jax.device_get(x))

    cfg = ModelConfig(
        vocab_sizes=(500, 120, 24, 48),
        cross_attention=(True, True, False, False),
        n_embd=384, n_head=6, n_layer=6, block_size=1024, dropout=0.2,
        compute_dtype="bfloat16",
    )
    S, B = cfg.block_size, args.batch

    # brief training on structured synthetic data (noisy autoregressive
    # walks), so the model's logits are peaked enough that a perturbed
    # history actually moves sampled tokens
    rng = np.random.default_rng(0)
    n_rows, n_val = 200_000, 20_000
    cols = []
    for v in cfg.vocab_sizes:
        walk = np.cumsum(rng.integers(-2, 3, n_rows))
        cols.append(np.mod(walk, v).astype(np.int32))
    train = [c[: n_rows - n_val] for c in cols]
    val = [c[n_rows - n_val:] for c in cols]
    feed = BatchFeed(train, val, [n_rows], S, 8, is_percents=False,
                     rand_sizes=[2, 2, None, None],
                     vocab_sizes=list(cfg.vocab_sizes))
    optimizer = make_optimizer(1e-3, "bfloat16", "bfloat16")
    specs = build_metric_specs(
        [np.linspace(-1, 1, v).tolist() for v in cfg.vocab_sizes],
        [False] * 4, S)
    trainer = Trainer(cfg, feed, optimizer, specs, 40)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)
    t0 = time.perf_counter()
    params, opt_state, losses = trainer.train_chunk(
        params, opt_state, jax.random.PRNGKey(1), args.train_steps)
    l0, l1 = fetch(losses[0]), fetch(losses[-1])
    print(f"trained {args.train_steps} steps in {time.perf_counter()-t0:.0f}s "
          f"(loss {float(l0):.3f} -> {float(l1):.3f})")

    prompt = jnp.asarray(np.stack(
        [np.tile(c[:S], (B, 1)) for c in cols]
    ).astype(np.int32))
    # per-row distinct prompts: shift each batch row's start
    prompt = jnp.asarray(np.stack([
        np.stack([c[j * 17: j * 17 + S] for j in range(B)]) for c in cols
    ]).astype(np.int32))
    key = jax.random.PRNGKey(7)

    t0 = time.perf_counter()
    exact = fetch(generate_fast(params, cfg, prompt, key, args.new))
    exact_new = exact[0, :, S:]
    print(f"faithful full-window stream: {args.new} tokens x {B} rows in "
          f"{time.perf_counter()-t0:.0f}s")

    print(f"\n{'refresh':>8} {'agree%':>8} {'1st-div (median)':>18} "
          f"{'rows identical':>15}")
    for r in args.refresh:
        served = fetch(generate_serve(
            params, cfg, prompt, key, args.new, refresh=r))
        served_new = served[0, :, S:]
        match = served_new == exact_new
        agree = 100.0 * match.mean()
        # first divergence index per row (args.new if never)
        first = np.where(match.all(axis=1), args.new,
                         np.argmin(match, axis=1))
        ident = int((first == args.new).sum())
        print(f"{r:>8} {agree:>7.1f}% {float(np.median(first)):>18.0f} "
              f"{ident:>12}/{B}")

    # The direct QUALITY metric: what refresh trades away is effective
    # context — intra-chunk decodes see between S-refresh and S history
    # tokens instead of always S, AND (because the refresh rebuilds the
    # cache at positions 0..S-r-1) a shifted positional embedding. Measure
    # exactly that: hold the TARGET tokens fixed (the last 32 of a held-out
    # row) and re-evaluate their NLL under truncated windows of length
    # C + 32 — each forward predicts the same 32 targets from >= C history
    # tokens at the positions a post-refresh cache would give them. A
    # per-position NLL curve from ONE full forward does NOT work here: it
    # confounds context length with position-in-data (measured: the
    # position trend dominates and even flips the sign of the apparent
    # penalty). The serve penalty at refresh r is the curve mean over
    # C in [S-r, S) minus the full-context point.
    from trade_aid_multimodal_transformer_tpu.models.transformer import forward

    full = np.stack([
        np.stack([c[n_rows - n_val + j * 31:
                    n_rows - n_val + j * 31 + S + 1] for j in range(B)])
        for c in cols
    ]).astype(np.int32)  # (M, B, S+1): window + next-token targets

    def nll_at_context(C):
        """Mean NLL of the last 32 targets given >= C history tokens."""
        win = jnp.asarray(full[:, :, S - 32 - C: S])       # (M, B, C+32)
        tgt = jnp.asarray(full[0, :, S - 32 - C + 1: S + 1])

        @jax.jit
        def f(params, xb, yb):
            logits_list, _ = forward(params, cfg, xb, None, None, False)
            lp = jax.nn.log_softmax(
                logits_list[0].astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(lp, yb[..., None], axis=-1)[..., 0]
            return nll[:, -32:].mean()

        return float(fetch(f(params, win, tgt)))

    ctxs = [128, 256, 384, 512, 768, S - 32]
    curve = {C: nll_at_context(C) for C in ctxs}
    base = curve[S - 32]
    print(f"\nfixed-target NLL vs context length (same last-32 held-out "
          f"targets; full-context baseline {base:.4f}):")
    for C in ctxs:
        print(f"  context >= {C:>4}: NLL {curve[C]:.4f} "
              f"(delta {curve[C] - base:+.4f})")
    for r in args.refresh:
        # decodes in a refresh-r chunk see contexts in [S-r, S); their mean
        # NLL ~ the curve mean over that band (linear interp on the grid)
        lo = S - r
        pts = [curve[C] for C in ctxs if lo <= C] or [base]
        pen = float(np.mean(pts)) - base
        print(f"  refresh={r:>4}: approx NLL penalty {pen:+.4f}")


if __name__ == "__main__":
    main()
