"""Full benchmark suite against the reference baselines (BASELINE.md).

Covers the measured reference numbers row by row:
- tokenization (numerical_representation): reference 7.2M rows/s (CPU)
- range_numeric_data: reference 0.59M rows/s
- convert_to_percent_changes: reference 0.75M rows/s
- bin_numeric_data (6 bins): reference 1.04M rows/s
- per-step batch assembly at 1M-row scale: reference ~1.41 s/step/modality
- train step rate, demo config: reference 32.6 steps/s (torch CPU)
- train step rate, production 4-modality config (B=32, T=64, n_embd=384,
  6 layers, 1M rows): no reference number exists (it cannot reach this scale
  in reasonable time — ~5.7 s/step of host batching alone, SURVEY §6)

Usage: python bench/suite.py [--json results.json]
"""

import argparse
import contextlib
import io
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

import jax

from trade_aid_multimodal_transformer_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

RESULTS = []


def dsync(x):
    """Force TRUE device completion before reading the clock.

    Under the tunneled TPU runtime `jax.block_until_ready` can return before
    the device has drained its queue (measured: impossible TF/s with it as
    the only barrier). A device→host copy of one element cannot return early
    — the chip executes in order, so transferring a slice of the LAST output
    proves every queued computation before it has finished.
    """
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
    return x


def record(name, value, unit, baseline=None):
    vs = round(value / baseline, 2) if baseline else None
    RESULTS.append(
        {"metric": name, "value": round(value, 2), "unit": unit, "vs_baseline": vs}
    )
    vs_text = f"  ({vs}x baseline)" if vs else ""
    print(f"  {name:<44}{value:>12.2f} {unit}{vs_text}")


def timeit(fn, *args, repeat=3, **kw):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn(*args, **kw)
        best = min(best, time.perf_counter() - t0)
    return best


def bench_transforms():
    from trade_aid_multimodal_transformer_tpu.data.transforms import (
        bin_numeric_data,
        convert_to_percent_changes,
        range_numeric_data,
    )
    from trade_aid_multimodal_transformer_tpu.data.vocab import numerical_representation

    print("\n== host data pipeline (1M rows) ==")
    rng = np.random.default_rng(0)
    n = 1_000_000
    prices = rng.uniform(10, 500, n).round(2).tolist()

    t = timeit(lambda: numerical_representation(prices))
    record("tokenization (numerical_representation)", n / t / 1e6, "M rows/s", 7.2)

    t = timeit(lambda: range_numeric_data(prices, 2, 1))
    record("range_numeric_data", n / t / 1e6, "M rows/s", 0.59)

    t = timeit(lambda: convert_to_percent_changes(prices, 2))
    record("convert_to_percent_changes", n / t / 1e6, "M rows/s", 0.75)

    pct = convert_to_percent_changes(prices, 2)
    with contextlib.redirect_stdout(io.StringIO()):
        t = timeit(lambda: bin_numeric_data(pct, 6, 5, 2.0))
    record("bin_numeric_data (6 bins)", n / t / 1e6, "M rows/s", 1.04)


def bench_feed():
    from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed

    print("\n== batch feed at 1M-row production scale ==")
    rng = np.random.default_rng(0)
    n = 1_000_000
    m = 4
    train = [rng.integers(0, 500, n - 10_000).astype(np.int32) for _ in range(m)]
    val = [rng.integers(0, 500, 10_000).astype(np.int32) for _ in range(m)]
    # 50-file layout like the folder-loading config
    file_lengths = [n // 50] * 50
    feed = BatchFeed(
        train, val, file_lengths, block_size=64, batch_size=32,
        is_percents=True, rand_sizes=[2, 2, None, None], vocab_sizes=[500] * 4,
    )
    key = jax.random.PRNGKey(0)
    out = feed.get_batch(key, "train", True)
    dsync(out)

    iters = 200
    t0 = time.perf_counter()
    for i in range(iters):
        out = feed.get_batch(jax.random.fold_in(key, i), "train", True)
    dsync(out)
    per_step = (time.perf_counter() - t0) / iters
    # reference: ~1.41 s/step/modality => 5.64 s/step for 4 modalities
    record(
        "batch sampling+augment (4 mod, 1M rows)",
        per_step * 1e3,
        "ms/step",
        None,
    )
    record(
        "batch feed speedup vs reference host path", 5.64 / per_step, "x", None
    )


def _make_trainer(cfg, n_rows, batch_size, rand_sizes=None, eval_iters=40, lr=1e-3):
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
    from trade_aid_multimodal_transformer_tpu.train.metrics import build_metric_specs
    from trade_aid_multimodal_transformer_tpu.train.steps import Trainer, make_optimizer

    rng = np.random.default_rng(0)
    m = cfg.num_modalities
    n_val = max(4 * cfg.block_size, n_rows // 10)
    train = [
        rng.integers(0, v, n_rows - n_val).astype(np.int32) for v in cfg.vocab_sizes
    ]
    val = [rng.integers(0, v, n_val).astype(np.int32) for v in cfg.vocab_sizes]
    feed = BatchFeed(
        train, val, [n_rows], cfg.block_size, batch_size,
        is_percents=False,
        rand_sizes=rand_sizes or [None] * m,
        vocab_sizes=list(cfg.vocab_sizes),
    )
    specs = build_metric_specs(
        [np.linspace(-1, 1, v).tolist() for v in cfg.vocab_sizes],
        [False] * m, cfg.block_size,
    )
    optimizer = make_optimizer(lr)
    trainer = Trainer(cfg, feed, optimizer, specs, eval_iters)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return trainer, params, optimizer.init(params)


def bench_train():
    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig

    print(f"\n== training ({jax.default_backend()}) ==")

    # demo-scale config (the reference's measured 32.6 steps/s)
    cfg = ModelConfig(
        vocab_sizes=(57, 3), cross_attention=(True, False),
        n_embd=32, n_head=4, n_layer=2, block_size=4, dropout=0.1,
    )
    trainer, params, opt_state = _make_trainer(cfg, 100, 4)
    chunk = 512
    params, opt_state, l = trainer.train_chunk(params, opt_state, jax.random.PRNGKey(0), chunk)
    dsync(l)
    t0 = time.perf_counter()
    params, opt_state, l = trainer.train_chunk(params, opt_state, jax.random.PRNGKey(1), chunk)
    dsync(l)
    t = time.perf_counter() - t0
    record("train steps/s (demo config)", chunk / t, "steps/s", 32.6)

    # production 4-modality config at 1M rows
    cfg_p = ModelConfig(
        vocab_sizes=(500, 120, 24, 48), cross_attention=(True, True, False, False),
        n_embd=384, n_head=6, n_layer=6, block_size=64, dropout=0.2,
    )
    trainer, params, opt_state = _make_trainer(
        cfg_p, 1_000_000, 32, rand_sizes=[2, 2, None, None]
    )
    chunk = 50
    params, opt_state, l = trainer.train_chunk(params, opt_state, jax.random.PRNGKey(0), chunk)
    dsync(l)
    t0 = time.perf_counter()
    params, opt_state, l = trainer.train_chunk(params, opt_state, jax.random.PRNGKey(1), chunk)
    dsync(l)
    t = time.perf_counter() - t0
    sps = chunk / t
    record("train steps/s (production 4-mod config)", sps, "steps/s", None)
    record(
        "training throughput (production)",
        sps * 32 * 64 * 4 / 1e6,
        "M tokens/s",
        None,
    )

    # same production config under mixed precision (bf16 activations,
    # f32 master params/accumulation)
    cfg_bf = ModelConfig(
        vocab_sizes=(500, 120, 24, 48), cross_attention=(True, True, False, False),
        n_embd=384, n_head=6, n_layer=6, block_size=64, dropout=0.2,
        compute_dtype="bfloat16",
    )
    trainer_bf, params_bf, opt_bf = _make_trainer(
        cfg_bf, 1_000_000, 32, rand_sizes=[2, 2, None, None]
    )
    params_bf, opt_bf, l = trainer_bf.train_chunk(params_bf, opt_bf, jax.random.PRNGKey(0), chunk)
    dsync(l)
    t0 = time.perf_counter()
    params_bf, opt_bf, l = trainer_bf.train_chunk(params_bf, opt_bf, jax.random.PRNGKey(1), chunk)
    dsync(l)
    t = time.perf_counter() - t0
    record("train steps/s (production, bf16)", chunk / t, "steps/s", None)

    # eval pass (fused, with on-device directional metrics)
    stats = trainer.eval_pass(params, jax.random.PRNGKey(2), "val")
    dsync(stats.mean_loss)
    t0 = time.perf_counter()
    stats = trainer.eval_pass(params, jax.random.PRNGKey(3), "val")
    dsync(stats.mean_loss)
    t = time.perf_counter() - t0
    record("eval pass, 40 iters (production)", t * 1e3, "ms", None)


def bench_generation():
    """Autoregressive serving: fused-scan sampler vs per-token dispatch."""
    import jax.numpy as jnp

    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.models.sampler import generate_fast
    from trade_aid_multimodal_transformer_tpu.models.transformer import generate

    print("\n== generation (production model, B=32, 128 new tokens) ==")
    cfg = ModelConfig(
        vocab_sizes=(500, 120, 24, 48), cross_attention=(True, True, False, False),
        n_embd=384, n_head=6, n_layer=6, block_size=64, dropout=0.0,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, new = 32, 128
    idx = jnp.asarray(
        np.stack([rng.integers(0, v, (B, cfg.block_size)) for v in cfg.vocab_sizes])
        .astype(np.int32)
    )

    out = generate_fast(params, cfg, idx, jax.random.PRNGKey(1), new, 0)
    dsync(out)
    t0 = time.perf_counter()
    out = generate_fast(params, cfg, idx, jax.random.PRNGKey(2), new, 0)
    dsync(out)
    t_fast = time.perf_counter() - t0
    record("generation (fused scan)", B * new / t_fast, "tokens/s", None)

    # per-token dispatch path (the reference's loop structure), 16 tokens
    # extrapolated — running 128 would dominate the suite's wall clock
    few = 16
    outs = generate(params, cfg, list(idx), jax.random.PRNGKey(3), few, 0)
    dsync(outs[0])
    t0 = time.perf_counter()
    outs = generate(params, cfg, list(idx), jax.random.PRNGKey(4), few, 0)
    dsync(outs[0])
    t_slow = (time.perf_counter() - t0) * (new / few)
    record("generation speedup vs per-token dispatch", t_slow / t_fast, "x", None)


def bench_serving():
    """KV-cached decode at serving-scale context (T=1024 window).

    The fused scan recomputes the full 1024-token window per token; the
    cached path (models/cache.py) runs one single-position forward per token
    against per-block K/V caches, with a periodic prefill refresh once the
    window is full."""
    import jax.numpy as jnp

    from trade_aid_multimodal_transformer_tpu.models.cache import generate_serve
    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.models.sampler import generate_fast

    print("\n== KV-cached serving (T=1024 context, B=8, 256 new tokens) ==")
    cfg = ModelConfig(
        vocab_sizes=(500, 120), cross_attention=(True, False),
        n_embd=384, n_head=6, n_layer=6, block_size=1024, dropout=0.0,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, new = 8, 256
    idx = jnp.asarray(
        np.stack([rng.integers(0, v, (B, cfg.block_size)) for v in cfg.vocab_sizes])
        .astype(np.int32)
    )

    out = generate_fast(params, cfg, idx, jax.random.PRNGKey(1), new, 0)
    dsync(out)
    t0 = time.perf_counter()
    out = generate_fast(params, cfg, idx, jax.random.PRNGKey(2), new, 0)
    dsync(out)
    t_scan = time.perf_counter() - t0
    record("serving T=1024 (fused full-window scan)", B * new / t_scan, "tokens/s", None)

    out = generate_serve(params, cfg, idx, jax.random.PRNGKey(1), new, 0, refresh=128)
    dsync(out)
    t0 = time.perf_counter()
    out = generate_serve(params, cfg, idx, jax.random.PRNGKey(2), new, 0, refresh=128)
    dsync(out)
    t_kv = time.perf_counter() - t0
    record("serving T=1024 (KV-cached, refresh=128)", B * new / t_kv, "tokens/s", None)
    record("KV-cache speedup vs fused scan", t_scan / t_kv, "x", None)


def bench_kernels():
    """Flash-attention kernel vs the dense core at serving-scale context.

    The shipped configs use block_size 4-64 where dense wins (tiny matmuls);
    this measures the long-context regime the Pallas kernels target."""
    import jax.numpy as jnp

    from trade_aid_multimodal_transformer_tpu.ops.attention import causal_attention_jnp
    from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (
        flash_causal_attention,
    )

    if jax.default_backend() != "tpu":
        print("\n== attention kernels: skipped (no TPU) ==")
        return
    print("\n== attention kernels (T=4096, 48 heads, hs=64) ==")
    T, N, hs = 4096, 48, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (N, T, hs), jnp.float32) for kk in ks)

    def tb(fn, n=10):
        out = fn(q, k, v)
        dsync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(q, k, v)
        dsync(out)
        return (time.perf_counter() - t0) / n

    td = tb(jax.jit(lambda q, k, v: causal_attention_jnp(q, k, v)))
    tf = tb(jax.jit(lambda q, k, v: flash_causal_attention(q, k, v)))
    record("flash attention fwd (T=4096)", tf * 1e3, "ms", None)
    record("flash fwd speedup vs dense", td / tf, "x", None)

    gd = tb(jax.jit(jax.grad(lambda q, k, v: (causal_attention_jnp(q, k, v) ** 2).sum(), argnums=(0, 1, 2))), n=5)
    gf = tb(jax.jit(jax.grad(lambda q, k, v: (flash_causal_attention(q, k, v) ** 2).sum(), argnums=(0, 1, 2))), n=5)
    record("flash attention fwd+bwd (T=4096)", gf * 1e3, "ms", None)
    record("flash fwd+bwd speedup vs dense", gd / gf, "x", None)

    # bf16 kernel I/O: halves K/V HBM traffic; accumulation stays f32
    from trade_aid_multimodal_transformer_tpu.ops import pallas_attention as pa

    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

    def tb16(fn, n=10):
        out = fn(qb, kb, vb)
        dsync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(qb, kb, vb)
        dsync(out)
        return (time.perf_counter() - t0) / n

    tf16 = tb16(jax.jit(lambda q, k, v: flash_causal_attention(q, k, v)))
    record("flash fwd bf16 (T=4096)", tf16 * 1e3, "ms", None)
    record("flash fwd bf16 speedup vs f32 kernel", tf / tf16, "x", None)
    gf16 = tb16(
        jax.jit(jax.grad(
            lambda q, k, v: (flash_causal_attention(q, k, v).astype(jnp.float32) ** 2).sum(),
            argnums=(0, 1, 2),
        )), n=5,
    )
    record("flash fwd+bwd bf16 (T=4096)", gf16 * 1e3, "ms", None)
    record("flash fwd+bwd bf16 speedup vs f32 kernel", gf / gf16, "x", None)

    # KV-streamed kernels (the any-T path; selected automatically above the
    # VMEM row budget — forced here to measure the row-vs-streamed cost)
    budget = pa.KV_ROW_VMEM_BUDGET
    try:
        pa.KV_ROW_VMEM_BUDGET = 1024
        ts = tb(jax.jit(lambda q, k, v: flash_causal_attention(q, k, v)))
        record("flash fwd KV-streamed f32 (T=4096)", ts * 1e3, "ms", None)
        record("KV-streamed cost vs row-resident", ts / tf, "x", None)
        gs = tb(jax.jit(jax.grad(lambda q, k, v: (flash_causal_attention(q, k, v) ** 2).sum(), argnums=(0, 1, 2))), n=5)
        record("flash fwd+bwd KV-streamed f32 (T=4096)", gs * 1e3, "ms", None)
    finally:
        pa.KV_ROW_VMEM_BUDGET = budget

    # T=32768: above the f32 row VMEM ceiling — only the streamed path runs
    # (whole-row K/V would need 2*32768*64*4 = 16 MB of VMEM per program)
    T32 = 32768
    ks2 = jax.random.split(jax.random.PRNGKey(1), 3)
    q2, k2, v2 = (jax.random.normal(kk, (4, T32, 64), jnp.bfloat16) for kk in ks2)

    def tb32(fn, n=3):
        out = fn(q2, k2, v2)
        dsync(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(q2, k2, v2)
        dsync(out)
        return (time.perf_counter() - t0) / n

    t32 = tb32(jax.jit(lambda q, k, v: flash_causal_attention(q, k, v)))
    flops32 = 2 * 2 * 4 * T32 * T32 * 64 / 2  # qk^T + pv, causal half
    record("flash fwd bf16 (T=32768, streamed)", t32 * 1e3, "ms", None)
    record("T=32768 achieved TFLOP/s", flops32 / t32 / 1e12, "TF/s", None)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--json", type=str, default=None)
    args = parser.parse_args()

    print(f"devices: {jax.devices()}")
    bench_transforms()
    bench_feed()
    bench_train()
    bench_generation()
    bench_serving()
    bench_kernels()

    if args.json:
        Path(args.json).write_text(json.dumps(RESULTS, indent=2))
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
