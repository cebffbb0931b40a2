"""Headline benchmark: train steps/sec on the reference's demo config.

Baseline: the reference (torch, CPU) measures 32.6 steps/s on this exact
configuration — 2 modalities (ranged prices w/ cross-attention + binned
percent changes), B=4, T=4, n_embd=32, n_head=4, n_layer=2, dropout 0.1
(BASELINE.md). Here the same model trains as fused device programs with
in-scan batch sampling.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""

import contextlib
import io
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

import jax

from trade_aid_multimodal_transformer_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

REFERENCE_STEPS_PER_SEC = 32.6  # BASELINE.md: demo config, torch CPU
REFERENCE_TOKENIZE_M_ROWS_PER_SEC = 7.2  # BASELINE.md: numerical_representation


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def dsync(x):
    """Force true device completion: device→host copy of one element.

    Under the tunneled TPU runtime `jax.block_until_ready` can return before
    the device has drained its queue; a D2H transfer of the last output
    cannot (the chip executes in order)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
    return x


def build_demo_run():
    from trade_aid_multimodal_transformer_tpu.config.schema import InputSchema
    from trade_aid_multimodal_transformer_tpu.data.ingest import load_and_process_modality
    from trade_aid_multimodal_transformer_tpu.data.vocab import (
        create_train_val_datasets,
        numerical_representation,
    )
    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
    from trade_aid_multimodal_transformer_tpu.train.metrics import build_metric_specs
    from trade_aid_multimodal_transformer_tpu.train.steps import Trainer, make_optimizer

    root = Path(__file__).resolve().parent
    csv = str(root / "examples" / "demo_data" / "demo_stock.csv")
    schemas = [
        InputSchema.from_dict(
            {
                "modality_name": "Demo Prices",
                "path": csv,
                "column_number": 13,
                "has_header": True,
                "processing_steps": [
                    {
                        "function": "range_numeric_data",
                        "args": {"num_whole_digits": 2, "decimal_places": 1},
                    }
                ],
                "cross_attention": True,
            }
        ),
        InputSchema.from_dict(
            {
                "modality_name": "Demo Changes (%)",
                "path": csv,
                "column_number": 13,
                "has_header": True,
                "processing_steps": [
                    {"function": "convert_to_percent_changes", "args": {"decimal_places": 2}},
                    {
                        "function": "bin_numeric_data",
                        "args": {"num_bins": 3, "outlier_percentile": 0.1},
                    },
                ],
            }
        ),
    ]

    trains, vals, vocabs, mods = [], [], [], []
    with contextlib.redirect_stdout(io.StringIO()):
        for s in schemas:
            md = load_and_process_modality(s)
            ids, vocab = numerical_representation(md.data)
            tr, va = create_train_val_datasets(ids, 0.2, 0, md.file_lengths)
            trains.append(tr)
            vals.append(va)
            vocabs.append(vocab)
            mods.append(md)

    cfg = ModelConfig(
        vocab_sizes=tuple(len(v) for v in vocabs),
        cross_attention=(True, False),
        n_embd=32,
        n_head=4,
        n_layer=2,
        block_size=4,
        dropout=0.1,
        attn_impl="auto",
    )
    feed = BatchFeed(
        trains, vals, mods[0].file_lengths, cfg.block_size, 4,
        is_percents=True, rand_sizes=[None, None],
        vocab_sizes=[len(v) for v in vocabs],
    )
    specs = build_metric_specs(vocabs, [m.is_percent for m in mods], cfg.block_size)
    optimizer = make_optimizer(1e-3)
    # scan_unroll=4: at demo scale the per-iteration scan overhead is a real
    # fraction of the 160us step; unrolling measures ~15% more steps/s
    trainer = Trainer(cfg, feed, optimizer, specs, eval_iters=40, scan_unroll=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)
    return trainer, params, opt_state


def bench_tokenize():
    """BASELINE.md row: numerical_representation at 1M rows (host path)."""
    from trade_aid_multimodal_transformer_tpu.data.vocab import numerical_representation

    rng = np.random.default_rng(0)
    prices = rng.uniform(10, 500, 1_000_000).round(2).tolist()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        numerical_representation(prices)
        best = min(best, time.perf_counter() - t0)
    return 1.0 / best  # M rows/s


def bench_production():
    """4-modality production config at 1M rows — the scale the reference
    cannot reach (~5.7 s/step of host batching alone, SURVEY §6)."""
    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
    from trade_aid_multimodal_transformer_tpu.train.metrics import build_metric_specs
    from trade_aid_multimodal_transformer_tpu.train.steps import Trainer, make_optimizer

    cfg = ModelConfig(
        vocab_sizes=(500, 120, 24, 48), cross_attention=(True, True, False, False),
        n_embd=384, n_head=6, n_layer=6, block_size=64, dropout=0.2,
    )
    rng = np.random.default_rng(0)
    n_rows, n_val = 1_000_000, 100_000
    train = [rng.integers(0, v, n_rows - n_val).astype(np.int32) for v in cfg.vocab_sizes]
    val = [rng.integers(0, v, n_val).astype(np.int32) for v in cfg.vocab_sizes]
    feed = BatchFeed(
        train, val, [n_rows], cfg.block_size, 32,
        is_percents=False, rand_sizes=[2, 2, None, None],
        vocab_sizes=list(cfg.vocab_sizes),
    )
    specs = build_metric_specs(
        [np.linspace(-1, 1, v).tolist() for v in cfg.vocab_sizes],
        [False] * 4, cfg.block_size,
    )
    optimizer = make_optimizer(1e-3)
    trainer = Trainer(cfg, feed, optimizer, specs, eval_iters=40)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)

    chunk = 50
    params, opt_state, l = trainer.train_chunk(params, opt_state, jax.random.PRNGKey(0), chunk)
    dsync(l)
    best = 0.0
    for trial in range(2):
        t0 = time.perf_counter()
        params, opt_state, l = trainer.train_chunk(
            params, opt_state, jax.random.PRNGKey(trial + 1), chunk
        )
        dsync(l)
        best = max(best, chunk / (time.perf_counter() - t0))
    return best


def main():
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    trainer, params, opt_state = build_demo_run()

    chunk = 512
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    params, opt_state, losses = trainer.train_chunk(params, opt_state, key, chunk)
    dsync(losses)
    log(f"compile + first chunk: {time.perf_counter() - t0:.1f}s")

    best = 0.0
    for trial in range(3):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, losses = trainer.train_chunk(params, opt_state, sub, chunk)
        dsync(losses)
        dt = time.perf_counter() - t0
        sps = chunk / dt
        best = max(best, sps)
        log(f"trial {trial}: {chunk} steps in {dt:.3f}s -> {sps:.1f} steps/s")

    tok = bench_tokenize()
    log(f"tokenization: {tok:.2f} M rows/s")
    prod = bench_production()
    log(f"production 4-modality: {prod:.1f} steps/s")
    # model FLOPs per production step (fwd+bwd ≈ 3× fwd matmul FLOPs) for an
    # MFU denominator: 4 decoder stacks, 6 layers, B=32 T=64 d=384
    flops_step = 3 * 4 * 6 * 32 * 64 * (
        4 * 2 * 384 * 384          # qkv+proj matmuls per token
        + 2 * 2 * 384 * 4 * 384    # ffwd
        + 2 * 2 * 64 * 384         # attention scores+values (T=64)
    )
    mfu_pct = prod * flops_step / 197e12 * 100  # v5e bf16 peak 197 TF/s

    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec_demo_config",
                "value": round(best, 1),
                "unit": "steps/s",
                "vs_baseline": round(best / REFERENCE_STEPS_PER_SEC, 2),
                "extra": [
                    {
                        "metric": "tokenize_M_rows_per_sec",
                        "value": round(tok, 2),
                        "unit": "M rows/s",
                        "vs_baseline": round(tok / REFERENCE_TOKENIZE_M_ROWS_PER_SEC, 2),
                    },
                    {
                        "metric": "train_steps_per_sec_production_4mod",
                        "value": round(prod, 1),
                        "unit": "steps/s",
                        "vs_baseline": None,  # reference cannot run this scale
                    },
                    {
                        "metric": "production_model_mfu_v5e",
                        "value": round(mfu_pct, 2),
                        "unit": "%",
                        "vs_baseline": None,
                    },
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
