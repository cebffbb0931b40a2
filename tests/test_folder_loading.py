"""Folder loading + file-based splitting end-to-end (BASELINE config #4:
multi-stock CSV concat with file-boundary-aware training)."""

import io
import contextlib
from pathlib import Path

import numpy as np
import pytest

from trade_aid_multimodal_transformer_tpu.config import InputSchema
from trade_aid_multimodal_transformer_tpu.data import (
    create_train_val_datasets,
    get_file_cache,
    numerical_representation,
)
from trade_aid_multimodal_transformer_tpu.data.ingest import load_and_process_modality
from trade_aid_multimodal_transformer_tpu.sampling import BatchFeed, SplitIndexPlan

import jax


@pytest.fixture
def stock_folder(tmp_path):
    """12 synthetic per-stock CSVs with price + volume columns."""
    rng = np.random.default_rng(0)
    folder = tmp_path / "stocks"
    folder.mkdir()
    lengths = []
    for s in range(12):
        n = int(rng.integers(60, 120))
        lengths.append(n)
        price = np.cumprod(1 + rng.normal(0, 0.01, n)) * rng.uniform(20, 400)
        vol = rng.integers(1_000, 9_999, n)
        lines = ["date,price,volume"]
        for i in range(n):
            lines.append(f"2024-01-{i%28+1:02d},{price[i]:.2f},{vol[i]}")
        (folder / f"stock_{s:02d}.csv").write_text("\n".join(lines) + "\n")
    get_file_cache().clear_cache()
    return folder, lengths


def test_folder_concat_order_and_file_info(stock_folder):
    folder, lengths = stock_folder
    schema = InputSchema(
        "Prices", str(folder), 2, has_header=True,
        processing_steps=[],
    )
    with contextlib.redirect_stdout(io.StringIO()):
        md = load_and_process_modality(schema)
    assert md.file_lengths == lengths  # sorted name order == creation order
    assert len(md.data) == sum(lengths)
    names = [md.file_info[i] for i in range(0, len(md.file_info), 2)]
    assert names == sorted(names)


def test_percent_resets_per_file(stock_folder):
    folder, lengths = stock_folder
    schema = InputSchema(
        "Changes", str(folder), 2, has_header=True,
        processing_steps=[],
    )
    from trade_aid_multimodal_transformer_tpu.config.schema import ProcessingStep

    schema.processing_steps = [
        ProcessingStep("convert_to_percent_changes", {"decimal_places": 2})
    ]
    with contextlib.redirect_stdout(io.StringIO()):
        md = load_and_process_modality(schema)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    for s in starts:
        assert md.data[s] == 0.0


def test_file_based_split_and_boundary_sampling(stock_folder):
    folder, lengths = stock_folder
    schema = InputSchema("Prices", str(folder), 2, has_header=True)
    with contextlib.redirect_stdout(io.StringIO()):
        md = load_and_process_modality(schema)
    ids, vocab = numerical_representation(md.data)

    num_val_files = 3
    train, val = create_train_val_datasets(ids, 0.2, num_val_files, lengths)
    assert len(val) == sum(lengths[-3:])
    assert len(train) == sum(lengths[:-3])

    block = 8
    train_plan = SplitIndexPlan.build(len(train), block, "train", lengths, False)
    val_plan = SplitIndexPlan.build(len(val), block, "val", lengths, False)

    # no sampled window crosses a file boundary, in either split
    for plan, split_lengths in (
        (train_plan, lengths[:-3]),
        (val_plan, lengths[-3:]),
    ):
        boundaries = np.cumsum(split_lengths)[:-1]
        for s in plan.valid_start_set():
            for b in boundaries:
                assert not (s < b <= s + block)


def test_training_runs_on_folder_data(stock_folder):
    folder, lengths = stock_folder
    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.train.metrics import build_metric_specs
    from trade_aid_multimodal_transformer_tpu.train.steps import Trainer, make_optimizer
    from trade_aid_multimodal_transformer_tpu.config.schema import ProcessingStep

    schemas = [
        InputSchema("Prices", str(folder), 2, has_header=True,
                    processing_steps=[ProcessingStep("range_numeric_data", {"num_whole_digits": 2, "decimal_places": 1})],
                    cross_attention=True),
        InputSchema("Volume", str(folder), 3, has_header=True,
                    processing_steps=[ProcessingStep("range_numeric_data", {"num_whole_digits": 1, "decimal_places": 0})]),
    ]
    trains, vals, vocabs, percents = [], [], [], []
    with contextlib.redirect_stdout(io.StringIO()):
        for s in schemas:
            md = load_and_process_modality(s)
            ids, vocab = numerical_representation(md.data)
            tr, va = create_train_val_datasets(ids, 0.2, 2, lengths)
            trains.append(tr)
            vals.append(va)
            vocabs.append(vocab)
            percents.append(md.is_percent)

    cfg = ModelConfig(
        vocab_sizes=tuple(len(v) for v in vocabs),
        cross_attention=(True, False),
        n_embd=16, n_head=2, n_layer=1, block_size=8, dropout=0.0,
        attn_impl="jnp",
    )
    feed = BatchFeed(trains, vals, lengths, 8, 8, False, [None, None],
                     [len(v) for v in vocabs])
    specs = build_metric_specs(vocabs, percents, 8)
    opt = make_optimizer(1e-2)
    trainer = Trainer(cfg, feed, opt, specs, eval_iters=2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    params, opt_state, losses = trainer.train_chunk(
        params, opt.init(params), jax.random.PRNGKey(1), 10
    )
    assert np.isfinite(np.asarray(losses)).all()
    stats = trainer.eval_pass(params, jax.random.PRNGKey(2), "val")
    assert np.isfinite(float(stats.mean_loss))
