"""Context parallelism (tpu_options.context_parallel) end to end.

The attention sequence axis shards over a 'seq' mesh axis and runs ring
attention (parallel/ring_attention.py) — dispatched from the config surface
through the trainer's trace-time scope (ops.attention.context_parallel_scope).
The semantics to reproduce are the single-device trainer's (the reference is
single-device: main.py:598-652): same batches, same losses, same gradients.
"""

import shutil
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
from trade_aid_multimodal_transformer_tpu.models.init import init_params
from trade_aid_multimodal_transformer_tpu.parallel import make_mesh, make_sharded_trainer
from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
from trade_aid_multimodal_transformer_tpu.train.metrics import build_metric_specs
from trade_aid_multimodal_transformer_tpu.train.steps import Trainer, make_optimizer

REPO = Path(__file__).resolve().parent.parent


def _cfg(block_size, dropout=0.0):
    return ModelConfig(
        vocab_sizes=(48, 12),
        cross_attention=(True, False),
        n_embd=16,
        n_head=2,
        n_layer=1,
        block_size=block_size,
        dropout=dropout,
        attn_impl="jnp",
    )


def _feed(cfg, batch=1, n=None):
    n = n or (2 * cfg.block_size + 512)
    rng = np.random.default_rng(0)
    val_len = cfg.block_size + 128
    train_sets = [
        rng.integers(0, v, n - val_len).astype(np.int32) for v in cfg.vocab_sizes
    ]
    val_sets = [rng.integers(0, v, val_len).astype(np.int32) for v in cfg.vocab_sizes]
    return BatchFeed(
        train_sets, val_sets, [n], cfg.block_size, batch,
        is_percents=False, rand_sizes=[None, None],
        vocab_sizes=list(cfg.vocab_sizes),
    )


def _specs(cfg):
    return build_metric_specs(
        [list(np.linspace(-1, 1, v)) for v in cfg.vocab_sizes],
        [False, False], cfg.block_size,
    )


@pytest.mark.slow
class TestLongContextTrainingStep:
    """T = 2048 training step sharded over the sequence axis, grads (via the
    updated params and losses) matching the dense single-device step."""

    def test_train_chunk_matches_unsharded_T2048(self):
        cfg = _cfg(block_size=2048)
        feed = _feed(cfg)
        opt = make_optimizer(1e-3)
        specs = _specs(cfg)

        mesh = make_mesh(1, 1, jax.devices()[:8], seq=8)
        cp_trainer = make_sharded_trainer(cfg, feed, opt, specs, 1, mesh)
        ref_trainer = Trainer(cfg, feed, opt, specs, 1)

        key = jax.random.PRNGKey(1)

        # train_chunk donates (params, opt_state) — re-create per call
        params = init_params(jax.random.PRNGKey(0), cfg)
        p_cp, o_cp, losses_cp = cp_trainer.train_chunk(
            params, opt.init(params), key, 2
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        p_rf, o_rf, losses_rf = ref_trainer.train_chunk(
            params, opt.init(params), key, 2
        )
        np.testing.assert_allclose(
            np.asarray(losses_cp), np.asarray(losses_rf), atol=1e-5, rtol=1e-5
        )
        # identical optimizer trajectory => gradients matched
        for a, b in zip(jax.tree.leaves(p_cp), jax.tree.leaves(p_rf)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
            )

    def test_eval_pass_matches_unsharded(self):
        cfg = _cfg(block_size=2048)
        feed = _feed(cfg)
        opt = make_optimizer(1e-3)
        specs = _specs(cfg)
        mesh = make_mesh(1, 1, jax.devices()[:8], seq=8)
        cp_trainer = make_sharded_trainer(cfg, feed, opt, specs, 1, mesh)
        ref_trainer = Trainer(cfg, feed, opt, specs, 1)
        params = init_params(jax.random.PRNGKey(2), cfg)
        key = jax.random.PRNGKey(3)
        s_cp = cp_trainer.eval_pass(params, key, "val")
        s_rf = ref_trainer.eval_pass(params, key, "val")
        np.testing.assert_allclose(
            float(s_cp.mean_loss), float(s_rf.mean_loss), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(s_cp.wins), np.asarray(s_rf.wins)
        )

    def test_train_with_dropout_runs(self):
        """Attention + residual dropout under CP: finite losses that move."""
        cfg = _cfg(block_size=256, dropout=0.2)
        feed = _feed(cfg, batch=2)
        opt = make_optimizer(1e-3)
        mesh = make_mesh(1, 1, jax.devices()[:4], seq=4)
        trainer = make_sharded_trainer(cfg, feed, opt, _specs(cfg), 1, mesh)
        params = init_params(jax.random.PRNGKey(4), cfg)
        p, o, losses = trainer.train_chunk(params, opt.init(params), jax.random.PRNGKey(5), 3)
        losses = np.asarray(losses)
        assert np.isfinite(losses).all()
        assert losses[-1] != losses[0]

    def test_block_size_divisibility_enforced(self):
        cfg = _cfg(block_size=255)
        mesh = make_mesh(1, 1, jax.devices()[:4], seq=4)
        with pytest.raises(ValueError, match="divisible"):
            make_sharded_trainer(
                cfg, _feed(cfg), make_optimizer(1e-3), _specs(cfg), 1, mesh
            )


class TestConfigSurface:
    def test_context_parallel_validation(self, tmp_path):
        from trade_aid_multimodal_transformer_tpu.config.system import SystemConfig

        base = {
            "project_settings": {"project_file_path": str(tmp_path)},
            "training_parameters": {"block_size": 64},
        }
        cfg = SystemConfig.from_dict(
            {**base, "tpu_options": {"context_parallel": 4}}
        )
        assert cfg.context_parallel == 4
        with pytest.raises(ValueError, match="positive"):
            SystemConfig.from_dict({**base, "tpu_options": {"context_parallel": 0}})
        with pytest.raises(ValueError, match="divide"):
            SystemConfig.from_dict({**base, "tpu_options": {"context_parallel": 48}})

    def test_run_training_with_context_parallel(self, tmp_path, monkeypatch):
        """tpu_options.context_parallel: 2 through the real entry point —
        demo goldens unchanged, CP console line present."""
        from trade_aid_multimodal_transformer_tpu.config.accessors import (
            reset_config_cache,
        )
        from trade_aid_multimodal_transformer_tpu.config.compat import (
            reset_compatibility_layer,
        )

        cfg_text = (REPO / "examples" / "demo_config.yaml").read_text()
        cfg_text = cfg_text.replace("max_iters: 50", "max_iters: 2")
        cfg_text = cfg_text.replace(
            "eval_interval: 25", "eval_interval: 25\n  eval_iters: 2"
        )
        cfg_text += "\ntpu_options:\n  context_parallel: 2\n"
        (tmp_path / "config.yaml").write_text(cfg_text)
        shutil.copy(
            REPO / "examples" / "demo_input_schemas.yaml",
            tmp_path / "input_schemas.yaml",
        )
        (tmp_path / "examples" / "demo_data").mkdir(parents=True)
        shutil.copy(
            REPO / "examples" / "demo_data" / "demo_stock.csv",
            tmp_path / "examples" / "demo_data" / "demo_stock.csv",
        )
        monkeypatch.chdir(tmp_path)
        reset_compatibility_layer()
        reset_config_cache()
        try:
            from trade_aid_multimodal_transformer_tpu.train.runner import run_training

            result = run_training(caller_globals={}, seed=0)
            assert result["vocabularies"][1] == [-3, 0, 2]
            assert np.isfinite(result["losses"]["train"])
        finally:
            reset_compatibility_layer()
            reset_config_cache()
