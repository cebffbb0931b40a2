"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over 'pipe'.

The reference has no parallelism (SURVEY §2.4); the semantics to reproduce
are the sequential block stack's (models/transformer.forward). The whole
schedule is differentiable jax (scan + ppermute), so forward AND gradients
must match the sequential path to float-reduction noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
from trade_aid_multimodal_transformer_tpu.models.init import init_params
from trade_aid_multimodal_transformer_tpu.models.transformer import total_loss
from trade_aid_multimodal_transformer_tpu.parallel.pipeline import (
    pipeline_total_loss,
    stack_blocks,
    unstack_blocks,
)


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(
        vocab_sizes=(19, 7), cross_attention=(True, False),
        n_embd=16, n_head=2, n_layer=4, block_size=8, dropout=0.1,
        attn_impl="jnp",
    )


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(jax.random.PRNGKey(0), cfg)


def _batch(cfg, B=8):
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        np.stack([rng.integers(0, v, (B, cfg.block_size)) for v in cfg.vocab_sizes])
        .astype(np.int32)
    )
    tgt = jnp.asarray(
        np.stack([rng.integers(0, v, (B, cfg.block_size)) for v in cfg.vocab_sizes])
        .astype(np.int32)
    )
    return idx, tgt


def _pipe_mesh(stages):
    devs = jax.devices()
    assert len(devs) >= stages
    return Mesh(np.asarray(devs[:stages]), axis_names=("pipe",))


class TestPipelineEquivalence:
    @pytest.mark.parametrize("stages,micro", [(2, 4), (4, 4), (4, 8), (1, 2)])
    def test_loss_matches_sequential(self, cfg, params, stages, micro):
        mesh = _pipe_mesh(stages)
        idx, tgt = _batch(cfg)
        ref, _ = total_loss(params, cfg, idx, tgt, None, False)
        pp, _ = pipeline_total_loss(
            params, cfg, idx, tgt, mesh, micro, train=False
        )
        np.testing.assert_allclose(float(ref), float(pp), rtol=1e-6)

    @pytest.mark.slow  # ~70 s; the loss-equivalence cases cover the fast tier
    def test_grads_match_sequential(self, cfg, params):
        mesh = _pipe_mesh(4)
        idx, tgt = _batch(cfg)
        g_ref = jax.grad(lambda p: total_loss(p, cfg, idx, tgt, None, False)[0])(params)
        g_pp = jax.grad(
            lambda p: pipeline_total_loss(p, cfg, idx, tgt, mesh, 4, train=False)[0]
        )(params)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    @pytest.mark.slow
    def test_train_step_with_dropout_runs(self, cfg, params):
        """Dropout keys are per-(layer, microbatch) — a different stream than
        the sequential KeyGen (same distribution); pin that a full grad step
        runs and produces finite grads."""
        mesh = _pipe_mesh(4)
        idx, tgt = _batch(cfg)
        g = jax.grad(
            lambda p: pipeline_total_loss(
                p, cfg, idx, tgt, mesh, 4, rng=jax.random.PRNGKey(3), train=True
            )[0]
        )(params)
        assert all(bool(jnp.isfinite(x).all()) for x in jax.tree.leaves(g))

    @pytest.mark.slow
    def test_composes_with_data_axis(self, cfg, params):
        """pipe x data mesh: microbatch batch dim shards over 'data'."""
        devs = jax.devices()
        assert len(devs) >= 8
        mesh = Mesh(
            np.asarray(devs[:8]).reshape(4, 2), axis_names=("pipe", "data")
        )
        idx, tgt = _batch(cfg)
        ref, _ = total_loss(params, cfg, idx, tgt, None, False)
        pp, _ = pipeline_total_loss(
            params, cfg, idx, tgt, mesh, 4, train=False, data_axis="data"
        )
        np.testing.assert_allclose(float(ref), float(pp), rtol=1e-6)

    @pytest.mark.slow
    def test_optimizer_trajectory_matches_sequential(self, cfg, params):
        """Multi-step AdamW trajectory THROUGH the GPipe schedule (dropout 0,
        where the pipeline's per-(layer, microbatch) dropout stream drops out
        of the math): per-step losses and the final parameter vector must
        match the sequential trainer's."""
        import dataclasses

        import optax

        cfg0 = dataclasses.replace(cfg, dropout=0.0)
        p0 = init_params(jax.random.PRNGKey(0), cfg0)
        mesh = _pipe_mesh(2)
        idx, tgt = _batch(cfg0)
        opt = optax.adamw(1e-2)

        def run(loss_fn, n_steps=3):
            @jax.jit
            def step(p, o):
                loss, g = jax.value_and_grad(loss_fn)(p)
                upd, o = opt.update(g, o, p)
                return optax.apply_updates(p, upd), o, loss

            p, o, losses = p0, opt.init(p0), []
            for _ in range(n_steps):
                p, o, l = step(p, o)
                losses.append(float(l))
            return p, losses

        p_sq, l_sq = run(lambda p: total_loss(p, cfg0, idx, tgt, None, True)[0])
        p_pp, l_pp = run(
            lambda p: pipeline_total_loss(
                p, cfg0, idx, tgt, mesh, 4, train=True
            )[0]
        )
        np.testing.assert_allclose(l_sq, l_pp, rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p_sq), jax.tree.leaves(p_pp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )

    def test_stack_unstack_roundtrip(self, cfg, params):
        stacked = stack_blocks(params["blocks"])
        back = unstack_blocks(stacked, cfg.n_layer)
        for orig, rt in zip(params["blocks"], back):
            for a, b in zip(jax.tree.leaves(orig), jax.tree.leaves(rt)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_validation_errors(self, cfg, params):
        mesh = _pipe_mesh(4)
        idx, tgt = _batch(cfg, B=6)  # 6 % 4 != 0
        with pytest.raises(ValueError, match="microbatches"):
            pipeline_total_loss(params, cfg, idx, tgt, mesh, 4, train=False)
        cfg3 = ModelConfig(
            vocab_sizes=(19, 7), cross_attention=(True, False),
            n_embd=16, n_head=2, n_layer=3, block_size=8, dropout=0.0,
            attn_impl="jnp",
        )
        p3 = init_params(jax.random.PRNGKey(0), cfg3)
        idx, tgt = _batch(cfg3)
        with pytest.raises(ValueError, match="pipe"):
            pipeline_total_loss(p3, cfg3, idx, tgt, mesh, 4, train=False)
