"""Mixed-precision (bfloat16 compute) correctness tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
from trade_aid_multimodal_transformer_tpu.models.init import init_params
from trade_aid_multimodal_transformer_tpu.models.transformer import forward, total_loss


def make(compute_dtype):
    cfg = ModelConfig(
        vocab_sizes=(19, 7),
        cross_attention=(True, False),
        n_embd=16,
        n_head=2,
        n_layer=2,
        block_size=6,
        dropout=0.0,
        attn_impl="jnp",
        compute_dtype=compute_dtype,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(1)
    idx = jnp.stack(
        [
            jax.random.randint(jax.random.fold_in(key, m), (3, 6), 0, v)
            for m, v in enumerate(cfg.vocab_sizes)
        ]
    )
    return cfg, params, idx


class TestBfloat16:
    @pytest.mark.slow  # ~15 s full-model bf16-vs-f32 sweep
    def test_logits_are_f32_and_close_to_f32_path(self):
        cfg32, params, idx = make("float32")
        cfg16, _, _ = make("bfloat16")
        l32, _ = forward(params, cfg32, idx)
        l16, _ = forward(params, cfg16, idx)
        for a, b in zip(l32, l16):
            assert b.dtype == jnp.float32  # upcast at the head
            # bf16 has ~3 decimal digits; logits are O(0.05) at init
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

    def test_loss_near_uniform(self):
        cfg, params, idx = make("bfloat16")
        tgt = idx  # any valid targets
        loss, losses = total_loss(params, cfg, idx, tgt, train=False)
        assert loss.dtype == jnp.float32
        expected = sum(math.log(v) for v in cfg.vocab_sizes)
        assert float(loss) == pytest.approx(expected, abs=0.2)

    @pytest.mark.slow  # ~32 s full-model bf16 grad sweep
    def test_gradients_finite_and_f32(self):
        cfg, params, idx = make("bfloat16")
        grads = jax.grad(lambda p: total_loss(p, cfg, idx, idx, train=False)[0])(params)
        for g in jax.tree_util.tree_leaves(grads):
            assert g.dtype == jnp.float32  # master params stay f32
            assert bool(jnp.isfinite(g).all())

    def test_training_converges_bf16(self):
        import optax

        cfg, params, idx = make("bfloat16")
        opt = optax.adamw(1e-2)
        state = opt.init(params)
        tgt = idx

        @jax.jit
        def step(p, s):
            loss, grads = jax.value_and_grad(
                lambda p: total_loss(p, cfg, idx, tgt, train=False)[0]
            )(p)
            updates, s = opt.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        losses = []
        for _ in range(30):
            params, state, loss = step(params, state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.8


class TestMatmulPrecision:
    """tpu_options.matmul_precision — the knob disclosing/controlling the
    TPU's default bf16-multiply MXU behavior for f32 operands.

    On CPU f32 matmuls are exact regardless, so these tests check the knob's
    plumbing; the numeric effect itself (measured ~1.5e-2 max abs deviation
    per attention layer at T=512 between 'default' and 'float32' on a v5e
    chip) is documented in TECHNICAL_NOTES.md and exercised by
    tools/tpu_precision_check.py on real hardware.
    """

    def test_scope_wraps_trainer_steps(self):
        import contextlib

        import jax
        import numpy as np

        from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
        from trade_aid_multimodal_transformer_tpu.models.init import init_params
        from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
        from trade_aid_multimodal_transformer_tpu.train.metrics import build_metric_specs
        from trade_aid_multimodal_transformer_tpu.train.steps import Trainer, make_optimizer

        cfg = ModelConfig(
            vocab_sizes=(17, 9), cross_attention=(True, False),
            n_embd=16, n_head=2, n_layer=1, block_size=8, dropout=0.0,
            attn_impl="jnp",
        )
        rng = np.random.default_rng(0)
        train = [rng.integers(0, v, 256).astype(np.int32) for v in cfg.vocab_sizes]
        val = [rng.integers(0, v, 64).astype(np.int32) for v in cfg.vocab_sizes]
        feed = BatchFeed(train, val, [256 + 64], 8, 4, False, [None, None],
                         list(cfg.vocab_sizes))
        specs = build_metric_specs(
            [list(np.linspace(-1, 1, v)) for v in cfg.vocab_sizes],
            [False, False], 8,
        )
        opt = make_optimizer(1e-3)
        params = init_params(jax.random.PRNGKey(0), cfg)

        results = {}
        for name, scope in (
            ("default", None),
            ("float32", lambda: jax.default_matmul_precision("float32")),
        ):
            tr = Trainer(cfg, feed, opt, specs, 2,
                         scope=scope or contextlib.nullcontext)
            # train_chunk donates params/opt_state — hand each run a copy
            p0 = jax.tree.map(jnp.array, params)
            p, o, losses = tr.train_chunk(
                p0, opt.init(p0), jax.random.PRNGKey(1), 2
            )
            results[name] = np.asarray(losses)

        # On CPU both precisions are true f32: identical trajectories prove
        # the scope enters cleanly without perturbing semantics.
        np.testing.assert_allclose(
            results["default"], results["float32"], atol=1e-6
        )

    def test_config_surface_validates(self, tmp_path):
        import pytest

        from trade_aid_multimodal_transformer_tpu.config.system import SystemConfig

        base = {"project_settings": {"project_file_path": str(tmp_path)}}
        for good in ("default", "float32", "highest"):
            sc = SystemConfig.from_dict(
                {**base, "tpu_options": {"matmul_precision": good}}
            )
            assert sc.matmul_precision == good
        with pytest.raises(ValueError):
            SystemConfig.from_dict(
                {**base, "tpu_options": {"matmul_precision": "tf32"}}
            )
