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
