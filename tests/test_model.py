"""Behavioral model tests: causality, init statistics, dropout, generate."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
from trade_aid_multimodal_transformer_tpu.models.init import count_params, init_params
from trade_aid_multimodal_transformer_tpu.models.transformer import (
    forward,
    generate,
    total_loss,
)


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(
        vocab_sizes=(19, 7),
        cross_attention=(True, False),
        n_embd=16,
        n_head=2,
        n_layer=2,
        block_size=6,
        dropout=0.1,
        attn_impl="jnp",
    )


@pytest.fixture(scope="module")
def params(cfg):
    return init_params(jax.random.PRNGKey(0), cfg)


def make_batch(cfg, key, B=3):
    keys = jax.random.split(key, 2 * cfg.num_modalities)
    idx = jnp.stack(
        [
            jax.random.randint(keys[m], (B, cfg.block_size), 0, cfg.vocab_sizes[m])
            for m in range(cfg.num_modalities)
        ]
    )
    tgt = jnp.stack(
        [
            jax.random.randint(
                keys[cfg.num_modalities + m], (B, cfg.block_size), 0, cfg.vocab_sizes[m]
            )
            for m in range(cfg.num_modalities)
        ]
    )
    return idx, tgt


class TestForward:
    def test_shapes(self, cfg, params):
        idx, tgt = make_batch(cfg, jax.random.PRNGKey(1))
        logits, losses = forward(params, cfg, idx, tgt)
        assert len(logits) == 2
        assert logits[0].shape == (3, cfg.block_size, 19)
        assert logits[1].shape == (3, cfg.block_size, 7)
        assert all(l.shape == () for l in losses)

    def test_init_loss_near_uniform(self, cfg, params):
        # With N(0, 0.02) init, logits are near zero: per-modality CE ~ ln(V).
        idx, tgt = make_batch(cfg, jax.random.PRNGKey(2), B=16)
        loss, losses = total_loss(params, cfg, idx, tgt, train=False)
        assert float(losses[0]) == pytest.approx(math.log(19), abs=0.1)
        assert float(losses[1]) == pytest.approx(math.log(7), abs=0.1)
        assert float(loss) == pytest.approx(math.log(19) + math.log(7), abs=0.2)

    def test_causality(self, cfg, params):
        """Changing a future token must not affect earlier positions' logits
        in any modality (causal mask in both self- and cross-attention)."""
        idx, _ = make_batch(cfg, jax.random.PRNGKey(3))
        logits_a, _ = forward(params, cfg, idx)
        idx_b = idx.at[:, :, -1].set((idx[:, :, -1] + 1) % 7)
        logits_b, _ = forward(params, cfg, idx_b)
        for m in range(2):
            np.testing.assert_allclose(
                np.asarray(logits_a[m][:, :-1]),
                np.asarray(logits_b[m][:, :-1]),
                atol=1e-6,
            )
            # and the last position DOES change
            assert not np.allclose(
                np.asarray(logits_a[m][:, -1]), np.asarray(logits_b[m][:, -1])
            )

    def test_cross_attention_couples_modalities(self, cfg, params):
        """Modality 0 (cross on) must react to modality 1's tokens;
        modality 1 (cross off) must not react to modality 0's tokens."""
        idx, _ = make_batch(cfg, jax.random.PRNGKey(4))
        logits_a, _ = forward(params, cfg, idx)
        idx_b = idx.at[1].set((idx[1] + 1) % 7)  # perturb modality 1 everywhere
        logits_b, _ = forward(params, cfg, idx_b)
        assert not np.allclose(np.asarray(logits_a[0]), np.asarray(logits_b[0]))

        idx_c = idx.at[0].set((idx[0] + 1) % 19)  # perturb modality 0
        logits_c, _ = forward(params, cfg, idx_c)
        np.testing.assert_allclose(
            np.asarray(logits_a[1]), np.asarray(logits_c[1]), atol=1e-6
        )

    def test_dropout_train_vs_eval(self, cfg, params):
        idx, tgt = make_batch(cfg, jax.random.PRNGKey(5))
        rng = jax.random.PRNGKey(11)
        l_train1, _ = total_loss(params, cfg, idx, tgt, rng=rng, train=True)
        l_train2, _ = total_loss(params, cfg, idx, tgt, rng=rng, train=True)
        l_train3, _ = total_loss(
            params, cfg, idx, tgt, rng=jax.random.PRNGKey(12), train=True
        )
        l_eval, _ = total_loss(params, cfg, idx, tgt, train=False)
        assert float(l_train1) == float(l_train2)  # same key -> same masks
        assert float(l_train1) != float(l_train3)  # different key -> different
        assert float(l_eval) != float(l_train1)

    def test_gradients_flow_everywhere(self, cfg, params):
        idx, tgt = make_batch(cfg, jax.random.PRNGKey(6))
        grads = jax.grad(lambda p: total_loss(p, cfg, idx, tgt, train=False)[0])(params)
        flat, _ = jax.tree_util.tree_flatten(grads)
        nonzero = sum(bool(jnp.any(g != 0)) for g in flat)
        assert nonzero == len(flat), f"{len(flat) - nonzero} param tensors got zero grad"


class TestInit:
    def test_param_count_matches_structure(self, cfg, params):
        n = count_params(params)
        assert n > 0
        # embeddings alone: sum(V*C) + block*C
        emb = sum(v * cfg.n_embd for v in cfg.vocab_sizes) + cfg.block_size * cfg.n_embd
        assert n > emb

    def test_init_statistics(self, cfg, params):
        w = np.asarray(params["blocks"][0]["ffwd"]["w1"])
        assert abs(w.std() - 0.02) < 0.004
        assert np.all(np.asarray(params["blocks"][0]["ffwd"]["b1"]) == 0)
        assert np.all(np.asarray(params["blocks"][0]["ln1"]["scale"]) == 1)


class TestGenerate:
    def test_generate_extends_target_modality(self, cfg, params):
        idx = [
            jnp.zeros((2, 4), jnp.int32),
            jnp.zeros((2, 4), jnp.int32),
        ]
        out = generate(params, cfg, idx, jax.random.PRNGKey(0), max_new_tokens=3,
                       modality_to_generate=0)
        assert out[0].shape == (2, 7)
        assert out[1].shape == (2, 7)  # padded with last token
        assert np.all(np.asarray(out[0][:, :4]) == 0)
        assert int(np.asarray(out[0]).max()) < 19

    @pytest.mark.slow
    def test_generated_tokens_within_vocab(self, cfg, params):
        idx = [jnp.ones((1, 2), jnp.int32), jnp.ones((1, 2), jnp.int32)]
        out = generate(params, cfg, idx, jax.random.PRNGKey(1), max_new_tokens=5,
                       modality_to_generate=1)
        assert int(np.asarray(out[1]).max()) < 7
        assert out[1].shape[1] == 7


class TestFastGenerate:
    """The fused-scan sampler must match the step-by-step reference port
    token-for-token (same forward, same PRNG split schedule)."""

    def _stacked(self, cfg, key, B, T):
        ks = jax.random.split(key, cfg.num_modalities)
        return jnp.stack(
            [
                jax.random.randint(ks[m], (B, T), 0, cfg.vocab_sizes[m])
                for m in range(cfg.num_modalities)
            ]
        )

    @pytest.mark.parametrize("t0,new", [(6, 4), (8, 5), (3, 7), (2, 2)])
    def test_matches_reference_generate(self, cfg, params, t0, new):
        from trade_aid_multimodal_transformer_tpu.models.sampler import generate_fast

        idx = self._stacked(cfg, jax.random.PRNGKey(42), B=2, T=t0)
        key = jax.random.PRNGKey(7)
        slow = generate(params, cfg, list(idx), key, max_new_tokens=new,
                        modality_to_generate=0)
        fast = generate_fast(params, cfg, idx, key, max_new_tokens=new,
                             modality_to_generate=0)
        assert fast.shape == (cfg.num_modalities, 2, t0 + new)
        for m in range(cfg.num_modalities):
            np.testing.assert_array_equal(np.asarray(slow[m]), np.asarray(fast[m]))

    def test_other_modality_repeats_last_token(self, cfg, params):
        from trade_aid_multimodal_transformer_tpu.models.sampler import generate_fast

        idx = self._stacked(cfg, jax.random.PRNGKey(1), B=2, T=cfg.block_size)
        out = generate_fast(params, cfg, idx, jax.random.PRNGKey(2),
                            max_new_tokens=3, modality_to_generate=0)
        # modality 1 extends by repeating its own last token
        np.testing.assert_array_equal(
            np.asarray(out[1][:, -3:]),
            np.broadcast_to(np.asarray(idx[1][:, -1:]), (2, 3)),
        )


class TestCachedGenerate:
    """KV-cached decode (models/cache.py) must be token-identical to the
    faithful path: exact while the context grows toward block_size (positions
    pinned, pure append), and via the full-window fallback past that."""

    @pytest.fixture(scope="class")
    def big_cfg(self):
        # block_size large enough for a real cached phase, small enough that
        # the generate_fast oracle's warmup (one compile per context length
        # below block_size) stays cheap on CPU
        return ModelConfig(
            vocab_sizes=(19, 7), cross_attention=(True, False),
            n_embd=16, n_head=2, n_layer=2, block_size=16, dropout=0.1,
            attn_impl="jnp",
        )

    @pytest.fixture(scope="class")
    def big_params(self, big_cfg):
        return init_params(jax.random.PRNGKey(0), big_cfg)

    def _stacked(self, cfg, key, B, T):
        ks = jax.random.split(key, cfg.num_modalities)
        return jnp.stack(
            [
                jax.random.randint(ks[m], (B, T), 0, cfg.vocab_sizes[m])
                for m in range(cfg.num_modalities)
            ]
        )

    @pytest.mark.parametrize("t0,new", [(5, 11), (5, 20), (16, 4)])
    def test_matches_fast_generate(self, big_cfg, big_params, t0, new):
        """Covers: pure cached phase, boundary-exact fill, crossing into the
        full-window fallback, and prompt already at block_size (no cached
        phase at all)."""
        from trade_aid_multimodal_transformer_tpu.models.cache import generate_cached
        from trade_aid_multimodal_transformer_tpu.models.sampler import generate_fast

        idx = self._stacked(big_cfg, jax.random.PRNGKey(42), B=2, T=t0)
        key = jax.random.PRNGKey(7)
        fast = generate_fast(big_params, big_cfg, idx, key, new, 0)
        cached = generate_cached(big_params, big_cfg, idx, key, new, 0)
        assert cached.shape == (big_cfg.num_modalities, 2, t0 + new)
        np.testing.assert_array_equal(np.asarray(fast), np.asarray(cached))

    def test_prefill_logits_match_forward(self, big_cfg, big_params):
        """The cached forward's last-position logits == the plain forward's."""
        from trade_aid_multimodal_transformer_tpu.models.cache import _prefill

        idx = self._stacked(big_cfg, jax.random.PRNGKey(3), B=2, T=12)
        logits, _ = _prefill(big_params, big_cfg, idx, 0)
        ref, _ = forward(big_params, big_cfg, idx, train=False)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(ref[0][:, -1, :]), atol=1e-5
        )

    def test_serve_exact_prefix_and_shape(self, big_cfg, big_params):
        """generate_serve: exact while the window grows (token-identical
        prefix), then chunked refresh keeps producing valid tokens."""
        from trade_aid_multimodal_transformer_tpu.models.cache import generate_serve
        from trade_aid_multimodal_transformer_tpu.models.sampler import generate_fast

        idx = self._stacked(big_cfg, jax.random.PRNGKey(9), B=2, T=4)
        key = jax.random.PRNGKey(11)
        out = generate_serve(big_params, big_cfg, idx, key, 24, 0, refresh=4)
        assert out.shape == (big_cfg.num_modalities, 2, 28)
        exact = generate_fast(big_params, big_cfg, idx, key, 12, 0)
        np.testing.assert_array_equal(
            np.asarray(out[:, :, :16]), np.asarray(exact)
        )
        v = big_cfg.vocab_sizes[0]
        assert (np.asarray(out[0]) >= 0).all() and (np.asarray(out[0]) < v).all()


class TestServeChunkFusion:
    """generate_serve's fused steady-chunk path (_serve_chunks: one device
    program for all full refresh chunks) must produce the TOKEN-IDENTICAL
    stream of the per-chunk dispatch path — same sampling key schedule,
    same windows."""

    def _setup(self):
        cfg = ModelConfig(
            vocab_sizes=(13, 5), cross_attention=(True, False), n_embd=16,
            n_head=2, n_layer=1, block_size=16, dropout=0.0, attn_impl="jnp",
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        prompt = jnp.asarray(np.stack(
            [rng.integers(0, v, (2, 16)) for v in cfg.vocab_sizes]
        ).astype(np.int32))
        return cfg, params, prompt

    def test_fused_matches_per_chunk(self):
        from trade_aid_multimodal_transformer_tpu.models.cache import generate_serve

        cfg, params, prompt = self._setup()
        # 3 full chunks + a 2-token tail
        a = generate_serve(params, cfg, prompt, jax.random.PRNGKey(7), 14,
                           refresh=4, fuse_chunks=True)
        b = generate_serve(params, cfg, prompt, jax.random.PRNGKey(7), 14,
                           refresh=4, fuse_chunks=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fused_matches_per_chunk_int8(self):
        from trade_aid_multimodal_transformer_tpu.models.cache import generate_serve

        cfg = ModelConfig(
            vocab_sizes=(13, 5), cross_attention=(True, False), n_embd=16,
            n_head=2, n_layer=1, block_size=128, dropout=0.0, attn_impl="jnp",
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        prompt = jnp.asarray(np.stack(
            [rng.integers(0, v, (2, 128)) for v in cfg.vocab_sizes]
        ).astype(np.int32))
        a = generate_serve(params, cfg, prompt, jax.random.PRNGKey(7), 8,
                           refresh=4, kv_dtype="int8", fuse_chunks=True)
        b = generate_serve(params, cfg, prompt, jax.random.PRNGKey(7), 8,
                           refresh=4, kv_dtype="int8", fuse_chunks=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
