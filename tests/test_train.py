"""Training-subsystem tests: fused steps, metrics, checkpointing."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
from trade_aid_multimodal_transformer_tpu.models.init import init_params
from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
from trade_aid_multimodal_transformer_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from trade_aid_multimodal_transformer_tpu.train.metrics import (
    ModalityMetricSpec,
    batch_directional_metrics,
    build_metric_specs,
)
from trade_aid_multimodal_transformer_tpu.train.steps import Trainer, make_optimizer


def fresh(tree):
    """Copy a pytree: train_chunk donates its inputs, so tests must not
    pass the shared fixture arrays directly."""
    return jax.tree.map(jnp.copy, tree)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        vocab_sizes=(13, 5),
        cross_attention=(True, False),
        n_embd=16,
        n_head=2,
        n_layer=1,
        block_size=4,
        dropout=0.0,
        attn_impl="jnp",
    )
    rng = np.random.default_rng(0)
    n = 300
    d0 = rng.integers(0, 13, n).astype(np.int32)
    d1 = rng.integers(0, 5, n).astype(np.int32)
    feed = BatchFeed(
        [d0[:240], d1[:240]], [d0[240:], d1[240:]],
        file_lengths=[n], block_size=4, batch_size=8,
        is_percents=False, rand_sizes=[None, None], vocab_sizes=[13, 5],
    )
    vocabs = [list(np.linspace(-3, 3, 13)), [-2.0, -1.0, 0.0, 1.0, 2.0]]
    specs = build_metric_specs(vocabs, [False, True], 4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(1e-2)
    trainer = Trainer(cfg, feed, opt, specs, eval_iters=3)
    return cfg, feed, trainer, params, opt


class TestTrainSteps:
    def test_loss_decreases_over_fused_chunk(self, setup):
        cfg, feed, trainer, params, opt = setup
        params2, opt_state2, losses = trainer.train_chunk(
            fresh(params), opt.init(fresh(params)), jax.random.PRNGKey(1), 60
        )
        losses = np.asarray(losses)
        assert losses.shape == (60,)
        assert losses[-10:].mean() < losses[:10].mean()

    @pytest.mark.slow  # ~34 s; loss-trajectory behavior also pinned by the e2e demo test
    def test_fused_chunk_matches_eager_loop(self, setup):
        """The scanned 4-step chunk equals a hand-rolled eager optimization
        loop fed the same per-step keys."""
        import optax

        from trade_aid_multimodal_transformer_tpu.models.transformer import total_loss

        cfg, feed, trainer, params, opt = setup
        key = jax.random.PRNGKey(2)
        pa, oa, la = trainer.train_chunk(
            fresh(params), opt.init(fresh(params)), key, 4
        )

        pb, ob = fresh(params), opt.init(fresh(params))
        lb = []
        for step_key in jax.random.split(key, 4):
            k_batch, k_drop = jax.random.split(step_key)
            xb, yb = feed._sample_impl(k_batch, split="train", augment=True)
            (loss, _), grads = jax.value_and_grad(total_loss, has_aux=True)(
                pb, cfg, xb, yb, k_drop, True
            )
            updates, ob = opt.update(grads, ob, pb)
            pb = optax.apply_updates(pb, updates)
            lb.append(float(loss))
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=2e-5)
        for x, y in zip(jax.tree_util.tree_leaves(pa), jax.tree_util.tree_leaves(pb)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-5)

    def test_chunk_deterministic(self, setup):
        cfg, feed, trainer, params, opt = setup
        key = jax.random.PRNGKey(7)
        _, _, la = trainer.train_chunk(fresh(params), opt.init(fresh(params)), key, 3)
        _, _, lb = trainer.train_chunk(fresh(params), opt.init(fresh(params)), key, 3)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_eval_pass_stats(self, setup):
        cfg, feed, trainer, params, opt = setup
        stats = trainer.eval_pass(params, jax.random.PRNGKey(3), "val")
        assert float(stats.mean_loss) == pytest.approx(
            math.log(13) + math.log(5), abs=0.3
        )
        # both modalities eligible: 3 eval iters * 8 batch rows each
        assert [int(x) for x in stats.batches_processed] == [3, 3]
        for m in range(2):
            assert int(stats.wins[m]) + int(stats.losses[m]) == 24


class TestMetrics:
    def test_percent_spec_matches_hand_calc(self):
        vocab = [-2.0, 0.0, 1.5]
        spec = ModalityMetricSpec.build(vocab, True, 4)
        logits = jnp.asarray([[3.0, 1.0, 0.5], [0.0, 0.1, 5.0]])
        x_last = jnp.asarray([0, 1])
        y_last = jnp.asarray([0, 1])   # actual values: -2.0 (down), 0.0 (flat)
        wins, losses, cert = batch_directional_metrics(logits, x_last, y_last, spec)
        # row 0: pred argmax=0 -> -2.0 (down); actual -2.0 (down) -> win
        # row 1: pred argmax=2 -> +1.5 (up); actual 0.0 (flat) -> loss
        assert int(wins) == 1 and int(losses) == 1
        # certainty row0: prob mass on tokens with sign -1 => token 0 only
        p0 = jax.nn.softmax(logits[0])
        p1 = jax.nn.softmax(logits[1])
        expected = float(p0[0]) + float(p1[2])
        assert float(cert) == pytest.approx(expected, abs=1e-6)

    def test_value_spec_uses_previous_token(self):
        vocab = [1.0, 2.0, 3.0]
        spec = ModalityMetricSpec.build(vocab, False, 4)
        logits = jnp.asarray([[0.0, 0.0, 9.0]])   # pred token 2 -> value 3.0
        x_last = jnp.asarray([1])                 # prev value 2.0
        y_last = jnp.asarray([0])                 # actual value 1.0 (down)
        wins, losses, _ = batch_directional_metrics(logits, x_last, y_last, spec)
        # predicted up (3>2), actual down (1<2) -> loss
        assert int(wins) == 0 and int(losses) == 1

    def test_non_numeric_vocab_ineligible(self):
        spec = ModalityMetricSpec.build(["a", "b"], False, 4)
        assert not spec.eligible

    def test_short_sequence_ineligible_for_value_data(self):
        spec = ModalityMetricSpec.build([1.0, 2.0], False, 1)
        assert not spec.eligible
        spec_pct = ModalityMetricSpec.build([1.0, 2.0], True, 1)
        assert spec_pct.eligible


class TestCheckpoint:
    def test_full_round_trip(self, setup, tmp_path):
        cfg, feed, trainer, params, opt = setup
        params2, opt_state2, _ = trainer.train_chunk(
            fresh(params), opt.init(fresh(params)), jax.random.PRNGKey(5), 3
        )
        path = str(tmp_path / "ckpt.npz")
        rng = np.asarray(jax.random.PRNGKey(42))
        size = save_checkpoint(path, params2, opt_state2, step=3, rng=rng)
        assert size > 0

        p0 = init_params(jax.random.PRNGKey(99), cfg)
        o0 = opt.init(p0)
        p, o, step, r = load_checkpoint(path, p0, o0)
        assert step == 3
        np.testing.assert_array_equal(r, rng)
        for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(o), jax.tree_util.tree_leaves(opt_state2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_weights_only_mode(self, setup, tmp_path):
        cfg, feed, trainer, params, opt = setup
        path = str(tmp_path / "weights.npz")
        save_checkpoint(path, params, opt.init(params), step=7, weights_only=True)
        p0 = init_params(jax.random.PRNGKey(99), cfg)
        p, o, step, r = load_checkpoint(path, p0, opt.init(p0))
        assert step is None and r is None
        for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_load_reference_torch_checkpoint(self, tmp_path):
        """A reference-format .pth loads transparently (migration path)."""
        import torch

        z = np.load("tests/fixtures/model_parity.npz")
        cfg = ModelConfig(
            vocab_sizes=tuple(z["vocab_sizes"].tolist()),
            cross_attention=tuple(bool(c) for c in z["cross"]),
            n_embd=int(z["n_embd"]), n_head=int(z["n_head"]),
            n_layer=int(z["n_layer"]), block_size=int(z["block_size"]),
            dropout=0.0, attn_impl="jnp",
        )
        sd = {
            k[4:]: torch.tensor(z[k].astype(np.float32))
            for k in z.files if k.startswith("sd::")
        }
        path = str(tmp_path / "ref.pth")
        torch.save(sd, path)

        p0 = init_params(jax.random.PRNGKey(0), cfg)
        p, o, step, r = load_checkpoint(path, p0, None, cfg)
        np.testing.assert_allclose(
            np.asarray(p["pre"]["pos_emb"]),
            z["sd::pre_block.position_embedding_table.weight"].astype(np.float32),
            atol=1e-7,
        )

    def test_round_trip_with_bf16_adam_moments(self, setup, tmp_path):
        """adam_moment_dtype='bfloat16' state must survive save/load with
        dtype and values intact (bandwidth option, tpu_options section)."""
        cfg, feed, trainer, params, _ = setup
        opt = make_optimizer(1e-2, moment_dtype="bfloat16")
        tr = Trainer(cfg, feed, opt, trainer.metric_specs, eval_iters=3)
        p2, o2, losses = tr.train_chunk(
            fresh(params), opt.init(fresh(params)), jax.random.PRNGKey(5), 3
        )
        assert np.all(np.isfinite(np.asarray(losses)))
        mus = [x for x in jax.tree_util.tree_leaves(o2) if x.dtype == jnp.bfloat16]
        assert mus, "expected bf16 first-moment leaves in the optimizer state"

        path = str(tmp_path / "bf16mu.npz")
        save_checkpoint(path, p2, o2, step=3)
        p0 = init_params(jax.random.PRNGKey(99), cfg)
        o0 = opt.init(p0)
        p, o, step, _ = load_checkpoint(path, p0, o0)
        assert step == 3
        for a, b in zip(jax.tree_util.tree_leaves(o), jax.tree_util.tree_leaves(o2)):
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestLowmemAdam:
    """make_optimizer's reduced-precision moment storage (tpu_options.
    adam_moment_dtype / adam_nu_dtype). The custom _adamw_lowmem transform
    must reproduce optax.adamw exactly when both dtypes stay f32."""

    def _tree(self, key):
        import jax

        ks = jax.random.split(key, 3)
        return {
            "a": jax.random.normal(ks[0], (16, 8)),
            "b": {"w": jax.random.normal(ks[1], (4, 4, 4)),
                  "v": jax.random.normal(ks[2], (7,))},
        }

    def test_f32_matches_optax_adamw(self):
        import jax
        import optax

        from trade_aid_multimodal_transformer_tpu.train.steps import _adamw_lowmem

        params = self._tree(jax.random.PRNGKey(0))
        ref_opt = optax.adamw(1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
        new_opt = _adamw_lowmem(
            1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01,
            mu_dtype=jnp.float32, nu_dtype=jnp.float32,
        )
        p_ref = p_new = params
        s_ref, s_new = ref_opt.init(params), new_opt.init(params)
        for i in range(5):
            g = self._tree(jax.random.PRNGKey(10 + i))
            u_ref, s_ref = ref_opt.update(g, s_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, u_ref)
            u_new, s_new = new_opt.update(g, s_new, p_new)
            p_new = optax.apply_updates(p_new, u_new)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_bf16_nu_storage_and_trajectory(self):
        import jax
        import optax

        from trade_aid_multimodal_transformer_tpu.train.steps import make_optimizer

        params = self._tree(jax.random.PRNGKey(1))
        opt = make_optimizer(1e-3, moment_dtype="bfloat16", nu_dtype="bfloat16")
        state = opt.init(params)
        assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(state.mu))
        assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(state.nu))

        ref_opt = make_optimizer(1e-3)
        p_ref, p_lm = params, params
        s_ref = ref_opt.init(params)
        for i in range(10):
            g = self._tree(jax.random.PRNGKey(30 + i))
            u, s_ref = ref_opt.update(g, s_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, u)
            u, state = opt.update(g, state, p_lm)
            p_lm = optax.apply_updates(p_lm, u)
        # bf16 moment rounding perturbs the trajectory only at ~1e-3 relative
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_lm)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0.05, atol=5e-4
            )

    def test_config_surface_roundtrip(self):
        from trade_aid_multimodal_transformer_tpu.config.system import SystemConfig

        sc = SystemConfig.from_dict(
            {"tpu_options": {"adam_nu_dtype": "bfloat16"}}
        )
        assert sc.adam_nu_dtype == "bfloat16"
        assert sc.to_dict()["tpu_options"]["adam_nu_dtype"] == "bfloat16"
        with pytest.raises(ValueError, match="adam_nu_dtype"):
            SystemConfig.from_dict({"tpu_options": {"adam_nu_dtype": "fp8"}})


class TestScanUnroll:
    """tpu_options.scan_unroll is a pure performance knob — the unrolled
    chunk must produce the identical trajectory."""

    @pytest.mark.slow
    def test_unrolled_chunk_identical(self, setup):
        cfg, feed, trainer, params, opt = setup
        p1, o1, l1 = trainer.train_chunk(
            fresh(params), opt.init(fresh(params)), jax.random.PRNGKey(5), 8
        )
        tr4 = Trainer(
            cfg, feed, opt, trainer.metric_specs, eval_iters=3, scan_unroll=4
        )
        p4, o4, l4 = tr4.train_chunk(
            fresh(params), opt.init(fresh(params)), jax.random.PRNGKey(5), 8
        )
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l4), atol=1e-6)
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_non_divisible_chunks_fall_back(self, setup):
        cfg, feed, trainer, params, opt = setup
        tr4 = Trainer(
            cfg, feed, opt, trainer.metric_specs, eval_iters=3, scan_unroll=4
        )
        # 7 % 4 != 0 — must still run (unroll falls back to 1)
        p, o, l = tr4.train_chunk(
            fresh(params), opt.init(fresh(params)), jax.random.PRNGKey(6), 7
        )
        assert np.asarray(l).shape == (7,)

    def test_config_surface(self):
        from trade_aid_multimodal_transformer_tpu.config.system import SystemConfig

        sc = SystemConfig.from_dict({"tpu_options": {"scan_unroll": 4}})
        assert sc.scan_unroll == 4
        with pytest.raises(ValueError, match="scan_unroll"):
            SystemConfig.from_dict({"tpu_options": {"scan_unroll": 0}})


class TestGradAccum:
    """tpu_options.grad_accum: each optimizer step averages gradients over
    N independent microbatch draws (effective batch = N x batch_size). The
    accumulated step must equal the hand-computed mean-gradient update."""

    def test_matches_manual_microbatch_mean(self, setup):
        import optax

        from trade_aid_multimodal_transformer_tpu.models.transformer import (
            total_loss,
        )
        from trade_aid_multimodal_transformer_tpu.train.steps import to_impl_key

        cfg, feed, trainer, params, opt = setup
        tr2 = Trainer(
            cfg, feed, opt, trainer.metric_specs, eval_iters=3, grad_accum=2
        )
        p_acc, o_acc, loss_acc = tr2.train_chunk(
            fresh(params), opt.init(fresh(params)), jax.random.PRNGKey(3), 1
        )

        # Manual replay: the chunk splits its (typed) key into one step key,
        # then grad_accum microbatch keys, each split into (batch, dropout).
        key = to_impl_key(jax.random.PRNGKey(3), "auto")
        (step_key,) = jax.random.split(key, 1)
        grads_sum, loss_sum = None, 0.0
        for mk in jax.random.split(step_key, 2):
            k_batch, k_drop = jax.random.split(mk)
            xb, yb = feed._sample_impl(k_batch, split="train", augment=True)
            (loss, _), grads = jax.value_and_grad(total_loss, has_aux=True)(
                params, cfg, xb, yb, k_drop, True
            )
            loss_sum += float(loss)
            grads_sum = (
                grads if grads_sum is None
                else jax.tree.map(jnp.add, grads_sum, grads)
            )
        grads_mean = jax.tree.map(lambda g: g * 0.5, grads_sum)
        o0 = opt.init(fresh(params))
        updates, _ = opt.update(grads_mean, o0, params)
        p_ref = optax.apply_updates(params, updates)

        assert float(loss_acc[0]) == pytest.approx(loss_sum / 2, abs=1e-5)
        for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )

    def test_config_surface(self):
        from trade_aid_multimodal_transformer_tpu.config.system import SystemConfig

        sc = SystemConfig.from_dict({"tpu_options": {"grad_accum": 4}})
        assert sc.grad_accum == 4
        assert sc.to_dict()["tpu_options"]["grad_accum"] == 4
        with pytest.raises(ValueError, match="grad_accum"):
            SystemConfig.from_dict({"tpu_options": {"grad_accum": 0}})


class TestLRSchedule:
    """tpu_options.lr_schedule: warmup+decay schedules on top of the
    reference-default constant lr (None = constant, reference: main.py:464)."""

    def test_cosine_shape(self):
        from trade_aid_multimodal_transformer_tpu.train.steps import (
            build_lr_schedule,
        )

        s = build_lr_schedule(
            1e-3, {"type": "cosine", "warmup_steps": 10,
                   "decay_steps": 100, "min_lr_ratio": 0.1}
        )
        assert float(s(0)) == pytest.approx(0.0, abs=1e-9)
        assert float(s(10)) == pytest.approx(1e-3, rel=1e-6)
        assert float(s(100)) == pytest.approx(1e-4, rel=1e-4)
        # monotone decay after warmup
        assert float(s(30)) > float(s(60)) > float(s(99))

    def test_linear_and_constant(self):
        from trade_aid_multimodal_transformer_tpu.train.steps import (
            build_lr_schedule,
        )

        lin = build_lr_schedule(
            2e-3, {"type": "linear", "warmup_steps": 4, "decay_steps": 14}
        )
        assert float(lin(4)) == pytest.approx(2e-3, rel=1e-6)
        assert float(lin(9)) == pytest.approx(1e-3, rel=1e-4)  # halfway
        const = build_lr_schedule(
            2e-3, {"type": "constant", "warmup_steps": 4, "decay_steps": 8}
        )
        assert float(const(2)) == pytest.approx(1e-3, rel=1e-4)
        assert float(const(100)) == pytest.approx(2e-3, rel=1e-6)

    def test_none_is_reference_constant(self):
        from trade_aid_multimodal_transformer_tpu.train.steps import (
            build_lr_schedule,
        )

        assert build_lr_schedule(1e-3, None) == 1e-3

    def test_lowmem_adam_matches_optax_with_schedule(self):
        """The bf16-nu AdamW clone must follow optax.adamw given the SAME
        schedule callable (schedule evaluated at pre-increment count)."""
        import optax

        from trade_aid_multimodal_transformer_tpu.train.steps import (
            _adamw_lowmem, build_lr_schedule,
        )

        spec = {"type": "cosine", "warmup_steps": 2, "decay_steps": 10}
        sched = build_lr_schedule(1e-2, spec)
        ref = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
        mine = _adamw_lowmem(
            sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01,
            mu_dtype=jnp.float32, nu_dtype=jnp.float32,
        )
        params = {"w": jnp.linspace(-1, 1, 8), "b": jnp.ones((3,))}
        s_ref, s_me = ref.init(params), mine.init(params)
        p_ref, p_me = params, params
        key = jax.random.PRNGKey(0)
        for i in range(6):
            key, sub = jax.random.split(key)
            g = jax.tree.map(
                lambda p: jax.random.normal(sub, p.shape), p_ref
            )
            u_ref, s_ref = ref.update(g, s_ref, p_ref)
            p_ref = optax.apply_updates(p_ref, u_ref)
            u_me, s_me = mine.update(g, s_me, p_me)
            p_me = optax.apply_updates(p_me, u_me)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_me)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)

    def test_config_surface(self):
        from trade_aid_multimodal_transformer_tpu.config.system import SystemConfig

        sc = SystemConfig.from_dict({"tpu_options": {"lr_schedule": {
            "type": "cosine", "warmup_steps": 100, "min_lr_ratio": 0.1}}})
        assert sc.lr_schedule["type"] == "cosine"
        assert sc.to_dict()["tpu_options"]["lr_schedule"]["warmup_steps"] == 100
        with pytest.raises(ValueError, match="lr_schedule.type"):
            SystemConfig.from_dict(
                {"tpu_options": {"lr_schedule": {"type": "exponential"}}}
            )
        with pytest.raises(ValueError, match="unknown lr_schedule"):
            SystemConfig.from_dict(
                {"tpu_options": {"lr_schedule": {"peak": 1}}}
            )


class TestBf16MasterParams:
    """tpu_options.params_dtype: bfloat16 — bf16 MASTER params (contract
    change, opt-in). AdamW math stays f32 (_adamw_lowmem upcasts on read);
    only the persisted param storage rounds. The trajectory must track the
    f32-master baseline closely, and the stored leaves must stay bf16."""

    def test_config_surface(self):
        from trade_aid_multimodal_transformer_tpu.config.system import SystemConfig

        sc = SystemConfig.from_dict(
            {"tpu_options": {"compute_dtype": "bfloat16",
                             "params_dtype": "bfloat16"}}
        )
        assert sc.params_dtype == "bfloat16"
        assert sc.to_dict()["tpu_options"]["params_dtype"] == "bfloat16"
        with pytest.raises(ValueError, match="params_dtype"):
            SystemConfig.from_dict({"tpu_options": {"params_dtype": "bfloat16"}})
        with pytest.raises(ValueError, match="params_dtype"):
            SystemConfig.from_dict(
                {"tpu_options": {"compute_dtype": "bfloat16",
                                 "params_dtype": "float16"}}
            )

    def test_trajectory_tracks_f32_master(self, setup):
        import dataclasses

        cfg, feed, _, params, _ = setup
        cfg_b = dataclasses.replace(cfg, compute_dtype="bfloat16")
        vocabs = [list(np.linspace(-3, 3, 13)), [-2.0, -1.0, 0.0, 1.0, 2.0]]
        specs = build_metric_specs(vocabs, [False, True], 4)

        def run(opt, p0, n1=4, n2=3):
            tr = Trainer(cfg_b, feed, opt, specs, eval_iters=3)
            p, o = p0, opt.init(p0)
            p, o, l1 = tr.train_chunk(p, o, jax.random.PRNGKey(21), n1)
            p, o, l2 = tr.train_chunk(p, o, jax.random.PRNGKey(22), n2)
            return p, o, np.concatenate([np.asarray(l1, np.float32),
                                         np.asarray(l2, np.float32)])

        p_f, _, l_f = run(make_optimizer(1e-2), fresh(params))
        opt_b = make_optimizer(1e-2, params_dtype="bfloat16")
        p_b0 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), fresh(params))
        p_b, o_b, l_b = run(opt_b, p_b0)

        for leaf in jax.tree.leaves(p_b):
            assert leaf.dtype == jnp.bfloat16
        # bf16 storage rounds each applied update; trajectories track the
        # f32-master baseline at bf16 resolution over these short chunks
        np.testing.assert_allclose(l_f, l_b, atol=5e-2)
        # per-weight drift compounds over steps (each applied update rounds
        # through bf16); what must hold is aggregate tracking, not per-leaf
        # bit closeness
        num = sum(
            float(jnp.sum(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32))))
            for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_b))
        )
        den = sum(float(x.size) for x in jax.tree.leaves(p_f))
        rms = math.sqrt(num / den)
        assert rms < 2e-2, f"bf16-master params RMS drift {rms:.4f} vs f32 master"


class TestFusedUpdate:
    """Fused flat-state AdamW chunk (tpu_options.fused_update,
    train/steps.AdamWSpec): the scan carries three flat vectors instead of
    the per-leaf train state. Trajectories must match the per-leaf path for
    every moment-dtype variant, and the standard optax state must round-trip
    across chunk boundaries."""

    def _run(self, setup, opt, spec, n1=4, n2=3):
        cfg, feed, _, params, _ = setup
        vocabs = [list(np.linspace(-3, 3, 13)), [-2.0, -1.0, 0.0, 1.0, 2.0]]
        specs = build_metric_specs(vocabs, [False, True], 4)
        tr = Trainer(cfg, feed, opt, specs, eval_iters=3, adamw_spec=spec)
        p, o = fresh(params), opt.init(fresh(params))
        p, o, l1 = tr.train_chunk(p, o, jax.random.PRNGKey(11), n1)
        p, o, l2 = tr.train_chunk(p, o, jax.random.PRNGKey(12), n2)
        return p, o, np.concatenate([np.asarray(l1), np.asarray(l2)])

    @pytest.mark.parametrize("mdt,ndt", [
        ("float32", "float32"),
        ("bfloat16", "float32"),
        ("bfloat16", "bfloat16"),
    ])
    def test_matches_per_leaf_path(self, setup, mdt, ndt):
        opt, spec = make_optimizer(1e-2, mdt, ndt, with_spec=True)
        pa, oa, la = self._run(setup, opt, None)
        pb, ob, lb = self._run(setup, opt, spec)
        np.testing.assert_allclose(la, lb, atol=1e-5)
        for x, y in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
            np.testing.assert_allclose(
                np.asarray(x, np.float32), np.asarray(y, np.float32), atol=2e-5
            )
        # optimizer state round-trips in the standard optax structure
        from trade_aid_multimodal_transformer_tpu.train.steps import (
            _find_adam_state,
        )

        sa, sb = _find_adam_state(oa), _find_adam_state(ob)
        assert int(sa.count) == int(sb.count) == 7
        for x, y in zip(jax.tree.leaves(sa.mu), jax.tree.leaves(sb.mu)):
            assert x.dtype == y.dtype
            np.testing.assert_allclose(
                np.asarray(x, np.float32), np.asarray(y, np.float32), atol=2e-4
            )

    def test_schedule_counts_continue_across_chunks(self, setup):
        opt, spec = make_optimizer(
            1e-2, lr_schedule={"type": "cosine", "warmup_steps": 2,
                               "decay_steps": 14}, with_spec=True,
        )
        pa, oa, la = self._run(setup, opt, None)
        pb, ob, lb = self._run(setup, opt, spec)
        np.testing.assert_allclose(la, lb, atol=1e-5)
        for x, y in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-5)
        # the ScaleByScheduleState count must also round-trip: the fused
        # path steps the schedule itself, and a checkpoint resumed with
        # fused_update off must not restart the warmup (advisor r4)
        import optax

        def schedule_counts(state):
            if isinstance(state, optax.ScaleByScheduleState):
                return [int(state.count)]
            if isinstance(state, (tuple, list)):
                return [c for s in state for c in schedule_counts(s)]
            return []

        ca, cb = schedule_counts(oa), schedule_counts(ob)
        assert ca == cb == [7], (ca, cb)

    def test_config_surface(self):
        from trade_aid_multimodal_transformer_tpu.config.system import SystemConfig

        sc = SystemConfig.from_dict({})
        assert sc.fused_update == "auto"
        sc = SystemConfig.from_dict({"tpu_options": {"fused_update": False}})
        assert sc.fused_update is False
        assert sc.to_dict()["tpu_options"]["fused_update"] is False
        with pytest.raises(ValueError, match="fused_update"):
            SystemConfig.from_dict({"tpu_options": {"fused_update": "yes"}})
