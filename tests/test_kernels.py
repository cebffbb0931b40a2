"""Pallas kernel equivalence tests (interpret mode on CPU).

The flash kernel must match the dense jnp core bit-closely in f32 — values
AND gradients: the custom VJP runs blockwise dQ / dK+dV kernels (no dense
T×T materialization in either direction), so gradient equivalence against
the dense core pins the backward kernels' math. On-TPU equivalence was
additionally measured at ~7e-3 max diff (bf16-input matmul noise affecting
both paths) with 1.1-1.2x dense speed at T >= 1024 and O(T) memory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trade_aid_multimodal_transformer_tpu.ops.attention import (
    causal_attention,
    causal_attention_jnp,
)
from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (
    flash_attention_eligible,
    flash_causal_attention,
    flash_cross_attention,
)


def qkv(n, t, hs, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (n, t, hs), jnp.float32) for k in ks)


@pytest.mark.slow
class TestFlashEquivalence:
    @pytest.mark.parametrize(
        "n,t,hs", [(4, 256, 64), (2, 512, 32), (3, 256, 8), (1, 384, 16)]
    )
    def test_forward_matches_dense(self, n, t, hs):
        q, k, v = qkv(n, t, hs, seed=t + n)
        ref = causal_attention_jnp(q, k, v)
        out = flash_causal_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_multi_leading_dims(self):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        shape = (2, 3, 2, 256, 16)  # (M, B, H, T, hs)
        q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
        ref = causal_attention_jnp(q, k, v)
        out = flash_causal_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("n,t,hs", [(2, 256, 16), (1, 512, 32), (3, 384, 8)])
    def test_gradients_match_dense(self, n, t, hs):
        q, k, v = qkv(n, t, hs, seed=7 + t)

        def loss_flash(q, k, v):
            return (flash_causal_attention(q, k, v, interpret=True) ** 2).sum()

        def loss_dense(q, k, v):
            return (causal_attention_jnp(q, k, v) ** 2).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    def test_gradients_weighted_cotangent(self):
        # non-uniform upstream gradient exercises the delta = rowsum(dO∘O) path
        q, k, v = qkv(2, 256, 16, seed=21)
        w = jax.random.normal(jax.random.PRNGKey(5), (2, 256, 16))

        gf = jax.grad(
            lambda q, k, v: (flash_causal_attention(q, k, v, interpret=True) * w).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        gd = jax.grad(
            lambda q, k, v: (causal_attention_jnp(q, k, v) * w).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    def test_causality(self):
        q, k, v = qkv(1, 256, 16, seed=9)
        out_a = flash_causal_attention(q, k, v, interpret=True)
        # perturb the last key/value: earlier positions must not change
        k2 = k.at[:, -1].add(1.0)
        v2 = v.at[:, -1].add(1.0)
        out_b = flash_causal_attention(q, k2, v2, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out_a[:, :-1]), np.asarray(out_b[:, :-1]), atol=1e-6
        )
        assert not np.allclose(np.asarray(out_a[:, -1]), np.asarray(out_b[:, -1]))


@pytest.mark.slow
class TestFlashCross:
    """The fused cross-attention kernel must equal per-stream dense attention
    summed over streams (reference semantics: model.py:119-159)."""

    @pytest.mark.parametrize("j,n,t,hs", [(2, 2, 256, 16), (3, 1, 256, 32)])
    def test_matches_dense_sum(self, j, n, t, hs):
        ks = jax.random.split(jax.random.PRNGKey(j * 10 + n), 3)
        q = jax.random.normal(ks[0], (n, t, hs), jnp.float32)
        k = jax.random.normal(ks[1], (j, n, t, hs), jnp.float32)
        v = jax.random.normal(ks[2], (j, n, t, hs), jnp.float32)
        ref = causal_attention_jnp(q[None], k, v).sum(axis=0)
        out = flash_cross_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_multi_leading_dims(self):
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(ks[0], (2, 4, 256, 16), jnp.float32)  # (B,H,T,hs)
        k = jax.random.normal(ks[1], (3, 2, 4, 256, 16), jnp.float32)
        v = jax.random.normal(ks[2], (3, 2, 4, 256, 16), jnp.float32)
        ref = causal_attention_jnp(q[None], k, v).sum(axis=0)
        out = flash_cross_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_gradients_match_dense(self):
        """The per-stream blockwise VJP must equal the dense gradient."""
        ks = jax.random.split(jax.random.PRNGKey(8), 3)
        q = jax.random.normal(ks[0], (2, 256, 16), jnp.float32)
        k = jax.random.normal(ks[1], (3, 2, 256, 16), jnp.float32)
        v = jax.random.normal(ks[2], (3, 2, 256, 16), jnp.float32)

        gf = jax.grad(
            lambda q, k, v: (flash_cross_attention(q, k, v, interpret=True) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        gd = jax.grad(
            lambda q, k, v: (causal_attention_jnp(q[None], k, v).sum(0) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_in_kernel_dropout_semantics(self):
        """Cross dropout: deterministic per key, per-stream independent,
        zero-rate identical to the plain kernel, mean-preserving."""
        ks = jax.random.split(jax.random.PRNGKey(17), 3)
        q = jax.random.normal(ks[0], (1, 256, 16), jnp.float32)
        k = jax.random.normal(ks[1], (2, 1, 256, 16), jnp.float32)
        v = jax.random.normal(ks[2], (2, 1, 256, 16), jnp.float32)
        base = flash_cross_attention(q, k, v, interpret=True)
        z = flash_cross_attention(q, k, v, interpret=True, dropout_rate=0.0)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(z))

        key = jax.random.PRNGKey(4)
        a = flash_cross_attention(q, k, v, interpret=True, dropout_rate=0.3,
                                  dropout_key=key)
        b = flash_cross_attention(q, k, v, interpret=True, dropout_rate=0.3,
                                  dropout_key=key)
        c = flash_cross_attention(q, k, v, interpret=True, dropout_rate=0.3,
                                  dropout_key=jax.random.PRNGKey(5))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))
        outs = np.stack([
            np.asarray(flash_cross_attention(q, k, v, interpret=True,
                                             dropout_rate=0.3,
                                             dropout_key=jax.random.PRNGKey(i)))
            for i in range(24)
        ])
        err = np.abs(outs.mean(0) - np.asarray(base)).mean()
        spread = np.abs(outs[0] - np.asarray(base)).mean()
        assert err < spread / 2

    def test_in_kernel_dropout_gradients(self):
        """Backward mask regeneration (per-stream shifted seeds) must be
        consistent with the fused forward — checked by finite differences."""
        from jax.test_util import check_grads

        ks = jax.random.split(jax.random.PRNGKey(19), 3)
        q = jax.random.normal(ks[0], (1, 256, 8), jnp.float32)
        k = jax.random.normal(ks[1], (2, 1, 256, 8), jnp.float32)
        v = jax.random.normal(ks[2], (2, 1, 256, 8), jnp.float32)
        key = jax.random.PRNGKey(23)

        def f(q, k, v):
            return flash_cross_attention(
                q, k, v, interpret=True, dropout_rate=0.25, dropout_key=key
            ).sum()

        check_grads(f, (q, k, v), order=1, modes=("rev",), atol=2e-2, rtol=2e-2)

    @pytest.mark.parametrize("rate", [0.0, 0.25])
    def test_res_forward_matches_per_stream(self, rate):
        """The grad-path cross kernel's per-stream residuals (out_j, lse_j)
        must equal running the row forward per stream with the shifted
        seed — the backward consumes them instead of recomputing (and its
        sum output must equal the sum-only primal kernel's)."""
        from trade_aid_multimodal_transformer_tpu.ops import pallas_attention as pa

        ks = jax.random.split(jax.random.PRNGKey(29), 3)
        q = jax.random.normal(ks[0], (2, 256, 16), jnp.float32)
        k = jax.random.normal(ks[1], (3, 2, 256, 16), jnp.float32)
        v = jax.random.normal(ks[2], (3, 2, 256, 16), jnp.float32)
        seed = jnp.asarray([777], jnp.int32)
        out, outs, lses = pa._flash_cross_forward_res(
            q, k, v, seed, 128, 128, rate, True
        )
        out_sum = pa._flash_cross_forward(q, k, v, seed, 128, 128, rate, True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(out_sum), atol=1e-6
        )
        for j in range(3):
            seed_j = seed + (j + 1) * pa._STREAM_SEED_STRIDE
            o_j, l_j = pa._flash_forward(
                q, k[j], v[j], seed_j, 128, 128, rate, True
            )
            np.testing.assert_allclose(
                np.asarray(outs[j]), np.asarray(o_j), atol=1e-6,
                err_msg=f"stream {j} residual out mismatch (rate={rate})",
            )
            np.testing.assert_allclose(
                np.asarray(lses[j]), np.asarray(l_j), atol=1e-6,
                err_msg=f"stream {j} residual lse mismatch (rate={rate})",
            )


@pytest.mark.slow
class TestInKernelDropout:
    """Attention dropout generated inside the kernel (TPU-native PRNG): the
    keep-mask is regenerated per (seed, batch·head, q-block, k-block) in
    forward and backward, so gradients must be consistent with the forward
    function at a FIXED seed — checked by finite differences."""

    def test_zero_rate_matches_plain_kernel(self):
        q, k, v = qkv(2, 256, 16, seed=11)
        a = flash_causal_attention(q, k, v, interpret=True)
        b = flash_causal_attention(
            q, k, v, interpret=True, dropout_rate=0.0, dropout_key=None
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_deterministic_per_key_and_varies_across_keys(self):
        q, k, v = qkv(2, 256, 16, seed=12)
        key = jax.random.PRNGKey(3)
        a = flash_causal_attention(q, k, v, interpret=True,
                                   dropout_rate=0.3, dropout_key=key)
        b = flash_causal_attention(q, k, v, interpret=True,
                                   dropout_rate=0.3, dropout_key=key)
        c = flash_causal_attention(q, k, v, interpret=True,
                                   dropout_rate=0.3, dropout_key=jax.random.PRNGKey(4))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))

    def test_dropout_changes_output_and_preserves_mean(self):
        # E[dropout(P)] = P, so averaging outputs over many keys approaches
        # the no-dropout output
        q, k, v = qkv(1, 256, 16, seed=13)
        base = flash_causal_attention(q, k, v, interpret=True)
        outs = [
            flash_causal_attention(q, k, v, interpret=True, dropout_rate=0.4,
                                   dropout_key=jax.random.PRNGKey(i))
            for i in range(24)
        ]
        assert not np.allclose(np.asarray(outs[0]), np.asarray(base))
        mean = np.mean([np.asarray(o) for o in outs], axis=0)
        err = np.abs(mean - np.asarray(base)).mean()
        spread = np.abs(np.asarray(outs[0]) - np.asarray(base)).mean()
        assert err < spread / 2  # averaging shrinks toward the expectation

    def test_gradients_consistent_with_forward(self):
        from jax.test_util import check_grads

        q, k, v = qkv(1, 256, 8, seed=14)
        key = jax.random.PRNGKey(9)

        def f(q, k, v):
            return flash_causal_attention(
                q, k, v, interpret=True, dropout_rate=0.25, dropout_key=key
            ).sum()

        check_grads(f, (q, k, v), order=1, modes=("rev",), atol=2e-2, rtol=2e-2)


class TestDispatch:
    def test_eligibility_gates(self):
        q, k, v = qkv(1, 256, 64)
        assert flash_attention_eligible(q, k, v)
        # short sequence
        qs, ks_, vs = qkv(1, 128, 64)
        assert not flash_attention_eligible(qs, ks_, vs)
        # unaligned T
        qu = jnp.zeros((1, 300, 64))
        assert not flash_attention_eligible(qu, qu, qu)
        # cross-attention broadcast layout (q fewer leading dims)
        assert not flash_attention_eligible(q[0], k, v)

    def test_auto_dispatch_falls_back_on_cpu(self):
        # on CPU 'auto' must use the dense core and still be correct
        q, k, v = qkv(2, 256, 16, seed=3)
        out = causal_attention(q, k, v, impl="auto")
        ref = causal_attention_jnp(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_dropout_path_uses_dense(self):
        # with train+dropout the dense core must be selected (flash has no
        # in-kernel dropout yet); result must differ from no-dropout output
        q, k, v = qkv(2, 256, 16, seed=4)
        out = causal_attention(
            q, k, v, dropout_rate=0.5, dropout_key=jax.random.PRNGKey(0), train=True
        )
        ref = causal_attention_jnp(q, k, v)
        assert not np.allclose(np.asarray(out), np.asarray(ref))


@pytest.mark.slow
class TestChunkPrimitives:
    """The ring/CP chunk core: the Pallas chunk kernels (causal AND full-mask
    variants) must match the dense jnp mirror in values, lse, and the
    given-lse backward — this is the 'shared per-chunk math' contract between
    ops/pallas_attention.py and parallel/ring_attention.py."""

    @pytest.mark.parametrize("causal", [True, False])
    def test_chunk_fwd_matches_jnp(self, causal):
        from trade_aid_multimodal_transformer_tpu.ops.attention import chunk_fwd_jnp
        from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (
            flash_chunk_fwd,
        )

        q, k, v = qkv(2, 256, 16, seed=41)
        out_p, lse_p = flash_chunk_fwd(q, k, v, causal, interpret=True)
        out_j, lse_j = chunk_fwd_jnp(q, k, v, causal)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_j), atol=2e-5)
        np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_j), atol=2e-5)

    @pytest.mark.parametrize("causal", [True, False])
    def test_chunk_bwd_matches_jnp(self, causal):
        from trade_aid_multimodal_transformer_tpu.ops.attention import (
            chunk_bwd_jnp,
            chunk_fwd_jnp,
        )
        from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (
            flash_chunk_bwd,
        )

        q, k, v = qkv(2, 256, 16, seed=43)
        out, lse = chunk_fwd_jnp(q, k, v, causal)
        g = jax.random.normal(jax.random.PRNGKey(3), out.shape, out.dtype)
        d_p = flash_chunk_bwd(q, k, v, out, lse, g, causal, interpret=True)
        d_j = chunk_bwd_jnp(q, k, v, out, lse, g, causal)
        for gp, gj, name in zip(d_p, d_j, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gj), atol=3e-5,
                err_msg=f"chunk d{name} mismatch (causal={causal})",
            )

    def test_full_chunk_different_kv_length(self):
        """Non-causal chunks may have t_k != t_q (KV-cache / ring shapes)."""
        from trade_aid_multimodal_transformer_tpu.ops.attention import chunk_fwd_jnp
        from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (
            flash_chunk_fwd,
        )

        q, _, _ = qkv(2, 128, 16, seed=45)
        _, k, v = qkv(2, 256, 16, seed=46)
        out_p, lse_p = flash_chunk_fwd(q, k, v, causal=False, interpret=True)
        out_j, lse_j = chunk_fwd_jnp(q, k, v, causal=False)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_j), atol=2e-5)
        np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_j), atol=2e-5)

    def test_chunk_bwd_is_true_gradient(self):
        """chunk_bwd with the chunk's own lse equals autodiff through
        chunk_fwd (sanity that the flash identities are implemented right)."""
        from trade_aid_multimodal_transformer_tpu.ops.attention import (
            chunk_bwd_jnp,
            chunk_fwd_jnp,
        )

        q, k, v = qkv(1, 64, 8, seed=47)

        def f(q, k, v):
            out, _ = chunk_fwd_jnp(q, k, v, True)
            return jnp.sum(out ** 2)

        gq, gk, gv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        out, lse = chunk_fwd_jnp(q, k, v, True)
        dq, dk, dv = chunk_bwd_jnp(q, k, v, out, lse, 2.0 * out, True)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(dq), atol=2e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(dk), atol=2e-5)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(dv), atol=2e-5)


@pytest.mark.slow
class TestStreamedKernels:
    """KV-streamed kernel variants (third grid dimension + VMEM scratch
    carry) must match the whole-row kernels exactly — including dropout,
    whose (seed, n, iq, jk) keying is identical in both layouts."""

    @pytest.mark.parametrize("causal", [True, False])
    def test_fwd_matches_row_kernel(self, causal):
        from trade_aid_multimodal_transformer_tpu.ops import pallas_attention as pa

        q, k, v = qkv(2, 512, 16, seed=51)
        seed = jnp.zeros((1,), jnp.int32)
        out_s, lse_s = pa._flash_forward_streamed(
            q, k, v, seed, 128, 128, 0.0, True, causal=causal
        )
        out_r, lse_r = pa._flash_forward(
            q, k, v, seed, 128, 128, 0.0, True, causal=causal
        )
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r), atol=1e-6)
        np.testing.assert_allclose(np.asarray(lse_s), np.asarray(lse_r), atol=1e-6)

    @pytest.mark.parametrize("causal", [True, False])
    def test_bwd_matches_row_kernel(self, causal):
        from trade_aid_multimodal_transformer_tpu.ops import pallas_attention as pa

        q, k, v = qkv(2, 512, 16, seed=53)
        seed = jnp.zeros((1,), jnp.int32)
        out, lse = pa._flash_forward(q, k, v, seed, 128, 128, 0.0, True, causal=causal)
        g = jax.random.normal(jax.random.PRNGKey(5), out.shape, out.dtype)
        d_s = pa._flash_backward_streamed(
            q, k, v, out, lse, g, seed, 128, 128, 0.0, True, causal=causal
        )
        d_r = pa._flash_backward(
            q, k, v, out, lse, g, seed, 128, 128, 0.0, True, causal=causal
        )
        for gs, gr, name in zip(d_s, d_r, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gs), np.asarray(gr), atol=2e-6,
                err_msg=f"streamed d{name} mismatch (causal={causal})",
            )

    def test_dropout_masks_identical_across_layouts(self):
        from trade_aid_multimodal_transformer_tpu.ops import pallas_attention as pa

        q, k, v = qkv(1, 512, 16, seed=55)
        seed = jnp.asarray([1234], jnp.int32)
        out_s, _ = pa._flash_forward_streamed(q, k, v, seed, 128, 128, 0.25, True)
        out_r, _ = pa._flash_forward(q, k, v, seed, 128, 128, 0.25, True)
        np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r), atol=1e-6)

    def test_auto_streaming_end_to_end_grads(self, monkeypatch):
        """With a tiny VMEM budget the public entry point auto-selects the
        streamed kernels; values and grads must still match the dense core."""
        from trade_aid_multimodal_transformer_tpu.ops import pallas_attention as pa

        monkeypatch.setattr(pa, "KV_ROW_VMEM_BUDGET", 1024)
        q, k, v = qkv(1, 512, 16, seed=57)

        def f_flash(q, k, v):
            return jnp.sum(flash_causal_attention(q, k, v, interpret=True) ** 2)

        def f_dense(q, k, v):
            return jnp.sum(causal_attention_jnp(q, k, v) ** 2)

        np.testing.assert_allclose(
            float(f_flash(q, k, v)), float(f_dense(q, k, v)), rtol=1e-5
        )
        g_f = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
        g_d = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_f, g_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


class TestFusedBackward:
    """The fused dQ+dK+dV kernel (one P = exp(S−L) recompute per block pair,
    dQ accumulated in a VMEM-revisited f32 row output) must match the split
    dQ / dK+dV kernels exactly — including the dropout bitstream, whose
    (seed, n, iq, jk) keying is shared by all backward layouts."""

    @pytest.mark.parametrize("causal", [True, False])
    @pytest.mark.parametrize("bq,bk", [(128, 128), (256, 128), (128, 256)])
    def test_matches_split_kernels(self, causal, bq, bk):
        from trade_aid_multimodal_transformer_tpu.ops import pallas_attention as pa

        q, k, v = qkv(2, 512, 16, seed=71)
        seed = jnp.zeros((1,), jnp.int32)
        out, lse = pa._flash_forward(q, k, v, seed, bq, bk, 0.0, True, causal=causal)
        g = jax.random.normal(jax.random.PRNGKey(7), out.shape, out.dtype)
        d_f = pa._flash_backward_fused(
            q, k, v, out, lse, g, seed, bq, bk, 0.0, True, causal=causal
        )
        d_s = pa._flash_backward(
            q, k, v, out, lse, g, seed, bq, bk, 0.0, True, causal=causal
        )
        for gf, gs, name in zip(d_f, d_s, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gs), atol=2e-6,
                err_msg=f"fused d{name} mismatch (causal={causal}, bq={bq}, bk={bk})",
            )

    def test_dropout_bitstream_matches_split(self):
        from trade_aid_multimodal_transformer_tpu.ops import pallas_attention as pa

        q, k, v = qkv(1, 512, 16, seed=73)
        seed = jnp.asarray([4321], jnp.int32)
        out, lse = pa._flash_forward(q, k, v, seed, 128, 128, 0.25, True)
        g = jax.random.normal(jax.random.PRNGKey(9), out.shape, out.dtype)
        d_f = pa._flash_backward_fused(
            q, k, v, out, lse, g, seed, 128, 128, 0.25, True
        )
        d_s = pa._flash_backward(
            q, k, v, out, lse, g, seed, 128, 128, 0.25, True
        )
        for gf, gs, name in zip(d_f, d_s, "qkv"):
            np.testing.assert_allclose(
                np.asarray(gf), np.asarray(gs), atol=2e-6,
                err_msg=f"fused d{name} dropout mismatch",
            )

    def test_dispatch_selects_fused(self):
        """Production/long-context shapes (bf16, T ≤ ~9.8k; f32, T ≤ ~6.7k)
        take the fused tier; beyond it the split kernels, then streaming."""
        from trade_aid_multimodal_transformer_tpu.ops import pallas_attention as pa

        assert pa._fused_bwd_fits(1024, 64, 2)
        assert pa._fused_bwd_fits(4096, 64, 2)
        assert pa._fused_bwd_fits(4096, 64, 4)
        assert not pa._fused_bwd_fits(16384, 64, 2)
        assert not pa._fused_bwd_fits(8192, 64, 4)

    def test_gate_fallback_end_to_end_grads(self, monkeypatch):
        """With the fused budget forced to zero the public entry point falls
        back to the split kernels; grads must still match the dense core."""
        from trade_aid_multimodal_transformer_tpu.ops import pallas_attention as pa

        monkeypatch.setattr(pa, "FUSED_BWD_VMEM_BUDGET", 0)
        q, k, v = qkv(1, 512, 16, seed=75)
        g_f = jax.grad(
            lambda q, k, v: jnp.sum(flash_causal_attention(q, k, v, interpret=True) ** 2),
            argnums=(0, 1, 2),
        )(q, k, v)
        g_d = jax.grad(
            lambda q, k, v: jnp.sum(causal_attention_jnp(q, k, v) ** 2),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g_f, g_d):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


@pytest.mark.slow
class TestBf16KernelIO:
    """bf16 q/k/v pass straight through the kernels (half the HBM traffic);
    compute still accumulates in f32. Tolerance reflects bf16's ~3 decimal
    digits on inputs/outputs."""

    def test_bf16_forward_matches_f32(self):
        q, k, v = qkv(2, 512, 16, seed=61)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        out_b = flash_causal_attention(qb, kb, vb, interpret=True)
        assert out_b.dtype == jnp.bfloat16
        ref = causal_attention_jnp(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out_b, dtype=np.float32), np.asarray(ref), atol=2e-2
        )

    def test_bf16_grads_finite_and_close(self):
        q, k, v = qkv(1, 256, 16, seed=63)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))

        def f(q, k, v):
            return jnp.sum(
                flash_causal_attention(q, k, v, interpret=True).astype(jnp.float32) ** 2
            )

        g_b = jax.grad(f, argnums=(0, 1, 2))(qb, kb, vb)
        g_f = jax.grad(
            lambda q, k, v: jnp.sum(causal_attention_jnp(q, k, v) ** 2),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g_b, g_f):
            assert a.dtype == jnp.bfloat16
            np.testing.assert_allclose(
                np.asarray(a, dtype=np.float32), np.asarray(b), atol=5e-2
            )


class TestQuickSmoke:
    """Fast, unmarked kernel equivalence smoke (the full interpret-mode
    sweeps run under `-m slow`): one forward + one gradient case."""

    def test_forward_smoke(self):
        q, k, v = qkv(1, 256, 16, seed=3)
        ref = causal_attention_jnp(q, k, v)
        out = flash_causal_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_gradient_smoke(self):
        q, k, v = qkv(1, 256, 16, seed=5)
        gf = jax.grad(
            lambda q, k, v: (flash_causal_attention(q, k, v, interpret=True) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        gd = jax.grad(
            lambda q, k, v: (causal_attention_jnp(q, k, v) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


# --------------------------------------------------------- short-context kernel


from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (  # noqa: E402
    hash_keep_mask,
    seed_from_key,
    short_attention_eligible,
    short_causal_attention,
    short_causal_attention_packed,
    short_cross_attention,
    short_cross_eligible,
    _STREAM_SEED_STRIDE,
)


def _short_ref(q, k, v, seed=None, rate=0.0, stream_seed=None):
    """jnp mirror of the short kernel's interpret-mode math: masked softmax,
    keep-mask on normalized probabilities keyed by the GLOBAL collapsed row
    index (the kernel keys by pid*g + in-block row, which equals it)."""
    n, t, hs = q.shape
    s = jnp.einsum("nqh,nkh->nqk", q, k) * hs ** -0.5
    s = jnp.where(jnp.tril(jnp.ones((t, t), bool)), s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    if rate > 0.0:
        n_idx = jnp.arange(n, dtype=jnp.int32).reshape(n, 1, 1)
        use = stream_seed if stream_seed is not None else seed
        keep = hash_keep_mask(use, n_idx, 0, 0, (n, t, t), rate)
        p = jnp.where(keep, p, 0.0) / (1.0 - rate)
    return jnp.einsum("nqk,nkh->nqh", p, v)


class TestShortKernel:
    @pytest.mark.parametrize(
        "n,t,hs", [(4, 64, 64), (2, 8, 16), (3, 128, 32), (2, 72, 16), (1, 512, 64)]
    )
    def test_forward_matches_dense(self, n, t, hs):
        q, k, v = qkv(n, t, hs, seed=t + n)
        ref = causal_attention_jnp(q, k, v)
        out = short_causal_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_multi_leading_dims(self):
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        shape = (2, 3, 2, 64, 16)  # (M, B, H, T, hs)
        q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
        ref = causal_attention_jnp(q, k, v)
        out = short_causal_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("n,t,hs", [(4, 64, 64), (2, 8, 16), (3, 128, 32)])
    def test_gradients_match_dense(self, n, t, hs):
        q, k, v = qkv(n, t, hs, seed=7 + t)
        gf = jax.grad(
            lambda q, k, v: (
                short_causal_attention(q, k, v, interpret=True) ** 2
            ).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        gd = jax.grad(
            lambda q, k, v: (causal_attention_jnp(q, k, v) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(gf, gd):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    def test_dropout_matches_reference_fwd_and_grad(self):
        """Interpret-mode dropout (values AND the single-kernel backward)
        against an independent jnp mirror using the same hash mask."""
        n, t, hs = 4, 64, 16
        q, k, v = qkv(n, t, hs, seed=11)
        key = jax.random.PRNGKey(5)
        seed = seed_from_key(key)
        rate = 0.25

        out = short_causal_attention(
            q, k, v, interpret=True, dropout_rate=rate, dropout_key=key
        )
        ref = _short_ref(q, k, v, seed=seed, rate=rate)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

        gk = jax.grad(
            lambda q, k, v: (
                short_causal_attention(
                    q, k, v, interpret=True, dropout_rate=rate, dropout_key=key
                ) ** 2
            ).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        gr = jax.grad(
            lambda q, k, v: (_short_ref(q, k, v, seed=seed, rate=rate) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    def test_dropout_deterministic_and_key_dependent(self):
        q, k, v = qkv(2, 64, 16, seed=3)
        a = short_causal_attention(q, k, v, interpret=True, dropout_rate=0.3,
                                   dropout_key=jax.random.PRNGKey(1))
        b = short_causal_attention(q, k, v, interpret=True, dropout_rate=0.3,
                                   dropout_key=jax.random.PRNGKey(1))
        c = short_causal_attention(q, k, v, interpret=True, dropout_rate=0.3,
                                   dropout_key=jax.random.PRNGKey(2))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-3

    def test_cross_matches_dense_sum(self):
        j, n, t, hs = 3, 2, 64, 16
        ks = jax.random.split(jax.random.PRNGKey(9), 3)
        q = jax.random.normal(ks[0], (n, t, hs), jnp.float32)
        k = jax.random.normal(ks[1], (j, n, t, hs), jnp.float32)
        v = jax.random.normal(ks[2], (j, n, t, hs), jnp.float32)
        ref = causal_attention_jnp(q[None], k, v).sum(axis=0)
        out = short_cross_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_cross_gradients_and_per_stream_dropout(self):
        j, n, t, hs = 2, 2, 64, 16
        ks = jax.random.split(jax.random.PRNGKey(13), 3)
        q = jax.random.normal(ks[0], (n, t, hs), jnp.float32)
        k = jax.random.normal(ks[1], (j, n, t, hs), jnp.float32)
        v = jax.random.normal(ks[2], (j, n, t, hs), jnp.float32)
        key = jax.random.PRNGKey(21)
        seed = seed_from_key(key)
        rate = 0.2

        def ref(q, k, v):
            tot = None
            for jj in range(k.shape[0]):
                o = _short_ref(
                    q, k[jj], v[jj], rate=rate,
                    stream_seed=seed + (jj + 1) * _STREAM_SEED_STRIDE,
                )
                tot = o if tot is None else tot + o
            return tot

        out = short_cross_attention(
            q, k, v, interpret=True, dropout_rate=rate, dropout_key=key
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref(q, k, v)), atol=2e-5
        )
        gk = jax.grad(
            lambda q, k, v: (
                short_cross_attention(
                    q, k, v, interpret=True, dropout_rate=rate, dropout_key=key
                ) ** 2
            ).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        gr = jax.grad(
            lambda q, k, v: (ref(q, k, v) ** 2).sum(), argnums=(0, 1, 2)
        )(q, k, v)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)

    def test_cross_transposed_kv_matches_untransposed(self):
        """short_cross_attention_t: same math as short_cross_attention with
        k/v logically transposed (J, ..., hs, T) — fwd, grads, and the
        dropout masks (same per-program/per-stream keying) must agree."""
        from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (
            short_cross_attention_t,
            short_cross_t_eligible,
        )

        j, n, t, hs = 3, 2, 64, 16
        ks = jax.random.split(jax.random.PRNGKey(17), 3)
        q = jax.random.normal(ks[0], (n, t, hs), jnp.float32)
        k = jax.random.normal(ks[1], (j, n, t, hs), jnp.float32)
        v = jax.random.normal(ks[2], (j, n, t, hs), jnp.float32)
        kT, vT = jnp.swapaxes(k, -1, -2), jnp.swapaxes(v, -1, -2)

        ref = causal_attention_jnp(q[None], k, v).sum(axis=0)
        out = short_cross_attention_t(q, kT, vT, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

        key = jax.random.PRNGKey(23)
        rate = 0.2
        f_t = lambda q, kT, vT: (short_cross_attention_t(  # noqa: E731
            q, kT, vT, interpret=True, dropout_rate=rate, dropout_key=key
        ) ** 2).sum()
        f_a = lambda q, k, v: (short_cross_attention(  # noqa: E731
            q, k, v, interpret=True, dropout_rate=rate, dropout_key=key
        ) ** 2).sum()
        gt = jax.grad(f_t, argnums=(0, 1, 2))(q, kT, vT)
        ga = jax.grad(f_a, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(gt[0]), np.asarray(ga[0]), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(gt[1], -1, -2)), np.asarray(ga[1]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(jnp.swapaxes(gt[2], -1, -2)), np.asarray(ga[2]), atol=1e-5
        )
        assert short_cross_t_eligible(64, 16)
        assert not short_cross_t_eligible(4, 16)
        assert not short_cross_t_eligible(64, 12)

    def test_eligibility_bands(self):
        mk = lambda t, hs=16: jnp.zeros((2, t, hs))  # noqa: E731
        assert short_attention_eligible(mk(8), mk(8), mk(8))
        assert short_attention_eligible(mk(64), mk(64), mk(64))
        assert short_attention_eligible(mk(72), mk(72), mk(72))
        assert short_attention_eligible(mk(512), mk(512), mk(512))
        assert not short_attention_eligible(mk(4), mk(4), mk(4))
        assert not short_attention_eligible(mk(768), mk(768), mk(768))
        assert not short_attention_eligible(mk(68), mk(68), mk(68))
        q = jnp.zeros((2, 64, 16))
        kv = jnp.zeros((3, 2, 64, 16))
        assert short_cross_eligible(q, kv, kv)
        assert not short_cross_eligible(q, jnp.zeros((3, 2, 4, 16)),
                                        jnp.zeros((3, 2, 4, 16)))

    def test_bf16_io(self):
        q, k, v = (x.astype(jnp.bfloat16) for x in qkv(2, 64, 64, seed=8))
        out = short_causal_attention(q, k, v, interpret=True)
        assert out.dtype == jnp.bfloat16
        ref = causal_attention_jnp(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out, dtype=np.float32),
            np.asarray(ref, dtype=np.float32), atol=5e-2,
        )

    def test_packed_matches_dense(self):
        M, B, H, t, hs = 2, 2, 3, 64, 16
        qkv_p = jax.random.normal(
            jax.random.PRNGKey(17), (M, B, 3 * H, t, hs), jnp.float32
        )
        q, k, v = qkv_p[:, :, :H], qkv_p[:, :, H:2 * H], qkv_p[:, :, 2 * H:]
        ref = causal_attention_jnp(q, k, v)
        out = short_causal_attention_packed(qkv_p, H, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_packed_dropout_fwd_and_grad_match_reference(self):
        """Packed kernel vs the jnp mirror with the SAME global-row hash
        mask (packed programs tile collapsed (m,b,h) rows contiguously, so
        interpret-mode keying matches _short_ref's)."""
        M, B, H, t, hs = 2, 2, 2, 64, 16
        qkv_p = jax.random.normal(
            jax.random.PRNGKey(19), (M, B, 3 * H, t, hs), jnp.float32
        )
        key = jax.random.PRNGKey(4)
        seed = seed_from_key(key)
        rate = 0.25

        def ref(qkv_p):
            q = qkv_p[:, :, :H].reshape(M * B * H, t, hs)
            k = qkv_p[:, :, H:2 * H].reshape(M * B * H, t, hs)
            v = qkv_p[:, :, 2 * H:].reshape(M * B * H, t, hs)
            return _short_ref(q, k, v, seed=seed, rate=rate).reshape(
                M, B, H, t, hs
            )

        out = short_causal_attention_packed(
            qkv_p, H, interpret=True, dropout_rate=rate, dropout_key=key
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref(qkv_p)), atol=2e-5
        )
        gk = jax.grad(
            lambda x: (
                short_causal_attention_packed(
                    x, H, interpret=True, dropout_rate=rate, dropout_key=key
                ) ** 2
            ).sum()
        )(qkv_p)
        gr = jax.grad(lambda x: (ref(x) ** 2).sum())(qkv_p)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=5e-4)

    def test_fused_qkv_matches_composition(self):
        """Fused projection+attention kernel vs the unfused composition
        (einsum projections + dense attention), no dropout."""
        from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (
            fused_qkv_attention,
        )

        M, B, H, t, c, hs = 2, 4, 3, 64, 48, 16
        hs2 = hs // 2
        ks = jax.random.split(jax.random.PRNGKey(31), 4)
        x = jax.random.normal(ks[0], (M, B, t, c), jnp.float32)
        w1 = jax.random.normal(ks[1], (M, c, 3 * H * hs2), jnp.float32) * 0.1
        b1 = jax.random.normal(ks[2], (M, 3 * H * hs2), jnp.float32) * 0.1
        w2 = jax.random.normal(ks[3], (M, 3 * H, hs2, hs), jnp.float32) * 0.1

        def composition(x, w1, b1, w2):
            tt = jnp.tanh(jnp.einsum("mbtc,mcd->mbtd", x, w1) + b1[:, None, None])
            tt = tt.reshape(M, B, t, 3 * H, hs2)
            qkv = jnp.einsum("mbthd,mhde->mhbte", tt, w2)  # (M, 3H, B, t, hs)
            q, k, v = qkv[:, :H], qkv[:, H:2 * H], qkv[:, 2 * H:]
            return causal_attention_jnp(q, k, v)           # (M, H, B, t, hs)

        ref = composition(x, w1, b1, w2)
        out = fused_qkv_attention(x, w1, b1, w2, H, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

        # gradients wrt every input
        gk = jax.grad(
            lambda *a: (
                fused_qkv_attention(*a, H, interpret=True) ** 2
            ).sum(),
            argnums=(0, 1, 2, 3),
        )(x, w1, b1, w2)
        gr = jax.grad(
            lambda *a: (composition(*a) ** 2).sum(), argnums=(0, 1, 2, 3)
        )(x, w1, b1, w2)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3
            )

    def test_fused_qkv_dropout_consistency(self):
        """With dropout on: fwd is deterministic per key, key-sensitive, and
        the custom-VJP backward is consistent with the interpret forward
        (finite-difference check on a scalar loss)."""
        from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (
            fused_qkv_attention,
        )

        M, B, H, t, c, hs = 1, 2, 2, 16, 24, 16
        hs2 = hs // 2
        ks = jax.random.split(jax.random.PRNGKey(37), 4)
        x = jax.random.normal(ks[0], (M, B, t, c), jnp.float32)
        w1 = jax.random.normal(ks[1], (M, c, 3 * H * hs2), jnp.float32) * 0.1
        b1 = jnp.zeros((M, 3 * H * hs2), jnp.float32)
        w2 = jax.random.normal(ks[3], (M, 3 * H, hs2, hs), jnp.float32) * 0.1
        key = jax.random.PRNGKey(9)

        f = lambda x: fused_qkv_attention(  # noqa: E731
            x, w1, b1, w2, H, interpret=True,
            dropout_rate=0.3, dropout_key=key,
        )
        a, b = f(x), f(x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        c2 = fused_qkv_attention(
            x, w1, b1, w2, H, interpret=True,
            dropout_rate=0.3, dropout_key=jax.random.PRNGKey(10),
        )
        assert np.abs(np.asarray(a) - np.asarray(c2)).max() > 1e-4

        loss = lambda x: (f(x) ** 2).sum()  # noqa: E731
        g = jax.grad(loss)(x)
        eps = 1e-3
        d = jax.random.normal(jax.random.PRNGKey(11), x.shape, jnp.float32)
        num = (loss(x + eps * d) - loss(x - eps * d)) / (2 * eps)
        ana = (np.asarray(g) * np.asarray(d)).sum()
        np.testing.assert_allclose(num, ana, rtol=2e-2)

    def test_packed_dispatch_fallback_matches(self):
        """causal_attention_packed off-TPU splits and reuses the standard
        dispatch — values must equal attention on the split views."""
        from trade_aid_multimodal_transformer_tpu.ops.attention import (
            causal_attention, causal_attention_packed,
        )

        M, B, H, t, hs = 2, 2, 2, 64, 16
        qkv_p = jax.random.normal(
            jax.random.PRNGKey(23), (M, B, 3 * H, t, hs), jnp.float32
        )
        out = causal_attention_packed(qkv_p, H)
        ref = causal_attention(
            qkv_p[:, :, :H], qkv_p[:, :, H:2 * H], qkv_p[:, :, 2 * H:]
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


# ------------------------------------------------------------- decode kernel


from trade_aid_multimodal_transformer_tpu.models.cache import _attn_cached  # noqa: E402
from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (  # noqa: E402
    decode_attention,
    decode_attention_eligible,
    decode_attention_packed,
    decode_attention_packed_eligible,
    decode_attention_t,
    decode_attention_t_eligible,
)


def _dense_decode(q, kc, vc, pos):
    """Dense masked single-position attention over an UNtransposed
    (..., S, hs) cache — the oracle for the straight decode kernel (the
    production cache layout is now sequence-minor; models/cache._attn_cached
    is its transposed twin)."""
    dt = q.dtype
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("...qh,...kh->...qk", q, kc,
                   preferred_element_type=jnp.float32) * scale
    cols = jnp.arange(kc.shape[-2], dtype=jnp.int32)
    s = jnp.where(cols[None, :] <= pos, s.astype(jnp.float32), -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("...qk,...kh->...qh", p.astype(dt), vc,
                     preferred_element_type=jnp.float32)
    return out.astype(dt)


class TestDecodeKernel:
    """Fused single-position cached-decode attention vs the dense masked
    expression it replaces."""

    @pytest.mark.parametrize("pos", [0, 1, 37, 63])
    def test_matches_dense_cached(self, pos):
        n, s, hs = 6, 64, 16
        ks = jax.random.split(jax.random.PRNGKey(pos + 1), 3)
        q = jax.random.normal(ks[0], (2, 3, 1, hs), jnp.float32)
        kc = jax.random.normal(ks[1], (2, 3, s, hs), jnp.float32)
        vc = jax.random.normal(ks[2], (2, 3, s, hs), jnp.float32)
        ref = _dense_decode(q, kc, vc, jnp.asarray(pos))
        out = decode_attention(q, kc, vc, jnp.asarray(pos), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_cross_broadcast_layout(self):
        j, b, h, s, hs = 3, 2, 2, 128, 16
        ks = jax.random.split(jax.random.PRNGKey(9), 3)
        q = jax.random.normal(ks[0], (1, b, h, 1, hs), jnp.float32)
        kc = jax.random.normal(ks[1], (j, b, h, s, hs), jnp.float32)
        vc = jax.random.normal(ks[2], (j, b, h, s, hs), jnp.float32)
        pos = jnp.asarray(41)
        ref = _dense_decode(q, kc, vc, pos).sum(axis=0)
        qb = jnp.broadcast_to(q, kc.shape[:-2] + q.shape[-2:])
        out = decode_attention(qb, kc, vc, pos, interpret=True).sum(axis=0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_traced_pos_under_scan(self):
        n, s, hs = 4, 64, 8
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(ks[0], (n, 1, hs), jnp.float32)
        kc = jax.random.normal(ks[1], (n, s, hs), jnp.float32)
        vc = jax.random.normal(ks[2], (n, s, hs), jnp.float32)

        def body(pos, _):
            return pos + 1, decode_attention(q, kc, vc, pos, interpret=True)

        _, outs = jax.lax.scan(body, jnp.asarray(0), None, length=4)
        for i in range(4):
            ref = _dense_decode(q, kc, vc, jnp.asarray(i))
            np.testing.assert_allclose(
                np.asarray(outs[i]), np.asarray(ref), atol=2e-5
            )

    def test_bf16_matches_dense_cached(self):
        s, hs = 64, 64
        ks = jax.random.split(jax.random.PRNGKey(7), 3)
        q = jax.random.normal(ks[0], (2, 2, 1, hs), jnp.bfloat16)
        kc = jax.random.normal(ks[1], (2, 2, s, hs), jnp.bfloat16)
        vc = jax.random.normal(ks[2], (2, 2, s, hs), jnp.bfloat16)
        pos = jnp.asarray(50)
        ref = _dense_decode(q, kc, vc, pos)
        out = decode_attention(q, kc, vc, pos, interpret=True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
        )

    def test_eligibility(self):
        q = jnp.zeros((2, 1, 16))
        k = jnp.zeros((2, 64, 16))
        assert decode_attention_eligible(q, k)
        assert not decode_attention_eligible(jnp.zeros((2, 2, 16)), k)
        assert not decode_attention_eligible(q, jnp.zeros((2, 63, 16)))
        assert not decode_attention_eligible(q, jnp.zeros((3, 64, 16)))


class TestDecodeTKernel:
    """Transposed-cache decode kernel (..., hs, S): reads at the fetch
    floor (S on the lanes), kept for head sizes that do not divide the
    128-lane tile; the production cache layout is the PACKED form below
    (models/cache docstring — transposed appends measured a full-buffer
    rewrite per token). Oracle: the straight kernel on the untransposed
    view."""

    def test_matches_straight_kernel(self):
        s, hs = 256, 32
        ks = jax.random.split(jax.random.PRNGKey(5), 3)
        q = jax.random.normal(ks[0], (4, 1, hs), jnp.float32)
        kc = jax.random.normal(ks[1], (4, s, hs), jnp.float32)
        vc = jax.random.normal(ks[2], (4, s, hs), jnp.float32)
        pos = jnp.asarray(100)
        a = decode_attention(q, kc, vc, pos, interpret=True)
        b = decode_attention_t(
            q, jnp.swapaxes(kc, -1, -2), jnp.swapaxes(vc, -1, -2), pos,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    def test_bf16(self):
        s, hs = 128, 64
        ks = jax.random.split(jax.random.PRNGKey(7), 3)
        q = jax.random.normal(ks[0], (2, 2, 1, hs), jnp.bfloat16)
        kc = jax.random.normal(ks[1], (2, 2, s, hs), jnp.bfloat16)
        vc = jax.random.normal(ks[2], (2, 2, s, hs), jnp.bfloat16)
        pos = jnp.asarray(90)
        ref = _dense_decode(q, kc, vc, pos)
        out = decode_attention_t(
            q, jnp.swapaxes(kc, -1, -2), jnp.swapaxes(vc, -1, -2), pos,
            interpret=True,
        )
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
        )

    def test_eligibility(self):
        q = jnp.zeros((2, 1, 16))
        kt = jnp.zeros((2, 16, 128))
        assert decode_attention_t_eligible(q, kt)
        # S must fill whole 128-lane tiles
        assert not decode_attention_t_eligible(q, jnp.zeros((2, 16, 120)))
        # hs mismatch
        assert not decode_attention_t_eligible(q, jnp.zeros((2, 8, 128)))
        # multi-position query
        assert not decode_attention_t_eligible(jnp.zeros((2, 2, 16)), kt)


class TestDecodePackedKernel:
    """Packed-cache decode kernel (..., S/pack, pack*hs): the production
    serving layout — full 128-lane rows for floor-rate reads AND in-place
    sublane appends (models/cache docstring). Oracle: the dense masked
    softmax over the unpacked cache (models/cache._attn_cached)."""

    @pytest.mark.parametrize("pos", [0, 5, 63, 127])
    def test_matches_dense_unpacked(self, pos):
        s_, hs = 128, 16  # pack = 8
        pack = 128 // hs
        ks = jax.random.split(jax.random.PRNGKey(pos + 3), 3)
        q = jax.random.normal(ks[0], (2, 3, 1, hs), jnp.float32)
        kp = jax.random.normal(ks[1], (2, 3, s_ // pack, 128), jnp.float32)
        vp = jax.random.normal(ks[2], (2, 3, s_ // pack, 128), jnp.float32)
        ref = _attn_cached(q, kp, vp, jnp.asarray(pos), 1)
        out = decode_attention_packed(q, kp, vp, jnp.asarray(pos), interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_pack2_bf16(self):
        s_, hs = 256, 64  # pack = 2 — the production head size
        pack = 128 // hs
        ks = jax.random.split(jax.random.PRNGKey(17), 3)
        q = jax.random.normal(ks[0], (4, 1, hs), jnp.bfloat16)
        kp = jax.random.normal(ks[1], (4, s_ // pack, 128), jnp.bfloat16)
        vp = jax.random.normal(ks[2], (4, s_ // pack, 128), jnp.bfloat16)
        pos = jnp.asarray(200)
        ref = _attn_cached(q, kp, vp, pos, 1)
        out = decode_attention_packed(q, kp, vp, pos, interpret=True)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
        )

    def test_traced_pos_under_scan(self):
        s_, hs = 64, 32
        pack = 128 // hs
        ks = jax.random.split(jax.random.PRNGKey(23), 3)
        q = jax.random.normal(ks[0], (4, 1, hs), jnp.float32)
        kp = jax.random.normal(ks[1], (4, s_ // pack, 128), jnp.float32)
        vp = jax.random.normal(ks[2], (4, s_ // pack, 128), jnp.float32)

        def body(pos, _):
            return pos + 1, decode_attention_packed(q, kp, vp, pos, interpret=True)

        _, outs = jax.lax.scan(body, jnp.asarray(0), None, length=4)
        for i in range(4):
            ref = _attn_cached(q, kp, vp, jnp.asarray(i), 1)
            np.testing.assert_allclose(
                np.asarray(outs[i]), np.asarray(ref), atol=2e-5
            )

    def test_eligibility(self):
        q = jnp.zeros((2, 1, 64))
        kp = jnp.zeros((2, 64, 128))
        assert decode_attention_packed_eligible(q, kp)
        # lane row must be exactly one 128 tile
        assert not decode_attention_packed_eligible(q, jnp.zeros((2, 64, 256)))
        # hs must divide 128
        assert not decode_attention_packed_eligible(
            jnp.zeros((2, 1, 48)), jnp.zeros((2, 64, 128))
        )
        # whole sublane tiles
        assert not decode_attention_packed_eligible(q, jnp.zeros((2, 63, 128)))


class TestCacheAppend:
    """models/cache._cache_append: packed-layout writes must equal writing
    into the unpacked view at every VALID position (packed-row blocks past
    the last written position may hold stale tail values by design — the
    pos-mask hides them), for static (prefill) and traced (decode scan)
    starts, including pack-misaligned static starts. The rolling tail must
    always hold the last `pack` written columns."""

    def _check_valid(self, c_out, expect_flat, upto, hs):
        from trade_aid_multimodal_transformer_tpu.models.cache import (
            _unpack_cache,
        )

        got = np.asarray(_unpack_cache(c_out, hs))[..., :upto, :]
        np.testing.assert_allclose(got, expect_flat[..., :upto, :], atol=0)

    @pytest.mark.parametrize("start,t", [(0, 8), (3, 5), (7, 1), (2, 9)])
    def test_static_start(self, start, t):
        from trade_aid_multimodal_transformer_tpu.models.cache import (
            _cache_append,
        )

        hs, s_ = 32, 16
        pack = 128 // hs
        c = jnp.zeros((2, s_ // pack, 128), jnp.float32)
        tail = jnp.zeros((2, pack, hs), jnp.float32)
        new = jax.random.normal(jax.random.PRNGKey(start * 10 + t), (2, t, hs))
        out, tail_out, _ = _cache_append(c, tail, new, start)
        flat = np.zeros((2, s_, hs), np.float32)
        flat[..., start:start + t, :] = np.asarray(new)
        self._check_valid(out, flat, start + t, hs)
        # tail holds the last `pack` written columns (zero-padded below)
        expect_tail = np.zeros((2, pack, hs), np.float32)
        n_tail = min(pack, t)
        expect_tail[..., pack - n_tail:, :] = np.asarray(new)[..., t - n_tail:, :]
        if t >= pack or start == 0:
            np.testing.assert_allclose(np.asarray(tail_out), expect_tail, atol=0)

    def test_traced_start_single_token_sequence(self):
        from trade_aid_multimodal_transformer_tpu.models.cache import (
            _cache_append,
        )

        hs, s_ = 64, 8
        pack = 128 // hs
        c = jnp.zeros((3, s_ // pack, 128), jnp.float32)
        tail = jnp.zeros((3, pack, hs), jnp.float32)
        toks = jax.random.normal(jax.random.PRNGKey(1), (s_, 3, 1, hs))

        f = jax.jit(lambda c, tl, n, p: _cache_append(c, tl, n, p))
        flat = np.zeros((3, s_, hs), np.float32)
        for pos in range(s_):  # sequential decode, as the serving scan does
            c, tail, _ = f(c, tail, toks[pos], jnp.asarray(pos, jnp.int32))
            flat[..., pos, :] = np.asarray(toks[pos][..., 0, :])
            self._check_valid(c, flat, pos + 1, hs)

    def test_plain_layout_passthrough(self):
        from trade_aid_multimodal_transformer_tpu.models.cache import (
            _cache_append,
        )

        c = jnp.zeros((2, 16, 48), jnp.float32)  # hs=48: no packing
        new = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 48))
        out, _, _ = _cache_append(c, None, new, 5)
        ref = np.asarray(c).copy()
        ref[:, 5:9, :] = np.asarray(new)
        np.testing.assert_allclose(np.asarray(out), ref, atol=0)


class TestTPULowering:
    """Cross-platform AOT lowering to the TPU target (on CPU): pallas
    kernels run their full Mosaic lowering during jit(...).lower(), so
    unsupported ops (dot_general shapes, PRNG forms, layouts) surface here
    without TPU hardware. This is the compile-risk guard for the driver's
    on-TPU entry() check."""

    def test_all_kernels_lower_for_tpu(self):
        key = jax.random.PRNGKey(0)
        q = jnp.zeros((48, 64, 64), jnp.bfloat16)

        def short_fwdbwd(q, k, v):
            return jax.grad(
                lambda a, b, c: short_causal_attention(
                    a, b, c, dropout_rate=0.2, dropout_key=key
                ).astype(jnp.float32).sum(),
                argnums=(0, 1, 2),
            )(q, k, v)

        jax.jit(short_fwdbwd).trace(q, q, q).lower(lowering_platforms=("tpu",))

        kc = jnp.zeros((2, 48, 64, 64), jnp.bfloat16)

        def cross_fwdbwd(q, k, v):
            return jax.grad(
                lambda a, b, c: short_cross_attention(
                    a, b, c, dropout_rate=0.2, dropout_key=key
                ).astype(jnp.float32).sum(),
                argnums=(0, 1, 2),
            )(q, k, v)

        jax.jit(cross_fwdbwd).trace(q, kc, kc).lower(lowering_platforms=("tpu",))

        qd = jnp.zeros((48, 1, 64), jnp.bfloat16)
        cache = jnp.zeros((48, 1024, 64), jnp.bfloat16)
        jax.jit(
            lambda q, k, v: decode_attention(q, k, v, jnp.asarray(7))
        ).trace(qd, cache, cache).lower(lowering_platforms=("tpu",))

        cache_t = jnp.zeros((48, 64, 1024), jnp.bfloat16)
        jax.jit(
            lambda q, k, v: decode_attention_t(q, k, v, jnp.asarray(7))
        ).trace(qd, cache_t, cache_t).lower(lowering_platforms=("tpu",))

        cache_p = jnp.zeros((48, 512, 128), jnp.bfloat16)
        jax.jit(
            lambda q, k, v: decode_attention_packed(q, k, v, jnp.asarray(7))
        ).trace(qd, cache_p, cache_p).lower(lowering_platforms=("tpu",))

        from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (
            decode_attention_packed_q8,
        )

        cache_q8 = jnp.zeros((48, 512, 128), jnp.int8)
        sc8 = jnp.zeros((48, 512), jnp.float32)
        jax.jit(
            lambda q, k, v, ks, vs: decode_attention_packed_q8(
                q, k, v, ks, vs, jnp.asarray(7)
            )
        ).trace(qd, cache_q8, cache_q8, sc8, sc8).lower(
            lowering_platforms=("tpu",)
        )

        def flash_fwdbwd(q, k, v):
            return jax.grad(
                lambda a, b, c: flash_causal_attention(
                    a, b, c, dropout_rate=0.2, dropout_key=key
                ).astype(jnp.float32).sum(),
                argnums=(0, 1, 2),
            )(q, k, v)

        qf = jnp.zeros((4, 512, 64), jnp.bfloat16)
        jax.jit(flash_fwdbwd).trace(qf, qf, qf).lower(lowering_platforms=("tpu",))

        qkv_p = jnp.zeros((8, 18, 64, 64), jnp.bfloat16)  # (M·B, 3H, T, hs)

        def packed_fwdbwd(x):
            return jax.grad(
                lambda a: short_causal_attention_packed(
                    a, 6, dropout_rate=0.2, dropout_key=key
                ).astype(jnp.float32).sum()
            )(x)

        jax.jit(packed_fwdbwd).trace(qkv_p).lower(lowering_platforms=("tpu",))

        from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (
            fused_qkv_attention,
        )

        # production-shaped fused projection+attention kernel
        xs = jnp.zeros((4, 32, 64, 384), jnp.bfloat16)
        w1s = jnp.zeros((4, 384, 576), jnp.float32)
        b1s = jnp.zeros((4, 576), jnp.float32)
        w2s = jnp.zeros((4, 18, 32, 64), jnp.float32)

        def fqkv_fwdbwd(x, w1, b1, w2):
            return jax.grad(
                lambda *a: fused_qkv_attention(
                    *a, 6, dropout_rate=0.2, dropout_key=key
                ).astype(jnp.float32).sum(),
                argnums=(0, 1, 2, 3),
            )(x, w1, b1, w2)

        jax.jit(fqkv_fwdbwd).trace(xs, w1s, b1s, w2s).lower(
            lowering_platforms=("tpu",)
        )


class TestKernelUnderPjit:
    """A pallas_call inside a compiler-partitioned (GSPMD) computation:
    XLA cannot shard a custom call, so it replicates operands around it —
    correct, if not bandwidth-optimal (the shard_map paths are the
    production-sharded route). This pins the correctness half on the
    8-device CPU mesh."""

    def test_short_kernel_replicated_under_pjit(self):
        import numpy as np_
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs the 8-device virtual CPU mesh")
        mesh = Mesh(np_.array(devs[:8]).reshape(4, 2), ("data", "model"))
        q = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 64, 16), jnp.float32)
        sh = NamedSharding(mesh, P("data", "model", None, None))
        qs = jax.device_put(q, sh)
        f = jax.jit(
            lambda q, k, v: short_causal_attention(q, k, v, interpret=True),
            in_shardings=(sh, sh, sh), out_shardings=sh,
        )
        out = f(qs, qs, qs)
        ref = causal_attention_jnp(q, q, q)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestDecodeInt8:
    """int8 KV-cache decode (models/cache kv_dtype='int8'): the quantized
    kernel must match the dense dequantized expression exactly, and the
    quantization itself must stay within int8 rounding of the exact
    attention output."""

    def _quantized(self, key, shape_rows, hs):
        from trade_aid_multimodal_transformer_tpu.models.cache import (
            _quantize_rows,
        )

        raw = jax.random.normal(key, shape_rows, jnp.float32)
        q8, scale = _quantize_rows(raw)
        return raw, q8, scale

    def test_kernel_matches_dense_dequant(self):
        from trade_aid_multimodal_transformer_tpu.models.cache import _attn_cached
        from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (
            decode_attention_packed_q8,
        )

        s_, hs = 128, 32
        pack = 128 // hs
        sp = s_ // pack
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(ks[0], (4, 1, hs), jnp.float32)
        _, kp, ksc = self._quantized(ks[1], (4, sp, 128), hs)
        _, vp, vsc = self._quantized(ks[2], (4, sp, 128), hs)
        pos = jnp.asarray(97)
        ref = _attn_cached(q, kp, vp, pos, 1, ksc, vsc)
        out = decode_attention_packed_q8(q, kp, vp, ksc, vsc, pos, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_quantization_error_bounded(self):
        """Dense int8 attention vs exact f32 attention on the same values:
        the deviation must be small (int8 rounding), not structural."""
        from trade_aid_multimodal_transformer_tpu.models.cache import (
            _attn_cached, _quantize_rows,
        )

        s_, hs = 64, 64
        pack = 128 // hs
        sp = s_ // pack
        ks = jax.random.split(jax.random.PRNGKey(9), 3)
        q = jax.random.normal(ks[0], (4, 1, hs), jnp.float32)
        k_raw = jax.random.normal(ks[1], (4, sp, 128), jnp.float32)
        v_raw = jax.random.normal(ks[2], (4, sp, 128), jnp.float32)
        kq, ksc = _quantize_rows(k_raw)
        vq, vsc = _quantize_rows(v_raw)
        pos = jnp.asarray(s_ - 1)
        exact = _attn_cached(q, k_raw, v_raw, pos, 1)
        approx = _attn_cached(q, kq, vq, pos, 1, ksc, vsc)
        err = np.max(np.abs(np.asarray(exact) - np.asarray(approx)))
        assert err < 0.05, err  # int8 rounding scale, not a structural break

    def test_generate_serve_int8_smoke(self):
        """kv_dtype='int8' end-to-end on CPU: valid tokens, same shapes."""
        from trade_aid_multimodal_transformer_tpu.models.cache import generate_serve
        from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
        from trade_aid_multimodal_transformer_tpu.models.init import init_params

        cfg = ModelConfig(
            vocab_sizes=(13, 5), cross_attention=(True, False), n_embd=16,
            n_head=2, n_layer=1, block_size=128, dropout=0.0, attn_impl="jnp",
        )
        params = init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        prompt = jnp.asarray(np.stack(
            [rng.integers(0, v, (2, 128)) for v in cfg.vocab_sizes]
        ).astype(np.int32))
        out = generate_serve(
            params, cfg, prompt, jax.random.PRNGKey(1), 8, refresh=4,
            kv_dtype="int8",
        )
        assert out.shape == (2, 2, 136)
        gen = np.asarray(out[0, :, 128:])
        assert gen.min() >= 0 and gen.max() < 13


class TestKernelVmemSizing:
    """The short/fused kernel g estimators are calibrated on the bf16
    production path; f32 operands must pick a smaller g (a 17.1 MB scoped-
    VMEM stack at the bf16-tuned g exceeded the 16 MB limit — the f32
    short-cross backward found by bench/suite.py's f32 rows)."""

    def test_bf16_sizing_unchanged_and_f32_halved(self):
        from trade_aid_multimodal_transformer_tpu.ops.pallas_attention import (
            _fqkv_pick_gb,
            _short_cross_pick_g,
            _short_packed_pick_gb,
            _short_pick_g,
        )

        # production shapes: n = M*B*H = 768 (self), J = 3 (cross)
        assert _short_pick_g(768, 64, 64, 2) == 32   # long-validated bf16 g
        assert _short_pick_g(768, 64, 64, 4) == 16   # f32 halves
        assert _short_cross_pick_g(192, 3, 64, 64, 2) == 16
        assert _short_cross_pick_g(192, 3, 64, 64, 4) == 8
        assert _short_packed_pick_gb(128, 6, 64, 64, 2) == \
            2 * _short_packed_pick_gb(128, 6, 64, 64, 4)
        gb_bf16 = _fqkv_pick_gb(32, 6, 64, 64, 384, 2)
        gb_f32 = _fqkv_pick_gb(32, 6, 64, 64, 384, 4)
        assert gb_bf16 >= 2 * gb_f32 or gb_f32 == 1

        # every estimator stays a positive divisor of n
        for g_fn, args in (
            (_short_pick_g, (768, 512, 64)),
            (_short_cross_pick_g, (48, 3, 512, 64)),
        ):
            for item in (2, 4):
                g = g_fn(*args, item)
                assert g >= 1 and args[0] % g == 0
