"""Native (C++) kernel bit-parity tests.

The native kernels must be bit-identical to the Python/numpy ground truth —
they are pure accelerations, not approximations. When no toolchain is
available the tests are skipped (the framework falls back transparently).
"""

import numpy as np
import pytest

from trade_aid_multimodal_transformer_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


class TestRoundDecimal:
    def test_random_bit_parity(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(-1e4, 1e4, 100_000)
        for dp in (0, 1, 2, 4):
            out = native.round_decimal(x, dp)
            ref = np.asarray([round(v, dp) for v in x.tolist()])
            np.testing.assert_array_equal(out, ref)

    def test_decimal_ties_half_even(self):
        # values whose decimal representation sits exactly on .xx5 boundaries
        vals, refs = [], []
        for k in range(5000):
            v = (k % 997) + 0.005 * (1 + 2 * (k % 9))
            for x in (v, -v, v * 10, v / 10, v + 1e-13, v - 1e-13):
                vals.append(x)
                refs.append(round(x, 2))
        out = native.round_decimal(np.asarray(vals), 2)
        np.testing.assert_array_equal(out, np.asarray(refs))

    def test_specials(self):
        x = np.asarray([0.125, 2.675, -2.675, 0.5, 2.5, 1e16, -0.0001, np.inf, -np.inf])
        out = native.round_decimal(x, 2)
        ref = [round(v, 2) for v in x.tolist()]
        np.testing.assert_array_equal(out, np.asarray(ref))

    def test_nan_passthrough(self):
        out = native.round_decimal(np.asarray([np.nan]), 2)
        assert np.isnan(out[0])


class TestPercentChanges:
    def test_parity_and_zero_mask(self):
        rng = np.random.default_rng(1)
        y = rng.uniform(1, 100, 50_000)
        y[1000] = 0.0
        out, mask, first_zero = native.percent_changes(y, 2)
        assert first_zero == 1000
        assert mask[1001] and not mask[1000]
        assert out[0] == 0.0
        assert out[1001] == 0.0
        prev = y[:-1]
        expected = [0.0] + [
            0.0 if p == 0 else round(((c - p) / p) * 100, 2)
            for c, p in zip(y[1:].tolist(), prev.tolist())
        ]
        np.testing.assert_array_equal(out, np.asarray(expected))


class TestRangeNumeric:
    def test_parity_with_python_path(self, monkeypatch):
        from trade_aid_multimodal_transformer_tpu.data import transforms as T

        rng = np.random.default_rng(2)
        data = rng.uniform(-5000, 5000, 20_000).tolist() + [
            0.0, 0.1, 9.99, 99.96, 100.0, -0.0999, 1e-7, 1e7,
        ]
        for nwd, dp in [(2, 1), (1, 2), (3, 0)]:
            with_native = T.range_numeric_data(list(data), nwd, dp)
            monkeypatch.setenv("TAT_DISABLE_NATIVE", "1")
            monkeypatch.setattr(native, "_lib", None)
            monkeypatch.setattr(native, "_tried", False)
            without = T.range_numeric_data(list(data), nwd, dp)
            monkeypatch.delenv("TAT_DISABLE_NATIVE")
            monkeypatch.setattr(native, "_tried", False)
            assert with_native == without
            assert [type(v) for v in with_native] == [type(v) for v in without]


class TestBinAssign:
    def test_parity_with_searchsorted_path(self):
        rng = np.random.default_rng(3)
        data = np.concatenate([rng.normal(0, 2, 30_000), np.zeros(11)])
        G = 5
        pos_b = np.concatenate(([0.0], np.power(np.arange(1, G + 1) / G, 1.7) * 4.2))
        neg_b = np.concatenate((-pos_b[1:][::-1], [0.0]))
        out = native.bin_assign(data, pos_b)

        ref = np.zeros(data.size, dtype=np.int64)
        pos_mask = data > 0
        neg_mask = data < 0
        g = np.searchsorted(pos_b, data[pos_mask], side="right")
        ref[pos_mask] = np.minimum(g, G)
        g = np.searchsorted(neg_b, data[neg_mask], side="right")
        ref[neg_mask] = np.maximum(g - 1, 0) - G
        np.testing.assert_array_equal(out, ref)

    def test_boundary_values_exact(self):
        pos_b = np.asarray([0.0, 1.0, 4.0])
        data = np.asarray([1.0, 4.0, -1.0, -4.0, 0.0, 0.5, -0.5, 5.0, -5.0])
        out = native.bin_assign(data, pos_b)
        # [low, high) positive; [-high, -low) negative (signed half-open)
        assert out.tolist() == [2, 2, -1, -2, 0, 1, -1, 2, -2]


class TestFactorize:
    """tat_factorize must be semantically np.unique(return_inverse) for
    finite doubles — it backs data.vocab.numerical_representation."""

    def test_parity_with_np_unique(self):
        rng = np.random.default_rng(7)
        for data in [
            rng.uniform(10, 500, 50_000).round(1),
            rng.integers(0, 50, 5_000).astype(np.float64),
            np.array([3.0, -0.0, 0.0, 3.0, -7.5, 2.25, -7.5]),
            np.array([1.5]),
            rng.normal(0, 1, 10_000),  # all-unique regime (forces rehash)
        ]:
            out = native.factorize(data)
            if out is None:
                pytest.skip("native unavailable")
            codes, uniq = out
            ref_u, ref_inv = np.unique(data, return_inverse=True)
            np.testing.assert_array_equal(uniq, ref_u)
            np.testing.assert_array_equal(codes, ref_inv.astype(np.int32))

    def test_negative_zero_collapses(self):
        out = native.factorize(np.array([-0.0, 0.0, -0.0]))
        if out is None:
            pytest.skip("native unavailable")
        codes, uniq = out
        assert uniq.tolist() == [0.0]
        assert codes.tolist() == [0, 0, 0]

    def test_numerical_representation_routes_native(self, monkeypatch):
        """The vocab builder's native path and numpy fallback must agree."""
        from trade_aid_multimodal_transformer_tpu.data.vocab import (
            numerical_representation,
        )

        rng = np.random.default_rng(11)
        data = rng.uniform(10, 60, 20_000).round(1).tolist()
        ids_n, vocab_n = numerical_representation(data)
        monkeypatch.setenv("TAT_DISABLE_NATIVE", "1")
        monkeypatch.setattr(native, "_tried", False)
        monkeypatch.setattr(native, "_lib", None)
        try:
            ids_f, vocab_f = numerical_representation(data)
        finally:
            monkeypatch.delenv("TAT_DISABLE_NATIVE")
            monkeypatch.setattr(native, "_tried", False)
        np.testing.assert_array_equal(ids_n, ids_f)
        assert vocab_n == vocab_f

    def test_nan_falls_back_to_numpy(self):
        from trade_aid_multimodal_transformer_tpu.data.vocab import (
            numerical_representation,
        )

        data = [1.0, float("nan"), 2.0, 1.0]
        ids, vocab = numerical_representation(data)
        ref_u, ref_inv = np.unique(np.asarray(data), return_inverse=True)
        np.testing.assert_array_equal(ids, ref_inv.astype(np.int32))
