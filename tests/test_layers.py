"""Tests for ops/layers.py: the hash-mask dropout construction and KeyGen.

The dropout bit-stream is implementation-defined (SURVEY Q: torch's stream
cannot be reproduced), so these tests pin DISTRIBUTIONAL quality and the
determinism/gradient contracts rather than exact bits.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from trade_aid_multimodal_transformer_tpu.ops.layers import (
    KeyGen,
    _dropout_salts,
    dropout,
    hash_keep_mask_nd,
    mix32_const,
)


def salts(a, b):
    return jnp.uint32(a), jnp.uint32(b)


class TestHashKeepMask:
    @pytest.mark.parametrize("rate", [0.1, 0.2, 0.5])
    def test_keep_rate(self, rate):
        s1, s2 = salts(123, 456)
        m = np.asarray(hash_keep_mask_nd(s1, s2, (64, 128, 128), rate))
        assert abs(m.mean() - (1.0 - rate)) < 3e-3

    def test_deterministic(self):
        s1, s2 = salts(7, 9)
        a = np.asarray(hash_keep_mask_nd(s1, s2, (32, 64), 0.3))
        b = np.asarray(hash_keep_mask_nd(s1, s2, (32, 64), 0.3))
        np.testing.assert_array_equal(a, b)

    def test_key_sensitivity(self):
        a = np.asarray(hash_keep_mask_nd(*salts(1, 2), (64, 256), 0.5))
        b = np.asarray(hash_keep_mask_nd(*salts(1, 3), (64, 256), 0.5))
        c = np.asarray(hash_keep_mask_nd(*salts(2, 2), (64, 256), 0.5))
        # different salts flip ~half the positions
        assert 0.3 < (a != b).mean() < 0.7
        assert 0.3 < (a != c).mean() < 0.7

    def test_axis_decorrelation(self):
        """Adjacent rows/cols/leading slices are not copies of each other,
        and pairwise agreement stays near the 50% expected at rate=0.5."""
        m = np.asarray(hash_keep_mask_nd(*salts(11, 13), (8, 128, 256), 0.5))
        row_agree = (m[:, 1:, :] == m[:, :-1, :]).mean()
        col_agree = (m[:, :, 1:] == m[:, :, :-1]).mean()
        lead_agree = (m[1:] == m[:-1]).mean()
        for agree in (row_agree, col_agree, lead_agree):
            assert 0.45 < agree < 0.55

    def test_per_element_marginals(self):
        """Across independent salt draws, each ELEMENT keeps with p≈keep
        (no stuck positions)."""
        rate = 0.25
        acc = np.zeros((32, 64), np.int32)
        n = 200
        for i in range(n):
            acc += np.asarray(
                hash_keep_mask_nd(*salts(i * 31 + 1, i * 57 + 5), (32, 64), rate)
            )
        p = acc / n
        # 4-sigma band for Binomial(200, 0.75) per element
        sigma = np.sqrt(0.75 * 0.25 / n)
        assert (np.abs(p - 0.75) < 5 * sigma + 0.02).all()

    def test_nd_shapes(self):
        for shape in [(17,), (5, 3), (2, 3, 4, 5), (2, 3, 4, 5, 6)]:
            m = np.asarray(hash_keep_mask_nd(*salts(3, 4), shape, 0.5))
            assert m.shape == shape


class TestDropout:
    def test_identity_eval_or_zero_rate(self):
        x = jnp.ones((4, 8))
        key = jax.random.PRNGKey(0)
        np.testing.assert_array_equal(np.asarray(dropout(x, 0.5, key, False)), 1.0)
        np.testing.assert_array_equal(np.asarray(dropout(x, 0.0, key, True)), 1.0)

    def test_inverted_scaling(self):
        x = jnp.ones((256, 256))
        key = jax.random.PRNGKey(1)
        y = np.asarray(dropout(x, 0.2, key, True))
        kept = y != 0.0
        assert abs(kept.mean() - 0.8) < 0.01
        np.testing.assert_allclose(y[kept], 1.0 / 0.8, rtol=1e-6)

    def test_gradient_matches_mask(self):
        """d/dx dropout(x) must be mask/keep at kept positions, 0 at dropped
        — i.e. the regenerated backward mask is bit-identical to forward."""
        key = jax.random.PRNGKey(2)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 64)), jnp.float32)
        y = dropout(x, 0.3, key, True)
        g = jax.grad(lambda x: jnp.sum(dropout(x, 0.3, key, True) * 2.0))(x)
        kept = np.asarray(y) != 0.0
        expect = np.where(kept, 2.0 / 0.7, 0.0)
        np.testing.assert_allclose(np.asarray(g), expect, rtol=1e-6)

    def test_raw_salt_keys(self):
        """KeyGen v2 raw uint32[2] salt arrays are accepted directly."""
        raw = jnp.asarray([5, 9], jnp.uint32)
        x = jnp.ones((128, 128))
        y1 = np.asarray(dropout(x, 0.4, raw, True))
        y2 = np.asarray(dropout(x, 0.4, raw, True))
        np.testing.assert_array_equal(y1, y2)
        y3 = np.asarray(dropout(x, 0.4, jnp.asarray([5, 10], jnp.uint32), True))
        assert (y1 != y3).any()


class TestKeyGen:
    def test_none_passthrough(self):
        keys = KeyGen(None)
        assert keys() is None

    def test_distinct_salts_per_site(self):
        keys = KeyGen(jax.random.PRNGKey(0))
        seen = set()
        for _ in range(64):
            s = tuple(int(v) for v in np.asarray(keys()))
            assert s not in seen
            seen.add(s)

    def test_deterministic_across_instances(self):
        a = KeyGen(jax.random.PRNGKey(7))
        b = KeyGen(jax.random.PRNGKey(7))
        for _ in range(8):
            np.testing.assert_array_equal(np.asarray(a()), np.asarray(b()))

    def test_nested_generators_unique(self):
        """Parent/child derivation (block-level KeyGen re-seeded from a
        parent's emitted salt) must not collide across realistic fanouts."""
        root = KeyGen(jax.random.PRNGKey(3))
        seen = set()
        for _ in range(12):  # blocks
            child = KeyGen(root())
            for _ in range(8):  # sites per block
                s = tuple(int(v) for v in np.asarray(child()))
                assert s not in seen
                seen.add(s)

    def test_mix32_const_distinct(self):
        vals = {int(mix32_const(i)) for i in range(1, 256)}
        assert len(vals) == 255

    def test_typed_and_raw_seed_extraction(self):
        typed = jax.random.PRNGKey(5)
        s1, s2 = _dropout_salts(typed)
        raw = jnp.stack([s1, s2])
        r1, r2 = _dropout_salts(raw)
        assert int(r1) == int(s1) and int(r2) == int(s2)
