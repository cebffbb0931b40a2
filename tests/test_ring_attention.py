"""Ring (context-parallel) attention equivalence on an 8-device CPU mesh.

The sequence axis shards across the mesh; the ring of ppermute KV exchanges
plus exact online-softmax merging must reproduce single-device causal
attention bit-closely for any T divisible by the axis size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from trade_aid_multimodal_transformer_tpu.ops.attention import causal_attention_jnp
from trade_aid_multimodal_transformer_tpu.parallel.ring_attention import (
    make_ring_attention,
)


def qkv(shape, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, shape, jnp.float32) for k in ks)


@pytest.fixture(scope="module", params=[2, 4, 8])
def mesh(request):
    n = request.param
    devices = np.array(jax.devices()[:n])
    return Mesh(devices, axis_names=("data",))


class TestRingEquivalence:
    @pytest.mark.parametrize("t,hs", [(64, 16), (128, 8)])
    def test_matches_dense(self, mesh, t, hs):
        q, k, v = qkv((3, t, hs), seed=t + mesh.devices.size)
        ring = make_ring_attention(mesh, "data")
        out = ring(q, k, v)
        ref = causal_attention_jnp(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_multi_leading_dims(self, mesh):
        q, k, v = qkv((2, 3, 64, 16), seed=5)  # (B, H, T, hs)
        ring = make_ring_attention(mesh, "data")
        out = ring(q, k, v)
        ref = causal_attention_jnp(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_causality_across_chunk_boundaries(self, mesh):
        """Perturbing the last position must not change earlier positions,
        including positions on other devices' chunks."""
        q, k, v = qkv((1, 64, 16), seed=9)
        ring = make_ring_attention(mesh, "data")
        out_a = ring(q, k, v)
        k2 = k.at[:, -1].add(1.0)
        v2 = v.at[:, -1].add(1.0)
        out_b = ring(q, k2, v2)
        np.testing.assert_allclose(
            np.asarray(out_a[:, :-1]), np.asarray(out_b[:, :-1]), atol=1e-6
        )
        assert not np.allclose(np.asarray(out_a[:, -1]), np.asarray(out_b[:, -1]))
