"""Elementwise / normalization primitives shared by the model.

Numerics match the reference's torch modules: LayerNorm uses eps=1e-5 with
biased variance (torch default, reference model.py:189-190), dropout is
inverted dropout with 1/(1-p) scaling (torch nn.Dropout semantics).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

LN_EPS = 1e-5


def layernorm(x: jax.Array, scale: jax.Array, bias: jax.Array) -> jax.Array:
    """LayerNorm over the trailing feature axis; scale/bias broadcast from the
    left (supports per-modality stacked (M, C) params against (M, B, T, C)).

    Statistics always compute in f32 (mixed-precision stability); the result
    returns in the activation dtype."""
    dt = x.dtype
    acc = jnp.float64 if dt == jnp.float64 else jnp.float32
    xf = x.astype(acc)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + LN_EPS)
    normed = (xf - mean) * inv
    scale = scale.astype(acc)
    bias = bias.astype(acc)
    if scale.ndim < x.ndim and scale.ndim > 1:
        # (M, C) -> (M, 1, 1, C) style broadcast
        expand = (slice(None),) + (None,) * (x.ndim - scale.ndim) + (slice(None),)
        scale = scale[expand]
        bias = bias[expand]
    return (normed * scale + bias).astype(dt)


def _dropout_salts(key: jax.Array):
    """Two u32 salt scalars derived from a (typed or raw) PRNG key."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(key)
    else:
        data = key
    data = data.reshape(-1).astype(jnp.uint32)
    return data[0], data[-1]


def _mix32(h: jax.Array) -> jax.Array:
    """murmur3-style finalizer — full-strength avalanche. Only ever applied
    to O(axis)-length vectors, where the TPU's emulated u32 multiply is
    irrelevant."""
    import numpy as np

    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(2246822519)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(3266489917)
    h = h ^ (h >> np.uint32(16))
    return h


def hash_keep_mask_nd(s1, s2, shape, rate: float) -> jax.Array:
    """Deterministic keep-mask over an arbitrary shape, multiply-free in the
    per-element hot path.

    Construction: each axis gets a salt VECTOR (murmur-mixed iota — u32
    multiplies touch only O(axis) elements, where the TPU VPU's emulated
    32-bit integer multiply doesn't matter); per element the axis salts
    combine with adds and a xorshift-style avalanche (shifts/xors/adds — all
    native single-pass VPU ops). Standalone cost measured on v5e at the
    production site shapes: 9-22 us per ~3M-element site (150-340 Gelem/s),
    i.e. mask generation is effectively free against the step's matmuls.
    Sampling quality (keep-rate, key sensitivity, train/eval behavior) is
    pinned by tests; the dropout bit-stream is implementation-defined
    (torch's stream cannot be reproduced either way).
    """
    import numpy as np

    threshold = np.uint32(min(int(rate * (1 << 32)), (1 << 32) - 1))
    shape = tuple(shape)
    shape2 = ((1,) * max(0, 2 - len(shape))) + shape
    R, C = shape2[-2], shape2[-1]
    N = 1
    for d in shape2[:-2]:
        N *= d
    s1 = s1.astype(jnp.uint32)
    s2 = s2.astype(jnp.uint32)
    rv = _mix32(jnp.arange(R, dtype=jnp.uint32) * np.uint32(2246822519) + s1)
    cv = _mix32(
        jnp.arange(C, dtype=jnp.uint32) * np.uint32(3266489917)
        + (s2 ^ np.uint32(0x9E3779B9))
    )
    nv = _mix32(
        jnp.arange(N, dtype=jnp.uint32) * np.uint32(2654435761)
        + (s1 ^ (s2 * np.uint32(97)))
    )
    h = (nv[:, None] + rv[None, :])[:, :, None] + cv[None, None, :]
    # Jenkins-style multiply-free avalanche tail; chosen empirically — the
    # adjacent-row/col/slice agreement rates all land at 0.50 ± 0.01
    # (tests/test_layers.py::test_axis_decorrelation)
    h = h + (h << np.uint32(3))
    h = h ^ (h >> np.uint32(11))
    h = h + (h << np.uint32(15))
    h = h ^ (h >> np.uint32(7))
    h = h + (h << np.uint32(9))
    h = h ^ (h >> np.uint32(16))
    return (h >= threshold).reshape(shape)


def dropout(
    x: jax.Array, rate: float, key: Optional[jax.Array], train: bool
) -> jax.Array:
    """Inverted dropout. Identity when not training or rate == 0.

    The keep-mask is a key-salted integer hash of element coordinates
    (``hash_keep_mask_nd``) rather than PRNG bits: pure VPU ALU from iotas
    plus two key-derived scalars, regenerated bit-identically wherever it is
    needed (no RngBitGenerator traffic, no mask residuals — see
    ``_dropout_cv``). The same construction drives the Pallas kernels'
    in-kernel dropout (ops/pallas_attention._keep_mask). The dropout
    bit-stream is implementation-defined (torch's stream can't be reproduced
    either way); determinism per (key, shape) is preserved.

    TAID_DROPOUT_ABLATE: perf-ablation hooks used by tools/dropout_ablation
    and tools/device_time ('scale' = no mask at all, 'bernoulli' = PRNG-bits
    mask) — measurement-only, never semantics for real runs.
    """
    if not train or rate == 0.0:
        return x
    keep = 1.0 - rate
    import os as _os
    _mode = _os.environ.get("TAID_DROPOUT_ABLATE", "")
    if _mode == "scale":
        return x / keep
    if _mode == "bernoulli":
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))
    s1, s2 = _dropout_salts(key)
    return _dropout_cv(x, s1, s2, rate)


def _masked_scale(x: jax.Array, s1, s2, rate: float) -> jax.Array:
    keep = 1.0 - rate
    mask = hash_keep_mask_nd(s1, s2, x.shape, rate)
    return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _dropout_cv(x, s1, s2, rate: float):
    """Dropout with a mask-free VJP: the backward REGENERATES the keep-mask
    from the two salt scalars instead of letting autodiff carry the select
    predicate as a residual (~94M mask elements/step on the production
    config). Regeneration is a handful of native VPU ops per element
    (hash_keep_mask_nd), the residual is two scalars, and the construction
    mirrors the Pallas kernels' in-kernel dropout, which regenerates the
    same way in fwd and both bwd kernels."""
    return _masked_scale(x, s1, s2, rate)


def _dropout_cv_fwd(x, s1, s2, rate: float):
    return _masked_scale(x, s1, s2, rate), (s1, s2)


def _dropout_cv_bwd(rate: float, res, g):
    s1, s2 = res
    # d/dx [where(mask, x/keep, 0)] ∘ g = where(mask, g/keep, 0)
    return _masked_scale(g, s1, s2, rate), None, None


_dropout_cv.defvjp(_dropout_cv_fwd, _dropout_cv_bwd)


def mix32_const(i: int):
    """murmur3 finalizer of a Python int, computed at trace time —
    a zero-runtime-cost, well-mixed 32-bit constant per site index."""
    import numpy as np

    h = i & 0xFFFFFFFF
    h ^= h >> 16
    h = (h * 2246822519) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 3266489917) & 0xFFFFFFFF
    h ^= h >> 16
    return np.uint32(h)


class KeyGen:
    """Deterministic per-site dropout-salt generator threaded through the
    forward pass.

    v1 chained ``jax.random.split`` per site: ~45 SERIAL scalar threefry
    derivations on the step's critical path per training step. v2 extracts
    two u32 salts from the master key ONCE; each site's salt pair is derived
    with a trace-time murmur-mixed CONSTANT (``mix32_const``) — every site
    depends only on two scalars available at step start, so no per-site
    PRNG work exists and nothing serializes.

    Emits raw uint32[2] salt arrays rather than typed keys; ``dropout``, the
    Pallas kernels, and the ring/CP path accept either. Nesting: every
    generator ROTATES its inherited salt at construction before xoring
    per-site constants — plain xor composition is commutative (parent site i
    / child site j would collide with parent j / child i; caught by
    tests/test_layers.py::test_nested_generators_unique), rotation makes the
    composition non-abelian so distinct (block, site) paths get distinct
    salts.
    """

    __slots__ = ("s1", "s2", "ctr")

    def __init__(self, key: Optional[jax.Array]):
        if key is None:
            self.s1 = self.s2 = None
        else:
            self.s1, s2 = _dropout_salts(key)
            self.s2 = (s2 << jnp.uint32(9)) | (s2 >> jnp.uint32(23))
        self.ctr = 0

    def __call__(self) -> Optional[jax.Array]:
        if self.s1 is None:
            return None
        self.ctr += 1
        return jnp.stack([self.s1, self.s2 ^ mix32_const(self.ctr)])
