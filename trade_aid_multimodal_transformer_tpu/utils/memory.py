"""Train-state memory accounting.

The reference never reports memory (its single torch module lives or dies
by host RAM); on TPU the per-device HBM footprint of params + optimizer
state is a first-class capacity-planning number — it decides whether a
model fits one chip, needs FSDP (``tpu_options.fsdp``), or needs a bigger
slice. This module computes it exactly from the arrays' shardings.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax


def _leaf_bytes(leaf) -> Tuple[int, int]:
    """(total_bytes, per_device_bytes) for one array leaf.

    Per-device size comes from the sharding's shard shape — replicated
    leaves cost their full size on every device, sharded leaves 1/N.
    Host-side leaves (no sharding) count as single-device residents.
    """
    itemsize = np.dtype(leaf.dtype).itemsize
    total = int(np.prod(leaf.shape)) * itemsize if leaf.ndim else itemsize
    sharding = getattr(leaf, "sharding", None)
    if sharding is None:
        return total, total
    try:
        shard_shape = sharding.shard_shape(leaf.shape)
    except Exception:  # pragma: no cover - exotic shardings
        return total, total
    per_dev = int(np.prod(shard_shape)) * itemsize if shard_shape else itemsize
    return total, per_dev


def train_state_bytes(params, opt_state=None) -> Tuple[int, int]:
    """(total_bytes, per_device_bytes) of params (+ optimizer state).

    ``per_device`` is what one chip actually holds: full size for
    replicated leaves, shard size for mesh-sharded leaves (e.g. 1/data
    under FSDP). Equal to ``total`` on a single device or under pure
    replication.
    """
    leaves = jax.tree.leaves(params)
    if opt_state is not None:
        leaves += jax.tree.leaves(opt_state)
    total = per_dev = 0
    for leaf in leaves:
        if not hasattr(leaf, "dtype"):
            continue
        t, p = _leaf_bytes(leaf)
        total += t
        per_dev += p
    return total, per_dev


def format_train_state_memory(params, opt_state=None) -> str:
    """One human line, e.g. ``train state: 12.4 MB (3.1 MB/device)``."""
    total, per_dev = train_state_bytes(params, opt_state)
    if per_dev == total:
        return f"train state: {total / 1e6:.1f} MB"
    return f"train state: {total / 1e6:.1f} MB ({per_dev / 1e6:.1f} MB/device)"
