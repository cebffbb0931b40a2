"""Device mesh construction and sharding specs.

The reference is strictly single-process/single-device (SURVEY §2.4: no DP/
TP/PP, no distributed backend) — this subsystem is the net-new first-class
parallelism component the TPU build adds. Design follows the standard JAX
SPMD recipe: build a Mesh with named axes, annotate array shardings, and let
XLA insert the collectives over ICI.

Axes:
- 'data': batch-dimension data parallelism (gradient all-reduce)
- 'model': tensor parallelism over attention heads / FFN hidden dim

The modality axis stays local: modality stacks are architecturally
independent (reference: model.py:187-190) but small (2-4), so sharding them
would idle devices; the batch and hidden dims scale instead.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh. data*model must equal the device count."""
    devices = list(devices) if devices is not None else jax.devices()
    if data * model != len(devices):
        raise ValueError(
            f"mesh {data}x{model} needs {data*model} devices, have {len(devices)}"
        )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def default_mesh_shape(n_devices: int, n_head: int) -> Tuple[int, int]:
    """Pick (data, model) for n devices: tensor-parallel 2-way when the head
    count allows it and there are ≥4 devices, else pure data parallel."""
    if n_devices >= 4 and n_devices % 2 == 0 and n_head % 2 == 0:
        return n_devices // 2, 2
    return n_devices, 1


def batch_pspec() -> P:
    """Sharding for (M, B, T) batches: batch axis over 'data'."""
    return P(None, "data", None)


def param_pspecs(params: Dict[str, Any], n_head: int, model_axis: bool = True) -> Dict[str, Any]:
    """PartitionSpec tree for the model parameter pytree.

    Tensor-parallel layout (when ``model_axis``):
    - self-attention QKV first projections (M, C, H*hs2): columns are
      head-major, so sharding the last axis over 'model' distributes whole
      heads; second projections (M, H, hs2, hs) shard the head axis.
    - attention output projection (M, H*hs, C2): row-parallel over heads
      (XLA inserts the psum for the row-parallel matmul).
    - FFN (M, C, 4C)/(M, 4C, C): column-parallel then row-parallel over the
      hidden dim.
    - embeddings, layernorms, cross-attention, vocab heads: replicated
      (small relative to the stacks; candidates for later rounds).
    """
    mdl = "model" if model_axis else None

    def spec_for(path: Tuple[str, ...], leaf) -> P:
        names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        names = [str(n) for n in names]
        joined = "/".join(names)
        if mdl is None:
            return P()
        if "/sa/" in f"/{joined}/":
            last = names[-1]
            if last.startswith("w1_") or last.startswith("b1_"):
                return P(*([None] * (leaf.ndim - 1)), mdl)      # head-major cols
            if last.startswith("w2_"):
                return P(None, mdl, None, None)                  # head axis
            if last == "proj_w1":
                return P(None, mdl, None)                        # row-parallel
            return P()
        if "/ffwd/" in f"/{joined}/":
            last = names[-1]
            if last in ("w1", "b1"):
                return P(*([None] * (leaf.ndim - 1)), mdl)       # col-parallel
            if last == "w2":
                return P(None, mdl, None)                        # row-parallel
            return P()
        return P()

    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = [spec_for(path, leaf) for path, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], specs)


def shard_params(params, mesh: Mesh, n_head: int, model_axis: bool = True):
    """Place the parameter pytree onto the mesh per param_pspecs."""
    specs = param_pspecs(params, n_head, model_axis=model_axis)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )
