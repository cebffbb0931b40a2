"""Device mesh construction and sharding specs.

The reference is strictly single-process/single-device (SURVEY §2.4: no DP/
TP/PP, no distributed backend) — this subsystem is the net-new first-class
parallelism component the TPU build adds. Design follows the standard JAX
SPMD recipe: build a Mesh with named axes, annotate array shardings, and let
XLA insert the collectives over ICI.

Axes:
- 'data': batch-dimension data parallelism (gradient all-reduce)
- 'model': tensor parallelism over attention heads / FFN hidden dim
- 'seq': context parallelism — the sequence axis of attention shards across
  devices and KV chunks rotate via ring ppermute (ring_attention.py); only
  materialized when context_parallel > 1
- 'mod': modality parallelism — the per-modality transformer stacks are
  architecturally independent (reference: model.py:187-190), so the leading
  M axis of every stacked parameter (sa/ffwd/ln) and of the (M, B, T) batch
  shards like an expert axis; only cross-attention and the final stack
  exchange activations (XLA inserts the gathers). Small fan-out (M = 2-4),
  so it composes with 'data' rather than replacing it; only materialized
  when requested.
- 'pipe': pipeline parallelism — the block stack shards over GPipe stages
  with ppermute activation handoffs (pipeline.py); block params stay
  replicated in the pytree and are re-sharded at the shard_map boundary.

FSDP / ZeRO-3 (``tpu_options.fsdp``): parameters and optimizer state
additionally shard over the *'data'* axis — each leaf's largest still-free
divisible dimension carries 'data' on top of the table placements below, so
per-device parameter+moment memory scales 1/N with the data-parallel degree.
This is the GSPMD formulation of FSDP: XLA all-gathers each layer's weights
at use and reduce-scatters its gradient, instead of keeping N full replicas
(the reference keeps one full copy per process; SURVEY §2.4 has no
distributed training at all).
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
    seq: int = 1,
    mod: int = 1,
    pipe: int = 1,
) -> Mesh:
    """Build a ([pipe, ][mod, ]data, model[, seq]) mesh. The product must
    equal the device count. The 'pipe', 'seq' and 'mod' axes are only
    materialized when > 1, so existing (data, model) call sites are
    unchanged."""
    devices = list(devices) if devices is not None else jax.devices()
    if data * model * seq * mod * pipe != len(devices):
        raise ValueError(
            f"mesh pipe={pipe} x mod={mod} x {data}x{model}x{seq} needs "
            f"{data*model*seq*mod*pipe} devices, have {len(devices)}"
        )
    shape, names = [], []
    if pipe > 1:
        shape.append(pipe)
        names.append("pipe")
    if mod > 1:
        shape.append(mod)
        names.append("mod")
    shape += [data, model]
    names += ["data", "model"]
    if seq > 1:
        shape.append(seq)
        names.append("seq")
    dev_array = np.asarray(devices).reshape(*shape)
    return Mesh(dev_array, axis_names=tuple(names))


def default_mesh_shape(n_devices: int, n_head: int) -> Tuple[int, int]:
    """Pick (data, model) for n devices: tensor-parallel 2-way when the head
    count allows it and there are ≥4 devices, else pure data parallel."""
    if n_devices >= 4 and n_devices % 2 == 0 and n_head % 2 == 0:
        return n_devices // 2, 2
    return n_devices, 1


def batch_pspec(mod_axis: bool = False) -> P:
    """Sharding for (M, B, T) batches: batch over 'data', modality over
    'mod' when modality parallelism is on."""
    return P("mod" if mod_axis else None, "data", None)


def param_pspecs(
    params: Dict[str, Any],
    n_head: int,
    model_axis: bool = True,
    model_size: int = 1,
    mod_axis: bool = False,
    mod_size: int = 1,
    fsdp_size: int = 1,
) -> Dict[str, Any]:
    """PartitionSpec tree for the model parameter pytree.

    Placement table (every parameter family; when ``model_axis``):

    | family                      | shape            | spec (over 'model')  |
    |-----------------------------|------------------|----------------------|
    | sa.w1_{k,q,v}, sa.b1_*      | (M, C, H*hs2)    | last axis — head-major columns, whole heads per shard |
    | sa.w2_{k,q,v}               | (M, H, hs2, hs)  | head axis            |
    | sa.proj_w1                  | (M, H*hs, C2)    | row-parallel over heads (XLA psums) |
    | sa.proj_w2/proj_b1/proj_b2  | —                | replicated (follows the psum'd row-parallel output) |
    | ffwd.w1, ffwd.b1            | (M, C, 4C)       | column-parallel over hidden |
    | ffwd.w2                     | (M, 4C, C)       | row-parallel over hidden |
    | ffwd.b2                     | (M, C)           | replicated           |
    | pre.tok_emb[i]              | (V_i, C)         | vocab rows (Megatron-style; XLA masks+psums the gather) |
    | pre.pos_emb                 | (T, C)           | replicated (tiny)    |
    | post.heads[i].w1, .b1       | (C, V_i//2)      | column-parallel over V_i//2 |
    | post.heads[i].w2            | (V_i//2, V_i)    | row-parallel over V_i//2 |
    | post.heads[i].b2            | (V_i,)           | replicated           |
    | ln1/ln2/post ln             | (M, C)           | replicated           |
    | cross.q_w                   | (H, C, hs)       | head axis            |
    | cross.kv_w                  | (J, H, C, 2hs)   | head axis            |
    | cross.proj_w1               | (H*hs, C2)       | row-parallel over heads (XLA psums) |
    | cross.proj_{w2,b1,b2}, ln_* | —                | replicated (follows the psum'd output) |

    Dims not divisible by the model-axis size fall back to replicated for
    that leaf (device_put needs even shards; tiny demo vocabs hit this).
    Unknown leaf names under sa/ffwd/heads raise — a renamed parameter must
    update this table, never silently fall to replicated.

    With ``mod_axis``, every M-stacked leaf (sa/ffwd/ln1/ln2 inside blocks,
    the post LN stacks) additionally shards its leading modality dim over
    'mod' — modality parallelism, composable with the 'model' column/row
    placements above. Per-modality leaves (tok_emb[i], heads[i], cross
    params) have no M dim and keep their table placement.

    With ``fsdp_size > 1`` (ZeRO-3), each leaf's LARGEST dimension that is
    still unsharded and divides evenly additionally carries 'data' — so
    parameter and optimizer-state memory shards 1/data per device while the
    compiled program all-gathers weights at use and reduce-scatters
    gradients. Leaves with no qualifying dimension (scalars, tiny norms,
    odd vocab rows) stay replicated over 'data'.
    """
    mdl = "model" if model_axis else None

    def sharded(leaf, axis: int) -> P:
        """Spec sharding `axis` of `leaf` over 'model', or replicated if the
        dim doesn't divide evenly."""
        if mdl is None or leaf.shape[axis] % max(model_size, 1) != 0:
            return P()
        spec = [None] * leaf.ndim
        spec[axis] = mdl
        return P(*spec)

    def with_mod(spec: P, leaf) -> P:
        """Shard the leading (modality-stacked) dim over 'mod' on top of the
        base placement."""
        if not mod_axis or leaf.shape[0] % max(mod_size, 1) != 0:
            return spec
        dims = list(spec) + [None] * (leaf.ndim - len(spec))
        dims[0] = "mod"
        return P(*dims)

    def with_fsdp(spec: P, leaf) -> P:
        """ZeRO-3: add 'data' on the largest still-free evenly-divisible
        dim, so the leaf's storage (and its Adam moments, which inherit the
        placement via zeros_like) shards over the data-parallel axis."""
        if fsdp_size <= 1 or leaf.ndim == 0:
            return spec
        dims = list(spec) + [None] * (leaf.ndim - len(spec))
        free = [
            i for i in range(leaf.ndim)
            if dims[i] is None and leaf.shape[i] % fsdp_size == 0
            and leaf.shape[i] >= fsdp_size
        ]
        if not free:
            return spec
        best = max(free, key=lambda i: (leaf.shape[i], -i))
        dims[best] = "data"
        return P(*dims)

    def spec_for(path: Tuple[str, ...], leaf) -> P:
        names = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        names = [str(n) for n in names]
        joined = "/".join(names)
        last = names[-1]
        stacked = (
            any(f"/{fam}/" in f"/{joined}/" for fam in ("sa", "ffwd", "ln1", "ln2"))
            or (last in ("ln_scale", "ln_bias")
                and "/cross/" not in f"/{joined}/")
        )

        def base() -> P:
            if "/sa/" in f"/{joined}/":
                if last.startswith("w1_") or last.startswith("b1_"):
                    return sharded(leaf, leaf.ndim - 1)   # head-major columns
                if last.startswith("w2_"):
                    return sharded(leaf, 1)               # head axis
                if last == "proj_w1":
                    return sharded(leaf, 1)               # row-parallel over heads
                if last in ("proj_w2", "proj_b1", "proj_b2"):
                    return P()
                raise ValueError(f"unknown self-attention parameter: {joined}")
            if "/ffwd/" in f"/{joined}/":
                if last in ("w1", "b1"):
                    return sharded(leaf, leaf.ndim - 1)   # column-parallel
                if last == "w2":
                    return sharded(leaf, 1)               # row-parallel
                if last == "b2":
                    return P()
                raise ValueError(f"unknown feed-forward parameter: {joined}")
            if "/cross/" in f"/{joined}/":
                if last == "q_w":
                    return sharded(leaf, 0)               # head axis
                if last == "kv_w":
                    return sharded(leaf, 1)               # head axis (J leads)
                if last == "proj_w1":
                    return sharded(leaf, 0)               # row-parallel over heads
                if last in ("proj_b1", "proj_w2", "proj_b2", "ln_scale", "ln_bias"):
                    return P()
                raise ValueError(f"unknown cross-attention parameter: {joined}")
            if "/heads/" in f"/{joined}/":
                if last in ("w1", "b1"):
                    return sharded(leaf, leaf.ndim - 1)   # column-parallel V//2
                if last == "w2":
                    return sharded(leaf, 0)               # row-parallel V//2
                if last == "b2":
                    return P()
                raise ValueError(f"unknown vocab-head parameter: {joined}")
            if "/tok_emb/" in f"/{joined}/":
                return sharded(leaf, 0)                   # vocab rows
            return P()

        spec = base()
        if stacked:
            spec = with_mod(spec, leaf)
        return with_fsdp(spec, leaf)

    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = [spec_for(path, leaf) for path, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], specs)


def shard_params(
    params, mesh: Mesh, n_head: int, model_axis: bool = True,
    fsdp: bool = False,
):
    """Place the parameter pytree onto the mesh per param_pspecs. Modality
    parallelism engages automatically when the mesh has a 'mod' axis > 1;
    ``fsdp=True`` additionally shards each leaf over 'data' (ZeRO-3)."""
    specs = param_pspecs(
        params, n_head, model_axis=model_axis,
        model_size=mesh.shape.get("model", 1),
        mod_axis=mesh.shape.get("mod", 1) > 1,
        mod_size=mesh.shape.get("mod", 1),
        fsdp_size=mesh.shape.get("data", 1) if fsdp else 1,
    )
    from .multihost import place_sharded

    return jax.tree.map(
        lambda leaf, spec: place_sharded(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )
