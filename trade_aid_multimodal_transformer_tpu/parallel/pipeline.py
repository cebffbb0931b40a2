"""Pipeline parallelism: the block stack sharded over a 'pipe' mesh axis.

The reference has no parallelism at all (SURVEY §2.4); this is the net-new
pipeline axis completing the framework's DP/TP/SP(ring)/modality/PP set.
Idiomatic-TPU formulation: the per-layer parameter trees are STACKED into
single leaves with a leading L axis (every MultimodalBlock has an identical
pytree structure), that L axis shards over 'pipe' with shard_map, and a
GPipe schedule streams microbatches through the stages with
``lax.ppermute`` activation handoffs over ICI.

Schedule (S stages, µ microbatches, µ + S - 1 ticks): at tick t, stage s
processes microbatch t - s when 0 <= t - s < µ; stage 0 feeds from the
microbatch array, later stages from the previous stage's ppermute'd
output; the last stage accumulates its results into a local buffer that a
final psum replicates (all other stages contribute zeros). The whole
schedule is a ``lax.scan`` over ticks, so ``jax.grad`` differentiates
straight through it — ppermute's transpose is the reverse ppermute, giving
the textbook backward pipeline with no hand-written schedule.

Cost shape: each stage computes every tick (inactive ticks are masked
selects, not skips) — the standard GPipe bubble of (S - 1) / (µ + S - 1)
idle fraction; raise µ to amortize.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.transformer import block_forward, cross_entropy, embed, logits_heads


def stack_blocks(blocks: List[Dict[str, Any]]):
    """Stack the per-layer block trees into one tree with leading L axes.

    Valid because every block has the same pytree structure (the model
    builds each layer identically; reference: model.py:187-190).
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def unstack_blocks(stacked, n_layer: int) -> List[Dict[str, Any]]:
    """Inverse of stack_blocks."""
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n_layer)]


def pipeline_apply(
    stacked_blocks,
    x: jax.Array,
    keys: Optional[jax.Array],
    cfg: ModelConfig,
    train: bool,
    mesh: Mesh,
    microbatches: int,
    axis: str = "pipe",
    data_axis: Optional[str] = None,
) -> jax.Array:
    """Run the stacked block stack over ``x`` (M, B, T, C) pipelined over
    ``mesh[axis]``.

    keys: (L, µ) raw PRNG keys (uint32 (..., 2)) — per-(layer, microbatch)
    dropout keys — or None for deterministic passes.

    ``data_axis``: compose with data parallelism — the per-microbatch batch
    dim additionally shards over that mesh axis (each (pipe, data) device
    pipelines its own batch shard; gradient reduction over 'data' is the
    caller's jit/psum as usual).
    """
    S = mesh.shape[axis]
    L = jax.tree_util.tree_leaves(stacked_blocks)[0].shape[0]
    if L % S != 0:
        raise ValueError(f"n_layer {L} not divisible by pipe axis {S}")
    M, B, T, C = x.shape
    if B % microbatches != 0:
        raise ValueError(f"batch {B} not divisible by microbatches {microbatches}")
    mu = microbatches
    b = B // mu
    # (µ, M, b, T, C)
    mbs = x.reshape(M, mu, b, T, C).transpose(1, 0, 2, 3, 4)

    block_specs = jax.tree.map(lambda _: P(axis), stacked_blocks)
    key_spec = P(axis)
    mbs_spec = P(None, None, data_axis) if data_axis else P()
    perm = [(i, i + 1) for i in range(S - 1)]

    def body(local_blocks, mbs, local_keys):
        rank = jax.lax.axis_index(axis)

        def layers(x, mb_idx):
            def f(carry, layer):
                blk, kidx = layer
                key = None
                if local_keys is not None:
                    key = local_keys[kidx, mb_idx]
                    if data_axis is not None:
                        # decorrelate dropout across data shards (each shard
                        # sees different rows under the same (layer, µ) key)
                        key = jax.random.fold_in(
                            key, jax.lax.axis_index(data_axis)
                        )
                return block_forward(carry, blk, key, cfg, train), None

            n_local = jax.tree_util.tree_leaves(local_blocks)[0].shape[0]
            y, _ = jax.lax.scan(
                f, x, (local_blocks, jnp.arange(n_local))
            )
            return y

        y0 = jnp.zeros_like(mbs[0])
        out0 = jnp.zeros_like(mbs)

        def tick(carry, t):
            y_prev, outputs = carry
            recv = jax.lax.ppermute(y_prev, axis, perm) if S > 1 else y_prev
            mb_idx = jnp.clip(t - rank, 0, mu - 1)
            x_in = jnp.where(rank == 0, mbs[jnp.clip(t, 0, mu - 1)], recv)
            y = layers(x_in, mb_idx)
            out_idx = jnp.clip(t - (S - 1), 0, mu - 1)
            valid = (t - (S - 1) >= 0) & (rank == S - 1)
            upd = jnp.where(valid, y, outputs[out_idx])
            outputs = outputs.at[out_idx].set(upd)
            return (y, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (y0, out0), jnp.arange(mu + S - 1)
        )
        # only the last stage holds real outputs; psum replicates them
        return jax.lax.psum(outputs, axis)

    if keys is None:
        fn = shard_map(
            lambda blks, mbs: body(blks, mbs, None), mesh=mesh,
            in_specs=(block_specs, mbs_spec), out_specs=mbs_spec,
            check_rep=False,
        )
        out = fn(stacked_blocks, mbs)
    else:
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(block_specs, mbs_spec, key_spec), out_specs=mbs_spec,
            check_rep=False,
        )
        out = fn(stacked_blocks, mbs, keys)
    # (µ, M, b, T, C) -> (M, B, T, C)
    return out.transpose(1, 0, 2, 3, 4).reshape(M, B, T, C)


def pipeline_total_loss(
    params: Dict[str, Any],
    cfg: ModelConfig,
    idx: jax.Array,
    targets: jax.Array,
    mesh: Mesh,
    microbatches: int,
    rng: Optional[jax.Array] = None,
    train: bool = True,
    axis: str = "pipe",
    data_axis: Optional[str] = None,
):
    """Summed multimodal loss with the block stack pipelined over 'pipe'.

    Embeddings and vocab heads stay replicated (they are small next to the
    block stack); semantics match models.transformer.total_loss except for
    the dropout key schedule (per-(layer, microbatch) keys instead of the
    sequential KeyGen split — same distribution, different stream).
    """
    L = cfg.n_layer
    keys = None
    if rng is not None and train and cfg.dropout > 0.0:
        mu = microbatches
        ks = jax.random.split(rng, L * mu)
        # typed key arrays are 1-D (L*mu,); raw uint32 keys are (L*mu, 2)
        if jnp.issubdtype(ks.dtype, jax.dtypes.prng_key):
            keys = ks.reshape(L, mu)
        else:
            keys = ks.reshape(L, mu, -1)
    stacked = stack_blocks(params["blocks"])
    x = embed(params, cfg, idx)
    x = pipeline_apply(
        stacked, x, keys, cfg, train, mesh, microbatches, axis=axis,
        data_axis=data_axis,
    )
    logits = logits_heads(params, cfg, x)
    losses = [
        cross_entropy(logits[m], targets[m]) for m in range(cfg.num_modalities)
    ]
    return jnp.sum(jnp.stack(losses)), losses
