"""Sharded training: compiler-partitioned (jit + NamedSharding) and explicit
(shard_map + psum) data/tensor parallelism.

Two complementary paths:

1. ``make_sharded_trainer`` — the production path. Parameters and optimizer
   state are placed on the mesh per parallel/mesh.param_pspecs (head/FFN
   tensor parallelism over 'model'); sampled batches get a
   with_sharding_constraint over 'data'. The whole fused train chunk then
   compiles as one SPMD program and XLA inserts the gradient all-reduces and
   tensor-parallel collectives over ICI.

2. ``make_shard_map_dp_step`` — explicit SPMD data parallelism: each device
   draws its own sub-batch (device-folded RNG), computes grads, and
   ``psum``s them across 'data'. This is the explicit-collective formulation
   (useful as a cross-check of the compiler-partitioned path and as the
   template for custom-collective work).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models.config import ModelConfig
from ..models.transformer import total_loss
from ..sampling.feed import BatchFeed
from ..train.metrics import ModalityMetricSpec
from ..train.steps import Trainer
from .mesh import batch_pspec, param_pspecs, shard_params


def make_sharded_trainer(
    cfg: ModelConfig,
    feed: BatchFeed,
    optimizer: optax.GradientTransformation,
    metric_specs: Sequence[ModalityMetricSpec],
    eval_iters: int,
    mesh: Mesh,
    model_axis: bool = True,
    rng_impl: str = "auto",
    scan_unroll: int = 1,
    grad_accum: int = 1,
    extra_scope=None,
    pipeline_microbatches: int = 4,
) -> Trainer:
    """Trainer whose jitted programs partition over the mesh.

    If the mesh has a 'seq' axis (>1), attention additionally runs
    context-parallel: the trainer's traced steps open
    ``ops.attention.context_parallel_scope`` so the attention cores route
    through ring attention over 'seq' (composing with 'data'/'model'
    sharding). block_size must then be divisible by the 'seq' size.

    If the mesh has a 'pipe' axis (>1), the differentiated objective becomes
    ``pipeline_total_loss`` — the block stack runs as a GPipe schedule over
    the stages (pipeline.py) with ``pipeline_microbatches`` microbatches;
    evaluation still uses the plain forward (block params are replicated in
    the pytree, so both views of the model are always available).

    ``extra_scope``: an additional zero-arg context-manager factory entered
    inside the traced steps (e.g. jax.default_matmul_precision from
    tpu_options.matmul_precision), composed with the seq scope.
    """
    from .multihost import is_multiprocess

    if is_multiprocess(mesh):
        # multi-host: the sampler's closed-over token arrays must be global
        # arrays on this mesh, or tracing the SPMD chunk rejects them
        feed.place_global(mesh)

    batch_sharding = NamedSharding(
        mesh, batch_pspec(mod_axis=mesh.shape.get("mod", 1) > 1)
    )

    def constrain(x):
        return jax.lax.with_sharding_constraint(x, batch_sharding)

    scopes = []
    if extra_scope is not None:
        scopes.append(extra_scope)
    seq = mesh.shape.get("seq", 1)
    if seq > 1:
        if cfg.block_size % seq != 0:
            raise ValueError(
                f"context parallelism needs block_size ({cfg.block_size}) "
                f"divisible by the 'seq' mesh axis ({seq})"
            )
        from ..ops.attention import context_parallel_scope

        scopes.append(lambda: context_parallel_scope(mesh, "seq"))

    scope = _compose_scopes(scopes) if scopes else None

    loss_fn = None
    if mesh.shape.get("pipe", 1) > 1:
        from functools import partial

        from .pipeline import pipeline_total_loss

        data_axis = "data" if mesh.shape.get("data", 1) > 1 else None

        def loss_fn(params, cfg_, idx, targets, rng, train):  # noqa: F811
            return pipeline_total_loss(
                params, cfg_, idx, targets, mesh,
                microbatches=pipeline_microbatches, rng=rng, train=train,
                axis="pipe", data_axis=data_axis,
            )

    return Trainer(
        cfg, feed, optimizer, metric_specs, eval_iters,
        batch_constraint=constrain, rng_impl=rng_impl, scope=scope,
        scan_unroll=scan_unroll, grad_accum=grad_accum, loss_fn=loss_fn,
    )


def _compose_scopes(factories):
    """One zero-arg context-manager factory entering all given factories."""
    import contextlib

    @contextlib.contextmanager
    def combined():
        with contextlib.ExitStack() as stack:
            for f in factories:
                stack.enter_context(f())
            yield

    return combined


def shard_train_state(
    params, optimizer, mesh: Mesh, n_head: int, model_axis: bool = True,
    opt_state=None, fsdp: bool = False,
):
    """Place params on the mesh and build optimizer state with matching
    shardings (optax states mirror the param tree, so zeros_like inherits
    the placements).

    ``opt_state``: a previously loaded (host/replicated) optimizer state to
    resume from — each leaf is re-placed with the sharding the fresh state
    would have, so checkpoint resume keeps the mesh layout.

    ``fsdp=True`` (ZeRO-3): params AND both Adam moments additionally shard
    over 'data' (mesh.param_pspecs fsdp placement) — per-device train-state
    memory scales 1/data while XLA all-gathers weights at use.
    """
    sharded = shard_params(params, mesh, n_head, model_axis=model_axis,
                           fsdp=fsdp)
    fresh = optimizer.init(sharded)
    replicated = NamedSharding(mesh, P())

    def target(f):
        # Moment leaves inherit mesh placements from the sharded params via
        # zeros_like; scalar leaves (Adam's count) come out single-device
        # and must be replicated onto the mesh, or jit rejects the mix.
        s = getattr(f, "sharding", None)
        return s if isinstance(s, NamedSharding) else replicated

    from .multihost import place_sharded

    def place(value, tgt):
        # fresh moment leaves already carry the target sharding (zeros_like
        # of the sharded params) — placing again would be a no-op locally
        # and an error multi-process (their data is process-sharded).
        if getattr(value, "sharding", None) == tgt:
            return value
        return place_sharded(value, tgt)

    if opt_state is None:
        placed = jax.tree.map(lambda f: place(f, target(f)), fresh)
    else:
        placed = jax.tree.map(
            lambda f, loaded: place(loaded, target(f)),
            fresh, opt_state,
        )
    return sharded, placed


def make_shard_map_dp_step(
    cfg: ModelConfig,
    feed: BatchFeed,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
):
    """Explicit-psum data-parallel train step over mesh axis 'data'.

    Requires model axis size 1 (params fully replicated) and a global batch
    divisible by the data-axis size. Each device samples
    batch/num_devices sequences with an axis-index-folded key, so the global
    batch is the union of per-device draws.
    """
    if mesh.shape.get("model", 1) != 1:
        raise ValueError("shard_map DP path requires a data-only mesh (model=1)")
    ndev = mesh.shape["data"]
    if feed.batch_size % ndev != 0:
        raise ValueError(
            f"batch_size {feed.batch_size} not divisible by data axis {ndev}"
        )
    per_device_batch = feed.batch_size // ndev

    def per_device(params, opt_state, key):
        key = jax.random.fold_in(key[0], jax.lax.axis_index("data"))
        k_batch, k_drop = jax.random.split(key)
        xb, yb = feed._sample_impl(
            k_batch, split="train", augment=True, batch_size=per_device_batch
        )
        (loss, _), grads = jax.value_and_grad(total_loss, has_aux=True)(
            params, cfg, xb, yb, k_drop, True
        )
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P("data")),
        out_specs=(P(), P(), P()),
        check_rep=False,
    )

    def wrapped(params, opt_state, key):
        # one key per data-mesh row; the body folds in its axis index anyway,
        # so content only needs to be distinct per call.
        keys = jnp.broadcast_to(key, (ndev,) + key.shape)
        return step(params, opt_state, keys)

    return jax.jit(wrapped, donate_argnums=(0, 1))
