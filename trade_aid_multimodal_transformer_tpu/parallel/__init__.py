"""Parallelism subsystem: device mesh, sharding rules, DP/TP/modality
training, GPipe pipeline parallelism, ring (context-parallel) attention."""

from .mesh import (
    batch_pspec,
    default_mesh_shape,
    make_mesh,
    param_pspecs,
    shard_params,
)
from .pipeline import (
    pipeline_apply,
    pipeline_total_loss,
    stack_blocks,
    unstack_blocks,
)
from . import multihost
from .resolve import MESH_AXES, MeshPlan, plan_mesh
from .ring_attention import make_ring_attention, ring_causal_attention_local
from .trainer import (
    make_shard_map_dp_step,
    make_sharded_trainer,
    shard_train_state,
)

__all__ = [
    "batch_pspec",
    "default_mesh_shape",
    "make_mesh",
    "param_pspecs",
    "shard_params",
    "pipeline_apply",
    "pipeline_total_loss",
    "stack_blocks",
    "unstack_blocks",
    "MESH_AXES",
    "MeshPlan",
    "multihost",
    "plan_mesh",
    "make_ring_attention",
    "ring_causal_attention_local",
    "make_shard_map_dp_step",
    "make_sharded_trainer",
    "shard_train_state",
]
