"""Multi-host (multi-process) training: one SPMD program over DCN + ICI.

The reference is strictly one Python process on one device (SURVEY §2.4:
no distributed backend of any kind). On TPU pods beyond a single host,
JAX runs multi-controller: every host executes the same program against
its local chips and `jax.distributed` wires the processes into one global
device set. This module is the thin, testable layer that makes the
existing GSPMD trainer (parallel/trainer.py) span hosts:

- ``initialize()`` — bring up the distributed runtime (on TPU pods
  ``jax.distributed.initialize()`` self-bootstraps from pod metadata; on
  CPU/GPU pass coordinator/num_processes/process_id, as the tests do).
- ``place_global(tree, mesh, spec)`` — turn identical per-process host
  data into global arrays on a process-spanning mesh
  (``jax.make_array_from_callback``; each process materializes only its
  addressable shards).
- ``place_sharded`` — sharding-aware placement used by
  mesh.shard_params: plain ``device_put`` single-process (fast path),
  callback placement when the mesh spans processes.

Everything downstream is unchanged: the fused train chunk jits over the
global mesh and XLA lays collectives over ICI within a host/slice and DCN
across hosts. Config surface: ``tpu_options.multihost: true`` makes
``python main.py``, launched once per host, train the whole pod.

Equivalence with the single-process trainer is pinned by a REAL
two-process CPU test (tests/test_multihost.py): 2 processes x 4 virtual
devices train through make_sharded_trainer on a global {data: 8} mesh and
must reproduce the single-device oracle's losses.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up jax.distributed (idempotent).

    With no arguments this relies on the environment: TPU pod metadata, or
    the standard JAX coordination env vars. Already-initialized runtimes
    are left untouched. NOTE: must run before anything initializes the XLA
    backend (jax.devices() etc.) — is_initialized() is the only safe probe.
    """
    if jax.distributed.is_initialized():
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_multiprocess(mesh: Optional[Mesh] = None) -> bool:
    """True when placement must go through make_array_from_callback: the
    runtime has multiple processes and (if given) the mesh spans devices
    this process cannot address."""
    if jax.process_count() <= 1:
        return False
    if mesh is None:
        return True
    local = set(jax.local_devices())
    return any(d not in local for d in mesh.devices.flat)


def place_sharded(host_value, sharding: NamedSharding):
    """Place identical-per-process host data onto a (possibly
    process-spanning) sharding.

    Single-process: plain device_put. Multi-process: callback placement —
    each process materializes only the shards its devices own, so no
    process ever needs the full array resident per device.
    """
    if not is_multiprocess(getattr(sharding, "mesh", None)):
        return jax.device_put(host_value, sharding)
    host = np.asarray(host_value)
    return jax.make_array_from_callback(
        host.shape, sharding, lambda idx: host[idx]
    )


def place_global(tree, mesh: Mesh, spec: P = P()):
    """Place every leaf of ``tree`` on ``mesh`` with ``spec`` (default:
    replicated) — the multi-process-safe jax.device_put(tree, sharding)."""
    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(lambda x: place_sharded(x, sharding), tree)


def gather_to_host(tree):
    """Fetch possibly process-sharded global arrays as full host numpy
    (checkpointing): fully-addressable leaves are fetched directly, others
    all-gathered over the process set."""
    from jax.experimental import multihost_utils

    def fetch(leaf):
        if not hasattr(leaf, "is_fully_addressable") or leaf.is_fully_addressable:
            return np.asarray(jax.device_get(leaf))
        # tiled=True: shards re-assemble into the full global value
        return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))

    return jax.tree.map(fetch, tree)
