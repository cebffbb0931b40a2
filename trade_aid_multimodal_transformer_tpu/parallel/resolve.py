"""Config → mesh resolution: the zero-flag parallelism surface.

The reference contract is "everything via YAML / config.py, ``python
main.py``, no CLI flags" (reference: main.py:29-64, README.md:959-961).
The reference itself is single-device (SURVEY §2.4), so this module is the
net-new piece that makes *multi-device* training reachable from that same
surface: ``tpu_options.mesh`` in config.yaml resolves to a
``jax.sharding.Mesh`` here, and train/runner routes the training step
through parallel/trainer when the resolved mesh is non-trivial.

Accepted forms of ``tpu_options.mesh``:

- ``"auto"`` (default): data-parallel over every visible device whose count
  divides the batch size (largest such divisor), composing with
  ``context_parallel``. On one device this is a no-op, so reference configs
  behave identically — but ``python main.py`` on a v5e-8 trains on 8 chips.
- ``"off"``: single-device (context_parallel still honored).
- an int N: shorthand for ``{data: N}``.
- a mapping ``{data, model, mod, pipe}``: explicit axis sizes —
  data parallelism, tensor parallelism over heads/FFN, modality
  parallelism, GPipe pipeline parallelism (parallel/pipeline.py). Strictly
  validated against the device count and the divisibility each axis needs.

``context_parallel`` (ring attention over a 'seq' axis) composes with all
forms: the resolved mesh is (pipe, mod, data, model, seq).

``fsdp`` (ZeRO-3, ``tpu_options.fsdp: true``) composes with any plan whose
'data' axis is > 1: parameters and optimizer state shard over 'data'
(mesh.param_pspecs), so train-state memory scales 1/data per device. With
data == 1 it is a no-op.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
from jax.sharding import Mesh

from .mesh import make_mesh

MESH_AXES = ("data", "model", "mod", "pipe")


@dataclass
class MeshPlan:
    """Resolved parallelism layout for one run."""

    data: int = 1
    model: int = 1
    mod: int = 1
    pipe: int = 1
    seq: int = 1
    fsdp: bool = False
    devices: List[Any] = field(default_factory=list)

    @property
    def n_devices(self) -> int:
        return self.data * self.model * self.mod * self.pipe * self.seq

    @property
    def trivial(self) -> bool:
        """True when the plan is single-device — the runner then uses the
        plain Trainer and no mesh is materialized."""
        return self.n_devices == 1

    def build(self) -> Mesh:
        return make_mesh(
            self.data, self.model, self.devices[: self.n_devices],
            seq=self.seq, mod=self.mod, pipe=self.pipe,
        )

    def describe(self) -> str:
        parts = []
        if self.pipe > 1:
            parts.append(f"pipeline x{self.pipe}")
        if self.mod > 1:
            parts.append(f"modality x{self.mod}")
        if self.data > 1:
            parts.append(
                f"data x{self.data}" + (" (fsdp/zero-3)" if self.fsdp else "")
            )
        if self.model > 1:
            parts.append(f"tensor x{self.model}")
        if self.seq > 1:
            parts.append(f"context x{self.seq}")
        return " * ".join(parts) if parts else "single device"


def plan_mesh(
    mesh_cfg: Union[str, int, Dict[str, int], None],
    context_parallel: int = 1,
    *,
    fsdp: bool = False,
    batch_size: int,
    block_size: int,
    n_head: int,
    num_modalities: int,
    n_layer: int,
    pipeline_microbatches: int = 4,
    devices: Optional[Sequence] = None,
) -> MeshPlan:
    """Resolve the config surface into a MeshPlan (raising on impossible
    explicit requests; 'auto' degrades gracefully instead)."""
    devices = list(devices) if devices is not None else jax.devices()
    n_avail = len(devices)
    seq = max(1, int(context_parallel))
    if seq > 1:
        if n_avail < seq:
            raise ValueError(
                f"tpu_options.context_parallel={seq} but only "
                f"{n_avail} device(s) are available"
            )
        if block_size % seq != 0:
            raise ValueError(
                f"context_parallel ({seq}) must divide block_size ({block_size})"
            )

    if mesh_cfg is None:
        mesh_cfg = "auto"

    if mesh_cfg == "off":
        return MeshPlan(seq=seq, devices=devices)

    if mesh_cfg == "auto":
        budget = n_avail // seq
        # largest data-axis size that uses available devices evenly AND
        # divides the batch (uneven batch shards would silently waste chips)
        data = 1
        for d in range(budget, 0, -1):
            if batch_size % d == 0:
                data = d
                break
        return MeshPlan(data=data, seq=seq, fsdp=fsdp and data > 1,
                        devices=devices)

    if isinstance(mesh_cfg, int):
        mesh_cfg = {"data": mesh_cfg}

    if not isinstance(mesh_cfg, dict):
        raise ValueError(
            f"tpu_options.mesh must be 'auto', 'off', an int, or a mapping "
            f"with keys {MESH_AXES}, got {mesh_cfg!r}"
        )
    unknown = set(mesh_cfg) - set(MESH_AXES)
    if unknown:
        raise ValueError(
            f"unknown tpu_options.mesh axes {sorted(unknown)}; "
            f"valid axes: {MESH_AXES}"
        )
    axes = {k: int(mesh_cfg.get(k, 1)) for k in MESH_AXES}
    for k, v in axes.items():
        if v < 1:
            raise ValueError(f"tpu_options.mesh.{k} must be >= 1, got {v}")

    plan = MeshPlan(seq=seq, fsdp=fsdp and axes["data"] > 1,
                    devices=devices, **axes)
    if plan.n_devices > n_avail:
        raise ValueError(
            f"tpu_options.mesh {axes} x context_parallel {seq} needs "
            f"{plan.n_devices} devices, have {n_avail}"
        )
    if batch_size % plan.data != 0:
        raise ValueError(
            f"tpu_options.mesh.data ({plan.data}) must divide "
            f"batch_size ({batch_size})"
        )
    if plan.mod > 1 and num_modalities % plan.mod != 0:
        raise ValueError(
            f"tpu_options.mesh.mod ({plan.mod}) must divide the modality "
            f"count ({num_modalities})"
        )
    if plan.pipe > 1:
        if n_layer % plan.pipe != 0:
            raise ValueError(
                f"tpu_options.mesh.pipe ({plan.pipe}) must divide "
                f"n_layer ({n_layer})"
            )
        mu = int(pipeline_microbatches)
        if mu < 1 or batch_size % (plan.data * mu) != 0:
            raise ValueError(
                f"pipeline_microbatches ({mu}) x mesh.data ({plan.data}) "
                f"must divide batch_size ({batch_size})"
            )
    return plan
