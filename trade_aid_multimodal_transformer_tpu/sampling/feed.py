"""Device-resident batch feed: tokenized datasets live in device memory; each
training step draws, gathers, and augments a batch entirely inside jit.

This replaces the reference's per-step host work — re-running augmentation
over the FULL train list and rebuilding full-size tensors on every
``get_batch`` call (reference: training_utils.py:350-363, measured at
~1.4 s/step/modality at the 1M-row production scale, SURVEY §6/Q2) — with:

- token arrays stacked over the modality axis, uploaded to device once
  (4 modalities × 1M rows × int32 ≈ 16 MB, far under HBM);
- start sampling via the precomputed ``SplitIndexPlan`` (indices.py);
- augmentation applied only to the gathered (batch, block+1) windows, on
  device, before the x/y split so inputs and targets stay the consistent
  view of the same perturbed sequence — exactly the reference's observable
  behavior of augment-then-slice.

Quirk Q1 compat: the reference reads the augmentation size from legacy-list
slot [2] (has_header) instead of [7] (randomness_size)
(reference: training_utils.py:353, also quoted in its TECHNICAL_NOTES.md,
so the bug is load-bearing in every shipped config). The default here is the
documented intent (slot [7]); pass ``compat_legacy_rand_index=True`` to
reproduce the reference's numbers.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .augment import augment_windows
from .indices import SplitIndexPlan, gather_windows


def resolve_rand_sizes(
    all_modality_params: Sequence[Sequence],
    compat_legacy_rand_index: bool = False,
) -> List[Optional[int]]:
    """Per-modality augmentation sizes from legacy parameter lists.

    Default reads slot [7] (randomness_size — the documented intent,
    reference: schema.py:136-138, README augmentation docs). Compat mode
    reads slot [2] (has_header) like the reference hot path
    (training_utils.py:353), including its failure mode: has_header=False
    would make the reference raise inside add_rand_to_data_points
    (rand_size < 1, data_utils.py:328), which we reproduce eagerly.
    """
    out: List[Optional[int]] = []
    for params in all_modality_params:
        if compat_legacy_rand_index:
            raw = params[2] if len(params) > 2 else None
            if raw is None:
                out.append(None)
            else:
                k = int(raw)
                if k < 1 or k > 3:
                    raise ValueError(
                        "rand_size must be an integer between 1 and 3, or null."
                    )
                out.append(k)
        else:
            raw = params[7] if len(params) > 7 else None
            out.append(int(raw) if raw is not None else None)
    return out


class BatchFeed:
    """Per-run batch source for all modalities.

    All modalities share the same start indices each step (the cross-modality
    alignment invariant; reference: training_utils.py:368-371) and equal
    lengths are enforced upstream (reference: main.py:260-269).
    """

    def __init__(
        self,
        train_sets: Sequence[np.ndarray],
        val_sets: Sequence[np.ndarray],
        file_lengths: List[int],
        block_size: int,
        batch_size: int,
        is_percents: bool,
        rand_sizes: Sequence[Optional[int]],
        vocab_sizes: Sequence[int],
        augment_shared: bool = False,
    ):
        self.num_modalities = len(train_sets)
        self.block_size = block_size
        self.batch_size = batch_size
        self.rand_sizes = list(rand_sizes)
        self.vocab_sizes = list(vocab_sizes)
        # Reference as-shipped augmentation SCOPE (training_utils.py:353-360):
        # the whole train array is perturbed once per step and every window
        # in the batch slices from that single noise realization — windows
        # overlapping the same positions share their noise. The default
        # (False) draws independent noise per sampled window: per-token the
        # distribution is identical, but batch windows decorrelate, which
        # measurably speeds small-corpus fitting (PARITY_TPU.md). True
        # reproduces the reference's shared-noise scope (set by the runner
        # alongside compat_legacy_rand_index).
        self.augment_shared = bool(augment_shared)

        # Stack over the modality axis: equal lengths are an invariant.
        self.train_data = jnp.asarray(np.stack(train_sets).astype(np.int32))
        self.val_data = jnp.asarray(np.stack(val_sets).astype(np.int32))

        self.train_plan = SplitIndexPlan.build(
            int(self.train_data.shape[1]), block_size, "train", file_lengths, is_percents
        )
        self.val_plan = SplitIndexPlan.build(
            int(self.val_data.shape[1]), block_size, "val", file_lengths, is_percents
        )

        self._sample = jax.jit(
            self._sample_impl, static_argnames=("split", "augment", "batch_size")
        )

    # The jitted sampler: split/augment are static so each variant compiles
    # once; data arrays are closed-over device constants. ``batch_size``
    # overrides the configured size (used for per-device sub-batches in
    # shard_map data parallelism).
    def _sample_impl(self, key, split: str, augment: bool, batch_size: int = None):
        data = self.train_data if split == "train" else self.val_data
        plan = self.train_plan if split == "train" else self.val_plan

        key_ix, key_aug = jax.random.split(key)
        starts = plan.sample_starts(
            key_ix, batch_size if batch_size is not None else self.batch_size
        )

        if augment and self.augment_shared:
            # reference scope: one noise realization over the whole train
            # array per step, shared by every window (augment_windows
            # broadcasts over (M, N) just as over (M, B, T+1))
            data = augment_windows(
                key_aug, data, self.rand_sizes, self.vocab_sizes
            )

        # (M, B, T+1) — same starts for every modality.
        windows = jax.vmap(lambda d: gather_windows(d, starts, self.block_size))(data)

        if augment and not self.augment_shared:
            windows = augment_windows(
                key_aug, windows, self.rand_sizes, self.vocab_sizes
            )

        xb = windows[:, :, : self.block_size]
        yb = windows[:, :, 1:]
        return xb, yb

    def place_global(self, mesh) -> None:
        """Re-home the token arrays as replicated GLOBAL arrays on a
        process-spanning mesh (multi-host training): the jitted sampler
        closes over these as constants, and a global-SPMD program cannot
        capture process-local device arrays. Identical data on every
        process is the caller's invariant (each host ingests the same
        files). No-op overhead single-process."""
        from ..parallel.multihost import place_global

        self.train_data = place_global(self.train_data, mesh)
        self.val_data = place_global(self.val_data, mesh)

    def get_batch(
        self, key: jax.Array, split: str, is_training: bool
    ) -> Tuple[jax.Array, jax.Array]:
        """Draw one batch: returns (xb, yb) of shape (M, B, T) int32.

        Augmentation runs only for training batches
        (reference: training_utils.py:357).
        """
        augment = bool(is_training) and any(k is not None for k in self.rand_sizes)
        return self._sample(key, split=split, augment=augment)
