"""File-boundary-aware batch start-index generation, reformulated for jit.

Reference semantics: training_utils.py:33-181 and the worked examples in its
TECHNICAL_NOTES.md:18-110. The reference maps each random draw to a
(file, offset) pair with a Python double loop over batch × files on every
step; here the per-file valid-start counts are precomputed once on the host
(``SplitIndexPlan``) and the per-step mapping is a vectorized
``searchsorted`` on device — O(batch · log files) inside the jitted step,
zero host work.

Semantics preserved exactly:
- A start is valid when the input window (block_size) and the shifted target
  window both fit inside one file: ``L - (block_size+1) - offset + 1``
  positions per file of length L (reference: training_utils.py:141).
- ``is_percents`` skips each file's first element (always 0.0 after percent
  conversion; reference: training_utils.py:95-99).
- The train split owns files from the front of ``file_lengths``; the val
  split owns files from the back, reversed, with the boundary file truncated
  to the split size (reference: training_utils.py:107-135).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def split_file_lengths(file_lengths: List[int], data_size: int, split: str) -> List[int]:
    """Per-file lengths of one split, reconstructed from the full dataset's
    file lengths (reference: training_utils.py:107-135)."""
    if split not in ("train", "val"):
        raise ValueError("'split' must be 'train' or 'val'.")
    dataset_file_lengths: List[int] = []
    accum = 0
    n_files = len(file_lengths)
    for f in range(n_files):
        this = file_lengths[f] if split == "train" else file_lengths[n_files - 1 - f]
        accum += this
        if accum <= data_size:
            dataset_file_lengths.append(this)
        if accum > data_size:
            dataset_file_lengths.append(data_size - (accum - this))
        if accum >= data_size:
            break
    if split == "val":
        dataset_file_lengths.reverse()
    return dataset_file_lengths


@dataclass(frozen=True)
class SplitIndexPlan:
    """Host-precomputed arrays that make start sampling a single gather.

    Attributes:
        file_starts: offset of each split-file's first element in the split.
        valid_counts: number of valid start positions per split-file.
        cum_valid: exclusive prefix sums of valid_counts (len = files + 1).
        total_valid: sum of valid_counts.
        first_offset: 1 when percent data skips file-initial elements.
    """

    file_starts: np.ndarray
    valid_counts: np.ndarray
    cum_valid: np.ndarray
    total_valid: int
    first_offset: int
    block_size: int

    @classmethod
    def build(
        cls,
        data_size: int,
        block_size: int,
        split: str,
        file_lengths: List[int],
        is_percents: bool,
    ) -> "SplitIndexPlan":
        if not isinstance(data_size, int) or data_size <= 0:
            raise TypeError("'data_size' must be a positive integer.")
        if not isinstance(block_size, int) or block_size <= 0:
            raise TypeError("'block_size' must be a positive integer.")
        if block_size >= data_size:
            raise ValueError(
                "'block_size' cannot be equal to or greater than 'data_size'."
            )
        if not isinstance(file_lengths, list) or len(file_lengths) < 1:
            raise TypeError("'file_lengths' must be a list containing at least 1 element.")
        if not isinstance(is_percents, bool):
            raise TypeError("'is_percents' must be a boolean.")

        block_size_xy = block_size + 1
        first_offset = 1 if is_percents else 0

        if len(file_lengths) == 1:
            lengths = [data_size]
        else:
            lengths = split_file_lengths(file_lengths, data_size, split)

        lengths_arr = np.asarray(lengths, dtype=np.int64)
        valid = np.maximum(0, lengths_arr - block_size_xy - first_offset + 1)
        total = int(valid.sum())
        if total <= 0:
            raise ValueError(
                "No valid starting positions available for the given block size "
                "and file lengths."
            )
        file_starts = np.concatenate(([0], np.cumsum(lengths_arr)[:-1]))
        cum_valid = np.concatenate(([0], np.cumsum(valid)))
        return cls(
            file_starts=file_starts.astype(np.int32),
            valid_counts=valid.astype(np.int32),
            cum_valid=cum_valid.astype(np.int32),
            total_valid=total,
            first_offset=first_offset,
            block_size=block_size,
        )

    def sample_starts(self, key: jax.Array, batch_size: int) -> jax.Array:
        """Draw batch start indices uniformly over all valid positions.

        jit-safe: all shapes static, plan arrays are closed-over constants.
        """
        r = jax.random.randint(key, (batch_size,), 0, self.total_valid)
        cum = jnp.asarray(self.cum_valid)
        k = jnp.searchsorted(cum, r, side="right") - 1
        pos_in_file = r - cum[k]
        return jnp.asarray(self.file_starts)[k] + pos_in_file + self.first_offset

    def valid_start_set(self) -> np.ndarray:
        """All valid starts, enumerated on host (testing/debug only)."""
        out = []
        for start, count in zip(self.file_starts, self.valid_counts):
            out.extend(range(start + self.first_offset, start + self.first_offset + count))
        return np.asarray(out, dtype=np.int64)


def gather_windows(data: jax.Array, starts: jax.Array, block_size: int) -> jax.Array:
    """Gather (batch, block_size+1) windows; split into (x, y) by the caller.

    Replaces the reference's per-sample Python slicing + torch.stack
    (reference: training_utils.py:374-379) with one vectorized gather that
    XLA lowers to a single dynamic-gather on device.
    """
    offsets = jnp.arange(block_size + 1, dtype=starts.dtype)
    return data[starts[:, None] + offsets[None, :]]


def generate_batch_starting_indices(
    data_size: int,
    block_size: int,
    batch_size: int,
    split: str,
    file_lengths: List[int],
    is_percents: bool,
    key: jax.Array = None,
) -> jax.Array:
    """API-parity wrapper matching the reference's one-shot signature
    (reference: training_utils.py:33-181)."""
    if not isinstance(batch_size, int) or batch_size <= 0:
        raise TypeError("'batch_size' must be a positive integer.")
    plan = SplitIndexPlan.build(data_size, block_size, split, file_lengths, is_percents)
    if key is None:
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    return plan.sample_starts(key, batch_size)
