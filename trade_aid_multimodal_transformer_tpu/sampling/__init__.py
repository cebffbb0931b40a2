"""Sampling subsystem: boundary-aware start indices, device-resident feed,
and on-device augmentation."""

from .augment import augment_tokens, augment_windows
from .feed import BatchFeed, resolve_rand_sizes
from .indices import (
    SplitIndexPlan,
    gather_windows,
    generate_batch_starting_indices,
    split_file_lengths,
)

__all__ = [
    "augment_tokens",
    "augment_windows",
    "BatchFeed",
    "resolve_rand_sizes",
    "SplitIndexPlan",
    "gather_windows",
    "generate_batch_starting_indices",
    "split_file_lengths",
]
