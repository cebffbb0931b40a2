"""Data subsystem: ingestion, caching, transforms, vocabulary, splitting.

Public surface mirrors the reference's data layer (data_utils.py,
file_cache.py) with vectorized internals.
"""

from .loader import (
    FileCache,
    cleanup_cache,
    get_file_cache,
    load_file_data,
    load_file_data_cached,
    print_cache_stats,
)
from .runlog import report_non_numeric_error, write_initial_run_details
from .transforms import (
    add_rand_to_data_points,
    bin_numeric_data,
    convert_to_percent_changes,
    percent_changes_lenient,
    range_numeric_data,
)
from .vocab import create_train_val_datasets, numerical_representation

__all__ = [
    "FileCache",
    "cleanup_cache",
    "get_file_cache",
    "load_file_data",
    "load_file_data_cached",
    "print_cache_stats",
    "report_non_numeric_error",
    "write_initial_run_details",
    "add_rand_to_data_points",
    "bin_numeric_data",
    "convert_to_percent_changes",
    "percent_changes_lenient",
    "range_numeric_data",
    "create_train_val_datasets",
    "numerical_representation",
]
