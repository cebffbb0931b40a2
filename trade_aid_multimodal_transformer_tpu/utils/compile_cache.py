"""Persistent XLA compilation cache.

TPU compilation of the fused train/eval programs is expensive (tens of
seconds to minutes); the reference has no equivalent cost. Enabling JAX's
persistent compilation cache makes every rerun of the same config (bench
reruns, resumed training, repeated CLI invocations) hit the disk cache
instead of recompiling.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Enable the JAX persistent compilation cache (idempotent).

    Default location: $TRADE_AID_CACHE_DIR, else ~/.cache/trade_aid_jax.
    """
    import jax

    path = path or os.environ.get(
        "TRADE_AID_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "trade_aid_jax"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
