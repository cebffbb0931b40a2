"""Checkpointing: save/load model parameters (+ optimizer state, step, rng).

The reference checkpoints weights only (``torch.save(m.state_dict())``,
reference: main.py:627-637) and its "resume" restarts optimization from the
weights (SURVEY Quirk Q13). Here full training state (params + optimizer
state + step + sampler rng) is saved by default, with a weights-only compat
mode; and reference ``.pth`` checkpoints load transparently through
utils/torch_compat so users can migrate mid-training-run.

Format: a single ``.npz`` file — flattened pytree leaves keyed by their
jax key-path strings, so checkpoints are introspectable with plain numpy
and need no framework to read.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..models.config import ModelConfig

_META_STEP = "__meta_step__"
_META_RNG = "__meta_rng__"
_PARAMS_PREFIX = "params"
_OPT_PREFIX = "opt"


# npz has no bfloat16 (numpy serializes ml_dtypes arrays as raw void bytes
# that cannot be cast back) — bf16 leaves are stored as uint16 bit-views
# under a marked key and re-viewed on load.
_BF16_SUFFIX = "::bf16"


def _flatten(prefix: str, tree) -> Dict[str, np.ndarray]:
    flat = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves:
        key = prefix + jax.tree_util.keystr(path)
        arr = np.asarray(leaf)
        if arr.dtype == jax.numpy.bfloat16.dtype:
            flat[key + _BF16_SUFFIX] = arr.view(np.uint16)
        else:
            flat[key] = arr
    return flat


def _unflatten(prefix: str, template, data: Dict[str, np.ndarray]):
    paths_and_leaves = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_and_leaves[0]:
        key = prefix + jax.tree_util.keystr(path)
        if key + _BF16_SUFFIX in data:
            arr = data[key + _BF16_SUFFIX].view(jax.numpy.bfloat16.dtype)
        elif key in data:
            arr = data[key]
        else:
            raise KeyError(f"Checkpoint missing leaf {key}")
        leaves.append(arr.astype(np.asarray(leaf).dtype).reshape(np.shape(leaf)))
    return jax.tree_util.tree_unflatten(paths_and_leaves[1], leaves)


def save_checkpoint(
    path: str,
    params,
    opt_state=None,
    step: Optional[int] = None,
    rng=None,
    weights_only: bool = False,
) -> int:
    """Write a checkpoint; returns the file size in bytes
    (the reference prints checkpoint size in MB, main.py:637).

    Multi-host: leaves sharded across processes (fsdp over a
    process-spanning mesh) are all-gathered to full host arrays first, and
    only process 0 touches the filesystem (every process still returns the
    size, via a broadcast-free stat after a barrier).
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        from ..parallel.multihost import gather_to_host

        params = gather_to_host(params)
        if opt_state is not None:
            opt_state = gather_to_host(opt_state)
        if jax.process_index() != 0:
            # barrier pairs with process 0's post-write barrier below
            multihost_utils.sync_global_devices("checkpoint_save")
            return os.path.getsize(path) if os.path.exists(path) else 0
    out = _flatten(_PARAMS_PREFIX, params)
    if not weights_only:
        if opt_state is not None:
            out.update(_flatten(_OPT_PREFIX, opt_state))
        if step is not None:
            out[_META_STEP] = np.asarray(step, np.int64)
        if rng is not None:
            out[_META_RNG] = np.asarray(rng)
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    # write via a file object (np.savez appends .npz to bare paths) and
    # replace atomically so a crash mid-save never corrupts the previous
    # checkpoint.
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **out)
    os.replace(tmp, path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("checkpoint_save")
    return os.path.getsize(path)


def load_checkpoint(
    path: str,
    params_template,
    opt_state_template=None,
    cfg: Optional[ModelConfig] = None,
) -> Tuple[Any, Any, Optional[int], Optional[np.ndarray]]:
    """Load a checkpoint into (params, opt_state, step, rng).

    Accepts this framework's ``.npz`` checkpoints or a reference torch
    state_dict (``.pth``) — the latter requires ``cfg`` and yields
    weights-only state (opt_state/step/rng come back as template/None).
    """
    try:
        with np.load(path, allow_pickle=False) as z:
            data = {k: z[k] for k in z.files}
        # a torch .pth is also a zip; require our param keys to call it native
        native = any(k.startswith(_PARAMS_PREFIX) for k in data)
    except Exception:
        native = False

    if native:
        params = _unflatten(_PARAMS_PREFIX, params_template, data)
        opt_state = opt_state_template
        if opt_state_template is not None and any(
            k.startswith(_OPT_PREFIX) for k in data
        ):
            opt_state = _unflatten(_OPT_PREFIX, opt_state_template, data)
        step = int(data[_META_STEP]) if _META_STEP in data else None
        rng = data.get(_META_RNG)
        return params, opt_state, step, rng

    # Fall back to a reference torch checkpoint.
    if cfg is None:
        raise ValueError(
            f"{path} is not a native checkpoint and no ModelConfig was given "
            "for torch-format conversion"
        )
    from ..utils.torch_compat import load_reference_checkpoint

    params = load_reference_checkpoint(path, cfg)
    return params, opt_state_template, None, None
