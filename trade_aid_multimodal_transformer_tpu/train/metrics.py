"""Directional-prediction metrics, vectorized on device.

Reference semantics: training_utils.py:184-330. For each modality with an
all-numeric vocabulary, the last position of each evaluation sequence yields:

- a predicted direction: sign of the argmax token's *value* (percent data) or
  sign of (value - previous value) (price-level data), where "previous" is
  the last input token (reference: training_utils.py:269-291);
- a win when predicted and actual direction agree, else a loss;
- a "directional certainty": the total softmax probability mass on all vocab
  tokens whose direction matches the predicted direction
  (reference: training_utils.py:294-304 — computed there per sample with a
  Python loop over the vocabulary; here it's one masked matmul).

The reference computes this with nested Python loops over batch × vocab on
host. Here direction signs are precomputed per modality as lookup tables
(1-D for percent data, 2-D (V, V) for value data — V ≤ ~500 by the
reference's own guidance, so V² is tiny) and the whole batch reduces on
device inside the jitted eval step.

Eligibility is decided on host, statically per modality: numeric vocabulary
and sequence length ≥ (1 if percent else 2)
(reference: training_utils.py:255-257).
"""

from __future__ import annotations

import numbers
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ModalityMetricSpec:
    """Static per-modality metric configuration + sign tables."""

    eligible: bool
    is_percent: bool
    # percent: (V,) sign of each token value; value-data: (V, V) sign of
    # vocab[cur] - vocab[prev] indexed [prev, cur]. None when ineligible.
    sign_table: Optional[np.ndarray]

    @classmethod
    def build(
        cls, vocab: Sequence, is_percent: bool, block_size: int
    ) -> "ModalityMetricSpec":
        numeric = all(isinstance(v, numbers.Number) for v in vocab)
        min_seq_len = 1 if is_percent else 2
        if not numeric or block_size < min_seq_len:
            return cls(eligible=False, is_percent=is_percent, sign_table=None)
        vals = np.asarray([float(v) for v in vocab])
        if is_percent:
            table = np.sign(vals).astype(np.int8)
        else:
            table = np.sign(vals[None, :] - vals[:, None]).astype(np.int8)
        return cls(eligible=True, is_percent=is_percent, sign_table=table)


def batch_directional_metrics(
    logits_last: jax.Array,
    x_last: jax.Array,
    y_last: jax.Array,
    spec: ModalityMetricSpec,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Wins, losses, summed certainty for one modality's batch (jit-safe).

    logits_last: (B, V) last-position logits
    x_last: (B,) last input token (the 'previous value')
    y_last: (B,) last target token (the 'actual value')
    """
    table = jnp.asarray(spec.sign_table)
    pred_tok = jnp.argmax(logits_last, axis=-1)  # (B,)

    if spec.is_percent:
        pred_dir = table[pred_tok]
        actual_dir = table[y_last]
        dir_all = jnp.broadcast_to(table[None, :], logits_last.shape)  # (B, V)
    else:
        pred_dir = table[x_last, pred_tok]
        actual_dir = table[x_last, y_last]
        dir_all = table[x_last]  # (B, V)

    win = pred_dir == actual_dir
    wins = jnp.sum(win)
    losses = jnp.sum(~win)

    probs = jax.nn.softmax(logits_last, axis=-1)
    match = dir_all == pred_dir[:, None]
    certainty = jnp.sum(probs * match)

    return wins, losses, certainty


def build_metric_specs(
    vocabularies: Sequence[Sequence],
    is_percent_flags: Sequence[bool],
    block_size: int,
) -> List[ModalityMetricSpec]:
    return [
        ModalityMetricSpec.build(v, p, block_size)
        for v, p in zip(vocabularies, is_percent_flags)
    ]
