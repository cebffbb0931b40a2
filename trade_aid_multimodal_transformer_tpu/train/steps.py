"""Jitted training and evaluation steps.

The reference's hot loop does per-step host work (batch assembly, Python-level
loss bookkeeping; reference: main.py:598-652, training_utils.py:333-384).
Here a whole eval-interval's worth of training runs as ONE device program:
``lax.scan`` over steps with in-scan batch sampling from the device-resident
feed — the host only touches the loop at eval/checkpoint boundaries.

Optimizer: AdamW with torch's defaults — betas (0.9, 0.999), eps 1e-8,
weight_decay 0.01 applied to every parameter (reference: main.py:464 uses
``torch.optim.AdamW(m.parameters(), lr)`` which decays all params) — so
optimization trajectories are comparable.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.config import ModelConfig
from ..models.transformer import forward, total_loss
from ..sampling.feed import BatchFeed
from .metrics import ModalityMetricSpec, batch_directional_metrics


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    """AdamW matching torch.optim.AdamW defaults (reference: main.py:464)."""
    return optax.adamw(
        learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01
    )


class EvalStats(NamedTuple):
    """Accumulated over one evaluation pass (eval_iters batches)."""

    mean_loss: jax.Array            # scalar: mean over iters of summed CE
    mean_losses: jax.Array          # (M,) per-modality mean CE
    wins: jax.Array                 # (M,) int
    losses: jax.Array               # (M,) int
    certainty: jax.Array            # (M,) float
    batches_processed: jax.Array    # (M,) int


class Trainer:
    """Owns the jitted step functions for one (model, feed, optimizer) run."""

    def __init__(
        self,
        cfg: ModelConfig,
        feed: BatchFeed,
        optimizer: optax.GradientTransformation,
        metric_specs: Sequence[ModalityMetricSpec],
        eval_iters: int,
        batch_constraint=None,
    ):
        self.cfg = cfg
        self.feed = feed
        self.optimizer = optimizer
        self.metric_specs = list(metric_specs)
        self.eval_iters = eval_iters
        # Optional sharding annotation applied to sampled batches so XLA
        # distributes the per-step compute across a mesh (parallel/).
        self.batch_constraint = batch_constraint or (lambda x: x)

        self._train_chunk = jax.jit(
            self._train_chunk_impl, static_argnames=("n_steps",), donate_argnums=(0, 1)
        )
        self._eval_pass = jax.jit(self._eval_pass_impl, static_argnames=("split",))

    # ------------------------------------------------------------- training

    def _train_chunk_impl(self, params, opt_state, key, n_steps: int):
        """n_steps fused optimization steps, batches drawn in-scan."""

        def body(carry, step_key):
            params, opt_state = carry
            k_batch, k_drop = jax.random.split(step_key)
            xb, yb = self.feed._sample_impl(k_batch, split="train", augment=True)
            xb, yb = self.batch_constraint(xb), self.batch_constraint(yb)
            (loss, losses), grads = jax.value_and_grad(total_loss, has_aux=True)(
                params, self.cfg, xb, yb, k_drop, True
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        keys = jax.random.split(key, n_steps)
        (params, opt_state), step_losses = jax.lax.scan(body, (params, opt_state), keys)
        return params, opt_state, step_losses

    def train_chunk(self, params, opt_state, key, n_steps: int):
        """Run n_steps training steps on device; returns per-step losses."""
        return self._train_chunk(params, opt_state, key, n_steps=n_steps)

    def train_step(self, params, opt_state, key):
        """Single training step (convenience; same compiled path, n=1)."""
        params, opt_state, losses = self._train_chunk(params, opt_state, key, n_steps=1)
        return params, opt_state, losses[0]

    # ------------------------------------------------------------ evaluation

    def _eval_pass_impl(self, params, key, split: str) -> EvalStats:
        """eval_iters evaluation batches, fused into one device program.

        Matches reference estimate_loss's inner loop
        (training_utils.py:418-454): batches drawn without augmentation,
        summed CE per batch, directional metrics accumulated per modality.
        """
        M = self.cfg.num_modalities

        def body(carry, step_key):
            loss_sum, losses_sum, wins, losses_n, cert = carry
            xb, yb = self.feed._sample_impl(step_key, split=split, augment=False)
            xb, yb = self.batch_constraint(xb), self.batch_constraint(yb)
            logits_list, ce_list = forward(params, self.cfg, xb, yb, train=False)
            ce = jnp.stack(ce_list)
            loss_sum = loss_sum + ce.sum()
            losses_sum = losses_sum + ce

            new_w, new_l, new_c = [], [], []
            for m in range(M):
                spec = self.metric_specs[m]
                if spec.eligible:
                    w, l, c = batch_directional_metrics(
                        logits_list[m][:, -1, :], xb[m][:, -1], yb[m][:, -1], spec
                    )
                else:
                    w = jnp.asarray(0); l = jnp.asarray(0); c = jnp.asarray(0.0)
                new_w.append(wins[m] + w)
                new_l.append(losses_n[m] + l)
                new_c.append(cert[m] + c)
            return (
                loss_sum,
                losses_sum,
                jnp.stack(new_w),
                jnp.stack(new_l),
                jnp.stack(new_c),
            ), None

        init = (
            jnp.asarray(0.0),
            jnp.zeros((M,)),
            jnp.zeros((M,), jnp.int32),
            jnp.zeros((M,), jnp.int32),
            jnp.zeros((M,)),
        )
        keys = jax.random.split(key, self.eval_iters)
        (loss_sum, losses_sum, wins, losses_n, cert), _ = jax.lax.scan(body, init, keys)

        processed = jnp.asarray(
            [self.eval_iters if s.eligible else 0 for s in self.metric_specs],
            jnp.int32,
        )
        n = float(self.eval_iters)
        return EvalStats(
            mean_loss=loss_sum / n,
            mean_losses=losses_sum / n,
            wins=wins,
            losses=losses_n,
            certainty=cert,
            batches_processed=processed,
        )

    def eval_pass(self, params, key, split: str) -> EvalStats:
        return self._eval_pass(params, key, split=split)
