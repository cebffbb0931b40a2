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
import numpy as np
import optax

from ..models.config import ModelConfig
from ..models.transformer import forward, total_loss
from ..sampling.feed import BatchFeed
from .metrics import ModalityMetricSpec, batch_directional_metrics


def build_lr_schedule(learning_rate: float, spec: Optional[Dict[str, Any]]):
    """Resolve ``tpu_options.lr_schedule`` into an optax schedule.

    ``None`` (default) returns the constant ``learning_rate`` — the
    reference's behavior (its torch AdamW never changes lr,
    reference: main.py:464). A dict builds linear warmup followed by decay:

    - type: 'cosine' (default) | 'linear' | 'constant' (warmup then flat)
    - warmup_steps: linear 0 → lr ramp length (default 0)
    - decay_steps: total schedule length INCLUDING warmup (the runner
      defaults it to max_iters)
    - min_lr_ratio: floor as a fraction of lr (default 0.0)
    """
    if not spec:
        return learning_rate
    typ = spec.get("type", "cosine")
    warmup = int(spec.get("warmup_steps", 0))
    decay = int(spec["decay_steps"])
    end = learning_rate * float(spec.get("min_lr_ratio", 0.0))
    if typ == "cosine":
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup else learning_rate,
            peak_value=learning_rate, warmup_steps=warmup,
            decay_steps=decay, end_value=end,
        )
    pieces = []
    if warmup:
        pieces.append(optax.linear_schedule(0.0, learning_rate, warmup))
    if typ == "linear":
        pieces.append(
            optax.linear_schedule(learning_rate, end, max(decay - warmup, 1))
        )
    elif typ == "constant":
        pieces.append(optax.constant_schedule(learning_rate))
    else:
        raise ValueError(f"unknown lr_schedule type {typ!r}")
    if len(pieces) == 1:
        return pieces[0]
    return optax.join_schedules(pieces, [warmup])


def _adamw_lowmem(
    learning_rate,
    b1: float,
    b2: float,
    eps: float,
    weight_decay: float,
    mu_dtype,
    nu_dtype,
) -> optax.GradientTransformation:
    """AdamW with independently reduced-precision moment STORAGE.

    optax.adamw only supports ``mu_dtype``; this clone additionally stores
    the second moment in ``nu_dtype``. All update MATH runs in f32 — moments
    are upcast on read and downcast on write, so reduced precision affects
    only what persists between steps (bf16 keeps f32's full exponent range,
    so nu's dynamic range is preserved; only mantissa rounds). With both
    dtypes f32 this reproduces optax.adamw exactly
    (tests/test_train.py::TestLowmemAdam).
    """

    def init(params):
        mu = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=mu_dtype), params)
        nu = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=nu_dtype), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update(grads, state, params):
        if params is None:
            raise ValueError("adamw requires params (weight decay)")
        count = optax.safe_int32_increment(state.count)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        # Schedules evaluate at the pre-increment count (optax's
        # scale_by_schedule convention), so trajectories match optax.adamw
        # given the same schedule callable.
        lr_t = (
            learning_rate(state.count)
            if callable(learning_rate) else learning_rate
        )

        def upd(g, m, v, p):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g32)
            u = (m32 / c1) / (jnp.sqrt(v32 / c2) + eps)
            u = u + weight_decay * p.astype(jnp.float32)
            return (
                (-lr_t * u).astype(p.dtype),
                m32.astype(m.dtype),
                v32.astype(v.dtype),
            )

        out = jax.tree.map(upd, grads, state.mu, state.nu, params)
        updates = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
        mu = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree.map(lambda t: t[2], out, is_leaf=lambda t: isinstance(t, tuple))
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def make_optimizer(
    learning_rate: float,
    moment_dtype: str = "float32",
    nu_dtype: str = "float32",
    lr_schedule: Optional[Dict[str, Any]] = None,
    with_spec: bool = False,
    params_dtype: str = "float32",
):
    """AdamW matching torch.optim.AdamW defaults (reference: main.py:464).

    ``moment_dtype='bfloat16'`` stores the first moment (mu) in bf16 —
    AdamW's per-step HBM traffic is dominated by reading/writing p/g/mu/nu,
    and the step is bandwidth-bound at production scale (measured +3%
    steps/s, loss trajectory unchanged at print precision).
    ``nu_dtype='bfloat16'`` additionally stores the second moment in bf16
    (config surface: tpu_options.adam_nu_dtype). Update math always runs
    in f32.

    Measured (production 4-mod config, v5e): in f32 compute the step is
    op-overhead-bound, so bf16 nu's extra casts actually cost ~15% — use it
    only WITH compute_dtype bfloat16, where the combination measures the
    best production rate (66.8 vs 62.5 steps/s for bf16 compute + bf16 mu
    alone, vs 57 for all-f32).

    ``lr_schedule`` (tpu_options.lr_schedule): optional warmup+decay spec
    (build_lr_schedule). None keeps the reference's constant lr.

    ``with_spec=True`` additionally returns the AdamWSpec describing the
    transformation, which Trainer uses for the fused flat-state update.
    """
    lr = build_lr_schedule(learning_rate, lr_schedule)
    mu_dtype = jnp.bfloat16 if moment_dtype == "bfloat16" else jnp.float32
    spec = AdamWSpec(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01,
        mu_dtype=mu_dtype,
        nu_dtype=jnp.bfloat16 if nu_dtype == "bfloat16" else jnp.float32,
    )
    if nu_dtype == "bfloat16" or params_dtype == "bfloat16":
        # bf16 master params must route through the lowmem clone: its update
        # MATH is always f32 (params/moments upcast on read), so only the
        # bf16 STORAGE rounds — optax.adamw with bf16 param leaves would run
        # the whole update in bf16
        opt = _adamw_lowmem(
            lr, b1=spec.b1, b2=spec.b2, eps=spec.eps,
            weight_decay=spec.weight_decay,
            mu_dtype=spec.mu_dtype, nu_dtype=spec.nu_dtype,
        )
    else:
        opt = optax.adamw(
            lr, b1=spec.b1, b2=spec.b2, eps=spec.eps,
            weight_decay=spec.weight_decay,
            mu_dtype=jnp.bfloat16 if moment_dtype == "bfloat16" else None,
        )
    return (opt, spec) if with_spec else opt


class AdamWSpec(NamedTuple):
    """The AdamW hyperparameters behind a make_optimizer transformation.

    Passing this to ``Trainer`` enables the fused flat-state update: the
    train chunk's scan then carries THREE flat vectors (params / mu / nu)
    plus the step count instead of ~185 per-leaf buffers. The update math
    is identical (same expressions as optax.adamw / _adamw_lowmem per
    moment dtype) and the public API is unchanged — pytree params and
    standard optax state in and out, flattened only inside the jitted
    chunk.

    MEASURED NEGATIVE on v5e (kept as an opt-in knob; 'auto' resolves to
    off): production 4-mod config 13.47 vs 10.84 ms/step device-true, demo
    config 7.3k vs 8.1k steps/s. The per-step gradient concatenation
    (1.56 ms for the 211 MB f32 grad tree — ~3x the pure-traffic floor on
    a 185-operand concatenate) plus the param unflatten the matmuls force
    (~0.9 ms of reshape/slice materialization) outweigh the carry-rotation
    copies removed (~0.35 ms — trace-measured, smaller than the earlier
    wall-clock estimate). See TECHNICAL_NOTES "Flat-state train carry".
    """

    learning_rate: Any              # float or optax schedule callable
    b1: float
    b2: float
    eps: float
    weight_decay: float
    mu_dtype: Any
    nu_dtype: Any


def _find_adam_state(opt_state):
    """Locate the ScaleByAdamState inside an (arbitrarily nested) optax
    chain state. Returns None if absent."""
    if isinstance(opt_state, optax.ScaleByAdamState):
        return opt_state
    if isinstance(opt_state, (tuple, list)):
        for s in opt_state:
            found = _find_adam_state(s)
            if found is not None:
                return found
    return None


def _replace_adam_state(opt_state, new_state):
    """Return opt_state with its ScaleByAdamState swapped for new_state,
    preserving the surrounding chain structure (and namedtuple types).
    Any ScaleByScheduleState in the chain is advanced to the new adam
    count — the fused path steps the schedule itself (lr_fn(count + i)),
    so without this the standard-optimizer state a checkpoint round-trips
    would restart the schedule (warmup LR mid-run) when fused_update is
    toggled off across a resume (advisor r4)."""
    if isinstance(opt_state, optax.ScaleByAdamState):
        return new_state
    if isinstance(opt_state, optax.ScaleByScheduleState):
        return optax.ScaleByScheduleState(count=new_state.count)
    if isinstance(opt_state, tuple):
        rebuilt = tuple(_replace_adam_state(s, new_state) for s in opt_state)
        if hasattr(opt_state, "_fields"):  # namedtuple
            return type(opt_state)(*rebuilt)
        return rebuilt
    if isinstance(opt_state, list):
        return [_replace_adam_state(s, new_state) for s in opt_state]
    return opt_state


def resolve_rng_impl(impl: str) -> str:
    """'auto' → hardware RngBitGenerator on TPU, threefry elsewhere.

    Threefry (JAX's default) computes every random bit on the VPU — measured
    at ~40% of the production-config step time (dropout masks + batch
    augmentation). The 'rbg' implementation keeps threefry's split semantics
    but generates bits with the TPU's native RNG instruction. CPU keeps
    threefry so test vectors are stable.
    """
    if impl == "auto":
        try:
            return "rbg" if jax.default_backend() == "tpu" else "threefry2x32"
        except Exception:  # pragma: no cover
            return "threefry2x32"
    return impl


def to_impl_key(key: jax.Array, impl: str) -> jax.Array:
    """Convert a raw uint32 PRNGKey to a typed key of the requested impl.

    Already-typed keys pass through (the caller chose an impl explicitly).
    The mapping raw→rbg is deterministic: the 2-word threefry key is tiled
    to the 4-word rbg key state.
    """
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key
    impl = resolve_rng_impl(impl)
    if impl == "threefry2x32":
        return jax.random.wrap_key_data(key, impl=impl)
    data = jnp.tile(key, 2)[:4].astype(jnp.uint32)
    return jax.random.wrap_key_data(data, impl=impl)


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
        rng_impl: str = "auto",
        scope=None,
        scan_unroll: int = 1,
        loss_fn=None,
        grad_accum: int = 1,
        adamw_spec: Optional[AdamWSpec] = None,
    ):
        self.cfg = cfg
        self.feed = feed
        self.optimizer = optimizer
        self.metric_specs = list(metric_specs)
        self.eval_iters = eval_iters
        self.rng_impl = rng_impl
        # The differentiated objective: (params, cfg, xb, yb, rng, train) ->
        # (loss, per-modality losses). Default is the plain forward's
        # total_loss; parallel/trainer substitutes pipeline_total_loss when
        # the mesh has a 'pipe' axis.
        self.loss_fn = loss_fn or total_loss
        # Optional sharding annotation applied to sampled batches so XLA
        # distributes the per-step compute across a mesh (parallel/).
        self.batch_constraint = batch_constraint or (lambda x: x)
        # Optional trace-time scope (a zero-arg context-manager factory)
        # entered INSIDE the traced functions, so every (re)trace sees it —
        # e.g. ops.attention.context_parallel_scope for context parallelism.
        import contextlib

        self.scope = scope or contextlib.nullcontext
        # lax.scan unroll factor for the fused train chunk. Semantically a
        # no-op; at SMALL model scale the per-iteration scan overhead is a
        # real fraction of the step, and unrolling amortizes it (measured on
        # v5e, demo config: 6.2k -> 7.1k steps/s at unroll=4). Program size
        # (and compile time) scales with the factor — keep 1 for big models,
        # where within-step work dominates. Config: tpu_options.scan_unroll.
        self.scan_unroll = max(1, int(scan_unroll))
        # Gradient accumulation (tpu_options.grad_accum): each optimizer
        # step averages gradients over this many independent microbatch
        # draws of batch_size sequences — effective batch = grad_accum x
        # batch_size without the activation memory of one giant batch.
        # 1 (default) = reference semantics, one draw per step.
        self.grad_accum = max(1, int(grad_accum))
        # Fused flat-state update (see AdamWSpec): carries flat param/mu/nu
        # vectors through the chunk scan instead of the ~185-leaf pytree.
        # Only sound when the train state lives unsharded on the devices
        # (single chip or replicated), so parallel/ builds trainers without
        # a spec.
        self.adamw_spec = adamw_spec

        self._train_chunk = jax.jit(
            self._train_chunk_impl, static_argnames=("n_steps",), donate_argnums=(0, 1)
        )
        self._eval_pass = jax.jit(self._eval_pass_impl, static_argnames=("split",))

    # ------------------------------------------------------------- training

    def _loss_and_grads(self, params, step_key):
        """One optimization step's objective: loss + grads at params, with
        the grad_accum microbatch walk when configured."""

        def grad_of(params, micro_key):
            k_batch, k_drop = jax.random.split(micro_key)
            xb, yb = self.feed._sample_impl(k_batch, split="train", augment=True)
            xb, yb = self.batch_constraint(xb), self.batch_constraint(yb)
            (loss, losses), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                params, self.cfg, xb, yb, k_drop, True
            )
            return loss, grads

        if self.grad_accum == 1:
            return grad_of(params, step_key)

        # Mean loss/grads over grad_accum independent microbatches —
        # one big-batch step at batch_size memory. The microbatch
        # walk is a scan so the program stays one accumulator deep.
        def micro(acc, mk):
            loss_m, grads_m = grad_of(params, mk)
            acc_l, acc_g = acc
            return (acc_l + loss_m,
                    jax.tree.map(jnp.add, acc_g, grads_m)), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        (loss_sum, grad_sum), _ = jax.lax.scan(
            micro, (jnp.asarray(0.0), zeros),
            jax.random.split(step_key, self.grad_accum),
        )
        inv = 1.0 / self.grad_accum
        loss = loss_sum * inv
        grads = jax.tree.map(
            lambda g: (g.astype(jnp.float32) * inv).astype(g.dtype),
            grad_sum,
        )
        return loss, grads

    def _train_chunk_impl(self, params, opt_state, key, n_steps: int):
        """n_steps fused optimization steps, batches drawn in-scan."""
        key = to_impl_key(key, self.rng_impl)

        if self.adamw_spec is not None and _find_adam_state(opt_state) is not None:
            leaves = jax.tree.leaves(params)
            if len({l.dtype for l in leaves}) == 1:
                return self._train_chunk_fused(params, opt_state, key, n_steps)

        def body(carry, step_key):
            params, opt_state = carry
            loss, grads = self._loss_and_grads(params, step_key)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        with self.scope():
            keys = jax.random.split(key, n_steps)
            unroll = self.scan_unroll if n_steps % self.scan_unroll == 0 else 1
            (params, opt_state), step_losses = jax.lax.scan(
                body, (params, opt_state), keys, unroll=unroll
            )
        return params, opt_state, step_losses

    def _train_chunk_fused(self, params, opt_state, key, n_steps: int):
        """n_steps fused steps with the FLAT train state (AdamWSpec).

        The scan carry is (theta, mu, nu, count) — three contiguous vectors
        plus the step counter — instead of the per-leaf pytree, and the
        AdamW update becomes three fused elementwise passes instead of 185
        per-leaf fusions. Update math matches the per-leaf path exactly
        per moment-dtype variant (tests/test_train.py::TestFusedUpdate).

        Opt-in only (tpu_options.fused_update: true): device-true traces
        show the per-step grad concatenation and the param unflatten the
        matmul operands force cost MORE than the carry-rotation copies this
        removes (see AdamWSpec docstring for the v5e numbers).
        """
        spec = self.adamw_spec
        leaves, treedef = jax.tree.flatten(params)
        shapes = [l.shape for l in leaves]
        sizes = [int(np.prod(s)) for s in shapes]
        offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)

        def flatten_tree(tree):
            return jnp.concatenate(
                [x.reshape(-1) for x in jax.tree.leaves(tree)]
            )

        def unflatten(flat):
            return jax.tree.unflatten(
                treedef,
                [
                    jax.lax.slice_in_dim(
                        flat, int(o), int(o) + s
                    ).reshape(sh)
                    for o, s, sh in zip(offsets[:-1], sizes, shapes)
                ],
            )

        adam = _find_adam_state(opt_state)
        theta = flatten_tree(params)
        mu = flatten_tree(adam.mu)
        nu = flatten_tree(adam.nu)
        b1, b2 = spec.b1, spec.b2

        def body(carry, step_key):
            theta, mu, nu, count = carry
            p = unflatten(theta)
            loss, grads = self._loss_and_grads(p, step_key)
            g32 = flatten_tree(grads).astype(jnp.float32)
            # schedules evaluate at the pre-increment count (optax
            # scale_by_schedule convention)
            lr_t = (
                spec.learning_rate(count)
                if callable(spec.learning_rate) else spec.learning_rate
            )
            count = optax.safe_int32_increment(count)
            t = count.astype(jnp.float32)
            c1 = 1.0 - b1 ** t
            c2 = 1.0 - b2 ** t
            if spec.nu_dtype == jnp.bfloat16:
                # _adamw_lowmem semantics: moments upcast to f32 BEFORE the
                # decay product (update math fully in f32)
                mu32 = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g32
                nu32 = (
                    b2 * nu.astype(jnp.float32) + (1.0 - b2) * jnp.square(g32)
                )
            else:
                # optax.adamw semantics: the decay product runs in the
                # moment's storage dtype (a weak-typed scalar times bf16
                # stays bf16), then promotes in the add — reproducing
                # optax.update_moment exactly for every mu_dtype
                mu32 = (1.0 - b1) * g32 + b1 * mu
                nu32 = (1.0 - b2) * jnp.square(g32) + b2 * nu
            u = (mu32 / c1) / (jnp.sqrt(nu32 / c2) + spec.eps)
            u = u + spec.weight_decay * theta
            theta = theta - lr_t * u
            return (
                theta,
                mu32.astype(spec.mu_dtype),
                nu32.astype(spec.nu_dtype),
                count,
            ), loss

        with self.scope():
            keys = jax.random.split(key, n_steps)
            unroll = self.scan_unroll if n_steps % self.scan_unroll == 0 else 1
            (theta, mu, nu, count), step_losses = jax.lax.scan(
                body, (theta, mu, nu, adam.count), keys, unroll=unroll
            )

        params = unflatten(theta)
        new_adam = optax.ScaleByAdamState(
            count=count, mu=unflatten(mu), nu=unflatten(nu)
        )
        return params, _replace_adam_state(opt_state, new_adam), step_losses

    @staticmethod
    def _portable_key(key):
        """Multi-host: a raw PRNGKey is a process-LOCAL device array, which
        a process-spanning jit rejects as an argument. Hand it over as host
        numpy instead — identical on every process, so jit treats it as
        replicated. Typed keys and single-process runs pass through."""
        if (
            jax.process_count() > 1
            and isinstance(key, jax.Array)
            and not jnp.issubdtype(key.dtype, jax.dtypes.prng_key)
        ):
            return np.asarray(jax.device_get(key))
        return key

    def train_chunk(self, params, opt_state, key, n_steps: int):
        """Run n_steps training steps on device; returns per-step losses."""
        return self._train_chunk(
            params, opt_state, self._portable_key(key), n_steps=n_steps
        )

    def train_step(self, params, opt_state, key):
        """Single training step (convenience; same compiled path, n=1)."""
        params, opt_state, losses = self.train_chunk(params, opt_state, key, 1)
        return params, opt_state, losses[0]

    # ------------------------------------------------------------ evaluation

    def _eval_pass_impl(self, params, key, split: str) -> EvalStats:
        """eval_iters evaluation batches, fused into one device program.

        Matches reference estimate_loss's inner loop
        (training_utils.py:418-454): batches drawn without augmentation,
        summed CE per batch, directional metrics accumulated per modality.
        """
        M = self.cfg.num_modalities
        key = to_impl_key(key, self.rng_impl)

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
        with self.scope():
            keys = jax.random.split(key, self.eval_iters)
            (loss_sum, losses_sum, wins, losses_n, cert), _ = jax.lax.scan(
                body, init, keys
            )

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
        return self._eval_pass(params, self._portable_key(key), split=split)
