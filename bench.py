"""Headline benchmark: train steps/sec on the reference's demo config.

Baseline: the reference (torch, CPU) measures 32.6 steps/s on this exact
configuration — 2 modalities (ranged prices w/ cross-attention + binned
percent changes), B=4, T=4, n_embd=32, n_head=4, n_layer=2, dropout 0.1
(BASELINE.md). Here the same model trains as fused device programs with
in-scan batch sampling.

The demo and production runs are built FROM the shipped YAML configs —
hyperparameters from examples/demo_config.yaml / production_config.yaml
(including tpu_options like scan_unroll), modality structure and synthetic
vocab sizing from the input-schema templates — so the bench and the configs
cannot drift. Additional metrics: tokenization throughput, production-scale
4-modality steps/s with an analytic-FLOPs MFU
(models/param_count.training_flops_per_step counts the actual factored
projections, cross-attention, and vocab heads), long-context (T=1024 /
T=4096) training rates where the Pallas flash kernels carry the step, and a
run_training-level row so the shipped entry path itself is timed.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""

import contextlib
import dataclasses
import io
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
os.chdir(REPO)  # YAML-declared data paths are repo-relative

import numpy as np

import jax

from trade_aid_multimodal_transformer_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

REFERENCE_STEPS_PER_SEC = 32.6  # BASELINE.md: demo config, torch CPU
REFERENCE_TOKENIZE_M_ROWS_PER_SEC = 7.2  # BASELINE.md: numerical_representation


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _backend_watchdog(timeout_s: float = 180.0):
    """Fail loudly instead of hanging forever if the TPU tunnel is dead.

    Initializing a dead axon/TPU plugin blocks inside C (observed during an
    outage: jax.devices() never returns, even SIGTERM needs the process
    group). A daemon timer that hard-exits with a parseable JSON error line
    keeps the driver's bench step bounded. Disarmed as soon as the backend
    answers."""
    import threading

    done = threading.Event()

    def fire():
        if done.wait(timeout_s):
            return
        print(json.dumps({
            "metric": "train_steps_per_sec",
            "value": None,
            "unit": "steps/s",
            "vs_baseline": None,
            "error": f"backend init exceeded {timeout_s:.0f}s "
                     "(TPU tunnel unreachable)",
        }), flush=True)
        os._exit(3)

    threading.Thread(target=fire, daemon=True).start()
    return done


def dsync(x):
    """Force true device completion: device→host copy of one element.

    Under the tunneled TPU runtime `jax.block_until_ready` can return before
    the device has drained its queue; a D2H transfer of the last output
    cannot (the chip executes in order)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
    return x


def _load_yaml_config(config_path: Path, schemas_path: Path = None):
    """Load a shipped YAML config (and optionally its input schemas) through
    the real config subsystem — one source of truth with examples/."""
    from trade_aid_multimodal_transformer_tpu.config.system import ConfigManager

    cm = ConfigManager(config_dir=REPO)
    sc = cm.load_system_config(config_path)
    schemas = None
    if schemas_path is not None:
        schemas = list(cm.load_input_schemas(schemas_path).schemas)
    return sc, schemas


def build_demo_run():
    """The demo model/trainer exactly as examples/demo_*.yaml declare it."""
    from trade_aid_multimodal_transformer_tpu.data.ingest import load_and_process_modality
    from trade_aid_multimodal_transformer_tpu.data.vocab import (
        create_train_val_datasets,
        numerical_representation,
    )
    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
    from trade_aid_multimodal_transformer_tpu.sampling.feed import resolve_rand_sizes
    from trade_aid_multimodal_transformer_tpu.train.metrics import build_metric_specs
    from trade_aid_multimodal_transformer_tpu.train.steps import Trainer, make_optimizer

    sc, schemas = _load_yaml_config(
        REPO / "examples" / "demo_config.yaml",
        REPO / "examples" / "demo_input_schemas.yaml",
    )
    mparams = [s.to_legacy_list() for s in schemas]

    trains, vals, vocabs, mods = [], [], [], []
    with contextlib.redirect_stdout(io.StringIO()):
        for s in schemas:
            md = load_and_process_modality(s)
            ids, vocab = numerical_representation(md.data)
            tr, va = create_train_val_datasets(
                ids, sc.validation_size, 0, md.file_lengths
            )
            trains.append(tr)
            vals.append(va)
            vocabs.append(vocab)
            mods.append(md)

    sc_dict = dataclasses.asdict(sc)
    cfg = ModelConfig.from_modality_params(
        sc_dict, [len(v) for v in vocabs], mparams
    )
    feed = BatchFeed(
        trains, vals, mods[0].file_lengths, cfg.block_size, sc.batch_size,
        is_percents=any(m.is_percent for m in mods),
        rand_sizes=resolve_rand_sizes(mparams),
        vocab_sizes=[len(v) for v in vocabs],
    )
    specs = build_metric_specs(vocabs, [m.is_percent for m in mods], cfg.block_size)
    optimizer, adamw_spec = make_optimizer(
        sc.learning_rate, sc.adam_moment_dtype, sc.adam_nu_dtype,
        with_spec=True,
    )
    # scan_unroll comes from the YAML (demo_config.yaml ships 4: at demo
    # scale the per-iteration scan overhead is a real fraction of the
    # ~160us step, and unrolling measures ~15% more steps/s)
    trainer = Trainer(cfg, feed, optimizer, specs, sc.eval_iters,
                      scan_unroll=sc.scan_unroll,
                      adamw_spec=adamw_spec if sc.fused_update is True else None)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)
    return trainer, params, opt_state


def bench_tokenize():
    """BASELINE.md row: numerical_representation at 1M rows (host path).

    Returns (median, min, max) M rows/s over 7 trials. This is a 1-CPU box
    shared with the TPU tunnel: best-of-3 swung 20.4 -> 15.55 M rows/s
    between rounds with no code change (advisor r4), so host rows now carry
    their spread and the headline is the median."""
    from trade_aid_multimodal_transformer_tpu.data.vocab import numerical_representation

    rng = np.random.default_rng(0)
    prices = rng.uniform(10, 500, 1_000_000).round(2).tolist()
    rates = []
    for _ in range(7):
        t0 = time.perf_counter()
        numerical_representation(prices)
        rates.append(1.0 / (time.perf_counter() - t0))
    return float(np.median(rates)), min(rates), max(rates)


def _synthetic_trainer(cfg, sc, batch_size, n_rows=1_000_000, rand_sizes=None):
    """Trainer over synthetic tokenized data at a given scale (the
    production/flagship data shape the reference cannot reach)."""
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
    from trade_aid_multimodal_transformer_tpu.train.metrics import build_metric_specs
    from trade_aid_multimodal_transformer_tpu.train.steps import Trainer, make_optimizer

    rng = np.random.default_rng(0)
    n_val = n_rows // 10
    train = [rng.integers(0, v, n_rows - n_val).astype(np.int32) for v in cfg.vocab_sizes]
    val = [rng.integers(0, v, n_val).astype(np.int32) for v in cfg.vocab_sizes]
    feed = BatchFeed(
        train, val, [n_rows], cfg.block_size, batch_size,
        is_percents=False,
        rand_sizes=rand_sizes or [None] * len(cfg.vocab_sizes),
        vocab_sizes=list(cfg.vocab_sizes),
    )
    specs = build_metric_specs(
        [np.linspace(-1, 1, v).tolist() for v in cfg.vocab_sizes],
        [False] * len(cfg.vocab_sizes), cfg.block_size,
    )
    optimizer, adamw_spec = make_optimizer(
        sc.learning_rate, sc.adam_moment_dtype, sc.adam_nu_dtype,
        with_spec=True,
    )
    trainer = Trainer(cfg, feed, optimizer, specs, sc.eval_iters,
                      rng_impl=sc.rng_impl, scan_unroll=sc.scan_unroll,
                      adamw_spec=adamw_spec if sc.fused_update is True else None)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)
    return trainer, params, opt_state


def _time_steps(trainer, params, opt_state, chunk, trials=2):
    """Best steps/s over `trials` timed chunks (after a compile chunk)."""
    params, opt_state, l = trainer.train_chunk(
        params, opt_state, jax.random.PRNGKey(0), chunk
    )
    dsync(l)
    best = 0.0
    for trial in range(trials):
        t0 = time.perf_counter()
        params, opt_state, l = trainer.train_chunk(
            params, opt_state, jax.random.PRNGKey(trial + 1), chunk
        )
        dsync(l)
        best = max(best, chunk / (time.perf_counter() - t0))
    return best


def _production_schemas_raw():
    """The production input-schema template, loaded raw (its `path` points at
    the user's data folder, which doesn't exist here — synthetic data stands
    in, sized by the template's own `bench_vocab_size` annotations)."""
    import yaml

    with open(REPO / "examples" / "production_input_schemas.yaml") as f:
        return yaml.safe_load(f)["modalities"]


def _production_cfg_sc(block_size=None, attn_impl=None):
    """Flagship 4-modality model: hyperparameters from
    examples/production_config.yaml, modality structure (vocab scale,
    cross-attention flags, randomness sizes) from
    examples/production_input_schemas.yaml — both YAMLs are the single
    source of truth."""
    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig

    sc, _ = _load_yaml_config(REPO / "examples" / "production_config.yaml")
    mods = _production_schemas_raw()
    cfg = ModelConfig(
        vocab_sizes=tuple(m["bench_vocab_size"] for m in mods),
        cross_attention=tuple(bool(m.get("cross_attention")) for m in mods),
        n_embd=sc.n_embd, n_head=sc.n_head, n_layer=sc.n_layer,
        block_size=block_size or sc.block_size, dropout=sc.dropout,
        compute_dtype=sc.compute_dtype,
        attn_impl=attn_impl or sc.attn_impl,
        remat=sc.remat,
    )
    rand_sizes = [m.get("randomness_size") for m in mods]
    return cfg, sc, rand_sizes


def bench_production():
    """4-modality production config at 1M rows — the scale the reference
    cannot reach (~5.7 s/step of host batching alone, SURVEY §6). Settings
    come from examples/production_config.yaml (bf16 compute + bf16 Adam
    moments — the shipped recommendation)."""
    from trade_aid_multimodal_transformer_tpu.models.param_count import (
        training_flops_per_step,
    )

    cfg, sc, rand_sizes = _production_cfg_sc()
    trainer, params, opt_state = _synthetic_trainer(
        cfg, sc, sc.batch_size, rand_sizes=rand_sizes
    )
    # chunk matches the runner's real operating mode: training executes
    # eval_interval-sized fused chunks (production eval_interval: 500,
    # examples/production_config.yaml:24), so the ~25 ms tunnel dispatch
    # amortizes over hundreds of steps there; 250 keeps the bench honest
    # to that regime without a long runtime.
    sps = _time_steps(trainer, params, opt_state, chunk=250)
    flops = training_flops_per_step(cfg, sc.batch_size)
    mfu_pct = sps * flops / 197e12 * 100  # v5e bf16 peak 197 TF/s
    return sps, mfu_pct, flops


def bench_long_context():
    """Flagship model at long block_size — the regime the Pallas flash
    kernels exist for (the reference materializes dense (T, T) affinities,
    reference: model.py:55-72). Returns steps/s at T=1024 and T=4096 plus
    the op-level flash-vs-dense fwd+bwd speedup at T=4096."""
    from trade_aid_multimodal_transformer_tpu.ops.attention import causal_attention

    from trade_aid_multimodal_transformer_tpu.models.param_count import (
        training_flops_per_step,
    )

    results = {}
    for t, batch in ((1024, 8), (4096, 4)):
        cfg, sc, _rs = _production_cfg_sc(block_size=t)
        trainer, params, opt_state = _synthetic_trainer(cfg, sc, batch)
        t0 = time.perf_counter()
        sps = _time_steps(trainer, params, opt_state, chunk=10)
        mfu = sps * training_flops_per_step(cfg, batch) / 197e12 * 100
        log(f"long-context T={t} B={batch}: {sps:.1f} steps/s, "
            f"{mfu:.1f}% MFU (bench wall {time.perf_counter() - t0:.0f}s)")
        results[f"T{t}"] = sps
        results[f"mfu_T{t}"] = mfu

    # Op-level flash vs dense at T=4096 (bf16, flagship head shape). The
    # tunneled TPU adds ~25 ms of host dispatch per jitted call — enough to
    # drown a few-ms kernel difference — so each timed unit is ONE dispatch
    # of a lax.scan over REPS fwd+bwd applications chained through the carry
    # (the dq feeds the next q, so XLA cannot hoist or overlap iterations).
    if jax.default_backend() == "tpu":
        import jax.numpy as jnp

        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        shape = (4, 6, 4096, 64)
        q, k, v = (
            jax.random.normal(s, shape, jnp.bfloat16) for s in ks
        )
        REPS = 8

        def fwd_bwd(attn):
            g = jax.grad(
                lambda q, k, v: (
                    attn(q, k, v) ** 2
                ).sum().astype(jnp.float32),
                argnums=(0, 1, 2),
            )

            def body(qc, _):
                dq, dk, dv = g(qc, k, v)
                # renormalize so the chained carry cannot blow up/vanish
                qc = dq * jax.lax.rsqrt(jnp.mean(dq.astype(jnp.float32) ** 2) + 1e-6).astype(dq.dtype)
                return qc, ()

            f = jax.jit(lambda q: jax.lax.scan(body, q, (), length=REPS)[0])
            dsync(f(q))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                dsync(f(q))
                best = min(best, (time.perf_counter() - t0) / REPS)
            return best

        t_dense = fwd_bwd(
            lambda q, k, v: causal_attention(q, k, v, impl="jnp")
        )
        t_flash = fwd_bwd(
            lambda q, k, v: causal_attention(q, k, v, impl="pallas")
        )
        log(f"attention fwd+bwd T=4096 (scan-amortized): "
            f"dense {t_dense*1e3:.2f} ms, flash {t_flash*1e3:.2f} ms")
        results["flash_speedup"] = t_dense / t_flash

        # Ring (context-parallel) harness overhead on ONE chip: the same
        # fwd+bwd through ring_causal_attention_local under shard_map over a
        # 1-device mesh — explicit-lse merge machinery and the custom ring
        # VJP engaged, zero ppermute hops. The per-chunk core IS the same
        # Pallas flash kernel (parallel/ring_attention.py:29-32), so the
        # ratio vs plain flash isolates what the CP wrapper costs before
        # ICI hop traffic (which overlaps with compute) is added.
        import functools

        from jax.experimental.shard_map import shard_map
        from jax.sharding import Mesh, PartitionSpec as P

        from trade_aid_multimodal_transformer_tpu.parallel.ring_attention import (
            ring_causal_attention_local,
        )

        mesh = Mesh(np.array(jax.devices()[:1]), ("seq",))
        spec = P(None, None, "seq", None)
        ring = shard_map(
            functools.partial(
                ring_causal_attention_local, axis_name="seq", impl="pallas"
            ),
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            check_rep=False,
        )
        t_ring = fwd_bwd(ring)
        log(f"ring(P=1) fwd+bwd T=4096: {t_ring*1e3:.2f} ms "
            f"({(t_ring / t_flash - 1) * 100:+.1f}% vs plain flash)")
        results["ring_overhead_pct"] = (t_ring / t_flash - 1) * 100
    else:
        results["flash_speedup"] = None
        results["ring_overhead_pct"] = None
    return results


def bench_serve(kv_dtype=None, refresh=256):
    """KV-cached serving throughput at a 16x-longer context than the
    production block (T=1024): ``generate_serve`` in the steady
    chunked-refresh regime — the prompt fills the window, so every measured
    token is a cached single-position decode, with one (now flash-kerneled)
    prefill amortized per ``refresh`` tokens (models/cache.py).
    ``kv_dtype='int8'`` measures the quantized-cache variant (half the
    decode cache traffic — the ceiling itself moves).

    refresh=256 is the measured throughput/quality sweet spot (round-5
    sweep: 128/256/512 -> bf16 4970/6021/6420 and int8 5477/6998/7868
    tok/s; tools/serve_accuracy.py puts the context-band NLL penalty of
    256 within noise of 128 — see TECHNICAL_NOTES 'Serving refresh
    trade')."""
    import jax.numpy as jnp

    from trade_aid_multimodal_transformer_tpu.models.cache import generate_serve
    from trade_aid_multimodal_transformer_tpu.models.init import init_params

    S, B, new = 1024, 16, 512
    cfg, _sc, _rs = _production_cfg_sc(block_size=S)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(np.stack(
        [rng.integers(0, v, (B, S)) for v in cfg.vocab_sizes]
    ).astype(np.int32))
    key = jax.random.PRNGKey(1)
    run = lambda: generate_serve(
        params, cfg, prompt, key, new, refresh=refresh, kv_dtype=kv_dtype
    )
    dsync(run())
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        dsync(run())
        best = max(best, B * new / (time.perf_counter() - t0))
    return best


def bench_runner():
    """The shipped entry path itself: ``run_training`` on the demo config in
    a temp CWD — mesh resolution, feed construction, eval/log cadence and
    the runner's own chunking included — so a runner-level regression is
    driver-visible. max_iters is raised so the fused 100-step chunks
    amortize the ~25 ms tunnel dispatch; the reported rate is the runner's
    post-compile steady rate (StepTimer.steady_steps_per_sec)."""
    import shutil
    import tempfile

    from trade_aid_multimodal_transformer_tpu.config.accessors import (
        reset_config_cache,
    )
    from trade_aid_multimodal_transformer_tpu.config.compat import (
        reset_compatibility_layer,
    )
    from trade_aid_multimodal_transformer_tpu.train.runner import run_training

    import yaml

    cfg = yaml.safe_load((REPO / "examples" / "demo_config.yaml").read_text())
    # four same-shape 500-step chunks: the first pays the compile, the
    # steady rate comes from the cached repeats (the runner fuses a whole
    # eval interval per chunk, so eval_interval IS the chunk length).
    # Set programmatically — string replacement silently no-ops when the
    # demo config's values drift (advisor r4).
    cfg["training_parameters"]["max_iters"] = 2001
    cfg["training_parameters"]["eval_interval"] = 500
    cfg["training_parameters"]["eval_iters"] = 4

    tmp = tempfile.mkdtemp(prefix="bench_runner_")
    prev_cwd = os.getcwd()
    try:
        (Path(tmp) / "config.yaml").write_text(yaml.safe_dump(cfg))
        shutil.copy(REPO / "examples" / "demo_input_schemas.yaml",
                    Path(tmp) / "input_schemas.yaml")
        os.makedirs(Path(tmp) / "examples" / "demo_data")
        shutil.copy(REPO / "examples" / "demo_data" / "demo_stock.csv",
                    Path(tmp) / "examples" / "demo_data" / "demo_stock.csv")
        os.chdir(tmp)
        reset_compatibility_layer()
        reset_config_cache()
        with contextlib.redirect_stdout(io.StringIO()):
            result = run_training(caller_globals={}, seed=0)
        return result["step_timer"].steady_steps_per_sec
    finally:
        os.chdir(prev_cwd)
        reset_compatibility_layer()
        reset_config_cache()
        shutil.rmtree(tmp, ignore_errors=True)


def _guard(name, fn, default):
    """Run one sub-benchmark; on failure log it and return `default` so the
    headline JSON line still prints (a single broken metric must never cost
    the whole artifact)."""
    try:
        return fn()
    except Exception as e:  # pragma: no cover - defensive
        log(f"BENCH-ERROR {name}: {type(e).__name__}: {e}")
        return default


def main():
    armed = _backend_watchdog()
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    armed.set()
    trainer, params, opt_state = build_demo_run()

    chunk = 512
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    params, opt_state, losses = trainer.train_chunk(params, opt_state, key, chunk)
    dsync(losses)
    log(f"compile + first chunk: {time.perf_counter() - t0:.1f}s")

    best = 0.0
    for trial in range(3):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        params, opt_state, losses = trainer.train_chunk(params, opt_state, sub, chunk)
        dsync(losses)
        dt = time.perf_counter() - t0
        sps = chunk / dt
        best = max(best, sps)
        log(f"trial {trial}: {chunk} steps in {dt:.3f}s -> {sps:.1f} steps/s")

    tok_stats = _guard("tokenize", bench_tokenize, None)
    tok, tok_lo, tok_hi = tok_stats if tok_stats else (None, None, None)
    log(f"tokenization: {tok:.2f} M rows/s "
        f"(median of 7; min {tok_lo:.2f} / max {tok_hi:.2f} — 1-CPU box)"
        if tok else "tokenization: failed")
    prod, mfu_pct, flops = _guard("production", bench_production, (None, None, None))
    if prod:
        log(f"production 4-modality: {prod:.1f} steps/s, "
            f"{mfu_pct:.2f}% MFU ({flops/1e9:.2f} GF/step)")
    lc = _guard("long_context", bench_long_context,
                {"T1024": None, "T4096": None, "mfu_T1024": None,
                 "mfu_T4096": None, "flash_speedup": None})
    serve = _guard("serve", bench_serve, None)
    if serve:
        log(f"serve T=1024 (B=16, refresh=256): {serve:.0f} tok/s")
    serve8 = _guard("serve_int8", lambda: bench_serve("int8"), None)
    if serve8:
        log(f"serve T=1024 int8 KV (B=16, refresh=256): {serve8:.0f} tok/s")
    runner_sps = _guard("runner", bench_runner, None)
    if runner_sps:
        log(f"run_training (shipped entry path, demo config): "
            f"{runner_sps:.1f} steps/s steady")

    r = lambda x, nd=2: round(x, nd) if x is not None else None
    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec_demo_config",
                "value": round(best, 1),
                "unit": "steps/s",
                "vs_baseline": round(best / REFERENCE_STEPS_PER_SEC, 2),
                "extra": [
                    {
                        "metric": "tokenize_M_rows_per_sec",
                        "value": r(tok),
                        "unit": (
                            f"M rows/s (median of 7 host trials; "
                            f"spread {r(tok_lo)}-{r(tok_hi)})"
                            if tok is not None else "M rows/s"
                        ),
                        "vs_baseline": r(
                            tok / REFERENCE_TOKENIZE_M_ROWS_PER_SEC
                            if tok is not None else None
                        ),
                    },
                    {
                        "metric": "train_steps_per_sec_production_4mod",
                        "value": r(prod, 1),
                        "unit": "steps/s",
                        "vs_baseline": None,  # reference cannot run this scale
                    },
                    {
                        "metric": "production_model_mfu_v5e",
                        "value": r(mfu_pct),
                        "unit": "%",
                        "vs_baseline": None,
                    },
                    {
                        "metric": "train_steps_per_sec_T1024",
                        "value": r(lc["T1024"]),
                        "unit": "steps/s",
                        "vs_baseline": None,
                    },
                    {
                        "metric": "train_steps_per_sec_T4096",
                        "value": r(lc["T4096"]),
                        "unit": "steps/s",
                        "vs_baseline": None,
                    },
                    {
                        "metric": "long_context_mfu_T1024",
                        "value": r(lc.get("mfu_T1024")),
                        "unit": "%",
                        "vs_baseline": None,
                    },
                    {
                        "metric": "long_context_mfu_T4096",
                        "value": r(lc.get("mfu_T4096")),
                        "unit": "%",
                        "vs_baseline": None,
                    },
                    {
                        "metric": "serve_tokens_per_sec_T1024",
                        "value": r(serve, 0),
                        "unit": "tok/s (KV-cached, B=16, refresh=256)",
                        "vs_baseline": None,
                    },
                    {
                        "metric": "flash_speedup_T4096",
                        "value": r(lc["flash_speedup"]),
                        "unit": "x vs dense attention (fwd+bwd)",
                        "vs_baseline": None,
                    },
                    {
                        "metric": "ring_cp_overhead_T4096",
                        "value": r(lc.get("ring_overhead_pct"), 1),
                        "unit": "% over plain flash (1-device ring, fwd+bwd)",
                        "vs_baseline": None,
                    },
                    {
                        "metric": "serve_tokens_per_sec_T1024_int8kv",
                        "value": r(serve8, 0),
                        "unit": "tok/s (int8 KV cache, B=16, refresh=256)",
                        "vs_baseline": None,
                    },
                    {
                        "metric": "runner_steps_per_sec_demo",
                        "value": r(runner_sps, 1),
                        "unit": "steps/s (through run_training)",
                        "vs_baseline": r(
                            runner_sps / REFERENCE_STEPS_PER_SEC
                            if runner_sps is not None else None
                        ),
                    },
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
