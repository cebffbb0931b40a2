"""Device-true step timing via the profiler (xplane), not wall clock.

The axon TPU tunnel adds ~25 ms of host dispatch/sync latency per jitted
call, so wall-clock timing (even D2H-synced) wildly overstates per-step cost
at small n. This tool runs a program under jax.profiler.trace and reports
the XLA module's on-device duration divided by the step count.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python tools/device_time.py fwdbwd|fwd|full [--steps 30] [--ablate MODE]
"""

import argparse
import glob
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def module_ms(tdir: str) -> dict:
    """Total on-device ms per XLA module in the trace."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    fp = sorted(glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(fp, "rb").read())
    out = {}
    for p in xs.planes:
        if p.name != "/device:TPU:0":
            continue
        emeta = p.event_metadata
        for line in p.lines:
            if line.name != "XLA Modules":
                continue
            for ev in line.events:
                name = emeta[ev.metadata_id].name.split("(")[0]
                out[name] = out.get(name, 0.0) + ev.duration_ps / 1e9
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("program", choices=["fwd", "fwdbwd", "full"])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--ablate", default="")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--rawkeys", action="store_true",
                    help="scan over raw uint32 salt pairs instead of typed keys")
    ap.add_argument("--fused", action="store_true",
                    help="full program: use the fused flat-state AdamW chunk")
    args = ap.parse_args()
    if args.ablate:
        os.environ["TAID_DROPOUT_ABLATE"] = args.ablate

    import numpy as np
    import jax
    import jax.numpy as jnp

    from trade_aid_multimodal_transformer_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.models.transformer import total_loss

    n = args.steps
    cfg = ModelConfig(
        vocab_sizes=(500, 120, 24, 48), cross_attention=(True, True, False, False),
        n_embd=384, n_head=6, n_layer=6, block_size=args.block, dropout=0.2,
        compute_dtype=args.dtype,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = args.batch

    if args.program in ("fwd", "fwdbwd"):
        xb = jnp.asarray(np.stack(
            [rng.integers(0, v, (B, args.block)) for v in cfg.vocab_sizes]
        ).astype(np.int32))
        yb = jnp.asarray(np.stack(
            [rng.integers(0, v, (B, args.block)) for v in cfg.vocab_sizes]
        ).astype(np.int32))
        key = jax.random.wrap_key_data(
            jnp.tile(jnp.asarray([0, 1], jnp.uint32), 2)[:4], impl="rbg"
        ) if jax.default_backend() == "tpu" else jax.random.PRNGKey(0)

        def step_keys(key):
            if args.rawkeys:
                i = jnp.arange(n, dtype=jnp.uint32)
                return jnp.stack([i * jnp.uint32(2654435761), i ^ jnp.uint32(123)], -1)
            return jax.random.split(key, n)

        if args.program == "fwdbwd":
            @jax.jit
            def run(params, key):
                def body(c, k):
                    (l, _), g = jax.value_and_grad(total_loss, has_aux=True)(
                        params, cfg, xb, yb, k, True)
                    # keep every grad leaf alive with one element each (full
                    # tree-sums cost ~1 ms/step of scalar reduce fusions and
                    # distort the measurement)
                    keep = sum(x.ravel()[0].astype(jnp.float32)
                               for x in jax.tree_util.tree_leaves(g))
                    return c, (l, keep)
                _, out = jax.lax.scan(body, 0, step_keys(key))
                return out
        else:
            @jax.jit
            def run(params, key):
                def body(c, k):
                    return c, total_loss(params, cfg, xb, yb, k, True)[0]
                _, out = jax.lax.scan(body, 0, step_keys(key))
                return out

        out = run(params, key)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1]))
        tdir = tempfile.mkdtemp(prefix="tat_dt_")
        with jax.profiler.trace(tdir):
            out = run(params, key)
            np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1]))
    else:
        from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
        from trade_aid_multimodal_transformer_tpu.train.metrics import build_metric_specs
        from trade_aid_multimodal_transformer_tpu.train.steps import Trainer, make_optimizer

        train = [rng.integers(0, v, 900000).astype(np.int32) for v in cfg.vocab_sizes]
        val = [rng.integers(0, v, 100000).astype(np.int32) for v in cfg.vocab_sizes]
        feed = BatchFeed(train, val, [1000000], cfg.block_size, B,
                         is_percents=False, rand_sizes=[2, 2, None, None],
                         vocab_sizes=list(cfg.vocab_sizes))
        optimizer, adamw_spec = make_optimizer(
            1e-3, "bfloat16", "bfloat16", with_spec=True
        )
        specs = build_metric_specs(
            [np.linspace(-1, 1, v).tolist() for v in cfg.vocab_sizes],
            [False] * 4, cfg.block_size)
        tr = Trainer(cfg, feed, optimizer, specs, 40,
                     adamw_spec=adamw_spec if args.fused else None)
        opt_state = optimizer.init(params)
        params, opt_state, l = tr.train_chunk(params, opt_state, jax.random.PRNGKey(0), n)
        np.asarray(jax.device_get(l[-1]))
        tdir = tempfile.mkdtemp(prefix="tat_dt_")
        with jax.profiler.trace(tdir):
            params, opt_state, l = tr.train_chunk(
                params, opt_state, jax.random.PRNGKey(1), n)
            np.asarray(jax.device_get(l[-1]))

    mods = module_ms(tdir)
    main_mod = max(mods.items(), key=lambda kv: kv[1])
    print(f"mode={args.ablate or 'default'} program={args.program} "
          f"device {main_mod[1]/n:.3f} ms/step   [{main_mod[0]} total {main_mod[1]:.1f} ms / {n}]")


if __name__ == "__main__":
    main()
