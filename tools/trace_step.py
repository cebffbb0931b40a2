"""Capture a device trace of the production train chunk and print the top
XLA ops by self time (parses the xplane.pb directly — the tensorboard
plugin's native converter is broken in this image).

Run on a TPU host:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/trace_step.py \
      [--steps 20] [--top 30] [--ablate scale|trivial|bernoulli] [--json out.json]
"""

import argparse
import collections
import glob
import json
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--ablate", default="")
    ap.add_argument("--json", default="")
    ap.add_argument("--fused", action="store_true",
                    help="use the fused flat-state AdamW chunk")
    args = ap.parse_args()

    if args.ablate:
        os.environ["TAID_DROPOUT_ABLATE"] = args.ablate

    import numpy as np
    import jax

    from trade_aid_multimodal_transformer_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.sampling.feed import BatchFeed
    from trade_aid_multimodal_transformer_tpu.train.metrics import build_metric_specs
    from trade_aid_multimodal_transformer_tpu.train.steps import Trainer, make_optimizer

    cfg = ModelConfig(
        vocab_sizes=(500, 120, 24, 48), cross_attention=(True, True, False, False),
        n_embd=384, n_head=6, n_layer=6, block_size=args.block, dropout=0.2,
        compute_dtype=args.dtype,
    )
    rng = np.random.default_rng(0)
    n_rows, n_val = 1_000_000, 100_000
    train = [rng.integers(0, v, n_rows - n_val).astype(np.int32) for v in cfg.vocab_sizes]
    val = [rng.integers(0, v, n_val).astype(np.int32) for v in cfg.vocab_sizes]
    B = args.batch
    feed = BatchFeed(train, val, [n_rows], cfg.block_size, B,
                     is_percents=False, rand_sizes=[2, 2, None, None],
                     vocab_sizes=list(cfg.vocab_sizes))
    optimizer, adamw_spec = make_optimizer(
        1e-3, "bfloat16", "bfloat16", with_spec=True)
    specs = build_metric_specs(
        [np.linspace(-1, 1, v).tolist() for v in cfg.vocab_sizes],
        [False] * 4, cfg.block_size)
    trainer = Trainer(cfg, feed, optimizer, specs, 40,
                      adamw_spec=adamw_spec if args.fused else None)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = optimizer.init(params)

    n = args.steps
    # compile outside the trace
    params, opt_state, l = trainer.train_chunk(params, opt_state, jax.random.PRNGKey(0), n)
    np.asarray(jax.device_get(l[-1]))

    tdir = tempfile.mkdtemp(prefix="tat_trace_")
    with jax.profiler.trace(tdir):
        params, opt_state, l = trainer.train_chunk(
            params, opt_state, jax.random.PRNGKey(1), n)
        np.asarray(jax.device_get(l[-1]))

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    fp = sorted(glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(fp, "rb").read())
    tot = collections.Counter()
    cnt = collections.Counter()
    for p in xs.planes:
        if p.name != "/device:TPU:0":
            continue
        emeta = p.event_metadata
        for line in p.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = emeta[ev.metadata_id].name
                # the while wrapper's duration contains every op inside it
                if name.startswith("%while"):
                    continue
                key = name.split(" = ")[0]
                shape = name.split(" = ")[1].split(" ")[0] if " = " in name else ""
                tot[(key, shape)] += ev.duration_ps
                cnt[(key, shape)] += 1
    total_ms = sum(tot.values()) / 1e12 * 1e3
    print(f"mode={args.ablate or 'hash'}  op self-time total: {total_ms:.2f} ms "
          f"({total_ms/n:.3f} ms/step, {len(tot)} distinct ops)")
    for (key, shape), ps in tot.most_common(args.top):
        # duration_ps / 1e9 = milliseconds
        print(f"  {ps/1e9/n:9.3f} ms/step x{cnt[(key, shape)]//n:<4} {key:<28} {shape[:80]}")
    if args.json:
        out = {
            "mode": args.ablate or "hash",
            "ms_per_step": total_ms / n,
            "ops": {f"{k} {s}": ps / 1e9 / n for (k, s), ps in tot.most_common()},
        }
        Path(args.json).write_text(json.dumps(out))


if __name__ == "__main__":
    main()
