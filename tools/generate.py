"""Inference CLI: load a trained checkpoint and generate tokens.

The reference ships ``MultimodalTransformer.generate`` but no way to invoke
it (reference: model.py:404-446; README.md:975-976 notes it is never called).
This tool closes that gap: it reads the SAME zero-flag configuration
directory (config.yaml + input_schemas.yaml, or programmatic config.py),
re-runs ingestion/tokenization so the vocabularies match training exactly
(the vocab IS the tokenizer), loads the checkpoint named by
``model_file_name`` (native .npz or reference .pth), primes the context with
the last ``block_size`` tokens of the dataset, and samples autoregressively
with the fused-scan sampler (models/sampler.py) — the whole token loop runs
as one device program.

Usage:
    python tools/generate.py [config_dir] [--tokens N] [--modality I]
                             [--seed S] [--checkpoint PATH]

Outputs one line per generated token: the sampled token id and its decoded
value in each modality's vocabulary.
"""

import argparse
import contextlib
import io
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("config_dir", nargs="?", default=".",
                    help="directory with config.yaml + input_schemas.yaml")
    ap.add_argument("--tokens", type=int, default=16)
    ap.add_argument("--modality", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint", default=None,
                    help="override the config's model_file_name")
    ap.add_argument("--serve", action="store_true",
                    help="KV-cached serving sampler (models/cache.py): "
                         "token-exact while the context grows, chunked-"
                         "refresh approximation past a full window")
    ap.add_argument("--refresh", type=int, default=None,
                    help="--serve refresh period (default block_size // 8)")
    ap.add_argument("--kv-dtype", default=None, choices=[None, "int8"],
                    help="--serve KV-cache storage dtype: int8 halves decode "
                         "cache traffic (quantized, serving-only)")
    args = ap.parse_args()

    # resolve an explicit --checkpoint against the SHELL's cwd before chdir
    if args.checkpoint is not None:
        args.checkpoint = str(Path(args.checkpoint).resolve())
    os.chdir(args.config_dir)  # config detection is CWD-relative (parity)
    # programmatic mode imports a `config` module from the config dir
    if str(Path.cwd()) not in sys.path:
        sys.path.insert(0, str(Path.cwd()))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from trade_aid_multimodal_transformer_tpu.config.compat import (
        get_modality_parameters,
        get_system_configuration,
        initialize_compatibility_layer,
    )
    from trade_aid_multimodal_transformer_tpu.data.ingest import (
        load_and_process_modality,
    )
    from trade_aid_multimodal_transformer_tpu.data.vocab import (
        numerical_representation,
    )
    from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig
    from trade_aid_multimodal_transformer_tpu.models.init import init_params
    from trade_aid_multimodal_transformer_tpu.models.sampler import generate_fast
    from trade_aid_multimodal_transformer_tpu.train.checkpoint import load_checkpoint
    from trade_aid_multimodal_transformer_tpu.train.runner import (
        _schemas_from_params,
    )
    from trade_aid_multimodal_transformer_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    initialize_compatibility_layer({})
    sc = get_system_configuration()
    modality_params = get_modality_parameters()
    if not modality_params:
        print("[ERROR] no modalities configured", file=sys.stderr)
        return 1
    schemas = _schemas_from_params(modality_params)

    print(f"Loading {len(schemas)} modalities...", file=sys.stderr)
    ids_list, vocabs, names = [], [], []
    with contextlib.redirect_stdout(io.StringIO()):
        for schema in schemas:
            md = load_and_process_modality(schema, quiet=True)
            ids, vocab = numerical_representation(md.data)
            ids_list.append(np.asarray(ids, np.int32))
            vocabs.append(vocab)
            names.append(md.name)

    lengths = {len(x) for x in ids_list}
    if len(lengths) != 1:
        print(f"[ERROR] modalities have unequal lengths: {sorted(lengths)}",
              file=sys.stderr)
        return 1

    cfg = ModelConfig.from_modality_params(
        sc, [len(v) for v in vocabs], modality_params
    )
    if not 0 <= args.modality < cfg.num_modalities:
        print(f"[ERROR] --modality must be in [0, {cfg.num_modalities})",
              file=sys.stderr)
        return 1

    ckpt = args.checkpoint or sc["model_file_name"]
    params = init_params(jax.random.PRNGKey(0), cfg)
    try:
        params, _, step, _ = load_checkpoint(ckpt, params, None, cfg)
        trained = f"checkpoint {ckpt}" + (f" (step {step})" if step else "")
    except FileNotFoundError:
        if args.checkpoint is not None:
            # an explicitly requested checkpoint must exist — never silently
            # sample from random weights
            print(f"[ERROR] checkpoint not found: {ckpt}", file=sys.stderr)
            return 1
        trained = "RANDOM INIT (no checkpoint found — predictions are noise)"
    print(f"Model: {trained}", file=sys.stderr)

    # prime with the last block_size tokens of each stream
    T0 = min(cfg.block_size, len(ids_list[0]))
    idx = jnp.asarray(
        np.stack([x[-T0:] for x in ids_list])[:, None, :]  # (M, B=1, T0)
    )
    if args.serve:
        from trade_aid_multimodal_transformer_tpu.models.cache import generate_serve

        out = generate_serve(
            params, cfg, idx, jax.random.PRNGKey(args.seed),
            max_new_tokens=args.tokens, modality_to_generate=args.modality,
            refresh=args.refresh, kv_dtype=args.kv_dtype,
        )
    else:
        out = generate_fast(
            params, cfg, idx, jax.random.PRNGKey(args.seed),
            max_new_tokens=args.tokens, modality_to_generate=args.modality,
        )
    new = np.asarray(out[:, 0, T0:])  # (M, tokens)

    target = names[args.modality]
    print(f"# generated {args.tokens} tokens for modality "
          f"{args.modality} ({target}); other modalities repeat their last value")
    header = "step  " + "  ".join(f"{n[:18]:>18}" for n in names)
    print(header)
    for t in range(args.tokens):
        cells = []
        for m in range(cfg.num_modalities):
            tok = int(new[m, t])
            val = vocabs[m][tok] if tok < len(vocabs[m]) else "?"
            cells.append(f"{val!s:>14} #{tok:<3}")
        print(f"{t + 1:>4}  " + "  ".join(cells))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
