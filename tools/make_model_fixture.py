"""Generate the model-parity golden fixture from the reference implementation.

Runs the REFERENCE torch model (requires /root/reference mounted) on fixed
inputs with dropout=0 and saves its state_dict + inputs + logits + losses to
tests/fixtures/model_parity.npz. The committed fixture is pure data; tests
never import reference code.

Usage: python tools/make_model_fixture.py
"""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")


def main():
    sys.path.insert(0, str(REFERENCE))
    import torch

    # The reference model reads hyperparameters through config_utils' lazy
    # cache; prime it directly so no config files are needed.
    import config_utils

    cfg_dict = {
        "device": "cpu",
        "block_size": 8,
        "batch_size": 4,
        "eval_iters": 2,
        "n_embd": 32,
        "n_head": 4,
        "n_layer": 2,
        "dropout": 0.0,  # deterministic forward
        "fixed_values": [0.0],
    }
    config_utils._config_cache = cfg_dict

    from model import MultimodalTransformer

    torch.manual_seed(1234)
    vocab_sizes = [57, 11]
    # modality params: only slot [8] (cross_attention) matters to the model
    modality_params = [
        [None, None, None, None, None, None, None, None, True, "m0"],
        [None, None, None, None, None, None, None, None, True, "m1"],
    ]
    m = MultimodalTransformer(2, vocab_sizes, modality_params)
    m.eval()

    rng = np.random.default_rng(7)
    B, T = 4, 8
    idx = np.stack([rng.integers(0, v, size=(B, T)) for v in vocab_sizes]).astype(np.int64)
    tgt = np.stack([rng.integers(0, v, size=(B, T)) for v in vocab_sizes]).astype(np.int64)

    with torch.no_grad():
        logits_list, losses_list = m(
            [torch.tensor(idx[i]) for i in range(2)],
            [torch.tensor(tgt[i]) for i in range(2)],
        )
        m64 = m.double()
        logits64, losses64 = m64(
            [torch.tensor(idx[i]) for i in range(2)],
            [torch.tensor(tgt[i]) for i in range(2)],
        )

    out = {
        "idx": idx.astype(np.int32),
        "tgt": tgt.astype(np.int32),
        "vocab_sizes": np.asarray(vocab_sizes),
        "cross": np.asarray([1, 1]),
        "n_embd": np.asarray(cfg_dict["n_embd"]),
        "n_head": np.asarray(cfg_dict["n_head"]),
        "n_layer": np.asarray(cfg_dict["n_layer"]),
        "block_size": np.asarray(cfg_dict["block_size"]),
        "logits_0": logits_list[0].numpy(),
        "logits_1": logits_list[1].numpy(),
        "loss_0": losses_list[0].numpy(),
        "loss_1": losses_list[1].numpy(),
        "logits64_0": logits64[0].numpy(),
        "logits64_1": logits64[1].numpy(),
        "loss64_0": losses64[0].numpy(),
        "loss64_1": losses64[1].numpy(),
    }
    for k, v in m.state_dict().items():
        out[f"sd::{k}"] = v.double().numpy()

    dest = REPO / "tests" / "fixtures" / "model_parity.npz"
    dest.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} ({dest.stat().st_size/1024:.1f} KiB)")

    # also a single-cross variant (modality 1 without cross-attention)
    torch.manual_seed(999)
    modality_params2 = [
        [None, None, None, None, None, None, None, None, True, "m0"],
        [None, None, None, None, None, None, None, None, False, "m1"],
    ]
    m2 = MultimodalTransformer(2, vocab_sizes, modality_params2)
    m2.eval()
    with torch.no_grad():
        logits_list2, losses_list2 = m2(
            [torch.tensor(idx[i]) for i in range(2)],
            [torch.tensor(tgt[i]) for i in range(2)],
        )
        m2_64 = m2.double()
        logits64_2, losses64_2 = m2_64(
            [torch.tensor(idx[i]) for i in range(2)],
            [torch.tensor(tgt[i]) for i in range(2)],
        )
    out2 = {
        "idx": idx.astype(np.int32),
        "tgt": tgt.astype(np.int32),
        "vocab_sizes": np.asarray(vocab_sizes),
        "cross": np.asarray([1, 0]),
        "n_embd": np.asarray(cfg_dict["n_embd"]),
        "n_head": np.asarray(cfg_dict["n_head"]),
        "n_layer": np.asarray(cfg_dict["n_layer"]),
        "block_size": np.asarray(cfg_dict["block_size"]),
        "logits_0": logits_list2[0].numpy(),
        "logits_1": logits_list2[1].numpy(),
        "loss_0": losses_list2[0].numpy(),
        "loss_1": losses_list2[1].numpy(),
        "logits64_0": logits64_2[0].numpy(),
        "logits64_1": logits64_2[1].numpy(),
        "loss64_0": losses64_2[0].numpy(),
        "loss64_1": losses64_2[1].numpy(),
    }
    for k, v in m2.state_dict().items():
        out2[f"sd::{k}"] = v.double().numpy()
    dest2 = REPO / "tests" / "fixtures" / "model_parity_selective.npz"
    np.savez_compressed(dest2, **out2)
    print(f"wrote {dest2} ({dest2.stat().st_size/1024:.1f} KiB)")


if __name__ == "__main__":
    main()
