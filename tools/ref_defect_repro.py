"""Minimal repro of the reference's has_header->rand_size defect.

The reference's batch path reads the LEGACY modality-params list at index
[2] when deciding train-time augmentation (reference:
training_utils.py:353 ``this_rand_size = all_modality_params[r][2]``), but
the legacy layout puts ``has_header`` at [2] and ``randomness_size`` at [7]
— the reference's own config echo reads [7] under a "correct indices"
comment (reference: main.py:554-560). Two observable consequences, both
demonstrated here WITHOUT modifying the reference:

1. ``has_header: false`` -> the first TRAIN batch crashes with
   ``ValueError: rand_size must be an integer between 1 and 3, or null.``
   (data_utils.py:326-329 rejects bool False via ``rand_size < 1``;
   ``False is not None`` so the guard at training_utils.py:357 doesn't
   skip it). The reference cannot train on headerless CSVs AT ALL, and the
   error message names a parameter the config explicitly set to null.
   Step-0 EVAL batches pass (is_training=0 skips augmentation) — the run
   dies exactly at main.py:641, the first is_training=1 batch.

2. ``has_header: true`` -> ``True`` passes both guards (``isinstance(True,
   int)`` and ``1 <= True <= 3``), so EVERY headered modality trains with
   rand_size=1 augmentation regardless of ``randomness_size: null``.
   Combined with the in-place list mutation defect (data_utils.py:293-358
   ``numeric_data[n] += rand_value`` on the live train list, one pass per
   training step — the round-4 finding, PARITY_TPU.md), any modality with
   vocab >= 4 has its train data randomly diffused without bound over a
   run: drift std after P steps ~ sqrt(2P/3) tokens (interior tokens draw
   uniform {-1,0,+1} each pass). Vocab <= 3 modalities are immune only
   because no token satisfies the bounds guard ``1 < v < V-1``.

Our framework reads randomness_size from its schema field (config/schema.py)
and augments functionally in-jit without mutating the source data
(sampling/feed.py), so it trains headerless files and honors null.

Run: python tools/ref_defect_repro.py [--reference /root/reference]
"""

import argparse
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

CONFIG = """\
project_settings:
  project_file_path: "./"
  output_file_name: "t.txt"
  model_file_name: "output/m.ckpt"
  create_new_model: 1
  save_model: 0
  device: auto
data_splitting:
  validation_size: 0.2
  num_validation_files: 0
training_parameters:
  batch_size: 4
  block_size: 8
  max_iters: 20
  eval_interval: 10
  eval_iters: 4
  learning_rate: 0.001
model_architecture:
  n_embd: 16
  n_head: 2
  n_layer: 1
  dropout: 0.0
"""

SCHEMA = """\
modalities:
  - modality_name: "Repro Prices"
    path: "./stock_data"
    column_number: 4
    has_header: {has_header}
    processing_steps:
      - function: range_numeric_data
        args:
          num_whole_digits: 2
          decimal_places: 1
        enabled: true
    cross_attention: false
    randomness_size: null
"""


def make_dir(has_header: bool) -> Path:
    d = Path(tempfile.mkdtemp(prefix=f"ref_defect_{has_header}_"))
    (d / "stock_data").mkdir()
    (d / "config.yaml").write_text(CONFIG)
    (d / "input_schemas.yaml").write_text(
        SCHEMA.format(has_header="true" if has_header else "false"))
    rng = np.random.default_rng(0)
    for i in range(2):
        walk = np.cumsum(rng.choice([-1.0, 1.0], 600))
        close = np.round(50 + np.abs(walk % 30 - 15), 1)
        rows = [f"2020-01-01,{c:.2f},{c+0.1:.2f},{c-0.1:.2f},{c:.2f},1000"
                for c in close]
        if has_header:
            rows.insert(0, "date,open,high,low,close,volume")
        (d / "stock_data" / f"s{i}.csv").write_text("\n".join(rows) + "\n")
    return d


def run(main_py: Path, cwd: Path) -> subprocess.CompletedProcess:
    return subprocess.run([sys.executable, str(main_py)], cwd=cwd,
                          capture_output=True, text=True, timeout=600)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", type=Path, default=Path("/root/reference"))
    args = ap.parse_args()
    ref_main = args.reference / "main.py"
    ok = True

    d = make_dir(has_header=False)
    p = run(ref_main, d)
    crashed = (p.returncode != 0
               and "rand_size must be an integer between 1 and 3" in p.stderr
               and "add_rand_to_data_points" in p.stderr)
    print(f"[1] reference, headerless CSVs, randomness_size null: "
          f"rc={p.returncode} "
          f"{'CRASH in add_rand_to_data_points (defect reproduced)' if crashed else 'no crash (unexpected)'}")
    ok &= crashed

    p = run(REPO / "main.py", d)
    print(f"[2] ours, same headerless config: rc={p.returncode} "
          f"{'trains fine' if p.returncode == 0 else p.stderr[-300:]}")
    ok &= p.returncode == 0

    d = make_dir(has_header=True)
    p = run(ref_main, d)
    print(f"[3] reference, headered CSVs: rc={p.returncode} "
          f"(runs -> has_header=True accepted as rand_size=1; augmentation "
          f"active despite randomness_size null)")
    ok &= p.returncode == 0

    print("REPRO " + ("OK" if ok else "FAILED"))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
