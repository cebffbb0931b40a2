"""Generate the folder-loading parity dataset (BASELINE.json config #4 shape).

Builds a self-contained parity config dir: 50 synthetic stock CSVs (~1.1M
rows total) under data/stocks/, a 3-modality input_schemas.yaml
(price ranging / price percent-binning / volume percent-binning, folder
loading through the file cache, file-count validation split), and a
config.yaml sized so 3 seeds per side finish in minutes while the eval
split is large enough that directional bands discriminate (the demo-scale
bands were vacuous: 20-token val split -> 52-point bands, VERDICT r4 #5).

Deterministic (seeded numpy geometric walks), so both parity sides see
byte-identical inputs across invocations.

Usage: python tools/make_parity_dataset.py [outdir]   (default /tmp/parity_scale)
"""

import sys
from pathlib import Path

import numpy as np

N_FILES = 50
ROWS_PER_FILE = 22_050

CONFIG_YAML = """\
project_settings:
  project_file_path: "./"
  output_file_name: "parity_training_log.txt"
  model_file_name: "output/parity_model.ckpt"
  create_new_model: 1
  save_model: 0
  device: auto

data_splitting:
  validation_size: 0.1
  num_validation_files: 5

training_parameters:
  batch_size: 32
  block_size: 64
  max_iters: 300
  eval_interval: 100
  eval_iters: 50
  learning_rate: 0.001

model_architecture:
  n_embd: 64
  n_head: 4
  n_layer: 2
  dropout: 0.1
"""

INPUT_SCHEMAS_YAML = """\
modalities:
  - modality_name: "Stock Prices"
    path: "./data/stocks/"
    column_number: 5
    has_header: true
    processing_steps:
      - function: range_numeric_data
        args: {num_whole_digits: 2, decimal_places: 1}
        enabled: true
    cross_attention: true
    randomness_size: 2

  - modality_name: "Price Changes (%)"
    path: "./data/stocks/"
    column_number: 5
    has_header: true
    processing_steps:
      - function: convert_to_percent_changes
        args: {decimal_places: 2}
        enabled: true
      - function: bin_numeric_data
        args: {num_bins: 5, outlier_percentile: 0.1}
        enabled: true
    cross_attention: false

  - modality_name: "Volume Changes (%)"
    path: "./data/stocks/"
    column_number: 6
    has_header: true
    processing_steps:
      - function: convert_to_percent_changes
        args: {decimal_places: 2}
        enabled: true
      - function: bin_numeric_data
        args: {num_bins: 5, outlier_percentile: 0.1}
        enabled: true
    cross_attention: false
"""


def make_dataset(outdir: Path) -> None:
    stocks = outdir / "data" / "stocks"
    stocks.mkdir(parents=True, exist_ok=True)
    (outdir / "output").mkdir(exist_ok=True)
    rng = np.random.default_rng(20260819)
    for i in range(N_FILES):
        n = ROWS_PER_FILE
        # geometric walk around a per-stock base price; bounded so the
        # 2-whole-digit ranging step keeps a stable vocabulary
        base = rng.uniform(20.0, 80.0)
        steps = rng.normal(0.0, 0.004, n)
        close = base * np.exp(np.cumsum(steps))
        close = np.clip(close, 5.0, 99.0)
        spread = np.abs(rng.normal(0.0, 0.002, n)) + 1e-4
        high = close * (1 + spread)
        low = close * (1 - spread)
        opn = np.concatenate([[close[0]], close[:-1]])
        vol = np.exp(rng.normal(11.0, 0.35, n)).astype(np.int64) + 1
        day = np.arange(n)
        path = stocks / f"stock_{i:02d}.csv"
        with path.open("w") as f:
            f.write("date,open,high,low,close,volume\n")
            for j in range(n):
                f.write(
                    f"2020-01-{(j % 28) + 1:02d},{opn[j]:.2f},{high[j]:.2f},"
                    f"{low[j]:.2f},{close[j]:.2f},{vol[j]}\n"
                )
    (outdir / "config.yaml").write_text(CONFIG_YAML)
    (outdir / "input_schemas.yaml").write_text(INPUT_SCHEMAS_YAML)
    total = N_FILES * ROWS_PER_FILE
    print(f"wrote {N_FILES} CSVs x {ROWS_PER_FILE} rows = {total:,} rows "
          f"under {outdir}")


if __name__ == "__main__":
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/parity_scale")
    make_dataset(out)
