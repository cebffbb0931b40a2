"""Generate the folder-scale parity dataset + config dir (BASELINE config #4).

Creates a self-contained config directory — config.yaml, input_schemas.yaml,
and a ``stock_data/`` folder of dozens of synthetic stock CSVs — shaped like
BASELINE.json config #4 ("folder loading: 50-stock CSV concat with
price/volume/... modalities through file_cache"), sized so the parity bands
actually discriminate (VERDICT r4 weak item 5): ~125k rows total, a val
split of ~25k rows, and eval_iters x batch large enough that the 3·SE
directional bands land under 10 points.

The three modalities exercise the three transform families end-to-end
through FOLDER loading (reference: file_cache.py:127-171 concatenates the
sorted CSVs; ours: data/loader.py folder concat + file_info):
  - Prices  : range_numeric_data(2, 1), cross-attention ON
  - Changes : convert_to_percent_changes -> bin_numeric_data, cross OFF
  - Volume  : bin_numeric_data, cross-attention ON

The price series is a momentum process (long sign runs + sub-resolution
noise), so directional accuracy is learnable far from the 50% coin-flip —
high-signal surfaces make the cross-seed spread small and the bands tight.

Usage:  python tools/gen_parity_folder.py <out_dir> [--files 48] [--rows 2600]
Then:   python tools/parity.py <out_dir> --seeds 3 ...   (see PARITY_TPU.md)
"""

import argparse
from pathlib import Path

import numpy as np

CONFIG_YAML = """\
project_settings:
  project_file_path: "./"
  output_file_name: "folder_training_log.txt"
  model_file_name: "output/folder_model.ckpt"
  create_new_model: 1
  save_model: 0
  device: auto

data_splitting:
  validation_size: 0.2
  num_validation_files: 0

training_parameters:
  batch_size: 8
  block_size: 16
  max_iters: 360
  eval_interval: 180
  eval_iters: 64
  learning_rate: 0.001

model_architecture:
  n_embd: 32
  n_head: 4
  n_layer: 2
  dropout: 0.1
"""

SCHEMAS_YAML = """\
modalities:
  - modality_name: "Folder Prices"
    path: "./stock_data"
    column_number: 5
    has_header: true
    processing_steps:
      - function: range_numeric_data
        args:
          num_whole_digits: 2
          decimal_places: 1
        enabled: true
    cross_attention: true
    randomness_size: null

  - modality_name: "Folder Changes (%)"
    path: "./stock_data"
    column_number: 5
    has_header: true
    processing_steps:
      - function: convert_to_percent_changes
        args:
          decimal_places: 2
        enabled: true
      - function: bin_numeric_data
        args:
          num_bins: 3
          outlier_percentile: 0.1
        enabled: true
    cross_attention: false
    randomness_size: null

  - modality_name: "Folder Volume"
    path: "./stock_data"
    column_number: 6
    has_header: true
    processing_steps:
      - function: bin_numeric_data
        args:
          num_bins: 3
          outlier_percentile: 0.1
        enabled: true
    cross_attention: true
    randomness_size: null
"""


def gen_stock(rng, n_rows, level, period):
    """Momentum price walk + volume tied to the |move| size.

    Every file shares ONE price band (reflected into [35, 65]) so the
    80/20 split of the concatenated folder leaves no val-only tokens —
    per-file levels would hand the val split ranged-price tokens the
    train split never saw, collapsing val directional accuracy to noise
    (observed on the first cut of this generator). Steps are a SINGLE
    1.0-unit size: a mixed 1.0/1.5 step draw made the percent-change
    quantile bins split on step size instead of direction (bin sign was
    noise — observed on the second cut); with one step size |pct| =
    100/price varies only with the slowly-moving level, so the 3-bin
    Changes tokens ride (sign, level) and carry the same momentum runs as
    the prices. Flips every ~`period` steps put the directional ceiling
    near 1 - 1/period.
    """
    flips = rng.random(n_rows) < (1.0 / period)
    direction = np.cumprod(np.where(flips, -1.0, 1.0)) * rng.choice([-1.0, 1.0])
    walk = np.cumsum(direction)
    # keep EVERY file on the shared 0.5-unit token grid: quantized level,
    # no float mean-centering (an off-grid shift would give each file its
    # own 0.1-offset vocabulary after range_numeric_data's 1-decimal round)
    level = round(level * 2.0) / 2.0
    close = level + walk - round(float(walk.mean()) * 2.0) / 2.0
    close = np.round(35.0 + np.abs((close - 35.0) % 60.0 - 30.0), 2)
    # volume: a persistent regime ladder (switch ~1/60 rows) + mild noise,
    # so binning yields a small stable vocab whose next-bin is learnable
    ladder = np.array([1200.0, 2400.0, 4800.0, 9600.0])
    switch = rng.random(n_rows) < (1.0 / 60.0)
    idx = np.cumsum(switch) + rng.integers(0, 4)
    regime = ladder[idx % 4]
    volume = np.round(
        regime * np.exp(rng.normal(0.0, 0.08, n_rows))
    ).astype(np.int64)
    volume = np.clip(volume, 100, None)
    opn = np.round(close + rng.normal(0, 0.2, n_rows), 2)
    high = np.round(np.maximum(opn, close) + 0.1, 2)
    low = np.round(np.minimum(opn, close) - 0.1, 2)
    return opn, high, low, close, volume


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--files", type=int, default=48)
    ap.add_argument("--rows", type=int, default=2600)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    out = args.out_dir
    data_dir = out / "stock_data"
    data_dir.mkdir(parents=True, exist_ok=True)
    (out / "config.yaml").write_text(CONFIG_YAML)
    (out / "input_schemas.yaml").write_text(SCHEMAS_YAML)

    rng = np.random.default_rng(args.seed)
    total = 0
    for i in range(args.files):
        level = float(rng.uniform(42, 58))
        period = float(rng.uniform(15, 35))
        opn, high, low, close, volume = gen_stock(rng, args.rows, level, period)
        lines = ["date,open,high,low,close,volume"]
        for t in range(args.rows):
            lines.append(
                f"2020-01-{t % 28 + 1:02d},{opn[t]:.2f},{high[t]:.2f},"
                f"{low[t]:.2f},{close[t]:.2f},{volume[t]}"
            )
        (data_dir / f"stock_{i:02d}.csv").write_text("\n".join(lines) + "\n")
        total += args.rows
    print(f"wrote {args.files} CSVs, {total} rows -> {out}")


if __name__ == "__main__":
    main()
