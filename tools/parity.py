"""Parity harness: run this framework and the reference on the same config
directory and diff their observable surfaces.

Cross-framework RNG cannot match, so training trajectories differ; what must
agree exactly:
- per-modality vocabulary sizes (raw -> processed) and the vocabularies
  themselves when printed (vocab IS the tokenizer),
- train/val split sizes,
- the analytic parameter estimate,
- step-0 loss within noise of the analytic anchor sum(ln V_i),
- the training-log section structure.

Usage:
    python tools/parity.py <config_dir> [--reference /root/reference]

The config dir must contain config.yaml + input_schemas.yaml (paths inside
them resolved relative to the config dir). The reference needs torch on the
host; when absent, only this framework's run + analytic anchors are checked.
"""

import argparse
import math
import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_entry(main_path: Path, workdir: Path, timeout=600) -> str:
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, str(main_path)],
        cwd=workdir,
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"{main_path} failed ({proc.returncode}):\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
        )
    return proc.stdout


def parse_surface(out: str) -> dict:
    surface = {
        "vocab_transitions": re.findall(r"Vocab size: ([\d,]+) -> ([\d,]+)", out),
        "vocabularies": re.findall(r"Vocabulary: (\[.*?\])", out),
        "splits": re.findall(r"Train ([\d,]+) \| Val ([\d,]+)", out),
        "parameters": re.findall(r"Parameters: ([\d.]+)M", out),
    }
    m = re.search(r"LOSS METRICS: Step 0/\d+ \| Train: ([\d.]+) \| Val: ([\d.]+)", out)
    surface["step0"] = (float(m.group(1)), float(m.group(2))) if m else None

    # Behavioral surface: every eval's loss pair and per-modality directional
    # accuracies, keyed by (split, modality), across the whole run
    # (reference: training_utils.py:461-485 prints
    # "  - <name>  <wins>/<total> (<pct>%)" under per-split headers).
    surface["loss_curve"] = [
        (float(a), float(b))
        for a, b in re.findall(
            r"LOSS METRICS: Step \d+/\d+ \| Train: ([\d.]+) \| Val: ([\d.]+)", out
        )
    ]
    accs = {}
    current_split = None
    for line in out.splitlines():
        m = re.search(r"DIRECTIONAL METRICS - (Train|Val) Set", line)
        if m:
            current_split = m.group(1)
            continue
        m = re.match(r"\s+- (.+?)\s+(\d+)/(\d+) \(([\d.]+)%\)\s*$", line)
        if m and current_split:
            key = (current_split, m.group(1).strip())
            accs.setdefault(key, []).append(float(m.group(4)))
    surface["directional"] = accs
    return surface


def compare_behavior(ours: dict, ref: dict, failures: list) -> None:
    """Distributional comparison of the training trajectories: final losses
    within a tolerance band, directional-accuracy distributions overlapping.

    Cross-framework RNG differs, so these are band checks, not exact diffs
    (the reference's own metric spread across seeds is wide — e.g. val
    directional accuracy 3.8-5.0% on its demo prices modality)."""
    if ours["loss_curve"] and ref["loss_curve"]:
        for idx, name in ((0, "train"), (1, "val")):
            a = ours["loss_curve"][-1][idx]
            b = ref["loss_curve"][-1][idx]
            tol = 0.25 + 0.1 * abs(b)
            if abs(a - b) > tol:
                failures.append(
                    f"final {name} loss {a:.4f} vs reference {b:.4f} "
                    f"(|delta| {abs(a-b):.4f} > tol {tol:.4f})"
                )
            else:
                print(f"final {name} loss: {a:.4f} vs ref {b:.4f} (within {tol:.3f})")
        # losses must also DECREASE comparably from step 0
        for idx, name in ((0, "train"),):
            ours_drop = ours["loss_curve"][0][idx] - ours["loss_curve"][-1][idx]
            ref_drop = ref["loss_curve"][0][idx] - ref["loss_curve"][-1][idx]
            print(
                f"{name} loss drop over run: {ours_drop:.4f} vs ref {ref_drop:.4f}"
            )

    # Directional accuracies: compare run-level means per (split, modality)
    # with a band wide enough for sampling noise at demo eval sizes but
    # tight enough to catch a broken metric (e.g. inverted signs -> ~100-x).
    # The step-0 eval is excluded on BOTH sides: at random init the model is
    # effectively a constant-class predictor whose class depends on the seed
    # (measured demo step-0 Changes accuracy is bimodal, ~0% or ~90%), so
    # including it makes the run mean an RNG coin flip, not a behavior check.
    def trained_mean(vals):
        vals = vals[1:] if len(vals) > 1 else vals
        return sum(vals) / len(vals)

    for key in sorted(set(ours["directional"]) & set(ref["directional"])):
        a = trained_mean(ours["directional"][key])
        b = trained_mean(ref["directional"][key])
        band = 25.0
        split, mod = key
        if abs(a - b) > band:
            failures.append(
                f"directional accuracy ({split}/{mod}): mean {a:.1f}% vs "
                f"reference {b:.1f}% (|delta| > {band}%)"
            )
        else:
            print(f"directional ({split}/{mod}): mean {a:.1f}% vs ref {b:.1f}%")
    missing = set(ref["directional"]) - set(ours["directional"])
    if missing:
        failures.append(f"directional metrics missing for {sorted(missing)}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config_dir", type=Path)
    parser.add_argument("--reference", type=Path, default=Path("/root/reference"))
    parser.add_argument("--timeout", type=int, default=900)
    args = parser.parse_args()

    workdir = args.config_dir.resolve()
    print(f"== running this framework in {workdir} ==")
    ours = parse_surface(run_entry(REPO / "main.py", workdir, args.timeout))

    vocab_sizes = [int(b.replace(",", "")) for _, b in ours["vocab_transitions"]]
    anchor = sum(math.log(v) for v in vocab_sizes)
    failures = []

    if ours["step0"]:
        for name, loss in zip(("train", "val"), ours["step0"]):
            if abs(loss - anchor) > 0.25:
                failures.append(
                    f"step-0 {name} loss {loss:.4f} far from analytic anchor {anchor:.4f}"
                )
        print(
            f"step-0 losses {ours['step0']} vs analytic anchor sum(ln V) = {anchor:.4f}"
        )

    ref_main = args.reference / "main.py"
    if ref_main.exists():
        print(f"== running reference ({ref_main}) ==")
        try:
            ref = parse_surface(run_entry(ref_main, workdir, args.timeout))
        except Exception as e:
            print(f"reference run failed, skipping cross-check: {e}")
            ref = None
        if ref:
            for key in ("vocab_transitions", "vocabularies", "splits", "parameters"):
                if ours[key] != ref[key]:
                    failures.append(
                        f"{key} mismatch:\n  ours: {ours[key]}\n  ref:  {ref[key]}"
                    )
                else:
                    print(f"{key}: MATCH {ours[key]}")
            if ref["step0"] and ours["step0"]:
                d = abs(ref["step0"][0] - ours["step0"][0])
                print(f"step-0 train loss delta vs reference: {d:.4f} (RNG differs)")
            compare_behavior(ours, ref, failures)
    else:
        print("reference not found; analytic checks only")

    if failures:
        print("\nPARITY FAILURES:")
        for f in failures:
            print(f"  - {f}")
        sys.exit(1)
    print("\nPARITY OK")


if __name__ == "__main__":
    main()
