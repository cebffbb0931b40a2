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

Behavioral checks (losses, directional accuracies) are band comparisons.
With ``--seeds N`` (N >= 2) each side runs N times and the bands derive from
the measured cross-seed spread (mean +- a standard-error band) instead of
the fixed single-run band — tight enough to catch a subtler behavioral
regression than the legacy +-25-point band.

TPU-path parity: ``--tpu-options "<yaml>"`` overlays a tpu_options block
onto OUR config only (the reference has no such section), so the shipped
production path — bfloat16 compute, bf16 Adam moments, Pallas kernels, hash
dropout, hardware RNG — is diffed end-to-end against the reference's CPU
run. ``--set section.key=value`` applies a config override to BOTH sides
(e.g. a block_size the kernels engage at). Runs are staged into temp copies
of the config dir, so the input directory is never mutated.

Usage:
    python tools/parity.py <config_dir> [--reference /root/reference]
        [--seeds N] [--set training_parameters.block_size=16 ...]
        [--tpu-options $'tpu_options:\n  compute_dtype: bfloat16']
        [--report PARITY_TPU.md]

Wall clock on this 1-CPU box: a single demo-config pair is dominated by the
first fused-chunk compile (~2-4 min TPU, ~8 min CPU); run_training enables
the persistent JAX compilation cache, so each further seed costs only the
actual training/eval time (measured: seed 2+ of the demo config ~40 s).

The config dir must contain config.yaml + input_schemas.yaml (paths inside
them resolved relative to the config dir). The reference needs torch on the
host; when absent, only this framework's run + analytic anchors are checked.
"""

import argparse
import math
import os
import re
import shutil
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_REPORT_LINES = []


def emit(msg: str = ""):
    print(msg)
    _REPORT_LINES.append(str(msg))


def run_entry(main_path: Path, workdir: Path, timeout=600, seed=None,
              wrap_seed: bool = False, patch_drift: bool = False) -> str:
    env = dict(os.environ)
    if seed is not None:
        # our entrypoint honors TAT_SEED; the reference has no seeding hook
        # at all (no torch.manual_seed/random.seed anywhere in its main), so
        # for it ``wrap_seed`` seeds torch/random/numpy in-process before
        # running its main under runpy — making the N reference "seed runs"
        # reproducible across harness invocations (advisor r4) rather than
        # OS-entropy draws.
        env["TAT_SEED"] = str(seed)
        env["PYTHONHASHSEED"] = str(seed)
    if wrap_seed and seed is not None:
        code = (
            "import sys, random, runpy\n"
            # direct `python main.py` puts main's dir on sys.path[0]; under
            # -c + runpy that slot is the cwd, so add it explicitly or the
            # reference's sibling-module imports fail
            f"sys.path.insert(0, {str(main_path.parent)!r})\n"
            f"random.seed({int(seed)})\n"
            "try:\n"
            f"    import numpy; numpy.random.seed({int(seed)})\n"
            "except ImportError:\n"
            "    pass\n"
            "try:\n"
            f"    import torch; torch.manual_seed({int(seed)})\n"
            "except ImportError:\n"
            "    pass\n"
            "sys.argv = ['main.py']\n"
        )
        if patch_drift:
            # Drift-corrected CONTROL: fix ONLY the reference's in-place
            # list mutation (data_utils.py:293-358 ``numeric_data[n] +=
            # rand_value`` on the live train list) by handing the function
            # a fresh copy per call — identical RNG consumption, identical
            # per-batch augmentation semantics, but the train data no
            # longer diffuses cumulatively over the run. get_batch rebinds
            # ``from data_utils import ...`` at every call, so patching the
            # module attribute is sufficient.
            code += (
                "import data_utils as _du\n"
                "_orig_artdp = _du.add_rand_to_data_points\n"
                "def _nodrift(nd, rs, vs):\n"
                "    if isinstance(nd, list):\n"
                "        nd = list(nd)\n"
                "    return _orig_artdp(nd, rs, vs)\n"
                "_du.add_rand_to_data_points = _nodrift\n"
            )
        code += f"runpy.run_path({str(main_path)!r}, run_name='__main__')\n"
        cmd = [sys.executable, "-c", code]
    else:
        cmd = [sys.executable, str(main_path)]
    for attempt in (1, 2):
        try:
            proc = subprocess.run(
                cmd,
                cwd=workdir,
                capture_output=True,
                text=True,
                timeout=timeout,
                env=env,
            )
        except subprocess.TimeoutExpired:
            # the tunneled TPU occasionally WEDGES mid-run (a device call
            # never returns; observed at a step-0 eval with 0% CPU for
            # 20 min) — the timeout is the only signal; retry once
            if attempt == 1:
                emit("   (run exceeded timeout — TPU tunnel wedge? "
                     "retrying once)")
                continue
            raise
        if proc.returncode == 0:
            return proc.stdout
        # The tunneled TPU also drops mid-run with a transient backend
        # FAILED_PRECONDITION (observed killing a 30-min harness run at a
        # step-0 eval); negative returncodes mean the run was killed
        # externally (e.g. a hang-kill). Retry both once.
        transient = (
            "TPU backend error" in proc.stderr
            or "FAILED_PRECONDITION" in proc.stderr
            or proc.returncode < 0
        )
        if attempt == 1 and transient:
            emit("   (transient TPU backend failure — retrying run once)")
            continue
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


def _trained_mean(vals):
    """Run-level mean excluding the step-0 eval: at random init the model is
    a constant-class predictor whose class depends on the seed (measured
    demo step-0 Changes accuracy is bimodal, ~0% or ~90%), so including it
    makes the run mean an RNG coin flip, not a behavior check."""
    vals = vals[1:] if len(vals) > 1 else vals
    return sum(vals) / len(vals)


def _mean_std(xs):
    if len(xs) == 1:
        return xs[0], None
    return statistics.mean(xs), statistics.stdev(xs)


def _band_from_spread(sa, sb, na, nb, floor, single_run_band):
    """Comparison band for a difference of run means. With one run per side
    the legacy fixed band applies; with seeds the band is mean +- 3
    standard errors of the difference (normal-ish across seeds), floored so
    a degenerate zero-variance metric still tolerates eval noise."""
    if sa is None or sb is None:
        return single_run_band
    se = math.sqrt(sa * sa / na + sb * sb / nb)
    return max(floor, 3.0 * se)


def compare_behavior(ours: list, refs: list, failures: list,
                     reference_train_drift: bool = False) -> None:
    """Distributional comparison of the training trajectories across all
    runs of each side: final-loss means and directional-accuracy means
    within spread-derived bands."""
    ours_curves = [o["loss_curve"] for o in ours if o["loss_curve"]]
    ref_curves = [r["loss_curve"] for r in refs if r["loss_curve"]]
    na, nb = len(ours), len(refs)
    if ours_curves and ref_curves:
        for idx, name in ((0, "train"), (1, "val")):
            a_runs = [c[-1][idx] for c in ours_curves]
            b_runs = [c[-1][idx] for c in ref_curves]
            ma, sa = _mean_std(a_runs)
            mb, sb = _mean_std(b_runs)
            tol = _band_from_spread(
                sa, sb, len(a_runs), len(b_runs),
                floor=0.15, single_run_band=0.25 + 0.1 * abs(mb),
            )
            spread = (
                f" (spread ours {sa:.3f} ref {sb:.3f}, n={len(a_runs)})"
                if sa is not None else ""
            )
            if name == "train" and reference_train_drift and mb >= ma:
                # The reference's add_rand_to_data_points mutates its train
                # LISTS in place (data_utils.py:293-358 += on the global
                # list), so its train data accumulates one augmentation pass
                # per training step — a bounded random walk (measured ~6
                # mean |token drift| after 100 passes at k=1, V=57). Its
                # train-split losses are measured on progressively diffused
                # data and sit above ours BY CONSTRUCTION; the delta is
                # reported, and only an ours-ABOVE-reference result (a real
                # regression) fails.
                emit(f"final train loss: {ma:.4f} vs ref {mb:.4f} — ref "
                     f"measures a drifted train set (in-place augmentation "
                     f"quirk; delta {mb - ma:.4f} reported, not failed)"
                     f"{spread}")
                continue
            if abs(ma - mb) > tol:
                failures.append(
                    f"final {name} loss mean {ma:.4f} vs reference {mb:.4f} "
                    f"(|delta| {abs(ma-mb):.4f} > tol {tol:.4f}){spread}"
                )
            else:
                emit(f"final {name} loss: {ma:.4f} vs ref {mb:.4f} "
                     f"(within {tol:.3f}){spread}")
        drops_a = [c[0][0] - c[-1][0] for c in ours_curves]
        drops_b = [c[0][0] - c[-1][0] for c in ref_curves]
        emit(f"train loss drop over run: {statistics.mean(drops_a):.4f} vs "
             f"ref {statistics.mean(drops_b):.4f}")

    # Directional accuracies: per-(split, modality) means across runs.
    keys = set.intersection(*[set(o["directional"]) for o in ours]) & \
        set.intersection(*[set(r["directional"]) for r in refs])
    for key in sorted(keys):
        a_runs = [_trained_mean(o["directional"][key]) for o in ours]
        b_runs = [_trained_mean(r["directional"][key]) for r in refs]
        ma, sa = _mean_std(a_runs)
        mb, sb = _mean_std(b_runs)
        band = _band_from_spread(
            sa, sb, na, nb, floor=8.0, single_run_band=25.0
        )
        split, mod = key
        if len(a_runs) > 1:
            emit(f"  per-seed ({split}/{mod}): "
                 f"ours {[round(x, 1) for x in a_runs]} "
                 f"ref {[round(x, 1) for x in b_runs]}")
        spread = (
            f" (band {band:.1f} from spread ours {sa:.1f} ref {sb:.1f})"
            if sa is not None else f" (single-run band {band:.0f})"
        )
        if abs(ma - mb) > band:
            failures.append(
                f"directional accuracy ({split}/{mod}): mean {ma:.1f}% vs "
                f"reference {mb:.1f}% (|delta| > {band:.1f}%){spread}"
            )
        else:
            emit(f"directional ({split}/{mod}): mean {ma:.1f}% vs ref {mb:.1f}%{spread}")
    all_ref_keys = set.union(*[set(r["directional"]) for r in refs]) if refs else set()
    all_our_keys = set.union(*[set(o["directional"]) for o in ours]) if ours else set()
    missing = all_ref_keys - all_our_keys
    if missing:
        failures.append(f"directional metrics missing for {sorted(missing)}")


def _apply_sets(text: str, sets) -> str:
    """Apply `section.key=value` overrides to YAML text by rewriting the
    matching `key:` line (keys are unique within these flat configs)."""
    for spec in sets or []:
        path, _, value = spec.partition("=")
        key = path.split(".")[-1]
        pat = re.compile(rf"^(\s*{re.escape(key)}:)\s*\S.*$", re.M)
        if not pat.search(text):
            raise SystemExit(f"--set {spec}: key '{key}:' not found in config.yaml")
        text = pat.sub(rf"\1 {value}", text)
    return text


def stage_config_dir(config_dir: Path, sets, tpu_options: str, tag: str) -> Path:
    """Copy the config dir into a temp dir, applying --set overrides and (for
    our side) the --tpu-options overlay. Returns the staged dir."""
    staged = Path(tempfile.mkdtemp(prefix=f"parity_{tag}_"))
    shutil.copytree(config_dir, staged, dirs_exist_ok=True, symlinks=False)
    cfg_path = staged / "config.yaml"
    text = _apply_sets(cfg_path.read_text(), sets)
    if tpu_options:
        # later duplicate top-level keys win under yaml.safe_load, so a
        # plain append overrides any existing tpu_options block
        text = text.rstrip() + "\n\n" + tpu_options.strip() + "\n"
    cfg_path.write_text(text)
    return staged


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config_dir", type=Path)
    parser.add_argument("--reference", type=Path, default=Path("/root/reference"))
    parser.add_argument("--timeout", type=int, default=900)
    parser.add_argument("--seeds", type=int, default=1,
                        help="runs per side; >=2 derives bands from spread")
    parser.add_argument("--set", dest="sets", action="append", default=[],
                        metavar="section.key=value",
                        help="config override applied to BOTH sides")
    parser.add_argument("--tpu-options", default="",
                        help="tpu_options YAML block appended to OUR config "
                             "only (the shipped-TPU-path overlay)")
    parser.add_argument("--report", type=Path, default=None,
                        help="also write the comparison transcript to this file")
    parser.add_argument("--reference-train-drift", action="store_true",
                        help="account for the reference's in-place train-"
                             "data augmentation quirk (its train-split "
                             "losses measure progressively diffused data): "
                             "report the expected-direction final-train-"
                             "loss delta instead of failing on it")
    parser.add_argument("--patch-reference-drift", action="store_true",
                        help="drift-corrected control: monkey-patch the "
                             "reference (in-process, never on disk) so "
                             "add_rand_to_data_points works on a copy — "
                             "same RNG draws and per-batch augmentation, "
                             "no cumulative train-data diffusion")
    args = parser.parse_args()

    config_dir = args.config_dir.resolve()
    ours_dir = stage_config_dir(config_dir, args.sets, args.tpu_options, "ours")
    ref_dir = stage_config_dir(config_dir, args.sets, "", "ref")

    try:
        emit(f"== config: {config_dir} | seeds per side: {args.seeds} ==")
        if args.sets:
            emit(f"== overrides (both sides): {args.sets} ==")
        if args.tpu_options:
            emit("== tpu_options overlay (ours only) ==")
            for line in args.tpu_options.strip().splitlines():
                emit(f"   {line}")
        if args.patch_reference_drift:
            emit("== drift-corrected CONTROL: reference augmentation "
                 "patched to copy-per-call (no cumulative diffusion) ==")

        ours = []
        for s in range(args.seeds):
            emit(f"== running this framework (seed run {s + 1}/{args.seeds}) ==")
            ours.append(parse_surface(
                run_entry(REPO / "main.py", ours_dir, args.timeout, seed=s)
            ))

        vocab_sizes = [
            int(b.replace(",", "")) for _, b in ours[0]["vocab_transitions"]
        ]
        anchor = sum(math.log(v) for v in vocab_sizes)
        failures = []

        for o in ours:
            if o["step0"]:
                for name, loss in zip(("train", "val"), o["step0"]):
                    if abs(loss - anchor) > 0.25:
                        failures.append(
                            f"step-0 {name} loss {loss:.4f} far from analytic "
                            f"anchor {anchor:.4f}"
                        )
        if ours[0]["step0"]:
            emit(f"step-0 losses {ours[0]['step0']} vs analytic anchor "
                 f"sum(ln V) = {anchor:.4f}")

        refs = []
        ref_main = args.reference / "main.py"
        if ref_main.exists():
            for s in range(args.seeds):
                emit(f"== running reference (seed run {s + 1}/{args.seeds}) ==")
                try:
                    refs.append(parse_surface(
                        run_entry(ref_main, ref_dir, args.timeout, seed=s,
                                  wrap_seed=True,
                                  patch_drift=args.patch_reference_drift)
                    ))
                except Exception as e:
                    emit(f"reference run failed, skipping cross-check: {e}")
                    refs = []
                    break
        if refs:
            for key in ("vocab_transitions", "vocabularies", "splits", "parameters"):
                if ours[0][key] != refs[0][key]:
                    failures.append(
                        f"{key} mismatch:\n  ours: {ours[0][key]}\n  ref:  {refs[0][key]}"
                    )
                else:
                    emit(f"{key}: MATCH {ours[0][key]}")
            if refs[0]["step0"] and ours[0]["step0"]:
                d = abs(refs[0]["step0"][0] - ours[0]["step0"][0])
                emit(f"step-0 train loss delta vs reference: {d:.4f} (RNG differs)")
            compare_behavior(ours, refs, failures,
                             args.reference_train_drift)
        elif not ref_main.exists():
            emit("reference not found; analytic checks only")

        if failures:
            emit("\nPARITY FAILURES:")
            for f in failures:
                emit(f"  - {f}")
            rc = 1
        else:
            emit("\nPARITY OK")
            rc = 0
        if args.report:
            args.report.write_text("\n".join(_REPORT_LINES) + "\n")
        sys.exit(rc)
    finally:
        shutil.rmtree(ours_dir, ignore_errors=True)
        shutil.rmtree(ref_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
