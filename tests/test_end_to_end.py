"""End-to-end workflow test: the demo config through run_training.

Pins the reference's golden demo values (SURVEY §6 / BASELINE.md): vocab
sizes [57, 3] with Demo Changes vocabulary exactly [-3, 0, 2], 80/20 split,
step-0 summed loss ≈ ln(57) + ln(3) ≈ 5.14, and the training-log file
structure.
"""

import math
import os
import shutil
from pathlib import Path

import pytest

from trade_aid_multimodal_transformer_tpu.config.accessors import reset_config_cache
from trade_aid_multimodal_transformer_tpu.config.compat import reset_compatibility_layer

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture
def demo_workdir(tmp_path, monkeypatch):
    """A working directory laid out like a user's demo project."""
    shutil.copy(REPO / "examples" / "demo_config.yaml", tmp_path / "config.yaml")
    shutil.copy(
        REPO / "examples" / "demo_input_schemas.yaml", tmp_path / "input_schemas.yaml"
    )
    # make ./examples/demo_data/... resolve
    (tmp_path / "examples" / "demo_data").mkdir(parents=True)
    shutil.copy(
        REPO / "examples" / "demo_data" / "demo_stock.csv",
        tmp_path / "examples" / "demo_data" / "demo_stock.csv",
    )
    monkeypatch.chdir(tmp_path)
    reset_compatibility_layer()
    reset_config_cache()
    yield tmp_path
    reset_compatibility_layer()
    reset_config_cache()


def test_demo_run_end_to_end(demo_workdir, capsys):
    # shrink the run so the test stays fast: 2 iters, 2 eval iters
    cfg_text = (demo_workdir / "config.yaml").read_text()
    cfg_text = cfg_text.replace("max_iters: 50", "max_iters: 2")
    cfg_text = cfg_text.replace("eval_interval: 25", "eval_interval: 25\n  eval_iters: 2")
    (demo_workdir / "config.yaml").write_text(cfg_text)

    from trade_aid_multimodal_transformer_tpu.train.runner import run_training

    result = run_training(caller_globals={}, seed=0)
    out = capsys.readouterr().out

    # golden vocabulary values
    vocabs = result["vocabularies"]
    assert len(vocabs[0]) == 57
    assert vocabs[1] == [-3, 0, 2]

    # console surface
    assert "TRADE-AID MULTIMODAL TRANSFORMER" in out
    assert "Configuration: YAML mode detected" in out
    assert "Modalities: Loaded 2 configurations" in out
    assert "Vocab size: 100 -> 57" in out
    assert "Vocab size: 66 -> 3" in out
    assert "Vocabulary: [-3, 0, 2]" in out
    assert "Train 80 | Val 20" in out
    assert "Parameters: 0.1M" in out
    assert "DIRECTIONAL METRICS - Train Set (Correct/Total)" in out
    assert "LOSS METRICS: Step 0/2 | Train:" in out
    assert "TRAINING COMPLETED SUCCESSFULLY" in out

    # analytic step-0 loss anchor: ln(57) + ln(3)
    losses = result["losses"]
    assert losses["train"] == pytest.approx(math.log(57) + math.log(3), abs=0.15)

    # log file surface
    log = (demo_workdir / "examples" / "output" / "demo_training_log.txt").read_text()
    assert "TRADE-AID MULTIMODAL TRANSFORMER TRAINING LOG" in log
    assert "--- TRAINING & EVALUATION RESULTS ---" in log
    assert "DIRECTIONAL PREDICTION Train Set - Demo Prices" in log
    assert "STEP 0/2" in log
