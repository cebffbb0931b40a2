"""Reference-quirk compat flags, end-to-end through ``run_training``.

SURVEY §7 policy: each faithful-vs-fixed choice must be a config-surface flag
with tests on both sides through the real entry point.

- Q1 (``tpu_options.compat_legacy_rand_index``): the reference reads the
  augmentation size from legacy-list slot [2] (has_header) instead of [7]
  (randomness_size) (reference: training_utils.py:353), so with
  ``has_header: true`` ±1 augmentation silently applies to EVERY modality.
- Percent-decimals quirk (``tpu_options.compat_percent_decimals_from_ranging``):
  the reference's loader rounds percent changes to the *ranging* step's
  decimal_places — legacy slot [5] — with a falsy-check fallback to 2
  (reference: file_cache.py:271,302), not the percent step's own argument.

Also pins pipeline honesty (VERDICT r1 item 5): a real ``run_training`` demo
run populates ``config.pipeline.default_pipeline.execution_history`` — the
engine IS the single main-path executor, unlike the reference where it is
dead code (SURVEY Quirk Q5).
"""

import shutil
from pathlib import Path

import pytest

from trade_aid_multimodal_transformer_tpu.config.accessors import reset_config_cache
from trade_aid_multimodal_transformer_tpu.config.compat import reset_compatibility_layer
from trade_aid_multimodal_transformer_tpu.config.pipeline import default_pipeline

REPO = Path(__file__).resolve().parent.parent

DEMO_CONFIG_SMALL = """\
project_settings:
  project_file_path: "./"
  output_file_name: ""
  model_file_name: "model.ckpt"
  create_new_model: 1
  save_model: 0
  device: 'cpu'
data_splitting:
  validation_size: 0.2
  num_validation_files: 0
training_parameters:
  batch_size: 4
  block_size: 4
  max_iters: 1
  eval_interval: 25
  eval_iters: 1
  learning_rate: 0.001
model_architecture:
  n_embd: 16
  n_head: 2
  n_layer: 1
  dropout: 0.0
{tpu_options}
"""

PERCENT_RANGING_SCHEMAS = """\
modalities:
  - modality_name: "Pct Then Range"
    path: "./examples/demo_data/demo_stock.csv"
    column_number: 13
    has_header: true
    processing_steps:
      - function: convert_to_percent_changes
        args:
          decimal_places: 1
        enabled: true
      - function: range_numeric_data
        args:
          decimal_places: 4
        enabled: true
    cross_attention: false
    randomness_size: null
  - modality_name: "Companion"
    path: "./examples/demo_data/demo_stock.csv"
    column_number: 13
    has_header: true
    processing_steps: []
    cross_attention: false
    randomness_size: 2
"""


def _make_workdir(tmp_path, tpu_options: str, schemas_text: str = None):
    (tmp_path / "config.yaml").write_text(
        DEMO_CONFIG_SMALL.format(tpu_options=tpu_options)
    )
    if schemas_text is None:
        shutil.copy(
            REPO / "examples" / "demo_input_schemas.yaml",
            tmp_path / "input_schemas.yaml",
        )
    else:
        (tmp_path / "input_schemas.yaml").write_text(schemas_text)
    (tmp_path / "examples" / "demo_data").mkdir(parents=True, exist_ok=True)
    shutil.copy(
        REPO / "examples" / "demo_data" / "demo_stock.csv",
        tmp_path / "examples" / "demo_data" / "demo_stock.csv",
    )


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    reset_compatibility_layer()
    reset_config_cache()
    yield tmp_path
    reset_compatibility_layer()
    reset_config_cache()


def _run(workdir, tpu_options: str, schemas_text: str = None):
    _make_workdir(workdir, tpu_options, schemas_text)
    reset_compatibility_layer()
    reset_config_cache()
    from trade_aid_multimodal_transformer_tpu.train.runner import run_training

    return run_training(caller_globals={}, seed=0)


class TestLegacyRandIndexFlag:
    """Q1 through the real entry point: the feed's resolved rand sizes."""

    def test_intent_by_default(self, workdir):
        result = _run(workdir, "")
        # demo schemas: randomness_size null for both -> no augmentation
        assert result["feed"].rand_sizes == [None, None]

    def test_reference_behavior_with_flag(self, workdir, monkeypatch):
        reset_compatibility_layer()
        result = _run(
            workdir,
            "tpu_options:\n  compat_legacy_rand_index: true",
        )
        # has_header=true in both demo schemas -> slot [2]=True -> rand=1
        # for EVERY modality, the reference's silent ±1 augmentation
        assert result["feed"].rand_sizes == [1, 1]

    def test_flag_reads_slot7_when_off(self, workdir):
        result = _run(workdir, "", schemas_text=PERCENT_RANGING_SCHEMAS)
        assert result["feed"].rand_sizes == [None, 2]


class TestPercentDecimalsFlag:
    """Percent rounding source: percent step's own decimal_places (intent)
    vs the ranging step's (reference slot-[5] quirk)."""

    def _percent_values(self, result):
        # first modality's processed data, pre-tokenization
        return result["modalities"][0].data

    def test_intent_uses_percent_steps_own_decimals(self, workdir):
        result = _run(workdir, "", schemas_text=PERCENT_RANGING_SCHEMAS)
        vals = self._percent_values(result)
        # percent rounded to 1dp, then ranging rounds to 4dp (no-op):
        # every value has at most 1 decimal digit
        assert all(round(v, 1) == v for v in vals)

    def test_flag_uses_ranging_decimals(self, workdir):
        result_off = _run(workdir, "", schemas_text=PERCENT_RANGING_SCHEMAS)
        reset_compatibility_layer()
        reset_config_cache()
        result_on = _run(
            workdir,  # same dir, configs rewritten
            "tpu_options:\n  compat_percent_decimals_from_ranging: true",
            schemas_text=PERCENT_RANGING_SCHEMAS,
        )
        vals_on = self._percent_values(result_on)
        vals_off = self._percent_values(result_off)
        # flag on: percent rounds to the RANGING step's 4 decimals -> finer
        # values survive; the two paths must actually differ
        assert vals_on != vals_off
        assert any(round(v, 1) != v for v in vals_on)

    def test_flag_falsy_fallback_to_2(self, workdir):
        """No ranging step (demo schemas): slot [5] is None -> reference's
        falsy check falls back to 2, matching the demo's own percent dp=2 —
        the flag must not change the golden demo vocabulary."""
        result = _run(
            workdir,
            "tpu_options:\n  compat_percent_decimals_from_ranging: true",
        )
        assert result["vocabularies"][1] == [-3, 0, 2]


class TestPipelineEngineIsLive:
    """VERDICT r1 item 5: one ingestion path, driven by the pipeline engine."""

    def test_execution_history_populated_by_run_training(self, workdir):
        default_pipeline.clear_history()
        _run(workdir, "")
        history = default_pipeline.execution_history
        # demo: 2 modalities -> 2 executions (ranging; percent+bin)
        assert len(history) == 2
        assert history[0].success and history[1].success
        assert history[0].successful_steps == 1
        assert history[1].successful_steps == 2
        assert any("range_numeric_data" in line for line in history[0].execution_log)
        assert any(
            "Per-file-segment built-in" in line for line in history[1].execution_log
        )
