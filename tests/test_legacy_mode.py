"""Programmatic ('legacy') configuration mode end-to-end.

Without YAML files in the CWD, configuration comes from a ``config.py``
module defining hyperparameter globals and ``input_schema_N`` positional
lists (reference: config.py:39-93, compatibility_layer.py:63-99).
"""

import shutil
import sys
from pathlib import Path

import pytest

from trade_aid_multimodal_transformer_tpu.config.accessors import reset_config_cache
from trade_aid_multimodal_transformer_tpu.config.compat import reset_compatibility_layer

REPO = Path(__file__).resolve().parent.parent

CONFIG_PY = """
batch_size = 4
block_size = 4
max_iters = 2
eval_interval = 25
eval_iters = 2
learning_rate = 1e-3
device = 'cpu'
n_embd = 32
n_head = 4
n_layer = 2
dropout = 0.1
fixed_values = [-0.5, 0, 0.5]
project_file_path = './'
model_file_name = 'output/legacy_model.ckpt'
output_file_name = ''
validation_size = 0.2
num_validation_files = 0
create_new_model = 1
save_model = 0

num_input_schemas = 10
input_schema_1 = ['./demo_stock.csv', 13, True, False, 2, 1, None, None, True, 'Prices']
input_schema_2 = ['./demo_stock.csv', 13, True, True, None, 2, 3, None, False, 'Changes']
input_schema_3 = []
input_schema_4 = []
input_schema_5 = []
input_schema_6 = []
input_schema_7 = []
input_schema_8 = []
input_schema_9 = []
input_schema_10 = []
"""


@pytest.fixture
def legacy_workdir(tmp_path, monkeypatch):
    (tmp_path / "config.py").write_text(CONFIG_PY)
    shutil.copy(
        REPO / "examples" / "demo_data" / "demo_stock.csv", tmp_path / "demo_stock.csv"
    )
    monkeypatch.chdir(tmp_path)
    monkeypatch.syspath_prepend(str(tmp_path))
    sys.modules.pop("config", None)
    reset_compatibility_layer()
    reset_config_cache()
    yield tmp_path
    sys.modules.pop("config", None)
    reset_compatibility_layer()
    reset_config_cache()


def test_legacy_mode_end_to_end(legacy_workdir, capsys):
    from trade_aid_multimodal_transformer_tpu.train.runner import run_training

    result = run_training(caller_globals={}, seed=0)
    out = capsys.readouterr().out

    assert "Configuration: Programmatic mode detected" in out
    assert "Modalities: Loaded 2 configurations" in out
    # same demo data => same golden vocabularies; legacy mode uses the
    # function defaults for binning extras via main-path rules (0.1 / 2.2)
    vocabs = result["vocabularies"]
    assert len(vocabs[0]) == 57
    assert vocabs[1] == [-3, 0, 2]
    assert "Train 80 | Val 20" in out
    assert "TRAINING COMPLETED SUCCESSFULLY" in out


def test_legacy_system_parameters(legacy_workdir):
    from trade_aid_multimodal_transformer_tpu.config.compat import (
        get_system_configuration,
        initialize_compatibility_layer,
        is_legacy_mode,
    )

    mode = initialize_compatibility_layer({})
    assert mode == "legacy"
    assert is_legacy_mode()
    sc = get_system_configuration()
    assert sc["batch_size"] == 4
    assert sc["n_embd"] == 32
    assert sc["device"] == "cpu"
