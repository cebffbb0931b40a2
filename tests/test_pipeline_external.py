"""External and custom-registered processing functions on the LIVE path.

The reference validates external ``module.function`` names and prints them,
but never executes them (SURVEY Q5: the pipeline engine is dead on its main
path — reference: compatibility_layer.py:177-204 has no caller). Here the
ingestion pipeline actually runs every enabled step in declared order, so
external functions are a working capability — these tests pin that.
"""

import sys
import textwrap

import pytest

from trade_aid_multimodal_transformer_tpu.config.registry import (
    register_builtin_function,
    resolve_function,
    unregister_builtin_function,
    validate_function_exists,
)
from trade_aid_multimodal_transformer_tpu.config.schema import InputSchema
from trade_aid_multimodal_transformer_tpu.data.ingest import load_and_process_modality


@pytest.fixture
def ext_module(tmp_path, monkeypatch):
    """A user-supplied transforms module importable as ``userxforms``."""
    mod = tmp_path / "userxforms.py"
    mod.write_text(
        textwrap.dedent(
            """
            def double_values(data):
                return [x * 2 for x in data]

            def add_offset(data, offset=0):
                return [x + offset for x in data]
            """
        )
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    sys.modules.pop("userxforms", None)
    yield "userxforms"
    sys.modules.pop("userxforms", None)


@pytest.fixture
def csv_file(tmp_path):
    p = tmp_path / "vals.csv"
    p.write_text("v\n" + "\n".join(str(i) for i in [10, 20, 30, 40]) + "\n")
    return p


class TestExternalFunctions:
    def test_resolve_and_validate(self, ext_module):
        fn = resolve_function("userxforms.double_values")
        assert fn([1, 2]) == [2, 4]
        assert validate_function_exists("userxforms.double_values")
        assert not validate_function_exists("userxforms.nope")
        assert not validate_function_exists("no_such_module.fn")

    def test_unqualified_external_rejected(self):
        with pytest.raises(ImportError):
            resolve_function("not_a_builtin_name")

    def test_executes_in_declared_order_on_main_path(self, ext_module, csv_file):
        schema = InputSchema.from_dict(
            {
                "modality_name": "User",
                "path": str(csv_file),
                "column_number": 1,
                "has_header": True,
                "processing_steps": [
                    {"function": "userxforms.double_values", "args": {}},
                    {"function": "userxforms.add_offset", "args": {"offset": 5}},
                ],
            }
        )
        md = load_and_process_modality(schema, quiet=True)
        # (x*2)+5 — order matters: the other order would give (x+5)*2
        assert md.data == [25, 45, 65, 85]
        assert md.steps_applied == [
            "userxforms.double_values",
            "userxforms.add_offset",
        ]

    def test_disabled_steps_skipped(self, ext_module, csv_file):
        schema = InputSchema.from_dict(
            {
                "modality_name": "User",
                "path": str(csv_file),
                "column_number": 1,
                "has_header": True,
                "processing_steps": [
                    {"function": "userxforms.double_values", "args": {},
                     "enabled": False},
                    {"function": "userxforms.add_offset", "args": {"offset": 1}},
                ],
            }
        )
        md = load_and_process_modality(schema, quiet=True)
        assert md.data == [11, 21, 31, 41]


class TestCustomRegistration:
    def test_register_and_use_builtin(self, csv_file):
        register_builtin_function("negate_all", lambda data: [-x for x in data])
        try:
            schema = InputSchema.from_dict(
                {
                    "modality_name": "User",
                    "path": str(csv_file),
                    "column_number": 1,
                    "has_header": True,
                    "processing_steps": [{"function": "negate_all", "args": {}}],
                }
            )
            md = load_and_process_modality(schema, quiet=True)
            assert md.data == [-10, -20, -30, -40]
        finally:
            unregister_builtin_function("negate_all")
        assert not validate_function_exists("negate_all")
