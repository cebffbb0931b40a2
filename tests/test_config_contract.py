"""Configuration-semantics contract tests.

These pin the exact config behavior the reference's own test suite checks
(reference: tests/test_runtime_parameter_behavior.py,
tests/test_parameter_coverage.py): legacy-list extraction honors the
``enabled`` flag, outlier_percentile/exponent reach slots 10/11, round-trips
preserve every field, and SystemConfig loads every YAML parameter with the
reference defaults.
"""

import pytest
import yaml

from trade_aid_multimodal_transformer_tpu.config import (
    InputSchema,
    ProcessingStep,
    SchemaManager,
    SystemConfig,
)


def make_schema(tiny_csv, steps, **kw):
    return InputSchema(
        modality_name=kw.pop("modality_name", "Test"),
        path=str(tiny_csv),
        column_number=kw.pop("column_number", 2),
        has_header=kw.pop("has_header", True),
        processing_steps=steps,
        **kw,
    )


class TestLegacyListContract:
    def test_enabled_step_parameters_extracted(self, tiny_csv):
        schema = make_schema(
            tiny_csv,
            [
                ProcessingStep(
                    function="range_numeric_data",
                    args={"num_whole_digits": 2, "decimal_places": 1},
                    enabled=True,
                )
            ],
        )
        legacy = schema.to_legacy_list()
        assert legacy[4] == 2
        assert legacy[5] == 1

    def test_disabled_step_parameters_dropped(self, tiny_csv):
        schema = make_schema(
            tiny_csv,
            [
                ProcessingStep(
                    function="range_numeric_data",
                    args={"num_whole_digits": 2, "decimal_places": 1},
                    enabled=False,
                )
            ],
        )
        legacy = schema.to_legacy_list()
        assert legacy[4] is None
        assert legacy[5] is None
        assert legacy[3] is False  # percent flag defaults off

    def test_twelve_element_modern_format(self, tiny_csv):
        """Modern mode emits 12 elements with outlier/exponent in slots 10/11
        (reference: schema.py:238-248; verified live in SURVEY §2.3)."""
        schema = make_schema(
            tiny_csv,
            [
                ProcessingStep(
                    function="convert_to_percent_changes",
                    args={"decimal_places": 2},
                ),
                ProcessingStep(
                    function="bin_numeric_data",
                    args={"num_bins": 3, "outlier_percentile": 0.1, "exponent": 1.5},
                ),
            ],
            cross_attention=True,
            randomness_size=2,
        )
        legacy = schema.to_legacy_list()
        assert len(legacy) == 12
        assert legacy[0] == str(tiny_csv)
        assert legacy[1] == 2
        assert legacy[2] is True
        assert legacy[3] is True          # percent enabled
        assert legacy[6] == 3             # num_bins
        assert legacy[7] == 2             # randomness_size
        assert legacy[8] is True          # cross_attention
        assert legacy[9] == "Test"
        assert legacy[10] == 0.1          # outlier_percentile
        assert legacy[11] == 1.5          # exponent

    def test_mixed_enabled_multi_step(self, tiny_csv):
        schema = make_schema(
            tiny_csv,
            [
                ProcessingStep("convert_to_percent_changes", {}, enabled=False),
                ProcessingStep(
                    "bin_numeric_data",
                    {"num_bins": 5, "outlier_percentile": 1.0},
                    enabled=True,
                ),
            ],
        )
        legacy = schema.to_legacy_list()
        assert legacy[3] is False
        assert legacy[6] == 5
        assert legacy[10] == 1.0
        assert legacy[11] is None

    def test_round_trip_preserves_fields(self, tiny_csv):
        schema = make_schema(
            tiny_csv,
            [
                ProcessingStep(
                    "range_numeric_data", {"num_whole_digits": 3, "decimal_places": 2}
                )
            ],
            cross_attention=True,
            randomness_size=3,
        )
        legacy = schema.to_legacy_list()
        back = InputSchema.from_legacy_list(legacy)
        assert str(back.path) == str(schema.path)
        assert back.column_number == schema.column_number
        assert back.has_header == schema.has_header
        assert back.cross_attention == schema.cross_attention
        assert back.randomness_size == schema.randomness_size
        assert len(back.processing_steps) == 1
        assert back.processing_steps[0].function == "range_numeric_data"
        assert back.processing_steps[0].args == {
            "num_whole_digits": 3,
            "decimal_places": 2,
        }

    def test_from_legacy_builds_steps_in_order(self, tiny_csv):
        legacy = [str(tiny_csv), 2, True, True, 2, 1, 4, 1, True, "Combo"]
        schema = InputSchema.from_legacy_list(legacy)
        funcs = [s.function for s in schema.processing_steps]
        assert funcs == [
            "convert_to_percent_changes",
            "range_numeric_data",
            "bin_numeric_data",
        ]
        assert schema.randomness_size == 1
        assert schema.cross_attention is True
        assert schema.modality_name == "Combo"


class TestSchemaValidation:
    def test_missing_path_rejected(self):
        with pytest.raises(FileNotFoundError):
            InputSchema("X", "/nonexistent/file.csv", 1)

    def test_bad_column_number(self, tiny_csv):
        with pytest.raises(ValueError):
            InputSchema("X", str(tiny_csv), 0)

    def test_randomness_range(self, tiny_csv):
        with pytest.raises(ValueError):
            InputSchema("X", str(tiny_csv), 1, randomness_size=4)
        schema = InputSchema("X", str(tiny_csv), 1, randomness_size=3)
        assert schema.randomness_size == 3

    def test_unknown_function_rejected_on_validate(self, tiny_csv):
        schema = InputSchema(
            "X",
            str(tiny_csv),
            1,
            processing_steps=[ProcessingStep("no_such_function_xyz", {})],
        )
        with pytest.raises(ImportError):
            schema.validate()

    def test_bad_builtin_args_rejected(self, tiny_csv):
        schema = InputSchema(
            "X",
            str(tiny_csv),
            1,
            processing_steps=[ProcessingStep("bin_numeric_data", {})],
        )
        with pytest.raises(ValueError):
            schema.validate()  # num_bins is required


class TestSystemConfigContract:
    def test_all_yaml_parameters_load_exact(self, tmp_path):
        cfg = {
            "project_settings": {
                "project_file_path": str(tmp_path),
                "output_file_name": "out.txt",
                "model_file_name": "m.ckpt",
                "create_new_model": 1,
                "save_model": 0,
                "device": "cpu",
            },
            "data_splitting": {"validation_size": 0.25, "num_validation_files": 2},
            "training_parameters": {
                "batch_size": 16,
                "block_size": 32,
                "max_iters": 123,
                "eval_interval": 10,
                "eval_iters": 7,
                "learning_rate": 0.002,
            },
            "model_architecture": {
                "n_embd": 64,
                "n_head": 8,
                "n_layer": 3,
                "dropout": 0.15,
                "fixed_values": [-1.0, 0.0, 1.0],
            },
        }
        sc = SystemConfig.from_dict(cfg)
        assert sc.project_file_path == str(tmp_path)
        assert sc.output_file_name == "out.txt"
        assert sc.model_file_name == "m.ckpt"
        assert sc.create_new_model is True
        assert sc.save_model is False
        assert sc.device == "cpu"
        assert sc.validation_size == 0.25
        assert sc.num_validation_files == 2
        assert sc.batch_size == 16
        assert sc.block_size == 32
        assert sc.max_iters == 123
        assert sc.eval_interval == 10
        assert sc.eval_iters == 7
        assert sc.learning_rate == 0.002
        assert sc.n_embd == 64
        assert sc.n_head == 8
        assert sc.n_layer == 3
        assert sc.dropout == 0.15
        assert sc.fixed_values == [-1.0, 0.0, 1.0]

    def test_dict_round_trip(self, tmp_path):
        sc = SystemConfig.from_dict(
            {"project_settings": {"project_file_path": str(tmp_path)}}
        )
        again = SystemConfig.from_dict(sc.to_dict())
        assert sc == again

    def test_reference_defaults(self, tmp_path):
        """Defaults pinned by reference config_manager.py:112-145."""
        sc = SystemConfig.from_dict(
            {"project_settings": {"project_file_path": str(tmp_path)}}
        )
        assert sc.output_file_name == "training_log.txt"
        assert sc.model_file_name == "model.pth"
        assert sc.create_new_model is True
        assert sc.save_model is True
        assert sc.device == "cpu"
        assert sc.validation_size == 0.1
        assert sc.num_validation_files == 0
        assert sc.batch_size == 32
        assert sc.block_size == 64
        assert sc.max_iters == 5000
        assert sc.eval_interval == 500
        assert sc.eval_iters == 40
        assert sc.learning_rate == 3e-4
        assert sc.n_embd == 384
        assert sc.n_head == 6
        assert sc.n_layer == 6
        assert sc.dropout == 0.2
        assert sc.fixed_values == [-0.5, -0.2, -0.1, 0, 0.1, 0.2, 0.5]

    def test_validation_rules(self, tmp_path):
        base = {"project_settings": {"project_file_path": str(tmp_path)}}
        with pytest.raises(FileNotFoundError):
            SystemConfig.from_dict(
                {"project_settings": {"project_file_path": "/no/such/dir"}}
            )
        bad = dict(base)
        bad["data_splitting"] = {"validation_size": 1.5}
        with pytest.raises(ValueError):
            SystemConfig.from_dict(bad)
        bad = dict(base)
        bad["model_architecture"] = {"dropout": 2.0}
        with pytest.raises(ValueError):
            SystemConfig.from_dict(bad)
        bad = dict(base)
        bad["training_parameters"] = {"batch_size": 0}
        with pytest.raises(ValueError):
            SystemConfig.from_dict(bad)


class TestSchemaManagerYaml:
    def test_yaml_round_trip(self, tiny_csv, tmp_path):
        mgr = SchemaManager()
        mgr.add_schema(
            make_schema(
                tiny_csv,
                [ProcessingStep("bin_numeric_data", {"num_bins": 4})],
                cross_attention=True,
            )
        )
        out = tmp_path / "schemas.yaml"
        mgr.save_to_yaml(out)

        mgr2 = SchemaManager()
        mgr2.load_from_yaml(out)
        assert len(mgr2.schemas) == 1
        assert mgr2.schemas[0].modality_name == "Test"
        assert mgr2.schemas[0].cross_attention is True
        assert mgr2.to_legacy_format() == mgr.to_legacy_format()

    def test_empty_modalities_exits(self, tmp_path):
        out = tmp_path / "schemas.yaml"
        out.write_text(yaml.dump({"modalities": []}))
        mgr = SchemaManager()
        with pytest.raises(SystemExit):
            mgr.load_from_yaml(out)


class TestTpuOptions:
    """The optional tpu_options YAML section (framework extension): absent
    section yields reference-equivalent defaults; values plumb through to
    SystemConfig, its dict round-trip, and ModelConfig."""

    def test_defaults_without_section(self, tmp_path):
        cfg = SystemConfig.from_dict(
            {"project_settings": {"project_file_path": str(tmp_path)}}
        )
        assert cfg.compute_dtype == "float32"
        assert cfg.attn_impl == "auto"
        assert cfg.remat is False
        assert cfg.rng_impl == "auto"

    def test_section_values_load_and_round_trip(self, tmp_path):
        d = {
            "project_settings": {"project_file_path": str(tmp_path)},
            "tpu_options": {
                "compute_dtype": "bfloat16",
                "attn_impl": "pallas",
                "remat": True,
                "rng_impl": "rbg",
                "adam_moment_dtype": "bfloat16",
                "adam_nu_dtype": "bfloat16",
                "scan_unroll": 4,
                "context_parallel": 2,
                "compat_legacy_rand_index": True,
                "compat_percent_decimals_from_ranging": True,
            },
        }
        cfg = SystemConfig.from_dict(d)
        assert cfg.compute_dtype == "bfloat16"
        assert cfg.attn_impl == "pallas"
        assert cfg.remat is True
        assert cfg.rng_impl == "rbg"
        assert cfg.adam_moment_dtype == "bfloat16"
        assert cfg.context_parallel == 2
        assert cfg.compat_legacy_rand_index is True
        assert cfg.compat_percent_decimals_from_ranging is True
        rt = SystemConfig.from_dict(cfg.to_dict())
        rt_tpu = rt.to_dict()["tpu_options"]
        assert d["tpu_options"].items() <= rt_tpu.items()
        # fields not in the input round-trip their defaults
        assert rt_tpu["mesh"] == "auto"
        assert rt_tpu["pipeline_microbatches"] == 4
        assert rt_tpu["matmul_precision"] == "default"

    def test_invalid_values_rejected(self, tmp_path):
        base = {"project_settings": {"project_file_path": str(tmp_path)}}
        for section in (
            {"compute_dtype": "fp16"},
            {"attn_impl": "triton"},
            {"rng_impl": "xorshift"},
            {"adam_moment_dtype": "fp8"},
        ):
            with pytest.raises(ValueError):
                SystemConfig.from_dict({**base, "tpu_options": section})

    def test_reaches_model_config(self, tmp_path):
        from trade_aid_multimodal_transformer_tpu.models.config import ModelConfig

        sc = SystemConfig.from_dict(
            {
                "project_settings": {"project_file_path": str(tmp_path)},
                "tpu_options": {"compute_dtype": "bfloat16", "remat": True},
            }
        )
        params = {
            "n_embd": 32, "n_head": 4, "n_layer": 2, "block_size": 8,
            "dropout": 0.1, "compute_dtype": sc.compute_dtype,
            "attn_impl": sc.attn_impl, "remat": sc.remat,
        }
        mc = ModelConfig.from_modality_params(
            params, [7, 9], [[None] * 9 + ["a"], [None] * 8 + [True, "b"]]
        )
        assert mc.compute_dtype == "bfloat16"
        assert mc.remat is True
