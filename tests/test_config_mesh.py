"""Config-native multi-device training: tpu_options.mesh through run_training.

The reference contract is zero-flag, config-only operation
(reference: main.py:29-64, README.md:959-961); the reference itself is
single-device. These tests pin the net-new guarantee that a mesh declared in
config.yaml drives DP/TP/modality/pipeline parallelism through the SAME
``python main.py`` path, loss-equivalent to the single-device run (same
seed => same batch draws => same math up to float reassociation).

Runs on the 8-device virtual CPU mesh (conftest).
"""

import math
import shutil
from pathlib import Path

import pytest

from trade_aid_multimodal_transformer_tpu.config.accessors import reset_config_cache
from trade_aid_multimodal_transformer_tpu.config.compat import reset_compatibility_layer
from trade_aid_multimodal_transformer_tpu.parallel.resolve import plan_mesh

REPO = Path(__file__).resolve().parent.parent


# ---------------------------------------------------------------------------
# plan_mesh unit semantics
# ---------------------------------------------------------------------------

class TestPlanMesh:
    def _plan(self, mesh_cfg, cp=1, **over):
        kw = dict(
            batch_size=8, block_size=8, n_head=4, num_modalities=2,
            n_layer=2, devices=list(range(8)),
        )
        kw.update(over)
        return plan_mesh(mesh_cfg, cp, **kw)

    def test_auto_uses_all_devices_when_batch_divides(self):
        p = self._plan("auto")
        assert (p.data, p.model, p.mod, p.pipe, p.seq) == (8, 1, 1, 1, 1)
        assert not p.trivial

    def test_auto_falls_back_to_largest_dividing_batch(self):
        p = self._plan("auto", batch_size=6)
        assert p.data == 6
        p = self._plan("auto", batch_size=5)
        assert p.data == 5
        p = self._plan("auto", batch_size=7)
        assert p.data == 7

    def test_auto_single_device_is_trivial(self):
        p = self._plan("auto", devices=[0])
        assert p.trivial

    def test_off_is_trivial(self):
        assert self._plan("off").trivial

    def test_auto_composes_with_context_parallel(self):
        p = self._plan("auto", cp=2)
        assert p.seq == 2
        assert p.data == 4
        assert p.n_devices == 8

    def test_int_shorthand(self):
        p = self._plan(4)
        assert p.data == 4 and p.n_devices == 4

    def test_explicit_dict(self):
        p = self._plan({"data": 2, "model": 2, "mod": 2})
        assert (p.data, p.model, p.mod) == (2, 2, 2)
        assert p.n_devices == 8

    def test_explicit_over_budget_raises(self):
        with pytest.raises(ValueError, match="devices"):
            self._plan({"data": 16})

    def test_explicit_batch_divisibility_raises(self):
        with pytest.raises(ValueError, match="batch_size"):
            self._plan({"data": 3})

    def test_mod_divisibility_raises(self):
        with pytest.raises(ValueError, match="modality"):
            self._plan({"mod": 3}, num_modalities=2, batch_size=9)

    def test_pipe_layer_divisibility_raises(self):
        with pytest.raises(ValueError, match="n_layer"):
            self._plan({"pipe": 3}, n_layer=2)

    def test_pipe_microbatch_divisibility_raises(self):
        with pytest.raises(ValueError, match="microbatches"):
            self._plan({"pipe": 2, "data": 2}, pipeline_microbatches=3)

    def test_unknown_axis_raises(self):
        with pytest.raises(ValueError, match="unknown"):
            self._plan({"rows": 2})

    def test_mesh_builds(self):
        import jax

        p = plan_mesh(
            {"data": 2, "model": 2, "mod": 2}, 1,
            batch_size=8, block_size=8, n_head=4, num_modalities=2,
            n_layer=2, devices=jax.devices(),
        )
        mesh = p.build()
        assert dict(mesh.shape) == {"mod": 2, "data": 2, "model": 2}


# ---------------------------------------------------------------------------
# run_training end-to-end through the config surface
# ---------------------------------------------------------------------------

@pytest.fixture
def demo_workdir(tmp_path, monkeypatch):
    shutil.copy(REPO / "examples" / "demo_config.yaml", tmp_path / "config.yaml")
    shutil.copy(
        REPO / "examples" / "demo_input_schemas.yaml", tmp_path / "input_schemas.yaml"
    )
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


def _run_with_tpu_options(workdir, tpu_options_yaml: str, batch_size: int = None):
    """Rewrite config.yaml with the given tpu_options block and run 2 iters."""
    base = (REPO / "examples" / "demo_config.yaml").read_text()
    base = base.replace("max_iters: 50", "max_iters: 2")
    base = base.replace("eval_interval: 25", "eval_interval: 25\n  eval_iters: 2")
    if batch_size is not None:
        base = base.replace("batch_size: 4", f"batch_size: {batch_size}")
    (workdir / "config.yaml").write_text(base + "\n" + tpu_options_yaml)
    reset_compatibility_layer()
    reset_config_cache()

    from trade_aid_multimodal_transformer_tpu.train.runner import run_training

    return run_training(caller_globals={}, seed=0)


@pytest.fixture(scope="module")
def oracle_losses(tmp_path_factory):
    """Single-device (mesh: off) run — the equivalence oracle."""
    tmp = tmp_path_factory.mktemp("mesh_oracle")
    shutil.copy(REPO / "examples" / "demo_config.yaml", tmp / "config.yaml")
    shutil.copy(
        REPO / "examples" / "demo_input_schemas.yaml", tmp / "input_schemas.yaml"
    )
    (tmp / "examples" / "demo_data").mkdir(parents=True)
    shutil.copy(
        REPO / "examples" / "demo_data" / "demo_stock.csv",
        tmp / "examples" / "demo_data" / "demo_stock.csv",
    )
    import os

    prev = os.getcwd()
    os.chdir(tmp)
    try:
        result = _run_with_tpu_options(tmp, "tpu_options:\n  mesh: off\n")
    finally:
        os.chdir(prev)
        reset_compatibility_layer()
        reset_config_cache()
    return dict(result["losses"])


def _check_losses(result, oracle, tol):
    for split in ("train", "val"):
        assert not math.isnan(result["losses"][split])
        assert result["losses"][split] == pytest.approx(oracle[split], abs=tol)


def test_mesh_data4_loss_equivalent(demo_workdir, oracle_losses, capsys):
    result = _run_with_tpu_options(
        demo_workdir, "tpu_options:\n  mesh:\n    data: 4\n"
    )
    out = capsys.readouterr().out
    assert "Parallelism: data x4 over 4 devices" in out
    _check_losses(result, oracle_losses, tol=1e-3)


def test_mesh_data8_loss_equivalent(demo_workdir, capsys):
    """Full-width DP over all 8 virtual devices (batch raised to 8 so it
    divides), against its own single-device oracle."""
    oracle = _run_with_tpu_options(
        demo_workdir, "tpu_options:\n  mesh: off\n", batch_size=8
    )
    result = _run_with_tpu_options(
        demo_workdir, "tpu_options:\n  mesh:\n    data: 8\n", batch_size=8
    )
    out = capsys.readouterr().out
    assert "Parallelism: data x8 over 8 devices" in out
    _check_losses(result, dict(oracle["losses"]), tol=1e-3)


def test_fsdp_loss_equivalent(demo_workdir, oracle_losses, capsys):
    """tpu_options.fsdp (ZeRO-3 param+optimizer sharding over 'data') from
    the zero-flag config surface: trajectory identical to single-device."""
    result = _run_with_tpu_options(
        demo_workdir, "tpu_options:\n  mesh:\n    data: 4\n  fsdp: true\n"
    )
    out = capsys.readouterr().out
    assert "Parallelism: data x4 (fsdp/zero-3) over 4 devices" in out
    _check_losses(result, oracle_losses, tol=1e-3)


def test_mesh_auto_engages_multi_device(demo_workdir, capsys):
    result = _run_with_tpu_options(demo_workdir, "")  # default mesh: auto
    out = capsys.readouterr().out
    # demo batch_size=4 on 8 virtual devices -> largest divisor = 4
    assert "Parallelism: data x4 over 4 devices" in out
    assert result["losses"]["train"] == pytest.approx(
        math.log(57) + math.log(3), abs=0.15
    )


def test_mesh_dp_tp_mod_loss_equivalent(demo_workdir, oracle_losses, capsys):
    result = _run_with_tpu_options(
        demo_workdir,
        "tpu_options:\n  mesh:\n    data: 2\n    model: 2\n    mod: 2\n",
    )
    out = capsys.readouterr().out
    assert "Parallelism: modality x2 * data x2 * tensor x2 over 8 devices" in out
    _check_losses(result, oracle_losses, tol=1e-3)


def test_mesh_pipeline_runs(demo_workdir, capsys):
    """Pipeline parallelism from config: loss stays near the analytic anchor
    (the pipeline dropout key schedule differs by design, so exact
    equivalence to the oracle is not expected)."""
    result = _run_with_tpu_options(
        demo_workdir,
        "tpu_options:\n  mesh:\n    pipe: 2\n    data: 2\n"
        "  pipeline_microbatches: 2\n",
    )
    out = capsys.readouterr().out
    assert "Parallelism: pipeline x2 * data x2 over 4 devices" in out
    assert result["losses"]["train"] == pytest.approx(
        math.log(57) + math.log(3), abs=0.15
    )


def test_mesh_with_context_parallel_composes(demo_workdir, oracle_losses, capsys):
    result = _run_with_tpu_options(
        demo_workdir,
        "tpu_options:\n  mesh:\n    data: 2\n  context_parallel: 2\n",
    )
    out = capsys.readouterr().out
    assert "Parallelism: data x2 * context x2 over 4 devices" in out
    _check_losses(result, oracle_losses, tol=1e-3)


def test_matmul_precision_knob(demo_workdir):
    """tpu_options.matmul_precision plumbs through run_training (on CPU f32
    matmuls are already exact, so this checks the scope wires up and the
    result stays loss-equivalent)."""
    result = _run_with_tpu_options(
        demo_workdir,
        "tpu_options:\n  mesh: off\n  matmul_precision: float32\n",
    )
    assert result["losses"]["train"] == pytest.approx(
        math.log(57) + math.log(3), abs=0.15
    )


def test_multihost_flag_single_process_graceful(demo_workdir, capsys):
    """tpu_options.multihost on a lone host (no pod metadata, no
    coordinator env): training must continue single-process with a printed
    note, not die — the soft-failure policy of the reference (SURVEY §5.3)."""
    result = _run_with_tpu_options(
        demo_workdir, "tpu_options:\n  mesh: off\n  multihost: true\n"
    )
    out = capsys.readouterr().out
    assert "Multi-host:" in out
    assert result["losses"]["train"] == pytest.approx(
        math.log(57) + math.log(3), abs=0.15
    )
