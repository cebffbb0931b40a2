"""Compat tests for reference public-API surface that the main path does not
use, so each piece has a test-backed parity justification (VERDICT r1 item 9):

- the legacy strict loader ``data.loader.load_file_data`` (reference:
  data_utils.py:34-160, dead on the reference's main path — its Quirk Q7 —
  but part of its public API),
- the lazy config accessors (reference: config_utils.py:8-69),
- the experimental FixedEmbedding / long_tanh pieces (reference:
  model.py:247-282, never instantiated by the reference's active model).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trade_aid_multimodal_transformer_tpu.data.loader import load_file_data


class TestStrictLoader:
    """Reference Quirk Q7: exactly-10-param legacy loader semantics."""

    def test_requires_exactly_ten_params(self, demo_csv):
        # modern 12-element lists are rejected (reference: data_utils.py:57)
        params12 = [str(demo_csv), 13, True, False, 2, 1, None, None, True,
                    "Demo", None, None]
        with pytest.raises(ValueError, match="10 elements"):
            load_file_data(params12)
        with pytest.raises(ValueError, match="10 elements"):
            load_file_data(params12[:9])

    def test_type_validation(self, demo_csv):
        base = [str(demo_csv), 13, True, False, None, None, None, None, True, "Demo"]
        with pytest.raises(TypeError, match="Path"):
            load_file_data([123] + base[1:])
        with pytest.raises(TypeError, match="column number"):
            load_file_data([base[0], "13"] + base[2:])
        with pytest.raises(ValueError, match="greater than or equal to 1"):
            load_file_data([base[0], 0] + base[2:])
        with pytest.raises(TypeError, match="header"):
            load_file_data(base[:2] + [1] + base[3:])

    def test_loads_demo_column(self, demo_csv):
        params = [str(demo_csv), 13, True, False, None, None, None, None, True, "Demo"]
        data, file_info = load_file_data(params)
        assert len(data) == 100
        assert file_info == ["demo_stock.csv", 100]

    def test_percent_conversion_strict(self, demo_csv):
        params = [str(demo_csv), 13, True, True, None, 2, None, None, True, "Demo"]
        data, _ = load_file_data(params)
        assert data[0] == 0.0  # first element resets
        assert all(isinstance(v, float) for v in data)


class TestConfigAccessors:
    """Reference config_utils getters resolve through the compat layer and
    cache the first read (reference: config_utils.py:11-24)."""

    def test_getters_read_legacy_config(self, tmp_path, monkeypatch):
        from trade_aid_multimodal_transformer_tpu.config import accessors
        from trade_aid_multimodal_transformer_tpu.config.compat import (
            reset_compatibility_layer,
        )

        (tmp_path / "config.py").write_text(
            "batch_size=7\nblock_size=5\nmax_iters=10\neval_interval=5\n"
            "eval_iters=3\nlearning_rate=0.001\ndevice='cpu'\nn_embd=16\n"
            "n_head=2\nn_layer=1\ndropout=0.25\nvalidation_size=0.1\n"
            "num_validation_files=0\ncreate_new_model=1\nsave_model=0\n"
            "model_file_name='m.ckpt'\nproject_file_path='./'\n"
            "output_file_name=''\nfixed_values=[-0.5, 0.5]\n"
            "input_schema_1=None\n"
        )
        monkeypatch.chdir(tmp_path)
        monkeypatch.syspath_prepend(str(tmp_path))
        reset_compatibility_layer()
        accessors.reset_config_cache()
        try:
            assert accessors._get_batch_size() == 7
            assert accessors._get_block_size() == 5
            assert accessors._get_eval_iters() == 3
            assert accessors._get_n_embd() == 16
            assert accessors._get_n_head() == 2
            assert accessors._get_n_layer() == 1
            assert accessors._get_dropout() == 0.25
            assert accessors._get_device() == "cpu"
            assert accessors._get_fixed_values() == [-0.5, 0.5]
            # cached: same dict object on second read
            assert accessors._get_config() is accessors._get_config()
        finally:
            reset_compatibility_layer()
            accessors.reset_config_cache()


class TestExperimental:
    """FixedEmbedding / long_tanh numerics (reference: model.py:247-282)."""

    def test_fixed_embedding_values_come_from_fixed_values(self):
        from trade_aid_multimodal_transformer_tpu.models.experimental import (
            fixed_embedding_lookup,
            make_fixed_embedding_table,
        )

        fixed_values = [-0.5, -0.2, 0.0, 0.2, 0.5]
        table = make_fixed_embedding_table(
            jax.random.PRNGKey(0), vocab_size=11, embed_size=8,
            fixed_values=fixed_values,
        )
        assert table.shape == (11, 8)
        allowed = np.asarray(fixed_values, dtype=np.float32)
        assert np.isin(np.asarray(table), allowed).all()

        tokens = jnp.array([[0, 3], [10, 7]], dtype=jnp.int32)
        out = fixed_embedding_lookup(table, tokens)
        assert out.shape == (2, 2, 8)
        np.testing.assert_array_equal(np.asarray(out[0, 0]), np.asarray(table[0]))
        np.testing.assert_array_equal(np.asarray(out[1, 0]), np.asarray(table[10]))

    def test_long_tanh_truncates_to_zero(self):
        from trade_aid_multimodal_transformer_tpu.models.experimental import long_tanh

        x = jnp.array([-3.0, -0.5, 0.0, 0.5, 3.0])
        out = long_tanh(x)
        # tanh in (-1, 1), integer truncation -> all zeros (the reference's
        # torch.tanh(x).long() does the same)
        assert jnp.issubdtype(out.dtype, jnp.integer)
        np.testing.assert_array_equal(np.asarray(out), np.zeros(5, dtype=out.dtype))
