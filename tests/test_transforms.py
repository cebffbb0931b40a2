"""Transform correctness tests, anchored on golden values from a verified run
of the reference on the demo config (SURVEY.md §6; BASELINE.md).

The reference CPU run produces: Demo Prices vocab 100 -> 57 (ranging, 2 whole
digits / 1 decimal); Demo Changes vocab 66 -> 3 with vocabulary exactly
[-3, 0, 2] (percent dp=2 + binning num_bins=3, outlier 0.1, exponent 2.2);
train/val split 80/20.
"""

import io
import math
import contextlib

import numpy as np
import pytest

from trade_aid_multimodal_transformer_tpu.data import (
    add_rand_to_data_points,
    bin_numeric_data,
    convert_to_percent_changes,
    create_train_val_datasets,
    load_file_data_cached,
    numerical_representation,
    percent_changes_lenient,
    range_numeric_data,
)


def _load_demo_column(demo_csv, convert_percents=False):
    params = [
        str(demo_csv), 13, True, convert_percents, None, 2, None, None, False,
        "demo", None, None,
    ]
    with contextlib.redirect_stdout(io.StringIO()):
        data, file_info = load_file_data_cached(params)
    return data, file_info


class TestDemoGoldenParity:
    """End-to-end transform-chain parity with the reference demo run."""

    def test_ranged_prices_vocab_57(self, demo_csv):
        data, file_info = _load_demo_column(demo_csv)
        assert len(data) == 100
        assert len(set(data)) == 100
        ranged = range_numeric_data(data, 2, 1)
        ids, vocab = numerical_representation(ranged)
        assert len(vocab) == 57
        assert ids.min() == 0 and ids.max() == 56

    def test_percent_binned_vocab_exact(self, demo_csv):
        data, _ = _load_demo_column(demo_csv, convert_percents=True)
        assert data[0] == 0.0
        assert len(set(data)) == 66
        with contextlib.redirect_stdout(io.StringIO()):
            binned = bin_numeric_data(data, 3, 0.1, 2.2)
        ids, vocab = numerical_representation(binned)
        assert vocab == [-3, 0, 2]

    def test_split_80_20(self, demo_csv):
        data, file_info = _load_demo_column(demo_csv)
        ids, _ = numerical_representation(range_numeric_data(data, 2, 1))
        train, val = create_train_val_datasets(ids, 0.2, 0, [file_info[1]])
        assert len(train) == 80
        assert len(val) == 20
        np.testing.assert_array_equal(np.concatenate([train, val]), ids)

    def test_step0_uniform_loss_anchor(self, demo_csv):
        # ln(57) + ln(3) ≈ 5.14 — the analytic init-loss anchor (SURVEY §6).
        assert math.log(57) + math.log(3) == pytest.approx(5.1417, abs=1e-3)


class TestPercentChanges:
    def test_basic(self):
        out = convert_to_percent_changes([100.0, 102.0, 51.0], 2)
        assert out == [0.0, 2.0, -50.0]

    def test_first_element_zero_and_length(self):
        data = [5.0, 7.5, 3.0, 3.0]
        out = convert_to_percent_changes(data)
        assert out[0] == 0.0
        assert len(out) == len(data)

    def test_zero_previous_raises(self):
        with pytest.raises(ZeroDivisionError):
            convert_to_percent_changes([1.0, 0.0, 2.0])

    def test_lenient_zero_emits_zero_with_warning(self, capsys):
        out = percent_changes_lenient([1.0, 0.0, 2.0], 2, "f.csv")
        assert out == [0.0, -100.0, 0.0]
        captured = capsys.readouterr().out
        assert "Warning: Zero value found at index 1" in captured

    def test_rounding_is_decimal_half_even(self):
        # 0.125% change must round like Python's round(), not np.round-on-binary.
        out = convert_to_percent_changes([1000.0, 1000.0 * (1 + 0.0200049999), 1.0], 4)
        assert out[1] == round(0.0200049999 * 100, 4)

    def test_validation(self):
        with pytest.raises(ValueError):
            convert_to_percent_changes([])
        with pytest.raises(ValueError):
            convert_to_percent_changes([1.0, "x"])
        with pytest.raises(ValueError):
            convert_to_percent_changes([1.0, 2.0], -1)


class TestRangeNumericData:
    def test_scaling_to_two_whole_digits(self):
        out = range_numeric_data([954.3, 2.13, 0.045], 2, 1)
        assert out == [95.4, 21.3, 45.0]

    def test_negative_preserved(self):
        out = range_numeric_data([-954.3, -0.05], 2, 1)
        assert out == [-95.4, -50.0]

    def test_zero_passthrough(self):
        assert range_numeric_data([0.0, 12.0], 1, 1) == [0.0, 1.2]

    def test_upper_clip_with_decimals(self):
        # 99.96 rounds to 100.0 which must clip to 99.9 (upper - 10^-dp).
        out = range_numeric_data([99.96], 2, 1)
        assert out == [99.9]

    def test_upper_clip_integer_mode(self):
        out = range_numeric_data([99.6], 2, 0)
        assert out == [99]
        assert isinstance(out[0], int)  # reference returns int at this clip

    def test_rounding_only_mode(self):
        out = range_numeric_data([1.234, 5.678], None, 1)
        assert out == [1.2, 5.7]

    def test_infer_decimals_from_data(self):
        out = range_numeric_data([123.45, 9.1], 2, None)
        assert out == [12.35, 91.0]  # element-wise precision inference

    def test_validation(self):
        with pytest.raises(TypeError):
            range_numeric_data("nope", 1, 1)
        with pytest.raises(TypeError):
            range_numeric_data([], 1, 1)
        with pytest.raises(IndexError):
            range_numeric_data([1.0, "x"], 1, 1)
        with pytest.raises(ValueError):
            range_numeric_data([1.0], 1, -1)


class TestBinNumericData:
    def _quiet(self, *args, **kw):
        with contextlib.redirect_stdout(io.StringIO()):
            return bin_numeric_data(*args, **kw)

    def test_symmetric_bins_with_zero(self):
        data = [-10.0, -5.0, -0.5, 0.0, 0.5, 5.0, 10.0]
        out = self._quiet(data, 2, 0, 1.0)
        assert out[3] == 0
        assert out[0] == -2 and out[6] == 2
        assert all(-2 <= g <= 2 for g in out)

    def test_outliers_land_in_edge_bins(self):
        data = [1.0] * 50 + [1000.0]  # extreme positive outlier
        out = self._quiet(data, 3, 5, 2.0)
        assert out[-1] == 3

    def test_half_open_boundaries(self):
        # boundary value belongs to the upper bin: [low, high)
        data = [0.25, 1.0, 2.0, 4.0]
        out = self._quiet(data, 2, 0, 2.0)  # boundaries: 0, 1, 4
        assert out == [1, 2, 2, 2]

    def test_validation(self):
        with pytest.raises(ValueError):
            self._quiet([], 3)
        with pytest.raises(ValueError):
            self._quiet([1.0], 0)
        with pytest.raises(ValueError):
            self._quiet([1.0], 3, 60)
        with pytest.raises(ValueError):
            self._quiet([1.0], 3, 5, 0.5)


class TestAddRand:
    def test_none_returns_unchanged(self):
        data = [5, 6, 7]
        assert add_rand_to_data_points(data, None, 100) is data

    def test_bounds_guard(self):
        rng = np.random.default_rng(0)
        data = list(range(10))
        out = add_rand_to_data_points(data, 2, 10, rng=rng)
        # guarded tokens: only 2 < v < 8 may shift
        for orig, new in zip(data, out):
            if not (2 < orig < 8):
                assert new == orig
            else:
                assert abs(new - orig) <= 2

    def test_shift_distribution_uniform(self):
        rng = np.random.default_rng(1)
        data = [50] * 30000
        out = np.asarray(add_rand_to_data_points(data, 1, 100, rng=rng))
        deltas, counts = np.unique(out - 50, return_counts=True)
        assert set(deltas.tolist()) == {-1, 0, 1}
        assert (np.abs(counts / 30000 - 1 / 3) < 0.02).all()

    def test_validation(self):
        with pytest.raises(ValueError):
            add_rand_to_data_points([], 1, 10)
        with pytest.raises(ValueError):
            add_rand_to_data_points([1], 5, 10)
        with pytest.raises(TypeError):
            add_rand_to_data_points([1], 1, 0)


class TestVocab:
    def test_sorted_unique(self):
        ids, vocab = numerical_representation([3.0, 1.0, 2.0, 1.0])
        assert vocab == [1.0, 2.0, 3.0]
        assert ids.tolist() == [2, 0, 1, 0]

    def test_string_vocab(self):
        ids, vocab = numerical_representation(["b", "a", "b"])
        assert vocab == ["a", "b"]
        assert ids.tolist() == [1, 0, 1]


class TestSplit:
    def test_percentage_split_truncates(self):
        data = list(range(10))
        train, val = create_train_val_datasets(data, 0.25, 0, [10])
        assert len(train) == 7  # int(10*0.75)
        assert len(val) == 3

    def test_file_based_split(self):
        data = list(range(10))
        train, val = create_train_val_datasets(data, 0.2, 1, [4, 3, 3])
        assert len(train) == 7
        assert len(val) == 3
        assert val.tolist() == [7, 8, 9]

    def test_validation(self):
        with pytest.raises(ValueError):
            create_train_val_datasets([1, 2, 3], 0.2, 0, [2])  # length mismatch
        with pytest.raises(ValueError):
            create_train_val_datasets([1, 2], 1.5, 0, [2])
        with pytest.raises(ValueError):
            create_train_val_datasets([1, 2], 0.2, 3, [1, 1])
