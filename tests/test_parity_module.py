"""Unit tests for the shared driver-exact comparison helpers.

These lock in the exact semantics that shipped q40 red in round 3: an
int64 4833 and a float64 4833.0 are == in Python but hash differently
once the driver stringifies them, so the gate must flag them.
"""

import numpy as np
import pandas as pd
import pytest

from duckdb_ddsketch_spark.plans.parity import (
    canon_cell,
    dtype_kind,
    frame_mismatches,
    normalize,
)


def test_canon_cell_preserves_int_float_distinction():
    assert canon_cell(4833) != canon_cell(4833.0)
    assert canon_cell(np.int64(4833)) == canon_cell(4833)
    assert canon_cell(np.float64(4833.0)) == canon_cell(4833.0)


def test_canon_cell_nulls_and_nan_collapse():
    assert canon_cell(None) == "NULL"
    assert canon_cell(float("nan")) == "NULL"
    assert canon_cell(pd.NaT) == "NULL"


def test_canon_cell_bytes_bool_strings():
    assert canon_cell(b"\x00\xff") == "00ff"
    assert canon_cell(bytearray(b"\x00\xff")) == "00ff"
    assert canon_cell(True) == "True"
    assert canon_cell(np.bool_(True)) == "True"
    # bool is not canonicalized as int
    assert canon_cell(True) != canon_cell(1)
    assert canon_cell("x") == "x"


def test_frame_mismatches_flags_hugeint_widening():
    """The round-3 q40 shape: Spark BIGINT vs a HUGEINT the oracle's pandas
    conversion widened to float64 — values ==-equal, driver hash red."""
    s = pd.DataFrame({"vec_id_sum": pd.Series([4833], dtype="int64")})
    o = pd.DataFrame({"vec_id_sum": pd.Series([4833.0], dtype="float64")})
    kinds, values = frame_mismatches(normalize(s), normalize(o))
    assert kinds == [("vec_id_sum", "int64", "float64")]
    assert values  # the stringified values differ too


def test_frame_mismatches_exact_float_no_tolerance():
    s = pd.DataFrame({"x": [1.0000001]})
    o = pd.DataFrame({"x": [1.0000002]})
    kinds, values = frame_mismatches(normalize(s), normalize(o))
    assert not kinds and len(values) == 1


def test_frame_mismatches_equal_frames_clean():
    df = pd.DataFrame({"a": [1, 2], "b": ["x", None], "c": [1.5, float("nan")]})
    kinds, values = frame_mismatches(normalize(df.copy()), normalize(df.copy()))
    assert not kinds and not values


def test_frame_mismatches_refuses_misaligned_frames():
    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"x": [1]})
    with pytest.raises(ValueError, match="not aligned"):
        frame_mismatches(a, b)


def test_dtype_kind_unsigned_folds_to_int():
    assert dtype_kind(pd.Series([1], dtype="uint32")) == "i"
    assert dtype_kind(pd.Series([1], dtype="int64")) == "i"
    assert dtype_kind(pd.Series([1.0])) == "f"
