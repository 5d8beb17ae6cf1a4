"""Unit tests for tools/driver_check.py's pandas canonicalization — the
layer that must mirror the external grader. These run without Spark: they
pin the exact failure modes the grader exhibited in CORRECTNESS_r02
(HUGEINT dtype drift on q_sql_tpch_q12, list-cell TypeError on
q_media_frames) so the local gate can never silently stop catching them.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from driver_check import _canon_pdf, _dtype_kinds, value_hash  # noqa: E402


def test_hugeint_sum_degrades_to_float64_kind():
    """DuckDB sum(int) is HUGEINT; through .df() it lands as float64
    while a CAST(... AS BIGINT) lands as int64 — the exact divergence
    behind the repo's only-ever driver hash failure (q12, r2)."""
    con = duckdb.connect()
    raw = con.execute(
        "SELECT sum(x) AS s FROM (VALUES (1),(2)) t(x)").df()
    cast = con.execute(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1),(2)) t(x)").df()
    assert _dtype_kinds(raw)["s"] == "f"
    assert _dtype_kinds(cast)["s"] == "i"
    spark_like = pd.DataFrame([(3,)], columns=["s"])
    assert _dtype_kinds(spark_like)["s"] == "i"
    assert _dtype_kinds(raw)["s"] != _dtype_kinds(spark_like)["s"]


def test_list_cells_raise_like_the_driver():
    """An array-valued result column must raise TypeError in
    canonicalization (pandas sort_values factorizes cells) — the failure
    that turned q_media_frames into an `err` row at the grader."""
    pdf = pd.DataFrame({"a": [1, 2], "v": [[1.0, 2.0], [3.0]]})
    with pytest.raises(TypeError):
        _canon_pdf(pdf)


def test_canon_sorts_columns_and_rows():
    a = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
    out = _canon_pdf(a)
    assert list(out.columns) == ["a", "b"]
    assert list(out["a"]) == ["x", "y"]


def test_value_hash_order_insensitive():
    cols = ["a", "b"]
    r1 = [(1, "x"), (2, "y")]
    r2 = [(2, "y"), (1, "x")]
    assert value_hash(cols, r1) == value_hash(cols, r2)
    # column order must not matter either (sorted by name before hashing)
    assert value_hash(["b", "a"], [("x", 1), ("y", 2)]) == value_hash(cols, r1)


def test_float_int_cells_hash_differently():
    """int64 7058 and float64 7058.0 must NOT collapse to the same hash
    line at the dtype layer — the kind compare fires before hashing, but
    keep the invariant visible here: the kinds differ."""
    i = pd.DataFrame({"c": pd.array([7058], dtype="int64")})
    f = pd.DataFrame({"c": pd.array([7058.0], dtype="float64")})
    assert _dtype_kinds(i)["c"] != _dtype_kinds(f)["c"]


def test_negative_zero_hashes_differently():
    """IEEE -0.0 and +0.0 compare equal but format differently ("-0" vs
    "0") through the grader's cell repr, so they hash apart — the
    q_doc_outliers failure found at sf0.1 in r3 (DuckDB ROUND keeps the
    sign bit of a near-zero negative cosine; Spark's does not). Queries
    must normalize with `+ 0.0`; the gate must keep seeing the
    difference."""
    assert value_hash(["c"], [(0.0,)]) != value_hash(["c"], [(-0.0,)])
    # and the normalization idiom used by the queries does collapse it
    assert value_hash(["c"], [(-0.0 + 0.0,)]) == value_hash(["c"], [(0.0,)])
