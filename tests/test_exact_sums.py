"""Unit tests for functions/exact.py's SQL rewriter — the engine-exact
decimal accumulation that keeps ROUND(sum(price)) outputs deterministic
across engines, partitionings, and runs (the TPC-H Q9 knife-edge)."""

from __future__ import annotations

from spark_ml_spark.functions.exact import decimal_exact_sums


def test_plain_sum_rewritten():
    out = decimal_exact_sums("SELECT ROUND(sum(l_extendedprice), 2) AS r FROM t")
    assert "sum(CAST(l_extendedprice AS DECIMAL(25,6)))" in out
    assert out.startswith("SELECT ROUND(CAST(")


def test_quantity_sum_untouched():
    sql = "SELECT ROUND(sum(l_quantity), 2) AS q FROM t"
    assert decimal_exact_sums(sql) == sql


def test_nested_parens_in_expr():
    out = decimal_exact_sums(
        "SELECT sum(l_extendedprice * (1 - l_discount)) FROM t")
    assert ("CAST(sum(CAST(l_extendedprice * (1 - l_discount) "
            "AS DECIMAL(25,6))) AS DOUBLE)") in out


def test_avg_decomposes_to_sum_over_count():
    out = decimal_exact_sums("SELECT avg(o_totalprice) FROM orders")
    assert "/ count(o_totalprice))" in out
    assert "sum(CAST(o_totalprice AS DECIMAL(25,6)))" in out


def test_windowed_sum_keeps_over_attached():
    out = decimal_exact_sums(
        "SELECT sum(value) OVER (PARTITION BY u ORDER BY ts) AS s FROM e")
    # OVER must bind to sum(); the double-cast wraps the whole windowed agg
    assert ("CAST(sum(CAST(value AS DECIMAL(25,6))) "
            "OVER (PARTITION BY u ORDER BY ts) AS DOUBLE)") in out


def test_named_window_sum():
    out = decimal_exact_sums("SELECT ROUND(sum(value) OVER w, 4) FROM e WINDOW w AS (ORDER BY ts)")
    assert "CAST(sum(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE)" in out


def test_word_boundary_not_matched():
    sql = "SELECT checksum(value) FROM t"
    assert decimal_exact_sums(sql) == sql


def test_case_expr_sum():
    out = decimal_exact_sums(
        "SELECT sum(CASE WHEN x THEN volume ELSE 0 END) FROM t")
    assert ("sum(CAST(CASE WHEN x THEN volume ELSE 0 END "
            "AS DECIMAL(25,6)))") in out


def test_windowed_avg_gets_frame_on_both_terms():
    """avg(x) OVER w must decompose into sum-over-w / count-over-w —
    previously the OVER branch was sum-only and produced an OVER glued
    to a parenthesized division, which neither engine parses."""
    out = decimal_exact_sums(
        "SELECT avg(value) OVER (PARTITION BY u) AS a FROM e")
    assert ("(CAST(sum(CAST(value AS DECIMAL(25,6))) OVER (PARTITION BY u) "
            "AS DOUBLE) / count(value) OVER (PARTITION BY u))") in out


def test_uppercase_aggregates_are_rewritten():
    """Conventional uppercase SQL must not silently skip the exact pass."""
    out = decimal_exact_sums("SELECT SUM(volume), AVG(o_totalprice) FROM t")
    assert "SUM(volume)" not in out
    assert "AVG(o_totalprice)" not in out
    assert out.count("DECIMAL(25,6)") == 2


def test_uppercase_word_boundary_not_matched():
    sql = "SELECT CHECKSUM(value) FROM t"
    assert decimal_exact_sums(sql) == sql
