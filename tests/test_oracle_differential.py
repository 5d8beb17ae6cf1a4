"""Oracle-differential correctness (SURVEY.md §5.2, primary strategy).

Mirrors the driver's t2 gate: every registered query with oracle SQL runs
through Spark AND DuckDB; results are compared column-name-sorted,
order-insensitively, with float tolerance. Queries without an oracle get a
non-empty/runs-clean smoke check here (their semantics are covered by
dedicated tests).
"""

from __future__ import annotations

import decimal
import math

import pytest

from spark_ml_spark.registry import collect

QUERIES, ORACLE = collect()

SQL_CHECKED = sorted(ORACLE)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLE))


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    """Sort columns by name, normalize cell values, sort rows — the same
    shape the driver hashes. Floats stay RAW here (compared later with a
    tight relative tolerance); only the ROW-SORT key uses the driver's
    %.6g granularity so both engines order ties identically."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_cell(v):
        if isinstance(v, bool):
            return int(v)
        if isinstance(v, decimal.Decimal):
            v = float(v)
        if isinstance(v, (float, int)):
            return v
        return str(v)

    def key_cell(x):
        if isinstance(x, float):
            return (x is None, "NaN" if math.isnan(x) else f"{x:.6g}")
        return (x is None, str(x))

    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(key_cell(x) for x in t))
    return out


def cells_equal(a, b) -> bool:
    """Strict cell compare: floats at rel_tol 1e-9 (one-ulp associativity
    noise only, not the whole-dollar granularity a global %.6g compare
    would allow on 7-digit revenues — ADVICE r2); everything else exact.

    One carve-out: a ROUND(x, 2) knife-edge — engines whose raw sums
    differ by 1 ulp can round to adjacent cents (TPC-H Q9 at sf0.01:
    842247.87 vs .88, rel 1.2e-8). Accept it only when the diff is at
    most one cent AND both cells hash identically at the driver's %.6g —
    i.e. never looser than the gate this test mirrors."""
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12):
            return True
        return abs(a - b) <= 0.0101 and f"{a:.6g}" == f"{b:.6g}"
    return a == b


def rows_equal(a: tuple, b: tuple) -> bool:
    return len(a) == len(b) and all(cells_equal(x, y) for x, y in zip(a, b))


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_oracle_match(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: spark={spark_cols} duck={duck_cols}"
    )
    # Coarse type parity: a DECIMAL oracle column vs a DOUBLE Spark column
    # is a driver schema_match risk even when stringified values agree.
    def cat(v):
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, int):
            return "int"
        if isinstance(v, float):
            return "float"
        return "other"

    def col_cats(rows, cols):
        out = {}
        for i, c in enumerate(cols):
            vals = [r[i] for r in rows if r[i] is not None]
            out[c] = cat(vals[0]) if vals else "empty"
        return out

    sc, dc = col_cats(spark_rows, spark_cols), col_cats(duck_rows, duck_cols)
    for c in spark_cols:
        if "empty" in (sc[c], dc[c]):
            continue
        assert sc[c] == dc[c], (
            f"{name}: type category differs for {c}: spark={sc[c]} duck={dc[c]}"
        )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = normalize(spark_rows, spark_cols), normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if not rows_equal(a, b)][:5]
    assert not mismatches, f"{name}: value mismatch, first diffs: {mismatches}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
