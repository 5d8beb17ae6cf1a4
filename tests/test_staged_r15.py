"""Oracle-differential tests for the STAGED r15 draft
(``operators/staged_r15.py``) — the same strict compare the driver
applies, run two rounds before registration per the staging
discipline.

Also pins the cadence guard: importing the staged module must NOT
register anything (``len(queries()) == 376`` after the r12 flip; the
r13 flip takes staged_r13's two + staged_r14's eight, and the r14 flip
registers these — updated alongside each flip).
"""

from __future__ import annotations

import datetime
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from driver_check import value_hash  # noqa: E402

from spark_ml_spark.operators.staged_r14 import STAGED as STAGED_R14  # noqa: E402
from spark_ml_spark.operators.staged_r15 import (  # noqa: E402
    _BCD_BUCKETS,
    _BCD_UPD_MOD,
    _BD_ANCHOR,
    STAGED,
)
from spark_ml_spark.registry import QUERIES, collect  # noqa: E402


def test_staged_module_registers_nothing():
    qs, _ = collect()
    assert len(qs) == 376
    assert not set(STAGED) & set(QUERIES)
    assert not set(STAGED) & set(STAGED_R14)


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_oracle_match(name, spark, duck, sf_dir):
    fn, sql = STAGED[name]
    sdf = fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(sql)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch {scols} vs {ocols}")
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} vs {len(orows)}")
    assert value_hash(scols, srows) == value_hash(ocols, orows), (
        f"{name}: value hash mismatch")


def test_join_delta_invariant_holds_and_is_nontrivial(spark, sf_dir):
    rows = STAGED["q_join_delta_apply"][0](spark, sf_dir).collect()
    assert rows
    assert all(r.invariant_ok for r in rows)
    assert all(r.full_n == r.inc_n and r.full_qty == r.inc_qty
               for r in rows)
    # the delta cuts must actually split the data (a degenerate
    # all-delta or all-base split would prove nothing)
    assert sum(r.full_n for r in rows) > 0


def test_bucket_checksum_diff_narrowing_contract(spark, duck, sf_dir):
    # differing buckets == exactly the buckets that contain a changed
    # key (a %97 "update" or a final-day insertion)
    rows = STAGED["q_bucket_checksum_diff"][0](spark, sf_dir).collect()
    got = {r.bucket for r in rows}
    changed = duck.execute(f"""
        WITH last AS (SELECT max(o_orderdate) AS last_d FROM orders)
        SELECT DISTINCT o_orderkey % {_BCD_BUCKETS}
        FROM orders, last
        WHERE o_orderkey % {_BCD_UPD_MOD} = 0 OR o_orderdate = last_d
    """).fetchall()
    assert got == {c[0] for c in changed}
    # every emitted bucket genuinely differs
    for r in rows:
        assert (r.n_old, r.ck_old) != (r.n_new, r.ck_new)
    # narrowing: differing buckets are a strict subset of all buckets
    assert 0 < len(got) <= _BCD_BUCKETS


def test_try_cast_audit_per_source_coherence(spark, sf_dir):
    rows = {r.source: r
            for r in STAGED["q_try_cast_audit"][0](spark, sf_dir).collect()}
    assert set(rows) == {"props_tail", "props_pad", "priority_digit"}
    for r in rows.values():
        assert 0 <= r.n_bigint <= r.n_double <= r.n
    # the priority prefix is always a clean digit: fully valid both ways
    p = rows["priority_digit"]
    assert p.n_bigint == p.n_double == p.n
    # the props tails are genuinely mixed (some parse, some don't)
    t = rows["props_tail"]
    assert 0 < t.n_double < t.n


def test_business_days_matches_python_weekday_walk(spark, duck, sf_dir):
    # independent check: count weekdays with datetime.weekday() over
    # the raw date pairs — must equal the closed-form totals
    pairs = duck.execute("""
        SELECT o.o_orderpriority, CAST(o.o_orderdate AS DATE),
               CAST(l.l_shipdate AS DATE)
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """).fetchall()
    anchor = datetime.date.fromisoformat(_BD_ANCHOR)
    assert anchor.weekday() == 0  # the closed form needs a Monday

    def wd(d):
        n = (d - anchor).days
        return 5 * (n // 7) + min(n % 7, 5)

    expect: dict[str, list[int]] = {}
    for pri, od, sd in pairs:
        expect.setdefault(pri, [0, 0])
        expect[pri][0] += 1
        expect[pri][1] += wd(sd) - wd(od)
    rows = STAGED["q_business_days"][0](spark, sf_dir).collect()
    got = {r.o_orderpriority: (r.n_lines, r.total_bdays) for r in rows}
    assert got == {p: tuple(v) for p, v in expect.items()}
    for r in rows:
        assert r.mean_bdays_milli == (r.total_bdays * 1000) // r.n_lines


def test_sql_identifier_param_binds_not_splices(spark, sf_dir):
    # repeated calls bind cleanly; the plan carries no Python nodes
    fn = STAGED["q_sql_identifier_param"][0]
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert [tuple(r) for r in df.collect()] == [
        tuple(r) for r in fn(spark, sf_dir).collect()]


def test_null_semantics_contract(spark, sf_dir):
    rows = STAGED["q_null_semantics_audit"][0](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    # the 3VL trap: NOT IN over a NULL-bearing set yields ZERO rows
    assert r.n_not_in == 0
    assert r.n_null_keys == 1
    # the safe forms agree and are non-degenerate
    assert r.n_not_exists == r.n_not_in_filtered
    assert r.n_not_exists > 0
