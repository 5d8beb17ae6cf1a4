"""Oracle-differential tests for the r10 reopening wave
(``operators/staged_r10.py``) — the same strict compare the driver
applies (column names + order-insensitive value hash via
``tools.driver_check.value_hash``). Written BEFORE registration (r9
freeze) so the reopening flipped on code already driver-green by
construction; kept after it as the module's regression suite.

Also pins the post-reopening registry state (updated alongside each
flip; 366 since r11) with all eight STAGED names present (the r9
freeze-guard inverted).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from driver_check import value_hash  # noqa: E402

from spark_ml_spark.operators.staged_r10 import STAGED  # noqa: E402
from spark_ml_spark.registry import QUERIES, collect  # noqa: E402


def test_staged_module_registered_in_r10():
    # the r10 reopening guard (inverts the r9 freeze guard): the module
    # is in _OPERATOR_MODULES and its registration loop ran, with every
    # staged name present (349 + 8 in r10; 376 since the r12 flip —
    # updated alongside each flip)
    qs, _ = collect()
    assert len(qs) == 376
    assert set(STAGED) <= set(QUERIES)
    # and the oracle wiring matches the STAGED source of truth: the one
    # rows-only entry has no oracle, the other seven do
    _, oracles = collect()
    for n, (_fn, sql) in STAGED.items():
        assert (n in oracles) == (sql is not None)


@pytest.mark.parametrize(
    "name", sorted(n for n, (_, sql) in STAGED.items() if sql is not None))
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


def test_minmax_downsample_output_is_bounded(spark, sf_dir):
    # the downsampler property: output never exceeds 2 rows per bucket,
    # whatever the input size
    rows = STAGED["q_minmax_downsample"][0](spark, sf_dir).collect()
    assert 0 < len(rows) <= 2 * 96
    per_bucket: dict[int, set[str]] = {}
    for r in rows:
        per_bucket.setdefault(r.bucket, set()).add(r.kind)
    assert all(kinds <= {"min", "max"} for kinds in per_bucket.values())


def test_weighted_quantile_is_monotone(spark, sf_dir):
    rows = STAGED["q_weighted_quantile"][0](spark, sf_dir).collect()
    assert [r.pct_ppm for r in rows] == [
        250000, 500000, 750000, 900000, 990000]
    vals = [r.value_cents for r in rows]
    assert vals == sorted(vals)


def test_join_skew_report_metric_identities(spark, sf_dir):
    m = {r.metric: r.value
         for r in STAGED["q_join_skew_report"][0](spark, sf_dir).collect()}
    assert len(m) == 8
    assert m["n_rows"] >= m["n_keys"] > 0
    assert m["max_key_rows"] >= m["p99_key_rows"] >= m["p50_key_rows"] > 0
    assert 0 <= m["gini_ppm"] <= 1_000_000
    assert 0 < m["top1_share_ppm"] <= 1_000_000


def test_stream_watermark_audit_accounting(spark, sf_dir):
    # rows-only by design — these invariants ARE its correctness story:
    # emitted never exceeds exact, the engineered oldest-third-last
    # replay forces at least one late-dropped (incomplete) window, and
    # windows marked complete really match the batch count exactly
    rows = STAGED["q_stream_watermark_audit"][0](spark, sf_dir).collect()
    assert rows, "no hourly windows at all"
    assert all(r.n_emitted <= r.n_exact for r in rows)
    assert any(not r.complete for r in rows), (
        "disorder replay should drop or truncate at least one window")
    assert any(r.complete for r in rows), (
        "on-time windows should survive intact")
    assert all((r.n_emitted == r.n_exact) == r.complete for r in rows)


def test_audits_report_sketches_within_bounds(spark, sf_dir):
    # the two audit twins' entire point: the booleans are TRUE on real
    # data (if a Spark upgrade ever breaks a sketch's published bound,
    # this — and the driver hash — is the alarm)
    pct = STAGED["q_approx_percentiles_audit"][0](spark, sf_dir).collect()
    assert len(pct) == 4 and all(r.within_bound for r in pct)
    hll = STAGED["q_hll_error_audit"][0](spark, sf_dir).collect()
    assert len(hll) == 3 and all(r.within_5sigma for r in hll)


def test_weighted_quantile_crossing_rule_equals_min_rule():
    # the r10 probe rewrite rests on one identity: with cumulative
    # weight strictly increasing over distinct values (w >= 1), "the
    # row where cumw >= p*tot and (cumw - w) < p*tot" IS "min v with
    # cumw >= p*tot" — and that crossing row is unique. Pin both
    # property-style over arbitrary weight multisets in exact integers.
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=100, deadline=None)
    @given(
        ws=st.lists(
            st.tuples(st.integers(0, 50), st.integers(1, 100)),
            min_size=1, max_size=30,
        ),
        p_ppm=st.sampled_from((1, 250000, 500000, 750000, 990000, 1000000)),
    )
    def check(ws, p_ppm):
        agg = {}
        for v, w in ws:
            agg[v] = agg.get(v, 0) + w
        tot = sum(agg.values())
        cum = 0
        min_rule = cross_rule = None
        for v in sorted(agg):
            prev, cum = cum, cum + agg[v]
            if min_rule is None and cum * 1_000_000 >= p_ppm * tot:
                min_rule = v
            if (cum * 1_000_000 >= p_ppm * tot
                    and prev * 1_000_000 < p_ppm * tot):
                assert cross_rule is None, "crossing row must be unique"
                cross_rule = v
        assert min_rule == cross_rule

    check()
