"""Invariant + mirror tests for the wave-9 sketch/pre-flight operators
(operators/sketches.py) and the diagnostics/graph additions
(q_anomaly_detect, q_event_pmi). The oracle-differential suite already
hash-checks every one of these against DuckDB; these tests pin the
SEMANTIC guarantees the hashes alone don't state (sketch error bounds,
no-underestimate, exact join prediction, flag algebra).
"""

from __future__ import annotations

import hashlib
from collections import Counter

from pyspark.sql import functions as F

from spark_ml_spark.operators import diagnostics as D
from spark_ml_spark.operators import graph as G
from spark_ml_spark.operators import sketches as S

SF = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


def test_kmv_exact_below_k_and_bounded_error_above(spark):
    rows = S.q_kmv_distinct(spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert r.kmv_k <= S._KMV_K
        if r.kmv_k < S._KMV_K:
            # below K the sketch degenerates to an exact distinct count
            assert r.est_distinct == r.n_exact == r.kmv_k
        else:
            # K=256 → relative std err ≈ 6%; 25% is a 4σ ceiling that the
            # deterministic fixture sits well inside (observed ≤ 5.5%)
            assert r.err_ppm < 250_000, (r.event_type, r.err_ppm)


def test_kmv_matches_python_bottom_k(spark):
    """The sketch state (k, h_K) equals a Python bottom-K over the same
    md5-derived 48-bit hash pool."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    ).collect()
    pools: dict[str, set] = {}
    for r in ev:
        h = hashlib.md5(f"kmv1:{r.user_id}:{r.day}".encode()).hexdigest()[:12]
        pools.setdefault(r.event_type, set()).add(h)
    got = {r.event_type: r for r in S.q_kmv_distinct(spark, SF).collect()}
    assert set(got) == set(pools)
    for t, pool in pools.items():
        bottom = sorted(pool)[: S._KMV_K]
        assert got[t].kmv_k == len(bottom)
        assert got[t].hk_hex == bottom[-1]
        assert got[t].n_exact == len(pool)


def test_countmin_never_underestimates(spark):
    rows = S.q_countmin_heavy(spark, SF_MED).collect()
    assert len(rows) == S._CM_PROBES
    for r in rows:
        assert r.cm_est >= r.exact_cnt
        assert r.overcount == r.cm_est - r.exact_cnt >= 0


def test_countmin_probes_are_exact_top_tokens(spark):
    toks = Counter()
    texts = (
        spark.read.parquet(f"{SF_MED}/documents.parquet").select("text").collect()
    )
    for (text,) in texts:
        toks.update(text.strip().lower().split())
    top = sorted(toks.items(), key=lambda kv: (-kv[1], kv[0]))[: S._CM_PROBES]
    got = {r.token: r.exact_cnt for r in S.q_countmin_heavy(spark, SF_MED).collect()}
    assert got == dict(top)


def test_join_size_estimate_is_exact(spark):
    """The Σc² pre-flight equals the materialized self-join's row count."""
    prof = S.q_join_size_estimate(spark, SF).collect()[0]
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select("l_partkey")
    actual = li.alias("a").join(li.alias("b"), "l_partkey").count()
    assert prof.join_rows == actual
    assert prof.n_rows == li.count()
    assert prof.max_key_pairs == prof.max_key_rows * prof.max_key_rows


def test_anomaly_flag_matches_float_zscore(spark):
    """The integer cross-multiplied inequality agrees with the literal
    float z-score test on every row."""
    rows = D.q_anomaly_detect(spark, SF_MED).collect()
    assert rows
    flagged = 0
    for r in rows:
        assert r.w_n <= 7 and r.w_sum >= r.cnt and r.w_sumsq >= r.cnt * r.cnt
        var = r.w_sumsq / r.w_n - (r.w_sum / r.w_n) ** 2
        if var > 0:
            z2 = (r.cnt - r.w_sum / r.w_n) ** 2 / var
            assert bool(r.is_anomaly) == (z2 > 4.0 + 1e-9) or abs(z2 - 4.0) < 1e-6
        else:
            assert not r.is_anomaly
        flagged += r.is_anomaly
    # calibrated so the fixture actually exercises the flag path
    assert flagged > 0


def test_event_pmi_support_bounds(spark):
    rows = G.q_event_pmi(spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_co <= min(r.n_a, r.n_b)
        assert r.type_a < r.type_b
