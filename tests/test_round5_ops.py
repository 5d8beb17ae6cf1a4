"""Structural invariants for the round-5 operator waves (49-59) —
properties the oracle differential can't express (it only proves
Spark == DuckDB; these pin that BOTH compute the intended quantity).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import collect

_QUERIES, _ = collect()


# --------------------------------------------------------------------------
# wave 50: MERGE / CDC
# --------------------------------------------------------------------------

def test_merge_upsert_accounting_closes(spark, sf_dir):
    """n_result = updated + inserted + unchanged, and the action counts
    reconcile against the raw split sizes: updated = |target ∩ source|,
    inserted = |source \\ target|, unchanged = |target \\ source|."""
    row = _QUERIES["q_merge_upsert"](spark, sf_dir).first()
    assert row.n_result == row.n_updated + row.n_inserted + row.n_unchanged
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    t = cust.where(F.col("c_custkey") % 10 < 8)
    s = cust.where(F.col("c_custkey") % 10 >= 5)
    both = t.intersect(s).count()
    assert row.n_updated == both
    assert row.n_inserted == s.count() - both
    assert row.n_unchanged == t.count() - both


def test_cdc_apply_partitions_users(spark, sf_dir):
    """Every user lands in exactly one final-op bucket: the n_keys sum
    equals the distinct-user count of the events table."""
    out = _QUERIES["q_cdc_apply"](spark, sf_dir)
    total = out.agg(F.sum("n_keys")).first()[0]
    n_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert total == n_users


# --------------------------------------------------------------------------
# wave 51: robust & resampling statistics
# --------------------------------------------------------------------------

def test_theilsen_matches_python_median(spark, sf_dir):
    """The per-year Theil-Sen slope equals a driver-side recomputation
    of the pairwise-slope median from the same daily aggregate (small:
    days are calendar-bounded, so this brute force is test-only)."""
    out = {
        r.yr: (r.n_pairs, r.theilsen_cents_per_day)
        for r in _QUERIES["q_theilsen_slope"](spark, sf_dir).collect()
    }
    daily = (
        load(spark, sf_dir, "orders")
        .select(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).cast("bigint").alias("d"),
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
            .cast("bigint").alias("pc"),
        )
        .groupBy("yr", "d")
        .agg(F.sum("pc").alias("rev"))
        .collect()
    )
    by_year: dict = {}
    for r in daily:
        by_year.setdefault(r.yr, []).append((r.d, r.rev))
    yr = min(by_year)  # one year suffices; the oracle covers the rest
    pts = sorted(by_year[yr])
    slopes = sorted(
        (b[1] - a[1]) / (b[0] - a[0])
        for i, a in enumerate(pts)
        for b in pts[i + 1:]
    )
    n = len(slopes)
    med = (
        slopes[n // 2]
        if n % 2
        else (slopes[n // 2 - 1] + slopes[n // 2]) / 2
    )
    got_n, got_slope = out[yr]
    assert got_n == n
    assert abs(got_slope - round(med, 4)) <= 1e-9, (got_slope, med)


def test_kruskal_wallis_invariants(spark, sf_dir):
    """H is nonnegative; tie correction can only GROW the statistic
    (divisor ≤ 1); group count matches the event-type cardinality."""
    row = _QUERIES["q_kruskal_wallis"](spark, sf_dir).first()
    assert row.h_stat >= 0
    assert row.h_tie_corrected >= row.h_stat
    n_types = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("event_type").distinct().count()
    )
    assert row.n_groups == n_types


def test_poisson_bootstrap_brackets_point(spark, sf_dir):
    """The replica CI must bracket the full-data mean (Poisson(1)
    resamples are unbiased), and the SE must be positive and small
    relative to the mean."""
    row = _QUERIES["q_poisson_bootstrap"](spark, sf_dir).first()
    assert row.ci_lo_cents <= row.point_mean_cents <= row.ci_hi_cents
    assert 0 < row.boot_se_cents < row.point_mean_cents


# --------------------------------------------------------------------------
# wave 52: link prediction & local clustering
# --------------------------------------------------------------------------

def test_link_prediction_bounds(spark, sf_dir):
    """n_common ≤ min(d_a, d_b); Jaccard ∈ (0, 1e6]; AA of a pair is at
    most n_common / ln(2) (every common neighbor has degree ≥ 2)."""
    rows = _QUERIES["q_link_prediction"](spark, sf_dir).collect()
    assert rows, "top-k must be non-empty"
    for r in rows:
        assert r.n_common <= min(r.d_a, r.d_b)
        assert 0 < r.jaccard_ppm <= 1_000_000
        assert r.aa_nano <= r.n_common * (1e9 / math.log(2)) + 1


def test_local_clustering_consistency(spark, sf_dir):
    """lcc_ppm ∈ [0, 1e6] and equals the reported (n_tri, degree) pair
    recomputed; triangle charges are nonnegative."""
    for r in _QUERIES["q_local_clustering"](spark, sf_dir).collect():
        assert 0 <= r.lcc_ppm <= 1_000_000
        expect = math.floor(
            r.n_tri * 2_000_000.0 / (r.degree * (r.degree - 1)) + 0.5
        )
        assert r.lcc_ppm == expect


# --------------------------------------------------------------------------
# wave 53: stump / ridge / k-fold
# --------------------------------------------------------------------------

def test_ridge_path_monotone_shrinkage(spark, sf_dir):
    """|slope| and the shrink factor are nonincreasing in alpha, and
    alpha=0 reproduces OLS (shrink factor exactly 1e6 ppm)."""
    rows = _QUERIES["q_ridge_path"](spark, sf_dir).orderBy("alpha").collect()
    assert rows[0].alpha == 0 and rows[0].shrink_ppm == 1_000_000
    for a, b in zip(rows, rows[1:]):
        assert abs(b.slope_micro) <= abs(a.slope_micro)
        assert b.shrink_ppm <= a.shrink_ppm


def test_decision_stump_beats_trivial_split(spark, sf_dir):
    """The reported best split's Gini is no worse than an arbitrary
    fixed split's Gini (global optimality spot check), and the side
    counts partition the table."""
    row = _QUERIES["q_decision_stump"](spark, sf_dir).first()
    docs = load(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("bigint").alias("x"),
        (F.col("lang") == "en").cast("bigint").alias("y"),
    )
    n = docs.count()
    assert row.n_left + row.n_right == n

    def gini_at(t: int) -> float:
        agg = docs.agg(
            F.sum((F.col("x") <= t).cast("bigint")).alias("nl"),
            F.sum(F.when(F.col("x") <= t, F.col("y")).otherwise(0))
            .alias("pl"),
            F.sum("y").alias("pos"),
        ).first()
        nl, pl, pos = agg.nl, agg.pl, agg.pos
        nr, pr = n - nl, pos - pl
        if nl == 0 or nr == 0:
            return float("inf")
        return (
            2.0 * pl * (nl - pl) / nl + 2.0 * pr * (nr - pr) / nr
        ) * 1e6 / n

    assert row.gini_micro <= math.floor(gini_at(500) + 0.5) + 1


def test_kfold_cv_folds_partition(spark, sf_dir):
    """The five test folds partition the corpus (sizes sum to n) and
    every held-out RMSE is positive and finite."""
    rows = _QUERIES["q_kfold_cv"](spark, sf_dir).collect()
    assert len(rows) == 5
    n = load(spark, sf_dir, "documents").count()
    assert sum(r.n_test for r in rows) == n
    for r in rows:
        assert r.rmse_test > 0 and math.isfinite(r.rmse_test)


# --------------------------------------------------------------------------
# wave 55-57: t-closeness, xcorr, conformal, permutation
# --------------------------------------------------------------------------

def test_t_closeness_bounds(spark, sf_dir):
    """EMD over CDFs is bounded: t_ppm ∈ [0, 1e6]; output is sorted
    worst-first."""
    rows = _QUERIES["q_t_closeness"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.t_ppm <= 1_000_000
    assert [r.t_ppm for r in rows] == sorted(
        (r.t_ppm for r in rows), reverse=True
    )


def test_cross_correlation_bounds(spark, sf_dir):
    """Every xcf is a correlation in [-1, 1] and the lag-0 row exists
    with maximal pair support."""
    rows = _QUERIES["q_cross_correlation"](spark, sf_dir).collect()
    by_lag = {r.lag: r for r in rows}
    assert 0 in by_lag
    for r in rows:
        assert -1.0001 <= r.xcf <= 1.0001
        assert r.n_days <= by_lag[0].n_days


def test_conformal_coverage_guarantee(spark, sf_dir):
    """Split conformal guarantees ≥ 1 − α coverage IN EXPECTATION over
    exchangeable draws; one realization fluctuates binomially in both
    the calibration quantile and the test evaluation, so assert the
    marginal target minus 4 combined standard errors (at sf0.001,
    n_cal≈89/n_test≈96 → ~25% slack; at production n both terms vanish
    and the bound tightens to the true 90%). q̂ must be positive."""
    row = _QUERIES["q_conformal_interval"](spark, sf_dir).first()
    se = math.sqrt(0.9 * 0.1) * (
        1 / math.sqrt(row.n_cal) + 1 / math.sqrt(row.n_test)
    )
    assert row.coverage_ppm >= (0.9 - 4 * se) * 1_000_000
    assert row.qhat_micro > 0


def test_permutation_test_p_value_range(spark, sf_dir):
    """Add-one smoothed p ∈ (0, 1]; n_extreme ≤ replicas; the group
    sizes reconcile with the filter."""
    row = _QUERIES["q_permutation_test"](spark, sf_dir).first()
    assert 0 < row.p_value_ppm <= 1_000_000
    assert 0 <= row.n_extreme <= row.n_replicas
    assert row.n == row.n_a + row.n_b


# --------------------------------------------------------------------------
# wave 56/58: lift curve, MRL recall, semi-additive
# --------------------------------------------------------------------------

def test_lift_curve_gains_monotone(spark, sf_dir):
    """Cumulative gains are nondecreasing in decile and end at 100%;
    decile sizes differ by at most 1 from n/10."""
    rows = _QUERIES["q_lift_curve"](spark, sf_dir).orderBy("decile").collect()
    assert len(rows) == 10
    gains = [r.cum_gain_ppm for r in rows]
    assert gains == sorted(gains)
    assert gains[-1] == 1_000_000
    n = sum(r.n_rows for r in rows)
    for r in rows:
        assert abs(r.n_rows - n / 10) <= 1


def test_mrl_recall_bounds(spark, sf_dir):
    """Overlap@k ∈ [0, k]; a truncated prefix can't beat itself —
    recall_ppm consistent with n_overlap."""
    from spark_ml_spark.operators.similarity import _MRL_K, _MRL_Q

    rows = _QUERIES["q_mrl_recall"](spark, sf_dir).collect()
    assert len(rows) == _MRL_Q
    for r in rows:
        assert 0 <= r.n_overlap <= _MRL_K
        assert r.recall_ppm == math.floor(
            r.n_overlap * 1_000_000.0 / _MRL_K + 0.5
        )


def test_semi_additive_less_than_additive(spark, sf_dir):
    """The end-of-period balance (last per account) is at most the
    fully-additive sum for every month, and accounts ≤ orders."""
    eop = {
        r.ym: (r.n_accounts, r.eop_balance_cents)
        for r in _QUERIES["q_semi_additive_agg"](spark, sf_dir).collect()
    }
    addv = {
        r.ym: (r.n_orders, r.all_cents)
        for r in (
            load(spark, sf_dir, "orders")
            .groupBy(
                (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
                .cast("bigint").alias("ym")
            )
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
                    .cast("bigint")
                ).alias("all_cents"),
            )
            .collect()
        )
    }
    assert set(eop) == set(addv)
    for ym, (n_acct, bal) in eop.items():
        n_ord, total = addv[ym]
        assert n_acct <= n_ord
        assert bal <= total


# --------------------------------------------------------------------------
# wave 59: FPGrowth cross-check vs q_assoc_rules support counts
# --------------------------------------------------------------------------

def test_fpgrowth_pairs_match_assoc_support(spark, sf_dir):
    """The FP-tree engine and the q_assoc_rules SQL pipeline count the
    SAME brand-pair supports: every 2-itemset reported by FPGrowth must
    appear in the assoc-rules co-count with the identical frequency."""
    fp_pairs = {
        r.items: r.freq
        for r in _QUERIES["q_fpgrowth_itemsets"](spark, sf_dir).collect()
        if r.set_size == 2
    }
    if not fp_pairs:
        return  # support threshold can exceed every pair at tiny sf
    b = (
        load(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                load(spark, sf_dir, "part").select("p_partkey", "p_brand")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(F.col("l_orderkey").alias("basket"),
                F.col("p_brand").alias("item"))
        .distinct()
    )
    a, c = b.alias("a"), b.alias("c")
    co = {
        r.items: r.n_co
        for r in (
            a.join(
                c,
                (F.col("a.basket") == F.col("c.basket"))
                & (F.col("a.item") < F.col("c.item")),
            )
            .groupBy(
                F.concat_ws(
                    " ", F.col("a.item"), F.col("c.item")
                ).alias("items")
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_co"))
            .collect()
        )
    }
    for items, freq in fp_pairs.items():
        assert co.get(items) == freq, items


def test_feature_selection_nonneg_and_complete(spark, sf_dir):
    """chi² is nonnegative; all three declared features report; levels
    are at least 2 (a 1-level feature has no contingency)."""
    rows = _QUERIES["q_feature_selection"](spark, sf_dir).collect()
    assert {r.feature for r in rows} == {"source", "len_bucket",
                                         "tok_bucket"}
    for r in rows:
        assert r.chi2_nano >= 0
        assert r.n_levels >= 2


# --------------------------------------------------------------------------
# wave 62: forecasting & attribution depth
# --------------------------------------------------------------------------

def test_seasonal_decompose_covers_calendar(spark, sf_dir):
    """All 7 DOW rows report; day counts reconcile to the full-window
    day count (total days − 6, the centered MA7 edge loss); the
    weighted seasonal sum equals the total detrended sum ≈ within
    per-group rounding (7 × ½ cent)."""
    rows = _QUERIES["q_seasonal_decompose"](spark, sf_dir).collect()
    assert sorted(r.dow for r in rows) == list(range(7))
    n_days_total = (
        load(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate").alias("d"))
        .distinct()
        .count()
    )
    assert sum(r.n_days for r in rows) == n_days_total - 6
    for r in rows:
        assert r.mean_abs_remainder_cents >= 0


def test_pinball_eval_invariants(spark, sf_dir):
    """Scored-day count = total days − warm-up window; pinball loss is
    nonnegative; a trailing p90 forecast's empirical coverage lands in
    a loose-but-meaningful band (50%–100%)."""
    row = _QUERIES["q_pinball_eval"](spark, sf_dir).first()
    n_days_total = (
        load(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate").alias("d"))
        .distinct()
        .count()
    )
    assert row.n_days == n_days_total - 28
    assert row.pinball_cents >= 0
    assert 500000 <= row.coverage_ppm <= 1000000


def test_shapley_efficiency_axiom(spark, sf_dir):
    """Shapley values satisfy efficiency: Σφᵢ = v(N) − v(∅), checked in
    micro-credit within 3 half-ulp quantization errors. v(N) is the
    overall conversion rate; v(∅) the rate among untouched users."""
    rows = _QUERIES["q_shapley_attribution"](spark, sf_dir).collect()
    assert {r.channel for r in rows} == {"view", "click", "signup"}
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.col("event_type").isin("view", "click", "signup")
                .cast("int")
            ).alias("touched"),
            F.max((F.col("event_type") == "purchase").cast("int"))
            .alias("conv"),
        )
    )
    tot = per_user.agg(
        F.avg("conv").alias("v_full"),
        F.avg(F.when(F.col("touched") == 0, F.col("conv"))).alias("v0"),
    ).first()
    v0 = tot.v0 or 0.0
    want = (tot.v_full - v0) * 1e6
    got = sum(r.shapley_micro for r in rows)
    assert abs(got - want) <= 3


# --------------------------------------------------------------------------
# wave 63: agreement, multiple testing & ranking evaluation
# --------------------------------------------------------------------------

def test_cohens_kappa_bounds_and_agreement(spark, sf_dir):
    """κ ≤ p_o ≤ 1 always (chance correction can only lower agreement);
    n_agree/n reproduces p_observed at the rounded precision."""
    row = _QUERIES["q_cohens_kappa"](spark, sf_dir).first()
    assert row.kappa <= row.p_observed + 1e-9
    assert -1.0 <= row.kappa <= 1.0
    assert abs(row.p_observed - row.n_agree / row.n) < 1e-4


def test_bh_fdr_stepup_contiguity(spark, sf_dir):
    """BH rejections form a prefix of the p-ordered ranks (step-up
    property), p_micro is nondecreasing in rank, every nation reports,
    and any rejected rank satisfies its own threshold test."""
    rows = sorted(
        _QUERIES["q_bh_fdr"](spark, sf_dir).collect(),
        key=lambda r: r.bh_rank,
    )
    m = len(rows)
    assert sorted(r.c_nationkey for r in rows) == list(range(m))
    assert all(a.p_micro <= b.p_micro for a, b in zip(rows, rows[1:]))
    flags = [r.rejected for r in rows]
    assert flags == sorted(flags, reverse=True)  # prefix property
    k_star = sum(flags)
    if k_star:
        r = rows[k_star - 1]
        assert r.p_micro * 10 * m <= r.bh_rank * 1000000


def test_ndcg_bounds_and_self_consistency(spark, sf_dir):
    """nDCG ∈ (0, 1] per nation (idcg includes rel-3 rows by quartile
    construction); ranking by the relevance itself would give exactly
    1e6 — so the acctbal ranking can never exceed it."""
    rows = _QUERIES["q_ndcg_eval"](spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        assert 0 < r.ndcg10_micro <= 1000000


# --------------------------------------------------------------------------
# wave 64: blocked inference, entity resolution, hazard depth
# --------------------------------------------------------------------------

def test_friedman_rank_sums_close(spark, sf_dir):
    """Within each complete block the ranks are a permutation of 1..5,
    so segment rank sums must total n_blocks·k(k+1)/2 = 15·n_blocks;
    χ²_F is nonnegative and identical on every row."""
    rows = _QUERIES["q_friedman_test"](spark, sf_dir).collect()
    assert len(rows) == 5
    n_blocks = rows[0].n_blocks
    assert all(r.n_blocks == n_blocks for r in rows)
    assert sum(r.rank_sum for r in rows) == 15 * n_blocks
    assert len({r.chi2_f for r in rows}) == 1
    assert rows[0].chi2_f >= -1e-9


def test_record_linkage_histogram_closes(spark, sf_dir):
    """The score histogram accounts for every blocked candidate pair;
    each score is one of the 8 possible 3-field weight sums; is_match
    agrees with the declared threshold."""
    from itertools import product

    rows = _QUERIES["q_record_linkage"](spark, sf_dir).collect()
    n_pairs = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "supplier"),
            F.col("s_nationkey") == F.col("c_nationkey"),
        )
        .count()
    )
    assert sum(r.n_pairs for r in rows) == n_pairs
    possible = {
        a + b + c
        for a, b, c in product((3087, -2585), (926, -3322), (3170, -3170))
    }
    for r in rows:
        assert r.score_milli in possible
        assert r.is_match == (1 if r.score_milli >= 4000 else 0)


def test_nelson_aalen_vs_km(spark, sf_dir):
    """H is nondecreasing; risk sets match q_survival_km exactly; and
    the exact pointwise inequality KM S(q) ≤ exp(−H(q)) holds (since
    1−x ≤ e^−x for every increment)."""
    import math

    na = {r.quarter: r for r in
          _QUERIES["q_nelson_aalen"](spark, sf_dir).collect()}
    km = {r.quarter: r for r in
          _QUERIES["q_survival_km"](spark, sf_dir).collect()}
    assert set(na) == set(km)
    prev = -1
    for q in sorted(na):
        assert na[q].cumhaz_nano >= prev
        prev = na[q].cumhaz_nano
        assert na[q].n_at_risk == km[q].n_at_risk
        assert na[q].n_events == km[q].n_events
        s_upper = math.exp(-na[q].cumhaz_nano / 1e9)
        assert km[q].survival <= s_upper + 1e-4


# --------------------------------------------------------------------------
# wave 65: experimentation & causal depth
# --------------------------------------------------------------------------

def test_cuped_accounting_and_rho2(spark, sf_dir):
    """Arms partition the users with non-null values; ρ² is a valid
    squared correlation (0..1e6 ppm); both arms are populated (md5
    coin at p=0.5 over ≥150 users)."""
    row = _QUERIES["q_cuped_adjust"](spark, sf_dir).first()
    n_users = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select("user_id").distinct().count()
    )
    assert row.n_t + row.n_c == n_users
    assert row.n_t > 0 and row.n_c > 0
    assert 0 <= row.rho2_ppm <= 1000000


def test_stratified_ate_weights_fold(spark, sf_dir):
    """Five strata cover every ordering customer; the reported ATE
    equals the stratum-size-weighted mean of the per-stratum gaps
    recomputed from the output rows (within 4-dp rounding)."""
    rows = _QUERIES["q_stratified_ate"](spark, sf_dir).collect()
    assert [r.stratum for r in rows] == [1, 2, 3, 4, 5]
    n_cust = (
        load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_treated + r.n_control for r in rows) == n_cust
    valid = [r for r in rows if r.n_treated > 0 and r.n_control > 0]
    want = sum(
        (r.n_treated + r.n_control) * r.diff_dollars for r in valid
    ) / sum(r.n_treated + r.n_control for r in valid)
    assert abs(rows[0].ate_dollars - want) < 1e-2  # 4-dp per-row rounding
    assert len({r.ate_dollars for r in rows}) == 1


def test_cochran_q_bounds(spark, sf_dir):
    """Q is nonnegative with df = k−1 = 2; each rater's flag total is
    within [0, n_docs]."""
    row = _QUERIES["q_cochran_q"](spark, sf_dir).first()
    assert row.q_stat >= -1e-9
    assert row.df == 2
    for c in (row.c1, row.c2, row.c3):
        assert 0 <= c <= row.n_docs


# --------------------------------------------------------------------------
# wave 66: nonparametric survival & trend depth
# --------------------------------------------------------------------------

def test_logrank_bounds(spark, sf_dir):
    """χ² is nonnegative on 1 df; observed group-1 events can't exceed
    the total event count; the pooled expectation is positive."""
    row = _QUERIES["q_logrank_test"](spark, sf_dir).first()
    total_events = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.max(F.to_date("o_orderdate")).alias("last"))
        .where(F.col("last") < F.lit("2001-02-01").cast("date"))
        .count()
    )
    assert 0 <= row.o1 <= total_events
    assert row.e1 > 0
    assert row.chi2_logrank >= -1e-9
    assert row.df == 1


def test_mann_kendall_bounds_and_tiefree(spark, sf_dir):
    """|S| ≤ n(n−1)/2 per year; z's sign follows S's; and the no-tie
    variance premise holds — daily revenue cent values are distinct
    within each year."""
    rows = _QUERIES["q_mann_kendall"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert abs(r.s_stat) <= r.n * (r.n - 1) // 2
        if r.s_stat > 1:
            assert r.z_mk > 0
        elif r.s_stat < -1:
            assert r.z_mk < 0
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.to_date("o_orderdate").alias("d"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
                .cast("bigint")
            ).alias("rev")
        )
    )
    per_year = daily.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("rev").alias("n_distinct"),
    )
    for r in per_year.collect():
        assert r.n == r.n_distinct, f"ties in year {r.yr}"


def test_capture_recapture_consistency(spark, sf_dir):
    """Sample counts nest (m ≤ min(n₁,n₂) ≤ n_true); the Chapman
    estimate is at least the union lower bound and within a loose 2×
    band of the true population (p₁p₂N ≥ ~10 recaptures here)."""
    row = _QUERIES["q_capture_recapture"](spark, sf_dir).first()
    assert row.m12 <= min(row.n1, row.n2)
    assert max(row.n1, row.n2) <= row.n_true
    union = row.n1 + row.n2 - row.m12
    assert row.n_hat_chapman >= union - 1
    assert 0.5 * row.n_true <= row.n_hat_chapman <= 2.0 * row.n_true


# --------------------------------------------------------------------------
# wave 67: corpus measurement & retrieval-eval depth
# --------------------------------------------------------------------------

def test_heaps_law_monotone_and_sublinear(spark, sf_dir):
    """Nested prefixes: token mass and vocabulary are nondecreasing in
    k, V ≤ N everywhere, and every consecutive slope β̂ obeys the
    structural bound β ≤ 1 (a token adds at most one type)."""
    rows = _QUERIES["q_heaps_law"](spark, sf_dir).collect()
    assert [r.k for r in rows] == [1, 2, 3, 4]
    assert rows[0].beta_micro is None
    for a, b in zip(rows, rows[1:]):
        assert b.n_tokens >= a.n_tokens
        assert b.v_distinct >= a.v_distinct
        assert 0 <= b.beta_micro <= 1000001
    for r in rows:
        assert r.v_distinct <= r.n_tokens


def test_mrr_consistency(spark, sf_dir):
    """Every nation finds a relevant item (decile 1 is nonempty by
    ntile construction); rr reproduces 1/rank at micro precision; the
    repeated MRR column equals the mean of the per-nation rr values."""
    rows = _QUERIES["q_mrr_eval"](spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        assert r.first_rel_rank >= 1
        assert r.rr_micro == int(1000000.0 / r.first_rel_rank + 0.5)
    want = sum(1000000.0 / r.first_rel_rank for r in rows) / len(rows)
    assert abs(rows[0].mrr_micro - want) <= 1
    assert len({r.mrr_micro for r in rows}) == 1


def test_ttr_bounds(spark, sf_dir):
    """Hapax ⊆ types ⊆ token mass per language; both ratios live in
    (0, 1] micro."""
    rows = _QUERIES["q_ttr_profile"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hapax <= r.n_types <= r.n_tokens
        assert 0 < r.ttr_micro <= 1000000
        assert 0 <= r.hapax_micro <= 1000000


# --------------------------------------------------------------------------
# wave 68: DP release, periodogram, distributed gradient step
# --------------------------------------------------------------------------

def test_dp_counts_error_accounting(spark, sf_dir):
    """True counts reconcile with the customer table; the published
    error column is exactly |noisy − true| for every segment."""
    rows = _QUERIES["q_dp_counts"](spark, sf_dir).collect()
    assert len(rows) == 5
    n_cust = load(spark, sf_dir, "customer").count()
    assert sum(r.true_count for r in rows) == n_cust
    for r in rows:
        assert abs(r.noisy_count - r.true_count) == r.abs_error


def test_periodogram_invariants(spark, sf_dir):
    """All five candidate periods report over the same day count;
    power is nonnegative."""
    rows = _QUERIES["q_periodogram"](spark, sf_dir).collect()
    assert sorted(r.period_days for r in rows) == [7, 14, 30, 91, 365]
    assert len({r.n for r in rows}) == 1
    n_days = (
        load(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate")).distinct().count()
    )
    assert rows[0].n == n_days
    for r in rows:
        assert r.power_cents2 >= 0


def test_logistic_gd_step_recomputes(spark, sf_dir):
    """Per-row residuals live in (−1, 1) so |∇| < n·1e6 micro; the
    published next weights reproduce w − η·∇/n from the published
    gradient (the whole step is auditable from the output row)."""
    row = _QUERIES["q_logistic_gd_step"](spark, sf_dir).first()
    n_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert row.n == n_users
    assert abs(row.g0_micro) <= row.n * 1000000
    import math
    assert row.w0_next_micro == math.floor(
        -1.0 * 1e6 - 0.5 * row.g0_micro / row.n + 0.5
    )
    assert row.w1_next_micro == math.floor(
        0.1 * 1e6 - 0.5 * row.g1_micro / row.n + 0.5
    )


# --------------------------------------------------------------------------
# wave 69: classifier & clustering evaluation
# --------------------------------------------------------------------------

def test_langid_confusion_closes(spark, sf_dir):
    """Cell counts sum to the corpus; per-actual shares sum to ~1e6;
    accuracy equals the diagonal mass over the total."""
    rows = _QUERIES["q_langid_confusion"](spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    total = sum(r.n for r in rows)
    assert total == n_docs
    diag = sum(r.n for r in rows if r.actual_lang == r.predicted_lang)
    assert abs(rows[0].accuracy_ppm - diag * 1e6 / total) <= 1
    by_actual: dict = {}
    for r in rows:
        by_actual.setdefault(r.actual_lang, 0)
        by_actual[r.actual_lang] += r.share_of_actual_ppm
    for lang, s in by_actual.items():
        assert abs(s - 1000000) <= len(rows), lang


def test_cluster_purity_bounds(spark, sf_dir):
    """Majority ≤ bucket size; per-bucket purity in (0, 1e6]; bucket
    sizes sum to the embedding count; overall purity is the weighted
    mean of the per-bucket values."""
    rows = _QUERIES["q_cluster_purity"](spark, sf_dir).collect()
    n = load(spark, sf_dir, "embeddings").count()
    assert sum(r.n_bucket for r in rows) == n
    for r in rows:
        assert 0 < r.n_majority <= r.n_bucket
        assert 0 < r.purity_ppm <= 1000000
    want = sum(r.n_majority for r in rows) * 1e6 / n
    assert abs(rows[0].overall_purity_ppm - want) <= 1


def test_pr_curve_monotone_recall_and_ap(spark, sf_dir):
    """Recall is nondecreasing as the threshold drops; the loosest
    threshold reaches recall 1; AP recomputed from the published
    points matches the published value; AP ≥ the positive base rate
    (a score no worse than random on this fixture)."""
    rows = sorted(
        _QUERIES["q_pr_curve"](spark, sf_dir).collect(),
        key=lambda r: -r.threshold,
    )
    recs = [r.recall_ppm for r in rows]
    assert recs == sorted(recs)
    assert recs[-1] == 1000000
    prev_rec = 0.0
    ap = 0.0
    for r in rows:
        prec = r.tp / r.pred_pos
        rec = r.recall_ppm / 1e6
        ap += (rec - prev_rec) * prec
        prev_rec = rec
    assert abs(rows[0].ap_micro - ap * 1e6) <= 3


# --------------------------------------------------------------------------
# wave 70: point-in-time correctness & sampling diagnostics
# --------------------------------------------------------------------------

def test_pit_join_accounts_every_purchase(spark, sf_dir):
    """Every purchase lands in exactly one state bucket (including
    'none' for purchases before any state event); states are drawn
    from the non-purchase event vocabulary."""
    rows = _QUERIES["q_point_in_time_join"](spark, sf_dir).collect()
    n_purch = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r.n_purchases for r in rows) == n_purch
    vocab = {
        r.event_type
        for r in load(spark, sf_dir, "events")
        .select("event_type").distinct().collect()
    } - {"purchase"}
    for r in rows:
        assert r.state_at in vocab | {"none"}
        assert 0 < r.n_users <= r.n_purchases


def test_ess_bounds(spark, sf_dir):
    """1 ≤ ESS ≤ n always (Cauchy-Schwarz), with equality at n only
    for uniform weights — so the ratio lives in (0, 1e6]."""
    row = _QUERIES["q_ess_weights"](spark, sf_dir).first()
    n_docs = load(spark, sf_dir, "documents").count()
    assert row.n == n_docs
    assert 1 <= row.ess <= row.n
    assert 0 < row.ess_ratio_ppm <= 1000000


def test_dkw_band_brackets_ecdf(spark, sf_dir):
    """The band contains the point estimate at every probe; ECDF is
    nondecreasing across probes; band bounds are clamped to [0, 1e6]."""
    rows = _QUERIES["q_dkw_band"](spark, sf_dir).collect()
    assert [r.probe_dollars for r in rows] == [
        50000, 100000, 150000, 250000, 400000
    ]
    prev = -1
    for r in rows:
        assert 0 <= r.lo_ppm <= r.ecdf_ppm <= r.hi_ppm <= 1000000
        assert r.ecdf_ppm >= prev
        prev = r.ecdf_ppm


# --------------------------------------------------------------------------
# wave 71: rates, chains & process control
# --------------------------------------------------------------------------

def test_wilson_ci_brackets_rate(spark, sf_dir):
    """lo ≤ rate ≤ hi with all three in [0, 1e6]; (n, k) nest; segment
    sizes sum to the ordering-customer count."""
    rows = _QUERIES["q_wilson_ci"](spark, sf_dir).collect()
    assert len(rows) == 5
    n_cust = (
        load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n for r in rows) == n_cust
    for r in rows:
        assert 0 <= r.k <= r.n
        assert 0 <= r.lo_ppm <= r.rate_ppm <= r.hi_ppm <= 1000000


def test_markov_stationary_is_distribution(spark, sf_dir):
    """π stays a probability vector (Σ = 1e9 nano within per-step
    half-ulp drift) and tracks the chain's empirical state shares
    (the event stream is near-i.i.d., so the stationary distribution
    must sit close to the marginal)."""
    rows = _QUERIES["q_markov_stationary"](spark, sf_dir).collect()
    assert len(rows) == 5
    total = sum(r.pi_nano for r in rows)
    assert abs(total - 10**9) <= 12 * 5  # 12 steps × 5 states × ½ nano
    ev = load(spark, sf_dir, "events")
    n = ev.count()
    shares = {
        r.event_type: r.cnt / n
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for r in rows:
        assert abs(r.pi_nano / 1e9 - shares[r.state]) < 0.05, r.state


def test_shewhart_counts_bounded(spark, sf_dir):
    """Flag counts are bounded by the day count; the worst |z| is
    positive and at least as large as the 3σ rule requires whenever a
    flag fired."""
    row = _QUERIES["q_shewhart_chart"](spark, sf_dir).first()
    n_days = (
        load(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate")).distinct().count()
    )
    assert row.n_days == n_days
    assert 0 <= row.n_above_ucl + row.n_below_lcl <= n_days
    assert row.max_abs_z > 0
    if row.n_above_ucl + row.n_below_lcl > 0:
        assert row.max_abs_z > 3.0


# --------------------------------------------------------------------------
# wave 72: tails, extremes & epidemiological rates
# --------------------------------------------------------------------------

def test_hill_tail_positive(spark, sf_dir):
    """α̂ is positive and finite; f_(k) is a real frequency (≥1); k
    matches the declared order-statistic count."""
    row = _QUERIES["q_hill_tail"](spark, sf_dir).first()
    assert row.k == 20
    assert row.f_k >= 1
    assert row.hill_alpha_micro > 0


def test_gumbel_return_level_dominates_mean(spark, sf_dir):
    """The Gumbel location sits below the block-max mean (γβ > 0); the
    12-block return level exceeds the mean block max (it estimates the
    once-per-12-blocks extreme); β > 0."""
    row = _QUERIES["q_gumbel_maxima"](spark, sf_dir).first()
    assert row.beta_cents > 0
    assert row.mu_cents < row.mean_max_cents
    assert row.return_level_12_cents > row.mean_max_cents
    n_months = (
        load(spark, sf_dir, "orders")
        .select(F.date_trunc("month", F.to_date("o_orderdate")))
        .distinct().count()
    )
    assert row.n_blocks == n_months


def test_odds_ratio_consistency(spark, sf_dir):
    """Cells partition the orders table; the Woolf interval brackets
    the point OR; OR and RR agree in direction (both >1 or both ≤1
    when the outcome is rare-ish or exposure balanced — here simply:
    same side of 1 within rounding)."""
    row = _QUERIES["q_odds_ratio"](spark, sf_dir).first()
    n = load(spark, sf_dir, "orders").count()
    assert row.a + row.b + row.c + row.d == n
    assert row.or_lo <= row.odds_ratio <= row.or_hi
    assert (row.odds_ratio >= 1) == (row.relative_risk >= 1) or (
        abs(row.odds_ratio - 1) < 0.05
    )


# --------------------------------------------------------------------------
# wave 73: BI & count-model depth
# --------------------------------------------------------------------------

def test_price_index_fisher_between(spark, sf_dir):
    """Fisher is the geometric mean, so it lies between Laspeyres and
    Paasche; all three are positive; the common-part set is nonempty."""
    row = _QUERIES["q_price_index"](spark, sf_dir).first()
    assert row.n_parts > 0
    lo = min(row.laspeyres_ppm, row.paasche_ppm)
    hi = max(row.laspeyres_ppm, row.paasche_ppm)
    assert lo - 1 <= row.fisher_ppm <= hi + 1
    assert lo > 0


def test_overdispersion_recomputes(spark, sf_dir):
    """The Fano factor reproduces var/mean from the published moments;
    the verdict flag agrees with Fano vs 1."""
    row = _QUERIES["q_overdispersion"](spark, sf_dir).first()
    n_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert row.n == n_users
    want = row.var_milli / row.mean_milli * 1000.0
    assert abs(row.fano_milli - want) <= 2
    assert row.overdispersed == (1 if row.fano_milli > 1000 else 0)


def test_audience_overlap_bounds(spark, sf_dir):
    """Intersections nest within both week sizes; Jaccard lives in
    [0, 1e6]; every consecutive week pair reports."""
    rows = _QUERIES["q_audience_overlap"](spark, sf_dir).collect()
    assert rows
    weeks = [r.week for r in rows]
    assert weeks == sorted(weeks)
    for r in rows:
        assert 0 <= r.n_common <= min(r.n_week, r.n_next)
        assert 0 <= r.jaccard_ppm <= 1000000


# --------------------------------------------------------------------------
# wave 74: distribution-free CI, calibration summary, Simpson audit
# --------------------------------------------------------------------------

def test_median_ci_brackets_percentile(spark, sf_dir):
    """The order-statistic CI brackets the median; the median matches
    an independent percentile computation within one cent."""
    row = _QUERIES["q_median_ci"](spark, sf_dir).first()
    assert row.ci_lo_cents <= row.median_cents <= row.ci_hi_cents
    med = (
        load(spark, sf_dir, "orders")
        .select(
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
            .cast("bigint").alias("pc")
        )
        .agg(F.expr("percentile(pc, 0.5)").alias("m"))
        .first().m
    )
    assert abs(row.median_cents - med) <= 1
    n_orders = load(spark, sf_dir, "orders").count()
    assert row.n == n_orders


def test_ece_bounds(spark, sf_dir):
    """ECE ≤ MCE (mean of |gaps| vs max); both in [0, 1e6]; bins cover
    the corpus."""
    row = _QUERIES["q_ece"](spark, sf_dir).first()
    n_docs = load(spark, sf_dir, "documents").count()
    assert row.n == n_docs
    assert 0 <= row.ece_micro <= row.mce_micro <= 1000000


def test_simpson_flag_consistent(spark, sf_dir):
    """The flag reproduces sign(agg) ≠ sign(within) from the published
    gaps; the sign census is bounded by the stratum count."""
    row = _QUERIES["q_simpson_check"](spark, sf_dir).first()
    assert row.n_strata == 5
    assert 0 <= row.n_pos_strata <= row.n_strata
    want = 1 if (row.agg_diff_dollars > 0) != (
        row.within_diff_dollars > 0
    ) else 0
    assert row.simpson_flag == want


# --------------------------------------------------------------------------
# wave 75: distribution fit, forecast accuracy, load profile
# --------------------------------------------------------------------------

def test_lognormal_fit_orderings(spark, sf_dir):
    """Lognormal structure: implied mean ≥ implied median (σ > 0);
    σ ≥ 0; the implied median is within the observed length range."""
    row = _QUERIES["q_lognormal_fit"](spark, sf_dir).first()
    assert row.sigma_micro >= 0
    assert row.implied_mean_chars >= row.implied_median_chars
    rng = (
        load(spark, sf_dir, "documents")
        .where(F.col("n_chars") > 0)
        .agg(F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi"))
        .first()
    )
    assert rng.lo <= row.implied_median_chars <= rng.hi
    assert row.mean_ratio_ppm > 0


def test_smape_relations(spark, sf_dir):
    """sMAPE ≤ MAPE when forecasts are unbiased-ish (symmetric
    denominator ≥ actual whenever fc ≥ actual... use the weaker always-
    true bound sMAPE ≤ 2e6); MAE positive; n = days beyond the lag."""
    row = _QUERIES["q_smape_eval"](spark, sf_dir).first()
    assert row.mae_cents > 0
    assert 0 < row.smape_ppm <= 2000000
    assert 0 < row.mape_ppm
    days = {
        r.t
        for r in load(spark, sf_dir, "orders")
        .select(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).alias("t")
        )
        .distinct()
        .collect()
    }
    # pairs exist only where BOTH t and t-7 are observed (sparse
    # calendars at small sf leave gaps)
    assert row.n == sum(1 for t in days if t - 7 in days)


def test_diurnal_profile_closes(spark, sf_dir):
    """24 hour buckets; event counts sum to the corpus; shares sum to
    ~1e6; users per hour bounded by the population."""
    rows = _QUERIES["q_diurnal_profile"](spark, sf_dir).collect()
    assert sorted(r.hour_of_day for r in rows) == list(range(24))
    n_events = load(spark, sf_dir, "events").count()
    n_users = (
        load(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_events for r in rows) == n_events
    assert abs(sum(r.share_ppm for r in rows) - 1000000) <= 24
    for r in rows:
        assert 0 < r.n_users <= n_users


# --------------------------------------------------------------------------
# wave 76: divergence, rank stability & operating point
# --------------------------------------------------------------------------

def test_js_divergence_bounds(spark, sf_dir):
    """JS ≤ ln2 (693147 micro) and nonnegative; JS ≤ (KL_pq + KL_qp)/2
    (Jensen); both KLs nonnegative."""
    row = _QUERIES["q_js_divergence"](spark, sf_dir).first()
    assert 0 <= row.js_micro <= 693148
    assert row.kl_pq_micro >= 0 and row.kl_qp_micro >= 0
    assert row.js_micro <= (row.kl_pq_micro + row.kl_qp_micro) / 2 + 1


def test_rank_churn_set_arithmetic(spark, sf_dir):
    """Overlap nests within both top sets; new entrants complement the
    stayers; Jaccard recomputes from the published counts."""
    row = _QUERIES["q_rank_churn"](spark, sf_dir).first()
    assert 0 <= row.n_stay <= min(row.n0, row.n1)
    assert row.n_new == row.n1 - row.n_stay
    want = row.n_stay * 1e6 / (row.n0 + row.n1 - row.n_stay)
    assert abs(row.jaccard_ppm - want) <= 1


def test_best_f1_dominates_pr_points(spark, sf_dir):
    """The argmax-F1 threshold's F1 is ≥ the F1 implied by every point
    of q_pr_curve (same construction, so this pins the argmax)."""
    best = _QUERIES["q_best_f1"](spark, sf_dir).first()
    pr = _QUERIES["q_pr_curve"](spark, sf_dir).collect()
    total_pos = max(r.tp for r in pr)
    for r in pr:
        f1 = 2.0 * r.tp * 1e6 / (r.pred_pos + total_pos)
        assert best.f1_ppm >= int(f1 + 0.5) - 1


# --------------------------------------------------------------------------
# wave 77: product & quality analytics
# --------------------------------------------------------------------------

def test_boxplot_quartile_order(spark, sf_dir):
    """q1 ≤ median ≤ q3 per segment; outliers are a strict minority;
    segment sizes sum to the joined order count."""
    rows = _QUERIES["q_boxplot_stats"](spark, sf_dir).collect()
    assert len(rows) == 5
    n_orders = load(spark, sf_dir, "orders").count()
    assert sum(r.n for r in rows) == n_orders
    for r in rows:
        assert r.q1_cents <= r.median_cents <= r.q3_cents
        assert 0 <= r.n_outliers < r.n / 2


def test_growth_accounting_identity(spark, sf_dir):
    """active(t) = new + retained + resurrected equals the weekly
    distinct-user count; churn(t) = active(t−1) − retained(t); week 0
    is all-new."""
    rows = {
        r.week: r
        for r in _QUERIES["q_growth_accounting"](spark, sf_dir).collect()
    }
    weekly = {
        r.wk: r.cnt
        for r in load(spark, sf_dir, "events")
        .select(
            F.floor(
                F.datediff(
                    F.to_date("ts"), F.lit("2024-01-01").cast("date")
                ) / F.lit(7)
            ).cast("bigint").alias("wk"),
            "user_id",
        )
        .distinct()
        .groupBy("wk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for wk, r in rows.items():
        assert r.n_new + r.n_retained + r.n_resurrected == weekly[wk]
        if wk - 1 in weekly:
            assert r.n_churned == weekly[wk - 1] - r.n_retained
    first = rows[min(rows)]
    assert first.n_retained == 0 and first.n_resurrected == 0


def test_return_rate_wilson_brackets(spark, sf_dir):
    """The Wilson interval brackets the rate per year; counts nest;
    all years present."""
    rows = _QUERIES["q_return_rate"](spark, sf_dir).collect()
    assert len(rows) >= 5
    for r in rows:
        assert 0 <= r.k <= r.n
        assert 0 <= r.lo_ppm <= r.rate_ppm <= r.hi_ppm <= 1000000
