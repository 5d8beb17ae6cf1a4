"""Structural invariants for the round-4 operator waves — properties the
oracle differential can't express (it only proves Spark == DuckDB; these
pin that BOTH are computing the intended quantity).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import collect

_QUERIES, _ = collect()


def test_kmeans_step_reduces_inertia(spark, sf_dir):
    """Lloyd's algorithm guarantee: total inertia after (update →
    re-assign) is <= inertia of the initial assignment. The registered
    query returns post-step inertia; recompute the pre-step assignment
    inertia here from the same quantized points and compare."""
    from spark_ml_spark.operators.clustering import _K

    out = _QUERIES["q_kmeans_step"](spark, sf_dir)
    post = out.agg(F.sum("inertia")).first()[0]

    # pre-step: assign to the init centroids (vectors 0..K-1) and sum
    pts = (
        load(spark, sf_dir, "embeddings")
        .select(
            "vec_id",
            F.posexplode(
                F.transform(
                    F.transform("embedding", lambda x: x.cast("double")),
                    lambda x: (F.floor(x * 1000 + F.lit(0.5)) + 1000)
                    .cast("long"),
                )
            ).alias("pos", "x"),
        )
        .select("vec_id", (F.col("pos") + 1).alias("d"), "x")
    )
    c0 = pts.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("k"), "d", F.col("x").alias("c")
    )
    pre = (
        pts.join(F.broadcast(c0), "d")
        .groupBy("vec_id", "k")
        .agg(
            F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))
            .cast("long").alias("dist")
        )
        .groupBy("vec_id")
        .agg(F.min("dist").alias("dist"))
        .agg(F.sum("dist"))
        .first()[0]
    )
    assert post <= pre, (post, pre)
    # all points assigned exactly once
    n_vec = load(spark, sf_dir, "embeddings").count()
    assert out.agg(F.sum("n_points")).first()[0] == n_vec


def test_ngram_novelty_first_doc_fully_novel(spark, sf_dir):
    """The corpus's lowest doc_id (that emits any gram) can only contain
    first-occurrence grams — its novelty must be exactly 1e6 ppm."""
    out = _QUERIES["q_ngram_novelty"](spark, sf_dir)
    first = out.orderBy("doc_id").first()
    assert first.novelty_ppm == 1_000_000
    assert first.novel_grams == first.total_grams
    # novelty is a proper fraction everywhere
    bad = out.filter(
        (F.col("novel_grams") > F.col("total_grams"))
        | (F.col("novelty_ppm") > 1_000_000)
    ).count()
    assert bad == 0


def test_vocab_coverage_is_monotone(spark, sf_dir):
    """Coverage must be non-decreasing in the budget k and reach 100%
    of occurrences once k >= |vocab| (the fixture vocab is < 4096)."""
    rows = _QUERIES["q_vocab_coverage"](spark, sf_dir).orderBy("k").collect()
    covered = [r.covered_tokens for r in rows]
    assert covered == sorted(covered)
    assert rows[-1].covered_ppm == 1_000_000
    assert rows[-1].n_tokens_used == rows[-1].n_tokens_used  # present
    # each doubling of k can at most double n_tokens_used
    for a, b in zip(rows, rows[1:]):
        assert b.n_tokens_used <= 2 * max(a.n_tokens_used, 1)


def test_rrf_fusion_score_bounds(spark, sf_dir):
    """Micro-RRF of two rank-1 placements is the max possible score;
    every fused score must be positive and within it, and ranks must be
    valid 1..N permut* values."""
    from spark_ml_spark.operators.selection import _RRF_K

    out = _QUERIES["q_rrf_fusion"](spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    max_score = 2 * (1_000_000 // (_RRF_K + 1))
    for r in out:
        assert 0 < r.rrf_micro <= max_score
        assert 1 <= r.rank_a <= n_docs
        assert 1 <= r.rank_b <= n_docs
    # output is sorted by fused score desc
    scores = [r.rrf_micro for r in out]
    assert scores == sorted(scores, reverse=True)


def test_scd2_intervals_partition_history(spark, sf_dir):
    """Per entity: exactly one open interval (NULL valid_to), intervals
    are disjoint and ordered (each valid_to equals the next
    valid_from), and interval count == number of value change points."""
    out = _QUERIES["q_scd2_intervals"](spark, sf_dir)
    opens = (
        out.groupBy("user_id")
        .agg(F.sum(F.col("valid_to_us").isNull().cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
        .count()
    )
    assert opens == 0
    # adjacency: lead(valid_from) == valid_to within each user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("valid_from_us")
    gaps = (
        out.withColumn("nxt", F.lead("valid_from_us").over(w))
        .filter(
            F.col("nxt").isNotNull() & (F.col("nxt") != F.col("valid_to_us"))
        )
        .count()
    )
    assert gaps == 0


def test_geo_knn_join_distance_is_locally_minimal(spark, sf_dir):
    """Spot-check the grid-bounded kNN semantics: for every matched
    customer, no OTHER supplier in the SAME cell (the always-searched
    center cell) is strictly closer than the reported neighbor."""
    from spark_ml_spark.operators.geo import _KNN_G, _with_coords

    out = _QUERIES["q_geo_knn_join"](spark, sf_dir)
    cust = _with_coords(load(spark, sf_dir, "customer"), "c_custkey", "geoc:")
    sup = _with_coords(load(spark, sf_dir, "supplier"), "s_suppkey", "geos:")

    def cellify(df):
        return df.select(
            "k", "lat_e4", "lon_e4",
            F.expr(f"((lon_e4 + 1800000) * {_KNN_G}) DIV 3600001").alias("cx"),
            F.expr(f"((lat_e4 + 900000) * {_KNN_G}) DIV 1800001").alias("cy"),
        )

    cands = (
        cellify(cust).withColumnRenamed("k", "c_custkey")
        .join(
            cellify(sup)
            .withColumnRenamed("k", "s_k")
            .withColumnRenamed("lat_e4", "s_lat")
            .withColumnRenamed("lon_e4", "s_lon"),
            ["cx", "cy"],
        )
        .select(
            "c_custkey",
            (
                (F.col("lat_e4") - F.col("s_lat"))
                * (F.col("lat_e4") - F.col("s_lat"))
                + (F.col("lon_e4") - F.col("s_lon"))
                * (F.col("lon_e4") - F.col("s_lon"))
            ).alias("d2c"),
        )
        .groupBy("c_custkey")
        .agg(F.min("d2c").alias("best_same_cell"))
    )
    violations = (
        out.join(cands, "c_custkey")
        .filter(F.col("best_same_cell") < F.col("d2"))
        .count()
    )
    assert violations == 0


def test_salted_join_exchanges_on_salted_key(spark, sf_dir):
    """The skew-mitigation demo must actually exchange by (key, salt):
    a SortMergeJoin whose join keys include the salt column — not a
    broadcast that would make the salting dead code."""
    plan = _QUERIES["q_salted_join"](spark, sf_dir)._jdf.queryExecution()\
        .executedPlan().toString()
    assert "SortMergeJoin" in plan
    import re

    m = re.search(r"SortMergeJoin \[([^\]]*)\]", plan)
    assert m and "salt" in m.group(1), m.group(0) if m else plan[:400]


def test_assoc_rules_metric_identities(spark, sf_dir):
    """Rule-metric sanity the oracle differential can't see: counts
    nest (n_co <= min(n_ante, n_cons) <= n_baskets implied), confidence
    never exceeds 1e6 ppm, support <= confidence (support divides by
    the bigger denominator), and lift is positive."""
    rows = _QUERIES["q_assoc_rules"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 40
    for r in rows:
        assert r.n_co <= min(r.n_ante, r.n_cons)
        assert 0 < r.confidence_ppm <= 1_000_000
        assert r.support_ppm <= r.confidence_ppm
        assert r.lift_ppm > 0


def test_islands_streaks_are_consistent(spark, sf_dir):
    """Each streak's day count must equal its calendar span (that IS
    the consecutiveness claim), and the top-20 must be sorted by the
    deterministic (len desc, user, start) tie-break."""
    rows = _QUERIES["q_islands"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    import datetime as _dt

    for r in rows:
        start = _dt.date.fromisoformat(r.streak_start)
        end = _dt.date.fromisoformat(r.streak_end)
        assert (end - start).days + 1 == r.streak_days
    keys = [(-r.streak_days, r.user_id, r.streak_start) for r in rows]
    assert keys == sorted(keys)


def test_ab_test_statistic_matches_scipy_formula(spark, sf_dir):
    """Recompute the pooled two-proportion z from the query's own exact
    counts in Python floats — the closed form must agree to 4 dp, and
    the ppm rates must be the floor-half-up quantization of conv/n."""
    r = _QUERIES["q_ab_test"](spark, sf_dir).collect()[0]
    import math

    p_a, p_b = r.conv_a / r.n_a, r.conv_b / r.n_b
    pool = (r.conv_a + r.conv_b) / (r.n_a + r.n_b)
    assert 0.0 < pool < 1.0  # interior — the threshold exists for this
    z = (p_a - p_b) / math.sqrt(pool * (1 - pool) * (1 / r.n_a + 1 / r.n_b))
    assert abs(z - r.z_score) < 5e-5
    assert r.rate_a_ppm == math.floor(p_a * 1e6 + 0.5)
    assert r.significant_95 == (1 if abs(z) > 1.959964 else 0)


def test_welch_ttest_df_within_bounds(spark, sf_dir):
    """Welch–Satterthwaite df must lie in [min(n1,n2)-1, n1+n2-2] and
    the t statistic must carry the sign of mean_1 - mean_2."""
    r = _QUERIES["q_welch_ttest"](spark, sf_dir).collect()[0]
    assert min(r.n1, r.n2) - 1 <= r.df_welch <= r.n1 + r.n2 - 2
    if r.mean_1 != r.mean_2:
        import math

        assert math.copysign(1, r.t_stat) == math.copysign(
            1, r.mean_1 - r.mean_2
        )


def test_chisq_independence_bounds(spark, sf_dir):
    """chi2 >= 0, dof = (5-1)*(5-1) on the fixture vocabularies, and
    Cramér's V in [0, 1] — plus V's definition recomputed from chi2."""
    r = _QUERIES["q_chisq_independence"](spark, sf_dir).collect()[0]
    import math

    assert r.chi2 >= 0.0
    assert r.dof == 16
    assert 0.0 <= r.cramers_v <= 1.0
    assert abs(r.cramers_v - round(math.sqrt(r.chi2 / (r.n_tot * 4)), 4)) < 5e-4


def test_autocorr_is_valid_correlation(spark, sf_dir):
    """ACF values are correlations: |r| <= 1; the lag-k pair count can
    never exceed n_days - k (each pair consumes a distinct start day
    whose k-step successor exists — NOT monotone in k when the calendar
    has gaps, a day missing at lag 1 can still pair at lag 2)."""
    rows = _QUERIES["q_autocorr"](spark, sf_dir).collect()
    assert [r.lag for r in rows] == list(range(1, 8))
    assert all(abs(r.acf) <= 1.0 for r in rows)
    from spark_ml_spark.io.sources import load
    from pyspark.sql import functions as F

    n_days = (
        load(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate").alias("d")).distinct().count()
    )
    for r in rows:
        assert 0 < r.n_pairs <= n_days - r.lag


def test_cusum_stat_matches_scaled_argmax(spark, sf_dir):
    """cusum_stat must be d_scaled / T recomputed from the per-year day
    counts, and the changepoint day must fall inside its year."""
    rows = _QUERIES["q_cusum_changepoint"](spark, sf_dir).collect()
    from spark_ml_spark.io.sources import load
    from pyspark.sql import functions as F

    big_t = {
        r.yr: r.n
        for r in load(spark, sf_dir, "orders")
        .select(F.year("o_orderdate").alias("yr"),
                F.to_date("o_orderdate").alias("day"))
        .groupBy("yr").agg(F.count_distinct("day").alias("n"))
        .collect()
    }
    assert len(rows) == len(big_t)
    for r in rows:
        assert r.changepoint_day.startswith(str(r.yr))
        assert abs(r.cusum_stat - round(r.d_scaled / big_t[r.yr], 4)) < 5e-4


def test_seasonality_indices_average_to_unity(spark, sf_dir):
    """The day-count-weighted mean of the dow indices is 1e6 ppm by
    construction (each day contributes once to exactly one dow)."""
    rows = _QUERIES["q_seasonality_index"](spark, sf_dir).collect()
    assert len(rows) == 7
    n = sum(r.n_days for r in rows)
    weighted = sum(r.index_ppm * r.n_days for r in rows) / n
    assert abs(weighted - 1_000_000) < 100  # quantization slack only


def test_moving_median_is_middle_order_statistic(spark, sf_dir):
    """Recompute each 7-day median from the emitted series itself: the
    med7 at row i must be the sorted middle of x[i-6..i]."""
    rows = _QUERIES["q_moving_median"](spark, sf_dir).collect()
    xs = [r.x for r in rows]
    # rows start at rn=7; reconstruct needs the 6 warm-up days too, so
    # only check rows whose full window lies inside the emitted range.
    for i in range(6, len(rows)):
        window = sorted(xs[i - 6 : i + 1])
        assert rows[i].med7 == window[3]


def test_degree_histogram_buckets_partition_degrees(spark, sf_dir):
    """Bucket k must hold degrees in [2^k, 2^(k+1)) and the node total
    must equal the graph's node count (every node in exactly one
    bucket)."""
    rows = _QUERIES["q_degree_histogram"](spark, sf_dir).collect()
    for r in rows:
        assert 2**r.bucket <= r.deg_min <= r.deg_max < 2 ** (r.bucket + 1)
    tri = _QUERIES["q_triangle_count"](spark, sf_dir).collect()[0]
    assert sum(r.n_nodes for r in rows) == tri.n_nodes


def test_triangle_census_identities(spark, sf_dir):
    """Structural identities: 3T <= W (every triangle closes exactly 3
    wedges, no wedge closes twice), W = sum C(deg,2) is consistent with
    2*edges = sum deg via Cauchy-Schwarz lower bound 0, and the ppm is
    the quantized 3T/W."""
    r = _QUERIES["q_triangle_count"](spark, sf_dir).collect()[0]
    assert 0 <= 3 * r.n_triangles <= r.n_wedges
    assert r.clustering_ppm == int(
        3.0 * r.n_triangles * 1e6 / r.n_wedges + 0.5
    )
    assert r.n_edges <= r.n_nodes * (r.n_nodes - 1) // 2


def test_butterfly_census_identities(spark, sf_dir):
    """Wedges count same-part supplier pairs, so n_wedges >= n_pairs
    implied by butterflies: B = sum C(c,2) <= C(n_wedges,2); incidence
    bounds: n_incidence <= n_suppliers * n_parts."""
    r = _QUERIES["q_butterfly_count"](spark, sf_dir).collect()[0]
    assert r.n_incidence <= r.n_suppliers * r.n_parts
    assert r.n_butterflies <= r.n_wedges * (r.n_wedges - 1) // 2
    assert r.n_wedges >= 0 and r.n_butterflies >= 0


def test_rfm_segments_cover_all_customers(spark, sf_dir):
    """Quartiles are 1..4, the segment counts sum to the number of
    distinct ordering customers, and each quartile of each dimension
    holds between floor(n/4) and ceil(n/4) customers (exact-rank
    bucketing, not approximate)."""
    rows = _QUERIES["q_rfm_segments"](spark, sf_dir).collect()
    n = sum(r.n_customers for r in rows)
    n_cust = (
        load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert n == n_cust
    for dim in ("r_q", "f_q", "m_q"):
        per = {}
        for r in rows:
            per[r[dim]] = per.get(r[dim], 0) + r.n_customers
        assert set(per) <= {1, 2, 3, 4}
        assert all(n // 4 <= v <= n // 4 + 1 for v in per.values())


def test_string_agg_lists_top3_in_order(spark, sf_dir):
    """Each nation's string holds <= 3 comma-joined names matching
    n_listed, and re-deriving the top-3 for one nation agrees."""
    rows = _QUERIES["q_string_agg"](spark, sf_dir).collect()
    for r in rows:
        assert len(r.top_names.split(",")) == r.n_listed <= 3
    nat0 = rows[0]
    nat = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    expect = (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .where(F.col("n_name") == nat0.n_name)
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .limit(3)
        .select("c_name")
        .collect()
    )
    assert nat0.top_names == ",".join(r.c_name for r in expect)


def test_knn_classify_vote_bounds(spark, sf_dir):
    """Every query gets exactly one prediction; votes in [1, k]; the
    winning label's votes >= any other label's votes for that query
    (recomputed via a second aggregation)."""
    from spark_ml_spark.operators.customer_analytics import _KNN_K, _KNN_Q

    rows = _QUERIES["q_knn_classify"](spark, sf_dir).collect()
    assert len(rows) == _KNN_Q
    assert sorted(r.q_id for r in rows) == list(range(_KNN_Q))
    for r in rows:
        assert 1 <= r.votes <= _KNN_K
        assert 0 <= r.pred_label <= 9


def test_jackknife_ci_brackets_mean(spark, sf_dir):
    """CI must bracket the point estimate symmetrically (half-width =
    1.959964*se to 4dp) and the mean must equal the exact global mean
    recomputed from micro-units."""
    r = _QUERIES["q_jackknife_ci"](spark, sf_dir).collect()[0]
    assert r.ci_lo <= r.mean_price <= r.ci_hi
    assert abs((r.ci_hi - r.ci_lo) / 2 - 1.959964 * r.se) < 2e-3
    m = (
        load(spark, sf_dir, "orders")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    assert abs(r.mean_price - round(m.s / m.n / 1e6, 4)) < 5e-4
    assert r.n == m.n and r.n_blocks == 32


def test_period_growth_ppm_recompute(spark, sf_dir):
    """MoM ppm must recompute from consecutive rev_micros values when
    the previous calendar month exists; first month has NULL MoM; the
    first 12 months have NULL YoY."""
    rows = _QUERIES["q_period_growth"](spark, sf_dir).collect()
    rev = {r.mon: r.rev_micros for r in rows}
    import datetime as _dt

    def prev_month(s, k):
        d = _dt.date.fromisoformat(s)
        y, m = divmod((d.year * 12 + d.month - 1) - k, 12)
        return f"{y:04d}-{m + 1:02d}-01"

    assert rows[0].mom_ppm is None and rows[0].yoy_ppm is None
    for r in rows:
        p = prev_month(r.mon, 1)
        if p in rev:
            import math

            # floor(x+0.5) semantics, recomputed exactly
            expect = math.floor((r.rev_micros - rev[p]) * 1e6 / rev[p] + 0.5)
            assert r.mom_ppm == expect, (r.mon, r.mom_ppm, expect)


def test_rolling_distinct_dominates_daily(spark, sf_dir):
    """active_7d on day d must be >= the single-day distinct count of d
    and <= total distinct users; the output covers every activity day."""
    rows = _QUERIES["q_rolling_distinct"](spark, sf_dir).collect()
    daily = {
        r.day: r.n
        for r in load(spark, sf_dir, "events")
        .groupBy(F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    total = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert {r.day for r in rows} == set(daily)
    for r in rows:
        assert daily[r.day] <= r.active_7d <= total


def test_mad_outliers_robustness_identities(spark, sf_dir):
    """Per segment: MAD >= 0, outlier count < n/2 (MAD is a robust
    scale — at most half the data can sit beyond any multiple of it
    only degenerately), and segment n's sum to the customer count."""
    rows = _QUERIES["q_mad_outliers"](spark, sf_dir).collect()
    n_cust = load(spark, sf_dir, "customer").count()
    assert sum(r.n for r in rows) == n_cust
    for r in rows:
        assert r.mad >= 0
        assert 0 <= r.n_outliers < r.n / 2


def test_diff_in_diff_is_cell_combination(spark, sf_dir):
    """DiD must recompute from the four reported cell means to 4dp."""
    r = _QUERIES["q_diff_in_diff"](spark, sf_dir).collect()[0]
    did = (r.a_post - r.a_pre) - (r.b_post - r.b_pre)
    assert abs(did - r.did) < 5e-4
    assert r.n_events == load(spark, sf_dir, "events").count()


def test_gini_index_bounds_and_scale_invariance(spark, sf_dir):
    """Gini of a non-negative distribution lies in [0, 1e6) ppm; with n
    customers all having positive spend it is also < (n-1)/n * 1e6."""
    r = _QUERIES["q_gini_index"](spark, sf_dir).collect()[0]
    assert 0 <= r.gini_ppm < 1_000_000
    assert r.gini_ppm < (r.n - 1) / r.n * 1_000_000
    assert r.total_micros > 0


def test_event_trigrams_counts_consistent(spark, sf_dir):
    """Total trigram instances across ALL patterns (recomputed without
    the top-20 cut) must equal sum over users of max(0, n_events - 2);
    the emitted top-20 is sorted by (n desc, lexicographic)."""
    rows = _QUERIES["q_event_trigrams"](spark, sf_dir).collect()
    keys = [(-r.n, r.e1, r.e2, r.e3) for r in rows]
    assert keys == sorted(keys)
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    expect_total = sum(max(0, r.c - 2) for r in per_user)
    # recompute the full trigram total independently
    from pyspark.sql import Window as _W

    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    full = (
        load(spark, sf_dir, "events")
        .select(F.lead("event_type", 2).over(w).alias("e3"))
        .where(F.col("e3").isNotNull())
        .count()
    )
    assert full == expect_total


def test_time_to_convert_percentiles_ordered(spark, sf_dir):
    """p50 <= p90, converters <= users, and both percentiles are
    non-negative (delta is constrained positive)."""
    r = _QUERIES["q_time_to_convert"](spark, sf_dir).collect()[0]
    assert 0 < r.n_converted <= r.n_users
    assert 0 <= r.p50_sec <= r.p90_sec


def test_negative_sample_histogram_accounts_everyone(spark, sf_dir):
    """Histogram masses sum to the number of ordering customers and
    n_neg never exceeds the slot budget."""
    from spark_ml_spark.operators.behavior import _NEG_K

    rows = _QUERIES["q_negative_sample"](spark, sf_dir).collect()
    n_cust = (
        load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    assert all(0 <= r.n_neg <= _NEG_K for r in rows)


def test_weighted_median_between_minmax_and_shifts_up(spark, sf_dir):
    """The weighted median must lie within the group's price range; a
    quantity-weighted median with positive weights on higher-priced
    heavy lines must also dominate pure min (sanity of the frequency
    argument actually being applied: recompute one group by expansion)."""
    rows = _QUERIES["q_weighted_median"](spark, sf_dir).collect()
    x = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 1)
        .select(
            F.col("l_returnflag").alias("flag"),
            "l_extendedprice",
            F.col("l_quantity").cast("int").alias("w"),
        )
    )
    bounds = {
        r.flag: (r.lo, r.hi)
        for r in x.groupBy("flag")
        .agg(F.min("l_extendedprice").alias("lo"),
             F.max("l_extendedprice").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = bounds[r.flag]
        assert lo <= r.wmedian_price <= hi
    # expansion recompute for the lexicographically first flag
    flag0 = rows[0].flag
    vals = []
    for rec in x.where(F.col("flag") == flag0).collect():
        vals.extend([rec.l_extendedprice] * rec.w)
    vals.sort()
    n = len(vals)
    # quantile_cont(0.5) interpolation on the expanded multiset
    import math

    h = (n - 1) * 0.5
    lo_i, frac = int(math.floor(h)), h - math.floor(h)
    expect = vals[lo_i] + frac * (vals[lo_i + 1] - vals[lo_i]) if frac else vals[lo_i]
    assert abs(rows[0].wmedian_price - round(expect, 4)) < 5e-4


def test_share_of_total_sums_to_unity_per_region(spark, sf_dir):
    """Within each region the nation shares must sum to 1e6 ppm up to
    per-nation quantization (±ceil(n/2))."""
    rows = _QUERIES["q_share_of_total"](spark, sf_dir).collect()
    per = {}
    for r in rows:
        per.setdefault(r.region, []).append(r.share_ppm)
    for region, shares in per.items():
        assert abs(sum(shares) - 1_000_000) <= len(shares), region


def test_impute_mean_bias_identity(spark, sf_dir):
    """Imputation identities: n_imputed <= n_rows; the bias column is
    imputed_mean − true_mean to 4dp; a segment with nothing masked has
    zero bias; and the mask rate is in a plausible 2/16 band."""
    rows = _QUERIES["q_impute_mean"](spark, sf_dir).collect()
    n_tot = sum(r.n_rows for r in rows)
    n_imp = sum(r.n_imputed for r in rows)
    assert 0.02 < n_imp / n_tot < 0.30  # ~12.5% md5 mask
    for r in rows:
        assert 0 <= r.n_imputed <= r.n_rows
        assert abs(r.imputation_bias - (r.imputed_mean - r.true_mean)) < 2e-4
        if r.n_imputed == 0:
            assert abs(r.imputation_bias) < 1e-9


def test_except_all_bag_arithmetic(spark, sf_dir):
    """For each emitted part, surplus must equal max(0, c95 - c96)
    recomputed from raw counts (bag-difference semantics, not set)."""
    rows = _QUERIES["q_sql_except_all"](spark, sf_dir).collect()
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", F.year("l_shipdate").alias("yr")
    )
    counts = {
        (r.l_partkey, r.yr): r.c
        for r in li.groupBy("l_partkey", "yr")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in rows:
        c95 = counts.get((r.partkey, 1995), 0)
        c96 = counts.get((r.partkey, 1996), 0)
        assert r.surplus == max(0, c95 - c96), (r.partkey, c95, c96)


def test_roc_curve_is_monotone_and_anchored(spark, sf_dir):
    """Walking thresholds downward (bucket asc→desc ordering): tp/fp
    suffix counts must be non-increasing in bucket; the lowest bucket's
    point must be (n_pos, n_neg) i.e. ppm (1e6, 1e6)."""
    rows = _QUERIES["q_roc_curve"](spark, sf_dir).collect()
    tps = [r.tp for r in rows]
    fps = [r.fp for r in rows]
    assert tps == sorted(tps, reverse=True)
    assert fps == sorted(fps, reverse=True)
    assert rows[0].tpr_ppm == 1_000_000 and rows[0].fpr_ppm == 1_000_000


def test_pca_power_matches_numpy(spark, sf_dir):
    """Recompute w = G·1 with numpy over the same quantized integers —
    exact equality, not tolerance."""
    import numpy as np

    rows = _QUERIES["q_pca_power"](spark, sf_dir).collect()
    emb = load(spark, sf_dir, "embeddings").select("embedding").collect()
    M = np.floor(
        np.array([r.embedding for r in emb], dtype=np.float64) * 1000 + 0.5
    ).astype(np.int64)
    w = (M * M.sum(axis=1, keepdims=True)).sum(axis=0)
    got = {r.d: r.w_d for r in rows}
    assert len(got) == M.shape[1]
    for d in range(M.shape[1]):
        assert got[d + 1] == int(w[d]), (d, got[d + 1], int(w[d]))


def test_skyline_is_pareto_frontier(spark, sf_dir):
    """No emitted point may dominate another (strictly increasing price
    as qty decreases), and every point must be undominated against the
    raw level table."""
    rows = _QUERIES["q_skyline"](spark, sf_dir).collect()
    # frontier sorted by qty asc must have strictly decreasing price
    prices = [r.best_price for r in rows]
    assert prices == sorted(prices, reverse=True)
    assert len(set(prices)) == len(prices)
    lvl = {
        r.qty: r.p
        for r in load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_quantity").cast("bigint").alias("qty"))
        .agg(F.max("l_extendedprice").alias("p"))
        .collect()
    }
    emitted = {r.qty for r in rows}
    for q, p in lvl.items():
        dominated = any(
            q2 >= q and p2 >= p and (q2 > q or p2 > p)
            for q2, p2 in lvl.items()
            if q2 != q or p2 != p
        )
        if not dominated:
            assert q in emitted, (q, p)


def test_srm_check_matches_user_partition(spark, sf_dir):
    """n_a + n_b must equal the distinct user count and the chi2 value
    must recompute from the two counts."""
    r = _QUERIES["q_srm_check"](spark, sf_dir).collect()[0]
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert r.n_a + r.n_b == n_users
    expect = (r.n_a - r.n_b) ** 2 / (r.n_a + r.n_b)
    assert abs(r.chi2 - round(expect, 4)) < 5e-4
    assert r.srm_flag == (1 if expect > 3.841459 else 0)


def test_stream_windowed_topk_agrees_with_batch(spark, sf_dir):
    """The streaming leader per hour must equal the batch recompute —
    one winner per hour, counts positive."""
    rows = _QUERIES["q_stream_windowed_topk"](spark, sf_dir).collect()
    hours = [r.hour_bucket for r in rows]
    assert len(hours) == len(set(hours))
    batch = (
        load(spark, sf_dir, "events")
        .groupBy(
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint")
            .alias("hour_bucket"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    best = {}
    for b in batch:
        k = b.hour_bucket
        cand = (-b.n, b.event_type)
        if k not in best or cand < best[k]:
            best[k] = cand
    for r in rows:
        assert (-r.n_events, r.top_type) == best[r.hour_bucket]


def test_item_similarity_cosine_bounds(spark, sf_dir):
    """co <= min(deg_a, deg_b) implies cosine <= 1e6 ppm; support floor
    respected; output sorted by (cosine desc, a, b)."""
    rows = _QUERIES["q_item_similarity"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.co >= 3
        assert r.co <= min(r.deg_a, r.deg_b)
        assert 0 < r.cosine_ppm <= 1_000_000
    keys = [(-r.cosine_ppm, r.a, r.b) for r in rows]
    assert keys == sorted(keys)


def test_random_projection_concentrates(spark, sf_dir):
    """JL with k=8 has E[ratio]=1: the vector-count-weighted mean of
    bucket midpoints must sit within 30% of 1e6, and every vector is
    histogrammed exactly once."""
    rows = _QUERIES["q_random_projection"](spark, sf_dir).collect()
    n_vec = load(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_vec
    mean_mid = (
        sum((r.bucket * 100_000 + 50_000) * r.n_vectors for r in rows)
        / n_vec
    )
    assert 700_000 < mean_mid < 1_300_000, mean_mid


def test_dbscan_core_histogram_accounts_everyone(spark, sf_dir):
    """Bucket masses sum to the customer count; n_core is nonzero only
    in buckets >= minPts and equals n_points there (bucket membership
    implies the core predicate for buckets below the cap)."""
    from spark_ml_spark.operators.geo import _DB_MIN

    rows = _QUERIES["q_dbscan_core"](spark, sf_dir).collect()
    n_cust = load(spark, sf_dir, "customer").count()
    assert sum(r.n_points for r in rows) == n_cust
    for r in rows:
        if r.nbr_bucket < _DB_MIN:
            assert r.n_core == 0
        elif r.nbr_bucket < 10:
            assert r.n_core == r.n_points


def test_csv_malformed_partition_is_exhaustive(spark, sf_dir):
    """good + bad = total = orders row count, and the good-key sum plus
    the masked-key sum equals the full key sum (nothing lost, nothing
    double-counted)."""
    r = _QUERIES["q_csv_malformed"](spark, sf_dir).collect()[0]
    o = load(spark, sf_dir, "orders")
    assert r.n_total == o.count()
    assert r.n_good + r.n_bad == r.n_total
    full = o.agg(F.sum("o_orderkey")).first()[0]
    bad_sum = (
        o.where(
            F.substring(
                F.md5(F.concat(F.lit("dirty:"),
                               F.col("o_orderkey").cast("string"))), 1, 1
            ) == "0"
        ).agg(F.coalesce(F.sum("o_orderkey"), F.lit(0))).first()[0]
    )
    assert r.good_key_sum == full - bad_sum


def test_table_checksum_detects_single_row_change(spark, sf_dir):
    """The checksum must differ when one row's attribute flips —
    recompute the orders checksum with one status char swapped and
    assert inequality (collision over a 32-bit sum of 15k terms is
    astronomically unlikely and deterministic here)."""
    rows = {r.table_name: r for r in
            _QUERIES["q_table_checksum"](spark, sf_dir).collect()}
    assert set(rows) == {"region", "nation", "supplier", "part",
                         "customer", "orders"}
    o = load(spark, sf_dir, "orders")
    assert rows["orders"].n_rows == o.count()
    mutated = o.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 1, F.lit("Z"))
        .otherwise(F.col("o_orderstatus")),
    )
    h = F.conv(
        F.substring(
            F.md5(F.expr(
                "CAST(o_orderkey AS STRING) || '|' || o_orderstatus")),
            1, 8),
        16, 10,
    ).cast("bigint")
    mut_sum = mutated.agg(F.sum(h)).first()[0]
    assert mut_sum != rows["orders"].checksum


def test_mutual_info_information_inequalities(spark, sf_dir):
    """0 <= MI <= min(H(seg), H(pri)); NMI in [0,1]; entropies at most
    ln(5) for 5-value marginals."""
    import math

    r = _QUERIES["q_mutual_info"](spark, sf_dir).collect()[0]
    assert -1e-4 <= r.mi_nats <= min(r.h_seg, r.h_pri) + 1e-4
    assert -1e-4 <= r.nmi <= 1.0 + 1e-4
    assert r.h_seg <= math.log(5) + 1e-6
    assert r.h_pri <= math.log(5) + 1e-6


def test_locf_fill_identities(spark, sf_dir):
    """Filled total >= raw total (fill only adds non-negative carried
    values); gap count = emitted days minus observed days; emitted days
    = 365 minus any leading days before the first observation."""
    r = _QUERIES["q_locf_fill"](spark, sf_dir).collect()[0]
    obs = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1997)
        .select(F.to_date("o_orderdate").alias("d")).distinct().count()
    )
    assert r.filled_total >= r.raw_total
    assert r.n_gaps == r.n_days - obs
    assert r.n_days <= 365


def test_drawdown_bounds(spark, sf_dir):
    """Drawdown ppm in [0, 1e6); worst day inside its year; peak
    positive."""
    rows = _QUERIES["q_drawdown"](spark, sf_dir).collect()
    assert len(rows) >= 1
    for r in rows:
        assert 0 <= r.max_drawdown_ppm < 1_000_000
        assert r.worst_day.startswith(str(r.yr))
        assert r.peak_at_worst > 0


def test_revenue_bridge_sums_to_total_delta(spark, sf_dir):
    """The bridge identity: segment deltas sum EXACTLY to
    total(1996) - total(1995) in micro-units."""
    rows = _QUERIES["q_revenue_bridge"](spark, sf_dir).collect()
    micro = F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5)).cast(
        "bigint"
    )
    tot = {
        y: load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == y)
        .agg(F.coalesce(F.sum(micro), F.lit(0))).first()[0]
        for y in (1995, 1996)
    }
    assert sum(r.delta_micros for r in rows) == tot[1996] - tot[1995]
    assert set(r.bridge for r in rows) <= {
        "new", "churned", "expansion", "contraction", "flat"
    }


def test_auc_by_slice_bounds_and_coverage(spark, sf_dir):
    """Every language appears once, AUC in [0,1], and slice pos+neg
    counts sum to the corpus size."""
    rows = _QUERIES["q_auc_by_slice"](spark, sf_dir).collect()
    n_docs = load(spark, sf_dir, "documents").count()
    assert sum(r.n_pos + r.n_neg for r in rows) == n_docs
    for r in rows:
        assert 0.0 <= r.auc <= 1.0
        assert r.n_pos > 0 and r.n_neg > 0


def test_disparate_impact_reference_group(spark, sf_dir):
    """Exactly the best-rate group(s) sit at 1e6 ppm ratio, no ratio
    exceeds 1e6, and a flag fires iff ratio < 800000."""
    rows = _QUERIES["q_disparate_impact"](spark, sf_dir).collect()
    assert max(r.di_ratio_ppm for r in rows) == 1_000_000
    for r in rows:
        assert r.di_ratio_ppm <= 1_000_000
        assert r.four_fifths_flag == (1 if r.di_ratio_ppm < 800_000 else 0)


def test_power_analysis_closed_form(spark, sf_dir):
    """Recompute the required n from the reported base rate in Python —
    must agree exactly (same closed form, ceil of the same double)."""
    import math

    r = _QUERIES["q_power_analysis"](spark, sf_dir).collect()[0]
    # recompute from exact counts, not the quantized ppm
    u = (
        load(spark, sf_dir, "events")
        .select("user_id",
                ((F.col("event_type") == "purchase")
                 & (F.col("value") > 150.0)).cast("int").alias("p"))
        .groupBy("user_id").agg(F.max("p").alias("c"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("k"))
        .first()
    )
    p1 = u.k / u.n
    p2 = p1 + 0.05
    z2 = (1.959964 + 0.841621) ** 2
    expect = math.ceil(z2 * (p1 * (1 - p1) + p2 * (1 - p2)) / 0.0025)
    assert r.n_per_arm == expect
    assert r.powered == (1 if u.n / 2 >= expect else 0)


def test_abc_classes_partition_revenue(spark, sf_dir):
    """A+B+C part counts equal the part-grain row count, revenues sum
    to total lineitem revenue, and class A's revenue share >= class
    C's per-part average share (Pareto ordering)."""
    rows = {r.abc: r for r in
            _QUERIES["q_abc_classification"](spark, sf_dir).collect()}
    assert set(rows) <= {"A", "B", "C"} and "A" in rows
    micro = F.floor(
        F.col("l_extendedprice") * 1000000.0 + F.lit(0.5)
    ).cast("bigint")
    li = load(spark, sf_dir, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    total = li.agg(F.sum(micro)).first()[0]
    assert sum(r.n_parts for r in rows.values()) == n_parts
    assert sum(r.rev_micros for r in rows.values()) == total
    if "C" in rows:
        a = rows["A"]
        c = rows["C"]
        assert a.rev_micros / a.n_parts > c.rev_micros / c.n_parts


def test_hhi_bounds(spark, sf_dir):
    """HHI in (10000/n, 10000]: between perfectly even and monopoly."""
    rows = _QUERIES["q_hhi_concentration"](spark, sf_dir).collect()
    for r in rows:
        assert 10000 // r.n_nations <= r.hhi_bp <= 10000


def test_backlog_aging_accounts_open_orders(spark, sf_dir):
    """Bucket masses sum to the open-order count and values to the
    exact open-order micro total."""
    rows = _QUERIES["q_backlog_aging"](spark, sf_dir).collect()
    o = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "O")
    micro = F.floor(
        F.col("o_totalprice") * 1000000.0 + F.lit(0.5)
    ).cast("bigint")
    assert sum(r.n_orders for r in rows) == o.count()
    assert sum(r.value_micros for r in rows) == o.agg(F.sum(micro)).first()[0]
    assert all(0 <= r.age_bucket_q <= 8 for r in rows)


def test_survival_km_is_monotone_proper(spark, sf_dir):
    """S is non-increasing in time, within (0, 1]; at-risk counts are
    non-increasing; the first quarter's at-risk equals the customer
    count (everyone is at risk at t=0)."""
    rows = _QUERIES["q_survival_km"](spark, sf_dir).collect()
    n_cust = (
        load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert rows[0].n_at_risk == n_cust
    surv = [r.survival for r in rows]
    assert surv == sorted(surv, reverse=True)
    assert all(0.0 < s <= 1.0 for s in surv)
    risks = [r.n_at_risk for r in rows]
    assert risks == sorted(risks, reverse=True)
    assert all(r.n_events <= r.n_at_risk for r in rows)


def test_interarrival_percentiles_ordered(spark, sf_dir):
    """Quartiles are ordered, gaps are positive-or-zero whole days, and
    n_gaps = orders - customers (each customer contributes n-1 gaps)."""
    r = _QUERIES["q_interarrival"](spark, sf_dir).collect()[0]
    o = load(spark, sf_dir, "orders")
    assert r.n_gaps == o.count() - o.select("o_custkey").distinct().count()
    assert 0 <= r.p25 <= r.p50 <= r.p75 <= r.p90


def test_trend_slope_matches_numpy(spark, sf_dir):
    """Recompute one year's slope with numpy lstsq over the same
    quantized series — agreement to 4dp."""
    import numpy as np

    rows = _QUERIES["q_trend_slope"](spark, sf_dir).collect()
    yr0 = rows[0].yr
    d = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == yr0)
        .groupBy(F.unix_date(F.to_date("o_orderdate")).alias("x"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).alias("y")
        )
        .collect()
    )
    x = np.array([r.x for r in d], dtype=np.float64)
    y = np.array([r.y for r in d], dtype=np.float64)
    slope = np.polyfit(x, y, 1)[0] / 1e6
    assert abs(rows[0].slope_per_day - round(float(slope), 4)) < 5e-3


def test_volatility_positive_and_yearly(spark, sf_dir):
    """One row per year with positive volatility and n_diffs =
    days_in_year - 1 for fully-populated years."""
    rows = _QUERIES["q_volatility"](spark, sf_dir).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r.volatility > 0
        assert r.n_diffs >= 1


def test_user_entropy_histogram_bounds(spark, sf_dir):
    """Buckets within [0, 16] (max entropy ln(5) ≈ 1.609 nats → bucket
    16) and masses sum to the user count."""
    rows = _QUERIES["q_user_entropy"](spark, sf_dir).collect()
    n_users = load(spark, sf_dir, "events").select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) == n_users
    assert all(0 <= r.ent_bucket <= 16 for r in rows)


def test_segment_migration_marginals(spark, sf_dir):
    """Cell masses sum to the both-years customer count and the matrix
    covers only quartiles 1..4."""
    rows = _QUERIES["q_segment_migration"](spark, sf_dir).collect()
    o = load(spark, sf_dir, "orders")
    both = (
        o.where(F.year("o_orderdate") == 1995).select("o_custkey").distinct()
        .intersect(
            o.where(F.year("o_orderdate") == 1996)
            .select("o_custkey").distinct()
        )
        .count()
    )
    assert sum(r.n_customers for r in rows) == both
    for r in rows:
        assert 1 <= r.q_1995 <= 4 and 1 <= r.q_1996 <= 4


def test_new_vs_repeat_partitions_orders(spark, sf_dir):
    """new + repeat orders per month must equal the month's order count
    (every 1998 order is one or the other — first month ties are NEW)."""
    rows = _QUERIES["q_new_vs_repeat"](spark, sf_dir).collect()
    per_month = {
        r.mon: r.n
        for r in load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1998)
        .groupBy(
            F.date_format(
                F.date_trunc("month", F.to_date("o_orderdate")), "yyyy-MM-dd"
            ).alias("mon")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.mon for r in rows} == set(per_month)
    for r in rows:
        assert r.new_orders + r.repeat_orders == per_month[r.mon]


def test_value_deciles_lorenz_shape(spark, sf_dir):
    """Ten deciles (equal counts ±1), shares non-decreasing in decile
    (ascending spend rank), total share ≈ 1e6 ppm."""
    rows = _QUERIES["q_value_deciles"](spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    counts = [r.n_customers for r in rows]
    assert max(counts) - min(counts) <= 1
    shares = [r.share_ppm for r in rows]
    assert shares == sorted(shares)
    assert abs(sum(shares) - 1_000_000) <= 10


def test_anova_identities(spark, sf_dir):
    """eta2 in [0, 1e6]; F >= 0; k = 7 dow groups; n equals distinct
    order days."""
    r = _QUERIES["q_anova_dow"](spark, sf_dir).collect()[0]
    n_days = (
        load(spark, sf_dir, "orders")
        .select(F.to_date("o_orderdate")).distinct().count()
    )
    assert r.n == n_days and r.k == 7
    assert 0 <= r.eta2_ppm <= 1_000_000
    assert r.f_stat >= 0


def test_price_elasticity_finite(spark, sf_dir):
    """The slope exists (variance in log price > 0) and covers all
    parts."""
    r = _QUERIES["q_price_elasticity"](spark, sf_dir).collect()[0]
    n_parts = (
        load(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert r.n_parts == n_parts
    assert r.elasticity is not None
    assert abs(r.elasticity) < 100


def test_duplicate_payments_recompute(spark, sf_dir):
    """Recompute the duplicate-group count independently with a pandas
    groupby over the composite key."""
    r = _QUERIES["q_duplicate_payments"](spark, sf_dir).collect()[0]
    rows = (
        load(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).alias("cents"),
            F.to_date("o_orderdate").alias("day"),
        )
        .collect()
    )
    from collections import Counter

    c = Counter((x.o_custkey, x.cents, x.day) for x in rows)
    dups = {k: v for k, v in c.items() if v > 1}
    assert r.n_dup_groups == len(dups)
    assert r.n_dup_orders == sum(dups.values())
    assert r.exposure_cents == sum((v - 1) * k[1] for k, v in dups.items())


def test_runs_test_counts_consistent(spark, sf_dir):
    """Run count within [1, n1+n2]; each sign class non-empty on the
    revenue series; z finite."""
    r = _QUERIES["q_runs_test"](spark, sf_dir).collect()[0]
    assert r.n1 > 0 and r.n2 > 0
    assert 1 <= r.n_runs <= r.n1 + r.n2
    assert r.z_score == r.z_score  # not NaN


def test_forecast_skill_ratio_identity(spark, sf_dir):
    """theil_u must equal rmse_naive7 / rmse_naive1 to 4dp and both
    RMSEs are positive."""
    r = _QUERIES["q_forecast_skill"](spark, sf_dir).collect()[0]
    assert r.rmse_naive1 > 0 and r.rmse_naive7 > 0
    assert abs(r.theil_u - r.rmse_naive7 / r.rmse_naive1) < 5e-3
    assert r.n_days > 0
