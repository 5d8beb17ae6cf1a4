"""Round-5 wave-64: blocked inference, entity resolution, and hazard
depth — Friedman's blocked rank test, Fellegi-Sunter record-linkage
scoring, and the Nelson-Aalen cumulative hazard.

``q_friedman_test`` — Friedman's χ² for k related treatments measured
over matched blocks: per-nation (block) ranks of the five market
segments' (treatment) mean balances, summed per segment, and
χ²_F = 12/(n·k·(k+1))·ΣR_j² − 3n(k+1) — the blocked complement to the
unblocked ``q_kruskal_wallis`` (a block removes the nation effect the
same way DiD removes the cohort effect).

``q_record_linkage`` — Fellegi-Sunter probabilistic match scoring
between the customer and supplier registries, blocked on nation:
candidate pairs come ONLY from the block equi-join, each pair gets the
sum of per-field agreement/disagreement log-odds weights, and the
output is the score histogram with the ≥threshold match decision —
the entity-resolution machinery behind every cross-registry dedup.
Field weights log2(m/u), log2((1−m)/(1−u)) are precomputed integer
MILLI constants, so pair scoring is pure BIGINT addition.

``q_nelson_aalen`` — cumulative-hazard twin of ``q_survival_km`` on
identical risk sets: H(q) = Σ_{q'≤q} d/n with each increment quantized
to nano BEFORE the cumulative integer sum, so the running total is an
order-free BIGINT (where KM must fold doubles in quarter order).

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_kruskal_wallis``, ``q_edit_distance_join``,
``q_survival_km``, ``q_anova_dow``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: Fellegi-Sunter field weights, MILLI-bits: round(log2(m/u)·1000) and
#: round(log2((1−m)/(1−u))·1000) for (m, u) =
#:   balance-proximity (.85, .10), sign-agreement (.95, .50),
#:   key-residue (.90, .10) — declared model parameters, embedded as
#: integer literals so both engines add the SAME BIGINTs.
_W_BAL_A, _W_BAL_D = 3087, -2585
_W_SIGN_A, _W_SIGN_D = 926, -3322
_W_KEY_A, _W_KEY_D = 3170, -3170
#: balance-proximity tolerance (cents) and match decision threshold
_LINK_BAL_TOL = 50000
_LINK_THRESH_MILLI = 4000

#: censoring horizon — same as q_survival_km so risk sets are identical
_NA_HORIZON = "2001-02-01"


@query("q_friedman_test", oracle=r"""
WITH cell AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS s_bal,
         CAST(count(*) AS BIGINT) AS n_cust
  FROM customer GROUP BY c_nationkey, c_mktsegment
),
complete AS (
  SELECT c_nationkey FROM cell GROUP BY c_nationkey
  HAVING count(*) = 5
),
ranked AS (
  SELECT c.c_nationkey, c.c_mktsegment,
         CAST(rank() OVER (PARTITION BY c.c_nationkey
                           ORDER BY CAST(c.s_bal AS DOUBLE) / c.n_cust,
                                    c.c_mktsegment) AS BIGINT) AS r
  FROM cell c JOIN complete b ON b.c_nationkey = c.c_nationkey
),
sums AS (
  SELECT c_mktsegment, CAST(sum(r) AS BIGINT) AS rank_sum,
         CAST(count(*) AS BIGINT) AS n_blocks
  FROM ranked GROUP BY c_mktsegment
)
SELECT c_mktsegment, rank_sum, n_blocks,
       round(12.0 / (n_blocks * 5 * 6)
             * sum(CAST(rank_sum AS DOUBLE) * rank_sum) OVER ()
             - 3.0 * n_blocks * 6, 4) AS chi2_f
FROM sums
ORDER BY c_mktsegment
""")
def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman's blocked rank test: does mean customer balance differ
    across the 5 market segments once the nation effect is blocked
    out? Within each complete block (nation with all 5 segments
    present) the segment means are ranked 1..5; χ²_F is computed from
    the segment rank sums (k−1 = 4 df under H₀).

    Engine exactness: cell means are exact rationals (BIGINT cent sums
    / counts) compared as identical doubles, ties pinned by segment
    name, so ranks — and therefore every downstream integer — agree
    bit-for-bit cross-engine.

    Scale shape: one corpus pass to the (nation × segment) cell grid
    (map-side combined), then ranking and the χ² fold run on ≤125
    cells; the rank window partitions by nation (25 independent 5-row
    partitions, never corpus rows)."""
    cents = F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5)).cast("bigint")
    cell = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum(cents).cast("bigint").alias("s_bal"),
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        )
    )
    complete = (
        cell.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_seg"))
        .where(F.col("n_seg") == 5)
        .select("c_nationkey")
    )
    w_rank = Window.partitionBy("c_nationkey").orderBy(
        F.col("s_bal").cast("double") / F.col("n_cust"), "c_mktsegment"
    )
    ranked = cell.join(F.broadcast(complete), "c_nationkey").select(
        "c_mktsegment", F.rank().over(w_rank).cast("bigint").alias("r")
    )
    sums = ranked.groupBy("c_mktsegment").agg(
        F.sum("r").cast("bigint").alias("rank_sum"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    )
    w_all = Window.partitionBy(api.one_partition("c_mktsegment"))
    return sums.select(
        "c_mktsegment",
        "rank_sum",
        "n_blocks",
        F.round(
            F.lit(12.0)
            / (F.col("n_blocks") * 5 * 6)
            * F.sum(F.col("rank_sum").cast("double") * F.col("rank_sum"))
            .over(w_all)
            - F.lit(3.0) * F.col("n_blocks") * 6,
            4,
        ).alias("chi2_f"),
    ).orderBy("c_mktsegment")


@query("q_record_linkage", oracle=rf"""
WITH pairs AS (
  SELECT (CASE WHEN abs(CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT)
                    - CAST(floor(s.s_acctbal * 100.0 + 0.5) AS BIGINT))
                    <= {_LINK_BAL_TOL}
               THEN {_W_BAL_A} ELSE {_W_BAL_D} END
          + CASE WHEN (c.c_acctbal >= 0) = (s.s_acctbal >= 0)
                 THEN {_W_SIGN_A} ELSE {_W_SIGN_D} END
          + CASE WHEN c.c_custkey % 10 = s.s_suppkey % 10
                 THEN {_W_KEY_A} ELSE {_W_KEY_D} END) AS score_milli
  FROM customer c JOIN supplier s ON s.s_nationkey = c.c_nationkey
)
SELECT CAST(score_milli AS BIGINT) AS score_milli,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(CASE WHEN score_milli >= {_LINK_THRESH_MILLI} THEN 1 ELSE 0 END
            AS BIGINT) AS is_match
FROM pairs
GROUP BY score_milli
ORDER BY score_milli
""")
def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter record-linkage scoring between the customer and
    supplier registries: candidate pairs are generated ONLY by the
    nation blocking key, each pair's score is the BIGINT sum of three
    per-field agreement/disagreement milli-bit weights (balance
    proximity, balance sign, key residue), and pairs at ≥{thresh}
    milli-bits are declared matches. Output is the exact score
    histogram — the calibration curve an ER pipeline thresholds on.

    Scale shape: the block equi-join is the only pair generator (no
    all-pairs anywhere; at 100 TB the block key would be finer — e.g.
    nation × name-prefix — which changes only the join key), scoring
    is in-row integer arithmetic on the join output, and the result
    collapses immediately to the ≤~40-row score histogram via a
    map-side-combined aggregate."""
    cb = F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5)).cast("bigint")
    sb = F.floor(F.col("s_acctbal") * 100.0 + F.lit(0.5)).cast("bigint")
    pairs = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "supplier"),
            F.col("s_nationkey") == F.col("c_nationkey"),
        )
        .select(
            (
                F.when(
                    F.abs(cb - sb) <= _LINK_BAL_TOL, F.lit(_W_BAL_A)
                ).otherwise(F.lit(_W_BAL_D))
                + F.when(
                    (F.col("c_acctbal") >= 0) == (F.col("s_acctbal") >= 0),
                    F.lit(_W_SIGN_A),
                ).otherwise(F.lit(_W_SIGN_D))
                + F.when(
                    F.col("c_custkey") % 10 == F.col("s_suppkey") % 10,
                    F.lit(_W_KEY_A),
                ).otherwise(F.lit(_W_KEY_D))
            ).alias("score_milli")
        )
    )
    return (
        pairs.groupBy("score_milli")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            F.col("score_milli").cast("bigint"),
            "n_pairs",
            (F.col("score_milli") >= _LINK_THRESH_MILLI)
            .cast("bigint")
            .alias("is_match"),
        )
        .orderBy("score_milli")
    )


q_record_linkage.__doc__ = q_record_linkage.__doc__.format(
    thresh=_LINK_THRESH_MILLI
)


@query("q_nelson_aalen", oracle=rf"""
WITH c AS (
  SELECT o_custkey,
         CAST(date_diff('day', min(CAST(o_orderdate AS DATE)),
                        max(CAST(o_orderdate AS DATE))) // 90 AS BIGINT)
           AS q,
         CASE WHEN max(CAST(o_orderdate AS DATE)) < DATE '{_NA_HORIZON}'
              THEN 1 ELSE 0 END AS event
  FROM orders GROUP BY 1
),
hist AS (
  SELECT q, CAST(count(*) AS BIGINT) AS n_q,
         CAST(sum(event) AS BIGINT) AS d_q
  FROM c GROUP BY q
),
risk AS (
  SELECT q, d_q,
         CAST(sum(n_q) OVER (ORDER BY q DESC) AS BIGINT) AS n_at_risk
  FROM hist
)
SELECT q AS quarter, n_at_risk, d_q AS n_events,
       CAST(sum(CAST(floor(CAST(d_q AS DOUBLE) * 1000000000.0 / n_at_risk
                           + 0.5) AS BIGINT))
            OVER (ORDER BY q) AS BIGINT) AS cumhaz_nano
FROM risk
ORDER BY quarter
""")
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard over the same customer-lifetime
    risk sets as ``q_survival_km``: H(q) = Σ_{{q'≤q}} d/n, each hazard
    increment quantized to integer nano BEFORE the cumulative sum —
    so unlike KM's ordered double fold, the running total is exact
    BIGINT addition and order-free by construction. (The KM relation
    S ≈ exp(−H) is pinned in tests.)

    Scale shape: one customer-grain aggregate (corpus shuffle), then
    suffix-sum and cumulative windows on the ≤~27-row quarter
    histogram, pinned to one partition via ``api.one_partition``."""
    c = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(datediff(max(CAST(o_orderdate AS DATE)), "
                "min(CAST(o_orderdate AS DATE))) DIV 90 AS BIGINT)"
            ).alias("q"),
            (
                F.max(F.to_date("o_orderdate"))
                < F.lit(_NA_HORIZON).cast("date")
            ).cast("int").alias("event"),
        )
    )
    hist = c.groupBy("q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_q"),
        F.sum("event").cast("bigint").alias("d_q"),
    )
    w_desc = (
        Window.partitionBy(api.one_partition("q"))
        .orderBy(F.col("q").desc())
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    risk = hist.select(
        "q", "d_q",
        F.sum("n_q").over(w_desc).cast("bigint").alias("n_at_risk"),
    )
    w_asc = (
        Window.partitionBy(api.one_partition("q"))
        .orderBy("q")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    inc = F.floor(
        F.col("d_q").cast("double") * F.lit(1000000000.0) / F.col("n_at_risk")
        + F.lit(0.5)
    ).cast("bigint")
    return risk.select(
        F.col("q").alias("quarter"),
        "n_at_risk",
        F.col("d_q").alias("n_events"),
        F.sum(inc).over(w_asc).cast("bigint").alias("cumhaz_nano"),
    ).orderBy("quarter")
