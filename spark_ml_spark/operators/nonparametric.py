"""Round-5 wave-66: nonparametric survival & trend depth — two-group
log-rank test, Mann-Kendall trend test, and the Lincoln-Petersen
capture-recapture estimator.

``q_logrank_test`` — does customer survival differ between the
BUILDING market segment and everyone else? The log-rank statistic
compares, at every event quarter, the observed group-1 events against
the expectation under the pooled hazard, with the hypergeometric
variance — the standard two-sample censored-data test, and the
significance layer on top of ``q_survival_km``/``q_nelson_aalen``'s
estimates.

``q_mann_kendall`` — nonparametric monotone-trend test per year on the
daily revenue series: S = Σ_{i<j} sign(y_j − y_i) over the
calendar-bounded day pairs (the ``q_theilsen_slope`` pair grain — S
prices the trend's significance where Theil-Sen prices its magnitude),
with the no-ties normal variance n(n−1)(2n+5)/18 (distinct BIGINT
cent values; tie-free pinned by a test) and the continuity-corrected z.

``q_capture_recapture`` — Lincoln-Petersen (Chapman-corrected)
estimate of the true distinct-user count from two deterministic md5
"capture" samples of the events stream: N̂ = (n₁+1)(n₂+1)/(m+1) − 1 —
the ecology estimator that also prices how much of a population two
independent crawls have covered, from two cheap hash predicates.

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_survival_km``, ``q_nelson_aalen``, ``q_theilsen_slope``,
``q_kmv_distinct``, ``q_snapshot_dedup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.operators.selection import _HEX8
from spark_ml_spark.registry import query

#: censoring horizon — matches q_survival_km so lifetimes line up
_LR_HORIZON = "2001-02-01"

#: group-1 definition for the log-rank comparison
_LR_SEGMENT = "BUILDING"

#: capture probabilities (md5-uniform thresholds) for the two samples
_CR_P1 = 0.5
_CR_P2 = 0.4


@query("q_logrank_test", oracle=rf"""
WITH life AS (
  SELECT o.o_custkey,
         CAST(date_diff('day', min(CAST(o.o_orderdate AS DATE)),
                        max(CAST(o.o_orderdate AS DATE))) // 90 AS BIGINT)
           AS q,
         CASE WHEN max(CAST(o.o_orderdate AS DATE)) < DATE '{_LR_HORIZON}'
              THEN 1 ELSE 0 END AS event,
         CASE WHEN max(c.c_mktsegment) = '{_LR_SEGMENT}'
              THEN 1 ELSE 0 END AS g1
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY o.o_custkey
),
hist AS (
  SELECT q,
         CAST(count(*) AS BIGINT) AS n_q,
         CAST(sum(g1) AS BIGINT) AS n1_q,
         CAST(sum(event) AS BIGINT) AS d_q,
         CAST(sum(g1 * event) AS BIGINT) AS d1_q
  FROM life GROUP BY q
),
risk AS (
  SELECT q, d_q, d1_q,
         CAST(sum(n_q) OVER (ORDER BY q DESC) AS BIGINT) AS n_at_risk,
         CAST(sum(n1_q) OVER (ORDER BY q DESC) AS BIGINT) AS n1_at_risk
  FROM hist
),
terms AS (
  SELECT CAST(sum(d1_q) AS BIGINT) AS o1,
         sum(CAST(d_q AS DOUBLE) * n1_at_risk / n_at_risk) AS e1,
         sum(CASE WHEN n_at_risk > 1
                  THEN CAST(d_q AS DOUBLE) * n1_at_risk
                       * (n_at_risk - n1_at_risk)
                       * (n_at_risk - d_q)
                       / (CAST(n_at_risk AS DOUBLE) * n_at_risk
                          * (n_at_risk - 1))
                  ELSE 0.0 END) AS v1
  FROM (SELECT * FROM risk WHERE d_q > 0 ORDER BY q)
)
SELECT o1,
       round(e1, 4) AS e1,
       round((o1 - e1) * (o1 - e1) / v1, 4) AS chi2_logrank,
       CAST(1 AS BIGINT) AS df
FROM terms
""")
def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-group log-rank test of customer lifetime ('{seg}' vs rest):
    at each event quarter the group-1 events d₁ are compared to the
    pooled expectation d·n₁/n, with hypergeometric variance
    d·n₁·(n−n₁)·(n−d) / (n²·(n−1)); χ² = (O₁−E₁)²/V on 1 df.

    Engine exactness: all risk-set quantities are exact BIGINT suffix
    sums over the bounded quarter histogram; E₁ and V are sums of ≤~27
    identical doubles (one term per event quarter) — far below any
    4-dp rounding hazard regardless of fold order.

    Scale shape: one orders pass to the customer grain (the segment
    arrives via the customer join — broadcast at these dims), then the
    quarter histogram and two one_partition suffix-sum windows on ≤~27
    rows; the χ² fold is a single-row aggregate."""
    life = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "CAST(datediff(max(CAST(o_orderdate AS DATE)), "
                "min(CAST(o_orderdate AS DATE))) DIV 90 AS BIGINT)"
            ).alias("q"),
            (
                F.max(F.to_date("o_orderdate"))
                < F.lit(_LR_HORIZON).cast("date")
            ).cast("bigint").alias("event"),
            (F.max("c_mktsegment") == _LR_SEGMENT)
            .cast("bigint")
            .alias("g1"),
        )
    )
    hist = life.groupBy("q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_q"),
        F.sum("g1").cast("bigint").alias("n1_q"),
        F.sum("event").cast("bigint").alias("d_q"),
        F.sum(F.col("g1") * F.col("event")).cast("bigint").alias("d1_q"),
    )
    w_desc = (
        Window.partitionBy(api.one_partition("q"))
        .orderBy(F.col("q").desc())
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    risk = hist.select(
        "q", "d_q", "d1_q",
        F.sum("n_q").over(w_desc).cast("bigint").alias("n_at_risk"),
        F.sum("n1_q").over(w_desc).cast("bigint").alias("n1_at_risk"),
    ).where(F.col("d_q") > 0)
    n, n1, d = F.col("n_at_risk"), F.col("n1_at_risk"), F.col("d_q")
    terms = risk.agg(
        F.sum("d1_q").cast("bigint").alias("o1"),
        F.sum(d.cast("double") * n1 / n).alias("e1"),
        F.sum(
            F.when(
                n > 1,
                d.cast("double") * n1 * (n - n1) * (n - d)
                / (n.cast("double") * n * (n - 1)),
            ).otherwise(F.lit(0.0))
        ).alias("v1"),
    )
    return terms.select(
        "o1",
        F.round(F.col("e1"), 4).alias("e1"),
        F.round(
            (F.col("o1") - F.col("e1")) * (F.col("o1") - F.col("e1"))
            / F.col("v1"),
            4,
        ).alias("chi2_logrank"),
        F.lit(1).cast("bigint").alias("df"),
    )


q_logrank_test.__doc__ = q_logrank_test.__doc__.format(seg=_LR_SEGMENT)


@query("q_mann_kendall", oracle=r"""
WITH d AS (
  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
         CAST(date_diff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day_idx,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1, 2
),
pairs AS (
  SELECT a.yr,
         CAST(sum(CASE WHEN b.rev > a.rev THEN 1
                       WHEN b.rev < a.rev THEN -1 ELSE 0 END)
              AS BIGINT) AS s_stat
  FROM d a JOIN d b ON b.yr = a.yr AND b.day_idx > a.day_idx
  GROUP BY a.yr
),
nn AS (
  SELECT yr, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY yr
)
SELECT p.yr, nn.n, p.s_stat,
       round((CASE WHEN p.s_stat > 0 THEN p.s_stat - 1
                   WHEN p.s_stat < 0 THEN p.s_stat + 1
                   ELSE 0 END)
             / sqrt(CAST(nn.n AS DOUBLE) * (nn.n - 1) * (2 * nn.n + 5)
                    / 18.0), 4) AS z_mk
FROM pairs p JOIN nn ON nn.yr = p.yr
ORDER BY p.yr
""")
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year Mann-Kendall trend test on daily revenue:
    S = Σ_{{i<j}} sign(y_j − y_i) over time-ordered day pairs, the
    no-ties variance n(n−1)(2n+5)/18, and the continuity-corrected
    z = (S∓1)/σ. Nonparametric significance for the trend whose
    magnitude ``q_theilsen_slope`` estimates — both on the same pair
    grain.

    Engine exactness: S is an exact BIGINT pair sum over integer cent
    values (distinct-with-probability-1; tie-free is pinned by a
    structural test so the no-tie variance is the right formula); z is
    one closed-form double.

    Scale shape: the corpus reduces to the calendar grain FIRST, so
    the self-join is over per-year day pairs (≤366² intra-year, never
    corpus rows) — bounded by the calendar exactly like the Theil-Sen
    pair stage, and embarrassingly parallel across years."""
    d = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).cast("bigint").alias("day_idx"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("rev")
        )
    )
    a = d.alias("a")
    b = d.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("b.yr") == F.col("a.yr"))
            & (F.col("b.day_idx") > F.col("a.day_idx")),
        )
        .groupBy(F.col("a.yr").alias("yr"))
        .agg(
            F.sum(
                F.when(F.col("b.rev") > F.col("a.rev"), 1)
                .when(F.col("b.rev") < F.col("a.rev"), -1)
                .otherwise(0)
            ).cast("bigint").alias("s_stat")
        )
    )
    nn = d.groupBy("yr").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    s = F.col("s_stat")
    cc = (
        F.when(s > 0, s - 1).when(s < 0, s + 1).otherwise(F.lit(0))
    ).cast("double")
    sigma = F.sqrt(
        F.col("n").cast("double")
        * (F.col("n") - 1)
        * (2 * F.col("n") + 5)
        / F.lit(18.0)
    )
    return (
        pairs.join(nn, "yr")
        .select("yr", "n", "s_stat", F.round(cc / sigma, 4).alias("z_mk"))
        .orderBy("yr")
    )


@query("q_capture_recapture", oracle=rf"""
WITH u AS (
  SELECT DISTINCT user_id FROM events
),
marks AS (
  SELECT user_id,
         CASE WHEN ({_HEX8.format(g="CAST(user_id AS VARCHAR) || '#cap1'")}
                    + 0.5) / 4294967296.0 < {_CR_P1}
              THEN 1 ELSE 0 END AS c1,
         CASE WHEN ({_HEX8.format(g="CAST(user_id AS VARCHAR) || '#cap2'")}
                    + 0.5) / 4294967296.0 < {_CR_P2}
              THEN 1 ELSE 0 END AS c2
  FROM u
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_true,
         CAST(sum(c1) AS BIGINT) AS n1,
         CAST(sum(c2) AS BIGINT) AS n2,
         CAST(sum(c1 * c2) AS BIGINT) AS m12
  FROM marks
)
SELECT n_true, n1, n2, m12,
       CAST(floor(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m12 + 1) - 1 + 0.5)
            AS BIGINT) AS n_hat_chapman
FROM m
""")
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln-Petersen / Chapman capture-recapture estimate of the
    distinct-user population from two independent deterministic md5
    capture samples (p₁={p1}, p₂={p2}):
    N̂ = (n₁+1)(n₂+1)/(m+1) − 1, reported beside the true distinct
    count the fixture makes available — the estimator that prices
    two-crawl coverage without ever materializing the full population.

    Scale shape: one distinct-key pass (the only shuffle), then two
    in-row hash predicates and one 4-counter map-side-combined
    aggregate; at 100 TB the distinct pass itself can become a KMV
    sketch (``q_kmv_distinct``) without touching this shape."""
    coin1 = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"),
                               F.lit("#cap1"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    coin2 = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"),
                               F.lit("#cap2"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    marks = (
        load(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            (coin1 < _CR_P1).cast("bigint").alias("c1"),
            (coin2 < _CR_P2).cast("bigint").alias("c2"),
        )
    )
    m = marks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1") * F.col("c2")).cast("bigint").alias("m12"),
    )
    return m.select(
        "n_true",
        "n1",
        "n2",
        "m12",
        F.floor(
            (F.col("n1") + 1).cast("double")
            * (F.col("n2") + 1)
            / (F.col("m12") + 1)
            - 1
            + F.lit(0.5)
        ).cast("bigint").alias("n_hat_chapman"),
    )


q_capture_recapture.__doc__ = q_capture_recapture.__doc__.format(
    p1=_CR_P1, p2=_CR_P2
)
