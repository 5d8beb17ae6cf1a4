"""Round-5 wave-77: product & quality analytics — per-group boxplot
statistics, user growth accounting, and the return-rate audit.

``q_boxplot_stats`` — the five-number summary per market segment
(p25/median/p75, IQR whiskers at 1.5·IQR, outlier count): the boxplot
every distribution comparison starts from, computed with the identical
``percentile``/``quantile_cont`` interpolation on both engines.

``q_growth_accounting`` — the weekly growth-accounting quad: every
active user classified as NEW (first week seen), RETAINED (also active
last week), or RESURRECTED (seen before, inactive last week), plus
last week's CHURNED — the product-analytics identity
active(t) = new + retained + resurrected that every growth report
decomposes (``q_audience_overlap`` gives the overlap scalar; this
names where the non-overlap went).

``q_return_rate`` — the lineitem return-flag rate per ship year with
a Wilson 95% interval: the quality-trend audit (is the 'R' share
drifting?) with small-n-safe error bars.

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_percentiles``, ``q_retention_cohorts``,
``q_audience_overlap``, ``q_wilson_ci``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

_WILSON_Z = 1.96


@query("q_boxplot_stats", oracle=r"""
WITH x AS (
  SELECT c.c_mktsegment AS seg,
         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS pc
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
q AS (
  SELECT seg,
         CAST(count(*) AS BIGINT) AS n,
         quantile_cont(pc, 0.25) AS q1,
         quantile_cont(pc, 0.5) AS med,
         quantile_cont(pc, 0.75) AS q3
  FROM x GROUP BY seg
)
SELECT q.seg, q.n,
       CAST(floor(q.q1 + 0.5) AS BIGINT) AS q1_cents,
       CAST(floor(q.med + 0.5) AS BIGINT) AS median_cents,
       CAST(floor(q.q3 + 0.5) AS BIGINT) AS q3_cents,
       CAST(sum(CASE WHEN x.pc < q.q1 - 1.5 * (q.q3 - q.q1)
                       OR x.pc > q.q3 + 1.5 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM x JOIN q ON q.seg = x.seg
GROUP BY q.seg, q.n, q.q1, q.med, q.q3
ORDER BY q.seg
""")
def q_boxplot_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boxplot statistics per market segment: quartiles (identical
    interpolation both engines), and the count of points beyond the
    1.5·IQR whiskers — the distribution-comparison table behind every
    boxplot panel.

    Scale shape: one joined pass to per-segment exact quantiles (the
    5-group percentile aggregate), the 5-row quartile table broadcast
    back for the outlier count — two passes, both map-side-combined,
    no window."""
    x = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
            .cast("bigint").alias("pc"),
        )
    )
    # one array-argument percentile, not three scalar ones: each scalar
    # Percentile aggregate buffers the full per-group multiset
    # independently (same fusion as q_percentiles, r6)
    q = x.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("percentile(pc, array(0.25D, 0.5D, 0.75D))").alias("qs"),
    ).select(
        "seg", "n",
        F.col("qs")[0].alias("q1"),
        F.col("qs")[1].alias("med"),
        F.col("qs")[2].alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    out = (
        x.join(F.broadcast(q.withColumnRenamed("seg", "seg_q")),
               F.col("seg_q") == F.col("seg"))
        .groupBy("seg", "n", "q1", "med", "q3")
        .agg(
            F.sum(
                (
                    (F.col("pc") < F.col("q1") - F.lit(1.5) * iqr)
                    | (F.col("pc") > F.col("q3") + F.lit(1.5) * iqr)
                ).cast("bigint")
            ).cast("bigint").alias("n_outliers")
        )
    )
    return out.select(
        "seg",
        "n",
        F.floor(F.col("q1") + F.lit(0.5)).cast("bigint").alias("q1_cents"),
        F.floor(F.col("med") + F.lit(0.5))
        .cast("bigint").alias("median_cents"),
        F.floor(F.col("q3") + F.lit(0.5)).cast("bigint").alias("q3_cents"),
        "n_outliers",
    ).orderBy("seg")


@query("q_growth_accounting", oracle=r"""
WITH wu AS (
  SELECT DISTINCT
         CAST(date_diff('day', DATE '2024-01-01',
                        CAST(ts AS DATE)) // 7 AS BIGINT) AS wk,
         user_id
  FROM events
),
first_seen AS (
  SELECT user_id, CAST(min(wk) AS BIGINT) AS wk0 FROM wu GROUP BY user_id
),
labeled AS (
  SELECT wu.wk, wu.user_id,
         CASE WHEN f.wk0 = wu.wk THEN 'new'
              WHEN EXISTS (SELECT 1 FROM wu p
                           WHERE p.user_id = wu.user_id
                             AND p.wk = wu.wk - 1) THEN 'retained'
              ELSE 'resurrected' END AS status
  FROM wu JOIN first_seen f ON f.user_id = wu.user_id
),
churn AS (
  SELECT a.wk + 1 AS wk, CAST(count(*) AS BIGINT) AS n_churned
  FROM wu a
  WHERE NOT EXISTS (SELECT 1 FROM wu b
                    WHERE b.user_id = a.user_id AND b.wk = a.wk + 1)
    AND a.wk + 1 <= (SELECT max(wk) FROM wu)
  GROUP BY a.wk + 1
)
SELECT l.wk AS week,
       CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_retained,
       CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_resurrected,
       CAST(coalesce(max(c.n_churned), 0) AS BIGINT) AS n_churned
FROM labeled l LEFT JOIN churn c ON c.wk = l.wk
GROUP BY l.wk
ORDER BY week
""")
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: each active user is NEW (first week
    observed), RETAINED (also active the prior week) or RESURRECTED
    (returning after a gap), and each week also reports how many of
    last week's actives CHURNED — the identity
    active(t) = new + retained + resurrected, churn(t) =
    active(t−1) − retained(t), pinned by a structural test.

    Scale shape: one distinct (week, user) pass; first-seen is a
    per-user min; the prior-week flags are self-equi-joins on
    (user, wk±1) — all shuffles on the user key, no fan-out, and the
    output is the handful of calendar weeks."""
    wu = (
        load(spark, sf_dir, "events")
        .select(
            F.floor(
                F.datediff(
                    F.to_date("ts"), F.lit("2024-01-01").cast("date")
                )
                / F.lit(7)
            ).cast("bigint").alias("wk"),
            "user_id",
        )
        .distinct()
    )
    first_seen = wu.groupBy("user_id").agg(
        F.min("wk").cast("bigint").alias("wk0")
    )
    prev = wu.select(
        (F.col("wk") + 1).alias("wk_next"),
        F.col("user_id").alias("uid_prev"),
    )
    labeled = (
        wu.join(first_seen, "user_id")
        .join(
            prev,
            (F.col("wk_next") == F.col("wk"))
            & (F.col("uid_prev") == F.col("user_id")),
            "left",
        )
        .select(
            "wk",
            F.when(F.col("wk0") == F.col("wk"), "new")
            .when(F.col("uid_prev").isNotNull(), "retained")
            .otherwise("resurrected")
            .alias("status"),
        )
    )
    max_wk = wu.agg(F.max("wk").alias("mx"))
    nxt = wu.select(
        (F.col("wk") - 1).alias("wk_prev2"),
        F.col("user_id").alias("uid_next"),
    )
    churn = (
        wu.join(
            nxt,
            (F.col("wk_prev2") == F.col("wk"))
            & (F.col("uid_next") == F.col("user_id")),
            "left",
        )
        .where(F.col("uid_next").isNull())
        .crossJoin(F.broadcast(max_wk))
        .where(F.col("wk") + 1 <= F.col("mx"))
        .groupBy((F.col("wk") + 1).alias("wk_c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    agg = labeled.groupBy("wk").agg(
        F.sum((F.col("status") == "new").cast("bigint"))
        .cast("bigint").alias("n_new"),
        F.sum((F.col("status") == "retained").cast("bigint"))
        .cast("bigint").alias("n_retained"),
        F.sum((F.col("status") == "resurrected").cast("bigint"))
        .cast("bigint").alias("n_resurrected"),
    )
    return (
        agg.join(churn, F.col("wk_c") == F.col("wk"), "left")
        .select(
            F.col("wk").alias("week"),
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0))
            .cast("bigint").alias("n_churned"),
        )
        .orderBy("week")
    )


@query("q_return_rate", oracle=rf"""
WITH x AS (
  SELECT CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS yr,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS r
  FROM lineitem
),
g AS (
  SELECT yr, CAST(count(*) AS BIGINT) AS n, CAST(sum(r) AS BIGINT) AS k
  FROM x GROUP BY yr
)
SELECT yr, n, k,
       CAST(floor(k * 1000000.0 / n + 0.5) AS BIGINT) AS rate_ppm,
       CAST(floor(
         ((k * 1.0 / n + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n)
           - {_WILSON_Z} * sqrt((k * 1.0 / n) * (1.0 - k * 1.0 / n) / n
                                + {_WILSON_Z} * {_WILSON_Z}
                                  / (4.0 * n * n)))
          / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n)) * 1000000.0 + 0.5)
         AS BIGINT) AS lo_ppm,
       CAST(floor(
         ((k * 1.0 / n + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n)
           + {_WILSON_Z} * sqrt((k * 1.0 / n) * (1.0 - k * 1.0 / n) / n
                                + {_WILSON_Z} * {_WILSON_Z}
                                  / (4.0 * n * n)))
          / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n)) * 1000000.0 + 0.5)
         AS BIGINT) AS hi_ppm
FROM g
ORDER BY yr
""")
def q_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-flag ('R') rate per ship year with the Wilson 95%
    interval: the quality-trend audit — a year whose interval clears
    the others' signals a real shift, not noise.

    Scale shape: one map-side-combined (year, 2-counter) pass; the
    interval arithmetic runs on the handful of year rows."""
    x = load(spark, sf_dir, "lineitem").select(
        F.year(F.to_date("l_shipdate")).cast("bigint").alias("yr"),
        (F.col("l_returnflag") == "R").cast("bigint").alias("r"),
    )
    g = x.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r").cast("bigint").alias("k"),
    )
    z = F.lit(_WILSON_Z)
    n, k = F.col("n"), F.col("k")
    p = k * F.lit(1.0) / n
    half = z * F.sqrt(
        p * (F.lit(1.0) - p) / n + z * z / (F.lit(4.0) * n * n)
    )
    center = p + z * z / (F.lit(2.0) * n)
    denom = F.lit(1.0) + z * z / n
    return g.select(
        "yr",
        "n",
        "k",
        F.floor(k * F.lit(1000000.0) / n + F.lit(0.5))
        .cast("bigint").alias("rate_ppm"),
        F.floor((center - half) / denom * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("lo_ppm"),
        F.floor((center + half) / denom * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("hi_ppm"),
    ).orderBy("yr")
