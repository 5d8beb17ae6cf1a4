"""Round-4 wave-44: survival analysis — Kaplan–Meier curve and
inter-arrival gaps over customer order histories.

``q_survival_km`` — the Kaplan–Meier estimator of customer "lifetime"
(days between first and last order, coarsened to 90-day quarters):
customers whose last order falls before the censoring horizon are
EVENTS (churned), later ones are right-CENSORED — exactly the
incomplete-observation problem KM exists for (Kaplan & Meier 1958).
S(q) = Π over event quarters ≤ q of (1 − d/n), with the at-risk count n
an exact suffix sum over the bounded quarter histogram and the product
computed as exp(Σ ln(1−d/n)) so both engines fold the SAME doubles in
the SAME (quarter-ordered) sequence.

``q_interarrival`` — per-customer consecutive order gaps in whole days:
the renewal-process view of demand (gap percentiles p25/p50/p75/p90,
interpolated identically by ``percentile``/``quantile_cont``).

The reference has no survival surface (``Data_transform.py`` passim);
siblings: ``q_retention_cohorts`` (calendar cohorts),
``q_time_to_convert`` (single-step latency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: right-censoring horizon: last orders at/after this date are censored
_KM_HORIZON = "2001-02-01"


@query("q_survival_km", oracle=rf"""
WITH c AS (
  SELECT o_custkey,
         CAST(date_diff('day', min(CAST(o_orderdate AS DATE)),
                        max(CAST(o_orderdate AS DATE))) // 90 AS BIGINT)
           AS q,
         CASE WHEN max(CAST(o_orderdate AS DATE)) < DATE '{_KM_HORIZON}'
              THEN 1 ELSE 0 END AS event
  FROM orders GROUP BY 1
),
hist AS (
  SELECT q, CAST(count(*) AS BIGINT) AS n_q,
         CAST(sum(event) AS BIGINT) AS d_q
  FROM c GROUP BY q
),
risk AS (
  SELECT q, n_q, d_q,
         CAST(sum(n_q) OVER (ORDER BY q DESC) AS BIGINT) AS n_at_risk
  FROM hist
),
km AS (
  SELECT q, n_at_risk, d_q,
         exp(sum(ln(1.0 - CAST(d_q AS DOUBLE) / n_at_risk))
             OVER (ORDER BY q)) AS s
  FROM risk
)
SELECT q AS quarter, n_at_risk, d_q AS n_events,
       round(s, 4) AS survival
FROM km ORDER BY quarter
""")
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival of customer lifetime (first→last order,
    90-day quarters; churn event = last order before the censoring
    horizon, else right-censored). n-at-risk is an exact BIGINT suffix
    sum; the product-limit estimate folds ln(1−d/n) in quarter order
    inside an ordered window so both engines produce bit-identical
    doubles before the 4-dp round.

    Scale shape: one customer-grain aggregate (corpus shuffle), then
    everything runs on the ≤~27-row quarter histogram — the suffix-sum
    and product windows are pinned to one partition via
    ``api.one_partition`` (bounded by the fixture's calendar span, the
    ``q_roc_curve`` discipline)."""
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
                < F.lit(_KM_HORIZON).cast("date")
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
    km = risk.select(
        "q", "n_at_risk", "d_q",
        F.exp(
            F.sum(
                F.log(
                    F.lit(1.0)
                    - F.col("d_q").cast("double") / F.col("n_at_risk")
                )
            ).over(w_asc)
        ).alias("s"),
    )
    return km.select(
        F.col("q").alias("quarter"),
        "n_at_risk",
        F.col("d_q").alias("n_events"),
        F.round("s", 4).alias("survival"),
    ).orderBy("quarter")


@query("q_interarrival", oracle=r"""
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
         lag(CAST(o_orderdate AS DATE))
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev_day
  FROM orders
),
g AS (
  SELECT CAST(date_diff('day', prev_day, day) AS BIGINT) AS gap
  FROM o WHERE prev_day IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_gaps,
       round(quantile_cont(gap, 0.25), 4) AS p25,
       round(quantile_cont(gap, 0.50), 4) AS p50,
       round(quantile_cont(gap, 0.75), 4) AS p75,
       round(quantile_cont(gap, 0.90), 4) AS p90
FROM g
""")
def q_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival distribution: whole-day gaps between a customer's
    consecutive orders ((date, orderkey) total order so same-day orders
    never make the sequence nondeterministic), summarized by
    interpolated exact quartiles + p90 — the renewal-process readout
    behind replenishment forecasting.

    Scale shape: the lag window partitions BY CUSTOMER (per-customer
    order streams, the ``q_event_trigrams`` discipline); gaps are exact
    BIGINT days; the percentile aggregate is the engine-matched
    interpolated form."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("day"),
        F.lag(F.to_date("o_orderdate")).over(w).alias("prev_day"),
    )
    g = o.where(F.col("prev_day").isNotNull()).select(
        F.datediff("day", "prev_day").cast("bigint").alias("gap")
    )
    # one array percentile = one value buffer, not four (q_percentiles, r6)
    return g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.expr(
            "percentile(gap, array(0.25D, 0.5D, 0.75D, 0.9D))"
        ).alias("ps"),
    ).select(
        "n_gaps",
        F.round(F.col("ps")[0], 4).alias("p25"),
        F.round(F.col("ps")[1], 4).alias("p50"),
        F.round(F.col("ps")[2], 4).alias("p75"),
        F.round(F.col("ps")[3], 4).alias("p90"),
    )
