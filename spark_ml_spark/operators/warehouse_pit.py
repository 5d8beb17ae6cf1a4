"""Round-5 wave-70: point-in-time correctness & sampling diagnostics —
PIT state join, effective sample size of importance weights, and the
DKW confidence band for the ECDF.

``q_point_in_time_join`` — "what state was the user in when they
purchased": each purchase is joined to the LAST non-purchase event
type at-or-before it (strictly earlier in the (ts, event_id) total
order) — the point-in-time join that makes training features
leakage-free (using the CURRENT dimension value instead is the classic
time-travel bug ``q_scd2_intervals`` exists to prevent). Implemented
as the union-and-window as-of shape: ONE exchange on user_id, no range
join, no explode.

``q_ess_weights`` — Kish effective sample size (Σw)²/Σw² of a
length-proportional importance-weighting of the corpus: the
reweighting diagnostic every importance sampler (``q_dsir_select``,
``q_weighted_sample``) should publish — ESS/n says how much of the
corpus the weighted estimate actually uses.

``q_dkw_band`` — the empirical CDF of order value at fixed probe
points with the Dvoretzky-Kiefer-Wolfowitz 95% band
F̂ ± √(ln(2/α)/2n): a distribution estimate that carries its own
uniform error bar — the honest way to report an ECDF from a sample.

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_scd2_intervals``, ``q_asof_join``, ``q_dsir_select``,
``q_percentiles``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: DKW: probe points (dollars) and ln(2/α) for α = 0.05
_DKW_PROBES = (50000, 100000, 150000, 250000, 400000)
_DKW_LN2A = 3.6888794541139363  # ln(2/0.05)


@query("q_point_in_time_join", oracle=r"""
WITH u AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_fact,
         CASE WHEN event_type <> 'purchase' THEN event_type END AS state
  FROM events
),
pit AS (
  SELECT user_id, is_fact,
         last_value(state IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS state_at
  FROM u
)
SELECT coalesce(state_at, 'none') AS state_at,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM pit WHERE is_fact = 1
GROUP BY coalesce(state_at, 'none')
ORDER BY state_at
""")
def q_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: purchases attributed to the user's state —
    the last non-purchase event type STRICTLY before the purchase in
    the (ts, event_id) total order (purchases before any state row
    report 'none'). Aggregated to purchases and distinct purchasers per
    state.

    Scale shape: the union-and-window as-of pattern — facts and state
    rows share one exchange+sort on user_id, the PIT value is a
    last-ignore-nulls window with one row of effective lookback, and
    there is no interval range join or fan-out anywhere. This is the
    leakage-free feature-join shape a training pipeline runs at 100 TB
    (``q_asof_join`` is the two-table twin)."""
    u = load(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("is_fact"),
        F.when(
            F.col("event_type") != "purchase", F.col("event_type")
        ).alias("state"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pit = u.select(
        "user_id",
        "is_fact",
        F.last("state", ignorenulls=True).over(w).alias("state_at"),
    )
    return (
        pit.where(F.col("is_fact") == 1)
        .groupBy(F.coalesce(F.col("state_at"), F.lit("none")).alias("state_at"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("state_at")
    )


@query("q_ess_weights", oracle=r"""
WITH w AS (
  SELECT CAST(n_chars AS BIGINT) AS wt FROM documents
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(wt) AS BIGINT) AS sw,
         sum(CAST(wt AS HUGEINT) * wt) AS sw2
  FROM w
)
SELECT n, sw,
       CAST(floor(CAST(sw AS DOUBLE) * sw / sw2 + 0.5) AS BIGINT) AS ess,
       CAST(floor(CAST(sw AS DOUBLE) * sw / sw2 / n * 1000000.0 + 0.5)
            AS BIGINT) AS ess_ratio_ppm
FROM m
""")
def q_ess_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish effective sample size of length-proportional importance
    weights (w = n_chars): ESS = (Σw)²/Σw² and its ratio to n — the
    diagnostic that says how concentrated a weighted sample really is
    (uniform weights give exactly n; a few huge documents collapse it).

    Scale shape: one map-side-combined two-moment aggregate over the
    corpus (exact BIGINT/DECIMAL sums), one output row; publishing ESS
    beside any weighted estimate costs one extra conditional sum."""
    w = load(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("bigint").alias("wt")
    )
    m = w.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("wt").cast("bigint").alias("sw"),
        F.sum(F.col("wt").cast("decimal(19,0)") * F.col("wt")).alias("sw2"),
    )
    ess = F.col("sw").cast("double") * F.col("sw") / F.col("sw2")
    return m.select(
        "n",
        "sw",
        F.floor(ess + F.lit(0.5)).cast("bigint").alias("ess"),
        F.floor(ess / F.col("n") * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("ess_ratio_ppm"),
    )


@query("q_dkw_band", oracle=rf"""
WITH o AS (
  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS pc
  FROM orders
),
probes AS (
  SELECT unnest([{", ".join(str(p) for p in _DKW_PROBES)}]) AS probe_dollars
),
e AS (
  SELECT p.probe_dollars,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o.pc <= p.probe_dollars * 100 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_le
  FROM o, probes p
  GROUP BY p.probe_dollars
)
SELECT probe_dollars, n,
       CAST(floor(n_le * 1000000.0 / n + 0.5) AS BIGINT) AS ecdf_ppm,
       CAST(greatest(0, floor((n_le * 1.0 / n
                               - sqrt({_DKW_LN2A} / (2.0 * n)))
                              * 1000000.0 + 0.5)) AS BIGINT) AS lo_ppm,
       CAST(least(1000000, floor((n_le * 1.0 / n
                                  + sqrt({_DKW_LN2A} / (2.0 * n)))
                                 * 1000000.0 + 0.5)) AS BIGINT) AS hi_ppm
FROM e
ORDER BY probe_dollars
""")
def q_dkw_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECDF of order value at {k} fixed probe points with the 95% DKW
    band F̂ ± √(ln(2/α)/2n), clamped to [0, 1]: the band is UNIFORM
    over x, so the {k} probes inherit simultaneous coverage — an ECDF
    report that carries its own error bar.

    Scale shape: one corpus pass fanned ×{k} by an in-row explode (no
    join) into conditional counts (map-side combined); the band
    arithmetic runs on {k} rows."""
    o = load(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
        .cast("bigint").alias("pc")
    )
    e = (
        o.select(
            "pc",
            F.explode(
                F.array(
                    *[F.lit(int(p)).cast("bigint") for p in _DKW_PROBES]
                )
            ).alias("probe_dollars"),
        )
        .groupBy("probe_dollars")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                (F.col("pc") <= F.col("probe_dollars") * 100)
                .cast("bigint")
            ).cast("bigint").alias("n_le"),
        )
    )
    band = F.sqrt(F.lit(_DKW_LN2A) / (F.lit(2.0) * F.col("n")))
    f_hat = F.col("n_le") * F.lit(1.0) / F.col("n")
    return e.select(
        "probe_dollars",
        "n",
        F.floor(F.col("n_le") * F.lit(1000000.0) / F.col("n") + F.lit(0.5))
        .cast("bigint").alias("ecdf_ppm"),
        F.greatest(
            F.lit(0),
            F.floor((f_hat - band) * F.lit(1000000.0) + F.lit(0.5)),
        ).cast("bigint").alias("lo_ppm"),
        F.least(
            F.lit(1000000),
            F.floor((f_hat + band) * F.lit(1000000.0) + F.lit(0.5)),
        ).cast("bigint").alias("hi_ppm"),
    ).orderBy("probe_dollars")


q_dkw_band.__doc__ = q_dkw_band.__doc__.format(k=len(_DKW_PROBES))
