"""Round-5 wave-75: distribution fitting, forecast accuracy & load
profiling — lognormal moment fit, sMAPE/MAPE scoring, and the diurnal
activity profile.

``q_lognormal_fit`` — method-of-moments lognormal fit of document
lengths in log space (μ̂, σ̂ of ln n_chars, each log quantized to
integer nano before the order-free sums), with the implied median e^μ
and mean e^{{μ+σ²/2}} beside the empirical mean — the standard
heavy-right-tail model for document/file sizes, and the fit-quality
read is one ratio.

``q_smape_eval`` — MAE / MAPE / sMAPE of the seasonal-naive (t−7)
daily-revenue forecast: the percentage-error metrics practitioners
quote beside ``q_forecast_skill``'s relative skill and
``q_pinball_eval``'s quantile loss, each per-day term quantized before
the exact mean.

``q_diurnal_profile`` — the hour-of-day activity profile: events,
active users, and events-per-user by hour — the load curve capacity
planning and anomaly baselines read first (``q_shewhart_chart``
monitors days; this is the within-day shape).

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_text_stats``, ``q_forecast_skill``, ``q_user_entropy``,
``q_gumbel_maxima``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: seasonal-naive lag (days)
_SMAPE_LAG = 7


@query("q_lognormal_fit", oracle=r"""
WITH lx AS (
  SELECT CAST(floor(ln(CAST(n_chars AS DOUBLE)) * 1000000000.0 + 0.5)
              AS BIGINT) AS l_nano,
         CAST(n_chars AS BIGINT) AS x
  FROM documents WHERE n_chars > 0
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(l_nano) AS BIGINT) AS sl,
         sum(CAST(l_nano AS HUGEINT) * l_nano) AS sll,
         CAST(sum(x) AS BIGINT) AS sx
  FROM lx
),
fit AS (
  SELECT n,
         CAST(sl AS DOUBLE) / n / 1e9 AS mu,
         sqrt((CAST(sll AS DOUBLE) / 1e18
               - (CAST(sl AS DOUBLE) / 1e9) * (CAST(sl AS DOUBLE) / 1e9)
                 / n) / (n - 1)) AS sigma,
         CAST(sx AS DOUBLE) / n AS emp_mean
  FROM m
)
SELECT n,
       CAST(floor(mu * 1000000.0 + 0.5) AS BIGINT) AS mu_micro,
       CAST(floor(sigma * 1000000.0 + 0.5) AS BIGINT) AS sigma_micro,
       CAST(floor(exp(mu) + 0.5) AS BIGINT) AS implied_median_chars,
       CAST(floor(exp(mu + sigma * sigma / 2.0) + 0.5) AS BIGINT)
         AS implied_mean_chars,
       CAST(floor(exp(mu + sigma * sigma / 2.0) / emp_mean * 1000000.0
                  + 0.5) AS BIGINT) AS mean_ratio_ppm
FROM fit
""")
def q_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal fit of document length by log-space moments: μ̂ and σ̂
    of ln(n_chars) (logs nano-quantized at the row so both engines sum
    identical integers), the implied median e^μ and mean e^(μ+σ²/2),
    and the implied-to-empirical mean ratio — 1e6 ppm means the
    lognormal tail assumption reproduces the observed mass.

    Scale shape: one map-side-combined three-moment pass (BIGINT /
    DECIMAL(38,0) sums of integer nano-logs), one output row."""
    lx = (
        load(spark, sf_dir, "documents")
        .where(F.col("n_chars") > 0)
        .select(
            F.floor(
                F.log(F.col("n_chars").cast("double"))
                * F.lit(1000000000.0)
                + F.lit(0.5)
            ).cast("bigint").alias("l_nano"),
            F.col("n_chars").cast("bigint").alias("x"),
        )
    )
    m = lx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("l_nano").cast("bigint").alias("sl"),
        F.sum(
            F.col("l_nano").cast("decimal(38,0)") * F.col("l_nano")
        ).alias("sll"),
        F.sum("x").cast("bigint").alias("sx"),
    )
    mu = F.col("sl").cast("double") / F.col("n") / F.lit(1e9)
    sigma = F.sqrt(
        (
            F.col("sll").cast("double") / F.lit(1e18)
            - mu * mu * F.col("n")
        )
        / (F.col("n") - 1)
    )
    emp_mean = F.col("sx").cast("double") / F.col("n")
    implied_mean = F.exp(mu + sigma * sigma / F.lit(2.0))
    return m.select(
        "n",
        F.floor(mu * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("mu_micro"),
        F.floor(sigma * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("sigma_micro"),
        F.floor(F.exp(mu) + F.lit(0.5))
        .cast("bigint").alias("implied_median_chars"),
        F.floor(implied_mean + F.lit(0.5))
        .cast("bigint").alias("implied_mean_chars"),
        F.floor(implied_mean / emp_mean * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("mean_ratio_ppm"),
    )


@query("q_smape_eval", oracle=rf"""
WITH d AS (
  SELECT CAST(date_diff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1
),
paired AS (
  SELECT a.y AS actual, b.y AS fc
  FROM d a JOIN d b ON b.t = a.t - {_SMAPE_LAG}
),
terms AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(abs(actual - fc)) AS BIGINT) AS sae,
         CAST(sum(CAST(floor(abs(actual - fc) * 1000000.0 / actual + 0.5)
                       AS BIGINT)) AS BIGINT) AS s_ape,
         CAST(sum(CAST(floor(2000000.0 * abs(actual - fc)
                             / (actual + fc) + 0.5) AS BIGINT)) AS BIGINT)
           AS s_sape
  FROM paired
)
SELECT n,
       CAST(sae // n AS BIGINT) AS mae_cents,
       CAST(s_ape // n AS BIGINT) AS mape_ppm,
       CAST(s_sape // n AS BIGINT) AS smape_ppm
FROM terms
""")
def q_smape_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAE, MAPE and sMAPE of the seasonal-naive (t−{lag}) forecast of
    daily revenue: per-day percentage errors quantized to integer ppm
    at the pair (both engines sum identical integers), exact integer
    means — the error metrics a forecast report quotes beside skill
    and pinball loss. Revenue is strictly positive here so MAPE's
    divide-by-actual is safe; sMAPE's symmetric denominator is the
    production-safe twin.

    Scale shape: corpus → calendar grain, a self-equi-join on t−{lag}
    (bounded day table), one 4-counter aggregate."""
    d = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).cast("bigint").alias("t")
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("y")
        )
    )
    a = d.alias("a")
    b = d.select(
        (F.col("t") + _SMAPE_LAG).alias("t_fc"), F.col("y").alias("fc")
    )
    paired = a.join(b, F.col("t_fc") == F.col("t")).select(
        F.col("y").alias("actual"), "fc"
    )
    err = F.abs(F.col("actual") - F.col("fc"))
    terms = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(err).cast("bigint").alias("sae"),
        F.sum(
            F.floor(err * F.lit(1000000.0) / F.col("actual") + F.lit(0.5))
            .cast("bigint")
        ).cast("bigint").alias("s_ape"),
        F.sum(
            F.floor(
                F.lit(2000000.0) * err / (F.col("actual") + F.col("fc"))
                + F.lit(0.5)
            ).cast("bigint")
        ).cast("bigint").alias("s_sape"),
    )
    return terms.select(
        "n",
        F.expr("CAST(sae DIV n AS BIGINT)").alias("mae_cents"),
        F.expr("CAST(s_ape DIV n AS BIGINT)").alias("mape_ppm"),
        F.expr("CAST(s_sape DIV n AS BIGINT)").alias("smape_ppm"),
    )


q_smape_eval.__doc__ = q_smape_eval.__doc__.format(lag=_SMAPE_LAG)


@query("q_diurnal_profile", oracle=r"""
SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(floor(count(*) * 1000.0 / count(DISTINCT user_id) + 0.5)
            AS BIGINT) AS events_per_user_milli,
       CAST(floor(count(*) * 1000000.0
                  / sum(count(*)) OVER () + 0.5) AS BIGINT)
         AS share_ppm
FROM events
GROUP BY 1
ORDER BY hour_of_day
""")
def q_diurnal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day load profile: events, distinct active users,
    events-per-user and each hour's share of total traffic — the
    within-day baseline shape that capacity planning and anomaly
    detection normalize against.

    Scale shape: one hash aggregate on the 24-value hour key (the
    distinct-user count shuffles (hour, user) pairs once); the share
    window runs on 24 rows."""
    from pyspark.sql import Window as W

    from spark_ml_spark import api

    e = load(spark, sf_dir, "events").select(
        F.hour("ts").cast("bigint").alias("hour_of_day"), "user_id"
    )
    g = e.groupBy("hour_of_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    w_all = W.partitionBy(api.one_partition("hour_of_day"))
    return g.select(
        "hour_of_day",
        "n_events",
        "n_users",
        F.floor(
            F.col("n_events") * F.lit(1000.0) / F.col("n_users") + F.lit(0.5)
        ).cast("bigint").alias("events_per_user_milli"),
        F.floor(
            F.col("n_events")
            * F.lit(1000000.0)
            / F.sum("n_events").over(w_all)
            + F.lit(0.5)
        ).cast("bigint").alias("share_ppm"),
    ).orderBy("hour_of_day")
