"""Round-5 wave-62: forecasting & attribution depth — STL-lite
seasonal decomposition, quantile-forecast pinball evaluation, and
EXACT 3-channel Shapley attribution.

``q_seasonal_decompose`` — classical additive decomposition of the
daily revenue series: trend = centered 7-day moving average (full
windows only), seasonal = day-of-week mean of the detrended series,
remainder = what's left; reported as the per-DOW seasonal profile with
remainder magnitude — the decomposition behind every seasonal-adjust
step (``q_seasonality_index`` reads the same effect as a ratio; this
extracts it additively after removing trend).

``q_pinball_eval`` — pinball (quantile) loss for a p90 forecast: the
trailing-28-day rolling p90 predicts each day's revenue, scored by
L_τ(y, ŷ) = max(τ(y−ŷ), (τ−1)(y−ŷ)) plus empirical coverage — the
proper scoring rule for quantile forecasts (``q_forecast_skill``
scores point forecasts; this scores the uncertainty band).

``q_shapley_attribution`` — EXACT Shapley values over the 3-channel
(view, click, signup) → purchase funnel: users reduce to their touched-
channel coalition (8 masks), v(S) = conversion rate of users whose
touch set ⊆ S, and the n=3 Shapley closed form splits total conversion
credit fairly — the game-theoretic answer to the heuristic
last-touch/linear splits of ``q_attribution``. Exactness is the point:
3 channels ⇒ 8 coalitions ⇒ no sampling.

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_seasonality_index``, ``q_moving_median``,
``q_forecast_skill``, ``q_ewma_forecast``, ``q_attribution``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: pinball quantile and trailing window length (days)
_PB_TAU = 0.9
_PB_WINDOW = 28

#: attribution channels in bit order (bit i set = channel i touched)
_SHAP_CHANNELS = ("view", "click", "signup")


def _daily_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day_idx BIGINT, rev_cents BIGINT) — revenue per calendar day."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
            )
            .cast("bigint")
            .alias("day_idx")
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
                .cast("bigint")
            )
            .cast("bigint")
            .alias("rev_cents")
        )
    )


_DAILY_SQL = """
  SELECT CAST(date_diff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day_idx,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
"""


@query("q_seasonal_decompose", oracle=rf"""
WITH d AS ({_DAILY_SQL}),
tr AS (
  SELECT day_idx, rev_cents,
         CAST(count(*) OVER w AS BIGINT) AS n_w,
         CAST(sum(rev_cents) OVER w AS BIGINT) AS s_w
  FROM d
  WINDOW w AS (ORDER BY day_idx ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT day_idx % 7 AS dow, day_idx,
         rev_cents - s_w * 1.0 / 7 AS detrended
  FROM tr WHERE n_w = 7
),
seas AS (
  SELECT dow, CAST(count(*) AS BIGINT) AS n_days,
         CAST(floor(sum(detrended) / count(*) + 0.5) AS BIGINT)
           AS seasonal_cents
  FROM det GROUP BY dow
)
SELECT s.dow, s.n_days, s.seasonal_cents,
       CAST(floor(sum(abs(d.detrended - s.seasonal_cents)) / s.n_days
                  + 0.5) AS BIGINT) AS mean_abs_remainder_cents
FROM det d JOIN seas s ON s.dow = d.dow
GROUP BY s.dow, s.n_days, s.seasonal_cents
ORDER BY s.dow
""")
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/seasonal/remainder decomposition of daily
    revenue: centered 7-day moving-average trend (full windows only,
    so the trend is a true local mean), day-of-week seasonal means of
    the detrended series, and the mean absolute remainder per DOW —
    seasonal effect in CENTS (additive), where ``q_seasonality_index``
    reports a multiplicative index.

    Scale shape: the corpus reduces to the calendar grain first; the
    moving-average and per-DOW aggregates run on that bounded series
    (the window pins one partition via ``api.one_partition`` — a
    calendar-sized table, never corpus rows). The trend mean divides
    exact BIGINT sums once; detrended values are identical doubles
    cross-engine."""
    d = _daily_rev(spark, sf_dir)
    w = (
        Window.partitionBy(api.one_partition("day_idx"))
        .orderBy("day_idx")
        .rowsBetween(-3, 3)
    )
    tr = d.select(
        "day_idx",
        "rev_cents",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_w"),
        F.sum("rev_cents").over(w).cast("bigint").alias("s_w"),
    )
    det = tr.where(F.col("n_w") == 7).select(
        (F.col("day_idx") % 7).alias("dow"),
        (
            F.col("rev_cents") - F.col("s_w") * F.lit(1.0) / F.lit(7)
        ).alias("detrended"),
    )
    seas = det.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.floor(F.sum("detrended") / F.count(F.lit(1)) + F.lit(0.5))
        .cast("bigint")
        .alias("seasonal_cents"),
    )
    return (
        det.join(seas, "dow")
        .groupBy("dow", "n_days", "seasonal_cents")
        .agg(
            F.floor(
                F.sum(F.abs(F.col("detrended") - F.col("seasonal_cents")))
                / F.col("n_days")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("mean_abs_remainder_cents")
        )
        .orderBy("dow")
    )


@query("q_pinball_eval", oracle=rf"""
WITH d AS ({_DAILY_SQL}),
fc AS (
  SELECT day_idx, rev_cents,
         quantile_cont(rev_cents, {_PB_TAU}) OVER (
           ORDER BY day_idx
           ROWS BETWEEN {_PB_WINDOW} PRECEDING AND 1 PRECEDING) AS yhat,
         CAST(count(*) OVER (
           ORDER BY day_idx
           ROWS BETWEEN {_PB_WINDOW} PRECEDING AND 1 PRECEDING)
         AS BIGINT) AS n_hist
  FROM d
),
scored AS (
  SELECT day_idx, rev_cents, yhat,
         CAST(floor(
           CASE WHEN rev_cents >= yhat
                THEN {_PB_TAU} * (rev_cents - yhat)
                ELSE ({_PB_TAU} - 1.0) * (rev_cents - yhat) END
           + 0.5) AS BIGINT) AS pb_cents,
         CASE WHEN rev_cents <= yhat THEN 1 ELSE 0 END AS covered
  FROM fc WHERE n_hist = {_PB_WINDOW}
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(pb_cents) // count(*) AS BIGINT) AS pinball_cents,
       CAST(floor(sum(covered) * 1000000.0 / count(*) + 0.5) AS BIGINT)
         AS coverage_ppm
FROM scored
""")
def q_pinball_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball-loss evaluation of a p90 revenue forecast: each day's
    prediction is the trailing-{w}-day rolling 90th percentile (the
    simplest serious quantile forecaster), scored by the τ={tau}
    pinball loss — the strictly proper scoring rule for quantiles —
    plus empirical coverage, which a well-calibrated p90 should hold
    near 90%. ``q_forecast_skill`` benchmarks the point forecast; this
    benchmarks the band.

    Scale shape: calendar-grain series first; the rolling quantile
    window runs on the bounded day table (one_partition pin); per-day
    losses quantize to integer cents in one deterministic double
    expression (Spark ``percentile`` ≡ DuckDB ``quantile_cont``
    interpolation on identical doubles) before the exact mean."""
    d = _daily_rev(spark, sf_dir)
    wf = (
        Window.partitionBy(api.one_partition("day_idx"))
        .orderBy("day_idx")
        .rowsBetween(-_PB_WINDOW, -1)
    )
    fc = d.select(
        "day_idx",
        "rev_cents",
        F.expr(f"percentile(rev_cents, {_PB_TAU})").over(wf).alias("yhat"),
        F.count(F.lit(1)).over(wf).cast("bigint").alias("n_hist"),
    )
    scored = fc.where(F.col("n_hist") == _PB_WINDOW).select(
        F.floor(
            F.when(
                F.col("rev_cents") >= F.col("yhat"),
                F.lit(_PB_TAU) * (F.col("rev_cents") - F.col("yhat")),
            ).otherwise(
                F.lit(_PB_TAU - 1.0) * (F.col("rev_cents") - F.col("yhat"))
            )
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("pb_cents"),
        (F.col("rev_cents") <= F.col("yhat")).cast("bigint").alias("covered"),
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.expr("CAST(sum(pb_cents) DIV count(*) AS BIGINT)")
        .alias("pinball_cents"),
        F.floor(
            F.sum("covered") * F.lit(1000000.0) / F.count(F.lit(1))
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("coverage_ppm"),
    )


q_pinball_eval.__doc__ = q_pinball_eval.__doc__.format(
    w=_PB_WINDOW, tau=_PB_TAU
)


@query("q_shapley_attribution", oracle=r"""
WITH per_user AS (
  SELECT user_id,
         CAST(max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
              + 2 * max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              + 4 * max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
              AS BIGINT) AS mask,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS conv
  FROM events GROUP BY user_id
),
bym AS (
  SELECT mask, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(conv) AS BIGINT) AS c
  FROM per_user GROUP BY mask
),
coal AS (
  SELECT s.s,
         CAST(sum(b.n) AS BIGINT) AS n_s,
         CAST(sum(b.c) AS BIGINT) AS c_s
  FROM (SELECT unnest(range(0, 8)) AS s) s
  JOIN bym b ON (b.mask & s.s) = b.mask
  GROUP BY s.s
),
v AS (
  SELECT coalesce(max(CASE WHEN s = 0 THEN c_s * 1.0 / n_s END), 0.0) AS v0,
         coalesce(max(CASE WHEN s = 1 THEN c_s * 1.0 / n_s END), 0.0) AS v1,
         coalesce(max(CASE WHEN s = 2 THEN c_s * 1.0 / n_s END), 0.0) AS v2,
         coalesce(max(CASE WHEN s = 3 THEN c_s * 1.0 / n_s END), 0.0) AS v3,
         coalesce(max(CASE WHEN s = 4 THEN c_s * 1.0 / n_s END), 0.0) AS v4,
         coalesce(max(CASE WHEN s = 5 THEN c_s * 1.0 / n_s END), 0.0) AS v5,
         coalesce(max(CASE WHEN s = 6 THEN c_s * 1.0 / n_s END), 0.0) AS v6,
         coalesce(max(CASE WHEN s = 7 THEN c_s * 1.0 / n_s END), 0.0) AS v7
  FROM coal
)
SELECT channel,
       CAST(floor(phi * 1000000.0 + 0.5) AS BIGINT) AS shapley_micro
FROM (
  SELECT 'view' AS channel,
         ((v1 - v0) / 3.0 + ((v3 - v2) + (v5 - v4)) / 6.0
          + (v7 - v6) / 3.0) AS phi
  FROM v
  UNION ALL
  SELECT 'click',
         ((v2 - v0) / 3.0 + ((v3 - v1) + (v6 - v4)) / 6.0
          + (v7 - v5) / 3.0)
  FROM v
  UNION ALL
  SELECT 'signup',
         ((v4 - v0) / 3.0 + ((v5 - v1) + (v6 - v2)) / 6.0
          + (v7 - v3) / 3.0)
  FROM v
)
ORDER BY channel
""")
def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley attribution of purchase conversion over three
    funnel channels (view / click / signup): users collapse to their
    touched-channel bitmask, the coalition value v(S) is the conversion
    rate of users whose touch set ⊆ S, and the n=3 closed form
    φᵢ = (v({i})−v(∅))/3 + Σⱼ(v({i,j})−v({j}))/6 + (v(N)−v(N∖i))/3
    splits credit with the only axiomatically fair division — where
    ``q_attribution``'s last-touch/linear rules are heuristics. Three
    channels means 8 coalitions: the computation is exact, no
    permutation sampling.

    Scale shape: ONE corpus pass reduces events to the per-user mask
    (map-side-combined max-aggregates), then to 8 mask rows; the
    coalition subset-join, v pivot, and φ arithmetic all run on ≤8-row
    tables. φ leaves integers once, as quantized micro-credit from the
    exact coalition rationals."""
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.max((F.col("event_type") == "view").cast("int"))
                + 2 * F.max((F.col("event_type") == "click").cast("int"))
                + 4 * F.max((F.col("event_type") == "signup").cast("int"))
            )
            .cast("bigint")
            .alias("mask"),
            F.max((F.col("event_type") == "purchase").cast("int"))
            .cast("bigint")
            .alias("conv"),
        )
    )
    bym = per_user.groupBy("mask").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("conv").cast("bigint").alias("c"),
    )
    coal = (
        bym.select(
            "mask",
            "n",
            "c",
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("s"),
        )
        .where(F.col("mask").bitwiseAND(F.col("s")) == F.col("mask"))
        .groupBy("s")
        .agg(
            F.sum("n").cast("bigint").alias("n_s"),
            F.sum("c").cast("bigint").alias("c_s"),
        )
    )
    # coalesce: a coalition with NO subset users (possible only when the
    # untouched-mask group is empty) contributes zero value, not NULL
    v = coal.agg(
        *[
            F.coalesce(
                F.max(
                    F.when(
                        F.col("s") == k,
                        F.col("c_s") * F.lit(1.0) / F.col("n_s"),
                    )
                ),
                F.lit(0.0),
            ).alias(f"v{k}")
            for k in range(8)
        ]
    )
    c = {k: F.col(f"v{k}") for k in range(8)}
    phis = {
        "click": (c[2] - c[0]) / 3.0
        + ((c[3] - c[1]) + (c[6] - c[4])) / 6.0
        + (c[7] - c[5]) / 3.0,
        "signup": (c[4] - c[0]) / 3.0
        + ((c[5] - c[1]) + (c[6] - c[2])) / 6.0
        + (c[7] - c[3]) / 3.0,
        "view": (c[1] - c[0]) / 3.0
        + ((c[3] - c[2]) + (c[5] - c[4])) / 6.0
        + (c[7] - c[6]) / 3.0,
    }
    rows = None
    for name in sorted(phis):
        r = v.select(
            F.lit(name).alias("channel"),
            F.floor(phis[name] * F.lit(1000000.0) + F.lit(0.5))
            .cast("bigint")
            .alias("shapley_micro"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows.orderBy("channel")
