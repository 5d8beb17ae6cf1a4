"""Round-5 wave-68: privacy release, spectral analysis, and the
distributed-training gradient shape — DP counts, a fixed-frequency
periodogram, and one exact logistic gradient-descent step.

``q_dp_counts`` — ε-differentially-private release of the per-segment
customer counts: Laplace(1/ε) noise drawn by inverse-CDF from a
deterministic md5 uniform (so the release is reproducible and
oracle-checkable), published beside the true count and absolute error
as the utility audit. The publish-side primitive of every private
analytics surface (``q_k_anonymity``/``q_l_diversity``/
``q_t_closeness`` audit the input side).

``q_periodogram`` — single-pass power estimates of the daily revenue
series at five FIXED candidate periods (7/14/30/91/365 days):
P(ω) ∝ (Σy·cos ωt)² + (Σy·sin ωt)², each projection term quantized to
integer milli-cents BEFORE the order-free BIGINT sum — the spectral
screen that tells ``q_seasonality_index``/``q_seasonal_decompose``
WHICH period to model.

``q_logistic_gd_step`` — ONE exact full-batch gradient-descent step
for logistic conversion regression on the per-user grain: the gradient
is Σ(σ(w·x) − y)·x — a pure map + order-free quantized sum, i.e. the
map-side-combine shape every distributed trainer (including MLlib's
own LBFGS) reduces to; published as (w_before, gradient, w_after) so
the whole step is auditable.

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_k_anonymity``, ``q_seasonality_index``, ``q_ols_regression``,
``q_logreg_classify``, ``q_kmeans_step`` (the clustering twin of the
"one exact distributed step" pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.operators.selection import _HEX8
from spark_ml_spark.registry import query

#: DP release parameter (sensitivity 1 counts)
_DP_EPS = 1.0

#: candidate periods (days) for the periodogram screen
_PG_PERIODS = (7, 14, 30, 91, 365)

_TWO_PI = 6.283185307179586

#: logistic GD: fixed starting weights (bias, slope) and learning rate
_GD_W0 = -1.0
_GD_W1 = 0.1
_GD_LR = 0.5


@query("q_dp_counts", oracle=rf"""
WITH seg AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS true_count
  FROM customer GROUP BY c_mktsegment
),
noised AS (
  SELECT c_mktsegment, true_count,
         (({_HEX8.format(g="c_mktsegment || '#dp'")} + 0.5)
          / 4294967296.0) - 0.5 AS u
  FROM seg
)
SELECT c_mktsegment, true_count,
       CAST(true_count
            + floor((CASE WHEN u >= 0 THEN -1.0 ELSE 1.0 END)
                    * (1.0 / {_DP_EPS}) * ln(1.0 - 2.0 * abs(u)) + 0.5)
            AS BIGINT) AS noisy_count,
       CAST(abs(floor((CASE WHEN u >= 0 THEN -1.0 ELSE 1.0 END)
                      * (1.0 / {_DP_EPS}) * ln(1.0 - 2.0 * abs(u)) + 0.5))
            AS BIGINT) AS abs_error
FROM noised
ORDER BY c_mktsegment
""")
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε={eps} differentially-private per-segment customer counts:
    Laplace(1/ε) noise via the inverse CDF −(1/ε)·sgn(u)·ln(1−2|u|)
    of a centered md5 uniform keyed by the segment name — the draw is
    deterministic, so the SAME release reproduces on both engines and
    the utility audit (|noise|) is exact. (A production release would
    withhold true_count; it is published here as the audit column.)

    Scale shape: the histogram aggregate is the only corpus work; the
    noise is one in-row expression on the 5-row segment grid. DP cost
    is O(domain), independent of corpus size."""
    seg = (
        load(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_count"))
    )
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("c_mktsegment"), F.lit("#dp"))),
                    1, 8,
                ),
                16, 10,
            ).cast("long")
            + F.lit(0.5)
        )
        / F.lit(4294967296.0)
        - F.lit(0.5)
    )
    lap = F.floor(
        F.when(u >= 0, F.lit(-1.0)).otherwise(F.lit(1.0))
        * F.lit(1.0 / _DP_EPS)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u))
        + F.lit(0.5)
    )
    return seg.select(
        "c_mktsegment",
        "true_count",
        (F.col("true_count") + lap).cast("bigint").alias("noisy_count"),
        F.abs(lap).cast("bigint").alias("abs_error"),
    ).orderBy("c_mktsegment")


q_dp_counts.__doc__ = q_dp_counts.__doc__.format(eps=_DP_EPS)


@query("q_periodogram", oracle=rf"""
WITH d AS (
  SELECT CAST(date_diff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1
),
proj AS (
  SELECT p.p,
         CAST(sum(CAST(floor(d.y * cos({_TWO_PI} * d.t / p.p) * 0.001 + 0.5)
                       AS BIGINT)) AS BIGINT) AS sc_mc,
         CAST(sum(CAST(floor(d.y * sin({_TWO_PI} * d.t / p.p) * 0.001 + 0.5)
                       AS BIGINT)) AS BIGINT) AS ss_mc,
         CAST(count(*) AS BIGINT) AS n
  FROM d, (SELECT unnest([{", ".join(str(p) for p in _PG_PERIODS)}]) AS p) p
  GROUP BY p.p
)
SELECT p AS period_days, n,
       CAST(floor((CAST(sc_mc AS DOUBLE) * sc_mc
                   + CAST(ss_mc AS DOUBLE) * ss_mc) / n / 1000000.0 + 0.5)
            AS BIGINT) AS power_cents2
FROM proj
ORDER BY period_days
""")
def q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram screen of daily revenue at {k} fixed candidate
    periods: P(ω) = ((Σy cos ωt)² + (Σy sin ωt)²)/n per period, each
    projection term y·cos(ωt) quantized to integer MILLI-cents before
    the BIGINT sum — so the two projections are order-free exact and
    only the final power division is float. The biggest power names
    the period the seasonal operators should model.

    Scale shape: the corpus reduces to the calendar grain first; the
    {k}-period fan-out is a bounded ×{k} in-row explode of the day
    table (no join), one map-side-combined aggregate per
    period, no windows at all — a shape that runs identically at any
    corpus size."""
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
    ang = F.lit(_TWO_PI) * F.col("t") / F.col("p")
    proj = (
        d.select(
            "t",
            "y",
            F.explode(
                F.array(*[F.lit(int(p)).cast("bigint") for p in _PG_PERIODS])
            ).alias("p"),
        )
        .groupBy("p")
        .agg(
            F.sum(
                F.floor(F.col("y") * F.cos(ang) * F.lit(0.001) + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("sc_mc"),
            F.sum(
                F.floor(F.col("y") * F.sin(ang) * F.lit(0.001) + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("ss_mc"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    return proj.select(
        F.col("p").alias("period_days"),
        "n",
        F.floor(
            (
                F.col("sc_mc").cast("double") * F.col("sc_mc")
                + F.col("ss_mc").cast("double") * F.col("ss_mc")
            )
            / F.col("n")
            / F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("bigint").alias("power_cents2"),
    ).orderBy("period_days")


q_periodogram.__doc__ = q_periodogram.__doc__.format(k=len(_PG_PERIODS))


@query("q_logistic_gd_step", oracle=rf"""
WITH per_user AS (
  SELECT user_id,
         count(*) * 0.01 AS x,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
grad AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(floor(
           (1.0 / (1.0 + exp(-({_GD_W0} + {_GD_W1} * x))) - y)
           * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g0_micro,
         CAST(sum(CAST(floor(
           (1.0 / (1.0 + exp(-({_GD_W0} + {_GD_W1} * x))) - y) * x
           * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS g1_micro
  FROM per_user
)
SELECT n, g0_micro, g1_micro,
       CAST(floor({_GD_W0} * 1000000.0
                  - {_GD_LR} * CAST(g0_micro AS DOUBLE) / n + 0.5)
            AS BIGINT) AS w0_next_micro,
       CAST(floor({_GD_W1} * 1000000.0
                  - {_GD_LR} * CAST(g1_micro AS DOUBLE) / n + 0.5)
            AS BIGINT) AS w1_next_micro
FROM grad
""")
def q_logistic_gd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact full-batch gradient step for logistic regression of
    purchase conversion on scaled per-user event count: per-row
    residual (σ(w·x) − y) times each feature, quantized to integer
    micro at the row so the gradient sums are order-free BIGINTs, then
    w ← w − η·∇/n. This is the map-side-combine reduction every
    distributed trainer bottoms out in — published as one auditable
    row (the ``q_kmeans_step`` discipline applied to a GLM).

    Scale shape: one events pass to the user grain, one map-only
    sigmoid expression, one single-row aggregate; a full training loop
    is this query iterated (``q_pca_power`` unrolls the same way)."""
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (F.count(F.lit(1)) * F.lit(0.01)).alias("x"),
            F.max((F.col("event_type") == "purchase").cast("int"))
            .cast("bigint").alias("y"),
        )
    )
    z = F.lit(_GD_W0) + F.lit(_GD_W1) * F.col("x")
    resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
    grad = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.floor(resid * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
        ).cast("bigint").alias("g0_micro"),
        F.sum(
            F.floor(resid * F.col("x") * F.lit(1000000.0) + F.lit(0.5))
            .cast("bigint")
        ).cast("bigint").alias("g1_micro"),
    )
    return grad.select(
        "n",
        "g0_micro",
        "g1_micro",
        F.floor(
            F.lit(_GD_W0 * 1000000.0)
            - F.lit(_GD_LR) * F.col("g0_micro").cast("double") / F.col("n")
            + F.lit(0.5)
        ).cast("bigint").alias("w0_next_micro"),
        F.floor(
            F.lit(_GD_W1 * 1000000.0)
            - F.lit(_GD_LR) * F.col("g1_micro").cast("double") / F.col("n")
            + F.lit(0.5)
        ).cast("bigint").alias("w1_next_micro"),
    )
