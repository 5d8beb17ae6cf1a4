"""Round-5 wave-72: tails, extremes & epidemiological rates — Hill
tail-index estimation, Gumbel block-maxima fitting, and the odds
ratio / relative risk with Woolf intervals.

``q_hill_tail`` — the Hill estimator of the token-frequency tail index
over the top-k most frequent tokens: α̂ = (k−1) / Σ ln(f_i / f_(k)) — the
quantitative heaviness of the Zipf tail that ``q_zipf_audit`` plots in
octaves, and the number a vocabulary-truncation decision actually
needs.

``q_gumbel_maxima`` — extreme-value analysis of daily revenue by
monthly block maxima: method-of-moments Gumbel fit
(β̂ = s·√6/π, μ̂ = m − γβ̂) plus the implied 12-block return level —
the "how big can a peak day get" question that variance alone cannot
answer.

``q_odds_ratio`` — the 2×2 association between an urgent order and a
high-value order: odds ratio and relative risk with Woolf 95% log
intervals — the effect-size view of the same table
``q_chisq_independence`` only tests.

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_zipf_audit``, ``q_drawdown``, ``q_chisq_independence``,
``q_wilson_ci``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: Hill: number of top-order statistics used
_HILL_K = 20

#: Gumbel: Euler-Mascheroni constant and √6/π
_EULER_GAMMA = 0.5772156649015329
_SQRT6_PI = 0.7796968012336091

#: odds ratio: cell thresholds
_OR_PRICE_T = 200000.0  # high-value order: totalprice > this
_WOOLF_Z = 1.96


@query("q_hill_tail", oracle=rf"""
WITH tf AS (
  SELECT w, CAST(count(*) AS BIGINT) AS f
  FROM (SELECT unnest(string_split(lower(trim(text)), ' ')) AS w
        FROM documents)
  GROUP BY w
),
topk AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, w) AS rnk
  FROM tf ORDER BY f DESC, w LIMIT {_HILL_K}
),
kth AS (
  SELECT max(CASE WHEN rnk = {_HILL_K} THEN f END) AS f_k FROM topk
)
SELECT CAST({_HILL_K} AS BIGINT) AS k,
       CAST(max(kth.f_k) AS BIGINT) AS f_k,
       CAST(floor(({_HILL_K} - 1) * 1000000.0
                  / sum(ln(CAST(t.f AS DOUBLE) / kth.f_k)) + 0.5)
            AS BIGINT) AS hill_alpha_micro
FROM topk t, kth
WHERE t.rnk < {_HILL_K}
""")
def q_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index of the token-frequency distribution over the
    top-{k} tokens: α̂ = (k−1) / Σ_{{i<k}} ln(f_i / f_(k)) (micro-
    quantized; ties in frequency pinned by token text) — small α̂ =
    heavy Zipf tail, the number that prices how much mass a truncated
    vocabulary abandons. The divisor is the NUMBER OF LOG TERMS (k−1
    excesses over the threshold order statistic f_(k)), the standard
    conditional-MLE normalization (ADVICE r5: the earlier k/Σ form
    biased α̂ high by k/(k−1)).

    Scale shape: one tokenize pass to the token-frequency table (the
    aggregate every corpus job shares), a global top-{k} via
    TakeOrderedAndProject, then the log-sum runs on {k} rows. The sum
    is ≤{k} doubles — far under the micro quantum regardless of fold
    order."""
    tf = (
        load(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), " ")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    topk = tf.orderBy(F.col("f").desc(), "w").limit(_HILL_K).select(
        "f",
        F.row_number()
        .over(
            Window.partitionBy(api.one_partition("f")).orderBy(
                F.col("f").desc(), "w"
            )
        )
        .alias("rnk"),
    )
    kth = topk.where(F.col("rnk") == _HILL_K).select(
        F.col("f").alias("f_k")
    )
    return (
        topk.where(F.col("rnk") < _HILL_K)
        .crossJoin(F.broadcast(kth))
        .agg(
            F.lit(_HILL_K).cast("bigint").alias("k"),
            F.max("f_k").cast("bigint").alias("f_k"),
            F.floor(
                F.lit((_HILL_K - 1) * 1000000.0)
                / F.sum(F.log(F.col("f").cast("double") / F.col("f_k")))
                + F.lit(0.5)
            ).cast("bigint").alias("hill_alpha_micro"),
        )
    )


q_hill_tail.__doc__ = q_hill_tail.__doc__.format(k=_HILL_K)


@query("q_gumbel_maxima", oracle=rf"""
WITH daily AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
         CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1, 2
),
blockmax AS (
  SELECT mon, CAST(max(rev) AS BIGINT) AS mx
  FROM daily GROUP BY mon
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(mx) AS BIGINT) AS s,
         sum(CAST(mx AS HUGEINT) * mx) AS q
  FROM blockmax
),
fit AS (
  SELECT n_blocks,
         CAST(s AS DOUBLE) / n_blocks AS mean_mx,
         sqrt((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n_blocks)
              / (n_blocks - 1)) AS sd_mx
  FROM m
)
SELECT n_blocks,
       CAST(floor(mean_mx + 0.5) AS BIGINT) AS mean_max_cents,
       CAST(floor(sd_mx * {_SQRT6_PI} + 0.5) AS BIGINT) AS beta_cents,
       CAST(floor(mean_mx - {_EULER_GAMMA} * sd_mx * {_SQRT6_PI} + 0.5)
            AS BIGINT) AS mu_cents,
       CAST(floor(mean_mx - {_EULER_GAMMA} * sd_mx * {_SQRT6_PI}
                  - sd_mx * {_SQRT6_PI} * ln(-ln(1.0 - 1.0 / 12.0)) + 0.5)
            AS BIGINT) AS return_level_12_cents
FROM fit
""")
def q_gumbel_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel fit of monthly-maximum daily revenue by method of
    moments: β̂ = s·√6/π, μ̂ = m̄ − γβ̂, plus the 12-block return level
    μ̂ − β̂·ln(−ln(1 − 1/12)) — the peak-load number capacity planning
    wants, from the block-maxima view of the calendar series.

    Scale shape: corpus → calendar grain → monthly block maxima
    (~84 rows); the fit is one exact two-moment aggregate and closed
    forms. Nothing after the daily aggregate is corpus-sized."""
    daily = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.date_trunc("month", F.to_date("o_orderdate")).alias("mon"),
            F.to_date("o_orderdate").alias("d"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("rev")
        )
    )
    blockmax = daily.groupBy("mon").agg(
        F.max("rev").cast("bigint").alias("mx")
    )
    m = blockmax.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum("mx").cast("bigint").alias("s"),
        F.sum(F.col("mx").cast("decimal(38,0)") * F.col("mx")).alias("q"),
    )
    mean_mx = F.col("s").cast("double") / F.col("n_blocks")
    sd_mx = F.sqrt(
        (
            F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s") / F.col("n_blocks")
        )
        / (F.col("n_blocks") - 1)
    )
    beta = sd_mx * F.lit(_SQRT6_PI)
    mu = mean_mx - F.lit(_EULER_GAMMA) * beta
    import math

    rl_factor = -math.log(-math.log(1.0 - 1.0 / 12.0))
    return m.select(
        "n_blocks",
        F.floor(mean_mx + F.lit(0.5)).cast("bigint").alias("mean_max_cents"),
        F.floor(beta + F.lit(0.5)).cast("bigint").alias("beta_cents"),
        F.floor(mu + F.lit(0.5)).cast("bigint").alias("mu_cents"),
        F.floor(mu + beta * F.lit(rl_factor) + F.lit(0.5))
        .cast("bigint").alias("return_level_12_cents"),
    )


@query("q_odds_ratio", oracle=rf"""
WITH x AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS e,
         CASE WHEN o_totalprice > {_OR_PRICE_T} THEN 1 ELSE 0 END AS y
  FROM orders
),
cells AS (
  SELECT CAST(sum(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS a,
         CAST(sum(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS b,
         CAST(sum(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS c,
         CAST(sum(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS d
  FROM x
)
SELECT a, b, c, d,
       round(a * 1.0 * d / (b * 1.0 * c), 4) AS odds_ratio,
       round((a * 1.0 / (a + b)) / (c * 1.0 / (c + d)), 4)
         AS relative_risk,
       round(exp(ln(a * 1.0 * d / (b * 1.0 * c))
                 - {_WOOLF_Z} * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 4)
         AS or_lo,
       round(exp(ln(a * 1.0 * d / (b * 1.0 * c))
                 + {_WOOLF_Z} * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 4)
         AS or_hi
FROM cells
""")
def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Odds ratio and relative risk of "urgent order" → "high-value
    order" (> ${t:,.0f}) with the Woolf 95% log interval
    exp(ln OR ± z√(1/a+1/b+1/c+1/d)) — the effect-size companion to
    ``q_chisq_independence``'s significance on the same 2×2 table.

    Scale shape: one map-side-combined 4-counter pass; all statistics
    are closed-form doubles over exact BIGINT cells."""
    x = load(spark, sf_dir, "orders").select(
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("e"),
        (F.col("o_totalprice") > _OR_PRICE_T).cast("int").alias("y"),
    )
    cells = x.agg(
        F.sum(((F.col("e") == 1) & (F.col("y") == 1)).cast("bigint"))
        .cast("bigint").alias("a"),
        F.sum(((F.col("e") == 1) & (F.col("y") == 0)).cast("bigint"))
        .cast("bigint").alias("b"),
        F.sum(((F.col("e") == 0) & (F.col("y") == 1)).cast("bigint"))
        .cast("bigint").alias("c"),
        F.sum(((F.col("e") == 0) & (F.col("y") == 0)).cast("bigint"))
        .cast("bigint").alias("d"),
    )
    a, b, c, d = (F.col(x) for x in "abcd")
    orr = a * F.lit(1.0) * d / (b * F.lit(1.0) * c)
    se = F.sqrt(
        F.lit(1.0) / a + F.lit(1.0) / b + F.lit(1.0) / c + F.lit(1.0) / d
    )
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        F.round(orr, 4).alias("odds_ratio"),
        F.round(
            (a * F.lit(1.0) / (a + b)) / (c * F.lit(1.0) / (c + d)), 4
        ).alias("relative_risk"),
        F.round(F.exp(F.log(orr) - F.lit(_WOOLF_Z) * se), 4).alias("or_lo"),
        F.round(F.exp(F.log(orr) + F.lit(_WOOLF_Z) * se), 4).alias("or_hi"),
    )


q_odds_ratio.__doc__ = q_odds_ratio.__doc__.format(t=_OR_PRICE_T)
