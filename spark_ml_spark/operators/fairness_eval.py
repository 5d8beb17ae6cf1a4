"""Round-4 wave-42: sliced evaluation + fairness + experiment sizing.

``q_auc_by_slice`` — AUC computed PER SLICE (language) via the exact
midrank rank-sum over the per-slice score histogram: the
slice-evaluation discipline (a global AUC can hide a slice where the
model is anti-predictive). Doubled ranks keep every intermediate an
integer (the ``q_spearman`` discipline); the single float is the final
ratio per slice.

``q_disparate_impact`` — the four-fifths (80%) rule audit: positive-
outcome rate per group vs the best-rated group; ratios in ppm with a
flag under 0.8 — the standard adverse-impact screen, computed from
exact counts.

``q_power_analysis`` — two-proportion sample-size calculation from the
OBSERVED baseline: n per arm = (z_α/2 + z_β)²·(p₁q₁ + p₂q₂)/δ² at
α=.05, power=.80, absolute MDE δ=5pp — the "how long must this test
run" readout that belongs next to ``q_ab_test``/``q_srm_check``.

The reference has none of these surfaces (``Data_transform.py``
passim); siblings: ``q_auc`` (global), ``q_k_anonymity``/
``q_l_diversity`` (privacy side of governance), ``q_ab_test``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query


@query("q_auc_by_slice", oracle=r"""
WITH scored AS (
  SELECT lang, n_chars AS s,
         CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
              THEN 1 ELSE 0 END AS y
  FROM documents
),
hist AS (
  SELECT lang, s, CAST(count(*) AS BIGINT) AS n_s,
         CAST(sum(y) AS BIGINT) AS pos_s
  FROM scored GROUP BY 1, 2
),
cum AS (
  SELECT lang, s, n_s, pos_s,
         CAST(coalesce(sum(n_s) OVER (PARTITION BY lang ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS below
  FROM hist
),
agg AS (
  SELECT lang,
         CAST(sum(pos_s) AS BIGINT) AS n_pos,
         CAST(sum(n_s) - sum(pos_s) AS BIGINT) AS n_neg,
         CAST(sum(pos_s * (2 * below + n_s + 1)) AS BIGINT) AS r2_pos
  FROM cum GROUP BY lang
)
SELECT lang, n_pos, n_neg,
       round((CAST(r2_pos AS DOUBLE) - CAST(n_pos AS DOUBLE) * (n_pos + 1))
             / (2.0 * n_pos * n_neg), 4) AS auc
FROM agg ORDER BY lang
""")
def q_auc_by_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language AUC of the length score predicting the even-source
    label, by exact midrank rank-sum: doubled midrank of a tied score
    block is 2·below + n_s + 1 (an integer), so
    AUC = (Σ2R⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻) has integer numerator and the
    one float division happens per slice row. Slice evaluation is the
    governance twin of the global ``q_auc``.

    Scale shape: one corpus histogram (map-side combined) keyed
    (slice, score); the cumulative window partitions BY SLICE over the
    bounded per-slice score histogram; the output is |slices| rows."""
    scored = load(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").alias("s"),
        (F.substring("source", 4, 10).cast("int") % 2 == 0)
        .cast("int").alias("y"),
    )
    hist = scored.groupBy("lang", "s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s"),
        F.sum("y").cast("bigint").alias("pos_s"),
    )
    w = (
        Window.partitionBy("lang").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        "lang", "n_s", "pos_s",
        F.coalesce(F.sum("n_s").over(w), F.lit(0))
        .cast("bigint").alias("below"),
    )
    agg = cum.groupBy("lang").agg(
        F.sum("pos_s").cast("bigint").alias("n_pos"),
        (F.sum("n_s") - F.sum("pos_s")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("pos_s") * (2 * F.col("below") + F.col("n_s") + 1)
        ).cast("bigint").alias("r2_pos"),
    )
    return agg.select(
        "lang", "n_pos", "n_neg",
        F.round(
            (F.col("r2_pos").cast("double")
             - F.col("n_pos").cast("double") * (F.col("n_pos") + 1))
            / (2.0 * F.col("n_pos") * F.col("n_neg")),
            4,
        ).alias("auc"),
    ).orderBy("lang")


@query("q_disparate_impact", oracle=r"""
WITH g AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos
  FROM documents GROUP BY lang
),
best AS (
  SELECT max(CAST(n_pos AS DOUBLE) / n) AS best_rate FROM g
)
SELECT lang, n, n_pos,
       CAST(floor(n_pos * 1000000.0 / n + 0.5) AS BIGINT) AS rate_ppm,
       CAST(floor((CAST(n_pos AS DOUBLE) / n) / best_rate * 1000000.0
                  + 0.5) AS BIGINT) AS di_ratio_ppm,
       CASE WHEN (CAST(n_pos AS DOUBLE) / n) / best_rate < 0.8
            THEN 1 ELSE 0 END AS four_fifths_flag
FROM g, best ORDER BY lang
""")
def q_disparate_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-fifths-rule adverse-impact screen: the positive-outcome
    rate (documents passing the length gate) per language, each group's
    ratio to the BEST group's rate in ppm, and a flag where the ratio
    falls under 0.8 — the standard disparate-impact threshold. For a
    training-data pipeline this is the "does the quality gate
    systematically exclude a language" audit.

    Scale shape: one map-side-combined group aggregate; the best rate
    is a 1-row broadcast over the |groups|-row table. Exact counts;
    two quantized ratios per row."""
    g = load(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("n_chars") >= 500).cast("int"))
        .cast("bigint").alias("n_pos"),
    )
    best = g.agg(
        F.max(F.col("n_pos").cast("double") / F.col("n")).alias("best_rate")
    )
    rate = F.col("n_pos").cast("double") / F.col("n")
    return (
        g.crossJoin(F.broadcast(best))
        .select(
            "lang", "n", "n_pos",
            F.floor(F.col("n_pos") * 1000000.0 / F.col("n") + F.lit(0.5))
            .cast("bigint").alias("rate_ppm"),
            F.floor(rate / F.col("best_rate") * 1000000.0 + F.lit(0.5))
            .cast("bigint").alias("di_ratio_ppm"),
            F.when(rate / F.col("best_rate") < 0.8, 1).otherwise(0)
            .alias("four_fifths_flag"),
        )
        .orderBy("lang")
    )


@query("q_power_analysis", oracle=r"""
WITH u AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' AND value > 150.0
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(conv) AS BIGINT) AS n_conv
  FROM u
),
p AS (
  SELECT n_users, n_conv,
         CAST(n_conv AS DOUBLE) / n_users AS p1,
         CAST(n_conv AS DOUBLE) / n_users + 0.05 AS p2
  FROM m
)
SELECT n_users,
       CAST(floor(p1 * 1000000.0 + 0.5) AS BIGINT) AS base_rate_ppm,
       CAST(50000 AS BIGINT) AS mde_ppm,
       CAST(ceil((1.959964 + 0.841621) * (1.959964 + 0.841621)
                 * (p1 * (1 - p1) + p2 * (1 - p2)) / (0.05 * 0.05))
            AS BIGINT) AS n_per_arm,
       CASE WHEN n_users / 2
                 >= ceil((1.959964 + 0.841621) * (1.959964 + 0.841621)
                         * (p1 * (1 - p1) + p2 * (1 - p2)) / (0.05 * 0.05))
            THEN 1 ELSE 0 END AS powered
FROM p
""")
def q_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion sample-size requirement from the OBSERVED
    baseline conversion: n per arm = (z_{α/2}+z_β)²(p₁q₁+p₂q₂)/δ² at
    α=.05, 80% power, absolute MDE δ = 5 pp — plus whether the current
    user pool could even power such a test. The sizing readout that
    should gate every ``q_ab_test`` launch.

    Scale shape: one per-user conversion group-by (the ``q_ab_test``
    scan), a single-row aggregate, closed-form arithmetic from exact
    counts; z constants are literals in BOTH engines."""
    u = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            ((F.col("event_type") == "purchase") & (F.col("value") > 150.0))
            .cast("int").alias("p"),
        )
        .groupBy("user_id")
        .agg(F.max("p").alias("conv"))
    )
    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("conv").cast("bigint").alias("n_conv"),
    )
    p1 = F.col("n_conv").cast("double") / F.col("n_users")
    p2 = p1 + 0.05
    z2 = (1.959964 + 0.841621) ** 2
    n_req = F.ceil(
        F.lit(z2) * (p1 * (1 - p1) + p2 * (1 - p2)) / (0.05 * 0.05)
    ).cast("bigint")
    return m.select(
        "n_users",
        F.floor(p1 * 1000000.0 + F.lit(0.5)).cast("bigint")
        .alias("base_rate_ppm"),
        F.lit(50000).cast("bigint").alias("mde_ppm"),
        n_req.alias("n_per_arm"),
        F.when((F.col("n_users") / 2) >= n_req, 1).otherwise(0)
        .alias("powered"),
    )
