"""Round-4 wave-38: Pareto frontier + experiment-health operators.

``q_skyline`` — the 2-D skyline (Pareto frontier) of lineitem on
(maximize quantity, maximize extended price): the classic "not
dominated in any dimension" query (Börzsönyi et al. 2001). With one
dimension DISCRETE (quantity levels), the scale-correct shape is
level-reduce-then-frontier: a corpus-sized group-by collapses each
quantity level to its max price (the only candidate that level can
contribute), and the dominance filter runs as a suffix-max over the
≤50-row level table — never a pairwise dominance join.

``q_srm_check`` — sample-ratio-mismatch guard for the md5 A/B
assignment used by ``q_ab_test``/``q_diff_in_diff``: the 1-dof
chi-square of observed variant counts against the designed 50/50,
χ² = (n_a − n_b)²/n. SRM is the first thing a trustworthy experiment
readout checks — a biased assignment invalidates every downstream
test. Exact BIGINT counts; one float statistic.

The reference has neither surface (``Data_transform.py`` passim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query


@query("q_skyline", oracle=r"""
WITH lvl AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         max(l_extendedprice) AS best_price
  FROM lineitem GROUP BY 1
),
suf AS (
  SELECT qty, best_price,
         max(best_price) OVER (ORDER BY qty DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS best_above
  FROM lvl
)
SELECT qty, round(best_price, 4) AS best_price
FROM suf
WHERE best_above IS NULL OR best_price > best_above
ORDER BY qty
""")
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline on (maximize quantity, maximize price): a
    line item is dominated if another has both ≥ quantity and ≥ price
    (strictly greater somewhere); survivors are the frontier. Because
    quantity is a ≤50-level discrete axis, each level's sole candidate
    is its max price (corpus group-by, map-side combined), and
    dominance reduces to "price must exceed the best price at any
    HIGHER quantity" — a suffix-max over the bounded level table
    (pinned to one partition via ``api.one_partition``), not the naive
    O(n²) dominance self-join.

    Scale shape: one corpus aggregate → ≤50-row frontier filter. The
    general continuous-axis skyline would grid-partition then merge
    local frontiers — same reduce-then-frontier discipline."""
    lvl = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_quantity").cast("bigint").alias("qty"))
        .agg(F.max("l_extendedprice").alias("best_price"))
    )
    w = (
        Window.partitionBy(api.one_partition("qty"))
        .orderBy(F.col("qty").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    suf = lvl.withColumn("best_above", F.max("best_price").over(w))
    return (
        suf.where(
            F.col("best_above").isNull()
            | (F.col("best_price") > F.col("best_above"))
        )
        .select("qty", F.round("best_price", 4).alias("best_price"))
        .orderBy("qty")
    )


@query("q_srm_check", oracle=r"""
WITH u AS (
  SELECT DISTINCT user_id,
         CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS variant
  FROM events
),
c AS (
  SELECT CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM u
)
SELECT n_a, n_b,
       round(CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b) / (n_a + n_b), 4)
         AS chi2,
       CASE WHEN CAST((n_a - n_b) AS DOUBLE) * (n_a - n_b) / (n_a + n_b)
                 > 3.841459 THEN 1 ELSE 0 END AS srm_flag
FROM c
""")
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guard: 1-dof chi-square of the md5 A/B
    variant counts against the designed 50/50 — for a two-cell design
    χ² reduces to (n_a − n_b)²/n. A flag above the 95% critical value
    (3.841) means the assignment itself is biased and every downstream
    readout (``q_ab_test``, ``q_diff_in_diff``) is suspect — the
    experiment-health pre-check.

    Scale shape: one distinct-user pass (map-side combined), a 2-cell
    conditional aggregate, one float statistic from exact BIGINTs."""
    variant = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
    ).otherwise("B")
    u = (
        load(spark, sf_dir, "events")
        .select("user_id", variant.alias("variant"))
        .distinct()
    )
    c = u.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("bigint").alias("n_b"),
    )
    chi2 = (
        (F.col("n_a") - F.col("n_b")).cast("double")
        * (F.col("n_a") - F.col("n_b"))
        / (F.col("n_a") + F.col("n_b"))
    )
    return c.select(
        "n_a", "n_b",
        F.round(chi2, 4).alias("chi2"),
        F.when(chi2 > 3.841459, 1).otherwise(0).alias("srm_flag"),
    )
