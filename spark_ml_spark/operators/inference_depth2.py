"""Round-5 wave-74: distribution-free intervals, calibration summary,
and aggregation-reversal auditing — exact median CI, expected
calibration error, and a Simpson's-paradox check.

``q_median_ci`` — the exact distribution-free 95% confidence interval
for the median of order value via binomial order statistics: the CI
endpoints are the values at ranks n/2 ∓ z√n/2 — no resampling, no
normality, just two extra rows of the same two-phase global rank the
percentile operators already run.

``q_ece`` — expected calibration error: the single-number summary of
``q_calibration_bins``'s reliability table, ECE = Σ (n_b/n)·|acc_b −
conf_b| over 10 equi-width score bins with min-max-normalized
confidence — the calibration metric model cards actually quote.

``q_simpson_check`` — Simpson's-paradox audit on the
``q_stratified_ate`` design: the aggregate treated-vs-control gap
versus the stratum-weighted gap, with the per-stratum sign census —
flags when ignoring the confounder would reverse the conclusion, the
single most famous aggregation trap in analytics.

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_percentiles``, ``q_calibration_bins``,
``q_stratified_ate``, ``q_poisson_bootstrap``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: median CI z (95%)
_MCI_Z = 1.96

#: Simpson audit reuses the stratified-ATE design constants
_SIM_URGENT_T = 3


@query("q_median_ci", oracle=rf"""
WITH o AS (
  SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS pc,
         o_orderkey
  FROM orders
),
rk AS (
  SELECT pc,
         CAST(row_number() OVER (ORDER BY pc, o_orderkey) AS BIGINT) AS r,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM o
),
marks AS (
  SELECT n,
         CAST(floor((n - {_MCI_Z} * sqrt(CAST(n AS DOUBLE))) / 2.0)
              AS BIGINT) AS r_lo,
         CAST(ceil(1.0 + (n + {_MCI_Z} * sqrt(CAST(n AS DOUBLE))) / 2.0)
              AS BIGINT) AS r_hi,
         CAST((n + 1) // 2 AS BIGINT) AS r_m1,
         CAST(n // 2 + 1 AS BIGINT) AS r_m2
  FROM (SELECT max(n) AS n FROM rk)
)
SELECT m.n,
       CAST((max(CASE WHEN rk.r = m.r_m1 THEN rk.pc END)
             + max(CASE WHEN rk.r = m.r_m2 THEN rk.pc END)) // 2
            AS BIGINT) AS median_cents,
       CAST(max(CASE WHEN rk.r = m.r_lo THEN rk.pc END) AS BIGINT)
         AS ci_lo_cents,
       CAST(max(CASE WHEN rk.r = m.r_hi THEN rk.pc END) AS BIGINT)
         AS ci_hi_cents
FROM rk JOIN marks m
  ON rk.r IN (m.r_lo, m.r_hi, m.r_m1, m.r_m2)
GROUP BY m.n
""")
def q_median_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distribution-free 95% CI for the median order value: the
    interval endpoints are the order statistics at ranks
    (n ∓ z√n)/2 (binomial argument — P(X_(l) ≤ m ≤ X_(u)) ≥ 95%
    without any distributional assumption); the median itself is the
    mean of the two middle order statistics.

    Scale shape: ONE two-phase global rank (``api.global_rank`` —
    range partition + local sort, no single-partition window), then a
    four-rank filter and a 1-row fold. The CI costs exactly two more
    looked-up ranks than the median alone."""
    o = load(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
        .cast("bigint").alias("pc"),
        "o_orderkey",
    )
    rk = api.global_rank(
        o, ["pc", "o_orderkey"], rank_col="r", total_col="n"
    )
    n = F.col("n")
    r_lo = F.floor(
        (n - F.lit(_MCI_Z) * F.sqrt(n.cast("double"))) / F.lit(2.0)
    ).cast("bigint")
    r_hi = F.ceil(
        F.lit(1.0) + (n + F.lit(_MCI_Z) * F.sqrt(n.cast("double")))
        / F.lit(2.0)
    ).cast("bigint")
    r_m1 = ((n + 1) / 2).cast("bigint")
    r_m2 = (n / 2 + 1).cast("bigint")
    hits = rk.where(
        (F.col("r") == r_lo)
        | (F.col("r") == r_hi)
        | (F.col("r") == r_m1)
        | (F.col("r") == r_m2)
    ).select(
        "pc", "r", "n",
        r_lo.alias("r_lo"), r_hi.alias("r_hi"),
        r_m1.alias("r_m1"), r_m2.alias("r_m2"),
    )
    return hits.groupBy("n").agg(
        F.expr(
            "CAST((max(CASE WHEN r = r_m1 THEN pc END)"
            " + max(CASE WHEN r = r_m2 THEN pc END)) DIV 2 AS BIGINT)"
        ).alias("median_cents"),
        F.max(F.when(F.col("r") == F.col("r_lo"), F.col("pc")))
        .cast("bigint").alias("ci_lo_cents"),
        F.max(F.when(F.col("r") == F.col("r_hi"), F.col("pc")))
        .cast("bigint").alias("ci_hi_cents"),
    )


@query("q_ece", oracle=r"""
WITH scored AS (
  SELECT n_chars AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
rng AS (
  SELECT CAST(min(s) AS BIGINT) AS mn, CAST(max(s) AS BIGINT) AS mx
  FROM scored
),
bins AS (
  SELECT CAST((s - mn) * 10 // (mx - mn + 1) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(y) AS BIGINT) AS pos_b,
         avg((s - mn) * 1.0 / (mx - mn)) AS conf_b
  FROM scored CROSS JOIN rng
  GROUP BY 1
)
SELECT CAST(sum(n_b) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(floor(sum(n_b * abs(pos_b * 1.0 / n_b - conf_b))
                  / sum(n_b) * 1000000.0 + 0.5) AS BIGINT) AS ece_micro,
       CAST(floor(max(abs(pos_b * 1.0 / n_b - conf_b)) * 1000000.0 + 0.5)
            AS BIGINT) AS mce_micro
FROM bins
""")
def q_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected (and maximum) calibration error over the same 10
    equi-width bins as ``q_calibration_bins``: confidence = the
    min-max-normalized score, accuracy = the bin's positive rate,
    ECE = Σ(n_b/n)·|acc−conf|, MCE = max |acc−conf| — the one-number
    calibration summary beside the full reliability table.

    Scale shape: one 1-row min/max broadcast, one 10-group hash
    aggregate, one 10-row fold — identical passes to the bins query,
    plus nothing."""
    scored = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("s"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    rng = scored.agg(
        F.min("s").cast("long").alias("mn"),
        F.max("s").cast("long").alias("mx"),
    )
    bins = (
        scored.crossJoin(F.broadcast(rng))
        .groupBy(
            F.expr("CAST((s - mn) * 10 DIV (mx - mn + 1) AS BIGINT)")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_b"),
            F.sum("y").cast("bigint").alias("pos_b"),
            F.avg(
                (F.col("s") - F.col("mn"))
                * F.lit(1.0)
                / (F.col("mx") - F.col("mn"))
            ).alias("conf_b"),
        )
    )
    gap = F.abs(
        F.col("pos_b") * F.lit(1.0) / F.col("n_b") - F.col("conf_b")
    )
    return bins.agg(
        F.sum("n_b").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.floor(
            F.sum(F.col("n_b") * gap) / F.sum("n_b") * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("bigint").alias("ece_micro"),
        F.floor(F.max(gap) * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("mce_micro"),
    )


@query("q_simpson_check", oracle=rf"""
WITH per_cust AS (
  SELECT c.c_custkey,
         CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal,
         CASE WHEN sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                            THEN 1 ELSE 0 END) >= {_SIM_URGENT_T}
              THEN 1 ELSE 0 END AS t,
         CAST(floor(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5)
                             AS BIGINT)) * 1.0 / count(*) + 0.5)
              AS BIGINT) AS y
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal
),
strat AS (
  SELECT *, CAST(ntile(5) OVER (ORDER BY bal, c_custkey) AS BIGINT)
              AS stratum
  FROM per_cust
),
agg AS (
  SELECT CAST(sum(t * y) AS DOUBLE) / sum(t)
         - CAST(sum((1 - t) * y) AS DOUBLE) / sum(1 - t) AS agg_diff
  FROM strat
),
cell AS (
  SELECT stratum,
         CAST(sum(t) AS BIGINT) AS nt, CAST(sum(1 - t) AS BIGINT) AS nc,
         CAST(sum(t * y) AS BIGINT) AS st,
         CAST(sum((1 - t) * y) AS BIGINT) AS sc
  FROM strat GROUP BY stratum
),
within AS (
  SELECT sum((nt + nc) * (CAST(st AS DOUBLE) / nullif(nt, 0)
                          - CAST(sc AS DOUBLE) / nullif(nc, 0)))
           / sum(CASE WHEN nt > 0 AND nc > 0 THEN nt + nc END) AS w_diff,
         CAST(sum(CASE WHEN nt > 0 AND nc > 0
                       AND (CAST(st AS DOUBLE) / nt
                            - CAST(sc AS DOUBLE) / nc) > 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_strata,
         CAST(count(*) AS BIGINT) AS n_strata
  FROM cell
)
SELECT round(agg.agg_diff / 100.0, 4) AS agg_diff_dollars,
       round(within.w_diff / 100.0, 4) AS within_diff_dollars,
       within.n_strata, within.n_pos_strata,
       CAST(CASE WHEN (agg.agg_diff > 0) <> (within.w_diff > 0)
                 THEN 1 ELSE 0 END AS BIGINT) AS simpson_flag
FROM agg, within
""")
def q_simpson_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit on the stratified-ATE design: the
    AGGREGATE treated-vs-control gap in mean order value versus the
    balance-stratum-weighted WITHIN gap, plus the per-stratum sign
    census — simpson_flag = 1 when the two disagree in sign, i.e.
    when ignoring the confounder would reverse the conclusion.

    Scale shape: identical passes to ``q_stratified_ate`` (one orders
    pass to the customer grain, a bounded ntile, 5-row cells) plus one
    unstratified 1-row aggregate; the audit is free once the ATE is
    computed."""
    per_cust = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            (
                F.sum(
                    (F.col("o_orderpriority") == "1-URGENT").cast("bigint")
                )
                >= _SIM_URGENT_T
            ).cast("bigint").alias("t"),
            F.floor(
                F.sum(
                    F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
                    .cast("bigint")
                )
                * F.lit(1.0)
                / F.count(F.lit(1))
                + F.lit(0.5)
            ).cast("bigint").alias("y"),
        )
        .select(
            F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5))
            .cast("bigint").alias("bal"),
            "c_custkey",
            "t",
            "y",
        )
    )
    w_nt = Window.partitionBy(api.one_partition("bal")).orderBy(
        "bal", "c_custkey"
    )
    strat = per_cust.select(
        "t", "y", F.ntile(5).over(w_nt).cast("bigint").alias("stratum")
    )
    agg = strat.agg(
        (
            F.sum(F.col("t") * F.col("y")).cast("double") / F.sum("t")
            - F.sum((F.lit(1) - F.col("t")) * F.col("y")).cast("double")
            / F.sum(F.lit(1) - F.col("t"))
        ).alias("agg_diff")
    )
    cell = strat.groupBy("stratum").agg(
        F.sum("t").cast("bigint").alias("nt"),
        F.sum(F.lit(1) - F.col("t")).cast("bigint").alias("nc"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("st"),
        F.sum((F.lit(1) - F.col("t")) * F.col("y"))
        .cast("bigint").alias("sc"),
    )
    d = F.col("st").cast("double") / F.nullif(
        F.col("nt"), F.lit(0)
    ) - F.col("sc").cast("double") / F.nullif(F.col("nc"), F.lit(0))
    within = cell.agg(
        (
            F.sum((F.col("nt") + F.col("nc")) * d)
            / F.sum(
                F.when(
                    (F.col("nt") > 0) & (F.col("nc") > 0),
                    F.col("nt") + F.col("nc"),
                )
            )
        ).alias("w_diff"),
        F.sum(
            (
                (F.col("nt") > 0)
                & (F.col("nc") > 0)
                & (
                    F.col("st").cast("double") / F.col("nt")
                    - F.col("sc").cast("double") / F.col("nc")
                    > 0
                )
            ).cast("bigint")
        ).cast("bigint").alias("n_pos_strata"),
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
    )
    return agg.crossJoin(F.broadcast(within)).select(
        F.round(F.col("agg_diff") / F.lit(100.0), 4)
        .alias("agg_diff_dollars"),
        F.round(F.col("w_diff") / F.lit(100.0), 4)
        .alias("within_diff_dollars"),
        "n_strata",
        "n_pos_strata",
        ((F.col("agg_diff") > 0) != (F.col("w_diff") > 0))
        .cast("bigint").alias("simpson_flag"),
    )
