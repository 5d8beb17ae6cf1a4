"""Round-5 wave-65: experimentation & causal depth — CUPED variance
reduction, covariate-stratified ATE, and Cochran's Q.

``q_cuped_adjust`` — CUPED (Controlled-experiment Using Pre-Experiment
Data, Deng et al. 2013): per-user pre-period spend is the covariate,
post-period spend the metric, treatment an md5 coin; the adjusted
metric Y − θ(X − X̄) removes the predictable between-user variance,
shrinking the arm-difference CI by 1 − ρ² — the single highest-ROI
trick in online experimentation, here from one pass of exact integer
moments.

``q_stratified_ate`` — stratified average treatment effect: customers
are stratified into balance quintiles (the confounder), the
treated-vs-control outcome gap is taken WITHIN each stratum, and the
ATE is the stratum-size-weighted mean of the gaps — the
post-stratification estimator that removes confounding a raw
difference of means would absorb (``q_diff_in_diff`` removes the time
confounder; this removes a covariate one).

``q_cochran_q`` — Cochran's Q for k=3 matched binary raters on every
document (char-length, token-count, contains-digit): the binary
Friedman — do the three rules flag at systematically different rates
once per-document difficulty is blocked out? Q from four exact integer
aggregates in one corpus pass.

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_ab_test``, ``q_diff_in_diff``, ``q_permutation_test``,
``q_friedman_test``, ``q_mcnemar``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.operators.selection import _HEX8
from spark_ml_spark.registry import query

#: CUPED pre/post split day (events span 2024-01-01 .. 2024-01-30)
_CUPED_SPLIT = "2024-01-16"

#: stratified-ATE treatment: ≥ this many 1-URGENT orders
_ATE_URGENT_T = 3

#: Cochran raters
_CQ_CHARS_T = 300
_CQ_TOKENS_T = 45


@query("q_cuped_adjust", oracle=rf"""
WITH per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN ts < TIMESTAMP '{_CUPED_SPLIT}'
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN ts >= TIMESTAMP '{_CUPED_SPLIT}'
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y,
         CASE WHEN ({_HEX8.format(g="CAST(user_id AS VARCHAR) || '#cuped'")}
                    + 0.5) / 4294967296.0 < 0.5
              THEN 1 ELSE 0 END AS t
  FROM events WHERE value IS NOT NULL GROUP BY user_id
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS n_t,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         CAST(sum(t * x) AS BIGINT) AS sx_t,
         CAST(sum(t * y) AS BIGINT) AS sy_t
  FROM per_user
),
d AS (
  SELECT n, n_t, n - n_t AS n_c,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
           / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) AS theta,
         (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
           * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
           / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
              * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n))
           AS rho2,
         CAST(sy_t AS DOUBLE) / n_t
           - CAST(sy - sy_t AS DOUBLE) / (n - n_t) AS diff_raw,
         CAST(sx_t AS DOUBLE) / n_t
           - CAST(sx - sx_t AS DOUBLE) / (n - n_t) AS diff_x
  FROM m
)
SELECT n_t, n_c,
       round(theta, 4) AS theta,
       round(diff_raw / 100.0, 4) AS diff_raw,
       round((diff_raw - theta * diff_x) / 100.0, 4) AS diff_adj,
       CAST(floor(rho2 * 1000000.0 + 0.5) AS BIGINT) AS rho2_ppm
FROM d
""")
def q_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED adjustment of an A/B metric: per-user pre-period value X
    (days before {split}) and post-period metric Y, treatment from an
    md5 coin (portable hex→uint32, same bits both engines);
    θ = cov(X,Y)/var(X) pooled, adjusted gap = raw gap − θ·(X̄_t−X̄_c),
    and ρ² — the fraction of metric variance the covariate removes.

    Engine exactness: X and Y quantize to BIGINT cents at the event; all
    five second moments are exact (DECIMAL(38,0)/HUGEINT cross sums); θ,
    the gaps, and ρ² are closed-form doubles from one 9-number row.

    Scale shape: one events pass to the per-user grain (map-side
    combined conditional sums), one single-row aggregate, zero joins —
    CUPED at 100 TB costs exactly one extra pair of conditional sums
    over the assignment pipeline."""
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint")
    coin = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"),
                               F.lit("#cuped"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    per_user = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("ts") < F.lit(_CUPED_SPLIT).cast("timestamp"),
                    cents,
                ).otherwise(F.lit(0))
            ).cast("bigint").alias("x"),
            F.sum(
                F.when(
                    F.col("ts") >= F.lit(_CUPED_SPLIT).cast("timestamp"),
                    cents,
                ).otherwise(F.lit(0))
            ).cast("bigint").alias("y"),
        )
        .select("x", "y", (coin < 0.5).cast("bigint").alias("t"))
    )
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    m = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("n_t"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(xd * F.col("x")).alias("sxx"),
        F.sum(xd * F.col("y")).alias("sxy"),
        F.sum(yd * F.col("y")).alias("syy"),
        F.sum(F.col("t") * F.col("x")).cast("bigint").alias("sx_t"),
        F.sum(F.col("t") * F.col("y")).cast("bigint").alias("sy_t"),
    )
    n, n_t = F.col("n"), F.col("n_t")
    cxy = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ) / n
    vx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ) / n
    vy = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ) / n
    theta = cxy / vx
    diff_raw = F.col("sy_t").cast("double") / n_t - (
        F.col("sy") - F.col("sy_t")
    ).cast("double") / (n - n_t)
    diff_x = F.col("sx_t").cast("double") / n_t - (
        F.col("sx") - F.col("sx_t")
    ).cast("double") / (n - n_t)
    return m.select(
        "n_t",
        (n - n_t).alias("n_c"),
        F.round(theta, 4).alias("theta"),
        F.round(diff_raw / F.lit(100.0), 4).alias("diff_raw"),
        F.round((diff_raw - theta * diff_x) / F.lit(100.0), 4)
        .alias("diff_adj"),
        F.floor(cxy * cxy / (vx * vy) * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("rho2_ppm"),
    )


q_cuped_adjust.__doc__ = q_cuped_adjust.__doc__.format(split=_CUPED_SPLIT)


@query("q_stratified_ate", oracle=rf"""
WITH per_cust AS (
  SELECT c.c_custkey,
         CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal,
         CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
         CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS spend,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_acctbal
),
strat AS (
  SELECT *,
         CAST(ntile(5) OVER (ORDER BY bal, c_custkey) AS BIGINT)
           AS stratum,
         CASE WHEN n_urgent >= {_ATE_URGENT_T} THEN 1 ELSE 0 END AS t,
         CAST(floor(CAST(spend AS DOUBLE) / n_orders + 0.5) AS BIGINT)
           AS avg_order_cents
  FROM per_cust
),
cell AS (
  SELECT stratum,
         CAST(sum(t) AS BIGINT) AS n_treated,
         CAST(sum(1 - t) AS BIGINT) AS n_control,
         CAST(sum(t * avg_order_cents) AS BIGINT) AS s_t,
         CAST(sum((1 - t) * avg_order_cents) AS BIGINT) AS s_c
  FROM strat GROUP BY stratum
),
gap AS (
  SELECT stratum, n_treated, n_control,
         CAST(s_t AS DOUBLE) / nullif(n_treated, 0)
           - CAST(s_c AS DOUBLE) / nullif(n_control, 0) AS diff_cents
  FROM cell
)
SELECT stratum, n_treated, n_control,
       round(coalesce(diff_cents, 0.0) / 100.0, 4) AS diff_dollars,
       round(sum(CASE WHEN diff_cents IS NOT NULL
                      THEN (n_treated + n_control) * diff_cents END)
               OVER ()
             / sum(CASE WHEN diff_cents IS NOT NULL
                        THEN n_treated + n_control END) OVER ()
             / 100.0, 4) AS ate_dollars
FROM gap
ORDER BY stratum
""")
def q_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate-stratified ATE: treatment = placed ≥{t} urgent orders,
    outcome = mean order value, confounder = account balance stratified
    into quintiles (ntile ties pinned by custkey). The ATE is the
    stratum-size-weighted mean of the within-stratum gaps, weights
    renormalized over strata where both arms are populated.

    Engine exactness: per-customer outcome quantizes to BIGINT cents
    (half-up of an exact rational); strata and arms are integer-keyed;
    the gap and weighted fold are closed-form doubles over the 5-row
    stratum grid.

    Scale shape: one orders pass to the customer grain, a bounded
    ntile over customers (the covariate rank — the repo's two-phase
    global_rank shape at 100 TB), then 5-row arithmetic."""
    oc = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
    per_cust = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_custkey", "c_acctbal")
        .agg(
            F.sum(
                (F.col("o_orderpriority") == "1-URGENT").cast("bigint")
            ).cast("bigint").alias("n_urgent"),
            F.sum(oc).cast("bigint").alias("spend"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
        .select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5))
            .cast("bigint")
            .alias("bal"),
            "n_urgent",
            F.floor(
                F.col("spend").cast("double") / F.col("n_orders") + F.lit(0.5)
            ).cast("bigint").alias("avg_order_cents"),
        )
    )
    w_nt = Window.partitionBy(api.one_partition("bal")).orderBy(
        "bal", "c_custkey"
    )
    strat = per_cust.select(
        F.ntile(5).over(w_nt).cast("bigint").alias("stratum"),
        (F.col("n_urgent") >= _ATE_URGENT_T).cast("bigint").alias("t"),
        "avg_order_cents",
    )
    cell = strat.groupBy("stratum").agg(
        F.sum("t").cast("bigint").alias("n_treated"),
        F.sum(F.lit(1) - F.col("t")).cast("bigint").alias("n_control"),
        F.sum(F.col("t") * F.col("avg_order_cents"))
        .cast("bigint").alias("s_t"),
        F.sum((F.lit(1) - F.col("t")) * F.col("avg_order_cents"))
        .cast("bigint").alias("s_c"),
    )
    diff = F.col("s_t").cast("double") / F.nullif(
        F.col("n_treated"), F.lit(0)
    ) - F.col("s_c").cast("double") / F.nullif(F.col("n_control"), F.lit(0))
    gap = cell.select(
        "stratum", "n_treated", "n_control", diff.alias("diff_cents")
    )
    w_all = Window.partitionBy(api.one_partition("stratum"))
    wsum = F.sum(
        F.when(
            F.col("diff_cents").isNotNull(),
            (F.col("n_treated") + F.col("n_control")) * F.col("diff_cents"),
        )
    ).over(w_all)
    wtot = F.sum(
        F.when(
            F.col("diff_cents").isNotNull(),
            F.col("n_treated") + F.col("n_control"),
        )
    ).over(w_all)
    return gap.select(
        "stratum",
        "n_treated",
        "n_control",
        F.round(F.coalesce(F.col("diff_cents"), F.lit(0.0)) / F.lit(100.0), 4)
        .alias("diff_dollars"),
        F.round(wsum / wtot / F.lit(100.0), 4).alias("ate_dollars"),
    ).orderBy("stratum")


q_stratified_ate.__doc__ = q_stratified_ate.__doc__.format(t=_ATE_URGENT_T)


@query("q_cochran_q", oracle=rf"""
WITH r AS (
  SELECT CASE WHEN n_chars >= {_CQ_CHARS_T} THEN 1 ELSE 0 END AS r1,
         CASE WHEN length(trim(text))
                   - length(replace(trim(text), ' ', '')) + 1
                   >= {_CQ_TOKENS_T} THEN 1 ELSE 0 END AS r2,
         CASE WHEN regexp_matches(text, '[0-9]') THEN 1 ELSE 0 END AS r3
  FROM documents
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(r1) AS BIGINT) AS c1,
         CAST(sum(r2) AS BIGINT) AS c2,
         CAST(sum(r3) AS BIGINT) AS c3,
         CAST(sum(r1 + r2 + r3) AS BIGINT) AS tt,
         CAST(sum((r1 + r2 + r3) * (r1 + r2 + r3)) AS BIGINT) AS t2
  FROM r
)
SELECT n_docs, c1, c2, c3,
       round(3.0 * 2.0
             * (CAST(c1 AS DOUBLE) * c1 + CAST(c2 AS DOUBLE) * c2
                + CAST(c3 AS DOUBLE) * c3
                - CAST(tt AS DOUBLE) * tt / 3.0)
             / (3.0 * tt - t2), 4) AS q_stat,
       CAST(2 AS BIGINT) AS df
FROM m
""")
def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q over three matched binary raters per document
    (chars ≥ {c}, tokens ≥ {t}, contains a digit):
    Q = k(k−1)·(ΣC_j² − T²/k) / (kT − ΣR_i²) with k = 3 — the binary
    Friedman, detecting systematically different flag rates once
    per-document difficulty is blocked out.

    Scale shape: ONE corpus pass computes all five integer aggregates
    (column totals, T, ΣR²) map-side-combined to a single row; Q is
    one closed-form double. No shuffle of document rows at all."""
    txt = F.trim(F.col("text"))
    toks = (
        F.length(txt) - F.length(F.regexp_replace(txt, " ", "")) + F.lit(1)
    )
    r = load(spark, sf_dir, "documents").select(
        (F.col("n_chars") >= _CQ_CHARS_T).cast("bigint").alias("r1"),
        (toks >= _CQ_TOKENS_T).cast("bigint").alias("r2"),
        F.col("text").rlike("[0-9]").cast("bigint").alias("r3"),
    )
    rowsum = F.col("r1") + F.col("r2") + F.col("r3")
    m = r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("r1").cast("bigint").alias("c1"),
        F.sum("r2").cast("bigint").alias("c2"),
        F.sum("r3").cast("bigint").alias("c3"),
        F.sum(rowsum).cast("bigint").alias("tt"),
        F.sum(rowsum * rowsum).cast("bigint").alias("t2"),
    )
    num = (
        F.col("c1").cast("double") * F.col("c1")
        + F.col("c2").cast("double") * F.col("c2")
        + F.col("c3").cast("double") * F.col("c3")
        - F.col("tt").cast("double") * F.col("tt") / F.lit(3.0)
    )
    return m.select(
        "n_docs",
        "c1",
        "c2",
        "c3",
        F.round(
            F.lit(3.0) * F.lit(2.0) * num
            / (F.lit(3.0) * F.col("tt") - F.col("t2")),
            4,
        ).alias("q_stat"),
        F.lit(2).cast("bigint").alias("df"),
    )


q_cochran_q.__doc__ = q_cochran_q.__doc__.format(
    c=_CQ_CHARS_T, t=_CQ_TOKENS_T
)
