"""Round-4 wave-29: statistical-inference operators — the experiment-
analysis layer every production analytics engine grows (A/B readouts,
group-mean comparisons, categorical independence).

``q_ab_test`` — two-proportion z-test: users are hash-assigned to
variant A/B (md5 split, the ``q_hash_split`` discipline — stable under
retries and appends, unlike the reference's unseeded ``randomSplit``,
``Data_transform.py:155``), conversion = user emitted a ``purchase``
event above a value threshold (so the pooled rate is interior — a
degenerate 0/1 pooled rate has no defined z); pooled z-statistic from
exact BIGINT counts.

``q_welch_ttest`` — Welch's unequal-variance t-test of mean order value
between 1-URGENT and 5-LOW priority orders, with the Welch–Satterthwaite
degrees of freedom. Moments are accumulated EXACTLY (BIGINT micro-unit
sums; DECIMAL(38,0) sums of squares) so the only floats are the final
closed-form statistics — the engine's sum-order-independence discipline.

``q_chisq_independence`` — Pearson chi-square + Cramér's V for
independence of customer market segment × order priority over the
orders⋈customer star join.

The reference has no inference surface (``Data_transform.py`` passim);
these extend the evaluation family (``q_auc``, ``q_spearman``,
``q_ks_drift``) with the classical frequentist tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query


@query("q_ab_test", oracle=r"""
WITH u AS (
  SELECT user_id,
         CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS variant,
         max(CASE WHEN event_type = 'purchase' AND value > 150.0
                  THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
m AS (
  SELECT
    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN variant = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
    CAST(sum(CASE WHEN variant = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
  FROM u
)
SELECT n_a, n_b, conv_a, conv_b,
       CAST(floor(conv_a * 1000000.0 / n_a + 0.5) AS BIGINT) AS rate_a_ppm,
       CAST(floor(conv_b * 1000000.0 / n_b + 0.5) AS BIGINT) AS rate_b_ppm,
       round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)), 4) AS z_score,
       CASE WHEN abs((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b))) > 1.959964
            THEN 1 ELSE 0 END AS significant_95
FROM m
""")
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test A/B readout: md5-hash variant assignment
    (pure row-key function — stable under retries / appends / shards),
    per-user conversion flag, pooled-variance z from exact counts.

    Scale shape: ONE shuffle (the per-user conversion group-by, map-side
    combined); the test itself is a single-row conditional aggregate —
    four BIGINTs — so the closed-form z is computed once from exact
    integers. Rates are ppm-quantized; z rounds to 4 dp inside the
    driver's 6-significant-digit float window."""
    variant = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
    ).otherwise("B")
    u = (
        load(spark, sf_dir, "events")
        .select(F.col("user_id"), variant.alias("variant"),
                ((F.col("event_type") == "purchase")
                 & (F.col("value") > 150.0)).cast("int").alias("p"))
        .groupBy("user_id", "variant")
        .agg(F.max("p").alias("conv"))
    )
    m = u.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("variant") == "A", F.col("conv")).otherwise(0))
        .cast("bigint").alias("conv_a"),
        F.sum(F.when(F.col("variant") == "B", F.col("conv")).otherwise(0))
        .cast("bigint").alias("conv_b"),
    )
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (p_a - p_b) / F.sqrt(
        pool * (F.lit(1.0) - pool)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return m.select(
        "n_a", "n_b", "conv_a", "conv_b",
        F.floor(F.col("conv_a") * 1000000.0 / F.col("n_a") + F.lit(0.5))
        .cast("bigint").alias("rate_a_ppm"),
        F.floor(F.col("conv_b") * 1000000.0 / F.col("n_b") + F.lit(0.5))
        .cast("bigint").alias("rate_b_ppm"),
        F.round(z, 4).alias("z_score"),
        F.when(F.abs(z) > 1.959964, 1).otherwise(0).alias("significant_95"),
    )


@query("q_welch_ttest", oracle=r"""
WITH x AS (
  SELECT o_orderpriority AS pri,
         CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT) AS m
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
g AS (
  SELECT
    CAST(sum(CASE WHEN pri = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN pri = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
    CAST(sum(CASE WHEN pri = '1-URGENT' THEN m ELSE 0 END) AS BIGINT) AS s1,
    CAST(sum(CASE WHEN pri = '5-LOW' THEN m ELSE 0 END) AS BIGINT) AS s2,
    sum(CASE WHEN pri = '1-URGENT' THEN CAST(m AS HUGEINT) * m END) AS q1,
    sum(CASE WHEN pri = '5-LOW' THEN CAST(m AS HUGEINT) * m END) AS q2
  FROM x
),
v AS (
  SELECT n1, n2, s1, s2,
         (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) AS v1,
         (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) AS v2
  FROM g
)
SELECT n1, n2,
       round(CAST(s1 AS DOUBLE) / n1 / 1000000.0, 4) AS mean_1,
       round(CAST(s2 AS DOUBLE) / n2 / 1000000.0, 4) AS mean_2,
       round((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / sqrt(v1 / n1 + v2 / n2) , 4) AS t_stat,
       round((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
             / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                + (v2 / n2) * (v2 / n2) / (n2 - 1)), 4) AS df_welch
FROM v
""")
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of mean order value, 1-URGENT vs
    5-LOW priority, with Welch–Satterthwaite degrees of freedom.

    Engine exactness: each price is quantized ONCE to BIGINT micro-units
    (the repo's ppm discipline); sums are BIGINT and sums of squares
    DECIMAL(38,0) — both EXACT and therefore independent of partial-
    aggregation order, which a naive double sum is not. The closed-form
    t and df are the only float math, computed once from a single-row
    aggregate. Scale shape: one filtered scan, one map-side-combined
    single-row conditional aggregate — no shuffle of data rows at all."""
    m = F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5)).cast("bigint")
    x = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select(F.col("o_orderpriority").alias("pri"), m.alias("m"))
    )
    mdec = F.col("m").cast("decimal(19,0)")
    g = x.agg(
        F.sum(F.when(F.col("pri") == "1-URGENT", 1).otherwise(0))
        .cast("bigint").alias("n1"),
        F.sum(F.when(F.col("pri") == "5-LOW", 1).otherwise(0))
        .cast("bigint").alias("n2"),
        F.sum(F.when(F.col("pri") == "1-URGENT", F.col("m")).otherwise(0))
        .cast("bigint").alias("s1"),
        F.sum(F.when(F.col("pri") == "5-LOW", F.col("m")).otherwise(0))
        .cast("bigint").alias("s2"),
        F.sum(F.when(F.col("pri") == "1-URGENT", mdec * mdec)).alias("q1"),
        F.sum(F.when(F.col("pri") == "5-LOW", mdec * mdec)).alias("q2"),
    )
    v1 = (
        F.col("q1").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n1")
    ) / (F.col("n1") - 1)
    v2 = (
        F.col("q2").cast("double")
        - F.col("s2").cast("double") * F.col("s2") / F.col("n2")
    ) / (F.col("n2") - 1)
    se1 = v1 / F.col("n1")
    se2 = v2 / F.col("n2")
    return g.select(
        "n1", "n2",
        F.round(F.col("s1").cast("double") / F.col("n1") / 1000000.0, 4)
        .alias("mean_1"),
        F.round(F.col("s2").cast("double") / F.col("n2") / 1000000.0, 4)
        .alias("mean_2"),
        F.round(
            (F.col("s1").cast("double") / F.col("n1")
             - F.col("s2").cast("double") / F.col("n2"))
            / F.sqrt(se1 + se2), 4
        ).alias("t_stat"),
        F.round(
            (se1 + se2) * (se1 + se2)
            / (se1 * se1 / (F.col("n1") - 1) + se2 * se2 / (F.col("n2") - 1)),
            4,
        ).alias("df_welch"),
    )


@query("q_chisq_independence", oracle=r"""
WITH joined AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cells AS (
  SELECT seg, pri, CAST(count(*) AS BIGINT) AS obs
  FROM joined GROUP BY seg, pri
),
rt AS (SELECT seg, CAST(sum(obs) AS BIGINT) AS row_tot FROM cells GROUP BY seg),
ct AS (SELECT pri, CAST(sum(obs) AS BIGINT) AS col_tot FROM cells GROUP BY pri),
n AS (SELECT CAST(sum(obs) AS BIGINT) AS n_tot FROM cells),
chi AS (
  SELECT
    sum((obs - CAST(row_tot AS DOUBLE) * col_tot / n_tot)
        * (obs - CAST(row_tot AS DOUBLE) * col_tot / n_tot)
        / (CAST(row_tot AS DOUBLE) * col_tot / n_tot)) AS chi2,
    CAST((count(DISTINCT seg) - 1) * (count(DISTINCT pri) - 1) AS BIGINT)
      AS dof,
    CAST(count(DISTINCT seg) AS BIGINT) AS n_seg,
    CAST(count(DISTINCT pri) AS BIGINT) AS n_pri,
    max(n_tot) AS n_tot
  FROM cells JOIN rt USING (seg) JOIN ct USING (pri), n
)
SELECT round(chi2, 4) AS chi2, dof, n_tot,
       round(sqrt(chi2 / (n_tot * (CASE WHEN n_seg < n_pri THEN n_seg
                                        ELSE n_pri END - 1))), 4) AS cramers_v
FROM chi
""")
def q_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence (market segment × order
    priority) over the star join, plus Cramér's V effect size.

    Scale shape: customer is the broadcast dimension (the J1 path), the
    cell table is |segments|×|priorities| = 25 rows after one map-side-
    combined group-by; margins and N are aggregates OF THE CELL TABLE
    (vocabulary-sized, broadcast back) — nothing after the first
    aggregate is corpus-sized, and the only floats are the 25 expected-
    count terms computed from exact BIGINTs."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderpriority")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
    )
    rt = cells.groupBy("seg").agg(F.sum("obs").cast("bigint").alias("row_tot"))
    ct = cells.groupBy("pri").agg(F.sum("obs").cast("bigint").alias("col_tot"))
    n = cells.agg(F.sum("obs").cast("bigint").alias("n_tot"))
    exp = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n_tot")
    chi = (
        cells.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "pri")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum((F.col("obs") - exp) * (F.col("obs") - exp) / exp)
            .alias("chi2"),
            ((F.count_distinct("seg") - 1) * (F.count_distinct("pri") - 1))
            .cast("bigint").alias("dof"),
            F.count_distinct("seg").cast("bigint").alias("n_seg"),
            F.count_distinct("pri").cast("bigint").alias("n_pri"),
            F.max("n_tot").alias("n_tot"),
        )
    )
    return chi.select(
        F.round("chi2", 4).alias("chi2"),
        "dof",
        "n_tot",
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n_tot") * (F.least("n_seg", "n_pri") - 1))
            ),
            4,
        ).alias("cramers_v"),
    )


@query("q_jackknife_ci", oracle=r"""
WITH x AS (
  SELECT CAST((strpos('0123456789abcdef',
                      substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef',
                      substr(md5(CAST(o_orderkey AS VARCHAR)), 2, 1)) - 1)
            AS BIGINT) % 32 AS g,
         CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT) AS m
  FROM orders
),
blk AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_g, CAST(sum(m) AS BIGINT) AS s_g
  FROM x GROUP BY g
),
tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(sum(s_g) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n_blocks
  FROM blk
),
loo AS (
  SELECT b.g, (CAST(t.s - b.s_g AS DOUBLE) / (t.n - b.n_g)) AS mean_g,
         t.n, t.s, t.n_blocks
  FROM blk b, tot t
),
jk AS (
  SELECT max(n) AS n, max(n_blocks) AS n_blocks,
         max(CAST(s AS DOUBLE) / n) AS mean_micros,
         (max(n_blocks) - 1.0) / max(n_blocks)
           * sum((mean_g - (SELECT avg(mean_g) FROM loo))
                 * (mean_g - (SELECT avg(mean_g) FROM loo))) AS var_jack
  FROM loo
)
SELECT n, n_blocks,
       round(mean_micros / 1000000.0, 4) AS mean_price,
       round(sqrt(var_jack) / 1000000.0, 4) AS se,
       round((mean_micros - 1.959964 * sqrt(var_jack)) / 1000000.0, 4) AS ci_lo,
       round((mean_micros + 1.959964 * sqrt(var_jack)) / 1000000.0, 4) AS ci_hi
FROM jk
""")
def q_jackknife_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-block jackknife confidence interval for the mean
    order price: rows are md5-assigned to 32 blocks (pure row-key
    function — the resampling twin of ``q_hash_split``: stable under
    retries, appends, and partitioning, unlike RNG-based bootstrap
    draws); each leave-one-block-out mean comes from EXACT BIGINT
    (sum, count) differences, and the jackknife variance
    (G−1)/G · Σ(θ₍g₎ − θ̄)² is the only float stage. This is the
    production-shape nonparametric CI: a true bootstrap at 100 TB
    resamples block sums, not rows — exactly these 32 (n_g, s_g)
    partials.

    Scale shape: one map-side-combined 32-row block aggregate over the
    corpus; everything after is arithmetic on a 32-row table."""
    h = F.md5(F.col("o_orderkey").cast("string"))
    g = (F.conv(F.substring(h, 1, 2), 16, 10).cast("bigint") % 32).alias("g")
    m = F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5)).cast("bigint")
    blk = (
        load(spark, sf_dir, "orders")
        .select(g, m.alias("m"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum("m").cast("bigint").alias("s_g"),
        )
    )
    tot = blk.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
    )
    loo = blk.crossJoin(F.broadcast(tot)).select(
        "n", "s", "n_blocks",
        ((F.col("s") - F.col("s_g")).cast("double")
         / (F.col("n") - F.col("n_g"))).alias("mean_g"),
    )
    # centered-sum form, SAME as the oracle's: the uncentered
    # Σx² − (Σx)²/G subtracts two ~1e23 numbers to get ~1e19 —
    # catastrophic cancellation that can flip the 4th decimal between
    # engines. Centered deviations are all ~1e18 positives; summation-
    # order noise is 1e-16-relative, far inside the round(…, 4) window.
    mean_bar = loo.agg(F.avg("mean_g").alias("mean_bar"))
    dev = F.col("mean_g") - F.col("mean_bar")
    jk = (
        loo.crossJoin(F.broadcast(mean_bar))
        .agg(
            F.max("n").alias("n"),
            F.max("n_blocks").alias("n_blocks"),
            (F.max("s").cast("double") / F.max("n")).alias("mean_micros"),
            F.sum(dev * dev).alias("css"),
        )
        .select(
            "n", "n_blocks", "mean_micros",
            (
                (F.col("n_blocks") - 1.0) / F.col("n_blocks") * F.col("css")
            ).alias("var_jack"),
        )
    )
    half = F.lit(1.959964) * F.sqrt(F.col("var_jack"))
    return jk.select(
        "n", "n_blocks",
        F.round(F.col("mean_micros") / 1000000.0, 4).alias("mean_price"),
        F.round(F.sqrt("var_jack") / 1000000.0, 4).alias("se"),
        F.round((F.col("mean_micros") - half) / 1000000.0, 4).alias("ci_lo"),
        F.round((F.col("mean_micros") + half) / 1000000.0, 4).alias("ci_hi"),
    )


@query("q_mad_outliers", oracle=r"""
WITH med AS (
  SELECT c_mktsegment AS seg, quantile_cont(c_acctbal, 0.5) AS med
  FROM customer GROUP BY 1
),
dev AS (
  SELECT c.c_mktsegment AS seg, c.c_acctbal, m.med,
         abs(c.c_acctbal - m.med) AS adev
  FROM customer c JOIN med m ON c.c_mktsegment = m.seg
),
mad AS (
  SELECT seg, max(med) AS med, quantile_cont(adev, 0.5) AS mad
  FROM dev GROUP BY seg
)
SELECT d.seg, CAST(count(*) AS BIGINT) AS n,
       round(max(m.med), 4) AS median_bal,
       round(max(m.mad), 4) AS mad,
       CAST(sum(CASE WHEN d.adev > 3.0 * 1.4826 * m.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.seg = m.seg
GROUP BY d.seg ORDER BY d.seg
""")
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per market segment: median absolute
    deviation (MAD) of account balances, flagging |x − med| beyond
    3·1.4826·MAD (the normal-consistency constant) — the robust-stats
    complement to the quantile-clamp ``q_winsorize`` (a single wild
    balance moves MAD not at all, unlike a stddev rule).

    Engine exactness: both engines state the SAME interpolated exact
    median (``percentile``/``quantile_cont``); inputs are parquet
    doubles, so interpolation arithmetic is bit-identical; outlier
    comparison happens on exact doubles and the only rounding is
    display. Scale shape: medians are per-GROUP sorts of dimension-
    bounded groups (5 segments × customer dim); the flag pass is one
    broadcast join of a 5-row table onto the scan."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"), "c_acctbal"
    )
    med = cust.groupBy("seg").agg(
        F.percentile("c_acctbal", F.lit(0.5)).alias("med")
    )
    dev = cust.join(F.broadcast(med), "seg").select(
        "seg", "c_acctbal", "med",
        F.abs(F.col("c_acctbal") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("seg").agg(
        F.max("med").alias("med2"),
        F.percentile("adev", F.lit(0.5)).alias("mad"),
    )
    return (
        dev.join(F.broadcast(mad), "seg")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.max("med2"), 4).alias("median_bal"),
            F.round(F.max("mad"), 4).alias("mad"),
            F.sum(
                (F.col("adev") > 3.0 * 1.4826 * F.col("mad"))
                .cast("int")
            ).cast("bigint").alias("n_outliers"),
        )
        .orderBy("seg")
    )


@query("q_diff_in_diff", oracle=r"""
WITH x AS (
  SELECT CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'A' ELSE 'B' END AS variant,
         CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
              THEN 'pre' ELSE 'post' END AS period,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS m
  FROM events
),
c AS (
  SELECT variant, period, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(m) AS BIGINT) AS s
  FROM x GROUP BY 1, 2
),
w AS (
  SELECT
    max(CASE WHEN variant = 'A' AND period = 'pre'  THEN CAST(s AS DOUBLE) / n END) AS a_pre,
    max(CASE WHEN variant = 'A' AND period = 'post' THEN CAST(s AS DOUBLE) / n END) AS a_post,
    max(CASE WHEN variant = 'B' AND period = 'pre'  THEN CAST(s AS DOUBLE) / n END) AS b_pre,
    max(CASE WHEN variant = 'B' AND period = 'post' THEN CAST(s AS DOUBLE) / n END) AS b_post,
    CAST(sum(n) AS BIGINT) AS n_events
  FROM c
)
SELECT n_events,
       round(a_pre / 1000000.0, 4) AS a_pre,
       round(a_post / 1000000.0, 4) AS a_post,
       round(b_pre / 1000000.0, 4) AS b_pre,
       round(b_post / 1000000.0, 4) AS b_post,
       round(((a_post - a_pre) - (b_post - b_pre)) / 1000000.0, 4) AS did
FROM w
""")
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences point estimate of event value: users
    md5-assigned to variants A/B (stable row-key assignment), periods
    split at mid-month; DiD = (Ā_post − Ā_pre) − (B̄_post − B̄_pre).
    The causal-inference readout that corrects an A/B delta for a
    shared time trend.

    Engine exactness: the four cell means come from exact BIGINT
    micro-unit (sum, count) pairs — one conditional aggregate row; the
    DiD combination is the only float stage. Scale shape: one map-side-
    combined 4-cell aggregate over the corpus; no shuffle of data
    rows."""
    variant = F.when(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8", "A"
    ).otherwise("B")
    period = F.when(
        F.to_date("ts") <= F.lit("2024-01-15").cast("date"), "pre"
    ).otherwise("post")
    m = F.floor(F.col("value") * 1000000.0 + F.lit(0.5)).cast("bigint")
    c = (
        load(spark, sf_dir, "events")
        .select(variant.alias("variant"), period.alias("period"), m.alias("m"))
        .groupBy("variant", "period")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("m").cast("bigint").alias("s"),
        )
    )

    def cell(v: str, p: str) -> F.Column:
        return F.max(
            F.when(
                (F.col("variant") == v) & (F.col("period") == p),
                F.col("s").cast("double") / F.col("n"),
            )
        )

    w = c.agg(
        cell("A", "pre").alias("a_pre"),
        cell("A", "post").alias("a_post"),
        cell("B", "pre").alias("b_pre"),
        cell("B", "post").alias("b_post"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    return w.select(
        "n_events",
        F.round(F.col("a_pre") / 1000000.0, 4).alias("a_pre"),
        F.round(F.col("a_post") / 1000000.0, 4).alias("a_post"),
        F.round(F.col("b_pre") / 1000000.0, 4).alias("b_pre"),
        F.round(F.col("b_post") / 1000000.0, 4).alias("b_post"),
        F.round(
            ((F.col("a_post") - F.col("a_pre"))
             - (F.col("b_post") - F.col("b_pre"))) / 1000000.0,
            4,
        ).alias("did"),
    )


@query("q_gini_index", oracle=r"""
WITH m AS (
  SELECT o_custkey AS custkey,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS monet
  FROM orders GROUP BY 1
),
r AS (
  SELECT monet,
         CAST(row_number() OVER (ORDER BY monet, custkey) AS BIGINT) AS i,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM m
),
g AS (
  SELECT max(n) AS n, CAST(sum(monet) AS BIGINT) AS total,
         sum(CAST(i AS HUGEINT) * monet) AS iw
  FROM r
)
SELECT n, total AS total_micros,
       CAST(floor((2.0 * CAST(iw AS DOUBLE)
                   - (n + 1.0) * CAST(total AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE))
                  * 1000000.0 + 0.5) AS BIGINT) AS gini_ppm
FROM g
""")
def q_gini_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration index of customer lifetime spend:
    G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) over spend sorted ascending —
    the inequality readout (is 80% of revenue in 20% of customers?)
    that decides skew-mitigation strategy upstream.

    Engine exactness: spend is micro-unit BIGINT; ranks come from
    ``api.global_rank`` with a (monet, custkey) total order; the
    rank-weighted sum Σ i·xᵢ accumulates in DECIMAL(38,0)/HUGEINT
    (exact, order-free); ONE quantized float ratio at the end.

    Scale shape: corpus → customer-dimension aggregate (one shuffle);
    the rank is the two-phase range-partition rank (no single-partition
    window); the weighted sum is a map-side-combined single-row
    aggregate."""
    m = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("monet")
        )
    )
    from spark_ml_spark import api

    r = api.global_rank(m, ["monet", "custkey"], rank_col="i", total_col="n")
    g = r.agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum("monet").cast("bigint").alias("total"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("monet")).alias("iw"),
    )
    return g.select(
        "n",
        F.col("total").alias("total_micros"),
        F.floor(
            (2.0 * F.col("iw").cast("double")
             - (F.col("n") + F.lit(1.0)) * F.col("total").cast("double"))
            / (F.col("n").cast("double") * F.col("total").cast("double"))
            * 1000000.0
            + F.lit(0.5)
        ).cast("bigint").alias("gini_ppm"),
    )


@query("q_anova_dow", oracle=r"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1
),
g AS (
  SELECT dayname(day) AS dow, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(rev) AS BIGINT) AS s_g,
         sum(CAST(rev AS HUGEINT) * rev) AS q_g
  FROM d GROUP BY 1
),
m AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k,
         CAST(sum(s_g) AS BIGINT) AS s, sum(q_g) AS q,
         sum(CAST(s_g AS DOUBLE) * s_g / n_g) AS sb_terms
  FROM g
)
SELECT n, k,
       CAST(floor((sb_terms - CAST(s AS DOUBLE) * s / n)
                  / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                  * 1000000.0 + 0.5) AS BIGINT) AS eta2_ppm,
       round(((sb_terms - CAST(s AS DOUBLE) * s / n) / (k - 1))
             / (((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 - (sb_terms - CAST(s AS DOUBLE) * s / n)) / (n - k)), 4)
         AS f_stat
FROM m
""")
def q_anova_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of daily revenue by day-of-week: between-group vs
    within-group variance decomposition — η² (the seasonal share of
    variance, in ppm) and the F statistic. The variance-decomposition
    complement to ``q_seasonality_index``'s mean indices and the
    k-group generalization of ``q_welch_ttest``.

    Engine exactness: group moments are exact (BIGINT sums,
    DECIMAL(38,0)/HUGEINT sums of squares); the closed forms combine
    ~7 same-signed double terms from those exact partials, so
    summation-order noise is ~1e-16-relative — far inside the ppm
    quantization and the 4-dp round. Scale shape: day-grain aggregate →
    7-row group moments → single-row arithmetic."""
    d = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("rev")
        )
    )
    g = d.groupBy(F.date_format("day", "EEEE").alias("dow")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("rev").cast("bigint").alias("s_g"),
        F.sum(
            F.col("rev").cast("decimal(38,0)") * F.col("rev").cast("decimal(38,0)")
        ).alias("q_g"),
    )
    m = g.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("s_g").cast("bigint").alias("s"),
        F.sum("q_g").alias("q"),
        F.sum(
            F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g")
        ).alias("sb_terms"),
    )
    ssb = F.col("sb_terms") - F.col("s").cast("double") * F.col("s") / F.col("n")
    sst = F.col("q").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n")
    ssw = sst - ssb
    return m.select(
        "n", "k",
        F.floor(ssb / sst * 1000000.0 + F.lit(0.5)).cast("bigint")
        .alias("eta2_ppm"),
        F.round(
            (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))), 4
        ).alias("f_stat"),
    )


@query("q_price_elasticity", oracle=r"""
WITH p AS (
  SELECT l_partkey,
         CAST(floor(ln(CAST(sum(CAST(floor(l_extendedprice * 1000000.0
                                           + 0.5) AS BIGINT)) AS DOUBLE)
                       / sum(l_quantity) / 1000000.0) * 1000000.0 + 0.5)
              AS BIGINT) AS lx,
         CAST(floor(ln(CAST(sum(l_quantity) AS DOUBLE)) * 1000000.0 + 0.5)
              AS BIGINT) AS ly
  FROM lineitem GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
         sum(CAST(lx AS HUGEINT) * lx) AS sxx,
         sum(CAST(lx AS HUGEINT) * ly) AS sxy
  FROM p
)
SELECT n AS n_parts,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * sx), 4) AS elasticity
FROM m
""")
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand across parts: OLS slope of
    ln(total quantity) on ln(mean unit price) at the part grain — the
    canonical elasticity estimate (slope ≈ %Δquantity per %Δprice).

    Engine exactness: each part's two LOG VALUES are quantized to
    integer micro-nats BEFORE any summation (the ``q_lm_score``
    discipline), so the OLS sufficient statistics are exact
    BIGINT/DECIMAL(38,0) sums — float order never touches an
    accumulator; the closed-form slope is one double expression.
    Scale shape: one part-grain aggregate (map-side combined), one
    5-number single-row aggregate."""
    micro = F.floor(
        F.col("l_extendedprice") * 1000000.0 + F.lit(0.5)
    ).cast("bigint")
    p = (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(micro).cast("bigint").alias("rev_micro"),
            F.sum("l_quantity").alias("qty"),
        )
        .select(
            F.floor(
                F.log(
                    F.col("rev_micro").cast("double") / F.col("qty")
                    / 1000000.0
                ) * 1000000.0
                + F.lit(0.5)
            ).cast("bigint").alias("lx"),
            F.floor(
                F.log(F.col("qty").cast("double")) * 1000000.0 + F.lit(0.5)
            ).cast("bigint").alias("ly"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("lx").cast("bigint").alias("sx"),
        F.sum("ly").cast("bigint").alias("sy"),
        F.sum(dec("lx") * dec("lx")).alias("sxx"),
        F.sum(dec("lx") * dec("ly")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    return m.select(
        F.col("n").alias("n_parts"),
        F.round(
            (nd * F.col("sxy").cast("double")
             - F.col("sx").cast("double") * F.col("sy"))
            / (nd * F.col("sxx").cast("double")
               - F.col("sx").cast("double") * F.col("sx")),
            4,
        ).alias("elasticity"),
    )


@query("q_runs_test", oracle=r"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS x
  FROM orders GROUP BY 1
),
med AS (SELECT quantile_cont(x, 0.5) AS m FROM d),
s AS (
  SELECT day, CASE WHEN x > m THEN 1 WHEN x < m THEN 0 END AS sgn
  FROM d, med WHERE x <> m
),
runs AS (
  SELECT sgn,
         CASE WHEN lag(sgn) OVER (ORDER BY day) IS NULL
                   OR lag(sgn) OVER (ORDER BY day) <> sgn
              THEN 1 ELSE 0 END AS new_run
  FROM s
),
m2 AS (
  SELECT CAST(sum(new_run) AS BIGINT) AS r,
         CAST(sum(sgn) AS BIGINT) AS n1,
         CAST(count(*) - sum(sgn) AS BIGINT) AS n2
  FROM runs
)
SELECT r AS n_runs, n1, n2,
       round((CAST(r AS DOUBLE)
              - (2.0 * n1 * n2 / (n1 + n2) + 1))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / ((CAST(n1 + n2 AS DOUBLE)) * (n1 + n2)
                       * (n1 + n2 - 1))), 4) AS z_score
FROM m2
""")
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness of the daily revenue
    series around its median (micro-unit revenue varies at every
    scale, unlike the degenerate small-fixture order counts): runs of
    consecutive above/below-median days counted exactly (median-equal days dropped, the standard
    convention), z from the closed-form run-count moments. Too FEW runs
    means the series is trending/autocorrelated (see ``q_autocorr``);
    too many means oscillation — the nonparametric randomness screen.

    Scale shape: day-grain aggregate; the run-boundary lag runs on the
    calendar-bounded day series pinned via ``api.one_partition``; one
    closed-form row out of exact BIGINTs."""
    from pyspark.sql import Window

    from spark_ml_spark import api as _api

    d = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("x")
        )
    )
    med = d.agg(F.percentile("x", F.lit(0.5)).alias("m"))
    s = (
        d.crossJoin(F.broadcast(med))
        .where(F.col("x") != F.col("m"))
        .select(
            "day", F.when(F.col("x") > F.col("m"), 1).otherwise(0).alias("sgn")
        )
    )
    w = Window.partitionBy(_api.one_partition("day")).orderBy("day")
    runs = s.select(
        "sgn",
        F.when(
            F.lag("sgn").over(w).isNull()
            | (F.lag("sgn").over(w) != F.col("sgn")),
            1,
        ).otherwise(0).alias("new_run"),
    )
    m2 = runs.agg(
        F.sum("new_run").cast("bigint").alias("r"),
        F.sum("sgn").cast("bigint").alias("n1"),
        (F.count(F.lit(1)) - F.sum("sgn")).cast("bigint").alias("n2"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
        / ((n1 + n2).cast("double") * (n1 + n2) * (n1 + n2 - 1))
    )
    return m2.select(
        r.alias("n_runs"), "n1", "n2",
        F.round((r.cast("double") - mu) / F.sqrt(var), 4).alias("z_score"),
    )
