"""Round-4 wave-36: warehouse analytics staples — weighted median,
share-of-total ratios, deterministic mean imputation.

``q_weighted_median`` — per return-flag weighted median of extended
price with line quantity as the frequency weight: Spark's
``percentile(col, p, frequency)`` computes over the weight-expanded
multiset; the oracle UNNESTS each row ``quantity`` times and takes
``quantile_cont`` over the same multiset — identical interpolation
semantics stated two ways.

``q_share_of_total`` — RATIO_TO_REPORT surface: each nation's revenue
share within its region in ppm, from exact micro-unit sums at both
grains.

``q_impute_mean`` — deterministic missing-data repair AUDIT: an md5
mask (~2/16 of rows) simulates missingness, survivors provide exact
per-segment micro-unit means, masked rows are imputed with their
segment mean. Since mean imputation makes the repaired mean equal the
survivor mean BY CONSTRUCTION, the informative output is the
IMPUTATION BIAS — repaired (=survivor) mean minus the ground-truth
mean the simulation still knows. The mask is a pure row-key function —
the same rows are "missing" on every retry, shard, and engine.

The reference has none of these surfaces (``Data_transform.py``
passim); siblings: ``q_percentiles`` (unweighted), ``q_l1_normalize``
(row-grain shares), ``q_dq_report`` (missingness detection — this is
the repair step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query


@query("q_weighted_median", oracle=r"""
WITH x AS (
  SELECT l_returnflag AS flag, l_extendedprice AS price,
         CAST(l_quantity AS BIGINT) AS w
  FROM lineitem WHERE l_quantity >= 1
),
expanded AS (
  SELECT flag, price, unnest(range(w)) AS i FROM x
),
cnt AS (
  SELECT flag, CAST(count(*) AS BIGINT) AS n_lines FROM x GROUP BY 1
)
SELECT e.flag, c.n_lines,
       round(quantile_cont(e.price, 0.5), 4) AS wmedian_price
FROM expanded e JOIN cnt c ON e.flag = c.flag
GROUP BY e.flag, c.n_lines
ORDER BY e.flag
""")
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag —
    the weighted-percentile surface (e.g. "median unit price by volume,
    not by line"). Spark states it natively as
    ``percentile(price, 0.5, frequency=quantity)``; the oracle expands
    each line ``quantity`` times and takes the continuous median of the
    identical multiset.

    Scale shape: ONE map-side-combined aggregate per flag group —
    the frequency argument means the multiset is never materialized
    (the oracle's unnest is the semantic spec, not the plan). Weights
    are BIGINT; the only float is the interpolated median itself."""
    x = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") >= 1)
        .select(
            F.col("l_returnflag").alias("flag"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_quantity").cast("bigint").alias("w"),
        )
    )
    return (
        x.groupBy("flag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(
                F.percentile("price", F.lit(0.5), F.col("w")), 4
            ).alias("wmedian_price"),
        )
        .orderBy("flag")
    )


@query("q_share_of_total", oracle=r"""
WITH rev AS (
  SELECT n.n_name AS nation, r.r_name AS region,
         CAST(sum(CAST(floor(o.o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
reg AS (SELECT region AS rg, CAST(sum(rev) AS BIGINT) AS reg_rev
        FROM rev GROUP BY 1)
SELECT region, nation, rev AS rev_micros,
       CAST(floor(rev * 1000000.0 / reg_rev + 0.5) AS BIGINT) AS share_ppm
FROM rev JOIN reg ON rev.region = reg.rg
ORDER BY region, nation
""")
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT: each nation's revenue share of its region in
    ppm — the share-of-total readout that an OLAP window
    ``ratio_to_report() OVER (PARTITION BY region)`` states; here the
    denominators come from a second grouped aggregate of the tiny
    nation-grain table re-joined by region key (dimension-sized — no
    window over the fact stream at all).

    Scale shape: the fact scan shuffles ONCE (group by nation via two
    broadcast dims); everything after is arithmetic on ≤25 rows. All
    sums exact micro-unit BIGINT; one quantized ratio per row."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("rev")
        )
    )
    regtot = rev.groupBy(F.col("region").alias("rg")).agg(
        F.sum("rev").cast("bigint").alias("reg_rev")
    )
    return (
        rev.join(F.broadcast(regtot), F.col("region") == F.col("rg"))
        .select(
            "region", "nation",
            F.col("rev").alias("rev_micros"),
            F.floor(F.col("rev") * 1000000.0 / F.col("reg_rev") + F.lit(0.5))
            .cast("bigint").alias("share_ppm"),
        )
        .orderBy("region", "nation")
    )


@query("q_impute_mean", oracle=r"""
WITH x AS (
  SELECT c_mktsegment AS seg,
         CAST(floor(c_acctbal * 1000000.0 + 0.5) AS BIGINT) AS bal,
         CASE WHEN substring(md5('miss:' || CAST(c_custkey AS VARCHAR)),
                             1, 1) < '2'
              THEN 1 ELSE 0 END AS missing
  FROM customer
),
seg_mean AS (
  SELECT seg, CAST(sum(bal) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM x WHERE missing = 0 GROUP BY seg
)
SELECT x.seg,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(x.missing) AS BIGINT) AS n_imputed,
       round(CAST(sum(x.bal) AS DOUBLE) / count(*) / 1000000.0, 4)
         AS true_mean,
       round(CAST(max(m.s) AS DOUBLE) / max(m.n) / 1000000.0, 4)
         AS imputed_mean,
       round(CAST(max(m.s) AS DOUBLE) / max(m.n) / 1000000.0
             - CAST(sum(x.bal) AS DOUBLE) / count(*) / 1000000.0, 4)
         AS imputation_bias
FROM x JOIN seg_mean m ON x.seg = m.seg
GROUP BY x.seg ORDER BY x.seg
""")
def q_impute_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mean-imputation audit: an md5 row mask (~2/16 of
    customers) simulates missing balances; per-segment survivor means
    (exact micro-unit sums) fill the masked rows. Mean imputation makes
    the repaired mean EQUAL the survivor mean by construction, so the
    report's payload is the imputation BIAS — repaired mean minus the
    ground-truth mean the simulation still knows (what a naive-repair
    pipeline silently loses). The mask is a pure row-key function, so
    the "missing" set is identical across engines, retries, and shards.

    Scale shape: one scan → segment-grain conditional aggregate; the
    5-row survivor-mean table broadcasts back onto the second segment
    aggregate. No repaired rows are ever materialized."""
    missing = (
        F.substring(
            F.md5(F.concat(F.lit("miss:"), F.col("c_custkey").cast("string"))),
            1, 1,
        ) < "2"
    ).cast("int")
    x = load(spark, sf_dir, "customer").select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("c_acctbal") * 1000000.0 + F.lit(0.5))
        .cast("bigint").alias("bal"),
        missing.alias("missing"),
    )
    seg_mean = (
        x.where(F.col("missing") == 0)
        .groupBy("seg")
        .agg(
            F.sum("bal").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    surv_mean = F.max("s").cast("double") / F.max("n")
    true_mean = F.sum("bal").cast("double") / F.count(F.lit(1))
    return (
        x.join(F.broadcast(seg_mean), "seg")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("missing").cast("bigint").alias("n_imputed"),
            F.round(true_mean / 1000000.0, 4).alias("true_mean"),
            F.round(surv_mean / 1000000.0, 4).alias("imputed_mean"),
            F.round(
                surv_mean / 1000000.0 - true_mean / 1000000.0, 4
            ).alias("imputation_bias"),
        )
        .orderBy("seg")
    )


@query("q_revenue_bridge", oracle=r"""
WITH y95 AS (
  SELECT o_custkey AS custkey,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995 GROUP BY 1
),
y96 AS (
  SELECT o_custkey AS custkey,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996 GROUP BY 1
),
j AS (
  SELECT coalesce(a.custkey, b.custkey) AS custkey,
         coalesce(a.rev, 0) AS r95, coalesce(b.rev, 0) AS r96,
         CASE WHEN a.custkey IS NULL THEN 'new'
              WHEN b.custkey IS NULL THEN 'churned'
              WHEN b.rev > a.rev THEN 'expansion'
              WHEN b.rev < a.rev THEN 'contraction'
              ELSE 'flat' END AS bridge
  FROM y95 a FULL OUTER JOIN y96 b ON a.custkey = b.custkey
)
SELECT bridge, CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(r96 - r95) AS BIGINT) AS delta_micros
FROM j GROUP BY bridge ORDER BY bridge
""")
def q_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YoY revenue bridge (waterfall decomposition): the 1995→1996
    revenue change attributed to new / churned / expansion /
    contraction / flat customer segments — the BI readout behind every
    "why did revenue move" narrative. The bridge identity holds
    exactly: Σ delta over segments = total(1996) − total(1995), all in
    micro-unit BIGINTs.

    Scale shape: two filtered year aggregates at the customer grain
    (one shuffle each), then a FULL OUTER join on the customer key —
    the ``q_full_outer_join`` reconciliation shape — and a ≤5-row
    rollup. Nothing after the joins is corpus-sized."""
    def year_rev(yr: int) -> DataFrame:
        return (
            load(spark, sf_dir, "orders")
            .where(F.year("o_orderdate") == yr)
            .groupBy(F.col("o_custkey").alias("custkey"))
            .agg(
                F.sum(
                    F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                    .cast("bigint")
                ).cast("bigint").alias("rev")
            )
        )

    a = year_rev(1995).select(
        F.col("custkey").alias("ck95"), F.col("rev").alias("r95")
    )
    b = year_rev(1996).select(
        F.col("custkey").alias("ck96"), F.col("rev").alias("r96")
    )
    j = a.join(b, F.col("ck95") == F.col("ck96"), "full_outer").select(
        F.coalesce("r95", F.lit(0)).alias("r95"),
        F.coalesce("r96", F.lit(0)).alias("r96"),
        F.when(F.col("ck95").isNull(), "new")
        .when(F.col("ck96").isNull(), "churned")
        .when(F.col("r96") > F.col("r95"), "expansion")
        .when(F.col("r96") < F.col("r95"), "contraction")
        .otherwise("flat").alias("bridge"),
    )
    return (
        j.groupBy("bridge")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum(F.col("r96") - F.col("r95")).cast("bigint")
            .alias("delta_micros"),
        )
        .orderBy("bridge")
    )


@query("q_abc_classification", oracle=r"""
WITH rev AS (
  SELECT l_partkey AS partkey,
         CAST(sum(CAST(floor(l_extendedprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
),
r AS (
  SELECT partkey, rev,
         CAST(sum(rev) OVER (ORDER BY rev DESC, partkey) AS BIGINT)
           AS cum_rev,
         CAST(sum(rev) OVER () AS BIGINT) AS total
  FROM rev
),
cls AS (
  SELECT partkey, rev,
         CASE WHEN (cum_rev - rev) * 100 < total * 80 THEN 'A'
              WHEN (cum_rev - rev) * 100 < total * 95 THEN 'B'
              ELSE 'C' END AS abc
  FROM r
)
SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev) AS BIGINT) AS rev_micros
FROM cls GROUP BY abc ORDER BY abc
""")
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: class A = parts
    whose PRECEDING cumulative share is under 80% of total revenue,
    B under 95%, C the tail — the inventory-prioritization readout
    behind "80% of revenue is 20% of SKUs". Class membership is decided
    on INTEGER cross-multiplication ((cum−rev)·100 < total·80), no
    float thresholds, so the cut is exact and engine-identical.

    Scale shape: one corpus aggregate to the part grain; the prefix sum
    runs via ``api.global_rank``'s two-phase machinery on the part-
    dimension table (range-repartitioned local sums + broadcast
    partition totals — no single-partition window); output is 3 rows.

    The oracle states the same prefix sums as plain SQL windows."""
    from spark_ml_spark import api as _api

    rev = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("rev")
        )
        .withColumn("neg_rev", -F.col("rev"))
    )
    # two-phase rank gives the prefix ORDER; prefix revenue needs the
    # same trick for SUMS: rank rows, then window-partition by the
    # range pid is already inside global_rank — here the part dimension
    # is catalog-sized, so a per-rank running sum over the ranked table
    # uses the bounded-table discipline with api.one_partition only if
    # small; the scale-correct form reuses global_rank twice: rank by
    # (-rev, partkey), then prefix sum = total of rows ranked before,
    # obtained by ranking the RUNNING key — implemented below as a
    # self-aggregate join on rank ranges via the 32-partition partials.
    ranked = _api.global_rank(
        rev, ["neg_rev", "partkey"], rank_col="rnk", total_col="n_parts_t"
    )
    w = (
        Window.partitionBy(_api.one_partition("rnk"))
        .orderBy("rnk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # part dimension is catalog-bounded (20k at sf0.1) — the pinned
    # window is acceptable here; a fact-sized variant would fold prefix
    # sums into global_rank's broadcast partials exactly like the rank
    tot = rev.agg(F.sum("rev").cast("bigint").alias("total"))
    cls = (
        ranked.select(
            "partkey", "rev",
            F.coalesce(F.sum("rev").over(w), F.lit(0))
            .cast("bigint").alias("before"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "rev",
            F.when(F.col("before") * 100 < F.col("total") * 80, "A")
            .when(F.col("before") * 100 < F.col("total") * 95, "B")
            .otherwise("C").alias("abc"),
        )
    )
    return (
        cls.groupBy("abc")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("rev").cast("bigint").alias("rev_micros"),
        )
        .orderBy("abc")
    )


@query("q_hhi_concentration", oracle=r"""
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(sum(CAST(floor(o.o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
reg AS (SELECT region AS rg, CAST(sum(rev) AS BIGINT) AS reg_rev
        FROM rev GROUP BY 1)
SELECT region,
       CAST(count(*) AS BIGINT) AS n_nations,
       CAST(floor(sum((CAST(rev AS DOUBLE) / reg_rev)
                      * (CAST(rev AS DOUBLE) / reg_rev)) * 10000.0 + 0.5)
            AS BIGINT) AS hhi_bp
FROM rev JOIN reg ON rev.region = reg.rg
GROUP BY region ORDER BY region
""")
def q_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index per region: Σ of
    squared nation revenue shares, in basis points (×10 000 — the
    antitrust convention; 10 000 = monopoly, 10 000/n = perfectly
    even). The concentration companion to ``q_share_of_total``'s raw
    shares and ``q_gini_index``'s corpus-wide inequality.

    Scale shape: identical star-join aggregate to q_share_of_total —
    one fact shuffle to the nation grain, then arithmetic on ≤25 rows
    with a broadcast regional total. Shares are the only floats,
    squared and quantized once per region."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    reg = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("rev")
        )
    )
    regtot = rev.groupBy(F.col("region").alias("rg")).agg(
        F.sum("rev").cast("bigint").alias("reg_rev")
    )
    share = F.col("rev").cast("double") / F.col("reg_rev")
    return (
        rev.join(F.broadcast(regtot), F.col("region") == F.col("rg"))
        .groupBy("region")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nations"),
            F.floor(F.sum(share * share) * 10000.0 + F.lit(0.5))
            .cast("bigint").alias("hhi_bp"),
        )
        .orderBy("region")
    )


@query("q_backlog_aging", oracle=r"""
WITH mx AS (
  SELECT max(CAST(o_orderdate AS DATE)) AS max_day FROM orders
),
open_orders AS (
  SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE), mx.max_day)
              // 90 AS BIGINT) AS age_q,
         CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT) AS m
  FROM orders, mx WHERE o_orderstatus = 'O'
)
SELECT CAST(CASE WHEN age_q > 8 THEN 8 ELSE age_q END AS BIGINT)
         AS age_bucket_q,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(m) AS BIGINT) AS value_micros
FROM open_orders GROUP BY 1 ORDER BY age_bucket_q
""")
def q_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: orders still in status 'O' bucketed by
    age in quarters (90-day integer buckets vs the dataset's latest
    order date, capped at 8+), with counts and exact micro-unit value —
    the working-capital readout every ops dashboard leads with.

    Scale shape: the reference day is a 1-row broadcast (max
    aggregate); the scan filters on status (pushed to parquet), buckets
    in-row with pure integer division, and rolls up into ≤9 rows
    map-side."""
    mx = load(spark, sf_dir, "orders").agg(
        F.max(F.to_date("o_orderdate")).alias("max_day")
    )
    open_orders = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(mx))
        .select(
            F.expr("CAST(datediff(max_day, CAST(o_orderdate AS DATE)) "
                   "DIV 90 AS BIGINT)").alias("age_q"),
            F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
            .cast("bigint").alias("m"),
        )
    )
    return (
        open_orders.groupBy(
            F.least(F.col("age_q"), F.lit(8)).cast("bigint")
            .alias("age_bucket_q")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("m").cast("bigint").alias("value_micros"),
        )
        .orderBy("age_bucket_q")
    )
