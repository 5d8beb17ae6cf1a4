"""Round-4 wave-32: customer/classification analytics — RFM quartile
segmentation, ordered string aggregation, and kNN majority-vote
classification.

``q_rfm_segments`` — the classic Recency/Frequency/Monetary quartile
segmentation of customers from their order history. Each dimension is
quartiled by EXACT global rank (``api.global_rank`` — the repo's
two-phase range-partition rank, no single-partition window) with the
arithmetic bucket ``(rank-1)*4 // n + 1`` stated identically in both
engines (NOT ``ntile``, whose remainder-distribution convention is an
engine choice).

``q_string_agg`` — per-nation ordered string aggregation: the top-3
customer names by account balance as one comma-joined string. Spark has
no ``string_agg(... ORDER BY)``; the Spark-first equivalent is
``array_join(transform(array_sort(collect_list(struct(rank, name)))))``
— the sort happens IN-ROW on a 3-element array, not in an aggregation
ordering clause.

``q_knn_classify`` — k-nearest-neighbour majority-vote classification:
the 20 lowest vec_ids are the query set, the rest the labeled pool;
top-5 cosine neighbours per query (ranked by ``api.grouped_rank``, no
one-reducer-per-query window), majority label with a deterministic
smallest-label tie-break.

Engine exactness: ranks order by (round(cos,6) desc, id) so float
ordering never decides a rank; votes/counts are BIGINT.

The reference has none of these surfaces (``Data_transform.py``
passim); siblings: ``q_retention_cohorts`` (behavioral cohorts),
``q_cosine_topk`` (the kNN scoring primitive), ``q_nb_classify``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.functions.vector import cosine, to_double_array
from spark_ml_spark.io.sources import load
from spark_ml_spark.operators.similarity import _ORACLE_COS
from spark_ml_spark.registry import query

#: queries = vec_id < _KNN_Q; labeled pool = the rest
_KNN_Q = 20
_KNN_K = 5


@query("q_rfm_segments", oracle=r"""
WITH m AS (
  SELECT o_custkey AS custkey,
         CAST(date_diff('day', DATE '1970-01-01',
                        max(CAST(o_orderdate AS DATE))) AS BIGINT) AS last_day,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS monet
  FROM orders GROUP BY 1
),
r AS (
  SELECT custkey, freq, monet,
         row_number() OVER (ORDER BY last_day, custkey) AS r_rank,
         row_number() OVER (ORDER BY freq, custkey) AS f_rank,
         row_number() OVER (ORDER BY monet, custkey) AS m_rank,
         count(*) OVER () AS n
  FROM m
)
SELECT CAST((r_rank - 1) * 4 // n + 1 AS BIGINT) AS r_q,
       CAST((f_rank - 1) * 4 // n + 1 AS BIGINT) AS f_q,
       CAST((m_rank - 1) * 4 // n + 1 AS BIGINT) AS m_q,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(monet) AS BIGINT) AS monet_micros
FROM r GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q
""")
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer last-order day (recency),
    order count (frequency), lifetime spend in exact micro-units
    (monetary); each dimension quartiled 1..4 by exact global rank with
    a (value, custkey) total order; segments reported as the 4×4×4
    grid with customer counts and exact spend totals.

    Scale shape: ONE corpus shuffle (group orders by customer); the
    three dimensions rank in ONE ``api.grouped_rank`` pass over the
    exploded (dim, val, custkey) rows — range-repartition + local
    row_number + broadcast per-(dim, partition) prefix offsets, never a
    single-partition window — then one customer-keyed groupBy pivots
    the quartiles back; the output is a ≤64-row aggregate. Quartile
    arithmetic is pure integer."""
    m = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.unix_date(F.to_date("o_orderdate")))
            .cast("bigint").alias("last_day"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("monet"),
        )
    )
    # ONE rank machine for all three dimensions (r12 optimization,
    # guide §2.4): the former three CHAINED global_rank calls each ran
    # their own range exchange + sampling pass + persist + offsets
    # join over the same customer rows, serialized by the chain.
    # Explode each customer into its three (dim, val) rows — a pure
    # in-row projection — and rank once with grouped_rank over ``dim``:
    # within a dim, (val, custkey) is the identical total order, so
    # every rank and quartile is bit-identical; one narrow groupBy
    # pivots the three quartiles back onto one row per customer.
    keyed = m.select(
        "custkey", "monet",
        F.explode(F.array(
            F.struct(F.lit("r").alias("dim"),
                     F.col("last_day").alias("val")),
            F.struct(F.lit("f").alias("dim"), F.col("freq").alias("val")),
            F.struct(F.lit("m").alias("dim"), F.col("monet").alias("val")),
        )).alias("x"),
    ).select("custkey", "monet", "x.dim", "x.val")
    ranked = api.grouped_rank(
        keyed, ["dim"], ["val", "custkey"], rank_col="rk", total_col="n"
    )
    q = (F.floor((F.col("rk") - 1) * 4 / F.col("n")) + 1).cast("bigint")

    def dimq(d: str) -> F.Column:
        return F.max(F.when(F.col("dim") == d, q)).alias(f"{d}_q")

    return (
        ranked.groupBy("custkey")
        .agg(dimq("r"), dimq("f"), dimq("m"), F.max("monet").alias("monet"))
        .groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("monet").cast("bigint").alias("monet_micros"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )


@query("q_string_agg", oracle=r"""
WITH r AS (
  SELECT n.n_name, c.c_name, c.c_acctbal,
         row_number() OVER (PARTITION BY n.n_name
                            ORDER BY c.c_acctbal DESC, c.c_custkey) AS rnk
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT n_name,
       string_agg(c_name, ',' ORDER BY rnk) AS top_names,
       CAST(count(*) AS BIGINT) AS n_listed
FROM r WHERE rnk <= 3
GROUP BY n_name ORDER BY n_name
""")
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: per nation, the top-3 customer names
    by (acctbal desc, custkey) joined into one comma-separated string —
    the LISTAGG/STRING_AGG surface. Spark lacks an ordering clause on
    aggregation, so the order is made IN-ROW data: collect the
    (rank, name) structs, ``array_sort`` the ≤3-element array (struct
    order = rank order), project the names, join.

    Scale shape: nation is a broadcast dim; the per-nation rank is a
    partitioned window over nation keys (dimension-bounded groups; a
    high-cardinality production variant switches to
    ``api.grouped_rank``); the final aggregate holds ≤3 rows per
    group."""
    from pyspark.sql import Window

    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    r = (
        c.join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "c_name", "c_acctbal", "c_custkey")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
    )
    return (
        r.groupBy("n_name")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rnk", "c_name"))
                    ),
                    lambda s: s["c_name"],
                ),
                ",",
            ).alias("top_names"),
            F.count(F.lit(1)).cast("bigint").alias("n_listed"),
        )
        .orderBy("n_name")
    )


@query("q_knn_classify", oracle=rf"""
WITH q AS (
  SELECT vec_id AS q_id, label AS true_label, embedding AS qe
  FROM embeddings WHERE vec_id < {_KNN_Q}
),
p AS (
  SELECT vec_id AS p_id, label, embedding AS pe
  FROM embeddings WHERE vec_id >= {_KNN_Q}
),
scored AS (
  SELECT q.q_id, q.true_label, p.p_id, p.label,
         round({_ORACLE_COS.format(a="q.qe", b="p.pe")}, 6) AS cos6
  FROM q, p
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos6 DESC, p_id) AS rnk
  FROM scored
),
votes AS (
  SELECT q_id, true_label, label, CAST(count(*) AS BIGINT) AS votes
  FROM ranked WHERE rnk <= {_KNN_K}
  GROUP BY 1, 2, 3
),
win AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY votes DESC, label) AS vr
  FROM votes
)
SELECT q_id, CAST(true_label AS BIGINT) AS true_label,
       CAST(label AS BIGINT) AS pred_label, votes
FROM win WHERE vr = 1 ORDER BY q_id
""")
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification: for each of the {Q} query vectors, the top-5
    cosine neighbours in the labeled pool vote; majority label wins
    with a deterministic (votes desc, label asc) tie-break. Ranks order
    by (round(cos,6) desc, pool id) so float noise never decides a
    neighbour set.

    Scale shape: the query side is broadcast ({Q} rows — the
    ``q_cosine_topk`` discipline: scan the pool once, score per-row);
    per-query ranking uses ``api.grouped_rank`` (range-partitioned,
    no one-reducer-per-query window); votes and the argmax are
    vocabulary-sized aggregates. For a query side too big to
    broadcast, the registered IVF/PQ paths (``q_ivf_topk``,
    ``q_pq_topk``) are the sublinear alternative."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("e")
    )
    q = emb.where(F.col("vec_id") < _KNN_Q).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("true_label"),
        F.col("e").alias("qe"),
    )
    p = emb.where(F.col("vec_id") >= _KNN_Q).select(
        F.col("vec_id").alias("p_id"), "label", F.col("e").alias("pe")
    )
    scored = p.crossJoin(F.broadcast(q)).select(
        "q_id", "true_label", "p_id", "label",
        (-F.round(cosine(F.col("qe"), F.col("pe")), 6)).alias("neg_cos6"),
    )
    ranked = api.grouped_rank(
        scored, ["q_id"], ["neg_cos6", "p_id"], rank_col="rnk",
        total_col="n_pool",
    )
    votes = (
        ranked.where(F.col("rnk") <= _KNN_K)
        .groupBy("q_id", "true_label", "label")
        .agg(F.count(F.lit(1)).cast("bigint").alias("votes"))
    )
    win = votes.groupBy("q_id", "true_label").agg(
        F.max(F.struct(F.col("votes"), (-F.col("label")).alias("nl")))
        .alias("w")
    )
    return win.select(
        "q_id",
        F.col("true_label").cast("bigint").alias("true_label"),
        (-F.col("w.nl")).cast("bigint").alias("pred_label"),
        F.col("w.votes").alias("votes"),
    ).orderBy("q_id")


@query("q_segment_migration", oracle=r"""
WITH y AS (
  SELECT o_custkey AS custkey, EXTRACT(year FROM o_orderdate) AS yr,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS monet
  FROM orders WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2
),
r AS (
  SELECT custkey, yr, monet,
         row_number() OVER (PARTITION BY yr ORDER BY monet, custkey) AS rnk,
         count(*) OVER (PARTITION BY yr) AS n
  FROM y
),
q AS (
  SELECT custkey, yr,
         CAST((rnk - 1) * 4 // n + 1 AS BIGINT) AS quartile
  FROM r
)
SELECT a.quartile AS q_1995, b.quartile AS q_1996,
       CAST(count(*) AS BIGINT) AS n_customers
FROM q a JOIN q b ON a.custkey = b.custkey
WHERE a.yr = 1995 AND b.yr = 1996
GROUP BY 1, 2 ORDER BY q_1995, q_1996
""")
def q_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend-quartile migration matrix 1995→1996: customers active in
    both years, quartiled per year by exact rank (same integer bucket
    arithmetic as ``q_rfm_segments``), cross-tabulated into the 4×4
    transition matrix — the customer-value migration readout behind
    upgrade/downgrade narratives (a discrete sibling of
    ``q_transition_matrix``'s event Markov chain).

    Scale shape: per-year customer-grain aggregates (one shuffle), two
    ``api.global_rank`` passes (per-year, range-partitioned), an
    equi-join on the customer key, a ≤16-row rollup."""
    y = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("monet")
        )
    )

    def quart(yr: int) -> DataFrame:
        ranked = api.global_rank(
            y.where(F.col("yr") == yr).drop("yr"),
            ["monet", "custkey"], rank_col="rnk", total_col="n",
        )
        return ranked.select(
            "custkey",
            (F.floor((F.col("rnk") - 1) * 4 / F.col("n")) + 1)
            .cast("bigint").alias(f"q_{yr}"),
        )

    return (
        quart(1995).join(quart(1996), "custkey")
        .groupBy("q_1995", "q_1996")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("q_1995", "q_1996")
    )


@query("q_new_vs_repeat", oracle=r"""
WITH first_mon AS (
  SELECT o_custkey AS custkey,
         min(date_trunc('month', CAST(o_orderdate AS DATE))) AS fm
  FROM orders GROUP BY 1
),
o AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
         o_custkey AS custkey,
         CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT) AS m
  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998
)
SELECT CAST(o.mon AS VARCHAR) AS mon,
       CAST(sum(CASE WHEN f.fm = o.mon THEN 1 ELSE 0 END) AS BIGINT)
         AS new_orders,
       CAST(sum(CASE WHEN f.fm < o.mon THEN 1 ELSE 0 END) AS BIGINT)
         AS repeat_orders,
       CAST(sum(CASE WHEN f.fm = o.mon THEN m ELSE 0 END) AS BIGINT)
         AS new_rev_micros,
       CAST(sum(CASE WHEN f.fm < o.mon THEN m ELSE 0 END) AS BIGINT)
         AS repeat_rev_micros
FROM o JOIN first_mon f ON o.custkey = f.custkey
GROUP BY o.mon ORDER BY mon
""")
def q_new_vs_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition mix for 1998: per month, orders and exact revenue
    from NEW customers (their first-ever order month is this month) vs
    REPEAT customers — the growth-quality readout ("is revenue new
    demand or the existing base?").

    Scale shape: the first-order month is one customer-grain aggregate
    (broadcastable dimension), joined onto the filtered fact scan by
    customer key; the rollup is month-grain. All classification is on
    exact month keys — no window over the fact stream."""
    first_mon = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.min(F.date_trunc("month", F.to_date("o_orderdate")))
            .alias("fm")
        )
    )
    o = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1998)
        .select(
            F.date_trunc("month", F.to_date("o_orderdate")).alias("mon"),
            F.col("o_custkey").alias("custkey"),
            F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
            .cast("bigint").alias("m"),
        )
    )
    is_new = F.col("fm") == F.col("mon")
    is_rep = F.col("fm") < F.col("mon")
    return (
        o.join(F.broadcast(first_mon), "custkey")
        .groupBy("mon")
        .agg(
            F.sum(is_new.cast("int")).cast("bigint").alias("new_orders"),
            F.sum(is_rep.cast("int")).cast("bigint").alias("repeat_orders"),
            F.sum(F.when(is_new, F.col("m")).otherwise(0))
            .cast("bigint").alias("new_rev_micros"),
            F.sum(F.when(is_rep, F.col("m")).otherwise(0))
            .cast("bigint").alias("repeat_rev_micros"),
        )
        .select(
            F.date_format("mon", "yyyy-MM-dd").alias("mon"),
            "new_orders", "repeat_orders",
            "new_rev_micros", "repeat_rev_micros",
        )
        .orderBy("mon")
    )


@query("q_value_deciles", oracle=r"""
WITH m AS (
  SELECT o_custkey AS custkey,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS monet
  FROM orders GROUP BY 1
),
r AS (
  SELECT monet,
         row_number() OVER (ORDER BY monet, custkey) AS rnk,
         count(*) OVER () AS n,
         CAST(sum(monet) OVER () AS BIGINT) AS total
  FROM m
)
SELECT CAST((rnk - 1) * 10 // n + 1 AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(monet) AS BIGINT) AS rev_micros,
       CAST(floor(sum(monet) * 1000000.0 / max(total) + 0.5) AS BIGINT)
         AS share_ppm
FROM r GROUP BY 1 ORDER BY decile
""")
def q_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-value decile report (the Lorenz table behind
    ``q_gini_index``'s single number): customers exactly ranked by
    lifetime spend, bucketed into 10 equal-count deciles with each
    decile's exact revenue and ppm share — "the top decile is X% of
    revenue", the marketing-prioritization staple.

    Scale shape: customer-grain aggregate → ``api.global_rank``
    (two-phase, no single-partition window) → 10-row rollup with a
    broadcast total; pure integers until one quantized share per
    decile."""
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
    ranked = api.global_rank(
        m, ["monet", "custkey"], rank_col="rnk", total_col="n"
    )
    tot = m.agg(F.sum("monet").cast("bigint").alias("total"))
    return (
        ranked.select(
            "monet",
            (F.floor((F.col("rnk") - 1) * 10 / F.col("n")) + 1)
            .cast("bigint").alias("decile"),
        )
        .crossJoin(F.broadcast(tot))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("monet").cast("bigint").alias("rev_micros"),
            F.floor(
                F.sum("monet") * 1000000.0 / F.max("total") + F.lit(0.5)
            ).cast("bigint").alias("share_ppm"),
        )
        .orderBy("decile")
    )


@query("q_cohort_ltv", oracle=r"""
WITH first AS (
  SELECT o_custkey,
         CAST(min(year(o_orderdate) * 100 + month(o_orderdate))
              AS BIGINT) AS cohort_ym
  FROM orders GROUP BY 1
),
sized AS (
  SELECT cohort_ym, CAST(count(*) AS BIGINT) AS cohort_size
  FROM first GROUP BY 1
),
rev AS (
  SELECT f.cohort_ym,
         CAST((year(o.o_orderdate) * 12 + month(o.o_orderdate))
              - (f.cohort_ym // 100 * 12 + f.cohort_ym % 100)
              AS BIGINT) AS age_m,
         CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders o JOIN first f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
),
cum AS (
  SELECT r.cohort_ym, r.age_m, r.rev_cents, s.cohort_size,
         CAST(sum(r.rev_cents) OVER (
           PARTITION BY r.cohort_ym ORDER BY r.age_m
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS cum_rev_cents
  FROM rev r JOIN sized s ON s.cohort_ym = r.cohort_ym
)
SELECT cohort_ym, age_m, cohort_size, rev_cents, cum_rev_cents,
       CAST(cum_rev_cents // cohort_size AS BIGINT) AS ltv_cents
FROM cum
WHERE age_m <= 11
ORDER BY cohort_ym, age_m
""")
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by first-order
    month, and for each (cohort, months-since-first) the period
    revenue, running cumulative revenue, and cumulative LTV per cohort
    member — the money-dimension refinement of ``q_retention_cohorts``
    (which counts activity; acquisition channels are judged on THIS
    curve). First 12 months of age per cohort.

    Scale shape: the ``q_retention_cohorts`` discipline — first-touch
    aggregate and activity join both shuffle on the customer key
    (co-partitioned on a cluster; the cohort table is one row per
    customer and broadcastable far up the curve); the rollup lands on
    the calendar-bounded (cohort × age) grain, where the cumulative
    window partitions per cohort over ≤12 rows. Exact BIGINT cents;
    LTV is one integer division."""
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("ym"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("ym_lin"),
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("pc"),
    )
    first = orders.groupBy("o_custkey").agg(
        F.min("ym").cast("bigint").alias("cohort_ym"),
        F.min("ym_lin").cast("bigint").alias("cohort_lin"),
    )
    sized = first.groupBy("cohort_ym").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    rev = (
        orders.join(first, "o_custkey")
        .groupBy(
            "cohort_ym",
            (F.col("ym_lin") - F.col("cohort_lin")).alias("age_m"),
        )
        .agg(F.sum("pc").cast("bigint").alias("rev_cents"))
    )
    w = (
        Window.partitionBy("cohort_ym")
        .orderBy("age_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.join(F.broadcast(sized), "cohort_ym")
        .select(
            "cohort_ym",
            "age_m",
            "cohort_size",
            "rev_cents",
            F.sum("rev_cents").over(w).cast("bigint")
            .alias("cum_rev_cents"),
        )
        .where(F.col("age_m") <= 11)
        .select(
            "*",
            F.expr("CAST(cum_rev_cents DIV cohort_size AS BIGINT)")
            .alias("ltv_cents"),
        )
        .orderBy("cohort_ym", "age_m")
    )
