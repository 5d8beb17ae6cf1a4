"""Round-4 wave-35: behavioral-sequence operators — event trigrams,
conversion latency, deterministic negative sampling.

``q_event_trigrams`` — top consecutive 3-event patterns per user
stream (the order-2 extension of ``q_transition_matrix``'s bigrams and
``q_path_topk``'s 2-paths): the sequence-mining readout that feeds
next-action models.

``q_time_to_convert`` — funnel latency: per user, seconds from first
``view`` to first ``purchase`` (positive deltas only), with interpolated
exact p50/p90 — the time-dimension complement of ``q_funnel``'s
step-count view.

``q_negative_sample`` — deterministic negative sampling for recommender
training pairs: per ordering customer, 8 candidate part keys are
derived from md5(customer, slot) (pure row-key function — the
``q_hash_split`` discipline, reproducible across retries/shards, unlike
RNG sampling), then candidates that collide with a REAL interaction are
anti-joined away; the output is the histogram of surviving-negative
counts. This is the map-generate → hash-anti-join shape that replaces
"sample until miss" loops at 100 TB.

The reference has no behavioral surface (``Data_transform.py`` passim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.operators.sketches import _hex_int_sql
from spark_ml_spark.registry import query

_NEG_K = 8


@query("q_event_trigrams", oracle=r"""
WITH s AS (
  SELECT user_id, event_type,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e3
  FROM events
)
SELECT event_type AS e1, e2, e3, CAST(count(*) AS BIGINT) AS n
FROM s WHERE e3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, e1, e2, e3
LIMIT 20
""")
def q_event_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 consecutive event trigrams across user streams, with a
    (ts, event_id) total order so simultaneous events never make the
    sequence nondeterministic.

    Scale shape: the window partitions BY USER — per-user streams are
    the natural shard and each group holds only that user's events; the
    trigram count is a map-side-combined group-by on a ≤|V|³ key space
    (|V|=5 event types) and top-20 is TakeOrderedAndProject."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = load(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        s.where(F.col("e3").isNotNull())
        .groupBy(F.col("event_type").alias("e1"), "e2", "e3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(20)
    )


@query("q_time_to_convert", oracle=r"""
WITH u AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view'
                  THEN epoch_us(ts) END) AS v_us,
         min(CASE WHEN event_type = 'purchase'
                  THEN epoch_us(ts) END) AS p_us
  FROM events GROUP BY user_id
),
d AS (
  SELECT user_id, CAST((p_us - v_us) // 1000000 AS BIGINT) AS delta_sec
  FROM u WHERE v_us IS NOT NULL AND p_us IS NOT NULL AND p_us > v_us
)
SELECT CAST((SELECT count(*) FROM u) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_converted,
       round(quantile_cont(delta_sec, 0.5), 4) AS p50_sec,
       round(quantile_cont(delta_sec, 0.9), 4) AS p90_sec
FROM d
""")
def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency: per user, whole seconds from first ``view`` to
    first ``purchase`` (strictly after it), with interpolated exact
    p50/p90 over the converting users.

    Engine exactness: timestamps reduce to exact micro-epoch BIGINTs
    (conditional min — one aggregate), the delta is integer-divided to
    whole seconds, and both engines state the SAME interpolated
    percentile (``percentile``/``quantile_cont``) over those exact
    integers. Scale shape: one per-user conditional-min shuffle; the
    percentile runs over the (bounded, converter-sized) delta table."""
    u = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", F.unix_micros("ts"))
            ).alias("v_us"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
            ).alias("p_us"),
        )
    )
    d = u.where(
        F.col("v_us").isNotNull()
        & F.col("p_us").isNotNull()
        & (F.col("p_us") > F.col("v_us"))
    ).select(F.expr("(p_us - v_us) DIV 1000000").alias("delta_sec"))
    n_users = u.agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    return (
        d.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_converted"),
            # one array percentile = one value buffer (q_percentiles, r6)
            F.expr("percentile(delta_sec, array(0.5D, 0.9D))").alias("ps"),
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "n_users", "n_converted",
            F.round(F.col("ps")[0], 4).alias("p50_sec"),
            F.round(F.col("ps")[1], 4).alias("p90_sec"),
        )
    )


def _neg_oracle() -> str:
    h = _hex_int_sql("hx", 1, 8)
    return rf"""
WITH inter AS (
  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
np AS (SELECT CAST(max(p_partkey) AS BIGINT) AS n_parts FROM part),
cust AS (SELECT DISTINCT custkey FROM inter),
cand AS (
  SELECT c.custkey,
         {h} % np.n_parts + 1 AS partkey
  FROM (
    SELECT custkey,
           substr(md5('neg:' || CAST(custkey AS VARCHAR) || ':'
                      || CAST(slot AS VARCHAR)), 1, 8) AS hx
    FROM cust, (SELECT unnest(range(0, {_NEG_K})) AS slot)
  ) c, np
),
valid AS (
  SELECT c.custkey, CAST(count(*) AS BIGINT) AS n_neg
  FROM (
    SELECT DISTINCT custkey, partkey FROM cand
    EXCEPT SELECT custkey, partkey FROM inter
  ) c GROUP BY c.custkey
),
hist AS (
  SELECT coalesce(v.n_neg, 0) AS n_neg,
         CAST(count(*) AS BIGINT) AS n_customers
  FROM cust LEFT JOIN valid v USING (custkey)
  GROUP BY 1
)
SELECT n_neg, n_customers FROM hist ORDER BY n_neg
"""


@query("q_negative_sample", oracle=_neg_oracle())
def q_negative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling: per ordering customer, 8
    candidate part keys from md5(customer, slot) mod |parts|; real
    interactions are removed by ANTI-JOIN (hash-distributed, exact —
    no rejection-sampling loop); output is the histogram of how many of
    the 8 candidates survived per customer (duplicate candidate draws
    also collapse, so n_neg ≤ 8).

    Scale shape: candidate generation is an in-row ×8 flat map of the
    customer dimension (pure hash arithmetic, no RNG state); the
    anti-join shuffles on (customer, part) exactly like the
    ``q_decontaminate`` digest joins; the histogram is a ≤9-row
    aggregate. The |parts| scalar is a 1-row broadcast."""
    inter = (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .join(
            load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .distinct()
    )
    np_ = load(spark, sf_dir, "part").agg(
        F.max("p_partkey").cast("bigint").alias("n_parts")
    )
    cust = inter.select("custkey").distinct()
    slots = F.array(*[F.lit(i) for i in range(_NEG_K)])
    cand = (
        cust.select("custkey", F.explode(slots).alias("slot"))
        .crossJoin(F.broadcast(np_))
        .select(
            "custkey",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("neg:"),
                                F.col("custkey").cast("string"),
                                F.lit(":"),
                                F.col("slot").cast("string"),
                            )
                        ),
                        1, 8,
                    ),
                    16, 10,
                ).cast("bigint") % F.col("n_parts") + 1
            ).alias("partkey"),
        )
        .distinct()
    )
    valid = cand.join(inter, ["custkey", "partkey"], "left_anti").groupBy(
        "custkey"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_neg"))
    return (
        cust.join(valid, "custkey", "left")
        .select(F.coalesce("n_neg", F.lit(0)).cast("bigint").alias("n_neg"))
        .groupBy("n_neg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("n_neg")
    )


@query("q_user_entropy", oracle=r"""
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
tot AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
terms AS (
  SELECT c.user_id,
         CAST(sum(CAST(floor(-(CAST(c.c AS DOUBLE) / t.n)
                             * ln(CAST(c.c AS DOUBLE) / t.n)
                             * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS ent_micro
  FROM c JOIN tot t ON c.user_id = t.user_id
  GROUP BY c.user_id
)
SELECT CAST(ent_micro // 100000 AS BIGINT) AS ent_bucket,
       CAST(count(*) AS BIGINT) AS n_users
FROM terms GROUP BY 1 ORDER BY ent_bucket
""")
def q_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity histogram: per-user Shannon entropy of the
    event-type mix, bucketed in 0.1-nat bands. Uniform users (entropy
    near ln 5 ≈ 1.609) sit in bucket 16; single-behavior users in
    bucket 0 — the engagement-mix segmentation signal.

    Engine exactness: each −p·ln p TERM is quantized to integer
    micro-nats BEFORE summation (the ``q_lm_score`` discipline), so the
    per-user entropy is an exact BIGINT sum — float summation order can
    never flip a bucket boundary, unlike summing doubles then flooring.

    Scale shape: one (user, type) aggregate (map-side combined), the
    per-user total joined back ON THE USER KEY (co-partitioned with the
    term reduce), a ≤17-row histogram out."""
    c = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = c.groupBy("user_id").agg(F.sum("c").cast("bigint").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    term = F.floor(-p * F.log(p) * 1000000.0 + F.lit(0.5)).cast("bigint")
    terms = (
        c.join(tot, "user_id")
        .groupBy("user_id")
        .agg(F.sum(term).cast("bigint").alias("ent_micro"))
    )
    return (
        terms.groupBy(
            F.expr("CAST(ent_micro DIV 100000 AS BIGINT)").alias("ent_bucket")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("ent_bucket")
    )
