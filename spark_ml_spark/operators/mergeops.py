"""Round-5 wave-50: incremental table maintenance — MERGE accounting
and CDC change-stream apply.

``q_merge_upsert`` — MERGE INTO semantics (the ACID-table upsert the r3
verdict listed as the one absent warehouse shape): a deterministic
snapshot split of ``customer`` plays target (80%: ``c_custkey % 10 <
8``) and source (50%: ``% 10 >= 5``, balances bumped +100), and the
query produces the full matched/not-matched accounting — updated /
inserted / unchanged row counts plus the post-MERGE balance checksum in
exact BIGINT cents. Expressed as one full-outer join; on a lakehouse
table format the same plan becomes the MERGE's find-touched-files join.

``q_cdc_apply`` — ordered change-stream application (Debezium-style
last-op-wins): each user's event stream is a CDC feed totally ordered
by ``(ts, event_id)``; ``error`` events are tombstones (DELETE), every
other event UPSERTs its value. Final state = per-key last operation;
deleted keys drop out. Reported per final-op grain so both insert
survivorship and tombstone coverage are hash-checked.

The reference has no MERGE/CDC surface (``Data_transform.py``
passim); nearest siblings: ``q_upsert_latest`` (latest-record view),
``q_drift_diff`` (snapshot diff), ``q_scd2_intervals`` (history
intervalization), ``q_unpivot`` (reshaping, ``pipeline.py:147``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query


@query("q_merge_upsert", oracle=r"""
WITH target AS (
  SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 10 < 8
),
source AS (
  SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal
  FROM customer WHERE c_custkey % 10 >= 5
),
merged AS (
  SELECT coalesce(s.c_custkey, t.c_custkey) AS k,
         CASE WHEN s.c_custkey IS NOT NULL AND t.c_custkey IS NOT NULL
              THEN 'updated'
              WHEN t.c_custkey IS NULL THEN 'inserted'
              ELSE 'unchanged' END AS action,
         coalesce(s.c_acctbal, t.c_acctbal) AS bal
  FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
)
SELECT CAST(count(*) AS BIGINT) AS n_result,
       CAST(sum(CASE WHEN action = 'updated' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_updated,
       CAST(sum(CASE WHEN action = 'inserted' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_inserted,
       CAST(sum(CASE WHEN action = 'unchanged' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unchanged,
       CAST(sum(CAST(floor(bal * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS balance_cents
FROM merged
""")
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO accounting over deterministic target/source snapshot
    splits of ``customer``: WHEN MATCHED THEN UPDATE (source balance
    wins), WHEN NOT MATCHED THEN INSERT, plus the untouched remainder —
    counts per action and the post-merge balance checksum in exact
    BIGINT cents (per-row ``floor(bal*100+0.5)`` then integer sum, the
    repo's order-free exactness discipline for money).

    Scale shape: one equi-join on the table key — at 100 TB with both
    sides bucketed by key this is the exchange-free co-located MERGE
    plan (``q_bucketed_join`` shows the bucketing); AQE handles the
    skewed-key case. The accounting aggregate is map-side combined; no
    driver-side state."""
    cust = load(spark, sf_dir, "customer")
    target = cust.where(F.col("c_custkey") % 10 < 8).select(
        "c_custkey", "c_acctbal"
    )
    source = cust.where(F.col("c_custkey") % 10 >= 5).select(
        "c_custkey", (F.col("c_acctbal") + F.lit(100.0)).alias("c_acctbal")
    )
    t, s = target.alias("t"), source.alias("s")
    merged = t.join(
        s, F.col("t.c_custkey") == F.col("s.c_custkey"), "full_outer"
    ).select(
        F.when(
            F.col("s.c_custkey").isNotNull()
            & F.col("t.c_custkey").isNotNull(),
            F.lit("updated"),
        )
        .when(F.col("t.c_custkey").isNull(), F.lit("inserted"))
        .otherwise(F.lit("unchanged"))
        .alias("action"),
        F.coalesce(F.col("s.c_acctbal"), F.col("t.c_acctbal")).alias("bal"),
    )
    return merged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_result"),
        F.sum((F.col("action") == "updated").cast("int"))
        .cast("bigint")
        .alias("n_updated"),
        F.sum((F.col("action") == "inserted").cast("int"))
        .cast("bigint")
        .alias("n_inserted"),
        F.sum((F.col("action") == "unchanged").cast("int"))
        .cast("bigint")
        .alias("n_unchanged"),
        F.sum(
            F.floor(F.col("bal") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("balance_cents"),
    )


@query("q_cdc_apply", oracle=r"""
WITH ops AS (
  SELECT user_id,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
),
final AS (
  SELECT user_id, op, value FROM ops WHERE rk = 1
)
SELECT op AS final_op,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN op = 'U'
                     THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS live_value_cents
FROM final
GROUP BY op
ORDER BY op
""")
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change stream with last-op-wins semantics: each
    user's events, totally ordered by ``(ts, event_id)``, form a feed
    where ``error`` is a DELETE tombstone and everything else UPSERTs
    its value; the final state keeps each key's last operation. Output:
    keys surviving as live rows vs tombstoned, with the live-value
    checksum in exact BIGINT cents.

    Scale shape: the ranking window partitions BY KEY (per-user streams
    — bounded state, the ``q_upsert_latest`` discipline), which is
    exactly how a streaming CDC apply shards its state store; the final
    3-row aggregate is map-side combined. At 100 TB the same plan is
    the batch backfill twin of the ``q_stream_foreachbatch_upsert``
    streaming path."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ops = load(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "value",
        F.row_number().over(w).alias("rk"),
    )
    final = ops.where(F.col("rk") == 1)
    return (
        final.groupBy(F.col("op").alias("final_op"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(
                F.when(
                    F.col("op") == "U",
                    F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast(
                        "bigint"
                    ),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("live_value_cents"),
        )
        .orderBy("final_op")
    )
