"""Structured Streaming surface (SURVEY.md §2.9 — absent in the reference,
part of the engine's target surface).

The batch twin of the streaming aggregation (``q_tumbling_window``) is
oracle-checked; the streaming execution itself is verified by running the
SAME aggregation through ``readStream`` → memory sink and handing the
driver the identical oracle SQL — streaming and batch must agree, which is
exactly Structured Streaming's unified-model guarantee.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_ml_spark.functions.exact import DECIMAL_TYPE, decimal_exact_sums as _exact_sql, exact_sum
from spark_ml_spark.registry import query

#: explicit schema — readStream cannot infer (and inference is a full
#: extra pass at scale anyway). ``ts`` is stored as naive TIMESTAMP(MICROS)
#: (fixture format since r3; earlier rounds used TIMESTAMP(NANOS), read as
#: long + divided — that path is gone with the fixture that needed it).
#: Declared TimestampType (LTZ): with the session pinned to UTC, watermark
#: and window arithmetic match DuckDB's epoch() over its naive TIMESTAMP.
EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def _read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # epoch math and F.window alignment follow the session timezone; pin
    # UTC so results match the DuckDB oracle in any driver session
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # declared-schema reads don't infer, but pin the conf anyway so any
    # batch re-read of the same files in this session agrees (LTZ)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # the file stream source wants a directory; glob-filter to the events
    # table (in production this is the landing directory new files arrive in)
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def _next_sink_name() -> str:
    # uuid, not a counter: memory-sink query names are session-global, so
    # concurrent callers (or a re-entrant driver) must never collide
    return f"spark_ml_spark_stream_sink_{uuid.uuid4().hex[:12]}"


def _drain(df: DataFrame, output_mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion through a memory sink and
    return the sink table. The memory sink's temp view outlives
    ``q.stop()`` (it references the sink's in-memory buffer for the rest
    of the session), so the result is returned as a live DataFrame — no
    ``collect()``/``createDataFrame`` round-trip through the driver
    (VERDICT r1 minor). The memory sink itself is test-harness plumbing;
    production streams write to kafka/parquet/delta sinks instead."""
    spark = df.sparkSession
    sink = _next_sink_name()
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(sink)


@query("q_stream_tumbling", oracle=_exact_sql("""
SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
       event_type,
       count(*)             AS n_events,
       ROUND(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""))
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-hour aggregation: readStream over the events
    parquet → stateful hash aggregation → complete-mode memory sink,
    drained synchronously. Buckets on epoch seconds (timezone-proof, same
    rationale as the batch twin). Must produce byte-identical results to
    the batch plan — checked against the same DuckDB oracle."""
    stream = _read_events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(
            F.floor(F.unix_timestamp("ts") / 3600).alias("hour_bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(exact_sum("value"), 4).alias("sum_value"),
        )
    )
    return _drain(agg, "complete")


def stateful_session_counts(stream: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """The stateful operator itself, reusable on ANY stream with
    (user_id, ts, event_id): per-user session/event counts with state
    (last event time, session count, event count) carried across
    micro-batches."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def count_sessions(key, pdf_iter, state: GroupState):
        import pandas as pd  # noqa: PLC0415 — runs in the Python worker

        if state.exists:
            last_ts, n_sessions, n_events = state.get
        else:
            last_ts, n_sessions, n_events = None, 0, 0
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts", "event_id"])
            for t in pdf["ts"]:
                t_us = int(t.value // 1000)  # pandas Timestamp ns → µs
                if last_ts is None or (t_us - last_ts) > gap_us:
                    n_sessions += 1
                last_ts = t_us
                n_events += 1
        state.update((last_ts, n_sessions, n_events))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
        )

    return (
        stream.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            count_sessions,
            outputStructType="user_id long, n_sessions long, n_events long",
            stateStructType="last_ts long, n_sessions long, n_events long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


@query("q_stream_stateful_sessions", oracle="""
WITH g AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT user_id,
       CAST(sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM g GROUP BY user_id
""")
def q_stream_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-user session counting with a 30-minute inactivity gap, state =
    (last event time, session count, event count) carried across
    micro-batches. The batch-equivalent lag+gap formula is the oracle —
    streaming and batch must agree on a replay of the same data.

    At scale: state is per-user (bounded), partitioned by the group key;
    the RocksDB state store handles spill; a production deployment adds a
    state TTL via GroupStateTimeout."""
    stream = _read_events_stream(spark, sf_dir)
    sessions = stateful_session_counts(stream)
    return _drain(sessions, "update")


@query("q_stream_dedup", oracle="""
SELECT DISTINCT user_id, event_type FROM events
""")
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicates`` on a stream keeps
    first-seen keys in the state store and emits each key once (append
    mode) — the incremental form of N1 exact dedup. In production, bound
    the state with ``dropDuplicatesWithinWatermark``; here the key space
    (user × event_type) is finite so unbounded state is exact."""
    stream = _read_events_stream(spark, sf_dir)
    dedup = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    return _drain(dedup, "append")


@query("q_stream_stream_join", oracle="""
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts BETWEEN c.ts - INTERVAL 30 MINUTE AND c.ts
""")
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: clicks ⋈ purchases of the same user
    within the preceding 30 minutes, both sides watermarked — the
    watermark + time-range condition is what lets Spark EXPIRE join state
    (without it, both sides buffer forever). Append-mode output equals the
    batch interval join (the oracle) on a replay of the same data."""
    clicks = (
        _read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        _read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user_id AND "
            "purchase_ts BETWEEN click_ts - INTERVAL 30 MINUTES AND click_ts"
        ),
        "inner",
    ).select("click_id", "purchase_id", "user_id")
    return _drain(joined, "append")


@query("q_stream_event_window", oracle=_exact_sql("""
SELECT CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT)        AS win_start_epoch,
       CAST(FLOOR(epoch(ts) / 3600) * 3600 + 3600 AS BIGINT) AS win_end_epoch,
       event_type,
       count(*)             AS n_events,
       ROUND(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2, 3
"""))
def q_stream_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed aggregation with a watermark — the
    late-data-tolerant form (``withWatermark`` bounds state so the
    aggregation runs forever on an unbounded stream). Uses ``F.window``
    tumbling 1h, emitted with epoch-second bounds — deterministic because
    the session timezone is pinned to UTC (io.sources.load), so the
    batch GROUP BY hour oracle applies."""
    stream = _read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(exact_sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("window.start").alias("win_start_epoch"),
            F.unix_timestamp("window.end").alias("win_end_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return _drain(agg, "complete")


@query("q_stream_to_parquet", oracle=_exact_sql("""
SELECT event_id, user_id, ROUND(value, 4) AS value
FROM events
WHERE event_type = 'purchase' AND value > 50
"""))
def q_stream_to_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming → PARQUET FILE SINK with checkpointing (the production
    sink shape, unlike the memory-sink test harness): a stateless
    filter/projection stream lands as parquet with exactly-once file
    commits (the checkpoint's offset log + the sink's file manifest make
    replays idempotent). The returned DataFrame re-reads the committed
    files; the oracle is the equivalent batch filter — streaming a
    historical dataset through the sink must land exactly the batch
    answer. Stateless ⇒ no watermark needed and append mode is natural;
    run-to-run the checkpoint prevents double-processing."""
    import os

    from spark_ml_spark.io.sources import _CACHE_DIR, fixture_key

    # content-fingerprinted key (ADVICE r2): a regenerated events fixture
    # must invalidate both the committed files and the offset checkpoint,
    # else the re-read serves the previous round's filtered rows
    key = fixture_key(sf_dir, "events")
    out = os.path.join(_CACHE_DIR, f"stream_parquet_{key}")
    ckpt = os.path.join(_CACHE_DIR, f"stream_parquet_ckpt_{key}")
    stream = _read_events_stream(spark, sf_dir)
    filtered = (
        stream.filter((F.col("event_type") == "purchase") & (F.col("value") > 50))
        .select("event_id", "user_id", F.round("value", 4).alias("value"))
    )
    q = (
        filtered.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


@query("q_stream_sliding_window", oracle=_exact_sql("""
WITH s AS (
  SELECT CAST(FLOOR(epoch(ts) / 1800) AS BIGINT) * 1800 AS base,
         event_type, value
  FROM events
), w AS (
  SELECT unnest([base, base - 1800]) AS win_start, event_type, value FROM s
)
SELECT win_start,
       win_start + 3600     AS win_end,
       event_type,
       count(*)             AS n_events,
       ROUND(sum(value), 4) AS sum_value
FROM w GROUP BY win_start, event_type
"""))
def q_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding-window aggregation (1 h width / 30 min slide,
    watermarked): every event updates width/slide = 2 window states —
    Structured Streaming's overlapping-window state management, emitted
    with epoch-second bounds so the same arithmetic oracle as the batch
    twin (``q_sliding_window``) applies. Streaming replay of historical
    data must equal the batch plan — the unified-model guarantee."""
    stream = _read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(exact_sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("window.start").alias("win_start"),
            F.unix_timestamp("window.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return _drain(agg, "complete")


@query("q_stream_foreachbatch_upsert", oracle=_exact_sql("""
SELECT user_id,
       count(*)             AS n_events,
       ROUND(sum(value), 2) AS total_value
FROM events
GROUP BY user_id
"""))
def q_stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``foreachBatch`` MERGE-INTO-STATE — the production pattern for
    sinks without native streaming upsert (JDBC, Delta MERGE, key-value
    stores): each microbatch aggregates to mergeable partials
    (count, sum) and merges into the running state table keyed on
    user_id; the final state must equal the batch aggregate over all
    history, which is exactly what the oracle checks (the same
    partial-merge algebra as ``q_incremental_agg``, driven by the
    streaming engine).

    The input is re-laid as 8 files streamed 2-per-trigger so the merge
    loop really executes over 4 microbatches (a single-file source would
    collapse to one batch and prove nothing). State lineage is truncated
    per batch with ``localCheckpoint`` — without it the plan doubles
    every batch, the classic unbounded-lineage failure of naive merge
    loops. At scale the state table lives in the sink (MERGE ON
    user_id); per-batch work is |batch| + |touched keys|, not
    |history|."""
    import os
    import shutil

    from spark_ml_spark.io.sources import _CACHE_DIR, fixture_key, load

    # content-fingerprinted key (ADVICE r2): a regenerated events fixture
    # must invalidate the re-laid 8-file source, else the stream replays
    # stale parquet against a fresh oracle — r3's fixture regeneration
    # did exactly that
    key = fixture_key(sf_dir, "events")
    src = os.path.join(_CACHE_DIR, f"stream_upsert_src_{key}")
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        load(spark, sf_dir, "events").select("user_id", "value").repartition(
            8
        ).write.mode("overwrite").parquet(src)

    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
    )
    # state carries the running sum as DECIMAL so the batch-by-batch
    # merge is exact — the final state must equal the all-history batch
    # aggregate INCLUDING its ulps (that equality IS the oracle check)
    empty = spark.createDataFrame(
        [], f"user_id long, n_events long, sum_value {DECIMAL_TYPE}"
    )
    state = {"df": empty, "batches": 0}

    def merge(batch: DataFrame, epoch_id: int) -> None:
        agg = batch.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DECIMAL_TYPE)).alias("sum_value"),
        )
        merged = (
            state["df"].unionByName(agg)
            .groupBy("user_id")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").cast(DECIMAL_TYPE).alias("sum_value"),
            )
        )
        state["df"] = merged.localCheckpoint(eager=True)
        state["batches"] += 1

    # deterministic checkpoint dir per source-key, cleared before each
    # run: uuid-suffixed dirs accumulated unboundedly across runs
    # (ADVICE r2), and a checkpoint can't be resumed by a different
    # query anyway
    ckpt = os.path.join(_CACHE_DIR, f"stream_upsert_ckpt_{key}")
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert state["batches"] >= 2, "expected multiple microbatches"
    return state["df"].select(
        "user_id", "n_events",
        F.round(F.col("sum_value").cast("double"), 2).alias("total_value"),
    )


@query("q_stream_session_window", oracle="""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM g
)
SELECT user_id,
       CAST(epoch_us(min(ts)) AS BIGINT)              AS sess_start_us,
       CAST(epoch_us(max(ts)) + 1800000000 AS BIGINT) AS sess_end_us,
       count(*)                                       AS n_events
FROM s GROUP BY user_id, sess_id
""")
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` streaming sessionization — the JVM
    state-store scale path beside the ``applyInPandasWithState`` twin
    (``q_stream_stateful_sessions``): events of a user merge into one
    session while consecutive gaps are under 30 minutes; the window end
    is last-event + gap. All state management (merge, expiry via
    watermark) is Spark-internal — no Python in the loop, which is why
    this form is the 100 TB default and the Pandas-state form is the
    custom-logic escape hatch.

    Session bounds are emitted as exact epoch MICROSECOND integers
    (the fixture's ts has micros; unix_micros ↔ epoch_us match
    bit-for-bit where whole-second epoch casts would round vs truncate
    differently across engines).

    The oracle is the batch gap-islands formula. Boundary semantics:
    Spark merges an event into a session only while strictly inside
    (start, last + gap) — a gap of EXACTLY 30 min starts a new session —
    so the island break condition is >= gap, not > gap."""
    stream = _read_events_stream(spark, sf_dir)
    # session-window aggregation supports append (watermark-finalized
    # sessions only) or complete; complete emits every session on this
    # finite replay, matching the batch oracle over ALL history
    return _drain(session_window_agg(stream), "complete")


def session_window_agg(stream: DataFrame) -> DataFrame:
    """The session-window aggregation pipeline of
    :func:`q_stream_session_window`, factored out so
    ``tests/test_streaming_multibatch.py`` can start it independently and
    assert the JVM session-state-store nodes are in the PHYSICAL plan —
    pinning the scale path (no Python in the state loop) this operator
    exists to demonstrate."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("sess_start_us"),
            F.unix_micros("session_window.end").alias("sess_end_us"),
            "n_events",
        )
    )


def _stream_hll_oracle() -> str:
    from spark_ml_spark.operators.sketches import _hex_int_sql, _hll_rho_sql

    rho = _hll_rho_sql("substr(h, 3, 10)")
    return f"""
WITH d AS (
  SELECT event_type,
         md5('hll1:' || CAST(user_id AS VARCHAR) || ':'
             || CAST(CAST(ts AS DATE) AS VARCHAR)) AS h
  FROM events
)
SELECT event_type,
       CAST({_hex_int_sql('h', 1, 2)} AS BIGINT) AS bucket,
       CAST(max({rho}) AS BIGINT) AS r
FROM d GROUP BY 1, 2
"""


@query("q_stream_hll", oracle=_stream_hll_oracle())
def q_stream_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming maintenance of the portable HyperLogLog register file
    (``q_hll_distinct``'s sketch) — readStream → per-(type, bucket)
    streaming MAX → complete-mode sink. This is WHY sketches power
    streaming cardinality: the register update is idempotent
    (duplicates and replays change nothing — max(r, r) = r), so the
    stream needs NO dropDuplicates pass or per-entity state, just
    ≤ |types|·m BIGINT registers of state regardless of stream length;
    any micro-batch boundary yields the same registers as the batch
    build, which is exactly what the oracle checks (same register SQL
    as the batch op's ``reg`` stage). At 100 TB/day the register table
    checkpoints tiny and merges across streams by the same MAX."""
    from spark_ml_spark.operators.sketches import _hll_rho_sql

    stream = _read_events_stream(spark, sf_dir)
    d = stream.select(
        "event_type",
        F.md5(
            F.concat_ws(
                ":",
                F.lit("hll1"),
                F.col("user_id").cast("string"),
                F.to_date("ts").cast("string"),
            )
        ).alias("h"),
    )
    reg = d.groupBy(
        "event_type",
        F.conv(F.substring("h", 1, 2), 16, 10).cast("bigint").alias("bucket"),
    ).agg(F.max(F.expr(_hll_rho_sql("substr(h, 3, 10)"))).cast("bigint").alias("r"))
    return _drain(reg, "complete")


@query("q_stream_static_join", oracle=_exact_sql("""
SELECT c.c_mktsegment                           AS mktsegment,
       CAST(FLOOR(epoch(e.ts) / 3600) AS BIGINT) AS hour_bucket,
       count(*)                                  AS n_events,
       ROUND(sum(e.value), 4)                    AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""))
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming enrichment: stream-STATIC join — the event stream joins
    a batch-loaded dimension (customer) row-by-row as micro-batches
    arrive, then aggregates per (market segment, hour). The canonical
    "enrich the firehose with reference data" pattern: unlike the
    stream-stream join (``q_stream_stream_join``) this keeps ZERO join
    state — the static side is simply available to every micro-batch's
    plan, re-broadcast from its current snapshot, so watermarks are
    only needed for the aggregation, not the join.

    Scale shape: the dimension is broadcast (a per-executor hash map at
    1000 executors — dimension size, not stream size, is the only
    bound); each micro-batch is a map-side hash-join probe with NO
    shuffle before the windowed aggregation's state store. Exactness:
    value sums accumulate in DECIMAL via ``exact_sum`` (same discipline
    as ``q_stream_tumbling``) and the result must be byte-identical to
    the batch join the oracle runs."""
    from spark_ml_spark.io.sources import load

    stream = _read_events_stream(spark, sf_dir)
    dim = F.broadcast(
        load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    agg = (
        stream.join(dim, stream.user_id == dim.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("mktsegment"),
            F.floor(F.unix_timestamp("ts") / 3600).alias("hour_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(exact_sum("value"), 4).alias("sum_value"),
        )
    )
    return _drain(agg, "complete")


@query("q_stream_windowed_topk", oracle="""
WITH agg AS (
  SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
         event_type, CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY hour_bucket
                               ORDER BY n_events DESC, event_type) AS rn
  FROM agg
)
SELECT hour_bucket, event_type AS top_type, n_events
FROM r WHERE rn = 1 ORDER BY hour_bucket
""")
def q_stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-window leader: tumbling-hour event-type counts
    (stateful streaming hash aggregation, complete mode), then the
    top-1 type per hour with a deterministic (count desc, type) tie-
    break. The rank step runs as a BATCH window over the drained sink
    — the production shape ("aggregate in the stream, rank in the
    serving layer") because per-window top-k inside a streaming query
    would need sorting within an unfinished aggregation state.

    Scale shape: the only corpus-sized stage is the streaming hash
    aggregation (state = |hours|×|types| rows); the rank window
    partitions by hour over the tiny aggregate table."""
    from pyspark.sql import Window

    stream = _read_events_stream(spark, sf_dir)
    agg = stream.groupBy(
        F.floor(F.unix_timestamp("ts") / 3600).cast("bigint")
        .alias("hour_bucket"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    sink = _drain(agg, "complete")
    w = Window.partitionBy("hour_bucket").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("hour_bucket", F.col("event_type").alias("top_type"),
                "n_events")
        .orderBy("hour_bucket")
    )
