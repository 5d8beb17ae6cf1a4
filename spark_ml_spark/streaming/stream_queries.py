"""Structured Streaming surface (SURVEY.md §2.9 — absent in the reference,
part of the engine's target surface).

The batch twin of the streaming aggregation (``q_tumbling_window``) is
oracle-checked; the streaming execution itself is verified by running the
SAME aggregation through ``readStream`` → memory sink and handing the
driver the identical oracle SQL — streaming and batch must agree, which is
exactly Structured Streaming's unified-model guarantee.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_ml_spark.registry import query

#: explicit schema — readStream cannot infer (and inference is a full
#: extra pass at scale anyway). ``ts`` is stored as TIMESTAMP(NANOS) which
#: Spark reads as long under the nanosAsLong conf; converted after read.
EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def _read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file stream source wants a directory; glob-filter to the events
    # table (in production this is the landing directory new files arrive in)
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn(
        "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
    )


_counter = threading.local()


def _next_sink_name() -> str:
    n = getattr(_counter, "n", 0) + 1
    _counter.n = n
    return f"spark_ml_spark_stream_sink_{n}"


@query("q_stream_tumbling", oracle="""
SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
       event_type,
       count(*)             AS n_events,
       ROUND(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
""")
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
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    sink = _next_sink_name()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # materialize before the in-memory sink table goes away
    result = spark.table(sink)
    return spark.createDataFrame(result.collect(), schema=result.schema)


@query("q_stream_event_window")  # rows-only: F.window start/end are
# session-timezone-rendered timestamps; checked structurally in tests
def q_stream_event_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed aggregation with a watermark — the
    late-data-tolerant form (``withWatermark`` bounds state so the
    aggregation runs forever on an unbounded stream). Uses ``F.window``
    tumbling 1h; emitted with epoch-second window bounds."""
    stream = _read_events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("window.start").alias("win_start_epoch"),
            F.unix_timestamp("window.end").alias("win_end_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    sink = _next_sink_name()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    result = spark.table(sink)
    return spark.createDataFrame(result.collect(), schema=result.schema)
