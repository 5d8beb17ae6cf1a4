"""SparkSession factory with scale-oriented defaults.

The reference hardcodes ``local[2]`` / 4 GB / 64 min-partitions
(``Data_transform.py:19-21,32``). Here the session is configured for
Catalyst + AQE: adaptive shuffle-partition coalescing, skew-join handling,
broadcast-join autodetection, and Arrow for any Python-side batch exchange.
On a real cluster only ``master`` and memory sizing change — the query code
is identical. (One exception, in the measurement harness rather than the
query code: ``bench.py``'s untimed ``System.gc()`` pressure resets reach
executors only because local mode puts driver and executors in one JVM —
see the local-mode note there; ADVICE r9.)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "spark_ml_spark", cpus: str | int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` then ``os.cpu_count()``.
    ``spark.sql.shuffle.partitions`` defaults to the core count — the
    right size for local mode; on a cluster AQE coalescing makes the
    initial number mostly irrelevant.
    """
    if cpus is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS") or (os.cpu_count() or 4)
    cpus = str(cpus)
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # unannotated/naive parquet timestamps (timestamp[us] without UTC
        # adjustment — how the driver's fixtures store ts columns as of r3)
        # must read as TIMESTAMP (LTZ): with the session pinned to UTC the
        # epoch math then matches DuckDB's epoch() over its naive TIMESTAMP.
        # The NTZ default would break unix_micros()/watermark arithmetic.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # Long shared sessions (the 346-query bench, the 366-query driver
        # mirror, a real long-running cluster driver) accumulate
        # weakly-referenced broadcast/shuffle/RDD state that the
        # ContextCleaner only reclaims when a GC actually runs — and with
        # a 16g mostly-idle heap, full GCs almost never fire on their
        # own (default periodicGC is 30min, longer than a whole bench
        # session). Measured r7: a fixed canary workload degraded
        # 2.75s -> 3.79s over 320 queries in one session and one
        # System.gc() restored it to 2.69s. 2min keeps sessions
        # self-healing; single-query sessions never notice it.
        .config("spark.cleaner.periodicGC.interval", "2min")
        # Whole-stage-codegen class cache (r12 optimization): the default
        # spark.sql.codegen.cache.maxEntries=100 thrashes in any
        # long-lived session that executes hundreds of DISTINCT plans
        # (this repo's 356-query bench/driver mirror, a production
        # Thrift/driver service alike): once >100 codegen units run, every
        # re-execution of an expensive-to-compile plan pays Janino again.
        # Measured sf0.1: q_weighted_quantile 2.8s warm -> 6.7s after 79
        # other plans churned the cache -> 2.8s on immediate re-run; the
        # r11 driver bench recorded the churned number (4.2-6.4s) for a
        # query whose steady-state is ~2.8s. 4096 entries covers the full
        # registered surface with headroom; the cost is retained class
        # metadata (bounded, ~MBs) — workload-sized, not box-sized
        # (override via $SPARK_GRAFT_CODEGEN_CACHE).
        .config("spark.sql.codegen.cache.maxEntries",
                os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "4096"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
