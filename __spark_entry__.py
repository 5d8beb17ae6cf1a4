"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the ``spark_ml_spark`` package (operators registered
via ``spark_ml_spark.registry``); this module is the thin driver shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_ml_spark.registry import collect  # noqa: E402

_QUERIES, _ORACLE = collect()

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001 (SURVEY.md §7 milestone 0):
    the reference's signature pipeline — scan → project → filter →
    broadcast dim joins → group/pivot agg → L1-normalize — on the star
    schema; driver checks rows > 0."""
    return _QUERIES["q_flagship"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query;
    non-expressible ops (LSH joins, MLlib fits, engine-specific hashes)
    are omitted → driver records the weaker rows-only check."""
    return dict(_ORACLE)
