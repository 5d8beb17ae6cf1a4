"""Query registry: the single source of truth for the driver contract.

Operator modules register each query with the :func:`query` decorator —
optionally with the equivalent ANSI SQL the DuckDB oracle runs at sf0.01
(driver contract in ``__spark_entry__.py``). Queries without oracle SQL get
the weaker rows-only check (non-SQL-expressible ops: LSH joins, MLlib fits,
streaming).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

#: modules that register queries on import
_OPERATOR_MODULES = (
    "spark_ml_spark.operators.relational",
    "spark_ml_spark.operators.ml",
    "spark_ml_spark.operators.dedup",
    "spark_ml_spark.operators.similarity",
    "spark_ml_spark.operators.textops",
    "spark_ml_spark.operators.pipeline",
    "spark_ml_spark.operators.multimodal",
    "spark_ml_spark.operators.sql_frontend",
    "spark_ml_spark.streaming.stream_queries",
)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn
    return deco


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """Import every operator module (triggering registration) and return
    the (queries, oracle_sql) dicts the driver consumes."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return QUERIES, ORACLE
