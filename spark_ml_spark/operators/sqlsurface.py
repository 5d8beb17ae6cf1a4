"""Round-5 wave-54: SQL-dialect surface — PIVOT clause, LATERAL VIEW
generators, GROUP BY ALL.

A user migrating warehouse SQL runs these CLAUSES verbatim; the engine
must accept the syntax, not just express the semantics through the
DataFrame API. The DataFrame twins already exist (``q_pivot`` uses
``DataFrame.pivot``, the corpus tokenizers use ``F.explode``,
``q_groupby_agg`` lists its keys); this wave pins the SQL-frontend
spelling of each against engine-neutral oracle formulations.

``q_sql_pivot`` — the ANSI/Spark ``PIVOT (agg FOR col IN (...))``
table clause with an explicit value vocabulary (the bounded-width
discipline ``q_pivot`` documents: a pivot's column set must be a
declared constant at 100 TB, never discovered by a pre-scan).
``q_sql_lateral_explode`` — Hive-style ``LATERAL VIEW explode()``
correlated generator, the SQL spelling of flat-map tokenization.
``q_sql_groupby_all`` — ``GROUP BY ALL`` dimension inference (Spark
4 / DuckDB both support it; the oracle runs the IDENTICAL text, the
``_RECURSIVE_SQL`` discipline).

The reference has no SQL frontend at all (``Data_transform.py``
registers no temp views and calls no ``spark.sql``); the whole SQL
family is a north-star extension anchored by the 22 TPC-H shapes in
``sql_frontend.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_ml_spark.operators.sql_frontend import register_views
from spark_ml_spark.registry import query

#: identical text on Spark and DuckDB — GROUP BY ALL infers the three
#: non-aggregate dimensions; sums stay in exact integer cents
_GROUPBY_ALL_SQL = """
SELECT l_returnflag,
       l_linestatus,
       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS base_cents
FROM lineitem
GROUP BY ALL
ORDER BY l_returnflag, l_linestatus, ship_year
"""


@query("q_sql_pivot", oracle=r"""
SELECT l_returnflag,
       CAST(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN q END), 0)
            AS BIGINT) AS o,
       CAST(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN q END), 0)
            AS BIGINT) AS f,
       CAST(coalesce(sum(CASE WHEN l_linestatus = 'P' THEN q END), 0)
            AS BIGINT) AS p
FROM (SELECT l_returnflag, l_linestatus,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS q
      FROM lineitem)
GROUP BY l_returnflag
ORDER BY l_returnflag
""")
def q_sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``PIVOT`` table clause: quantity totals rotated to one
    column per line status, with the status vocabulary DECLARED in the
    ``IN`` list. The oracle states the engine-neutral conditional-
    aggregation form — same result, so the check pins the clause's
    semantics rather than mirroring syntax. Cells whose (flag, status)
    pair never occurs surface as 0 via an outer COALESCE on both sides
    (an all-NULL pivot column has no stable cross-engine dtype).

    Scale shape: Catalyst rewrites PIVOT to exactly the oracle's
    CASE-sum aggregate — one map-side-combined hash aggregation wide as
    the declared vocabulary; no second scan, no distinct-values
    pre-pass (the q_pivot A3 discipline). Absent statuses cost a NULL
    column, never a shuffle."""
    register_views(spark, sf_dir)
    return spark.sql("""
        SELECT l_returnflag,
               CAST(coalesce(o, 0) AS BIGINT) AS o,
               CAST(coalesce(f, 0) AS BIGINT) AS f,
               CAST(coalesce(p, 0) AS BIGINT) AS p
        FROM (
          SELECT l_returnflag, l_linestatus,
                 CAST(floor(l_quantity + 0.5) AS BIGINT) AS q
          FROM lineitem
        )
        PIVOT (sum(q) FOR l_linestatus IN ('O' AS o, 'F' AS f, 'P' AS p))
        ORDER BY l_returnflag
    """)


@query("q_sql_lateral_explode", oracle=r"""
WITH toks AS (
  SELECT lang,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
)
SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
FROM toks
WHERE length(tok) >= 3
GROUP BY lang, tok
ORDER BY n DESC, lang, tok
LIMIT 25
""")
def q_sql_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-compatible ``LATERAL VIEW explode()``: the SQL spelling of
    correlated flat-map — tokenize every document in place and profile
    the top (lang, token) pairs. The oracle is DuckDB's ``unnest``
    formulation of the same generator.

    Scale shape: the generator is a map-only ``Generate`` node fused
    into the scan stage (no join, no ``BatchEvalPython`` — explode is
    a JVM generator); the only shuffle is the (lang, token) hash
    aggregation, map-side combined; the cut is
    TakeOrderedAndProject."""
    register_views(spark, sf_dir)
    return spark.sql(r"""
        SELECT lang, tok, CAST(count(*) AS BIGINT) AS n
        FROM documents
        LATERAL VIEW explode(split(trim(lower(text)), '\\s+')) t AS tok
        WHERE length(tok) >= 3
        GROUP BY lang, tok
        ORDER BY n DESC, lang, tok
        LIMIT 25
    """)


@query("q_sql_groupby_all", oracle=_GROUPBY_ALL_SQL)
def q_sql_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` — the engine infers the grouping key as every
    non-aggregate select item (three dimensions here), the
    typo-proof spelling analysts reach for first in modern warehouses.
    Runs the IDENTICAL SQL text on Spark and DuckDB (the
    ``q_sql_recursive`` discipline), so the check pins that both
    engines infer the same key set.

    Scale shape: resolves at ANALYSIS time to an ordinary three-key
    hash aggregate — map-side combined, one shuffle on the inferred
    key, revenue in exact integer cents; the clause costs nothing
    physical."""
    register_views(spark, sf_dir)
    return spark.sql(_GROUPBY_ALL_SQL)
