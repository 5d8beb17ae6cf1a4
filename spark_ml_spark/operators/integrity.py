"""Round-4 wave-40: data-integrity operators — malformed-ingest audit,
cross-engine table checksums, categorical mutual information.

``q_csv_malformed`` — PERMISSIVE-mode ingestion audit over a
deterministically dirtied header-less orders CSV (1/16 of rows carry an
extra unquoted field): count good/bad rows and checksum the good keys.
The oracle never parses the dirty file — the corruption mask is a pure
row-key function, so the EXPECTED partition is recomputed from the
clean parquet. This is the declarative replacement for the reference's
``arreglaComas`` row-repair loop (``Data_transform.py:44-57``): let the
reader quarantine malformed rows into ``_corrupt`` and audit them,
instead of mutating data inline.

``q_table_checksum`` — order-free content checksum per dimension/fact
table (Σ of 32-bit md5 prefixes of a canonical key string): the
replication/migration verification primitive — two engines (or two
clusters) agree iff counts AND checksums agree, no row-by-row diff.

``q_mutual_info`` — mutual information (and entropies + NMI) of
customer market segment × order priority from the exact 25-cell
contingency table — the information-theoretic companion to
``q_chisq_independence``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_ml_spark.io.sources import dirty_orders_csv_path, load
from spark_ml_spark.registry import query

_DIRTY_SCHEMA = T.StructType([
    T.StructField("o_orderkey", T.LongType()),
    T.StructField("o_custkey", T.LongType()),
    T.StructField("o_orderstatus", T.StringType()),
    T.StructField("o_totalprice", T.DoubleType()),
    T.StructField("o_orderdate", T.DateType()),
    T.StructField("o_orderpriority", T.StringType()),
    T.StructField("_corrupt", T.StringType()),
])


@query("q_csv_malformed", oracle=r"""
WITH m AS (
  SELECT o_orderkey,
         CASE WHEN substring(md5('dirty:' || CAST(o_orderkey AS VARCHAR)),
                             1, 1) = '0' THEN 1 ELSE 0 END AS bad
  FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(bad) AS BIGINT) AS n_bad,
       CAST(count(*) - sum(bad) AS BIGINT) AS n_good,
       CAST(sum(CASE WHEN bad = 0 THEN o_orderkey ELSE 0 END) AS BIGINT)
         AS good_key_sum
FROM m
""")
def q_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-CSV quarantine audit: read the deterministically
    dirtied orders CSV in PERMISSIVE mode with a ``_corrupt`` capture
    column; rows with the injected extra field land in quarantine
    (NULL typed fields + raw line preserved), clean rows parse fully.
    Reported: totals, quarantine count, and the exact key-sum of the
    GOOD rows — which the oracle recomputes from the clean parquet via
    the corruption mask, proving the reader recovered every
    uncorrupted row bit-exactly and lost none to the dirty ones.

    Spark-first subtlety: a direct ``spark.read.csv`` with a pruned
    aggregate does NOT detect the extra field — CSV column pruning
    parses only the referenced columns, so token-count mismatches go
    unseen (measured: n_bad = 0). The robust shape is a TEXT scan +
    ``from_csv`` into a struct carrying the corrupt column: the whole
    line is always parsed, detection cannot be pruned away, and the
    scan stays line-splittable.

    Scale shape: one header-less text scan (the parallel-friendly
    landing format), in-row ``from_csv``, one map-side-combined
    single-row aggregate."""
    path = dirty_orders_csv_path(spark, sf_dir)
    ddl = ("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
           "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING, "
           "_corrupt STRING")
    r = spark.read.text(path).select(
        F.from_csv(
            "value", ddl,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ).alias("r")
    )
    return r.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum(F.col("r._corrupt").isNotNull().cast("int"))
        .cast("bigint").alias("n_bad"),
        F.sum(F.col("r._corrupt").isNull().cast("int"))
        .cast("bigint").alias("n_good"),
        F.sum(
            F.when(F.col("r._corrupt").isNull(), F.col("r.o_orderkey"))
            .otherwise(0)
        ).cast("bigint").alias("good_key_sum"),
    )


#: (table, canonical key-string SQL both engines state identically)
_CHECKSUM_SPECS = (
    ("region", "CAST(r_regionkey AS VARCHAR) || '|' || r_name"),
    ("nation", "CAST(n_nationkey AS VARCHAR) || '|' || n_name"),
    ("supplier", "CAST(s_suppkey AS VARCHAR) || '|' || CAST(s_nationkey AS VARCHAR)"),
    ("part", "CAST(p_partkey AS VARCHAR) || '|' || p_brand"),
    ("customer", "CAST(c_custkey AS VARCHAR) || '|' || c_mktsegment"),
    ("orders", "CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus"),
)

_HEX = "0123456789abcdef"


def _hex8_sql(expr: str) -> str:
    """DuckDB integer value of the first 8 md5 hex chars of ``expr``."""
    terms = [
        f"(strpos('{_HEX}', substr(md5({expr}), {1 + i}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def _checksum_oracle() -> str:
    parts = [
        f"SELECT '{t}' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,"
        f" CAST(sum({_hex8_sql(k)}) AS BIGINT) AS checksum FROM {t}"
        for t, k in _CHECKSUM_SPECS
    ]
    return " UNION ALL ".join(parts) + " ORDER BY table_name"


@query("q_table_checksum", oracle=_checksum_oracle())
def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-free per-table content checksum: Σ over rows of the 32-bit
    md5 prefix of a canonical ``key|attribute`` string, plus the row
    count. Two copies of a table agree iff (n_rows, checksum) agree —
    the O(1)-output replication/migration verifier that replaces
    row-by-row diffing (the same mergeable-summary discipline as the
    sketches family: per-partition partial sums combine exactly).

    Scale shape: one map-side-combined single-row aggregate PER TABLE
    (six scans, each reading only the canonical columns); the union is
    six 1-row DataFrames. Checksum strings avoid floats and timestamps
    so no engine-formatting divergence can leak in."""
    outs = []
    for t, k in _CHECKSUM_SPECS:
        spark_k = k.replace("AS VARCHAR", "AS STRING")
        h = F.conv(
            F.substring(F.md5(F.expr(spark_k)), 1, 8), 16, 10
        ).cast("bigint")
        outs.append(
            load(spark, sf_dir, t).agg(
                F.lit(t).alias("table_name"),
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.sum(h).cast("bigint").alias("checksum"),
            )
        )
    df = outs[0]
    for o in outs[1:]:
        df = df.unionAll(o)
    return df.orderBy("table_name")


@query("q_mutual_info", oracle=r"""
WITH cells AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
         CAST(count(*) AS BIGINT) AS n_ij
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
rt AS (SELECT seg, CAST(sum(n_ij) AS BIGINT) AS n_i FROM cells GROUP BY seg),
ct AS (SELECT pri, CAST(sum(n_ij) AS BIGINT) AS n_j FROM cells GROUP BY pri),
n AS (SELECT CAST(sum(n_ij) AS BIGINT) AS n_tot FROM cells),
terms AS (
  SELECT sum((CAST(n_ij AS DOUBLE) / n_tot)
             * ln(CAST(n_tot AS DOUBLE) * n_ij / (CAST(n_i AS DOUBLE) * n_j)))
           AS mi,
         sum(CASE WHEN pri = (SELECT min(pri) FROM cells)
                  THEN -(CAST(n_i AS DOUBLE) / n_tot)
                       * ln(CAST(n_i AS DOUBLE) / n_tot) ELSE 0 END) AS h_seg,
         sum(CASE WHEN seg = (SELECT min(seg) FROM cells)
                  THEN -(CAST(n_j AS DOUBLE) / n_tot)
                       * ln(CAST(n_j AS DOUBLE) / n_tot) ELSE 0 END) AS h_pri
  FROM cells JOIN rt USING (seg) JOIN ct USING (pri), n
)
SELECT round(mi, 4) AS mi_nats,
       round(h_seg, 4) AS h_seg,
       round(h_pri, 4) AS h_pri,
       round(mi / sqrt(h_seg * h_pri), 4) AS nmi
FROM terms
""")
def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information of market segment × order priority in nats,
    with the marginal entropies and the geometric-mean-normalized NMI —
    the dependence-strength companion to ``q_chisq_independence``
    (χ² answers "is there dependence?", MI answers "how many nats does
    one label tell you about the other?" — the feature-selection
    ranking signal).

    Engine exactness: all probabilities come from the EXACT 25-cell
    BIGINT contingency table; each engine evaluates the same ln() over
    the same integer ratios and sums 25 terms — float noise is
    ~1e-16-relative, far inside round(…,4). Marginal-entropy terms are
    counted once by anchoring to the lexicographic min of the other
    axis. Scale shape: identical to q_chisq_independence — broadcast
    star join, vocabulary-sized everything after the first aggregate."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderpriority")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ij"))
    )
    rt = cells.groupBy("seg").agg(F.sum("n_ij").cast("bigint").alias("n_i"))
    ct = cells.groupBy("pri").agg(F.sum("n_ij").cast("bigint").alias("n_j"))
    n = cells.agg(F.sum("n_ij").cast("bigint").alias("n_tot"))
    min_pri = cells.agg(F.min("pri").alias("min_pri"))
    min_seg = cells.agg(F.min("seg").alias("min_seg"))
    j = (
        cells.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "pri")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(min_pri))
        .crossJoin(F.broadcast(min_seg))
    )
    p_ij = F.col("n_ij").cast("double") / F.col("n_tot")
    mi_term = p_ij * F.log(
        F.col("n_tot").cast("double") * F.col("n_ij")
        / (F.col("n_i").cast("double") * F.col("n_j"))
    )
    h_seg_term = F.when(
        F.col("pri") == F.col("min_pri"),
        -(F.col("n_i").cast("double") / F.col("n_tot"))
        * F.log(F.col("n_i").cast("double") / F.col("n_tot")),
    ).otherwise(0.0)
    h_pri_term = F.when(
        F.col("seg") == F.col("min_seg"),
        -(F.col("n_j").cast("double") / F.col("n_tot"))
        * F.log(F.col("n_j").cast("double") / F.col("n_tot")),
    ).otherwise(0.0)
    terms = j.agg(
        F.sum(mi_term).alias("mi"),
        F.sum(h_seg_term).alias("h_seg"),
        F.sum(h_pri_term).alias("h_pri"),
    )
    return terms.select(
        F.round("mi", 4).alias("mi_nats"),
        F.round("h_seg", 4).alias("h_seg"),
        F.round("h_pri", 4).alias("h_pri"),
        F.round(
            F.col("mi") / F.sqrt(F.col("h_seg") * F.col("h_pri")), 4
        ).alias("nmi"),
    )


@query("q_duplicate_payments", oracle=r"""
WITH k AS (
  SELECT o_custkey,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
         CAST(o_orderdate AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2, 3
),
dups AS (SELECT * FROM k WHERE n > 1)
SELECT CAST((SELECT count(*) FROM dups) AS BIGINT) AS n_dup_groups,
       CAST(coalesce((SELECT sum(n) FROM dups), 0) AS BIGINT)
         AS n_dup_orders,
       CAST(coalesce((SELECT sum((n - 1) * cents) FROM dups), 0) AS BIGINT)
         AS exposure_cents
""")
def q_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment detection: orders sharing (customer, exact
    cent amount, day) — the classic accounts-payable audit. Reported:
    duplicate groups, member orders, and the EXPOSURE (cents that would
    be recovered if every duplicate beyond the first per group were
    reversed). Exact cent quantization makes the composite key
    engine-portable; no float equality anywhere.

    Scale shape: one map-side-combined group-by on the composite key
    (uniform md5-like distribution — customer×amount×day), a filtered
    ≤dup-sized aggregate after it."""
    k = (
        load(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
            .cast("bigint").alias("cents"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    dups = k.where(F.col("n") > 1)
    return dups.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_groups"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_dup_orders"),
        F.coalesce(F.sum((F.col("n") - 1) * F.col("cents")), F.lit(0))
        .cast("bigint").alias("exposure_cents"),
    )
