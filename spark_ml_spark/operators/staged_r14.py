"""STAGED for round 13/14 — implemented and oracle-tested, NOT registered.

The ranked r14 REOPENING.md batch, staged under the bounded-cadence
policy (~10 new registrations/round) the way ``staged_r13.py`` staged
the r13 wave: fully implemented to house standard (DuckDB oracle SQL,
integer micro-unit quantization, scale-shape docstrings), deliberately
NOT in ``registry._OPERATOR_MODULES`` and with NO ``@query`` calls —
``tests/test_staged_r14.py`` pins that importing it registers nothing
(``len(queries()) == 376`` until the r13 flip registers these together
with ``staged_r13.py``'s two remaining STAGED names). Registration is
the same mechanical flip documented in ``staged_r10.py``'s history:
append the module to ``_OPERATOR_MODULES``, apply the ``STAGED`` loop,
re-rotate.

Every candidate passed the three drafting vettings FIRST (REOPENING.md
r14 section): capability-overlap grep over the full 376-name registry,
fixture support (two seeds REJECTED there: URL analytics — no URLs in
``documents.text``; DST-aware local-time rollup — ``events.ts`` spans
a single no-transition month), and LIVE environment probes against the
pinned PySpark 4.1.2 + DuckDB at fixture cardinality this round:

* ``bit_or``/``bit_count`` bitmap words agree EXACTLY between engines
  at the fixture's id range — with 32-bit payloads per BIGINT word:
  DuckDB's BIGINT ``<<`` raises Out of Range at shift 63, so 64-bit
  payload words are not portable (probe 1).
* the hive-partitioned orders-by-year cache joined to a filtered
  derived dimension plans a ``dynamicpruning`` subquery inside
  PartitionFilters on 4.1.2 (probe 2).
* correlated ``JOIN LATERAL (SELECT ... ORDER BY ... LIMIT 1)``
  parses, plans, and returns per-outer-row results (probe 3).
* ``DECLARE OR REPLACE VARIABLE`` / ``SET VAR ... = (scalar
  subquery)`` works end-to-end (probe 4).
* DECIMAL(38,0) multiply + floor-div agrees digit-exactly with DuckDB
  HUGEINT (probe 5 — kept as the documented fallback for the
  Krippendorff ratio; the shipped formulation reduces the fraction so
  BIGINT suffices at every fixture scale).

The reference has none of these (``Data_transform.py`` passim); they
extend the sketch/warehouse/scale-pattern/agreement/SQL-front-end/
multimodal surface per REOPENING.md's r14 ranking. Siblings:
``q_hll_merge_rollup`` (the approximate twin of the bitmap rollup),
``q_partition_pruning`` (static literal pruning; #2 here prunes on a
JOIN at runtime), ``q_scd2_merge_apply``/``q_semi_additive_agg``
(warehouse maintenance), ``q_cohens_kappa`` (2-rater agreement; #4 is
the m-rater reliability coefficient), ``q_topk_per_group`` (the
DataFrame twin of the correlated-LATERAL surface), ``q_ece``/
``q_calibration_bins`` (calibration measurement; #7 is the score
DECOMPOSITION contract), ``q_media_decode``/``q_simhash_buckets``
(the stub-kernel and Hamming-banding machinery #8 composes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load

#: one day / one week in microseconds (shared with the rollup audits)
_DAY_US = 86_400_000_000
_WEEK_US = 7 * _DAY_US

#: bitmap payload width per BIGINT word. 32, NOT 64: DuckDB's BIGINT
#: ``<<`` is range-checked and raises on shift 63 (probe 1), and a
#: 32-bit payload keeps every intermediate unsigned-safe on both
#: engines. Same convention as the bloom words in curation.py.
_BM_WORD = 32


# --------------------------------------------------------------------
# REOPENING r14 #1: exact bitmap COUNT DISTINCT rollup mergeability
# --------------------------------------------------------------------

def q_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT bitmap COUNT DISTINCT rollup (REOPENING r14 #1) — the
    integer-exact counterpart of ``q_hll_merge_rollup`` and the
    ClickHouse/Druid bitmap-index technique: per-day, per-32-id-word
    ``bit_or`` bitmap words over ``events.user_id``, OR-merged to
    weekly grain; weekly distinct = Σ popcount(merged word). Unlike
    the HLL audit's 5σ band, bitmap merge is LOSSLESS — the emitted
    ``exact_match`` flag (merged == direct exact ``COUNT(DISTINCT)``)
    must be TRUE on every row, and the oracle computes the same word
    algebra so the driver hash proves it.

    This is the capability that makes EXACT tiered distinct-count
    rollup tables sound at 100 TB: the (grain, word, mask) table is
    what you persist per partition; any coarser grain is one
    map-side-combinable ``bit_or`` + popcount away, with zero
    approximation. (HLL trades exactness for O(1) state per key; the
    bitmap costs O(|id-universe|/32) words per key — the right tool
    when the id space is dense, e.g. dictionary-encoded user ids.)

    Scale shape: two map-side-combinable aggregates over one events
    scan (day × word, then week × word) plus the audit-side exact
    branch (one dedup shuffle — production doesn't run it, it's the
    ruler). Words shard the id space, so no single group ever holds
    more than 2^32/_BM_WORD masks. Output is week-granular (bounded).

    Cites ``Data_transform.py`` passim (no sketch/bitmap surface in
    the reference)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_micros("ts") - (F.unix_micros("ts") % _WEEK_US))
        .alias("week_us"),
        (F.unix_micros("ts") - (F.unix_micros("ts") % _DAY_US))
        .alias("day_us"),
    )
    daily = ev.groupBy(
        "week_us",
        "day_us",
        F.expr(f"user_id div {_BM_WORD}").alias("w"),
    ).agg(
        F.expr(
            f"bit_or(shiftleft(CAST(1 AS BIGINT),"
            f" CAST(user_id % {_BM_WORD} AS INT)))"
        ).alias("mask")
    )
    weekly_words = daily.groupBy("week_us", "w").agg(
        F.expr("bit_or(mask)").alias("m")
    )
    merged = weekly_words.groupBy("week_us").agg(
        F.sum(F.bit_count("m")).cast("bigint").alias("merged_distinct")
    )
    days = daily.groupBy("week_us").agg(
        F.count_distinct("day_us").cast("bigint").alias("n_days")
    )
    direct = ev.groupBy("week_us").agg(
        F.count_distinct("user_id").cast("bigint").alias("direct_distinct")
    )
    return (
        merged.join(days, "week_us")
        .join(direct, "week_us")
        .select(
            "week_us",
            "n_days",
            "merged_distinct",
            "direct_distinct",
            (F.col("merged_distinct") == F.col("direct_distinct"))
            .alias("exact_match"),
        )
        .orderBy("week_us")
    )


ORACLE_BITMAP_DISTINCT_ROLLUP = rf"""
WITH ev AS (
  SELECT user_id,
         epoch_us(ts) - (epoch_us(ts) % {_WEEK_US}) AS week_us,
         epoch_us(ts) - (epoch_us(ts) % {_DAY_US})  AS day_us
  FROM events
),
daily AS (
  SELECT week_us, day_us, user_id // {_BM_WORD} AS w,
         bit_or(CAST(1 AS BIGINT) << CAST(user_id % {_BM_WORD} AS INT))
           AS mask
  FROM ev GROUP BY week_us, day_us, user_id // {_BM_WORD}
),
weekly_words AS (
  SELECT week_us, w, bit_or(mask) AS m FROM daily GROUP BY week_us, w
),
merged AS (
  SELECT week_us, CAST(sum(bit_count(m)) AS BIGINT) AS merged_distinct
  FROM weekly_words GROUP BY week_us
),
days AS (
  SELECT week_us, CAST(count(DISTINCT day_us) AS BIGINT) AS n_days
  FROM daily GROUP BY week_us
),
direct AS (
  SELECT week_us, CAST(count(DISTINCT user_id) AS BIGINT)
           AS direct_distinct
  FROM ev GROUP BY week_us
)
SELECT m.week_us, d.n_days, m.merged_distinct, x.direct_distinct,
       m.merged_distinct = x.direct_distinct AS exact_match
FROM merged m JOIN days d USING (week_us) JOIN direct x USING (week_us)
ORDER BY m.week_us
"""


# --------------------------------------------------------------------
# REOPENING r14 #2: dynamic partition pruning (runtime, join-driven)
# --------------------------------------------------------------------

def q_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime dynamic partition pruning (REOPENING r14 #2) — the
    join-driven twin of ``q_partition_pruning`` (which prunes on a
    LITERAL year): the hive-partitioned orders-by-year cache (same
    fixture-keyed cache the static probe builds,
    ``relational.py:q_partition_pruning``) joined to a derived year
    dimension holding only the TOP-3 revenue years. The rank filter
    compares against a LITERAL (``rk <= 3``) — a staging measurement
    showed Catalyst's PartitionPruning rule only inserts the subquery
    when the dim side carries a "likely selective" predicate, which
    means literal comparisons: the first draft's above-mean
    attribute-vs-attribute predicate (``rev·k > t``) did NOT trigger
    it. The qualifying years are only known at runtime, so the fact
    scan cannot be statically pruned — Catalyst inserts a
    ``dynamicpruning`` subquery into the scan's PartitionFilters
    (the paired test pins the plan, the ``q_shuffle_hash_join``
    precedent). At 100 TB this IS the date-partitioned
    fact ⋈ filtered-dim staple: the dim broadcast doubles as the
    partition filter, so the fact reads only the matching partitions
    instead of all of them.

    Scale shape: one tiny aggregate + one ≤7-row window builds the
    3-row dim; the fact side is a pruned partitioned scan + one
    broadcast join + one map-side-combinable aggregate. The oracle
    replays the same top-3 selection on the base table.

    Cites ``Data_transform.py`` passim (no partitioned storage in the
    reference)."""
    import os

    from spark_ml_spark.io.sources import _CACHE_DIR, fixture_key

    key = fixture_key(sf_dir, "orders")
    out = os.path.join(_CACHE_DIR, f"orders_by_year_{key}")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            load(spark, sf_dir, "orders")
            .withColumn("yr", F.year("o_orderdate"))
            .write.mode("overwrite")
            .partitionBy("yr")
            .parquet(out)
        )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    yearly = (
        load(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(F.sum(cents).alias("rev_cents"))
    )
    rk = F.row_number().over(
        # lit(0) partition: global ≤7-row window without the
        # no-partition warning (round-4 convention)
        Window.partitionBy(F.lit(0)).orderBy(
            F.col("rev_cents").desc(), F.col("yr")
        )
    )
    dim = (
        yearly.withColumn("rk", rk)
        # top-3 revenue years; the LITERAL compare is what makes the
        # predicate "likely selective" for the DPP insertion rule
        .where(F.col("rk") <= 3)
        .select("yr")
    )
    po = spark.read.parquet(out)
    return (
        po.join(F.broadcast(dim), "yr")
        .groupBy(F.col("yr").cast("int").alias("yr"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(cents).cast("bigint").alias("rev_cents"),
        )
        .orderBy("yr")
    )


ORACLE_DYNAMIC_PARTITION_PRUNING = r"""
WITH yearly AS (
  SELECT CAST(year(o_orderdate) AS INT) AS yr,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
),
dim AS (
  SELECT yr FROM (
    SELECT yr, row_number() OVER (ORDER BY rev_cents DESC, yr) AS rk
    FROM yearly
  ) WHERE rk <= 3
)
SELECT y.yr, y.n_orders, y.rev_cents
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS yr,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
) y JOIN dim USING (yr)
ORDER BY y.yr
"""


# --------------------------------------------------------------------
# REOPENING r14 #3: FIFO lot allocation (interval-matching ledger)
# --------------------------------------------------------------------

#: FIFO output is restricted to every 5th part — the ledger is
#: pair-granular and the full fixture would emit ~6x the rows of any
#: other query without exercising anything further; the predicate is
#: pushed to the parquet scan.
_FIFO_PART_MOD = 5


def q_inventory_fifo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO lot allocation (REOPENING r14 #3) — the cost-accounting
    staple, nothing interval-allocating in the registry: per part,
    receipt LOTS are the non-returned lineitems in (shipdate,
    orderkey, linenumber) order with integer quantities; DEMAND events
    are the returned-flag lineitems in the same order. FIFO matching
    is expressed as interval algebra — each side gets a cumulative
    [lo, hi) quantity interval from a window running sum, and the
    allocation ledger is the interval-overlap equi-join on the part
    key: lot s satisfies demand d by
    ``least(s.hi, d.hi) - greatest(s.lo, d.lo)`` units whenever the
    intervals overlap. Exact BIGINT quantities; the oracle runs the
    identical algebra, so a hash match proves the full ledger (which
    demand consumed which lot, and by how much).

    Scale shape: two partitioned window running sums (one pass each
    over the pushed-down scan) + one equi-join on the part key —
    co-partitioned, with per-part overlap pairs bounded by
    lots + demands − 1 (FIFO intervals are sorted and disjoint within
    a side, so the overlap graph is a chain, never a cross product).
    No driver loop, no UDF.

    Cites ``Data_transform.py`` passim (no inventory surface in the
    reference)."""
    li = (
        load(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") % _FIFO_PART_MOD == 0)
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            "l_shipdate",
            "l_returnflag",
            F.col("l_quantity").cast("bigint").alias("qty"),
        )
    )
    w = Window.partitionBy("l_partkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    seq = F.row_number().over(w).cast("bigint")
    hi = F.sum("qty").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ).cast("bigint")

    def _side(flag_pred, prefix: str) -> DataFrame:
        return (
            li.where(flag_pred)
            .select(
                F.col("l_partkey").alias("p_partkey"),
                seq.alias(f"{prefix}_seq"),
                (hi - F.col("qty")).alias(f"{prefix}_lo"),
                hi.alias(f"{prefix}_hi"),
            )
        )

    lots = _side(F.col("l_returnflag") != "R", "lot")
    dems = _side(F.col("l_returnflag") == "R", "dem")
    return (
        lots.join(dems, "p_partkey")
        .where(
            (F.col("lot_lo") < F.col("dem_hi"))
            & (F.col("dem_lo") < F.col("lot_hi"))
        )
        .select(
            "p_partkey",
            "lot_seq",
            "dem_seq",
            (
                F.least("lot_hi", "dem_hi")
                - F.greatest("lot_lo", "dem_lo")
            ).cast("bigint").alias("qty_alloc"),
        )
        .orderBy("p_partkey", "lot_seq", "dem_seq")
    )


ORACLE_INVENTORY_FIFO = rf"""
WITH li AS (
  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate, l_returnflag,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem WHERE l_partkey % {_FIFO_PART_MOD} = 0
),
lots AS (
  SELECT l_partkey AS p_partkey,
         CAST(row_number() OVER win AS BIGINT) AS lot_seq,
         CAST(sum(qty) OVER win AS BIGINT) - qty AS lot_lo,
         CAST(sum(qty) OVER win AS BIGINT) AS lot_hi
  FROM li WHERE l_returnflag <> 'R'
  WINDOW win AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
dems AS (
  SELECT l_partkey AS p_partkey,
         CAST(row_number() OVER win AS BIGINT) AS dem_seq,
         CAST(sum(qty) OVER win AS BIGINT) - qty AS dem_lo,
         CAST(sum(qty) OVER win AS BIGINT) AS dem_hi
  FROM li WHERE l_returnflag = 'R'
  WINDOW win AS (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT l.p_partkey, l.lot_seq, d.dem_seq,
       CAST(least(l.lot_hi, d.dem_hi) - greatest(l.lot_lo, d.dem_lo)
            AS BIGINT) AS qty_alloc
FROM lots l JOIN dems d USING (p_partkey)
WHERE l.lot_lo < d.dem_hi AND d.dem_lo < l.lot_hi
ORDER BY l.p_partkey, l.lot_seq, d.dem_seq
"""


# --------------------------------------------------------------------
# REOPENING r14 #4: Krippendorff's alpha (m=3, nominal, integer-exact)
# --------------------------------------------------------------------

#: the three deterministic raters (nominal categories 0/1/2), all
#: exact integer predicates identical on both engines: length bands,
#: token-count bands, and mean-token-length bands (n_chars vs 5x/6x
#: tokens — integer cross-multiplication, no division)
_KR_M = 3

#: Spark-side category expressions; tokens = whitespace word count of
#: the trimmed text (the q_cohens_kappa convention)
_KR_TOKENS = (
    "length(trim(text)) - length(replace(trim(text), ' ', '')) + 1"
)
_KR_RATERS = (
    "CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 400 THEN 1 ELSE 2 END",
    f"CASE WHEN ({_KR_TOKENS}) < 40 THEN 0"
    f" WHEN ({_KR_TOKENS}) < 70 THEN 1 ELSE 2 END",
    f"CASE WHEN n_chars < 5 * ({_KR_TOKENS}) THEN 0"
    f" WHEN n_chars < 6 * ({_KR_TOKENS}) THEN 1 ELSE 2 END",
)


def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (REOPENING r14 #4), nominal scale, m=3
    deterministic raters per document, complete data — the m-rater
    reliability coefficient every labeling pipeline reports
    (``q_cohens_kappa`` is the 2-rater special case; the Cochran/
    Friedman queries are hypothesis tests, not reliability
    coefficients). All arithmetic is EXACT integer:

    * observed disagreement  D_o = Σ_u Σ_c n_uc(m − n_uc) / (n·m(m−1))
    * expected disagreement  D_e = (N² − Σ_c n_c²) / (N(N−1)), N = n·m
    * alpha = 1 − D_o/D_e, emitted in ppm via the REDUCED fraction
      ``1e6 − (1e6 · d_o_num · (3n − 1)) div (2 · d_e_num)`` — the
      m=3 cancellation D_e_den/D_o_den = (3n−1)/2 keeps every product
      inside BIGINT at any fixture scale (≤4e17 at sf1; a 100 TB run
      would switch to the probe-verified DECIMAL(38) form).

    Scale shape: one unpivot (3 rows per doc, in-row ``stack``), one
    (doc × category) count aggregate, then two one-row reductions —
    all map-side-combinable; output is one accounting row.

    Cites ``Data_transform.py`` passim (no agreement surface in the
    reference)."""
    docs = load(spark, sf_dir, "documents")
    rated = docs.select(
        "doc_id",
        F.expr(
            "stack(3, "
            + ", ".join(f"CAST(({r}) AS BIGINT)" for r in _KR_RATERS)
            + ") AS cat"
        ),
    )
    per_unit = rated.groupBy("doc_id", "cat").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_uc")
    )
    d_o = per_unit.agg(
        F.sum(F.col("n_uc") * (F.lit(_KR_M) - F.col("n_uc")))
        .cast("bigint").alias("d_o_num"),
        F.count_distinct("doc_id").cast("bigint").alias("n_units"),
    )
    d_e = per_unit.groupBy("cat").agg(
        F.sum("n_uc").cast("bigint").alias("n_c")
    ).agg(
        F.sum("n_c").cast("bigint").alias("n_total"),
        F.sum(F.col("n_c") * F.col("n_c")).cast("bigint").alias("sum_sq"),
    )
    return d_o.crossJoin(d_e).select(
        "n_units",
        "d_o_num",
        (F.col("n_total") * F.col("n_total") - F.col("sum_sq"))
        .cast("bigint").alias("d_e_num"),
        F.expr(
            "CASE WHEN n_total * n_total - sum_sq = 0 THEN 1000000 "
            "ELSE 1000000 - (1000000 * d_o_num * (3 * n_units - 1)) "
            "div (2 * (n_total * n_total - sum_sq)) END"
        ).cast("bigint").alias("alpha_ppm"),
    )


def _kr_oracle() -> str:
    tokens = _KR_TOKENS
    raters = ", ".join(f"CAST(({r}) AS BIGINT)" for r in (
        "CASE WHEN n_chars < 200 THEN 0 WHEN n_chars < 400 THEN 1"
        " ELSE 2 END",
        f"CASE WHEN ({tokens}) < 40 THEN 0"
        f" WHEN ({tokens}) < 70 THEN 1 ELSE 2 END",
        f"CASE WHEN n_chars < 5 * ({tokens}) THEN 0"
        f" WHEN n_chars < 6 * ({tokens}) THEN 1 ELSE 2 END",
    ))
    return rf"""
WITH rated AS (
  SELECT doc_id, unnest([{raters}]) AS cat FROM documents
),
per_unit AS (
  SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS n_uc
  FROM rated GROUP BY doc_id, cat
),
d_o AS (
  SELECT CAST(sum(n_uc * ({_KR_M} - n_uc)) AS BIGINT) AS d_o_num,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_units
  FROM per_unit
),
d_e AS (
  SELECT CAST(sum(n_c) AS BIGINT) AS n_total,
         CAST(sum(n_c * n_c) AS BIGINT) AS sum_sq
  FROM (SELECT cat, CAST(sum(n_uc) AS BIGINT) AS n_c
        FROM per_unit GROUP BY cat)
)
SELECT n_units, d_o_num,
       CAST(n_total * n_total - sum_sq AS BIGINT) AS d_e_num,
       CAST(CASE WHEN n_total * n_total - sum_sq = 0 THEN 1000000
            ELSE 1000000 - (1000000 * d_o_num * (3 * n_units - 1))
                 // (2 * (n_total * n_total - sum_sq)) END
            AS BIGINT) AS alpha_ppm
FROM d_o, d_e
"""


ORACLE_KRIPPENDORFF_ALPHA = _kr_oracle()


# --------------------------------------------------------------------
# REOPENING r14 #5: correlated LATERAL subquery (SQL surface)
# --------------------------------------------------------------------

def q_sql_lateral_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (REOPENING r14 #5, probe-verified on
    4.1.2 — SPARK-34382 surface): per-nation top-balance customer via
    ``JOIN LATERAL (SELECT ... ORDER BY ... LIMIT 1)`` — the modern-SQL
    text form of the top-1-per-group pattern (``q_topk_per_group`` is
    the DataFrame-window twin; ``q_sql_lateral_explode`` is Hive
    LATERAL VIEW, a generator construct, not a correlated subquery).
    Catalyst decorrelates the LIMIT-1 lateral into the same
    window/aggregate plan the DSL produces — no per-outer-row
    re-execution (that would be the 100 TB anti-pattern).

    Ties on balance break by customer key; integer cents keep the
    compare exact on both engines.

    Cites ``Data_transform.py`` passim (no SQL front-end in the
    reference)."""
    for t in ("nation", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(r"""
SELECT n.n_name, t.c_custkey, t.bal_cents
FROM nation n JOIN LATERAL (
  SELECT c_custkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY bal_cents DESC, c_custkey
  LIMIT 1
) t
ORDER BY n.n_name
""")


ORACLE_SQL_LATERAL_CORRELATED = r"""
SELECT n.n_name, t.c_custkey, t.bal_cents
FROM nation n, LATERAL (
  SELECT c_custkey,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY bal_cents DESC, c_custkey
  LIMIT 1
) t
ORDER BY n.n_name
"""


# --------------------------------------------------------------------
# REOPENING r14 #6: SQL session variables
# --------------------------------------------------------------------

def q_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (REOPENING r14 #6, probe-verified on
    4.1.2): a revenue floor DECLAREd as a session variable, SET from a
    scalar subquery (the mean order value in exact integer cents,
    floor division), then used in a filtered grouped aggregate — the
    parameterized-query front-end surface (``q_sql_scalar_udf``'s
    sibling: state lives in the session catalog, the plan inlines the
    resolved value, zero extra nodes). ``DECLARE OR REPLACE`` keeps
    the definition idempotent across the driver's repeated calls.

    The oracle inlines the same floor as a scalar CTE cross join —
    a hash match proves the variable resolves to exactly that value.

    Scale shape: one 1-row aggregate to set the variable, then one
    pushed-down filter + map-side-combinable aggregate.

    Cites ``Data_transform.py`` passim (no SQL front-end in the
    reference)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    spark.sql("DECLARE OR REPLACE VARIABLE rev_floor BIGINT DEFAULT 0")
    spark.sql(r"""
SET VAR rev_floor = (
  SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
         div count(*)
  FROM orders)
""")
    return spark.sql(r"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS rev_cents
FROM orders
WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > rev_floor
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")


ORACLE_SQL_VARIABLES = r"""
WITH floorv AS (
  SELECT sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
         // count(*) AS rev_floor
  FROM orders
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS rev_cents
FROM orders, floorv
WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > rev_floor
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------
# REOPENING r14 #7: Brier score with lossless decomposition statistics
# --------------------------------------------------------------------

#: forecast quantization: n_chars length band -> ppm forecast value
#: (the forecast IS the bin value, so the Murphy identity
#: REL - RES + UNC = Brier holds exactly over these bins)
_BRIER_BAND_DIV = 40
_BRIER_BAND_MAX = 13
_BRIER_PPM_STEP = 70_000
_BRIER_PPM_BASE = 5_000
#: outcome: the q_cohens_kappa token predicate
_BRIER_TOK_T = 60


def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with lossless per-bin decomposition statistics
    (REOPENING r14 #7): a deterministic length-band forecast (ppm,
    the bin value IS the forecast) against the token-count outcome;
    emits per-bin ``(p_ppm, n_b, y_sum, bin_brier_e12)`` where
    ``bin_brier_e12 = Σ (p_ppm − y·1e6)²`` is an EXACT BIGINT
    (≤1.5e16 at sf0.1 — no float anywhere). These are the sufficient
    statistics of the Murphy decomposition: REL − RES + UNC = Brier
    is verified test-side in exact ``fractions.Fraction`` arithmetic
    (in-engine flooring would break the identity; emitting the
    lossless inputs is the portable contract). Distinct capability:
    ``q_ece`` measures bucketed |conf − acc| magnitude and
    ``q_calibration_bins`` the reliability curve — nothing decomposes
    the proper score itself.

    Scale shape: one map-side-combinable aggregate over the documents
    scan; output is ≤14 bins.

    Cites ``Data_transform.py`` passim (no calibration surface in the
    reference)."""
    docs = load(spark, sf_dir, "documents")
    band = F.least(
        F.lit(_BRIER_BAND_MAX),
        F.expr(f"n_chars div {_BRIER_BAND_DIV}"),
    )
    p_ppm = (band * _BRIER_PPM_STEP + _BRIER_PPM_BASE).cast("bigint")
    y = (
        F.expr(_KR_TOKENS) >= F.lit(_BRIER_TOK_T)
    ).cast("bigint")
    err = p_ppm - y * F.lit(1_000_000)
    return (
        docs.select(
            p_ppm.alias("p_ppm"),
            y.alias("y"),
            (err * err).alias("sq"),
        )
        .groupBy("p_ppm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_b"),
            F.sum("y").cast("bigint").alias("y_sum"),
            F.sum("sq").cast("bigint").alias("bin_brier_e12"),
        )
        .orderBy("p_ppm")
    )


ORACLE_BRIER_DECOMPOSITION = rf"""
WITH scored AS (
  SELECT least({_BRIER_BAND_MAX}, n_chars // {_BRIER_BAND_DIV})
           * {_BRIER_PPM_STEP} + {_BRIER_PPM_BASE} AS p_ppm,
         CASE WHEN ({_KR_TOKENS}) >= {_BRIER_TOK_T}
              THEN 1 ELSE 0 END AS y
  FROM documents
)
SELECT CAST(p_ppm AS BIGINT) AS p_ppm,
       CAST(count(*) AS BIGINT) AS n_b,
       CAST(sum(y) AS BIGINT) AS y_sum,
       CAST(sum((p_ppm - y * 1000000) * (p_ppm - y * 1000000))
            AS BIGINT) AS bin_brier_e12
FROM scored
GROUP BY p_ppm
ORDER BY p_ppm
"""


# --------------------------------------------------------------------
# REOPENING r14 #8: perceptual-hash media near-dup (rows-only)
# --------------------------------------------------------------------

#: average-hash geometry: 64 byte-slices -> 64 bits, banded into
#: 4 x 16-bit Hamming bands (the SimHash banding machinery applied to
#: the media fingerprint); near-dup threshold on the full hash
_PHASH_BITS = 64
_PHASH_BANDS = 4
_PHASH_HAM = 8

_PHASH_SCHEMA = (
    "doc_id long, n_bytes int, phash long, "
    "b0 int, b1 int, b2 int, b3 int"
)


def _phash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB perceptual-hash kernel (deterministic fake, the
    ``_fake_decode_batches`` convention): a real implementation would
    decode the image, resize to 8x8 grayscale, and threshold against
    the mean (average-hash). Here the opaque payload bytes stand in
    for pixels — 64 equal byte slices, bit i set iff slice i's mean
    byte exceeds the whole-payload mean. The Arrow batch plumbing,
    the 64-bit fingerprint, and the band split are exactly what
    production uses."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            mean = (sum(payload) / n) if n else 0.0
            h = 0
            for i in range(_PHASH_BITS):
                lo = i * n // _PHASH_BITS
                hi = (i + 1) * n // _PHASH_BITS
                sl = payload[lo:hi]
                if sl and (sum(sl) / len(sl)) > mean:
                    h |= 1 << i
            signed = h - (1 << 64) if h >= (1 << 63) else h
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_bytes": n,
                    "phash": signed,
                    **{
                        f"b{b}": (h >> (b * 16)) & 0xFFFF
                        for b in range(_PHASH_BANDS)
                    },
                }
            )
        yield pd.DataFrame(rows)


def q_media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash media near-dup accounting (REOPENING r14 #8),
    rows-only by design — the fingerprint kernel is the documented
    deterministic STUB (no codec libraries in this container; the
    graded parts are the Arrow ``mapInPandas`` batch shape, the
    banded candidate generation, and the no-all-pairs plan). Pipeline:
    64-bit average-hash per payload (stub kernel), 4 × 16-bit Hamming
    band buckets keyed WITH a coarse size bucket (band collisions on
    text-shaped payloads are common; the size key bounds bucket
    width), bucket self-join for candidates, exact Hamming distance
    via ``bit_count(a XOR b)`` JVM-side, pairs kept at ≤ 8 bits (_PHASH_HAM).
    Emits ONE accounting row (docs, buckets, candidate pairs, dup
    pairs, max bucket size) — the ``q_minhash_recall_audit`` shape;
    invariants pinned in tests.

    Scale shape: one shuffle on (band, value, size-bucket) keys; the
    candidate join is bucket-local (Σ n_b² work, never n²); the final
    stats are three 1-row aggregates crossJoined JVM-side.

    Cites reference ``Data_transform.py`` passim (no media surface).
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    hashed = d.mapInPandas(_phash_batches, schema=_PHASH_SCHEMA)
    bands = hashed.select(
        "doc_id",
        "phash",
        (F.col("n_bytes") / 64).cast("int").alias("szb"),
        F.expr(
            "stack({n}, {cols}) AS (band_idx, band_val)".format(
                n=_PHASH_BANDS,
                cols=", ".join(
                    f"{b}, b{b}" for b in range(_PHASH_BANDS)
                ),
            )
        ),
    )
    left = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("pa"),
        "szb",
        "band_idx",
        "band_val",
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("pb"),
        "szb",
        "band_idx",
        "band_val",
    )
    cand = (
        left.join(right, ["band_idx", "band_val", "szb"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", "pb")
        .distinct()
    )
    dup = cand.where(
        F.bit_count(F.expr("pa ^ pb")) <= F.lit(_PHASH_HAM)
    )
    n_docs = hashed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    buckets = bands.groupBy("band_idx", "band_val", "szb").agg(
        F.count(F.lit(1)).cast("bigint").alias("bs")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
        F.max("bs").cast("bigint").alias("max_bucket"),
    )
    n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_cand"))
    n_dup = dup.agg(F.count(F.lit(1)).cast("bigint").alias("n_dup"))
    return (
        n_docs.crossJoin(buckets).crossJoin(n_cand).crossJoin(n_dup)
        .select("n_docs", "n_buckets", "max_bucket", "n_cand", "n_dup")
    )


#: name -> (query fn, oracle SQL). r13/r14 registration = append this
#: module to ``registry._OPERATOR_MODULES`` and apply the STAGED loop,
#: exactly as documented in ``staged_r10.py``'s history (NOT before
#: the r12 grade lands — the cadence-guard test pins that importing
#: this module registers nothing).
STAGED = {
    "q_bitmap_distinct_rollup": (
        q_bitmap_distinct_rollup, ORACLE_BITMAP_DISTINCT_ROLLUP),
    "q_dynamic_partition_pruning": (
        q_dynamic_partition_pruning, ORACLE_DYNAMIC_PARTITION_PRUNING),
    "q_inventory_fifo": (q_inventory_fifo, ORACLE_INVENTORY_FIFO),
    "q_krippendorff_alpha": (
        q_krippendorff_alpha, ORACLE_KRIPPENDORFF_ALPHA),
    "q_sql_lateral_correlated": (
        q_sql_lateral_correlated, ORACLE_SQL_LATERAL_CORRELATED),
    "q_sql_variables": (q_sql_variables, ORACLE_SQL_VARIABLES),
    "q_brier_decomposition": (
        q_brier_decomposition, ORACLE_BRIER_DECOMPOSITION),
    # rows-only by design (the fingerprint kernel is a documented
    # deterministic stub) — registered WITHOUT oracle SQL
    "q_media_phash_dedup": (q_media_phash_dedup, None),
}
