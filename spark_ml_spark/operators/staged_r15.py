"""STAGED for round 14 — implemented and oracle-tested, NOT registered.

The ranked r15 REOPENING.md batch, staged under the bounded-cadence
policy (~10 new registrations/round) the way ``staged_r14.py`` staged
the r14 wave: fully implemented to house standard, deliberately NOT in
``registry._OPERATOR_MODULES`` and with NO ``@query`` calls —
``tests/test_staged_r15.py`` pins that importing it registers nothing.
The r13 flip takes ``staged_r13.py``'s two remaining names plus
``staged_r14.py``'s eight (the full ~10 budget), so THESE register in
the r14 flip. Registration is the same mechanical flip documented in
``staged_r10.py``'s history.

Every candidate passed the three drafting vettings FIRST (REOPENING.md
r15 section): capability-overlap grep over the full 376-name registry;
fixture vetting (REJECTED there: JSON-key schema profiling —
``events.props`` is uniformly ``{"k": <int>}``, one key, nothing to
profile); and live probes against the pinned PySpark 4.1.2 + DuckDB:

* ``IDENTIFIER(:tbl)`` and named-parameter ``spark.sql(..., args=)``
  both work end-to-end (probe); ``UNION BY NAME`` SQL text does NOT
  parse on 4.1.2 (rejected — DataFrame ``unionByName`` only).
* a 20-lexeme ``try_cast`` battery: DOUBLE casts are parity-EXACT
  across engines on every lexeme; BIGINT casts diverge on five
  (``1e3``, ``.5``, ``12.``, ``1.5e-2`` — DuckDB rounds through
  double; ``0x1A`` — DuckDB accepts hex). The cast audit therefore
  states Spark's integer rule as an explicit regexp spec the oracle
  shares — the hash match PROVES Spark's ``try_cast(BIGINT)`` equals
  that spec on the fixture data.

The reference has none of these (``Data_transform.py`` passim).
Siblings: ``q_rollup_delta_apply`` (aggregate IVM; #1 completes the
family on the join side), ``q_table_checksum``/``q_drift_diff``
(global checksum / row-level diff; #2 is the bucket-granular
narrowing between them — and reuses ``integrity._hex8_sql``),
``q_csv_malformed`` (malformed-ROW quarantine; #3 is expression-level
error-safe casts), ``q_fiscal_rollup`` (period mapping; #4 is
interval arithmetic), ``q_sql_scalar_udf``/``q_sql_variables``
(session-state SQL surface; #5 is the templating surface),
``q_anti_join``/``q_sql_correlated_subquery`` (anti-membership
plans; #6 pins their NULL semantics contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load

#: delta cuts for the join-IVM contract: every 10th order key is an
#: "update" to an existing join key, the final order-date's orders are
#: pure insertions (the q_rollup_delta_apply delta shape, applied to
#: the fact side); every 7th order key's lineitems arrive late (the
#: dimension-side delta)
_JDA_R_MOD = 10
_JDA_S_MOD = 7

#: reconciliation bucket fan-out. 1024, not 64: the differing set
#: must stay a STRICT subset of all buckets at every fixture scale or
#: the narrowing contract is degenerate (at 64 buckets the sf0.01
#: update cut touched every bucket — measured during staging)
_BCD_BUCKETS = 1024
#: every 997th order key simulates an in-place update between snapshots
_BCD_UPD_MOD = 997

#: Monday anchoring the business-day closed form (1992-01-06 IS a
#: Monday; every fixture date is after it, so n >= 0 and div/mod are
#: exact floor semantics on both engines)
_BD_ANCHOR = "1992-01-06"

#: Spark's try_cast-to-BIGINT acceptance rule as a portable regexp
#: spec (see the module docstring probe table): optional sign, digits
#: only, after trim. DuckDB's own TRY_CAST(BIGINT) is LOOSER (rounds
#: double-ish lexemes, accepts 0x hex) — the oracle uses this spec,
#: so the driver hash proves Spark's rule equals it.
_INT_SPEC = "^[+-]?[0-9]+$"


# --------------------------------------------------------------------
# REOPENING r15 #1: join-side incremental view maintenance
# --------------------------------------------------------------------

def q_join_delta_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-side incremental view maintenance (REOPENING r15 #1) —
    completes the IVM family: ``q_rollup_delta_apply`` proves the
    AGGREGATE merge contract; this proves the JOIN delta algebra.
    orders (R) and lineitem (S) are each split into disjoint
    (old, delta) halves by deterministic cuts; the maintained
    per-priority aggregate is

        inc = agg(R_old ⋈ S_old)  ⊕  agg(ΔR⋈S_old ∪ R_old⋈ΔS ∪ ΔR⋈ΔS)

    (⊕ = count/sum addition — the merge arithmetic a MERGE statement
    runs nightly), emitted next to the full recompute
    ``agg(R ⋈ S)`` with ``invariant_ok`` per row. This is the
    contract that makes join-view maintenance O(Δ), not O(history),
    at 100 TB: the three delta joins each have one small side.

    Scale shape: the incremental path NEVER touches the full join —
    it is the union of the three delta joins (each with one small
    side) merged onto the base aggregate, exactly the dataflow a
    maintained view runs; the full recompute exists here only as the
    audit's ruler. All aggregates are map-side combinable on the
    5-priority key space. Exact BIGINT counts and quantity sums
    throughout.

    Cites ``Data_transform.py`` passim (no IVM surface in the
    reference)."""
    o0 = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    last = o0.agg(F.max("o_orderdate").alias("last_d"))
    o = o0.crossJoin(F.broadcast(last)).withColumn(
        "r_delta",
        (F.col("o_orderkey") % _JDA_R_MOD == 0)
        | (F.col("o_orderdate") == F.col("last_d")),
    ).select("o_orderkey", "o_orderpriority", "r_delta")
    s = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_orderkey") % _JDA_S_MOD == 0).alias("s_delta"),
    )
    r_old = o.where(~F.col("r_delta")).drop("r_delta")
    r_new = o.where(F.col("r_delta")).drop("r_delta")
    s_old = s.where(~F.col("s_delta")).drop("s_delta")
    s_new = s.where(F.col("s_delta")).drop("s_delta")

    def agg(df, p):
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("bigint").alias(f"{p}n"),
            F.sum("qty").cast("bigint").alias(f"{p}q"),
        )

    # the audit's ruler: one direct recompute over the unsplit inputs
    full = agg(o.join(s, "o_orderkey"), "f_")
    # the maintained view's actual dataflow: base join + the three
    # delta joins, the full result never consulted
    base = agg(r_old.join(s_old, "o_orderkey"), "b_")
    delta = agg(
        r_new.join(s_old, "o_orderkey")
        .unionByName(r_old.join(s_new, "o_orderkey"))
        .unionByName(r_new.join(s_new, "o_orderkey")),
        "d_",
    )
    return (
        full.join(base, "o_orderpriority", "left")
        .join(delta, "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            F.col("f_n").alias("full_n"),
            F.col("f_q").alias("full_qty"),
            (F.coalesce("b_n", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
            .cast("bigint").alias("inc_n"),
            (F.coalesce("b_q", F.lit(0)) + F.coalesce("d_q", F.lit(0)))
            .cast("bigint").alias("inc_qty"),
            (
                (F.col("f_n")
                 == F.coalesce("b_n", F.lit(0)) + F.coalesce("d_n", F.lit(0)))
                & (F.col("f_q")
                   == F.coalesce("b_q", F.lit(0)) + F.coalesce("d_q", F.lit(0)))
            ).alias("invariant_ok"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_JOIN_DELTA_APPLY = rf"""
WITH last AS (SELECT max(o_orderdate) AS last_d FROM orders),
o AS (
  SELECT o_orderkey, o_orderpriority,
         (o_orderkey % {_JDA_R_MOD} = 0 OR o_orderdate = last_d)
           AS r_delta
  FROM orders, last
),
s AS (
  SELECT l_orderkey AS o_orderkey, CAST(l_quantity AS BIGINT) AS qty,
         l_orderkey % {_JDA_S_MOD} = 0 AS s_delta
  FROM lineitem
),
r_old AS (SELECT o_orderkey, o_orderpriority FROM o WHERE NOT r_delta),
r_new AS (SELECT o_orderkey, o_orderpriority FROM o WHERE r_delta),
s_old AS (SELECT o_orderkey, qty FROM s WHERE NOT s_delta),
s_new AS (SELECT o_orderkey, qty FROM s WHERE s_delta),
full_v AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS f_n,
         CAST(sum(qty) AS BIGINT) AS f_q
  FROM o JOIN s USING (o_orderkey) GROUP BY 1
),
base_v AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS b_n,
         CAST(sum(qty) AS BIGINT) AS b_q
  FROM r_old JOIN s_old USING (o_orderkey) GROUP BY 1
),
delta_v AS (
  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS d_n,
         CAST(sum(qty) AS BIGINT) AS d_q
  FROM (
    SELECT o_orderpriority, qty
    FROM r_new JOIN s_old USING (o_orderkey)
    UNION ALL
    SELECT o_orderpriority, qty
    FROM r_old JOIN s_new USING (o_orderkey)
    UNION ALL
    SELECT o_orderpriority, qty
    FROM r_new JOIN s_new USING (o_orderkey)
  ) GROUP BY 1
)
SELECT f.o_orderpriority,
       f.f_n AS full_n, f.f_q AS full_qty,
       CAST(COALESCE(b.b_n, 0) + COALESCE(d.d_n, 0) AS BIGINT) AS inc_n,
       CAST(COALESCE(b.b_q, 0) + COALESCE(d.d_q, 0) AS BIGINT) AS inc_qty,
       (f.f_n = COALESCE(b.b_n, 0) + COALESCE(d.d_n, 0)
        AND f.f_q = COALESCE(b.b_q, 0) + COALESCE(d.d_q, 0))
         AS invariant_ok
FROM full_v f
LEFT JOIN base_v b USING (o_orderpriority)
LEFT JOIN delta_v d USING (o_orderpriority)
ORDER BY f.o_orderpriority
"""


# --------------------------------------------------------------------
# REOPENING r15 #2: bucketed-checksum reconciliation narrowing
# --------------------------------------------------------------------

def q_bucket_checksum_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style reconciliation narrowing (REOPENING r15 #2):
    between ``q_table_checksum`` (one global number) and
    ``q_drift_diff`` (row-level classification) sits the op a 100 TB
    replication monitor actually runs — per-BUCKET (count, content
    checksum) on both snapshots, comparing O(buckets) summaries to
    find WHICH buckets need re-sync, then shipping only those. Two
    deterministic orders snapshots: v2 = current; v1 = the
    pre-final-day rows with every ``%97`` key's status mangled (the
    simulated in-place update). Row hash = the 32-bit md5-prefix
    integer of the canonical ``key|status|date`` string — the
    ``q_table_checksum`` portable-hash machinery
    (``integrity._hex8_sql`` on the oracle side), summed per bucket
    (order-free, partition-mergeable). Output: ONLY the differing
    buckets, with both sides' counts and checksums.

    Scale shape: two map-side-combined aggregates over one scan each
    (the bucket key is ``o_orderkey % 1024`` — uniform fan-out), one
    bucket-granular full-outer join, one filter. The narrowing contract
    (differing buckets == buckets containing changed keys) is pinned
    by a pure-Python reference test.

    Cites ``Data_transform.py`` passim (no reconciliation surface in
    the reference)."""
    o0 = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate"
    )
    last = o0.agg(F.max("o_orderdate").alias("last_d"))
    o = o0.crossJoin(F.broadcast(last))
    canon = lambda status: F.concat_ws(  # noqa: E731
        "|",
        F.col("o_orderkey").cast("string"),
        status,
        F.date_format("o_orderdate", "yyyy-MM-dd"),
    )
    h = lambda status: F.conv(  # noqa: E731
        F.substring(F.md5(canon(status)), 1, 8), 16, 10
    ).cast("bigint")
    v2 = o.select(
        (F.col("o_orderkey") % _BCD_BUCKETS).alias("bucket"),
        h(F.col("o_orderstatus")).alias("rh"),
    )
    v1 = o.where(F.col("o_orderdate") != F.col("last_d")).select(
        (F.col("o_orderkey") % _BCD_BUCKETS).alias("bucket"),
        h(
            F.when(
                F.col("o_orderkey") % _BCD_UPD_MOD == 0,
                F.concat(F.col("o_orderstatus"), F.lit("*")),
            ).otherwise(F.col("o_orderstatus"))
        ).alias("rh"),
    )

    def summ(df, p):
        return df.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("bigint").alias(f"{p}n"),
            F.sum("rh").cast("bigint").alias(f"{p}ck"),
        )

    return (
        summ(v1, "old_").join(summ(v2, "new_"), "bucket", "full_outer")
        .where(
            (F.coalesce("old_n", F.lit(-1)) != F.coalesce("new_n", F.lit(-1)))
            | (F.coalesce("old_ck", F.lit(-1))
               != F.coalesce("new_ck", F.lit(-1)))
        )
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            F.coalesce("old_n", F.lit(0)).cast("bigint").alias("n_old"),
            F.coalesce("new_n", F.lit(0)).cast("bigint").alias("n_new"),
            F.coalesce("old_ck", F.lit(0)).cast("bigint").alias("ck_old"),
            F.coalesce("new_ck", F.lit(0)).cast("bigint").alias("ck_new"),
        )
        .orderBy("bucket")
    )


def _bcd_oracle() -> str:
    from spark_ml_spark.operators.integrity import _hex8_sql

    canon_new = ("CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus"
                 " || '|' || strftime(o_orderdate, '%Y-%m-%d')")
    canon_old = (
        "CAST(o_orderkey AS VARCHAR) || '|' || "
        f"(CASE WHEN o_orderkey % {_BCD_UPD_MOD} = 0"
        " THEN o_orderstatus || '*' ELSE o_orderstatus END)"
        " || '|' || strftime(o_orderdate, '%Y-%m-%d')"
    )
    return rf"""
WITH last AS (SELECT max(o_orderdate) AS last_d FROM orders),
v2 AS (
  SELECT o_orderkey % {_BCD_BUCKETS} AS bucket,
         {_hex8_sql(canon_new)} AS rh
  FROM orders
),
v1 AS (
  SELECT o_orderkey % {_BCD_BUCKETS} AS bucket,
         {_hex8_sql(canon_old)} AS rh
  FROM orders, last WHERE o_orderdate <> last_d
),
s1 AS (SELECT bucket, CAST(count(*) AS BIGINT) AS old_n,
              CAST(sum(rh) AS BIGINT) AS old_ck FROM v1 GROUP BY bucket),
s2 AS (SELECT bucket, CAST(count(*) AS BIGINT) AS new_n,
              CAST(sum(rh) AS BIGINT) AS new_ck FROM v2 GROUP BY bucket)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COALESCE(old_n, 0) AS BIGINT) AS n_old,
       CAST(COALESCE(new_n, 0) AS BIGINT) AS n_new,
       CAST(COALESCE(old_ck, 0) AS BIGINT) AS ck_old,
       CAST(COALESCE(new_ck, 0) AS BIGINT) AS ck_new
FROM s1 FULL OUTER JOIN s2 USING (bucket)
WHERE COALESCE(old_n, -1) <> COALESCE(new_n, -1)
   OR COALESCE(old_ck, -1) <> COALESCE(new_ck, -1)
ORDER BY bucket
"""


ORACLE_BUCKET_CHECKSUM_DIFF = _bcd_oracle()


# --------------------------------------------------------------------
# REOPENING r15 #3: error-safe cast semantics audit
# --------------------------------------------------------------------

#: (source label, Spark string expr, DuckDB string expr) — the three
#: fixture-derived dirty-string sources. props is '{"k": 69}' /
#: '{"k": 9}': substr(7,2) yields '69' or '9}' (mixed valid/invalid);
#: substr(6,3) yields ' 69' or ' 9}' (leading-space valids);
#: the priority prefix is always a clean digit.
_TC_SOURCES = (
    ("props_tail", "events", "substr(props, 7, 2)"),
    ("props_pad", "events", "substr(props, 6, 3)"),
    ("priority_digit", "orders", "substr(o_orderpriority, 1, 1)"),
)


def q_try_cast_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe cast semantics audit (REOPENING r15 #3) — the
    dirty-data staple ``q_csv_malformed`` doesn't cover: that op
    quarantines malformed ROWS at parse time; this audits
    EXPRESSION-level ``try_cast`` over fixture-derived dirty strings.
    Per source: total rows, DOUBLE-valid count and milli-quantized
    sum (the 20-lexeme drafting probe proved Spark/DuckDB TRY_CAST to
    DOUBLE parity-exact), and the BIGINT-valid count — where the
    oracle deliberately does NOT use DuckDB's TRY_CAST(BIGINT) (it
    diverges on 5 probed lexemes: rounds ``1e3``/``.5``/``12.``/
    ``1.5e-2``, accepts ``0x1A``) but the explicit regexp SPEC of
    Spark's rule (``^[+-]?[0-9]+$`` after trim) — so the driver hash
    PROVES Spark's integer acceptance equals that spec on this data.

    Scale shape: one map-side-combined 1-row aggregate per source
    (three pushed-down scans), unioned — O(1) output.

    Cites ``Data_transform.py`` passim (the reference's
    ``arreglaComas`` repairs rows, never expressions)."""
    outs = []
    for label, table, expr in _TC_SOURCES:
        d = F.expr(f"try_cast({expr} AS DOUBLE)")
        b = F.expr(f"try_cast({expr} AS BIGINT)")
        outs.append(
            load(spark, sf_dir, table).agg(
                F.lit(label).alias("source"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.count(d).cast("bigint").alias("n_double"),
                F.sum(F.floor(d * 1000).cast("bigint"))
                .cast("bigint").alias("sum_milli"),
                F.count(b).cast("bigint").alias("n_bigint"),
            )
        )
    df = outs[0]
    for o in outs[1:]:
        df = df.unionAll(o)
    return df.orderBy("source")


def _tc_oracle() -> str:
    parts = []
    for label, table, expr in _TC_SOURCES:
        parts.append(
            f"SELECT '{label}' AS source,"
            f" CAST(count(*) AS BIGINT) AS n,"
            f" CAST(count(TRY_CAST({expr} AS DOUBLE)) AS BIGINT)"
            f"   AS n_double,"
            f" CAST(sum(CAST(floor(TRY_CAST({expr} AS DOUBLE) * 1000)"
            f"   AS BIGINT)) AS BIGINT) AS sum_milli,"
            f" CAST(sum(CASE WHEN regexp_matches(trim({expr}),"
            f" '{_INT_SPEC}') THEN 1 ELSE 0 END) AS BIGINT) AS n_bigint"
            f" FROM {table}"
        )
    return " UNION ALL ".join(parts) + " ORDER BY source"


ORACLE_TRY_CAST_AUDIT = _tc_oracle()


# --------------------------------------------------------------------
# REOPENING r15 #4: business-day interval arithmetic
# --------------------------------------------------------------------

def q_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day interval arithmetic (REOPENING r15 #4): order→ship
    lead time in WEEKDAYS per order priority, via the closed form

        wd(d) = 5·(n div 7) + least(n mod 7, 5),  n = days since the
        Monday anchor 1992-01-06 (``_BD_ANCHOR``);
        bdays = wd(ship) − wd(order)

    — pure integer date math on both engines. No ``dayofweek()``
    anywhere: Spark numbers Sunday=1 and DuckDB Sunday=0, a classic
    cross-engine trap the anchored closed form avoids entirely (every
    fixture date is after the anchor, so div/mod are exact floor
    semantics). Emits per-priority order-line counts, total business
    days, and the milli-quantized mean (integer division).

    Scale shape: one broadcast-joined fact scan (orders dates ride the
    join to lineitem) + one map-side-combinable aggregate over the
    5-priority key space.

    Cites ``Data_transform.py`` passim (no calendar arithmetic in the
    reference)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    s = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_shipdate"
    )

    def wd(col: str):
        n = F.datediff(F.col(col), F.to_date(F.lit(_BD_ANCHOR)))
        return (
            F.lit(5) * F.expr(f"datediff({col}, date'{_BD_ANCHOR}') div 7")
            + F.least(n % 7, F.lit(5))
        ).cast("bigint")

    j = s.join(F.broadcast(o), "o_orderkey").select(
        "o_orderpriority",
        (wd("l_shipdate") - wd("o_orderdate")).alias("bdays"),
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("bdays").cast("bigint").alias("total_bdays"),
            F.expr("(sum(bdays) * 1000) div count(*)")
            .cast("bigint").alias("mean_bdays_milli"),
        )
        .orderBy("o_orderpriority")
    )


ORACLE_BUSINESS_DAYS = rf"""
WITH j AS (
  SELECT o.o_orderpriority,
         (5 * (date_diff('day', DATE '{_BD_ANCHOR}', l.l_shipdate) // 7)
          + least(date_diff('day', DATE '{_BD_ANCHOR}', l.l_shipdate)
                  % 7, 5))
         - (5 * (date_diff('day', DATE '{_BD_ANCHOR}', o.o_orderdate)
                 // 7)
            + least(date_diff('day', DATE '{_BD_ANCHOR}', o.o_orderdate)
                    % 7, 5))
           AS bdays
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(bdays) AS BIGINT) AS total_bdays,
       CAST((sum(bdays) * 1000) // count(*) AS BIGINT)
         AS mean_bdays_milli
FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------
# REOPENING r15 #5: parameterized SQL (IDENTIFIER + named parameters)
# --------------------------------------------------------------------

#: the templated threshold, in integer cents ($100k)
_IDP_THR_CENTS = 10_000_000


def q_sql_identifier_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL front-end (REOPENING r15 #5, probe-verified
    on 4.1.2): the table name flows through ``IDENTIFIER(:tbl)``
    (SPARK-43123) and the revenue threshold through a named parameter
    (SPARK-41271, ``spark.sql(..., args=)``) — the injection-safe
    templating surface every shared warehouse front-end needs; the
    parameters are bound by the analyzer, not string-spliced. The
    oracle inlines the resolved query, so the hash match proves the
    binding resolves to exactly the literal plan.

    Scale shape: identical to the inlined query — one pushed-down
    filter + map-side-combinable aggregate over 5 priorities.

    Cites ``Data_transform.py`` passim (no SQL front-end in the
    reference)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        r"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS rev_cents
FROM IDENTIFIER(:tbl)
WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > :thr
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
        args={"tbl": "orders", "thr": _IDP_THR_CENTS},
    )


ORACLE_SQL_IDENTIFIER_PARAM = rf"""
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS rev_cents
FROM orders
WHERE CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) > {_IDP_THR_CENTS}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------
# REOPENING r15 #6: three-valued-logic anti-membership contract
# --------------------------------------------------------------------

def q_null_semantics_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic contract audit (REOPENING r15 #6): the same
    anti-membership question — "suppliers whose nation has NO
    negative-balance customer" — asked three ways over a key set that
    CONTAINS a NULL (one negative-balance nation is ``nullif``-ed):

    * ``NOT IN`` — collapses to ZERO rows (x <> NULL is UNKNOWN for
      every x, so the conjunction can never be TRUE): the classic
      silent-wrong-result bug at 100 TB;
    * ``NOT EXISTS`` — the correct count (correlated equality never
      evaluates against the NULL as a match);
    * ``NOT IN`` with the NULL filtered — equals NOT EXISTS.

    Both engines share ANSI semantics, so the oracle states the same
    three counts and the driver hash pins the contract — the
    anti-join planning guidance (`q_anti_join` uses the safe form) as
    a checked invariant rather than a comment.

    Scale shape: three aggregates over one small scan + one
    broadcast-able subquery each; O(1) output.

    Cites ``Data_transform.py`` passim (the reference never joins)."""
    for t in ("supplier", "customer"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(r"""
WITH neg AS (
  SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal < 0
),
probe AS (
  SELECT nullif(c_nationkey, (SELECT min(c_nationkey) FROM neg))
           AS nk
  FROM neg
)
SELECT
  CAST((SELECT count(*) FROM supplier
        WHERE s_nationkey NOT IN (SELECT nk FROM probe)) AS BIGINT)
    AS n_not_in,
  CAST((SELECT count(*) FROM supplier s
        WHERE NOT EXISTS (SELECT 1 FROM probe p
                          WHERE p.nk = s.s_nationkey)) AS BIGINT)
    AS n_not_exists,
  CAST((SELECT count(*) FROM supplier
        WHERE s_nationkey NOT IN (SELECT nk FROM probe
                                  WHERE nk IS NOT NULL)) AS BIGINT)
    AS n_not_in_filtered,
  CAST((SELECT count(*) FROM probe WHERE nk IS NULL) AS BIGINT)
    AS n_null_keys
""")


ORACLE_NULL_SEMANTICS_AUDIT = r"""
WITH neg AS (
  SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal < 0
),
probe AS (
  SELECT nullif(c_nationkey, (SELECT min(c_nationkey) FROM neg))
           AS nk
  FROM neg
)
SELECT
  CAST((SELECT count(*) FROM supplier
        WHERE s_nationkey NOT IN (SELECT nk FROM probe)) AS BIGINT)
    AS n_not_in,
  CAST((SELECT count(*) FROM supplier s
        WHERE NOT EXISTS (SELECT 1 FROM probe p
                          WHERE p.nk = s.s_nationkey)) AS BIGINT)
    AS n_not_exists,
  CAST((SELECT count(*) FROM supplier
        WHERE s_nationkey NOT IN (SELECT nk FROM probe
                                  WHERE nk IS NOT NULL)) AS BIGINT)
    AS n_not_in_filtered,
  CAST((SELECT count(*) FROM probe WHERE nk IS NULL) AS BIGINT)
    AS n_null_keys
"""


#: name -> (query fn, oracle SQL). r14 registration = append this
#: module to ``registry._OPERATOR_MODULES`` and apply the STAGED loop
#: (NOT before the r13 grade lands — the cadence-guard test pins that
#: importing this module registers nothing).
STAGED = {
    "q_join_delta_apply": (q_join_delta_apply, ORACLE_JOIN_DELTA_APPLY),
    "q_bucket_checksum_diff": (
        q_bucket_checksum_diff, ORACLE_BUCKET_CHECKSUM_DIFF),
    "q_try_cast_audit": (q_try_cast_audit, ORACLE_TRY_CAST_AUDIT),
    "q_business_days": (q_business_days, ORACLE_BUSINESS_DAYS),
    "q_sql_identifier_param": (
        q_sql_identifier_param, ORACLE_SQL_IDENTIFIER_PARAM),
    "q_null_semantics_audit": (
        q_null_semantics_audit, ORACLE_NULL_SEMANTICS_AUDIT),
}
