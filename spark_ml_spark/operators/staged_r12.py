"""STAGED for round 12 — implemented and oracle-tested, NOT registered.

The bounded-cadence policy (REOPENING.md: ~10 new registrations per
round so continuity anchors keep cycling) means the r11 round registers
the nine ``staged_r11.py`` queries; this module carries the ranked r12
draft implemented under the same staging discipline — no ``@query``
calls, absent from ``registry._OPERATOR_MODULES``, a cadence-guard
test in ``tests/test_staged_r12.py`` pins that importing it registers
nothing. Registration is the same documented mechanical flip, two
rounds out.

The reference has none of these (``Data_transform.py`` passim).
Siblings: ``q_scd2_intervals`` (history BUILD; #1 here MAINTAINS it),
``q_rollup_delta_apply`` (the measure-rollup IVM audit whose pattern #1
applies to dimension versioning), ``q_rollup``/``q_cube`` (subtotal
convention: NULL group keys mark levels), ``q_point_in_polygon`` (the
containment parity #3 reuses as an aggregate predicate),
``q_gap_fill`` (the existing sequence()-generation precedent #2's
week dimension follows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.operators.geo import _with_coords, _coord_exprs_sql
from spark_ml_spark.operators.staged_r11 import _POLYGONS, _pip_inside_expr

#: one day in microseconds (shared with the rollup audits)
_DAY_US = 86_400_000_000


# --------------------------------------------------------------------
# r12 #1: incremental SCD-2 maintenance vs full rebuild
# --------------------------------------------------------------------

def q_scd2_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD-2 maintenance (r12 draft #1): the final day of
    ``events`` arrives as the change batch against the type-2 history
    built from everything before it, and the maintenance path — keep
    closed versions untouched, seed the batch's change detection with
    each entity's OPEN version, close the open version at the first
    genuine change, chain the new versions — must produce EXACTLY the
    history a full rebuild produces. The oracle IS that full rebuild
    (it never sees the split), so the driver hash proves maintenance ≡
    rebuild: the property that makes nightly dimension loads O(delta)
    instead of O(history). Extends ``q_rollup_delta_apply``'s IVM
    contract from mergeable measures to versioned dimensions; the
    build-from-scratch sibling is ``q_scd2_intervals``.

    Scale shape: the split is a row-local predicate on one scan (the
    day cut is a 1-row max broadcast); base intervalization and batch
    change-seeding are windows over the natural (user) partitioning;
    the open-version seed join is per-entity (one row each side). No
    full-history rewrite — only open rows and batch rows move.

    Semantics note: a batch event repeating the entity's open version
    type is absorbed (no new version), matching run-merge rebuild
    semantics; ties inside the batch chain by (ts, event_id), the same
    total order the rebuild uses."""
    ev0 = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id", "event_type",
    )
    last_day = ev0.agg(
        F.max(F.expr(f"(ts_us div {_DAY_US}) * {_DAY_US}"))
        .alias("last_day_us")
    )
    ev = ev0.crossJoin(F.broadcast(last_day))
    in_batch = F.expr(f"(ts_us div {_DAY_US}) * {_DAY_US}") == F.col(
        "last_day_us"
    )
    base = ev.where(~in_batch)
    batch = ev.where(in_batch)

    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    base_chg = base.select(
        "user_id", "ts_us", "event_id", "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    )
    base_hist = base_chg.select(
        "user_id", "event_type",
        F.col("ts_us").alias("valid_from_us"),
        "event_id",
        F.lead("ts_us").over(
            W.partitionBy("user_id").orderBy("ts_us", "event_id")
        ).alias("valid_to_us"),
    )
    closed = base_hist.where(F.col("valid_to_us").isNotNull())
    open_ = base_hist.where(F.col("valid_to_us").isNull()).select(
        "user_id", "event_type", "valid_from_us", "event_id"
    )

    seeded = batch.select(
        "user_id", "ts_us", "event_id", "event_type",
        F.lag("event_type").over(w).alias("prev_in_batch"),
    ).join(
        open_.select(
            "user_id", F.col("event_type").alias("open_type")
        ),
        "user_id", "left",
    )
    prev_eff = F.coalesce("prev_in_batch", "open_type")
    new_versions = seeded.where(
        prev_eff.isNull() | (F.col("event_type") != prev_eff)
    ).select(
        "user_id", "event_type",
        F.col("ts_us").alias("valid_from_us"),
        "event_id",
    )

    tail = open_.union(new_versions)
    tail_v = tail.select(
        "user_id", "event_type", "valid_from_us",
        F.lead("valid_from_us").over(
            W.partitionBy("user_id").orderBy("valid_from_us", "event_id")
        ).alias("valid_to_us"),
    )
    return (
        closed.select(
            "user_id", "event_type", "valid_from_us", "valid_to_us"
        )
        .union(tail_v)
        .orderBy("user_id", "valid_from_us")
    )


ORACLE_SCD2_MERGE_APPLY = r"""
WITH c AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS prev_type
  FROM events
),
chg AS (
  SELECT user_id, ts_us, event_id, event_type
  FROM c WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type,
       CAST(ts_us AS BIGINT) AS valid_from_us,
       CAST(lead(ts_us) OVER (
         PARTITION BY user_id ORDER BY ts_us, event_id
       ) AS BIGINT) AS valid_to_us
FROM chg
ORDER BY user_id, valid_from_us
"""


# --------------------------------------------------------------------
# r12 #2: generated 4-4-5 fiscal-calendar rollup
# --------------------------------------------------------------------

#: 4-4-5 calendar constants: 13-week quarters of 4+4+5-week periods,
#: 52-week fiscal years anchored at Jan 1 of the data's first year
_FW_PER_Q = 13
_FW_PER_Y = 52


def q_fiscal_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated 4-4-5 fiscal-calendar rollup (r12 draft #2): a fiscal
    week dimension is GENERATED (``sequence`` + explode — no calendar
    table exists anywhere in the fixtures), each week mapped to its
    fiscal year / quarter / period by pure integer 4-4-5 arithmetic
    (13-week quarters of 4+4+5 weeks, 52-week years, anchored at
    Jan 1 of the data's first order year), broadcast onto orders by
    week index, and revenue rolled up with hierarchical subtotals
    (ROLLUP — NULL group keys mark the levels, the ``q_rollup`` house
    convention). The retail-calendar arithmetic every merchandising
    warehouse runs, absent from the surface until now.

    Scale shape: the dimension is a few hundred generated rows
    (broadcast join — it could never outgrow days/7); the fact side is
    one narrow scan + the rollup aggregate (map-side combined across
    the level expansion); the anchor is a 1-row min broadcast. All
    bucketing is integer DIV on day counts — no engine date math past
    the shared date_diff."""
    o = load(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("od"),
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
        .cast("bigint").alias("cents"),
    )
    anchor = o.agg(
        F.to_date(
            F.concat(F.year(F.min("od")).cast("string"), F.lit("-01-01"))
        ).alias("a0"),
        F.max("od").alias("omax"),
    )
    fact = o.crossJoin(F.broadcast(anchor)).select(
        F.datediff("od", "a0").alias("days"), "cents"
    ).select(F.expr("days div 7").cast("bigint").alias("wk"), "cents")

    dim = (
        anchor.select(
            F.explode(
                F.sequence(
                    F.lit(0),
                    (F.datediff("omax", "a0") / 7).cast("bigint"),
                )
            ).alias("wk")
        )
        .select(
            "wk",
            F.expr(f"wk div {_FW_PER_Y}").cast("bigint").alias("fy_off"),
            F.expr(f"wk % {_FW_PER_Y}").alias("wiy"),
        )
        .select(
            "wk",
            F.col("fy_off").alias("fiscal_year_off"),
            (F.expr(f"wiy div {_FW_PER_Q}") + 1).cast("bigint")
            .alias("fiscal_quarter"),
            (
                F.expr(f"(wiy div {_FW_PER_Q}) * 3")
                + F.when(F.expr(f"wiy % {_FW_PER_Q}") < 4, 1)
                .when(F.expr(f"wiy % {_FW_PER_Q}") < 8, 2)
                .otherwise(3)
            ).cast("bigint").alias("fiscal_period"),
        )
    )
    joined = fact.join(F.broadcast(dim), "wk")
    return (
        joined.rollup("fiscal_year_off", "fiscal_quarter", "fiscal_period")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("fiscal_year_off", "fiscal_quarter", "fiscal_period")
    )


ORACLE_FISCAL_ROLLUP = rf"""
WITH anchor AS (
  SELECT CAST(CAST(year(min(o_orderdate)) AS VARCHAR) || '-01-01' AS DATE)
           AS a0
  FROM orders
),
fact AS (
  SELECT date_diff('day', a.a0, CAST(o.o_orderdate AS DATE)) // 7 AS wk,
         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders o, anchor a
),
dim AS (
  SELECT wk,
         CAST(wk // {_FW_PER_Y} AS BIGINT) AS fiscal_year_off,
         CAST((wk % {_FW_PER_Y}) // {_FW_PER_Q} + 1 AS BIGINT)
           AS fiscal_quarter,
         CAST(((wk % {_FW_PER_Y}) // {_FW_PER_Q}) * 3
              + CASE WHEN (wk % {_FW_PER_Y}) % {_FW_PER_Q} < 4 THEN 1
                     WHEN (wk % {_FW_PER_Y}) % {_FW_PER_Q} < 8 THEN 2
                     ELSE 3 END AS BIGINT) AS fiscal_period
  FROM (SELECT DISTINCT wk FROM fact)
)
SELECT d.fiscal_year_off, d.fiscal_quarter, d.fiscal_period,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(f.cents) AS BIGINT) AS revenue_cents
FROM fact f JOIN dim d ON f.wk = d.wk
GROUP BY ROLLUP (d.fiscal_year_off, d.fiscal_quarter, d.fiscal_period)
ORDER BY d.fiscal_year_off, d.fiscal_quarter, d.fiscal_period
"""


# --------------------------------------------------------------------
# r12 #3: per-polygon spatial aggregate
# --------------------------------------------------------------------

def q_spatial_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-polygon spatial aggregate (r12 draft #3): the r11
    point-in-polygon parity expression reused as an AGGREGATE
    predicate — per polygon, the contained-site count and the exact
    coordinate sums of the contained sites (sums, not means: integer
    division of signed sums truncates toward zero on Spark but floors
    on DuckDB, so the mean is the consumer's one division over these
    exact integers). Same site layout as ``q_point_in_polygon`` (the
    shared ``pip`` coordinate prefix), so the two queries reconcile.

    Scale shape: identical to the containment query — one narrow
    whole-stage-codegen scan with conditional sums, zero shuffles of
    the fact table, output bounded by |polygons|."""
    pts = _with_coords(
        load(spark, sf_dir, "customer"), "c_custkey", "pip"
    ).select(
        F.col("lon_e4").alias("px"), F.col("lat_e4").alias("py")
    )
    aggs = []
    for pid in sorted(_POLYGONS):
        inside = F.expr(_pip_inside_expr(pid))
        aggs.append(F.sum(inside.cast("bigint")).cast("bigint")
                    .alias(f"n_{pid}"))
        aggs.append(F.sum(F.when(inside, F.col("px")).otherwise(0))
                    .cast("bigint").alias(f"sx_{pid}"))
        aggs.append(F.sum(F.when(inside, F.col("py")).otherwise(0))
                    .cast("bigint").alias(f"sy_{pid}"))
    one = pts.agg(*aggs)
    rows = one.select(
        F.explode(F.array(*[
            F.struct(
                F.lit(pid).cast("bigint").alias("polygon_id"),
                F.col(f"n_{pid}").alias("n_inside"),
                F.col(f"sx_{pid}").alias("sum_lon_e4"),
                F.col(f"sy_{pid}").alias("sum_lat_e4"),
            )
            for pid in sorted(_POLYGONS)
        ])).alias("s"),
    )
    return rows.select(
        "s.polygon_id", "s.n_inside", "s.sum_lon_e4", "s.sum_lat_e4"
    ).orderBy("polygon_id")


def _oracle_spatial_summary() -> str:
    sites = _coord_exprs_sql("c_custkey", "pip")
    branches = "\nUNION ALL\n".join(
        f"SELECT CAST({pid} AS BIGINT) AS polygon_id,"
        f" CAST(sum(CASE WHEN {_pip_inside_expr(pid)} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_inside,"
        f" CAST(sum(CASE WHEN {_pip_inside_expr(pid)} THEN px ELSE 0 END)"
        f" AS BIGINT) AS sum_lon_e4,"
        f" CAST(sum(CASE WHEN {_pip_inside_expr(pid)} THEN py ELSE 0 END)"
        f" AS BIGINT) AS sum_lat_e4"
        f" FROM pts"
        for pid in sorted(_POLYGONS)
    )
    return f"""
WITH sites AS ({sites} FROM customer),
pts AS (SELECT lon_e4 AS px, lat_e4 AS py FROM sites)
{branches}
ORDER BY polygon_id
"""


ORACLE_SPATIAL_SUMMARY = _oracle_spatial_summary()


#: name -> (query fn, oracle SQL); registered below since the r12 flip
STAGED = {
    "q_scd2_merge_apply": (q_scd2_merge_apply, ORACLE_SCD2_MERGE_APPLY),
    "q_fiscal_rollup": (q_fiscal_rollup, ORACLE_FISCAL_ROLLUP),
    "q_spatial_summary": (q_spatial_summary, ORACLE_SPATIAL_SUMMARY),
}

# r12 reopening registration (VERDICT r11 zero-failure window): 366 ->
# 369; the staged_r13 promotion right after this module takes the total
# to 376. Import-time, like every other operator module; the names join
# the never-graded backlog and therefore lead the rotated r12 window.
from spark_ml_spark.registry import query  # noqa: E402

for _n, (_fn, _sql) in STAGED.items():
    query(_n, _sql)(_fn)
