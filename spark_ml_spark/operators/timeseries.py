"""Round-4 wave-30: time-series analytics over the daily order series —
autocorrelation, change-point detection, seasonality, moving median.

The series under test is the DAILY ORDER series derived from ``orders``
(one row per calendar day: order count / revenue in exact micro-units).
A day-grain series is bounded by the calendar (~2.4k rows per 7-year
fixture span) regardless of data scale, so every statistic here is
"corpus-sized scan → calendar-sized table → closed form": the scan is
the only big stage, and it is a map-side-combined group-by on the date.

``q_autocorr`` — sample autocorrelation at lags 1..7 as Pearson r over
the lag-k paired series (the correlogram an anomaly dashboard plots).
``q_cusum_changepoint`` — per-year CUSUM change-point: the day t
maximizing |S_t − (t/T)·S_T|, the binary-segmentation statistic (Page
1954). The argmax is taken on the INTEGER-scaled |T·S_t − t·S_T| so the
winner is exact; ties break to the earliest day.
``q_seasonality_index`` — day-of-week revenue index in ppm (dow mean of
daily revenue ÷ overall mean of daily revenue).
``q_moving_median`` — 7-day rolling exact median of daily order counts
(full windows only, so the count is odd and the median unique).

Engine exactness: counts and micro-unit revenues are BIGINT; cross
products accumulate in DECIMAL(38,0) (exact, order-free); the only
floats are one closed-form expression per OUTPUT row.

The reference has no time-series surface (``Data_transform.py``
passim); siblings: ``q_ewma_forecast`` (smoothing), ``q_gap_fill``
(calendar densification), ``q_islands`` (streaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark import api
from spark_ml_spark.registry import query


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day DATE, x BIGINT) — orders per calendar day."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )


@query("q_autocorr", oracle=r"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
lags AS (SELECT unnest(range(1, 8)) AS lag),
p AS (
  SELECT l.lag, a.x AS xa, b.x AS xb
  FROM d a JOIN lags l ON TRUE
  JOIN d b ON b.day = a.day + CAST(l.lag AS INTEGER)
),
m AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(xa) AS BIGINT) AS s1, CAST(sum(xb) AS BIGINT) AS s2,
         sum(CAST(xa AS HUGEINT) * xa) AS s11,
         sum(CAST(xb AS HUGEINT) * xb) AS s22,
         sum(CAST(xa AS HUGEINT) * xb) AS s12
  FROM p GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       round((CAST(n_pairs AS DOUBLE) * CAST(s12 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * s2)
             / sqrt((CAST(n_pairs AS DOUBLE) * CAST(s11 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * s1)
                    * (CAST(n_pairs AS DOUBLE) * CAST(s22 AS DOUBLE)
                       - CAST(s2 AS DOUBLE) * s2)), 4) AS acf
FROM m ORDER BY lag
""")
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlogram: Pearson autocorrelation of the daily order-count
    series at lags 1..7, via an equi-join of the day table to itself on
    ``day + lag`` (no window, no sort — a 7-way lag fan-out of a
    calendar-sized table). Moments are exact (BIGINT sums, DECIMAL(38,0)
    cross products) so the Pearson closed form is one float expression
    per lag."""
    d = _daily_counts(spark, sf_dir)
    # the 7 lags attach IN-ROW (explode of an array literal) — no
    # crossJoin/BNLJ even of a tiny table; the repo-wide plan-hygiene
    # test treats every non-provably-tiny nested-loop build as a defect
    lag_arr = F.array(*[F.lit(i) for i in range(1, 8)])
    a = d.alias("a").select(
        F.col("a.day").alias("aday"), F.col("a.x").alias("xa"),
        F.explode(lag_arr).alias("lag"),
    )
    p = a.join(
        d.alias("b"),
        F.col("b.day") == F.date_add(F.col("aday"), F.col("lag")),
    ).select("lag", "xa", F.col("b.x").alias("xb"))
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = p.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("xa").cast("bigint").alias("s1"),
        F.sum("xb").cast("bigint").alias("s2"),
        F.sum(dec("xa") * dec("xa")).alias("s11"),
        F.sum(dec("xb") * dec("xb")).alias("s22"),
        F.sum(dec("xa") * dec("xb")).alias("s12"),
    )
    nd = F.col("n_pairs").cast("double")
    num = nd * F.col("s12").cast("double") - F.col("s1").cast("double") * F.col("s2")
    den = F.sqrt(
        (nd * F.col("s11").cast("double")
         - F.col("s1").cast("double") * F.col("s1"))
        * (nd * F.col("s22").cast("double")
           - F.col("s2").cast("double") * F.col("s2"))
    )
    return m.select(
        F.col("lag").cast("bigint").alias("lag"),
        "n_pairs",
        F.round(num / den, 4).alias("acf"),
    ).orderBy("lag")


@query("q_cusum_changepoint", oracle=r"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
w AS (
  SELECT EXTRACT(year FROM day) AS yr, day,
         CAST(row_number() OVER (PARTITION BY EXTRACT(year FROM day)
                                 ORDER BY day) AS BIGINT) AS t,
         CAST(sum(x) OVER (PARTITION BY EXTRACT(year FROM day)
                           ORDER BY day) AS BIGINT) AS s_t,
         CAST(count(*) OVER (PARTITION BY EXTRACT(year FROM day))
              AS BIGINT) AS big_t,
         CAST(sum(x) OVER (PARTITION BY EXTRACT(year FROM day))
              AS BIGINT) AS s_total
  FROM d
),
scored AS (
  SELECT yr, day, big_t, s_total,
         abs(big_t * s_t - t * s_total) AS d_scaled,
         row_number() OVER (PARTITION BY yr
                            ORDER BY abs(big_t * s_t - t * s_total) DESC,
                                     day) AS rn
  FROM w
)
SELECT CAST(yr AS BIGINT) AS yr, CAST(day AS VARCHAR) AS changepoint_day,
       CAST(d_scaled AS BIGINT) AS d_scaled,
       round(CAST(d_scaled AS DOUBLE) / big_t, 4) AS cusum_stat
FROM scored WHERE rn = 1 ORDER BY yr
""")
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year CUSUM change-point over daily order counts: the day
    maximizing |S_t − (t/T)·S_T|, computed as the INTEGER statistic
    |T·S_t − t·S_T| so the argmax is exact; ties break to the earliest
    day; ``cusum_stat`` is the conventional /T normalization.

    Scale shape: every window partitions BY YEAR — each partition is at
    most 366 rows no matter the data scale, so the running sums are
    per-group sorts of calendar-bounded groups, never a global sort
    (the ``q_islands`` discipline)."""
    d = _daily_counts(spark, sf_dir)
    yr = F.year("day")
    wo = Window.partitionBy(yr).orderBy("day")
    wa = Window.partitionBy(yr)
    w = d.select(
        yr.cast("bigint").alias("yr"),
        "day",
        F.row_number().over(wo).cast("bigint").alias("t"),
        F.sum("x").over(wo).cast("bigint").alias("s_t"),
        F.count(F.lit(1)).over(wa).cast("bigint").alias("big_t"),
        F.sum("x").over(wa).cast("bigint").alias("s_total"),
    )
    d_scaled = F.abs(
        F.col("big_t") * F.col("s_t") - F.col("t") * F.col("s_total")
    )
    wr = Window.partitionBy("yr").orderBy(d_scaled.desc(), F.col("day"))
    scored = w.select(
        "yr", "day", "big_t", d_scaled.alias("d_scaled"),
        F.row_number().over(wr).alias("rn"),
    )
    return (
        scored.where(F.col("rn") == 1)
        .select(
            "yr",
            F.date_format("day", "yyyy-MM-dd").alias("changepoint_day"),
            F.col("d_scaled").cast("bigint").alias("d_scaled"),
            F.round(
                F.col("d_scaled").cast("double") / F.col("big_t"), 4
            ).alias("cusum_stat"),
        )
        .orderBy("yr")
    )


@query("q_seasonality_index", oracle=r"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all, CAST(sum(rev) AS BIGINT) AS s_all
  FROM d
)
SELECT dayname(day) AS dow,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(floor((CAST(sum(rev) AS DOUBLE) / count(*))
                  / (CAST(s_all AS DOUBLE) / n_all) * 1000000.0 + 0.5)
            AS BIGINT) AS index_ppm
FROM d, tot
GROUP BY dayname(day), s_all, n_all
ORDER BY dow
""")
def q_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index of daily revenue: (dow mean of the
    daily series ÷ overall mean) in ppm — the multiplicative seasonal
    factor a forecaster divides out. Revenue is micro-unit BIGINT at
    the day grain (exact, order-free); the index is one float ratio per
    dow row, floor-half-up quantized (the repo's ppm discipline).

    Scale shape: corpus scan → calendar-sized day table (map-side
    combined) → 7-row group-by with a broadcast 1-row total."""
    rev = F.sum(
        F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5)).cast("bigint")
    ).cast("bigint")
    d = (
        load(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(rev.alias("rev"))
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum("rev").cast("bigint").alias("s_all"),
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .groupBy(F.date_format("day", "EEEE").alias("dow"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.floor(
                (F.sum("rev").cast("double") / F.count(F.lit(1)))
                / (F.max("s_all").cast("double") / F.max("n_all"))
                * 1000000.0
                + F.lit(0.5)
            ).cast("bigint").alias("index_ppm"),
        )
        .orderBy("dow")
    )


@query("q_moving_median", oracle=r"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM orders
  WHERE EXTRACT(year FROM o_orderdate) = 1996
  GROUP BY 1
),
w AS (
  SELECT day, x,
         row_number() OVER (ORDER BY day) AS rn,
         CAST(median(x) OVER (ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
              AS BIGINT) AS med7
  FROM d
)
SELECT CAST(day AS VARCHAR) AS day, x, med7
FROM w WHERE rn >= 7 ORDER BY day
""")
def q_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 7-day rolling median of daily order counts for 1996 (full
    windows only, so each window holds exactly 7 values and the median
    is the unique 4th order statistic — no even-count averaging
    ambiguity between engines). Spark has no windowed median; the
    Spark-first expression is ``sort_array(collect_list(x) over w)[4]``
    — a 7-element in-row sort, not a shuffle.

    Scale shape: one filtered scan → ≤366-row day table; the single
    window is calendar-bounded (the series year), document that a
    multi-series production variant partitions by series key exactly
    like ``q_cusum_changepoint`` partitions by year."""
    d = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1996)
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    # constant partition key keeps WindowExec labeled-partitioned (the
    # repo bans the 'No Partition Defined' shape); the partition IS the
    # single 1996 series, ≤366 rows.
    wo = Window.partitionBy(api.one_partition("day")).orderBy("day")
    wf = wo.rowsBetween(-6, 0)
    w = d.select(
        "day", "x",
        F.row_number().over(wo).alias("rn"),
        F.element_at(F.sort_array(F.collect_list("x").over(wf)), 4)
        .cast("bigint").alias("med7"),
    )
    return (
        w.where(F.col("rn") >= 7)
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "x", "med7")
        .orderBy("day")
    )


@query("q_period_growth", oracle=r"""
WITH m AS (
  SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS mon,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1
)
SELECT CAST(c.mon AS VARCHAR) AS mon, c.rev AS rev_micros,
       CAST(floor((c.rev - p.rev) * 1000000.0 / p.rev + 0.5) AS BIGINT)
         AS mom_ppm,
       CAST(floor((c.rev - y.rev) * 1000000.0 / y.rev + 0.5) AS BIGINT)
         AS yoy_ppm
FROM m c
LEFT JOIN m p ON p.mon = c.mon - INTERVAL 1 MONTH
LEFT JOIN m y ON y.mon = c.mon - INTERVAL 12 MONTH
ORDER BY c.mon
""")
def q_period_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth in signed ppm
    — the period-comparison readout every revenue dashboard leads with.
    Previous periods attach by EQUI-JOIN on the shifted month key (the
    ``q_autocorr`` discipline: the series is calendar-sized, a lag is a
    join, not a global-sort window); months missing a comparator yield
    NULL growth. Revenue is exact micro-unit BIGINT; each growth ratio
    is one quantized float per output row.

    Scale shape: corpus scan → month-grain aggregate (map-side
    combined, ≤ a few hundred rows for any data size) → two self
    equi-joins on that tiny table."""
    m = (
        load(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.to_date("o_orderdate")).alias("mon"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("rev")
        )
        .select(F.to_date("mon").alias("mon"), "rev")
    )
    c, p, y = m.alias("c"), m.alias("p"), m.alias("y")

    def growth(prev: str) -> F.Column:
        return F.floor(
            (F.col("c.rev") - F.col(f"{prev}.rev")) * 1000000.0
            / F.col(f"{prev}.rev")
            + F.lit(0.5)
        ).cast("bigint")

    return (
        c.join(p, F.col("p.mon") == F.add_months(F.col("c.mon"), -1), "left")
        .join(y, F.col("y.mon") == F.add_months(F.col("c.mon"), -12), "left")
        .select(
            F.date_format("c.mon", "yyyy-MM-dd").alias("mon"),
            F.col("c.rev").alias("rev_micros"),
            growth("p").alias("mom_ppm"),
            growth("y").alias("yoy_ppm"),
        )
        .orderBy("mon")
    )


@query("q_rolling_distinct", oracle=r"""
WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS aday FROM events)
SELECT CAST(d.day AS VARCHAR) AS day,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_7d
FROM days d JOIN act a ON a.aday BETWEEN d.day - 6 AND d.day
GROUP BY d.day ORDER BY day
""")
def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (the DAU/WAU
    primitive). A windowed COUNT DISTINCT has no distributive form, so
    the Spark-first shape is contribution EXPANSION: each (user, day)
    activity row is flat-mapped to the 7 target days it supports
    (``explode(sequence(day, day+6))`` — in-row, bounded ×7), target
    days are semi-joined to real calendar days, and the count-distinct
    runs per target day. The oracle states the equivalent range-join
    formulation. For window widths where ×w expansion is too fat, the
    registered mergeable-HLL path (``q_stream_hll``/``q_hll_distinct``)
    is the approximate alternative.

    Scale shape: one distinct pass (map-side combined), a ×7 in-row
    flat map, one count-distinct shuffle keyed by day — no range join,
    no per-day rescans."""
    act = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("aday"))
        .distinct()
    )
    days = act.select(F.col("aday").alias("day")).distinct()
    contrib = act.select(
        "user_id",
        F.explode(
            F.sequence(F.col("aday"), F.date_add(F.col("aday"), 6))
        ).alias("day"),
    )
    return (
        contrib.join(F.broadcast(days), "day", "left_semi")
        .groupBy("day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("active_7d"))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "active_7d")
        .orderBy("day")
    )


@query("q_locf_fill", oracle=r"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997 GROUP BY 1
),
cal AS (
  SELECT unnest(generate_series(DATE '1997-01-01', DATE '1997-12-31',
                                INTERVAL 1 DAY))::DATE AS day
),
joined AS (
  SELECT c.day, d.rev FROM cal c LEFT JOIN d ON d.day = c.day
),
filled AS (
  SELECT day, rev,
         last_value(rev IGNORE NULLS)
           OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS rev_filled,
         CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS was_gap
  FROM joined
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(was_gap) AS BIGINT) AS n_gaps,
       CAST(sum(rev_filled) AS BIGINT) AS filled_total,
       CAST(sum(coalesce(rev, 0)) AS BIGINT) AS raw_total
FROM filled WHERE rev_filled IS NOT NULL
""")
def q_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward gap repair over the 1997 daily
    revenue series: densify to the full calendar (the ``q_gap_fill``
    primitive), then fill each missing day with the latest prior
    observation (``last_value IGNORE NULLS`` over an ordered frame) —
    the standard sensor/finance forward-fill. Reported: day/gap counts
    and the exact filled-vs-raw totals (their difference IS the imputed
    mass).

    Scale shape: the calendar is generated in-row (``sequence`` explode
    of one row, 365 days); the fill window runs on the calendar-bounded
    single-year series pinned via ``api.one_partition`` — a multi-year
    or multi-series variant partitions by (series, year) exactly like
    ``q_cusum_changepoint``. All revenue micro-unit BIGINT."""
    d = (
        load(spark, sf_dir, "orders")
        .where(F.year("o_orderdate") == 1997)
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("rev")
        )
    )
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1997-01-01").cast("date"),
                F.lit("1997-12-31").cast("date"),
            )
        ).alias("day")
    )
    joined = cal.join(d, "day", "left")
    w = (
        Window.partitionBy(api.one_partition("day"))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = joined.select(
        "day", "rev",
        F.last("rev", ignorenulls=True).over(w).alias("rev_filled"),
        F.col("rev").isNull().cast("int").alias("was_gap"),
    )
    return filled.where(F.col("rev_filled").isNotNull()).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("was_gap").cast("bigint").alias("n_gaps"),
        F.sum("rev_filled").cast("bigint").alias("filled_total"),
        F.sum(F.coalesce("rev", F.lit(0))).cast("bigint").alias("raw_total"),
    )


@query("q_drawdown", oracle=r"""
WITH d AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1, 2
),
w AS (
  SELECT yr, day, rev,
         CAST(max(rev) OVER (PARTITION BY yr ORDER BY day) AS BIGINT)
           AS peak
  FROM d
),
dd AS (
  SELECT yr, day, peak,
         CAST(floor((peak - rev) * 1000000.0 / peak + 0.5) AS BIGINT)
           AS dd_ppm
  FROM w
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY yr
                               ORDER BY dd_ppm DESC, day) AS rn
  FROM dd
)
SELECT CAST(yr AS BIGINT) AS yr, CAST(day AS VARCHAR) AS worst_day,
       dd_ppm AS max_drawdown_ppm, peak AS peak_at_worst
FROM r WHERE rn = 1 ORDER BY yr
""")
def q_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per year of the daily revenue series: for each
    day, the ppm drop from the year's running peak; the year's worst
    day (ties → earliest) and its drawdown — the risk-profile readout
    (how far below the best day seen so far did we fall?).

    Scale shape: year-partitioned running max over calendar-bounded
    groups (≤366 rows each, the ``q_cusum_changepoint`` discipline);
    the argmax is a per-year rank with a deterministic tie-break; all
    inputs exact micro-unit BIGINTs, one quantized ratio per day."""
    d = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("rev")
        )
    )
    wo = Window.partitionBy("yr").orderBy("day")
    w = d.select(
        "yr", "day", "rev",
        F.max("rev").over(wo).cast("bigint").alias("peak"),
    )
    dd_ppm = F.floor(
        (F.col("peak") - F.col("rev")) * 1000000.0 / F.col("peak")
        + F.lit(0.5)
    ).cast("bigint")
    wr = Window.partitionBy("yr").orderBy(dd_ppm.desc(), F.col("day"))
    r = w.select(
        "yr", "day", "peak", dd_ppm.alias("dd_ppm"),
        F.row_number().over(wr).alias("rn"),
    )
    return (
        r.where(F.col("rn") == 1)
        .select(
            F.col("yr").cast("bigint").alias("yr"),
            F.date_format("day", "yyyy-MM-dd").alias("worst_day"),
            F.col("dd_ppm").alias("max_drawdown_ppm"),
            F.col("peak").alias("peak_at_worst"),
        )
        .orderBy("yr")
    )


@query("q_trend_slope", oracle=r"""
WITH d AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
              AS BIGINT) AS x,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
),
m AS (
  SELECT yr, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM d GROUP BY yr
)
SELECT CAST(yr AS BIGINT) AS yr, n AS n_days,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * sx) / 1000000.0, 4) AS slope_per_day
FROM m ORDER BY yr
""")
def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year OLS trend slope of daily revenue (currency units per
    day): the closed-form slope (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) from
    EXACT sufficient statistics — epoch-day x is BIGINT, micro-unit y
    is BIGINT, and the cross moments accumulate in DECIMAL(38,0)/
    HUGEINT (x·y ≈ 1e17 per day overflows int64 over a year), so the
    one float division per year is order-free. The trend readout that
    pairs with ``q_cusum_changepoint``'s level shifts.

    Scale shape: corpus scan → day-grain aggregate → per-year 5-number
    sufficient-statistics aggregate (map-side combined, ≤7 rows out) —
    the ``q_grouped_ols`` fit dataflow applied to the calendar."""
    d = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.unix_date(F.to_date("o_orderdate")).cast("bigint").alias("x"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("y")
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = d.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    slope = (
        (nd * F.col("sxy").cast("double")
         - F.col("sx").cast("double") * F.col("sy"))
        / (nd * F.col("sxx").cast("double")
           - F.col("sx").cast("double") * F.col("sx"))
    )
    return m.select(
        F.col("yr").cast("bigint").alias("yr"),
        F.col("n").alias("n_days"),
        F.round(slope / 1000000.0, 4).alias("slope_per_day"),
    ).orderBy("yr")


@query("q_volatility", oracle=r"""
WITH d AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1, 2
),
diffs AS (
  SELECT yr,
         rev - lag(rev) OVER (PARTITION BY yr ORDER BY day) AS delta
  FROM d
),
m AS (
  SELECT yr, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(delta) AS BIGINT) AS s,
         sum(CAST(delta AS HUGEINT) * delta) AS ss
  FROM diffs WHERE delta IS NOT NULL GROUP BY yr
)
SELECT CAST(yr AS BIGINT) AS yr, n AS n_diffs,
       round(sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                  / (n - 1)) / 1000000.0, 4) AS volatility
FROM m ORDER BY yr
""")
def q_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year revenue volatility: sample standard deviation of
    day-over-day revenue changes, in currency units. Deltas are exact
    micro-unit BIGINTs from a year-partitioned lag (calendar-bounded
    groups); moments accumulate exactly (Σδ BIGINT, Σδ² DECIMAL(38,0))
    — and because day-over-day deltas are near-zero-mean, the
    (Σδ)²/n correction term is orders of magnitude below Σδ², so the
    closed form carries no cancellation hazard (unlike raw-value
    variance, see ``q_jackknife_ci``'s centered-sum note).

    Scale shape: day-grain aggregate → per-year lag window (≤366-row
    partitions) → per-year 3-number aggregate; one sqrt per year."""
    d = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.to_date("o_orderdate").alias("day"),
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 1000000.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("rev")
        )
    )
    w = Window.partitionBy("yr").orderBy("day")
    diffs = d.select(
        "yr", (F.col("rev") - F.lag("rev").over(w)).alias("delta")
    ).where(F.col("delta").isNotNull())
    m = diffs.groupBy("yr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("delta").cast("bigint").alias("s"),
        F.sum(
            F.col("delta").cast("decimal(38,0)")
            * F.col("delta").cast("decimal(38,0)")
        ).alias("ss"),
    )
    vol = F.sqrt(
        (F.col("ss").cast("double")
         - F.col("s").cast("double") * F.col("s") / F.col("n"))
        / (F.col("n") - 1)
    )
    return m.select(
        F.col("yr").cast("bigint").alias("yr"),
        F.col("n").alias("n_diffs"),
        F.round(vol / 1000000.0, 4).alias("volatility"),
    ).orderBy("yr")


@query("q_forecast_skill", oracle=r"""
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
),
p AS (
  SELECT a.x AS actual, b1.x AS naive1, b7.x AS naive7
  FROM d a
  JOIN d b1 ON b1.day = a.day - 1
  JOIN d b7 ON b7.day = a.day - 7
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(actual - naive1 AS HUGEINT) * (actual - naive1)) AS sse1,
         sum(CAST(actual - naive7 AS HUGEINT) * (actual - naive7)) AS sse7
  FROM p
)
SELECT n AS n_days,
       round(sqrt(CAST(sse1 AS DOUBLE) / n), 4) AS rmse_naive1,
       round(sqrt(CAST(sse7 AS DOUBLE) / n), 4) AS rmse_naive7,
       round(sqrt(CAST(sse7 AS DOUBLE)) / sqrt(CAST(sse1 AS DOUBLE)), 4)
         AS theil_u
FROM m
""")
def q_forecast_skill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-skill comparison on the daily order series: RMSE of the
    lag-1 naive forecast vs the lag-7 seasonal-naive forecast over days
    where BOTH comparators exist, plus their Theil-U-style ratio
    (< 1 ⇒ the weekly-seasonal forecast beats persistence — the
    baseline bar any real model must clear, and the decision input for
    ``q_ewma_forecast``'s smoothing horizon).

    Engine exactness: forecast errors are exact BIGINT differences via
    calendar equi-joins (the ``q_autocorr`` lag-as-join discipline, no
    windows); squared-error sums accumulate in DECIMAL(38,0)/HUGEINT;
    three float expressions out. Scale shape: day-grain aggregate +
    two self equi-joins on the calendar-sized table."""
    d = _daily_counts(spark, sf_dir)
    a, b1, b7 = d.alias("a"), d.alias("b1"), d.alias("b7")
    p = (
        a.join(b1, F.col("b1.day") == F.date_sub(F.col("a.day"), 1))
        .join(b7, F.col("b7.day") == F.date_sub(F.col("a.day"), 7))
        .select(
            F.col("a.x").alias("actual"),
            F.col("b1.x").alias("naive1"),
            F.col("b7.x").alias("naive7"),
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    e1 = F.col("actual") - F.col("naive1")
    e7 = F.col("actual") - F.col("naive7")
    m = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec(e1) * dec(e1)).alias("sse1"),
        F.sum(dec(e7) * dec(e7)).alias("sse7"),
    )
    return m.select(
        F.col("n").alias("n_days"),
        F.round(F.sqrt(F.col("sse1").cast("double") / F.col("n")), 4)
        .alias("rmse_naive1"),
        F.round(F.sqrt(F.col("sse7").cast("double") / F.col("n")), 4)
        .alias("rmse_naive7"),
        F.round(
            F.sqrt(F.col("sse7").cast("double"))
            / F.sqrt(F.col("sse1").cast("double")),
            4,
        ).alias("theil_u"),
    )


@query("q_cross_correlation", oracle=r"""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS v
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY 1, 2
),
x AS (SELECT day, v FROM d WHERE event_type = 'view'),
y AS (SELECT day, v FROM d WHERE event_type = 'purchase'),
lags AS (SELECT unnest(range(-5, 6)) AS lag),
p AS (
  SELECT l.lag, x.v AS xv, y.v AS yv
  FROM x JOIN lags l ON TRUE
  JOIN y ON y.day = x.day + CAST(l.lag AS INTEGER)
),
m AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(xv) AS BIGINT) AS s1, CAST(sum(yv) AS BIGINT) AS s2,
         sum(CAST(xv AS HUGEINT) * xv) AS s11,
         sum(CAST(yv AS HUGEINT) * yv) AS s22,
         sum(CAST(xv AS HUGEINT) * yv) AS s12
  FROM p GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n_days,
       round((CAST(n_days AS DOUBLE) * CAST(s12 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * s2)
             / sqrt((CAST(n_days AS DOUBLE) * CAST(s11 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * s1)
                    * (CAST(n_days AS DOUBLE) * CAST(s22 AS DOUBLE)
                       - CAST(s2 AS DOUBLE) * s2)), 4) AS xcf
FROM m ORDER BY lag
""")
def q_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between two series — daily view-value
    vs daily purchase-value at lags −5..+5 — the lead/lag dependency
    probe behind "does browsing predict buying, and by how many days?"
    (the cross-series complement of ``q_autocorr``'s correlogram; the
    peak-lag reading feeds ``q_attribution``-style causal questions).

    Scale shape: the corpus reduces map-side to TWO calendar-grain
    series before anything quadratic-ish happens; the ±5 lags attach
    in-row (array-literal explode, the q_autocorr discipline) and join
    on ``day + lag`` — no window, no sort, no BNLJ. Moments are exact
    (BIGINT cent sums, DECIMAL(38,0) cross products); Pearson r is one
    float expression per OUTPUT row."""
    d = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
                .cast("bigint")
            )
            .cast("bigint")
            .alias("v")
        )
    )
    x = d.where(F.col("event_type") == "view").select("day", "v")
    y = d.where(F.col("event_type") == "purchase").select(
        F.col("day").alias("yday"), F.col("v").alias("yv")
    )
    lag_arr = F.array(*[F.lit(i) for i in range(-5, 6)])
    a = x.select(
        F.col("day").alias("xday"),
        F.col("v").alias("xv"),
        F.explode(lag_arr).alias("lag"),
    )
    p = a.join(
        y, F.col("yday") == F.date_add(F.col("xday"), F.col("lag"))
    ).select("lag", "xv", "yv")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = p.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("xv").cast("bigint").alias("s1"),
        F.sum("yv").cast("bigint").alias("s2"),
        F.sum(dec("xv") * dec("xv")).alias("s11"),
        F.sum(dec("yv") * dec("yv")).alias("s22"),
        F.sum(dec("xv") * dec("yv")).alias("s12"),
    )
    nd = F.col("n_days").cast("double")
    num = (
        nd * F.col("s12").cast("double")
        - F.col("s1").cast("double") * F.col("s2")
    )
    den = F.sqrt(
        (nd * F.col("s11").cast("double")
         - F.col("s1").cast("double") * F.col("s1"))
        * (nd * F.col("s22").cast("double")
           - F.col("s2").cast("double") * F.col("s2"))
    )
    return m.select(
        F.col("lag").cast("bigint").alias("lag"),
        "n_days",
        F.round(num / den, 4).alias("xcf"),
    ).orderBy("lag")
