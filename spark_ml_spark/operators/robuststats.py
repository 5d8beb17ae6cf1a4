"""Round-5 wave-51: robust & resampling statistics.

``q_theilsen_slope`` — Theil–Sen trend estimator (median of all
pairwise slopes), the breakdown-robust alternative to the per-year OLS
slopes of ``q_trend_slope``: one contaminated day moves OLS arbitrarily
but shifts the pairwise-slope median by at most one order statistic.

``q_kruskal_wallis`` — rank-based one-way ANOVA (H test) across event
types, the distribution-free twin of ``q_anova_dow``: uses the repo's
doubled-rank histogram-grain discipline (``q_auc``), so NO row-level
ranking ever happens — the corpus reduces to a value histogram first.

``q_poisson_bootstrap`` — deterministic Poisson(1) bootstrap for the
standard error of a mean: the resampling scheme that actually works on
a cluster (per-row independent weights, no global resample indices —
Chamandy et al. 2012, "Estimating uncertainty for massive data
streams"). Replica weights derive from md5(key, replica) via the exact
inverse Poisson CDF, so both engines draw identical "randomness".

The reference computes no uncertainty or robust statistics
(``Data_transform.py`` passim — point RMSE only, :163-178); nearest
siblings: ``q_trend_slope`` (OLS), ``q_jackknife_ci`` (leave-one-out),
``q_anova_dow`` (parametric F).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.operators.selection import _HEX8
from spark_ml_spark.registry import query


@query("q_theilsen_slope", oracle=r"""
WITH daily AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(date_diff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day_idx,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1, 2
),
pairs AS (
  SELECT a.yr,
         (b.rev_cents - a.rev_cents) * 1.0 / (b.day_idx - a.day_idx)
           AS slope
  FROM daily a JOIN daily b
    ON a.yr = b.yr AND a.day_idx < b.day_idx
),
ranked AS (
  SELECT yr, slope,
         row_number() OVER (PARTITION BY yr ORDER BY slope) AS rk,
         CAST(count(*) OVER (PARTITION BY yr) AS BIGINT) AS n_pairs
  FROM pairs
)
SELECT yr,
       n_pairs,
       ROUND(avg(slope), 4) AS theilsen_cents_per_day
FROM ranked
WHERE rk * 2 = n_pairs OR rk * 2 = n_pairs + 1 OR rk * 2 = n_pairs + 2
GROUP BY yr, n_pairs
ORDER BY yr
""")
def q_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-year Theil–Sen revenue trend: the median of all pairwise
    slopes (rev_j - rev_i)/(day_j - day_i) over the daily-revenue
    series, with the even-count median as the mean of the two middle
    order statistics (the lower-median rows ``rk*2 ∈ {n, n+1, n+2}``
    select exactly the middle one or two). Robust to a 29% fraction of
    contaminated days where ``q_trend_slope``'s OLS is robust to none.

    Scale shape: the corpus collapses to the CALENDAR grain first (one
    map-side-combined aggregate; ≤366 rows/year at any data size), so
    the quadratic pair join is calendar-bounded — ~66k pairs/year
    forever, independent of row count. Slopes are exact-integer-cents
    ratios, so the cross-engine double values are bit-identical; the
    per-year ranking window runs on the bounded pair table."""
    daily = (
        load(spark, sf_dir, "orders")
        .select(
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
            )
            .cast("bigint")
            .alias("day_idx"),
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("pc"),
        )
        .groupBy("yr", "day_idx")
        .agg(F.sum("pc").cast("bigint").alias("rev_cents"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.yr") == F.col("b.yr"))
        & (F.col("a.day_idx") < F.col("b.day_idx")),
    ).select(
        F.col("a.yr").alias("yr"),
        (
            (F.col("b.rev_cents") - F.col("a.rev_cents")).cast("double")
            / (F.col("b.day_idx") - F.col("a.day_idx")).cast("double")
        ).alias("slope"),
    )
    w_rk = Window.partitionBy("yr").orderBy("slope")
    w_n = Window.partitionBy("yr")
    ranked = pairs.select(
        "yr",
        "slope",
        F.row_number().over(w_rk).alias("rk"),
        F.count(F.lit(1)).over(w_n).cast("bigint").alias("n_pairs"),
    )
    mid = ranked.where(
        (F.col("rk") * 2 == F.col("n_pairs"))
        | (F.col("rk") * 2 == F.col("n_pairs") + 1)
        | (F.col("rk") * 2 == F.col("n_pairs") + 2)
    )
    return (
        mid.groupBy("yr", "n_pairs")
        .agg(F.round(F.avg("slope"), 4).alias("theilsen_cents_per_day"))
        .select("yr", "n_pairs", "theilsen_cents_per_day")
        .orderBy("yr")
    )


@query("q_kruskal_wallis", oracle=r"""
WITH obs AS (
  SELECT event_type AS grp,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
  FROM events WHERE value IS NOT NULL
),
hist AS (
  SELECT vc, CAST(count(*) AS BIGINT) AS n_v FROM obs GROUP BY vc
),
cum AS (
  SELECT vc, n_v,
         CAST(coalesce(sum(n_v) OVER (ORDER BY vc
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS below
  FROM hist
),
gv AS (
  SELECT grp, vc, CAST(count(*) AS BIGINT) AS n_gv FROM obs GROUP BY 1, 2
),
gsum AS (
  SELECT g.grp,
         CAST(sum(g.n_gv) AS BIGINT) AS n_g,
         CAST(sum(g.n_gv * (2 * c.below + c.n_v + 1)) AS BIGINT) AS r2_g
  FROM gv g JOIN cum c ON g.vc = c.vc
  GROUP BY g.grp
),
tot AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n,
         sum(r2_g * r2_g / (4.0 * n_g)) AS s,
         CAST(count(*) AS BIGINT) AS k
  FROM gsum
),
ties AS (
  SELECT CAST(sum(n_v * n_v * n_v - n_v) AS BIGINT) AS t3t FROM hist
)
SELECT tot.k AS n_groups,
       tot.n AS n_obs,
       ROUND(12.0 * tot.s / (tot.n * (tot.n + 1.0))
             - 3.0 * (tot.n + 1.0), 4) AS h_stat,
       ROUND((12.0 * tot.s / (tot.n * (tot.n + 1.0))
              - 3.0 * (tot.n + 1.0))
             / (1.0 - ties.t3t
                / (CAST(tot.n AS DOUBLE) * tot.n * tot.n - tot.n)), 4)
         AS h_tie_corrected
FROM tot, ties
""")
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis H across event types (does ``value`` differ by
    type?): rank-based one-way ANOVA with tie correction, the
    distribution-free complement to ``q_anova_dow``'s parametric F.
    H = 12/(N(N+1))·Σ R_g²/n_g − 3(N+1), tie-corrected by
    1 − Σ(t³−t)/(N³−N).

    Scale shape: the ``q_auc`` doubled-rank discipline — per-value
    midranks come from a VALUE HISTOGRAM (below-count + (n_v+1)/2, kept
    integer by doubling), so a billion rows reduce map-side to ≤ the
    cents-quantized value domain (~56k rows here) before the one bounded
    cumulative window runs; per-group rank sums are exact BIGINT joins
    on that histogram. Only the final H leaves integers, as one
    deterministic double expression per group count (k=5 terms)."""
    obs = (
        load(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("grp"),
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("vc"),
        )
    )
    hist = obs.groupBy("vc").agg(F.count(F.lit(1)).cast("bigint").alias("n_v"))
    cum = hist.withColumn(
        "below",
        F.coalesce(
            F.sum("n_v").over(
                Window.partitionBy(api.one_partition("vc"))
                .orderBy("vc")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("bigint"),
    )
    gv = obs.groupBy("grp", "vc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gv")
    )
    gsum = (
        gv.join(cum, "vc")
        .groupBy("grp")
        .agg(
            F.sum("n_gv").cast("bigint").alias("n_g"),
            F.sum(
                F.col("n_gv") * (2 * F.col("below") + F.col("n_v") + 1)
            )
            .cast("bigint")
            .alias("r2_g"),
        )
    )
    tot = gsum.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum(
            F.col("r2_g").cast("double")
            * F.col("r2_g").cast("double")
            / (F.lit(4.0) * F.col("n_g").cast("double"))
        ).alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    ties = hist.agg(
        F.sum(
            F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v")
        )
        .cast("bigint")
        .alias("t3t")
    )
    h = (
        F.lit(12.0) * F.col("s") / (F.col("n") * (F.col("n") + F.lit(1.0)))
        - F.lit(3.0) * (F.col("n") + F.lit(1.0))
    )
    tie_div = F.lit(1.0) - F.col("t3t") / (
        F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n")
    )
    return tot.crossJoin(ties).select(
        F.col("k").alias("n_groups"),
        F.col("n").alias("n_obs"),
        F.round(h, 4).alias("h_stat"),
        F.round(h / tie_div, 4).alias("h_tie_corrected"),
    )


#: bootstrap replica count (fixed, deterministic)
_BOOT_R = 24

#: inverse Poisson(1) CDF thresholds: cdf(k) = e^-1 · Σ_{i≤k} 1/i! for
#: k = 0..6; a uniform u maps to the weight = #thresholds below u (cap 7).
#: 17-digit literals are exactly representable and IDENTICAL in both
#: engines, so weight draws can never disagree cross-engine.
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


@query("q_poisson_bootstrap", oracle=rf"""
WITH reps AS (SELECT unnest(range(0, {_BOOT_R})) AS r),
draws AS (
  SELECT reps.r,
         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS pc,
         ({_HEX8.format(g="CAST(o.o_orderkey AS VARCHAR) || ':' "
                          "|| CAST(reps.r AS VARCHAR)")} + 0.5)
           / 4294967296.0 AS u
  FROM orders o CROSS JOIN reps
),
weighted AS (
  SELECT r, pc,
         CASE
           WHEN u < {_POIS_CDF[0]!r} THEN 0 WHEN u < {_POIS_CDF[1]!r} THEN 1
           WHEN u < {_POIS_CDF[2]!r} THEN 2 WHEN u < {_POIS_CDF[3]!r} THEN 3
           WHEN u < {_POIS_CDF[4]!r} THEN 4 WHEN u < {_POIS_CDF[5]!r} THEN 5
           WHEN u < {_POIS_CDF[6]!r} THEN 6 ELSE 7 END AS w
  FROM draws
),
replica AS (
  SELECT r,
         CAST((sum(w * pc) * 2 + sum(w)) // (2 * sum(w)) AS BIGINT)
           AS mean_cents
  FROM weighted GROUP BY r
),
point AS (
  SELECT CAST((sum(pc) * 2 + count(*)) // (2 * count(*)) AS BIGINT)
           AS point_mean_cents
  FROM (SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS pc
        FROM orders)
),
ranked AS (
  SELECT mean_cents,
         row_number() OVER (ORDER BY mean_cents, r) AS rk
  FROM replica
),
boot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_replicas,
         CAST(sum(mean_cents) AS BIGINT) AS sum_m,
         CAST(sum(mean_cents * mean_cents) AS BIGINT) AS sum_m2,
         CAST(min(CASE WHEN rk = 2 THEN mean_cents END) AS BIGINT)
           AS ci_lo_cents,
         CAST(min(CASE WHEN rk = {_BOOT_R - 1} THEN mean_cents END)
              AS BIGINT) AS ci_hi_cents
  FROM ranked
)
SELECT boot.n_replicas,
       point.point_mean_cents,
       CAST((boot.sum_m * 2 + boot.n_replicas)
            // (2 * boot.n_replicas) AS BIGINT) AS boot_mean_cents,
       ROUND(sqrt((boot.sum_m2
                   - boot.sum_m * boot.sum_m * 1.0 / boot.n_replicas)
                  / (boot.n_replicas - 1.0)), 4) AS boot_se_cents,
       boot.ci_lo_cents,
       boot.ci_hi_cents
FROM boot, point
""")
def q_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson(1) bootstrap standard error for the mean order price:
    each (row, replica) draws an independent Poisson(1) weight via the
    exact inverse CDF at a deterministic md5-derived uniform, each
    replica's weighted mean is one bootstrap resample, and the replica
    spread gives the SE plus an order-statistic CI (2nd smallest / 2nd
    largest of 24). This is the bootstrap that distributes: classic
    resampling needs global sample indices; Poisson bootstrap needs one
    hash per row — Chamandy et al. 2012.

    Scale shape: the replica fan-out is a bounded ×24 in-row explode
    (Expand node, map-only) feeding one map-side-combined aggregate to
    24 rows; no shuffle grows with replicas beyond the constant factor,
    and at 100 TB you'd fold the 24 weights into one pass per row the
    same way. Replica means are quantized to round-half-up integer
    cents ((2·Σwp + Σw) DIV (2·Σw) — pure BIGINT), so variance inputs
    are exact; u is a dyadic rational identical cross-engine."""
    reps = F.explode(
        F.sequence(F.lit(0), F.lit(_BOOT_R - 1))
    ).alias("r")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("k"), F.col("r").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    draws = (
        load(spark, sf_dir, "orders")
        .select(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("pc"),
            F.col("o_orderkey").cast("string").alias("k"),
        )
        .select("pc", "k", reps)
        .select("pc", "r", u.alias("u"))
    )
    w = F.lit(7)
    for k in range(6, -1, -1):
        w = F.when(F.col("u") < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    weighted = draws.select("r", "pc", w.alias("w"))
    replica = weighted.groupBy("r").agg(
        F.expr("CAST((sum(w * pc) * 2 + sum(w)) DIV (2 * sum(w)) AS BIGINT)")
        .alias("mean_cents")
    )
    point = (
        load(spark, sf_dir, "orders")
        .select(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("pc")
        )
        .agg(
            F.expr(
                "CAST((sum(pc) * 2 + count(*)) DIV (2 * count(*)) AS BIGINT)"
            ).alias("point_mean_cents")
        )
    )
    ranked = replica.select(
        "mean_cents",
        F.row_number()
        .over(
            Window.partitionBy(api.one_partition("r")).orderBy(
                "mean_cents", "r"
            )
        )
        .alias("rk"),
    )
    boot = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_replicas"),
        F.sum("mean_cents").cast("bigint").alias("sum_m"),
        F.sum(F.col("mean_cents") * F.col("mean_cents"))
        .cast("bigint")
        .alias("sum_m2"),
        F.min(F.when(F.col("rk") == 2, F.col("mean_cents")))
        .cast("bigint")
        .alias("ci_lo_cents"),
        F.min(F.when(F.col("rk") == _BOOT_R - 1, F.col("mean_cents")))
        .cast("bigint")
        .alias("ci_hi_cents"),
    )
    return boot.crossJoin(point).select(
        "n_replicas",
        "point_mean_cents",
        F.expr(
            "CAST((sum_m * 2 + n_replicas) DIV (2 * n_replicas) AS BIGINT)"
        ).alias("boot_mean_cents"),
        F.round(
            F.sqrt(
                (
                    F.col("sum_m2")
                    - F.col("sum_m").cast("double")
                    * F.col("sum_m")
                    / F.col("n_replicas")
                )
                / (F.col("n_replicas") - F.lit(1.0))
            ),
            4,
        ).alias("boot_se_cents"),
        "ci_lo_cents",
        "ci_hi_cents",
    )


@query("q_huber_mean", oracle=r"""
WITH med AS (
  SELECT quantile_cont(o_totalprice, 0.5) AS med FROM orders
),
mad AS (
  SELECT max(m.med) AS med,
         quantile_cont(abs(o.o_totalprice - m.med), 0.5) AS mad
  FROM orders o, med m
),
clipped AS (
  SELECT CAST(floor(
           CASE WHEN o.o_totalprice < m.med - 1.345 * 1.4826 * m.mad
                THEN m.med - 1.345 * 1.4826 * m.mad
                WHEN o.o_totalprice > m.med + 1.345 * 1.4826 * m.mad
                THEN m.med + 1.345 * 1.4826 * m.mad
                ELSE o.o_totalprice END * 100.0 + 0.5) AS BIGINT) AS wc,
         CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS pc,
         CASE WHEN abs(o.o_totalprice - m.med)
                   > 1.345 * 1.4826 * m.mad THEN 1 ELSE 0 END AS clip
  FROM orders o, mad m
)
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(clip) AS BIGINT) AS n_clipped,
       CAST((sum(pc) * 2 + count(*)) // (2 * count(*)) AS BIGINT)
         AS mean_cents,
       CAST((sum(wc) * 2 + count(*)) // (2 * count(*)) AS BIGINT)
         AS huber_cents,
       ROUND((SELECT med FROM mad), 4) AS median_price,
       ROUND((SELECT mad FROM mad), 4) AS mad_price
FROM clipped
""")
def q_huber_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step Huber M-estimate of the mean order price: start at the
    exact interpolated median, Winsorize at med ± 1.345·1.4826·MAD
    (Huber's 95%-efficiency constant × the normal-consistency scale),
    and average the clipped values — the robust location estimate that
    keeps √n-efficiency where ``q_mad_outliers`` only FLAGS the tails
    and a trimmed mean throws data away. Reported next to the raw mean
    so the gap reads as tail influence.

    Scale shape: two percentile passes (Spark's ``percentile`` matches
    DuckDB ``quantile_cont`` bit-for-bit on the same doubles) feed one
    broadcast scalar row; the clip + quantize + sum pass is map-only
    with exact BIGINT cents and round-half-up integer division (the
    q_poisson_bootstrap discipline)."""
    orders = load(spark, sf_dir, "orders").select("o_totalprice")
    med = orders.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    mad = (
        orders.crossJoin(F.broadcast(med))
        .agg(
            F.max("med").alias("med"),
            F.expr(
                "percentile(abs(o_totalprice - med), 0.5)"
            ).alias("mad"),
        )
    )
    lo = F.col("med") - F.lit(1.345) * F.lit(1.4826) * F.col("mad")
    hi = F.col("med") + F.lit(1.345) * F.lit(1.4826) * F.col("mad")
    clipped = orders.crossJoin(F.broadcast(mad)).select(
        F.floor(
            F.when(F.col("o_totalprice") < lo, lo)
            .when(F.col("o_totalprice") > hi, hi)
            .otherwise(F.col("o_totalprice"))
            * F.lit(100.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("wc"),
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("pc"),
        (
            F.abs(F.col("o_totalprice") - F.col("med"))
            > F.lit(1.345) * F.lit(1.4826) * F.col("mad")
        )
        .cast("bigint")
        .alias("clip"),
        "med",
        "mad",
    )
    return clipped.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("clip").cast("bigint").alias("n_clipped"),
        F.expr(
            "CAST((sum(pc) * 2 + count(*)) DIV (2 * count(*)) AS BIGINT)"
        ).alias("mean_cents"),
        F.expr(
            "CAST((sum(wc) * 2 + count(*)) DIV (2 * count(*)) AS BIGINT)"
        ).alias("huber_cents"),
        F.round(F.max("med"), 4).alias("median_price"),
        F.round(F.max("mad"), 4).alias("mad_price"),
    )
