"""Round-5 wave-57: warehouse depth & randomization inference —
semi-additive measures, snowflake-schema join chains, and a
deterministic permutation test.

``q_semi_additive_agg`` — the period-end-balance aggregate: a balance
is NOT additive over time (summing a month's balances double-counts),
so the correct monthly rollup takes each account's LAST observation in
the period, then sums across accounts — the defining semi-additive
measure pattern of financial marts (Kimball ch. 4 semantics).

``q_snowflake_join`` — the normalized-dimension chain fact ⋈ orders ⋈
customer ⋈ nation ⋈ region: unlike ``q_star_join``'s independent spokes
this resolves a 3-deep outrigger chain; the plan collapses the chain
into successive broadcast hash joins on the fact scan.

``q_permutation_test`` — two-sample randomization test with
md5-deterministic label reshuffles (the ``q_poisson_bootstrap``
scheme): R replicas each re-assign every observation's group by an
independent hash coin with the observed group's marginal probability;
the p-value is the share of replicas whose mean gap is at least the
observed gap. Distribution-free significance with zero global state —
the permutation scheme that actually distributes.

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_star_join``, ``q_upsert_latest`` (last-record view),
``q_welch_ttest`` (parametric twin), ``q_poisson_bootstrap``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.operators.selection import _HEX8
from spark_ml_spark.registry import query

#: permutation replicas (fixed, deterministic)
_PERM_R = 64


@query("q_semi_additive_agg", oracle=r"""
WITH obs AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
           AS ym,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS bal_cents,
         row_number() OVER (
           PARTITION BY o_custkey, year(o_orderdate), month(o_orderdate)
           ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
  FROM orders
)
SELECT ym,
       CAST(count(*) AS BIGINT) AS n_accounts,
       CAST(sum(bal_cents) AS BIGINT) AS eop_balance_cents,
       CAST(min(bal_cents) AS BIGINT) AS min_balance_cents,
       CAST(max(bal_cents) AS BIGINT) AS max_balance_cents
FROM obs WHERE rk = 1
GROUP BY ym
ORDER BY ym
""")
def q_semi_additive_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-of-period balance rollup — the semi-additive measure: per
    (customer, month) keep only the LAST observation (by date, then
    order key), then aggregate ACROSS customers per month. Summing all
    of a month's rows would double-count an account that posted twice;
    this is the one aggregation rule a balance-sheet mart must get
    right.

    Scale shape: the last-observation pick is a window partitioned BY
    ENTITY-PERIOD (bounded per-key state, the ``q_upsert_latest`` /
    ``q_cdc_apply`` discipline — never a global sort); the monthly
    rollup is a map-side-combined aggregate on the calendar-sized
    grain. All BIGINT cents."""
    w = Window.partitionBy(
        "o_custkey", F.year("o_orderdate"), F.month("o_orderdate")
    ).orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    obs = load(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
        .cast("bigint")
        .alias("ym"),
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("bal_cents"),
        F.row_number().over(w).alias("rk"),
    )
    return (
        obs.where(F.col("rk") == 1)
        .groupBy("ym")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_accounts"),
            F.sum("bal_cents").cast("bigint").alias("eop_balance_cents"),
            F.min("bal_cents").cast("bigint").alias("min_balance_cents"),
            F.max("bal_cents").cast("bigint").alias("max_balance_cents"),
        )
        .orderBy("ym")
    )


@query("q_snowflake_join", oracle=r"""
SELECT r.r_name AS region,
       CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(floor(l.l_extendedprice
                           * (1.0 - l.l_discount) * 100.0 + 0.5)
                     AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name, year(o.o_orderdate)
ORDER BY region, order_year
""")
def q_snowflake_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake-schema resolution: revenue by region and year through
    the normalized 4-hop chain lineitem → orders → customer → nation →
    region. The star twin (``q_star_join``) joins independent spokes;
    a snowflake must resolve outrigger chains — the shape a normalized
    warehouse produces before anyone denormalizes.

    Scale shape: customer⋈nation⋈region collapses FIRST into one
    customer-sized broadcast side (Catalyst reorders the small-table
    chain), so the fact table streams through broadcast hash joins —
    the only corpus-sized exchange is the orders equi-join on the
    order key (both sides bucketable at 100 TB, cf.
    ``q_bucketed_join``). Revenue quantizes per-row to BIGINT cents
    before the map-side-combined rollup."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * F.lit(100.0)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("rev_cents"),
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    dim = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", F.col("r_name").alias("region"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(dim, o.o_custkey == dim.c_custkey)
        .groupBy("region", "order_year")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("rev_cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("region", "order_year")
    )


@query("q_permutation_test", oracle=rf"""
WITH obs AS (
  SELECT event_id,
         CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
              AS BIGINT) AS g,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
  FROM events
  WHERE event_type IN ('purchase', 'view') AND value IS NOT NULL
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(g) AS BIGINT) AS n_a,
         CAST(sum(g * vc) AS BIGINT) AS s_a,
         CAST(sum(vc) AS BIGINT) AS s
  FROM obs
),
obs_stat AS (
  SELECT n, n_a, n - n_a AS n_b,
         CAST(floor(abs(CAST(s_a AS DOUBLE) / n_a
                        - CAST(s - s_a AS DOUBLE) / (n - n_a))
                    * 10000.0 + 0.5) AS BIGINT) AS obs_gap_c4
  FROM m
),
reps AS (SELECT unnest(range(0, {_PERM_R})) AS r),
draws AS (
  SELECT reps.r, obs.vc,
         CASE WHEN ({_HEX8.format(g="CAST(obs.event_id AS VARCHAR) "
                                    "|| '#' || CAST(reps.r AS VARCHAR)")}
                    + 0.5) / 4294967296.0
                   < (SELECT CAST(n_a AS DOUBLE) / n FROM m)
              THEN 1 ELSE 0 END AS g
  FROM obs CROSS JOIN reps
),
rep_stats AS (
  SELECT r,
         CAST(floor(abs(CAST(sum(g * vc) AS DOUBLE) / sum(g)
                        - CAST(sum(vc) - sum(g * vc) AS DOUBLE)
                          / (count(*) - sum(g)))
                    * 10000.0 + 0.5) AS BIGINT) AS gap_c4
  FROM draws GROUP BY r
)
SELECT o.n, o.n_a, o.n_b, o.obs_gap_c4,
       CAST({_PERM_R} AS BIGINT) AS n_replicas,
       CAST(sum(CASE WHEN rs.gap_c4 >= o.obs_gap_c4 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_extreme,
       CAST(floor((sum(CASE WHEN rs.gap_c4 >= o.obs_gap_c4
                            THEN 1 ELSE 0 END) + 1) * 1000000.0
                  / ({_PERM_R} + 1) + 0.5) AS BIGINT) AS p_value_ppm
FROM rep_stats rs, obs_stat o
GROUP BY o.n, o.n_a, o.n_b, o.obs_gap_c4
""")
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomization test for the purchase-vs-view mean-value gap:
    {r} replicas each re-assign every row's group label by an
    independent md5 hash coin with the observed purchase share as its
    probability, and the one-sided p-value is the (add-one smoothed)
    share of replicas whose |mean gap| reaches the observed |gap|.
    Label exchangeability under H₀ is exactly what the reshuffle
    simulates; no normality assumption (the ``q_welch_ttest``
    parametric twin assumes it).

    Scale shape: the replica fan-out is a bounded ×{r} in-row explode
    feeding ONE map-side-combined aggregate to {r} rows — the
    q_poisson_bootstrap shape; per-replica gaps quantize to integer
    1e-4-cent units in a single double expression over exact BIGINT
    sums, so the replica table is engine-identical before the final
    count. One corpus pass total."""
    obs = (
        load(spark, sf_dir, "events")
        .where(
            F.col("event_type").isin("purchase", "view")
            & F.col("value").isNotNull()
        )
        .select(
            "event_id",
            (F.col("event_type") == "purchase").cast("bigint").alias("g"),
            F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("vc"),
        )
    )
    m = obs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("n_a"),
        F.sum(F.col("g") * F.col("vc")).cast("bigint").alias("s_a"),
        F.sum("vc").cast("bigint").alias("s"),
    )
    gap_c4 = lambda sa, na, sb, nb: F.floor(  # noqa: E731
        F.abs(sa.cast("double") / na - sb.cast("double") / nb)
        * F.lit(10000.0)
        + F.lit(0.5)
    ).cast("bigint")
    obs_stat = m.select(
        "n",
        "n_a",
        (F.col("n") - F.col("n_a")).alias("n_b"),
        gap_c4(
            F.col("s_a"),
            F.col("n_a"),
            F.col("s") - F.col("s_a"),
            F.col("n") - F.col("n_a"),
        ).alias("obs_gap_c4"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "#",
                        F.col("event_id").cast("string"),
                        F.col("r").cast("string"),
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
        obs.crossJoin(F.broadcast(m.select("n", "n_a")))
        .select(
            "event_id",
            "vc",
            (F.col("n_a").cast("double") / F.col("n")).alias("p_a"),
            F.explode(
                F.array(*[F.lit(i) for i in range(_PERM_R)])
            ).alias("r"),
        )
        .select(
            "vc", "r", (u < F.col("p_a")).cast("bigint").alias("g")
        )
    )
    rep_stats = draws.groupBy("r").agg(
        gap_c4(
            F.sum(F.col("g") * F.col("vc")),
            F.sum("g"),
            F.sum("vc") - F.sum(F.col("g") * F.col("vc")),
            F.count(F.lit(1)) - F.sum("g"),
        ).alias("gap_c4")
    )
    return (
        rep_stats.crossJoin(F.broadcast(obs_stat))
        .groupBy("n", "n_a", "n_b", "obs_gap_c4")
        .agg(
            F.lit(_PERM_R).cast("bigint").alias("n_replicas"),
            F.sum(
                (F.col("gap_c4") >= F.col("obs_gap_c4")).cast("bigint")
            )
            .cast("bigint")
            .alias("n_extreme"),
            F.floor(
                (
                    F.sum(
                        (F.col("gap_c4") >= F.col("obs_gap_c4")).cast(
                            "bigint"
                        )
                    )
                    + 1
                )
                * F.lit(1000000.0)
                / F.lit(_PERM_R + 1)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("p_value_ppm"),
        )
    )


q_permutation_test.__doc__ = q_permutation_test.__doc__.format(r=_PERM_R)
