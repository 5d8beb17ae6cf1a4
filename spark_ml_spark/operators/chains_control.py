"""Round-5 wave-71: rates, chains & process control — Wilson score
intervals, the Markov stationary distribution, and a Shewhart control
chart.

``q_wilson_ci`` — the Wilson score 95% interval for each segment's
"placed an urgent order" rate: the binomial interval that behaves at
small n and extreme p̂ where the naive Wald interval collapses — the
right way to report any conversion rate per group.

``q_markov_stationary`` — the stationary distribution of the
user-event transition chain: the row-normalized transition matrix
(``q_transition_matrix``'s object) iterated π ← πP for a fixed number
of power steps from uniform, every iterate quantized to integer nano
so BOTH engines walk the identical integer sequence — where users
spend their time in the long run.

``q_shewhart_chart`` — the Shewhart control chart verdict for daily
revenue: μ ± 3σ limits from exact moments, out-of-control day counts
on each side and the worst |z| — the monitoring complement to
``q_cusum_changepoint`` (Shewhart catches big jumps immediately;
CUSUM catches small persistent drifts).

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_ab_test``, ``q_transition_matrix``, ``q_pagerank``
(the same unrolled-iteration discipline), ``q_cusum_changepoint``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: Wilson z for 95%
_WILSON_Z = 1.96

#: number of unrolled power-iteration steps; event-type state order
_MK_STEPS = 12
_MK_STATES = ("click", "error", "purchase", "signup", "view")

#: urgent-order threshold for the per-segment rate
_WCI_URGENT_MIN = 1


@query("q_wilson_ci", oracle=rf"""
WITH per_cust AS (
  SELECT c.c_mktsegment,
         CASE WHEN count(CASE WHEN o.o_orderpriority = '1-URGENT'
                              THEN 1 END) >= {_WCI_URGENT_MIN}
              THEN 1 ELSE 0 END AS hit
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_mktsegment
),
g AS (
  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(hit) AS BIGINT) AS k
  FROM per_cust GROUP BY c_mktsegment
)
SELECT c_mktsegment, n, k,
       CAST(floor(k * 1000000.0 / n + 0.5) AS BIGINT) AS rate_ppm,
       CAST(floor(
         ((k * 1.0 / n + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n)
           - {_WILSON_Z} * sqrt((k * 1.0 / n) * (1.0 - k * 1.0 / n) / n
                                + {_WILSON_Z} * {_WILSON_Z}
                                  / (4.0 * n * n)))
          / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n)) * 1000000.0 + 0.5)
         AS BIGINT) AS lo_ppm,
       CAST(floor(
         ((k * 1.0 / n + {_WILSON_Z} * {_WILSON_Z} / (2.0 * n)
           + {_WILSON_Z} * sqrt((k * 1.0 / n) * (1.0 - k * 1.0 / n) / n
                                + {_WILSON_Z} * {_WILSON_Z}
                                  / (4.0 * n * n)))
          / (1.0 + {_WILSON_Z} * {_WILSON_Z} / n)) * 1000000.0 + 0.5)
         AS BIGINT) AS hi_ppm
FROM g
ORDER BY c_mktsegment
""")
def q_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% interval per market segment for the rate of
    customers with ≥{m} urgent order(s): point rate plus the
    score-interval bounds (all ppm) — the binomial CI that stays
    inside [0,1] and behaves at small n, unlike Wald's p̂ ± z·se.
    The denominator n is ALL customers in the segment — the left join
    counts a customer with no orders as a non-hit rather than dropping
    it (ADVICE r5: the earlier inner join silently shrank n to
    ordering customers only).

    Scale shape: one orders pass to the customer grain, one 5-row
    (n, k) aggregate per segment, closed-form interval arithmetic on
    those integers."""
    per_cust = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "orders"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            (
                F.count(
                    F.when(F.col("o_orderpriority") == "1-URGENT", 1)
                )
                >= _WCI_URGENT_MIN
            ).cast("bigint").alias("hit")
        )
    )
    g = per_cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("hit").cast("bigint").alias("k"),
    )
    z = F.lit(_WILSON_Z)
    n, k = F.col("n"), F.col("k")
    p = k * F.lit(1.0) / n
    half = z * F.sqrt(
        p * (F.lit(1.0) - p) / n + z * z / (F.lit(4.0) * n * n)
    )
    center = p + z * z / (F.lit(2.0) * n)
    denom = F.lit(1.0) + z * z / n
    return g.select(
        "c_mktsegment",
        "n",
        "k",
        F.floor(k * F.lit(1000000.0) / n + F.lit(0.5))
        .cast("bigint").alias("rate_ppm"),
        F.floor((center - half) / denom * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("lo_ppm"),
        F.floor((center + half) / denom * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("hi_ppm"),
    ).orderBy("c_mktsegment")


q_wilson_ci.__doc__ = q_wilson_ci.__doc__.format(m=_WCI_URGENT_MIN)


def _mk_oracle() -> str:
    """Unrolled power iteration in SQL: the same nano-quantized iterate
    sequence the Spark side walks."""
    steps = []
    prev = "pi0"
    for i in range(1, _MK_STEPS + 1):
        steps.append(
            f"""pi{i} AS (
  SELECT p.dst AS state,
         CAST(floor(sum(CAST({prev}.w_nano AS DOUBLE) * p.prob) + 0.5)
              AS BIGINT) AS w_nano
  FROM {prev} JOIN p ON p.src = {prev}.state
  GROUP BY p.dst
)"""
        )
        prev = f"pi{i}"
    states_sql = ", ".join(f"'{s}'" for s in _MK_STATES)
    return rf"""
WITH seq AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst
  FROM events
),
edge AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE dst IS NOT NULL GROUP BY src, dst
),
p AS (
  SELECT src, dst,
         n * 1.0 / sum(n) OVER (PARTITION BY src) AS prob
  FROM edge
),
pi0 AS (
  SELECT unnest([{states_sql}]) AS state,
         CAST({10**9} // {len(_MK_STATES)} AS BIGINT) AS w_nano
),
{",".join(steps)}
SELECT state, w_nano AS pi_nano
FROM {prev}
ORDER BY state
"""


@query("q_markov_stationary", oracle=_mk_oracle())
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-event Markov chain:
    transition probabilities from consecutive (ts, event_id)-ordered
    events per user, then {t} unrolled power-iteration steps π ← πP
    from uniform, each iterate's weights quantized to integer NANO —
    both engines walk the identical integer sequence, so the result is
    engine-exact without any convergence-order hazard (the
    ``q_pagerank`` discipline on the event chain).

    Scale shape: one corpus pass builds the ≤k² edge counts (the only
    shuffle that touches events); every iteration is a k-row × k²-row
    join — driver-side loop, cluster-side tiny joins, nothing
    corpus-sized is ever revisited."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load(spark, sf_dir, "events").select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    edge = (
        seq.where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wp = W.partitionBy("src")
    # broadcast is safe here, unlike the graph adjacency case: p is
    # bounded by the EVENT-TYPE VOCABULARY (≤ k² rows, k = distinct
    # event types), not by the corpus — the hint pins all 12 iterate
    # joins to one reused broadcast exchange
    p = F.broadcast(edge.select(
        "src",
        "dst",
        (F.col("n") * F.lit(1.0) / F.sum("n").over(wp)).alias("prob"),
    ))
    pi = spark.createDataFrame(
        [(s, 10**9 // len(_MK_STATES)) for s in _MK_STATES],
        "state string, w_nano bigint",
    )
    for _ in range(_MK_STEPS):
        pi = (
            pi.join(p, p["src"] == pi["state"])
            .groupBy(F.col("dst").alias("next_state"))
            .agg(
                F.floor(
                    F.sum(F.col("w_nano").cast("double") * F.col("prob"))
                    + F.lit(0.5)
                ).cast("bigint").alias("w_nano")
            )
            .select(F.col("next_state").alias("state"), "w_nano")
        )
    return pi.select("state", F.col("w_nano").alias("pi_nano")).orderBy(
        "state"
    )


q_markov_stationary.__doc__ = q_markov_stationary.__doc__.format(
    t=_MK_STEPS
)


@query("q_shewhart_chart", oracle=r"""
WITH d AS (
  SELECT CAST(date_diff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) AS BIGINT) AS t,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s,
         sum(CAST(y AS HUGEINT) * y) AS q
  FROM d
),
z AS (
  SELECT d.y, m.n, m.s,
         (d.y - CAST(m.s AS DOUBLE) / m.n)
           / sqrt((CAST(m.q AS DOUBLE) - CAST(m.s AS DOUBLE) * m.s / m.n)
                  / (m.n - 1)) AS zval
  FROM d, m
)
SELECT CAST(max(n) AS BIGINT) AS n_days,
       CAST(max(s) // max(n) AS BIGINT) AS mean_cents,
       CAST(sum(CASE WHEN zval > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above_ucl,
       CAST(sum(CASE WHEN zval < -3.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_below_lcl,
       round(max(abs(zval)), 4) AS max_abs_z
FROM z
""")
def q_shewhart_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart control-chart verdict for daily revenue: μ ± 3σ limits
    from exact integer moments, the out-of-control day counts on each
    side, and the worst standardized excursion — the immediate-alarm
    complement to ``q_cusum_changepoint``'s drift detector.

    Scale shape: the corpus reduces to the calendar grain first; the
    limits come from one exact two-moment aggregate broadcast back
    over the bounded day table (1-row cross); flag counting is one
    more bounded aggregate."""
    d = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date")
            ).cast("bigint").alias("t")
        )
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("y")
        )
    )
    m = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("q"),
    )
    z = d.crossJoin(F.broadcast(m)).select(
        "y",
        "n",
        "s",
        (
            (F.col("y") - F.col("s").cast("double") / F.col("n"))
            / F.sqrt(
                (
                    F.col("q").cast("double")
                    - F.col("s").cast("double") * F.col("s") / F.col("n")
                )
                / (F.col("n") - 1)
            )
        ).alias("zval"),
    )
    return z.agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.expr("CAST(max(s) DIV max(n) AS BIGINT)").alias("mean_cents"),
        F.sum((F.col("zval") > 3.0).cast("bigint"))
        .cast("bigint").alias("n_above_ucl"),
        F.sum((F.col("zval") < -3.0).cast("bigint"))
        .cast("bigint").alias("n_below_lcl"),
        F.round(F.max(F.abs(F.col("zval"))), 4).alias("max_abs_z"),
    )
