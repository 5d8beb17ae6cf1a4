"""Round-4 wave-28: pattern-mining operators — association rules,
blocked edit-distance record linkage, and gaps-and-islands streaks.

``q_assoc_rules`` — market-basket association rules over order baskets
(order → set of part brands): support / confidence / lift per ordered
brand pair (Agrawal & Srikant 1994). The PMI sibling ``q_event_pmi``
reports symmetric log-association over event types; this one reports
the DIRECTED rule metrics (conf a→b ≠ conf b→a) retailers and
feature-cross pruners actually threshold on.

``q_islands`` — per-user consecutive-active-day streaks via the
row-number-difference gaps-and-islands transform: the engagement-streak
/ uptime-run primitive, and the batch complement of the streaming
sessionizer (``q_sessionize`` gaps on a time THRESHOLD; islands gap on
calendar discontinuity).

Engine exactness: counts are BIGINT end-to-end; the rule metrics are
ppm integers quantized one-shot per OUTPUT row from exact BIGINT
ratios (``floor(x*1e6+0.5)`` — the q_skew_profile discipline).

The reference has no mining surface (``Data_transform.py`` passim);
these are north-star extensions of the training-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query


@query("q_assoc_rules", oracle=r"""
WITH b AS (
  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM b),
ct AS (SELECT item, CAST(count(*) AS BIGINT) AS n_i FROM b GROUP BY item),
pairs AS (
  SELECT a.item AS antecedent, c.item AS consequent,
         CAST(count(*) AS BIGINT) AS n_co
  FROM b a JOIN b c ON a.basket = c.basket AND a.item <> c.item
  GROUP BY 1, 2
)
SELECT p.antecedent, p.consequent, p.n_co,
       ca.n_i AS n_ante, cb.n_i AS n_cons,
       CAST(floor(p.n_co * 1000000.0 / n.n_baskets + 0.5) AS BIGINT)
         AS support_ppm,
       CAST(floor(p.n_co * 1000000.0 / ca.n_i + 0.5) AS BIGINT)
         AS confidence_ppm,
       CAST(floor((n.n_baskets * p.n_co) * 1000000.0 / (ca.n_i * cb.n_i)
                  + 0.5) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN ct ca ON ca.item = p.antecedent
JOIN ct cb ON cb.item = p.consequent, n
ORDER BY lift_ppm DESC, antecedent, consequent
LIMIT 40
""")
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules a→b over order baskets (items = part
    brands reached through a broadcast dimension join): co-occurrence
    count, support, confidence, and lift in ppm; top-40 by lift with a
    full deterministic tie-break.

    Scale shape: the basket table is ONE broadcast join (part is a
    dimension) followed by a map-side-combined distinct; the pair stage
    self-joins ON THE BASKET KEY, so per-basket fan-out is bounded by
    the brand vocabulary (≤ |V|·(|V|−1) ordered pairs, |V|=25) — the
    bounded-blow-up discipline every bucket join in this repo follows.
    Pair counts reduce map-side into at most |V|² rows; the singles
    table and N broadcast onto that vocabulary-sized table, so nothing
    after the first shuffle is corpus-sized. The only float is one
    quantized ratio per OUTPUT row from exact BIGINTs."""
    part = load(spark, sf_dir, "part").select(
        F.col("p_partkey"), F.col("p_brand").alias("item")
    )
    b = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("basket"), "l_partkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("basket", "item")
        .distinct()
    )
    n = b.agg(F.count_distinct("basket").cast("bigint").alias("n_baskets"))
    ct = b.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("n_i"))
    a, c = b.alias("a"), b.alias("c")
    pairs = (
        a.join(
            c,
            (F.col("a.basket") == F.col("c.basket"))
            & (F.col("a.item") != F.col("c.item")),
        )
        .groupBy(
            F.col("a.item").alias("antecedent"),
            F.col("c.item").alias("consequent"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_co"))
    )
    ca = ct.select(F.col("item").alias("antecedent"), F.col("n_i").alias("n_ante"))
    cb = ct.select(F.col("item").alias("consequent"), F.col("n_i").alias("n_cons"))

    def ppm(x):
        return F.floor(x + F.lit(0.5)).cast("bigint")

    return (
        pairs.join(F.broadcast(ca), "antecedent")
        .join(F.broadcast(cb), "consequent")
        .crossJoin(F.broadcast(n))
        .select(
            "antecedent",
            "consequent",
            "n_co",
            "n_ante",
            "n_cons",
            ppm(F.col("n_co") * 1000000.0 / F.col("n_baskets")).alias(
                "support_ppm"
            ),
            ppm(F.col("n_co") * 1000000.0 / F.col("n_ante")).alias(
                "confidence_ppm"
            ),
            ppm(
                (F.col("n_baskets") * F.col("n_co"))
                * 1000000.0
                / (F.col("n_ante") * F.col("n_cons"))
            ).alias("lift_ppm"),
        )
        .orderBy(
            F.col("lift_ppm").desc(), "antecedent", "consequent"
        )
        .limit(40)
    )


@query("q_islands", oracle=r"""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
grp AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS anchor
  FROM days
),
runs AS (
  SELECT user_id, min(day) AS streak_start, max(day) AS streak_end,
         CAST(count(*) AS BIGINT) AS streak_days
  FROM grp GROUP BY user_id, anchor
)
SELECT user_id, CAST(streak_start AS VARCHAR) AS streak_start,
       CAST(streak_end AS VARCHAR) AS streak_end, streak_days
FROM runs
ORDER BY streak_days DESC, user_id, streak_start
LIMIT 20
""")
def q_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest runs of CONSECUTIVE active days per
    user via the row-number-difference transform (day minus the user's
    day-rank is constant exactly within a consecutive run). Top-20
    streaks with a full deterministic tie-break. The batch engagement-
    streak primitive; ``q_sessionize`` is the time-threshold sibling.

    Scale shape: the distinct pass and the window both partition BY
    USER — the window is a per-user sort of that user's distinct days
    (bounded by the calendar, ~2.4k rows worst case), never a global
    sort; the run reduction is a map-side-combinable group-by on
    (user, anchor). Top-20 is TakeOrderedAndProject, not a full sort.
    Everything is dates and BIGINTs — no floats anywhere."""
    days = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    grp = days.withColumn(
        "anchor",
        F.date_sub(F.col("day"), F.row_number().over(w)),
    )
    runs = grp.groupBy("user_id", "anchor").agg(
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
        F.count(F.lit(1)).cast("bigint").alias("streak_days"),
    )
    return (
        runs.select(
            "user_id",
            F.date_format("streak_start", "yyyy-MM-dd").alias("streak_start"),
            F.date_format("streak_end", "yyyy-MM-dd").alias("streak_end"),
            "streak_days",
        )
        .orderBy(F.col("streak_days").desc(), "user_id", "streak_start")
        .limit(20)
    )


@query("q_item_similarity", oracle=r"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item FROM lineitem
),
deg AS (SELECT item, CAST(count(*) AS BIGINT) AS d FROM b GROUP BY item),
co AS (
  SELECT x.item AS a, y.item AS bb, CAST(count(*) AS BIGINT) AS co
  FROM b x JOIN b y ON x.basket = y.basket AND x.item < y.item
  GROUP BY 1, 2
)
SELECT co.a, co.bb AS b, co.co,
       da.d AS deg_a, db.d AS deg_b,
       CAST(floor(co.co * 1000000.0 / sqrt(CAST(da.d AS DOUBLE) * db.d)
                  + 0.5) AS BIGINT) AS cosine_ppm
FROM co JOIN deg da ON da.item = co.a JOIN deg db ON db.item = co.bb
WHERE co.co >= 3
ORDER BY cosine_ppm DESC, a, b
LIMIT 20
""")
def q_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence cosine over order baskets —
    sim(a,b) = co(a,b)/√(deg(a)·deg(b)), the classical memory-based
    collaborative-filtering similarity (Sarwar et al. 2001); support
    floor co ≥ 3 prunes noise pairs, top-20 with full tie-break. The
    RATIO sibling of ``q_assoc_rules``'s directed lift.

    Scale shape: the co-count join is ON THE BASKET KEY (per-basket
    fan-out bounded by basket size, the wave-28 discipline); degrees
    broadcast onto the vocabulary-sized pair table; the only float is
    one quantized cosine per surviving pair."""
    b = (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("basket"),
                F.col("l_partkey").alias("item"))
        .distinct()
    )
    deg = b.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    x, y = b.alias("x"), b.alias("y")
    co = (
        x.join(y, (F.col("x.basket") == F.col("y.basket"))
               & (F.col("x.item") < F.col("y.item")))
        .groupBy(F.col("x.item").alias("a"), F.col("y.item").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
        .where(F.col("co") >= 3)
    )
    degb = F.broadcast(deg)
    return (
        co.join(degb.alias("da"), F.col("a") == F.col("da.item"))
        .join(degb.alias("db"), F.col("b") == F.col("db.item"))
        .select(
            "a", "b", "co",
            F.col("da.d").alias("deg_a"), F.col("db.d").alias("deg_b"),
            F.floor(
                F.col("co") * 1000000.0
                / F.sqrt(F.col("da.d").cast("double") * F.col("db.d"))
                + F.lit(0.5)
            ).cast("bigint").alias("cosine_ppm"),
        )
        .orderBy(F.col("cosine_ppm").desc(), "a", "b")
        .limit(20)
    )
