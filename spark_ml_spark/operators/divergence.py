"""Round-5 wave-76: distribution divergence, ranking stability & the
operating point — Jensen-Shannon divergence, top-N rank churn, and the
best-F1 threshold.

``q_js_divergence`` — KL and Jensen-Shannon divergence between the
BUILDING segment's order-value distribution and everyone else's, over
domain-fixed bins with add-one smoothing: the symmetric, bounded
distribution distance that complements ``q_psi_drift``'s
population-stability index and ``q_ks_drift``'s sup-gap on the same
kind of comparison.

``q_rank_churn`` — stability of the part-revenue leaderboard between
1995 and 1996: top-{n} overlap, new entrants, and the Jaccard of the
two top sets — the "how much did the ranking move" number every
period-over-period report leads with.

``q_best_f1`` — the F1-optimal operating point of the activity-based
purchase predictor: sweep every distinct score threshold (the
``q_pr_curve`` machinery), pick the argmax-F1 row — the
threshold-selection step that turns a scored model into a classifier.

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_psi_drift``, ``q_ks_drift``, ``q_pr_curve``,
``q_period_growth``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: JS: domain-fixed bin width (dollars) and cap
_JS_BIN_W = 50000
_JS_BIN_MAX = 9

#: rank churn: leaderboard depth and the two years compared
_RC_TOPN = 20
_RC_Y0 = 1995
_RC_Y1 = 1996


@query("q_js_divergence", oracle=rf"""
WITH b AS (
  SELECT least(CAST(floor(o_totalprice / {_JS_BIN_W}) AS BIGINT), {_JS_BIN_MAX})
           AS bin,
         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
hist AS (
  SELECT bin,
         CAST(sum(g) AS BIGINT) AS n_p,
         CAST(sum(1 - g) AS BIGINT) AS n_q
  FROM b GROUP BY bin
),
tot AS (
  SELECT CAST(sum(n_p) AS BIGINT) AS tp, CAST(sum(n_q) AS BIGINT) AS tq,
         CAST(count(*) AS BIGINT) AS k
  FROM hist
),
pq AS (
  SELECT (n_p + 1.0) / (tp + k) AS p, (n_q + 1.0) / (tq + k) AS q
  FROM hist, tot
)
SELECT CAST(count(*) AS BIGINT) AS n_bins,
       CAST(floor(sum(p * ln(p / q)) * 1000000.0 + 0.5) AS BIGINT)
         AS kl_pq_micro,
       CAST(floor(sum(q * ln(q / p)) * 1000000.0 + 0.5) AS BIGINT)
         AS kl_qp_micro,
       CAST(floor((sum(p * ln(2.0 * p / (p + q)))
                   + sum(q * ln(2.0 * q / (p + q)))) / 2.0
                  * 1000000.0 + 0.5) AS BIGINT) AS js_micro
FROM pq
""")
def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(P‖Q), KL(Q‖P) and Jensen-Shannon divergence between the
    BUILDING segment's order-value histogram (P) and the rest (Q),
    over {k} domain-fixed ${w}-wide bins with add-one smoothing (so
    empty cells never produce infinities): JS is symmetric and bounded
    by ln 2 — the robust distribution distance beside PSI and KS.

    Scale shape: ONE joined pass to the ≤{k}-bin two-group histogram
    (map-side combined), a 1-row total broadcast, then the divergence
    folds on ≤{k} rows of identical doubles."""
    b = (
        load(spark, sf_dir, "orders")
        .join(
            load(spark, sf_dir, "customer").select(
                "c_custkey", "c_mktsegment"
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            F.least(
                F.floor(F.col("o_totalprice") / _JS_BIN_W).cast("bigint"),
                F.lit(_JS_BIN_MAX).cast("bigint"),
            ).alias("bin"),
            (F.col("c_mktsegment") == "BUILDING").cast("bigint").alias("g"),
        )
    )
    hist = b.groupBy("bin").agg(
        F.sum("g").cast("bigint").alias("n_p"),
        F.sum(F.lit(1) - F.col("g")).cast("bigint").alias("n_q"),
    )
    tot = hist.agg(
        F.sum("n_p").cast("bigint").alias("tp"),
        F.sum("n_q").cast("bigint").alias("tq"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    pq = hist.crossJoin(F.broadcast(tot)).select(
        ((F.col("n_p") + F.lit(1.0)) / (F.col("tp") + F.col("k")))
        .alias("p"),
        ((F.col("n_q") + F.lit(1.0)) / (F.col("tq") + F.col("k")))
        .alias("q"),
    )
    p, q = F.col("p"), F.col("q")
    return pq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.floor(F.sum(p * F.log(p / q)) * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("kl_pq_micro"),
        F.floor(F.sum(q * F.log(q / p)) * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("kl_qp_micro"),
        F.floor(
            (
                F.sum(p * F.log(F.lit(2.0) * p / (p + q)))
                + F.sum(q * F.log(F.lit(2.0) * q / (p + q)))
            )
            / F.lit(2.0)
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("bigint").alias("js_micro"),
    )


q_js_divergence.__doc__ = q_js_divergence.__doc__.format(
    k=_JS_BIN_MAX + 1, w=_JS_BIN_W
)


@query("q_rank_churn", oracle=rf"""
WITH rev AS (
  SELECT l_partkey,
         CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS yr,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE year(CAST(l_shipdate AS DATE)) IN ({_RC_Y0}, {_RC_Y1})
  GROUP BY l_partkey, yr
),
top0 AS (
  SELECT l_partkey FROM rev WHERE yr = {_RC_Y0}
  ORDER BY rev_cents DESC, l_partkey LIMIT {_RC_TOPN}
),
top1 AS (
  SELECT l_partkey FROM rev WHERE yr = {_RC_Y1}
  ORDER BY rev_cents DESC, l_partkey LIMIT {_RC_TOPN}
),
m AS (
  SELECT CAST((SELECT count(*) FROM top0) AS BIGINT) AS n0,
         CAST((SELECT count(*) FROM top1) AS BIGINT) AS n1,
         CAST((SELECT count(*) FROM top0
               WHERE l_partkey IN (SELECT l_partkey FROM top1))
              AS BIGINT) AS n_stay
)
SELECT n0, n1, n_stay,
       CAST(n1 - n_stay AS BIGINT) AS n_new,
       CAST(floor(n_stay * 1000000.0 / (n0 + n1 - n_stay) + 0.5)
            AS BIGINT) AS jaccard_ppm
FROM m
""")
def q_rank_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard stability: the top-{n} parts by revenue in {y0} vs
    {y1} — how many stayed, how many are new entrants, and the Jaccard
    of the two sets (ties pinned by partkey). The one-line answer to
    "did the ranking move?".

    Scale shape: one filtered lineitem pass to the (part, year) grain,
    two TakeOrderedAndProject top-{n}s, then set arithmetic on ≤2·{n}
    rows via a broadcast semi-join."""
    rev = (
        load(spark, sf_dir, "lineitem")
        .where(F.year(F.to_date("l_shipdate")).isin(_RC_Y0, _RC_Y1))
        .groupBy(
            "l_partkey",
            F.year(F.to_date("l_shipdate")).cast("bigint").alias("yr"),
        )
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5))
                .cast("bigint")
            ).cast("bigint").alias("rev_cents")
        )
    )
    top0 = (
        rev.where(F.col("yr") == _RC_Y0)
        .orderBy(F.col("rev_cents").desc(), "l_partkey")
        .limit(_RC_TOPN)
        .select("l_partkey")
    )
    top1 = (
        rev.where(F.col("yr") == _RC_Y1)
        .orderBy(F.col("rev_cents").desc(), "l_partkey")
        .limit(_RC_TOPN)
        .select(F.col("l_partkey").alias("pk1"))
    )
    stay = top0.join(
        F.broadcast(top1), F.col("pk1") == F.col("l_partkey"), "left"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n0"),
        F.sum(F.col("pk1").isNotNull().cast("bigint"))
        .cast("bigint").alias("n_stay"),
    )
    n1_df = top1.agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    return stay.crossJoin(F.broadcast(n1_df)).select(
        "n0",
        "n1",
        "n_stay",
        (F.col("n1") - F.col("n_stay")).cast("bigint").alias("n_new"),
        F.floor(
            F.col("n_stay")
            * F.lit(1000000.0)
            / (F.col("n0") + F.col("n1") - F.col("n_stay"))
            + F.lit(0.5)
        ).cast("bigint").alias("jaccard_ppm"),
    )


q_rank_churn.__doc__ = q_rank_churn.__doc__.format(
    n=_RC_TOPN, y0=_RC_Y0, y1=_RC_Y1
)


@query("q_best_f1", oracle=r"""
WITH per_user AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS score,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events GROUP BY user_id
),
by_score AS (
  SELECT score, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS pos
  FROM per_user GROUP BY score
),
cum AS (
  SELECT score,
         CAST(sum(n) OVER (ORDER BY score DESC) AS BIGINT) AS pred_pos,
         CAST(sum(pos) OVER (ORDER BY score DESC) AS BIGINT) AS tp,
         CAST(sum(pos) OVER () AS BIGINT) AS total_pos
  FROM by_score
),
f1 AS (
  SELECT score, pred_pos, tp,
         CAST(floor(2.0 * tp * 1000000.0 / (pred_pos + total_pos) + 0.5)
              AS BIGINT) AS f1_ppm
  FROM cum
)
SELECT score AS threshold, pred_pos, tp, f1_ppm,
       CAST(floor(tp * 1000000.0 / pred_pos + 0.5) AS BIGINT)
         AS precision_ppm,
       CAST(floor(tp * 1000000.0
                  / (SELECT max(total_pos) FROM cum) + 0.5) AS BIGINT)
         AS recall_ppm
FROM f1
ORDER BY f1_ppm DESC, threshold DESC
LIMIT 1
""")
def q_best_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The F1-optimal threshold of the activity-based purchase
    predictor: F1 = 2·TP/(pred_pos + total_pos) swept over every
    distinct score (exact integer identity — no separate precision/
    recall rounding), argmax returned with its precision and recall
    (ties broken toward the stricter threshold).

    Scale shape: the ``q_pr_curve`` passes (user grain → bounded score
    histogram → suffix sums) plus one TakeOrderedAndProject(1)."""
    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("score"),
            F.max((F.col("event_type") == "purchase").cast("int"))
            .cast("bigint").alias("y"),
        )
    )
    by_score = per_user.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    w_desc = (
        Window.partitionBy(api.one_partition("score"))
        .orderBy(F.col("score").desc())
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(api.one_partition("score"))
    cum = by_score.select(
        "score",
        F.sum("n").over(w_desc).cast("bigint").alias("pred_pos"),
        F.sum("pos").over(w_desc).cast("bigint").alias("tp"),
        F.sum("pos").over(w_all).cast("bigint").alias("total_pos"),
    )
    f1 = cum.select(
        "score",
        "pred_pos",
        "tp",
        "total_pos",
        F.floor(
            F.lit(2.0) * F.col("tp") * F.lit(1000000.0)
            / (F.col("pred_pos") + F.col("total_pos"))
            + F.lit(0.5)
        ).cast("bigint").alias("f1_ppm"),
    )
    return (
        f1.orderBy(F.col("f1_ppm").desc(), F.col("score").desc())
        .limit(1)
        .select(
            F.col("score").alias("threshold"),
            "pred_pos",
            "tp",
            "f1_ppm",
            F.floor(
                F.col("tp") * F.lit(1000000.0) / F.col("pred_pos")
                + F.lit(0.5)
            ).cast("bigint").alias("precision_ppm"),
            F.floor(
                F.col("tp") * F.lit(1000000.0) / F.col("total_pos")
                + F.lit(0.5)
            ).cast("bigint").alias("recall_ppm"),
        )
    )
