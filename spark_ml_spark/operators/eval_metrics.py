"""Round-5 wave-69: classifier & clustering evaluation — language-ID
confusion matrix, embedding-cluster purity, and a precision-recall
curve with average precision.

``q_langid_confusion`` — the confusion matrix of the stopword-vote
language identifier (``q_lang_id``) against the fixture's gold labels,
with per-cell share-of-actual and the overall accuracy: the eval
artifact that turns a classifier demo into a measured component.

``q_cluster_purity`` — purity of the 8 sign-buckets of the first three
embedding dimensions against the gold label: per-bucket majority-label
share plus the size-weighted overall purity — the cheap clustering
sanity check (the same sign-bucket geometry ``q_embedding_neardup``'s
LSH uses, here evaluated instead of assumed).

``q_pr_curve`` — precision-recall points over every distinct score
threshold of an activity-based purchase predictor (score = per-user
event count), with step-interpolated average precision: the
imbalanced-data companion to ``q_roc_curve`` (ROC flatters skewed
classes; PR does not).

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_lang_id``, ``q_roc_curve``, ``q_nb_classify``,
``q_embedding_neardup``, ``q_ndcg_eval``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.operators.textops import _lang_id_oracle
from spark_ml_spark.registry import QUERIES, query


@query("q_langid_confusion", oracle=rf"""
WITH pred AS ({_lang_id_oracle()}),
cell AS (
  SELECT actual_lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
  FROM pred GROUP BY actual_lang, predicted_lang
)
SELECT actual_lang, predicted_lang, n,
       CAST(floor(n * 1000000.0
                  / sum(n) OVER (PARTITION BY actual_lang) + 0.5)
            AS BIGINT) AS share_of_actual_ppm,
       CAST(floor(sum(CASE WHEN actual_lang = predicted_lang THEN n
                           ELSE 0 END) OVER ()
                  * 1000000.0 / sum(n) OVER () + 0.5) AS BIGINT)
         AS accuracy_ppm
FROM cell
ORDER BY actual_lang, predicted_lang
""")
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-vote language identifier vs the
    gold ``lang`` label: one row per (actual, predicted) cell with the
    cell count, its share of the actual class (recall decomposition),
    and the overall accuracy — all integer counts with ppm shares.

    Scale shape: reuses ``q_lang_id``'s map-only predictor, then one
    hash aggregate to the ≤k² confusion cells; both window folds run
    on that bounded grid."""
    pred = QUERIES["q_lang_id"](spark, sf_dir)
    cell = pred.groupBy("actual_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w_act = Window.partitionBy("actual_lang")
    w_all = Window.partitionBy(api.one_partition("actual_lang"))
    return cell.select(
        "actual_lang",
        "predicted_lang",
        "n",
        F.floor(
            F.col("n") * F.lit(1000000.0) / F.sum("n").over(w_act)
            + F.lit(0.5)
        ).cast("bigint").alias("share_of_actual_ppm"),
        F.floor(
            F.sum(
                F.when(
                    F.col("actual_lang") == F.col("predicted_lang"),
                    F.col("n"),
                ).otherwise(F.lit(0))
            ).over(w_all)
            * F.lit(1000000.0)
            / F.sum("n").over(w_all)
            + F.lit(0.5)
        ).cast("bigint").alias("accuracy_ppm"),
    ).orderBy("actual_lang", "predicted_lang")


@query("q_cluster_purity", oracle=r"""
WITH b AS (
  SELECT CAST((CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END)
              + 2 * (CASE WHEN embedding[2] >= 0 THEN 1 ELSE 0 END)
              + 4 * (CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS bucket,
         label
  FROM embeddings
),
cell AS (
  SELECT bucket, label, CAST(count(*) AS BIGINT) AS n
  FROM b GROUP BY bucket, label
),
per_bucket AS (
  SELECT bucket,
         CAST(sum(n) AS BIGINT) AS n_bucket,
         CAST(max(n) AS BIGINT) AS n_majority
  FROM cell GROUP BY bucket
)
SELECT bucket, n_bucket, n_majority,
       CAST(floor(n_majority * 1000000.0 / n_bucket + 0.5) AS BIGINT)
         AS purity_ppm,
       CAST(floor(sum(n_majority) OVER () * 1000000.0
                  / sum(n_bucket) OVER () + 0.5) AS BIGINT)
         AS overall_purity_ppm
FROM per_bucket
ORDER BY bucket
""")
def q_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purity of the 8 sign-LSH buckets (signs of embedding dims
    0..2) against the gold label: per-bucket majority share plus the
    size-weighted overall purity — evaluating the very bucket geometry
    the similarity operators rely on.

    Scale shape: one map-only bucket expression, one (bucket, label)
    hash aggregate (≤ 8×L cells), then 8-row arithmetic; the corpus is
    touched exactly once."""
    e = load(spark, sf_dir, "embeddings").select(
        (
            (F.col("embedding")[0] >= 0).cast("bigint")
            + 2 * (F.col("embedding")[1] >= 0).cast("bigint")
            + 4 * (F.col("embedding")[2] >= 0).cast("bigint")
        ).alias("bucket"),
        "label",
    )
    cell = e.groupBy("bucket", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    per_bucket = cell.groupBy("bucket").agg(
        F.sum("n").cast("bigint").alias("n_bucket"),
        F.max("n").cast("bigint").alias("n_majority"),
    )
    w_all = Window.partitionBy(api.one_partition("bucket"))
    return per_bucket.select(
        "bucket",
        "n_bucket",
        "n_majority",
        F.floor(
            F.col("n_majority") * F.lit(1000000.0) / F.col("n_bucket")
            + F.lit(0.5)
        ).cast("bigint").alias("purity_ppm"),
        F.floor(
            F.sum("n_majority").over(w_all)
            * F.lit(1000000.0)
            / F.sum("n_bucket").over(w_all)
            + F.lit(0.5)
        ).cast("bigint").alias("overall_purity_ppm"),
    ).orderBy("bucket")


@query("q_pr_curve", oracle=r"""
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
pr AS (
  SELECT score, pred_pos, tp,
         tp * 1.0 / pred_pos AS prec,
         tp * 1.0 / total_pos AS rec,
         coalesce(lag(tp) OVER (ORDER BY score DESC), 0) * 1.0 / total_pos
           AS rec_prev
  FROM cum
)
SELECT score AS threshold, pred_pos, tp,
       CAST(floor(prec * 1000000.0 + 0.5) AS BIGINT) AS precision_ppm,
       CAST(floor(rec * 1000000.0 + 0.5) AS BIGINT) AS recall_ppm,
       CAST(floor(sum((rec - rec_prev) * prec) OVER () * 1000000.0 + 0.5)
            AS BIGINT) AS ap_micro
FROM pr
ORDER BY threshold DESC
""")
def q_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall curve of the activity-based purchase predictor
    (score = per-user event count, thresholded at every distinct
    score, higher = more confident): per-threshold precision/recall
    plus step-interpolated average precision AP = Σ(R_k − R_{k−1})·P_k
    — the skew-robust companion to ``q_roc_curve``.

    Engine exactness: cumulative TP/FP are exact BIGINT suffix sums
    over the bounded distinct-score histogram (one_partition pin);
    precision, recall, and the AP fold are closed-form doubles over
    those integers.

    Scale shape: one events pass to the user grain, one score
    histogram (≤ a few hundred rows at any corpus size — scores are
    integer counts), then all windows run on that bounded grain."""
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
    w_lag = Window.partitionBy(api.one_partition("score")).orderBy(
        F.col("score").desc()
    )
    cum = by_score.select(
        "score",
        F.sum("n").over(w_desc).cast("bigint").alias("pred_pos"),
        F.sum("pos").over(w_desc).cast("bigint").alias("tp"),
        F.sum("pos").over(w_all).cast("bigint").alias("total_pos"),
    )
    prec = F.col("tp") * F.lit(1.0) / F.col("pred_pos")
    rec = F.col("tp") * F.lit(1.0) / F.col("total_pos")
    rec_prev = (
        F.coalesce(F.lag("tp").over(w_lag), F.lit(0))
        * F.lit(1.0)
        / F.col("total_pos")
    )
    pr = cum.select(
        "score",
        "pred_pos",
        "tp",
        prec.alias("prec"),
        rec.alias("rec"),
        rec_prev.alias("rec_prev"),
    )
    return pr.select(
        F.col("score").alias("threshold"),
        "pred_pos",
        "tp",
        F.floor(F.col("prec") * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("precision_ppm"),
        F.floor(F.col("rec") * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint").alias("recall_ppm"),
        F.floor(
            F.sum((F.col("rec") - F.col("rec_prev")) * F.col("prec"))
            .over(Window.partitionBy(api.one_partition("score")))
            * F.lit(1000000.0)
            + F.lit(0.5)
        ).cast("bigint").alias("ap_micro"),
    ).orderBy(F.col("threshold").desc())
