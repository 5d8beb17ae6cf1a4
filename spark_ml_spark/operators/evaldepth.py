"""Round-5 wave-56: model-evaluation depth — split-conformal
prediction intervals, lift/cumulative-gains curve, McNemar's paired
test.

``q_conformal_interval`` — split conformal prediction (Vovk et al.
2005; Lei et al. 2018): train an OLS on one hash split, take the
⌈(n+1)(1−α)⌉-th smallest absolute residual on a disjoint calibration
split as the interval half-width q̂, and report the EMPIRICAL COVERAGE
of ŷ ± q̂ on a third held-out split — the distribution-free uncertainty
wrapper modern ML eval pipelines bolt onto any point predictor.

``q_lift_curve`` — decile lift and cumulative gains of a score against
a binary label: the campaign-targeting readout ("the top score decile
captures X% of positives at Y× random"), complementing ``q_roc_curve``
(threshold sweep) and ``q_calibration_bins`` (probability accuracy).

``q_mcnemar`` — McNemar's test on the DISAGREEMENT cells of two
classifiers evaluated on the same rows (continuity-corrected
χ² = (|b−c|−1)²/(b+c)): the paired comparison that detects a real
accuracy difference where two unpaired error rates cannot.

The reference evaluates with a single whole-table RMSE
(``Data_transform.py:163-178``); uncertainty, targeting curves, and
paired comparison are north-star extensions. Siblings: ``q_auc``,
``q_roc_curve``, ``q_calibration_bins``, ``q_kfold_cv``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: conformal miscoverage level α = 0.1 → 90% target coverage
_CONF_ALPHA_NUM, _CONF_ALPHA_DEN = 9, 10

#: classifier thresholds for McNemar (fixed domain constants, not fit)
_MCN_CHARS_T = 400
_MCN_TOKENS_T = 60


@query("q_conformal_interval", oracle=r"""
WITH base AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y,
         doc_id,
         strpos('0123456789abcdef',
                substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS h
  FROM documents
),
tr AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM base WHERE h < 10
),
model AS (
  SELECT n AS n_train,
         CAST(floor((n * sxy - sx * sy) * 1000000.0
                    / (n * sxx - sx * sx) + 0.5) AS BIGINT) AS b,
         sx, sy, n
  FROM tr
),
model2 AS (
  SELECT n_train, b,
         CAST(floor((sy * 1000000 - b * sx) * 1.0 / n + 0.5) AS BIGINT)
           AS a
  FROM model
),
cal AS (
  SELECT base.doc_id,
         abs(base.y * 1000000 - (m.a + m.b * base.x)) AS r_micro
  FROM base, model2 m WHERE base.h >= 10 AND base.h < 13
),
rcal AS (
  SELECT r_micro,
         row_number() OVER (ORDER BY r_micro, doc_id) AS rnk,
         CAST(count(*) OVER () AS BIGINT) AS n_cal
  FROM cal
),
qhat AS (
  SELECT r_micro AS q_micro, n_cal FROM rcal
  WHERE rnk = ((n_cal + 1) * 9 + 9) // 10
),
test AS (
  SELECT CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN abs(base.y * 1000000 - (m.a + m.b * base.x))
                            <= q.q_micro
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM base, model2 m, qhat q WHERE base.h >= 13
)
SELECT m.n_train, q.n_cal, t.n_test,
       m.b AS slope_micro, m.a AS intercept_micro,
       q.q_micro AS qhat_micro,
       CAST(floor(t.n_covered * 1000000.0 / t.n_test + 0.5) AS BIGINT)
         AS coverage_ppm
FROM model2 m, qhat q, test t
""")
def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal 90% prediction interval for the tokens ~ n_chars
    OLS: md5(doc_id) splits ~62/19/19 into train/calibration/test;
    q̂ = the ⌈(n_cal+1)·0.9⌉-th smallest |residual| on calibration
    (integer micro-units — y·10⁶ − (â + b̂x) is EXACT given the
    quantized model); coverage = share of test rows inside ŷ ± q̂.
    Finite-sample guarantee ≥ 90% regardless of model quality — the
    check pins the whole chain (split, fit, order statistic, coverage).

    Scale shape: the fit is one moment aggregate (q_grouped_ols); the
    calibration order statistic uses ``api.global_rank`` — two-phase
    range rank, NO single-partition window over the corpus-sized
    residual set; the coverage pass is a broadcast of the 1-row q̂
    against a map-side-combined count. Three logical passes, zero
    row-level Python, all integers end-to-end."""
    h = F.instr(
        F.lit("0123456789abcdef"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1),
    ) - 1
    base = load(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("y"),
        "doc_id",
        h.alias("h"),
    )
    tr = base.where(F.col("h") < 10).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    b = F.floor(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * F.lit(1000000.0)
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        + F.lit(0.5)
    ).cast("bigint")
    model = tr.select(F.col("n").alias("n_train"), b.alias("b"), "sx",
                      "sy", "n").select(
        "n_train",
        "b",
        F.floor(
            (F.col("sy") * F.lit(1000000) - F.col("b") * F.col("sx"))
            * F.lit(1.0)
            / F.col("n")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("a"),
    )
    mb = F.broadcast(model)
    cal = (
        base.where((F.col("h") >= 10) & (F.col("h") < 13))
        .crossJoin(mb)
        .select(
            "doc_id",
            F.abs(
                F.col("y") * F.lit(1000000)
                - (F.col("a") + F.col("b") * F.col("x"))
            ).alias("r_micro"),
        )
    )
    rcal = api.global_rank(
        cal, ["r_micro", "doc_id"], rank_col="rnk", total_col="n_cal"
    )
    # the rank filter matches EXACTLY one row, but the plan can't prove
    # that — the ungrouped min() wraps it in a keys=[] aggregate so the
    # broadcast build side is <=1-row BY CONSTRUCTION (the repo's BNLJ
    # hygiene test requires provable tininess, not just actual tininess)
    qhat = (
        rcal.where(
            F.col("rnk")
            == F.expr(
                f"((n_cal + 1) * {_CONF_ALPHA_NUM} + {_CONF_ALPHA_DEN - 1})"
                f" DIV {_CONF_ALPHA_DEN}"
            )
        )
        .agg(
            F.min("r_micro").cast("bigint").alias("q_micro"),
            F.min("n_cal").cast("bigint").alias("n_cal"),
        )
    )
    qb = F.broadcast(qhat)
    test = (
        base.where(F.col("h") >= 13)
        .crossJoin(mb)
        .crossJoin(qb)
        .select(
            (
                F.abs(
                    F.col("y") * F.lit(1000000)
                    - (F.col("a") + F.col("b") * F.col("x"))
                )
                <= F.col("q_micro")
            )
            .cast("bigint")
            .alias("cov")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum("cov").cast("bigint").alias("n_covered"),
        )
    )
    return model.crossJoin(qb).crossJoin(F.broadcast(test)).select(
        "n_train",
        "n_cal",
        "n_test",
        F.col("b").alias("slope_micro"),
        F.col("a").alias("intercept_micro"),
        F.col("q_micro").alias("qhat_micro"),
        F.floor(
            F.col("n_covered") * F.lit(1000000.0) / F.col("n_test")
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("coverage_ppm"),
    )


@query("q_lift_curve", oracle=r"""
WITH scored AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS s,
         CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM documents
),
r AS (
  SELECT s, y,
         row_number() OVER (ORDER BY s DESC, doc_id) AS rnk,
         CAST(count(*) OVER () AS BIGINT) AS n,
         CAST(sum(y) OVER () AS BIGINT) AS pos
  FROM scored
),
dec AS (
  SELECT CAST((rnk - 1) * 10 // n + 1 AS BIGINT) AS decile,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(max(n) AS BIGINT) AS n, CAST(max(pos) AS BIGINT) AS pos
  FROM r GROUP BY 1
)
SELECT decile, n_rows, n_pos,
       CAST(floor(n_pos * 1000000.0 / n_rows + 0.5) AS BIGINT)
         AS pos_rate_ppm,
       CAST(floor((n_pos * 1.0 / n_rows) / (pos * 1.0 / n) * 1000000.0
                  + 0.5) AS BIGINT) AS lift_ppm,
       CAST(floor(sum(n_pos) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  * 1000000.0 / pos + 0.5) AS BIGINT) AS cum_gain_ppm
FROM dec ORDER BY decile
""")
def q_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift and cumulative gains: rank rows by score (n_chars,
    best first), cut into 10 equal-count deciles, and report each
    decile's positive rate, lift over the global base rate, and the
    cumulative share of all positives captured — "mail the top 2
    deciles, reach X% of buyers". The targeting-curve complement of
    ``q_roc_curve``.

    Scale shape: exact ranking via ``api.global_rank`` (two-phase
    range rank — no single-partition window on the corpus), then a
    10-row rollup; the cumulative-gains window runs on the decile
    table. All counts BIGINT; the three ratios quantize once per
    output row."""
    scored = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("bigint").alias("s"),
        (F.col("lang") == "en").cast("bigint").alias("y"),
    )
    # rank best-score-first: global_rank sorts ascending, so rank -s
    ranked = api.global_rank(
        scored.select(
            (-F.col("s")).alias("neg_s"), "doc_id", "s", "y"
        ),
        ["neg_s", "doc_id"],
        rank_col="rnk",
        total_col="n",
    )
    pos_tot = scored.agg(F.sum("y").cast("bigint").alias("pos"))
    dec = (
        ranked.select(
            (F.floor((F.col("rnk") - 1) * 10 / F.col("n")) + 1)
            .cast("bigint")
            .alias("decile"),
            "y",
            F.col("n").cast("bigint").alias("n"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.max("n").cast("bigint").alias("n"),
        )
        .crossJoin(F.broadcast(pos_tot))
    )
    w = (
        Window.partitionBy(api.one_partition("decile"))
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dec.select(
            "decile",
            "n_rows",
            "n_pos",
            F.floor(
                F.col("n_pos") * F.lit(1000000.0) / F.col("n_rows")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("pos_rate_ppm"),
            F.floor(
                (F.col("n_pos") * F.lit(1.0) / F.col("n_rows"))
                / (F.col("pos") * F.lit(1.0) / F.col("n"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lift_ppm"),
            F.floor(
                F.sum("n_pos").over(w) * F.lit(1000000.0) / F.col("pos")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("cum_gain_ppm"),
        )
        .orderBy("decile")
    )


@query("q_mcnemar", oracle=rf"""
WITH paired AS (
  SELECT CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y,
         CAST(CASE WHEN n_chars >= {_MCN_CHARS_T} THEN 1 ELSE 0 END
              AS BIGINT) AS pa,
         CAST(CASE WHEN len(regexp_split_to_array(trim(text), '\s+'))
                        >= {_MCN_TOKENS_T}
                   THEN 1 ELSE 0 END AS BIGINT) AS pb
  FROM documents
),
cells AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN pa = y AND pb = y THEN 1 ELSE 0 END)
              AS BIGINT) AS both_right,
         CAST(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
              AS BIGINT) AS only_a,
         CAST(sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)
              AS BIGINT) AS only_b,
         CAST(sum(CASE WHEN pa <> y AND pb <> y THEN 1 ELSE 0 END)
              AS BIGINT) AS both_wrong
  FROM paired
)
SELECT n, both_right, only_a, only_b, both_wrong,
       ROUND((abs(only_a - only_b) - 1.0)
             * (abs(only_a - only_b) - 1.0)
             / (only_a + only_b), 4) AS chi2
FROM cells
""")
def q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test for two rule classifiers of ``lang='en'``
    (char-count ≥ {chars_t} vs token-count ≥ {tokens_t}): the 2×2
    agreement table on the SAME rows, with the continuity-corrected
    χ² = (|b−c|−1)²/(b+c) over the disagreement cells — paired
    evaluation detects a difference the two marginal error rates hide,
    because shared-hard rows cancel.

    Scale shape: one map-only predicate projection, one map-side-
    combined 5-counter aggregate — a single corpus pass, one output
    row; χ² is one deterministic double expression over exact
    BIGINTs."""
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    paired = load(spark, sf_dir, "documents").select(
        (F.col("lang") == "en").cast("bigint").alias("y"),
        (F.col("n_chars") >= _MCN_CHARS_T).cast("bigint").alias("pa"),
        (toks >= _MCN_TOKENS_T).cast("bigint").alias("pb"),
    )
    cells = paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(((F.col("pa") == F.col("y")) & (F.col("pb") == F.col("y")))
              .cast("bigint")).cast("bigint").alias("both_right"),
        F.sum(((F.col("pa") == F.col("y")) & (F.col("pb") != F.col("y")))
              .cast("bigint")).cast("bigint").alias("only_a"),
        F.sum(((F.col("pa") != F.col("y")) & (F.col("pb") == F.col("y")))
              .cast("bigint")).cast("bigint").alias("only_b"),
        F.sum(((F.col("pa") != F.col("y")) & (F.col("pb") != F.col("y")))
              .cast("bigint")).cast("bigint").alias("both_wrong"),
    )
    d = F.abs(F.col("only_a") - F.col("only_b"))
    return cells.select(
        "n",
        "both_right",
        "only_a",
        "only_b",
        "both_wrong",
        F.round(
            (d - F.lit(1.0)) * (d - F.lit(1.0))
            / (F.col("only_a") + F.col("only_b")),
            4,
        ).alias("chi2"),
    )


q_mcnemar.__doc__ = q_mcnemar.__doc__.format(
    chars_t=_MCN_CHARS_T, tokens_t=_MCN_TOKENS_T
)
