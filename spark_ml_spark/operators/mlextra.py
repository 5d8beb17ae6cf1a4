"""Round-5 wave-53: classical-ML depth — decision stump, ridge path,
k-fold cross-validation. All three run as MOMENT ALGEBRA (sufficient
statistics reduce map-side; the model math runs on the tiny reduced
table), the only shape that fits 100 TB — never an iterative pass or a
per-fold rescan.

``q_decision_stump`` — the exact 1-split decision tree: best Gini
split of ``lang = 'en'`` on ``n_chars``, found by scanning every
candidate threshold via cumulative counts over the FEATURE HISTOGRAM
(the ``q_auc`` count-of-counts discipline). This is precisely the
split search inside every distributed tree learner (XGBoost's exact
greedy / Spark MLlib's binned variant); the MLlib forest twins are
``q_rf_regression``/``q_gbt_regression`` (rows-only, engine solver).

``q_ridge_path`` — closed-form ridge slope over a regularization path
(λ grid in one in-row explode): β(λ) = S_xy/(S_xx + nλ) on centered
moments, plus shrinkage factor and effective degrees of freedom. The
L2 path from FIVE integer sums — the fit costs one aggregate no matter
how many λ points are evaluated.

``q_kfold_cv`` — 5-fold CV of the closed-form OLS with md5-hash fold
assignment and LEAVE-FOLD-OUT TRAINING BY MOMENT SUBTRACTION: per-fold
sufficient statistics aggregate once; fold f trains on (totals − fold
f) and its held-out SSE expands algebraically from the same fold
moments — one corpus pass for all k folds, where the textbook
formulation rescans k times.

The reference's only validation is a single unseeded 70/30 split
(``Data_transform.py:155-162``, captured by ``q_random_split`` /
``reference_parity.py``); stump/ridge/CV are north-star extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: ridge penalty grid (sklearn's alpha convention: min ||y−Xβ||² + αβ²)
_RIDGE_ALPHAS = (0, 100000, 1000000, 10000000, 100000000)

#: CV fold count
_K_FOLDS = 5


@query("q_decision_stump", oracle=r"""
WITH obs AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
  FROM documents
),
hist AS (
  SELECT x, CAST(count(*) AS BIGINT) AS n_x,
         CAST(sum(y) AS BIGINT) AS pos_x
  FROM obs GROUP BY x
),
tot AS (
  SELECT CAST(sum(n_x) AS BIGINT) AS n, CAST(sum(pos_x) AS BIGINT) AS pos
  FROM hist
),
cum AS (
  SELECT x,
         CAST(sum(n_x) OVER w AS BIGINT) AS n_le,
         CAST(sum(pos_x) OVER w AS BIGINT) AS pos_le
  FROM hist
  WINDOW w AS (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
),
scored AS (
  SELECT c.x AS threshold, c.n_le AS n_left, t.n - c.n_le AS n_right,
         c.pos_le AS pos_left, t.pos - c.pos_le AS pos_right,
         -- weighted Gini * 1e6, one double expression over exact ints
         (2.0 * c.pos_le * (c.n_le - c.pos_le) / c.n_le
          + 2.0 * (t.pos - c.pos_le)
                * ((t.n - c.n_le) - (t.pos - c.pos_le))
                / (t.n - c.n_le)) * 1000000.0 / t.n AS gini
  FROM cum c, tot t
  WHERE c.n_le < t.n
)
SELECT threshold, n_left, n_right, pos_left, pos_right,
       CAST(floor(gini + 0.5) AS BIGINT) AS gini_micro
FROM scored
ORDER BY gini, threshold
LIMIT 1
""")
def q_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact best Gini stump: the threshold t on ``n_chars`` minimizing
    the weighted Gini impurity of the ``x ≤ t`` / ``x > t`` split for
    the ``lang = 'en'`` label — the split-search kernel of every tree
    learner, evaluated at EVERY candidate, not a binned approximation.
    Tie-break: smallest threshold.

    Scale shape: the corpus reduces map-side to the feature histogram
    (≤ |distinct n_chars| rows — the document-length domain, not the
    row count); one bounded cumulative window yields left-side counts
    at every candidate simultaneously; Gini is a single deterministic
    double expression per candidate over exact BIGINTs, and the argmin
    is TakeOrderedAndProject(1)."""
    obs = load(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("bigint").alias("x"),
        (F.col("lang") == "en").cast("bigint").alias("y"),
    )
    hist = obs.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_x"),
        F.sum("y").cast("bigint").alias("pos_x"),
    )
    w = (
        Window.partitionBy(api.one_partition("x"))
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        "x",
        F.sum("n_x").over(w).cast("bigint").alias("n_le"),
        F.sum("pos_x").over(w).cast("bigint").alias("pos_le"),
    )
    tot = hist.agg(
        F.sum("n_x").cast("bigint").alias("n"),
        F.sum("pos_x").cast("bigint").alias("pos"),
    )
    j = cum.crossJoin(F.broadcast(tot)).where(F.col("n_le") < F.col("n"))
    n_r = F.col("n") - F.col("n_le")
    pos_r = F.col("pos") - F.col("pos_le")
    gini = (
        (
            F.lit(2.0)
            * F.col("pos_le")
            * (F.col("n_le") - F.col("pos_le"))
            / F.col("n_le")
            + F.lit(2.0) * pos_r * (n_r - pos_r) / n_r
        )
        * F.lit(1000000.0)
        / F.col("n")
    )
    return (
        j.select(
            F.col("x").alias("threshold"),
            F.col("n_le").alias("n_left"),
            n_r.alias("n_right"),
            F.col("pos_le").alias("pos_left"),
            pos_r.alias("pos_right"),
            gini.alias("gini"),
        )
        .orderBy("gini", "threshold")
        .limit(1)
        .select(
            "threshold",
            "n_left",
            "n_right",
            "pos_left",
            "pos_right",
            F.floor(F.col("gini") + F.lit(0.5))
            .cast("bigint")
            .alias("gini_micro"),
        )
    )


@query("q_ridge_path", oracle=rf"""
WITH xy AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y
  FROM documents
),
suff AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM xy
),
grid AS (SELECT unnest([{', '.join(str(a) for a in _RIDGE_ALPHAS)}])
           AS alpha)
SELECT CAST(g.alpha AS BIGINT) AS alpha,
       s.n,
       CAST(floor((s.n * s.sxy - s.sx * s.sy) * 1000000.0
                  / (s.n * s.sxx - s.sx * s.sx + s.n * g.alpha) + 0.5)
            AS BIGINT) AS slope_micro,
       CAST(floor((s.n * s.sxx - s.sx * s.sx) * 1000000.0
                  / (s.n * s.sxx - s.sx * s.sx + s.n * g.alpha) + 0.5)
            AS BIGINT) AS shrink_ppm
FROM suff s CROSS JOIN grid g
ORDER BY alpha
""")
def q_ridge_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regularization path: the L2-penalized slope
    β(α) = S_xy/(S_xx + nα) of tokens-per-document on character count
    for a fixed α grid, with the shrinkage factor S_xx/(S_xx + nα) in
    ppm (= effective degrees of freedom of the single coefficient).
    α = 0 reproduces ``q_grouped_ols``'s OLS slope exactly.

    Scale shape: ONE map-side-combined aggregate produces the five
    integer moments; the whole path is an in-row explode of the
    |grid|-row constant — evaluating 5 or 500 λ points costs the same
    corpus work. Each output value is one float division over exact
    BIGINTs (the q_grouped_ols quantization discipline)."""
    xy = load(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("y"),
    )
    suff = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    path = suff.select(
        "*",
        F.explode(
            F.array(*[F.lit(a).cast("bigint") for a in _RIDGE_ALPHAS])
        ).alias("alpha"),
    )
    sxy_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    sxx_n = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    denom = sxx_n + F.col("n") * F.col("alpha")
    return path.select(
        "alpha",
        "n",
        F.floor(sxy_n * F.lit(1000000.0) / denom + F.lit(0.5))
        .cast("bigint")
        .alias("slope_micro"),
        F.floor(sxx_n * F.lit(1000000.0) / denom + F.lit(0.5))
        .cast("bigint")
        .alias("shrink_ppm"),
    ).orderBy("alpha")


@query("q_kfold_cv", oracle=rf"""
WITH xy AS (
  SELECT CAST({_K_FOLDS} * ((
           (strpos('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))
         ) // 256 AS BIGINT) AS fold,
         CAST(n_chars AS BIGINT) AS x,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y
  FROM documents
),
fm AS (
  SELECT fold,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM xy GROUP BY fold
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(sx) AS BIGINT) AS sx,
         CAST(sum(sy) AS BIGINT) AS sy, CAST(sum(sxy) AS BIGINT) AS sxy,
         CAST(sum(sxx) AS BIGINT) AS sxx
  FROM fm
),
trained AS (
  SELECT f.fold, f.n AS n_test,
         CAST(floor(((t.n - f.n) * (t.sxy - f.sxy)
                     - (t.sx - f.sx) * (t.sy - f.sy)) * 1000000.0
                    / ((t.n - f.n) * (t.sxx - f.sxx)
                       - (t.sx - f.sx) * (t.sx - f.sx)) + 0.5)
              AS BIGINT) AS slope_micro,
         f.sx, f.sy, f.sxy, f.sxx, f.syy,
         t.n - f.n AS n_train, t.sx - f.sx AS sx_tr, t.sy - f.sy AS sy_tr
  FROM fm f, tot t
),
withb AS (
  SELECT fold, n_test, slope_micro,
         CAST(floor((sy_tr * 1000000 - slope_micro * sx_tr) * 1.0
                    / n_train + 0.5) AS BIGINT) AS intercept_micro,
         sx, sy, sxy, sxx, syy
  FROM trained
)
SELECT fold, n_test, slope_micro, intercept_micro,
       ROUND(sqrt(greatest(
         (syy * 1e12
          + slope_micro * slope_micro * sxx
          + n_test * intercept_micro * intercept_micro
          - 2.0 * slope_micro * 1e6 * sxy
          - 2.0 * intercept_micro * 1e6 * sy
          + 2.0 * slope_micro * intercept_micro * sx)
         / (n_test * 1e12), 0.0)), 4) AS rmse_test
FROM withb
ORDER BY fold
""")
def q_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validation of the closed-form OLS (tokens ~
    n_chars) in ONE corpus pass: folds assign by md5(doc_id) byte (the
    q_hash_split determinism), per-fold sufficient statistics aggregate
    once, fold f's model trains on (totals − fold f) BY MOMENT
    SUBTRACTION, and its held-out RMSE expands algebraically —
    SSE = Σy² + nâ² + b̂²Σx² − 2b̂Σxy − 2âΣy + 2âb̂Σx — from the SAME
    fold moments. No second scan, no per-fold filter-and-refit: the
    k-fold estimate costs exactly one aggregation at any scale.

    Exactness: slope/intercept quantize to integer micro-units from
    exact BIGINT moments (the q_grouped_ols discipline); the held-out
    SSE is then ONE deterministic double expression over those
    integers, identical cross-engine; ``greatest(·, 0)`` guards the
    tiny negative residue exact-fit folds could float to."""
    h1 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 2, 1)
    byte = (
        (F.instr(F.lit("0123456789abcdef"), h1) - 1) * 16
        + (F.instr(F.lit("0123456789abcdef"), h2) - 1)
    )
    xy = load(spark, sf_dir, "documents").select(
        # 5*byte/256 is an exact small-int/2^8 double in [0, 4.98];
        # truncation == floor for positives, identical to DuckDB's //
        (F.lit(_K_FOLDS) * byte / 256).cast("bigint").alias("fold"),
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("y"),
    )
    fm = xy.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    tot = fm.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("sx").cast("bigint").alias("tsx"),
        F.sum("sy").cast("bigint").alias("tsy"),
        F.sum("sxy").cast("bigint").alias("tsxy"),
        F.sum("sxx").cast("bigint").alias("tsxx"),
    )
    j = fm.crossJoin(F.broadcast(tot))
    n_tr = F.col("tn") - F.col("n")
    sx_tr = F.col("tsx") - F.col("sx")
    sy_tr = F.col("tsy") - F.col("sy")
    sxy_tr = F.col("tsxy") - F.col("sxy")
    sxx_tr = F.col("tsxx") - F.col("sxx")
    slope = F.floor(
        (n_tr * sxy_tr - sx_tr * sy_tr)
        * F.lit(1000000.0)
        / (n_tr * sxx_tr - sx_tr * sx_tr)
        + F.lit(0.5)
    ).cast("bigint")
    withb = j.select(
        "fold",
        F.col("n").alias("n_test"),
        slope.alias("slope_micro"),
        F.floor(
            (sy_tr * F.lit(1000000) - slope * sx_tr) * F.lit(1.0) / n_tr
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("intercept_micro"),
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
    )
    sse = (
        F.col("syy") * F.lit(1e12)
        + F.col("slope_micro") * F.col("slope_micro") * F.col("sxx")
        + F.col("n_test")
        * F.col("intercept_micro")
        * F.col("intercept_micro")
        - F.lit(2.0) * F.col("slope_micro") * F.lit(1e6) * F.col("sxy")
        - F.lit(2.0) * F.col("intercept_micro") * F.lit(1e6) * F.col("sy")
        + F.lit(2.0)
        * F.col("slope_micro")
        * F.col("intercept_micro")
        * F.col("sx")
    )
    return withb.select(
        "fold",
        "n_test",
        "slope_micro",
        "intercept_micro",
        F.round(
            F.sqrt(
                F.greatest(
                    sse / (F.col("n_test") * F.lit(1e12)), F.lit(0.0)
                )
            ),
            4,
        ).alias("rmse_test"),
    ).orderBy("fold")
