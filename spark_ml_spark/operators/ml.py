"""Reference-parity ML pipeline (SURVEY.md §2.10, milestone 2).

The reference's signature computation (``Data_transform.py:87-179``): per
dive site, scatter per-family counts into a fixed-vocabulary vector,
L1-normalize, append the (leaky) latitude feature, then fit RandomForest /
GBT regressors and report RMSE.

Transplanted onto the driver's star schema: *sites → customers*,
*fish families → part brands* (fixed 25-value vocabulary, mirroring
``familias.txt``), *counts → summed quantities*, *latitude/longitude →
c_acctbal*. Feature construction is a declarative pivot (broadcast dim
join + hash aggregate, no ``groupByKey``), vectorization is
``VectorAssembler`` + ``Normalizer(p=1)`` inside a ``pyspark.ml.Pipeline``
(BASELINE.json approach: "MLlib pipelines"), and the split is SEEDED — the
reference's unseeded split (``Data_transform.py:155``) made its RMSE
nondeterministic (SURVEY §1.3.6).

The target-leakage quirk (``Data_transform.py:117`` appends the latitude
label to the features; SURVEY §1.3.4) is reproduced behind the
``include_label_feature`` flag — it is load-bearing for the reference's
published RMSE(lat) ≪ RMSE(lon) signature.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import Normalizer, VectorAssembler
from pyspark.ml.regression import GBTRegressor, RandomForestRegressor
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark import api
from spark_ml_spark.registry import query

#: fixed feature vocabulary (the ``familias.txt`` analogue) — passed
#: explicitly to pivot() so no distinct scan runs and column order is
#: deterministic (reference: ``Data_transform.py:82,91``).
BRANDS = tuple(f"Brand#{i}" for i in range(1, 26))
_BCOL = {b: f"b{i}" for i, b in enumerate(BRANDS, start=1)}

SEED = 42


def build_feature_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer brand-quantity pivot + label — the analytical table
    (reference's ``rddVectors``, ``Data_transform.py:99-122``) as one
    Catalyst plan: pruned scans → broadcast dim join → pivot hash-agg."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    piv = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("o_custkey")
        .pivot("p_brand", list(BRANDS))
        .agg(F.sum("l_quantity"))
        .na.fill(0.0, list(BRANDS))
    )
    renamed = piv.select(
        "o_custkey", *[F.col(f"`{b}`").alias(_BCOL[b]) for b in BRANDS]
    )
    return renamed.join(c, renamed.o_custkey == c.c_custkey).drop("c_custkey")


def _ml_features_oracle() -> str:
    """Generated oracle SQL for q_ml_features: 25 conditional sums +
    row-wise L1 normalization, matching the pivot column-for-column."""
    sums = ",\n         ".join(
        f"sum(CASE WHEN p_brand = '{b}' THEN l_quantity ELSE 0 END) AS {_BCOL[b]}"
        for b in BRANDS
    )
    tot = " + ".join(_BCOL[b] for b in BRANDS)
    fracs = ",\n       ".join(
        f"CAST(ROUND({_BCOL[b]} * 1000000.0 / NULLIF({tot}, 0)) AS BIGINT)"
        f" AS ppm_{_BCOL[b]}" for b in BRANDS
    )
    return f"""
WITH piv AS (
  SELECT o_custkey,
         {sums}
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON l_partkey  = p_partkey
  GROUP BY o_custkey
)
SELECT o_custkey,
       {fracs},
       ROUND(c_acctbal, 2) AS label
FROM piv JOIN customer ON o_custkey = c_custkey
"""


@query("q_ml_features", oracle=_ml_features_oracle())
def q_ml_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 (feature vectorization), SQL-checkable half: the pivot +
    L1-normalize stages as plain columns (SURVEY §7 risk 1: VectorUDT is
    not DuckDB-representable, so vectors are assembled only at the ML
    boundary)."""
    ft = build_feature_table(spark, sf_dir)
    total = F.nullif(
        sum(F.col(_BCOL[b]) for b in BRANDS).cast("double"), F.lit(0.0)
    )
    # integer parts-per-million, not ROUND(frac, 6): quantities are
    # integers, so bsum*1e6/total is the IDENTICAL double in both engines
    # and its integer round is engine-exact (exact .5 ties are exactly
    # representable and both engines round them up). ROUND(frac, 6) sat on
    # quotients like 41/640 = 0.0640625 that terminate at the 7th decimal,
    # where Spark (shortest-decimal-repr HALF_UP) and DuckDB (binary-value
    # rounding) legitimately disagree — caught at sf0.1.
    return ft.select(
        "o_custkey",
        *[
            F.round(F.col(_BCOL[b]) * 1000000.0 / total, 0)
            .cast("bigint").alias(f"ppm_{_BCOL[b]}")
            for b in BRANDS
        ],
        F.round(F.col("c_acctbal"), 2).alias("label"),
    )


def _fit_and_eval(
    spark: SparkSession,
    sf_dir: str,
    algo: str,
    include_label_feature: bool = False,
) -> DataFrame:
    """Pipeline(assemble → L1-normalize → regressor) with a seeded 70/30
    split and RMSE evaluation (reference: ``Data_transform.py:155-179``).

    ``include_label_feature=True`` reproduces the reference's target
    leakage (``Data_transform.py:117``) for parity experiments.
    """
    ft = build_feature_table(spark, sf_dir).withColumnRenamed("c_acctbal", "label")
    feature_cols = [_BCOL[b] for b in BRANDS]
    if include_label_feature:
        feature_cols = feature_cols + ["label"]

    assembler = VectorAssembler(inputCols=feature_cols, outputCol="raw_features")
    normalizer = Normalizer(inputCol="raw_features", outputCol="features", p=1.0)
    if algo == "rf":
        reg = RandomForestRegressor(
            featuresCol="features", labelCol="label", seed=SEED
        )
    elif algo == "gbt":
        reg = GBTRegressor(featuresCol="features", labelCol="label", seed=SEED)
    else:
        raise ValueError(algo)
    pipe = Pipeline(stages=[assembler, normalizer, reg])

    # reference splits unseeded (Data_transform.py:155) — we seed for
    # testability (SURVEY §1.3.6). Cache: both fit and eval traverse it.
    train, test = ft.randomSplit([0.7, 0.3], seed=SEED)
    train = train.cache()
    model = pipe.fit(train)
    predictions = model.transform(test)
    rmse = RegressionEvaluator(
        labelCol="label", predictionCol="prediction", metricName="rmse"
    ).evaluate(predictions)
    # count while still cached (VERDICT r1 minor: counting after
    # unpersist() re-ran the whole feature plan)
    n_train = train.count()
    n_test = predictions.count()
    train.unpersist()
    return spark.createDataFrame(
        [(algo, "c_acctbal", float(rmse), n_train, n_test)],
        "algo string, label string, rmse double, n_train long, n_test long",
    )


@query("q_rf_regression")  # rows-only: tree ensembles are not SQL-expressible
def q_rf_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: RandomForestRegressor fit/eval (reference
    ``Data_transform.py:158-166``)."""
    return _fit_and_eval(spark, sf_dir, "rf")


@query("q_gbt_regression")  # rows-only
def q_gbt_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: GBTRegressor fit/eval (reference ``Data_transform.py:168-179``)."""
    return _fit_and_eval(spark, sf_dir, "gbt")


@query("q_random_split")  # rows-only: Bernoulli sampling is engine-specific
def q_random_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: seeded 70/30 random split; returns per-split row counts
    (reference: ``Data_transform.py:155-157``).

    ONE pass, not two: ``randomSplit`` + two ``.count()`` calls traverse
    the whole feature-table plan (join + pivot hash-agg) once per split
    — 3.5 s at sf0.1, all of it duplicated work. A seeded Bernoulli
    split with the same 70/30 expectation (``F.rand(SEED) < 0.7``; NOT
    bit-identical to ``randomSplit``'s per-partition-seeded
    sort-then-sample — counts differ slightly, fine for a rows-only
    query) expressed as a split-label column + group-by runs the plan
    once and combines map-side (r8, wording per VERDICT r8 #7; was the
    slowest non-iterative query in BENCH_DETAIL). At 100 TB the two-traversal
    shape doubles the dominant cost for no information gain."""
    ft = build_feature_table(spark, sf_dir)
    is_train = (F.rand(SEED) < 0.7).cast("bigint")
    counts = ft.select(is_train.alias("t")).agg(
        F.coalesce(F.sum("t"), F.lit(0)).alias("n_train"),
        F.coalesce(F.count(F.lit(1)) - F.sum("t"), F.lit(0)).alias("n_test"),
    )
    # explode a 2-struct array so BOTH rows always appear — a group-by
    # on the split label would drop an empty split (and the old
    # randomSplit version always emitted both rows, including n=0)
    return counts.select(
        F.explode(F.array(
            F.struct(F.lit("train").alias("split"),
                     F.col("n_train").alias("n_rows")),
            F.struct(F.lit("test").alias("split"),
                     F.col("n_test").alias("n_rows")),
        )).alias("s")
    ).select("s.split", "s.n_rows")


@query("q_ols_regression", oracle="""
SELECT ROUND(regr_slope(o_totalprice, qty), 4)     AS slope,
       ROUND(regr_intercept(o_totalprice, qty), 4) AS intercept,
       ROUND(regr_r2(o_totalprice, qty), 4)        AS r2
FROM (
  SELECT o_totalprice, sum(l_quantity) AS qty
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_orderkey, o_totalprice
)
""")
def q_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form simple linear regression (order price ~ total order
    quantity) computed as ONE distributed aggregation — slope = cov/var,
    r² = corr², no iterative solver, no driver-side math. The shape that
    fits a trillion-row regression in a single pass; the MLlib estimator
    path (`q_rf_regression` etc.) exists for the models that genuinely
    need iteration."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    slope = F.covar_samp("qty", "o_totalprice") / F.var_samp("qty")
    intercept = F.avg("o_totalprice") - slope * F.avg("qty")
    r2 = F.pow(F.corr("qty", "o_totalprice"), 2)
    return per_order.agg(
        F.round(slope, 4).alias("slope"),
        F.round(intercept, 4).alias("intercept"),
        F.round(r2, 4).alias("r2"),
    )


@query("q_model_selection")  # rows-only: tree fits are not SQL-expressible
def q_model_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperparameter selection with TrainValidationSplit (seeded): grid
    over RandomForest maxDepth, best model evaluated on the held-out
    fold. Distributed fits, driver-side only the 2-entry param grid —
    the MLlib-pipelines idiom for model selection at scale."""
    from pyspark.ml import Pipeline
    from pyspark.ml.evaluation import RegressionEvaluator
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.tuning import ParamGridBuilder, TrainValidationSplit

    ft = build_feature_table(spark, sf_dir).withColumnRenamed("c_acctbal", "label")
    feature_cols = [_BCOL[b] for b in BRANDS]
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="features")
    rf = RandomForestRegressor(featuresCol="features", labelCol="label", seed=SEED)
    evaluator = RegressionEvaluator(
        labelCol="label", predictionCol="prediction", metricName="rmse"
    )
    tvs = TrainValidationSplit(
        estimator=Pipeline(stages=[assembler, rf]),
        estimatorParamMaps=(
            ParamGridBuilder().addGrid(rf.maxDepth, [3, 5]).build()
        ),
        evaluator=evaluator,
        trainRatio=0.75,
        seed=SEED,
    )
    model = tvs.fit(ft)
    best_depth = model.bestModel.stages[-1].getMaxDepth()
    metrics = [float(m) for m in model.validationMetrics]
    return spark.createDataFrame(
        [(int(best_depth), round(min(metrics), 4), round(max(metrics), 4))],
        "best_max_depth int, best_rmse double, worst_rmse double",
    )


@query("q_rmse", oracle="""
SELECT 'mean_predictor' AS model,
       ROUND(sqrt(avg((value - m) * (value - m))), 4) AS rmse
FROM events, (SELECT avg(value) AS m FROM events)
""")
def q_rmse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: the RMSE evaluator's formula (``sqrt(mean((pred-label)²))``,
    reference ``Data_transform.py:163-166``) is itself SQL-expressible —
    checked here against a mean-predictor baseline over events.value."""
    ev = load(spark, sf_dir, "events")
    mean_df = ev.agg(F.avg("value").alias("m"))
    return (
        ev.crossJoin(F.broadcast(mean_df))
        .agg(
            F.round(
                F.sqrt(F.avg((F.col("value") - F.col("m")) * (F.col("value") - F.col("m")))),
                4,
            ).alias("rmse")
        )
        .select(F.lit("mean_predictor").alias("model"), "rmse")
    )


@query("q_logreg_classify")  # rows-only: iterative solver, engine-specific
def q_logreg_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass classification (the surface the regression-only
    reference lacks): logistic regression over the embeddings table,
    label = the 10-class ``label`` column, features = the raw embedding.

    The train/test split is md5-hash-gated (the same scale-correct split
    as ``q_hash_split`` — no RNG state). Rows-only (an iterative solver
    isn't SQL-expressible). Honesty note: the fixture's embeddings carry
    almost no label signal, so accuracy sits at the 10-class chance
    level (~0.09-0.15 at sf0.01) and wobbles with the float summation
    order of ``treeAggregate`` gradients across partitionings — the op
    demonstrates the distributed classification pipeline (hash split →
    L-BFGS fit → evaluator), not a modeling feat, and the test asserts
    structure, not accuracy. Scale: MLlib LR is one tree-aggregated
    gradient pass per iteration — no driver-side data, state is one
    dense coefficient matrix."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.functions import array_to_vector

    from spark_ml_spark.functions.vector import to_double_array

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("label").cast("double").alias("label"),
        array_to_vector(to_double_array("embedding")).alias("features"),
    )
    gate = F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8)
    train = emb.filter(gate < "cccccccd")   # ~80%
    test = emb.filter(gate >= "cccccccd")   # ~20%
    lr = LogisticRegression(maxIter=50, regParam=0.01, featuresCol="features",
                            labelCol="label")
    model = lr.fit(train)
    preds = model.transform(test)
    acc = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="prediction", metricName="accuracy"
    ).evaluate(preds)
    n_train, n_test = train.count(), preds.count()
    return spark.createDataFrame(
        [("logreg", n_train, n_test, round(float(acc), 4))],
        "model string, n_train long, n_test long, accuracy double",
    )


@query("q_grouped_ols", oracle=r"""
WITH xy AS (
  SELECT lang,
         CAST(n_chars AS BIGINT) AS x,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y
  FROM documents
),
suff AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT)     AS sx,
         CAST(sum(y) AS BIGINT)     AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM xy GROUP BY lang
)
SELECT lang, n, sx, sy, sxy, sxx,
       CAST(floor((n * sxy - sx * sy) * 1000000.0 / (n * sxx - sx * sx)
                  + 0.5) AS BIGINT) AS slope_micro,
       CAST(floor((sy * 1000000 - CAST(floor((n * sxy - sx * sy) * 1000000.0
                                             / (n * sxx - sx * sx) + 0.5)
                                       AS BIGINT) * sx) * 1.0 / n + 0.5)
            AS BIGINT) AS intercept_micro
FROM suff
""")
def q_grouped_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS — tokens-per-document regressed on
    character count, one line fit PER LANGUAGE from sufficient
    statistics (n, Σx, Σy, Σxy, Σx²): slope = (nΣxy − ΣxΣy)/(nΣx² −
    (Σx)²). This is how regression actually runs at 100 TB — the model
    fit is a MAP-SIDE-COMBINED AGGREGATION (five BIGINT sums merge
    associatively per partition, the closed form evaluates on the
    |groups|-row result), not an iterative solver pass over the data;
    the global-MLlib twin is ``q_ols_regression`` (rows-only, engine
    solver). Slope/intercept quantize to integer micro-units in ONE
    float division per OUTPUT row over exact integer operands (the
    q_lm_score discipline), and the intercept reuses the already
    quantized slope so both engines round the same value.

    Cites ``Data_transform.py:142-178`` (the reference's only model
    fits are whole-table MLlib RF/GBT) — grouped closed-form fitting
    is the scale extension its RDD pipeline cannot express without a
    per-group collect."""
    xy = load(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
        .alias("y"),
    )
    suff = xy.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = F.floor(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * F.lit(1000000.0)
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        + F.lit(0.5)
    ).cast("bigint")
    return suff.select(
        "lang",
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        slope.alias("slope_micro"),
        F.floor(
            (F.col("sy") * F.lit(1000000) - slope * F.col("sx"))
            * F.lit(1.0)
            / F.col("n")
            + F.lit(0.5)
        ).cast("bigint").alias("intercept_micro"),
    )


@query("q_auc", oracle="""
WITH scored AS (
  SELECT n_chars AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
hist AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n_s,
         CAST(sum(y) AS BIGINT) AS pos_s
  FROM scored GROUP BY s
),
cum AS (
  SELECT s, n_s, pos_s,
         CAST(COALESCE(sum(n_s) OVER (ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS below
  FROM hist
),
agg AS (
  SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
         CAST(sum(n_s) - sum(pos_s) AS BIGINT) AS n_neg,
         CAST(sum(pos_s * (2 * below + n_s + 1)) AS BIGINT) AS r2_pos
  FROM cum
)
SELECT n_pos, n_neg,
       r2_pos - n_pos * (n_pos + 1) AS u2,
       CAST(((r2_pos - n_pos * (n_pos + 1)) * 1000000 + n_pos * n_neg)
            // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
FROM agg
""")
def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of a score against a binary label (does document
    length discriminate English?) via the Mann-Whitney rank-sum
    identity AUC = U/(n₊·n₋) — the standard large-scale AUC evaluation,
    computed WITHOUT ranking rows: ranks aggregate per DISTINCT SCORE
    (tie-corrected average rank of score s = below(s) + (n_s+1)/2, kept
    integer by working in DOUBLED rank units), so the corpus reduces to
    a score histogram map-side, the cumulative runs over |distinct
    scores| rows, and one fold yields U. Everything BIGINT, AUC in ppm
    by rounded integer division — hash-exact cross-engine, which
    per-row float rank-averaging would not be.

    Scale shape: the q_skew_profile count-of-counts discipline applied
    to model evaluation — a billion scored rows become |distinct
    scores| histogram rows before any ordering happens; the window is
    over that histogram, never the data. The MLlib twin
    (BinaryClassificationEvaluator inside ``q_model_selection``) is
    rows-only; this one is the oracle-checkable form. Cites
    ``Data_transform.py:163-178`` — the reference evaluates with RMSE
    only; classification-eval depth is a north-star extension."""
    scored = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("s"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    hist = scored.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s"),
        F.sum("y").cast("bigint").alias("pos_s"),
    )
    from pyspark.sql import Window as W

    cum = hist.withColumn(
        "below",
        F.coalesce(
            # lit(0) key: window runs on the score HISTOGRAM (bounded
            # distinct scores), single-partition by design — silences the
            # WindowExec warning without changing the plan shape
            F.sum("n_s").over(
                W.partitionBy(api.one_partition("s"))
                .orderBy("s")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("bigint"),
    )
    agg = cum.agg(
        F.sum("pos_s").cast("bigint").alias("n_pos"),
        (F.sum("n_s") - F.sum("pos_s")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("pos_s") * (2 * F.col("below") + F.col("n_s") + 1)
        ).cast("bigint").alias("r2_pos"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        (F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1))
        .cast("bigint").alias("u2"),
        F.expr(
            "CAST(((r2_pos - n_pos * (n_pos + 1)) * 1000000"
            " + n_pos * n_neg) DIV (2 * n_pos * n_neg) AS BIGINT)"
        ).alias("auc_ppm"),
    )


@query("q_spearman", oracle=r"""
WITH xy AS (
  SELECT CAST(n_chars AS BIGINT) AS x,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS y
  FROM documents
),
hx AS (
  SELECT x, CAST(count(*) AS BIGINT) AS n_v FROM xy GROUP BY x
),
rx AS (
  SELECT x,
         2 * CAST(COALESCE(sum(n_v) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) + n_v + 1 AS r2
  FROM hx
),
hy AS (
  SELECT y, CAST(count(*) AS BIGINT) AS n_v FROM xy GROUP BY y
),
ry AS (
  SELECT y,
         2 * CAST(COALESCE(sum(n_v) OVER (ORDER BY y
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) + n_v + 1 AS r2
  FROM hy
),
ranked AS (
  SELECT rx.r2 AS a, ry.r2 AS b
  FROM xy JOIN rx ON rx.x = xy.x JOIN ry ON ry.y = xy.y
),
suff AS (
  SELECT CAST(count(*) AS BIGINT)     AS n,
         CAST(sum(a) AS BIGINT)       AS sa,
         CAST(sum(b) AS BIGINT)       AS sb,
         CAST(sum(a * b) AS BIGINT)   AS sab,
         CAST(sum(a * a) AS BIGINT)   AS saa,
         CAST(sum(b * b) AS BIGINT)   AS sbb
  FROM ranked
)
SELECT n, sa, sb, sab, saa, sbb,
       CAST(floor((n * sab - sa * sb) * 1000000.0
                  / (sqrt((n * saa - sa * sa) * 1.0)
                     * sqrt((n * sbb - sb * sb) * 1.0)) + 0.5)
            AS BIGINT) AS rho_ppm
FROM suff
""")
def q_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected Spearman rank correlation between document
    length and token count — Pearson over average ranks, with ranks
    kept in DOUBLED integer units so ties never produce fractional
    ranks (avg rank of value v = below(v) + (n_v+1)/2; doubled:
    2·below + n_v + 1). The rank-based robust sibling of the Pearson
    ``q_corr_matrix`` (outlier-insensitive, monotone-invariant — the
    right correlation for heavy-tailed corpus statistics).

    Scale shape: the ``q_auc`` count-of-counts discipline per variable
    — each variable reduces to a value histogram map-side, cumulatives
    run over |distinct values| histogram rows, and the rank maps
    broadcast back onto one corpus pass that accumulates five BIGINT
    sufficient statistics (the ``q_grouped_ols`` fit dataflow). Every
    accumulator integer; the single float evaluation is the final
    ρ = cov/(σₐ·σᵦ) on exact BIGINT operands (IEEE sqrt is correctly
    rounded, so both engines compute the identical double). For
    continuous variables, quantize to a grid first so the histograms
    stay bounded."""
    from pyspark.sql import Window as W

    xy = load(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("bigint").alias("x"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
        .alias("y"),
    )

    def rank_map(col: str):
        h = xy.groupBy(col).agg(F.count(F.lit(1)).cast("bigint").alias("n_v"))
        return h.withColumn(
            "r2",
            2
            * F.coalesce(
                # lit(0) key: value-histogram window (bounded), see q_auc
                F.sum("n_v").over(
                    W.partitionBy(api.one_partition(col))
                    .orderBy(col)
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("bigint")
            + F.col("n_v")
            + 1,
        ).select(col, "r2")
    rx = rank_map("x").withColumnRenamed("r2", "a")
    ry = rank_map("y").withColumnRenamed("r2", "b")
    ranked = xy.join(F.broadcast(rx), "x").join(F.broadcast(ry), "y")
    suff = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("a").cast("bigint").alias("sa"),
        F.sum("b").cast("bigint").alias("sb"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("sab"),
        F.sum(F.col("a") * F.col("a")).cast("bigint").alias("saa"),
        F.sum(F.col("b") * F.col("b")).cast("bigint").alias("sbb"),
    )
    return suff.select(
        "n",
        "sa",
        "sb",
        "sab",
        "saa",
        "sbb",
        F.floor(
            (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb"))
            * F.lit(1000000.0)
            / (
                F.sqrt((F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")) * F.lit(1.0))
                * F.sqrt((F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")) * F.lit(1.0))
            )
            + F.lit(0.5)
        ).cast("bigint").alias("rho_ppm"),
    )


@query("q_nb_classify", oracle=r"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
),
langs AS (
  SELECT lang,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT)               AS n_toks
  FROM toks GROUP BY lang
),
vocab AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM toks),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS docs FROM langs),
-- per-language constants quantized to integer micro-nats ONCE (the
-- q_lm_score discipline): prior surprisal and the unseen-token default
lconst AS (
  SELECT l.lang,
         CAST(floor(-ln(l.n_docs / CAST(t.docs AS DOUBLE)) * 1000000.0
                    + 0.5) AS BIGINT) AS prior_micro,
         CAST(floor(-ln(1 / CAST(l.n_toks + vocab.v AS DOUBLE)) * 1000000.0
                    + 0.5) AS BIGINT) AS default_micro,
         l.n_toks
  FROM langs l CROSS JOIN tot t CROSS JOIN vocab
),
model AS (
  SELECT tk.lang, tk.token, CAST(count(*) AS BIGINT) AS c
  FROM toks tk GROUP BY tk.lang, tk.token
),
-- delta vs the unseen default, quantized at the model table: the score
-- decomposition  score = prior + N_doc*default + sum(delta over SEEN
-- (lang, token) pairs)  keeps the dense lang x vocab grid virtual
deltas AS (
  SELECT m.lang, m.token,
         CAST(floor(-ln((m.c + 1) / CAST(lc.n_toks + vocab.v AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT)
           - lc.default_micro AS delta_micro
  FROM model m JOIN lconst lc USING (lang) CROSS JOIN vocab
),
docs AS (
  SELECT doc_id, max(lang) AS true_lang,
         CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY doc_id
),
dsum AS (
  SELECT t.doc_id, d.lang,
         CAST(sum(d.delta_micro) AS BIGINT) AS delta_sum
  FROM toks t JOIN deltas d ON t.token = d.token
  GROUP BY t.doc_id, d.lang
),
scored AS (
  SELECT docs.doc_id, docs.true_lang, lc.lang,
         lc.prior_micro + docs.n_tokens * lc.default_micro
           + COALESCE(ds.delta_sum, 0) AS score_micro
  FROM docs CROSS JOIN lconst lc
  LEFT JOIN dsum ds ON ds.doc_id = docs.doc_id AND ds.lang = lc.lang
),
pred AS (
  SELECT doc_id, true_lang, lang AS pred_lang FROM (
    SELECT doc_id, true_lang, lang,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score_micro, lang) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY true_lang, pred_lang
""")
def q_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M+: multinomial naive Bayes language classification — fit add-one
    smoothed per-language unigram models on the corpus, classify every
    document by minimum total surprisal (= maximum log-likelihood +
    prior), output the confusion matrix against the labeled ``lang``
    column. The model-based sibling of the heuristic ``q_lang_id``, and
    the supervised twin of ``q_lm_score``'s single LM.

    Engine exactness: all log terms quantize to integer micro-nats at
    MODEL granularity (one ln per distinct (lang, token) pair + one
    prior/default pair per language), so document scores are exact
    BIGINT sums; argmin ties break on language code.

    Scale shape: the dense |langs|x|vocab| grid is NEVER materialized —
    the score decomposes as prior + n_tokens*default + Σ delta over
    SEEN pairs only, so the token stream joins the (lang, token) delta
    table on the token key (broadcast, vocab-sized) with a bounded
    |langs|-way fanout, and the per-(doc, lang) sum map-side-combines.
    The doc x lang completion broadcasts the per-language constants as
    ONE array-of-structs scalar row and explodes it per document —
    bounded fanout, no data-sized nested-loop join anywhere."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("token"),
    ).persist()
    langs = toks.groupBy("lang").agg(
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_toks"),
    )
    vocab = toks.agg(F.countDistinct("token").cast("long").alias("v"))
    tot = langs.agg(F.sum("n_docs").cast("long").alias("docs"))
    lconst = (
        langs.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            F.floor(
                -F.log(F.col("n_docs") / F.col("docs").cast("double"))
                * 1000000.0 + F.lit(0.5)
            ).cast("long").alias("prior_micro"),
            F.floor(
                -F.log(
                    F.lit(1) / (F.col("n_toks") + F.col("v")).cast("double")
                ) * 1000000.0 + F.lit(0.5)
            ).cast("long").alias("default_micro"),
            "n_toks",
        )
    )
    model = toks.groupBy("lang", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    deltas = (
        model.join(F.broadcast(lconst), "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang", "token",
            (
                F.floor(
                    -F.log(
                        (F.col("c") + 1)
                        / (F.col("n_toks") + F.col("v")).cast("double")
                    ) * 1000000.0 + F.lit(0.5)
                ).cast("long")
                - F.col("default_micro")
            ).alias("delta_micro"),
        )
    )
    docs = toks.groupBy("doc_id").agg(
        F.max("lang").alias("true_lang"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
    )
    dsum = (
        toks.select("doc_id", "token")  # drop the true-lang column: the
        # join below brings the CANDIDATE lang from the delta table
        .join(F.broadcast(deltas), "token")
        .groupBy("doc_id", F.col("lang").alias("cand_lang"))
        .agg(F.sum("delta_micro").cast("long").alias("delta_sum"))
    )
    # doc x lang completion: the per-language constants fold into ONE
    # ungrouped-aggregate row (array of |langs| structs) broadcast as a
    # scalar — the repo's sanctioned 1-row crossJoin form — and explode
    # re-expands them per document (bounded |langs|-way fanout)
    lconst_arr = lconst.agg(
        F.collect_list(
            F.struct("lang", "prior_micro", "default_micro")
        ).alias("larr")
    )
    grid = (
        docs.crossJoin(F.broadcast(lconst_arr))
        .select(
            "doc_id", "true_lang", "n_tokens",
            F.explode("larr").alias("lc"),
        )
        .select(
            "doc_id", "true_lang", "n_tokens",
            F.col("lc.lang").alias("lang"),
            F.col("lc.prior_micro").alias("prior_micro"),
            F.col("lc.default_micro").alias("default_micro"),
        )
    )
    scored = grid.join(
        dsum,
        (grid.doc_id == dsum.doc_id) & (grid.lang == dsum.cand_lang),
        "left",
    ).select(
        grid.doc_id, "true_lang", "lang",
        (
            F.col("prior_micro")
            + F.col("n_tokens") * F.col("default_micro")
            + F.coalesce("delta_sum", F.lit(0))
        ).alias("score_micro"),
    )
    pred = (
        scored.groupBy("doc_id")
        .agg(
            F.max("true_lang").alias("true_lang"),
            F.min(F.struct("score_micro", "lang")).alias("m"),
        )
        .select("true_lang", F.col("m.lang").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


@query("q_calibration_bins", oracle="""
WITH scored AS (
  SELECT n_chars AS s,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
rng AS (
  SELECT CAST(min(s) AS BIGINT) AS mn, CAST(max(s) AS BIGINT) AS mx
  FROM scored
)
SELECT CAST((s - mn) * 10 // (mx - mn + 1) AS BIGINT)    AS bin,
       CAST(count(*) AS BIGINT)                          AS n,
       CAST(sum(y) AS BIGINT)                            AS n_pos,
       CAST(floor(sum(y) * 1000000.0 / count(*) + 0.5) AS BIGINT)
         AS pos_rate_ppm,
       CAST((2 * sum(s) + count(*)) // (2 * count(*)) AS BIGINT)
         AS avg_score
FROM scored CROSS JOIN rng
GROUP BY 1
""")
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M+ eval: reliability diagram / calibration table — the score
    range (here n_chars as a proxy score vs the lang='en' label, the
    same setup as ``q_auc``) splits into 10 equi-width bins; each bin
    reports population, positives, positive-rate ppm and mean score.
    Monotone pos_rate across bins = the threshold-free calibration
    read; AUC summarizes ranking, this table shows WHERE the score is
    (mis)calibrated.

    Engine exactness: bin ids and mean scores are pure non-negative
    integer div (half-up via the (2Σ+n) DIV 2n form — Spark DIV and
    DuckDB // agree on non-negatives); rates are floor-ppm.

    Scale shape: one ungrouped min/max aggregate broadcast as a 1-row
    scalar (the sanctioned crossJoin form), then a single 10-group
    map-side-combined hash aggregate — two passes total, no window,
    no sort."""
    scored = load(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("s"),
        (F.col("lang") == "en").cast("long").alias("y"),
    )
    rng = scored.agg(
        F.min("s").cast("long").alias("mn"),
        F.max("s").cast("long").alias("mx"),
    )
    return (
        scored.crossJoin(F.broadcast(rng))
        .groupBy(
            F.expr("CAST((s - mn) * 10 DIV (mx - mn + 1) AS BIGINT)")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("y").cast("long").alias("n_pos"),
            F.floor(F.sum("y") * 1000000.0 / F.count(F.lit(1)) + F.lit(0.5))
            .cast("long").alias("pos_rate_ppm"),
            F.expr(
                "CAST((2 * sum(s) + count(*)) DIV (2 * count(*)) AS BIGINT)"
            ).alias("avg_score"),
        )
    )


@query("q_roc_curve", oracle="""
WITH scored AS (
  SELECT CAST(n_chars // 100 AS BIGINT) AS bucket,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
hist AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(y) AS BIGINT) AS pos_b
  FROM scored GROUP BY bucket
),
tot AS (
  SELECT CAST(sum(pos_b) AS BIGINT) AS n_pos,
         CAST(sum(n_b) - sum(pos_b) AS BIGINT) AS n_neg
  FROM hist
),
suf AS (
  SELECT bucket,
         CAST(sum(pos_b) OVER (ORDER BY bucket DESC) AS BIGINT) AS tp,
         CAST(sum(n_b - pos_b) OVER (ORDER BY bucket DESC) AS BIGINT) AS fp
  FROM hist
)
SELECT bucket, tp, fp,
       CAST(floor(tp * 1000000.0 / n_pos + 0.5) AS BIGINT) AS tpr_ppm,
       CAST(floor(fp * 1000000.0 / n_neg + 0.5) AS BIGINT) AS fpr_ppm
FROM suf, tot
ORDER BY bucket
""")
def q_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC operating points for the ``q_auc`` score (n_chars as the
    score, lang='en' as the positive class), one point per 100-char
    score bucket: TP/FP counts of the ">= bucket" classifier and
    TPR/FPR in ppm — the threshold table behind the single-number AUC.

    Engine exactness: suffix sums over the BOUNDED bucket histogram
    (≤ ~60 rows) are exact BIGINTs; the only floats are the two
    quantized ratios per row. Scale shape: one corpus histogram
    aggregate (map-side combined); the suffix-sum window runs on the
    bucket histogram pinned to one partition via ``api.one_partition``
    (bounded by design — same discipline as q_auc's rank window)."""
    from pyspark.sql import Window as W

    from spark_ml_spark import api as _api

    scored = load(spark, sf_dir, "documents").select(
        F.expr("CAST(n_chars DIV 100 AS BIGINT)").alias("bucket"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    hist = scored.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("y").cast("bigint").alias("pos_b"),
    )
    tot = hist.agg(
        F.sum("pos_b").cast("bigint").alias("n_pos"),
        (F.sum("n_b") - F.sum("pos_b")).cast("bigint").alias("n_neg"),
    )
    w = (
        W.partitionBy(_api.one_partition("bucket"))
        .orderBy(F.col("bucket").desc())
        .rangeBetween(W.unboundedPreceding, 0)
    )
    suf = hist.select(
        "bucket",
        F.sum("pos_b").over(w).cast("bigint").alias("tp"),
        F.sum(F.col("n_b") - F.col("pos_b")).over(w).cast("bigint").alias("fp"),
    )
    return (
        suf.crossJoin(F.broadcast(tot))
        .select(
            "bucket", "tp", "fp",
            F.floor(F.col("tp") * 1000000.0 / F.col("n_pos") + F.lit(0.5))
            .cast("bigint").alias("tpr_ppm"),
            F.floor(F.col("fp") * 1000000.0 / F.col("n_neg") + F.lit(0.5))
            .cast("bigint").alias("fpr_ppm"),
        )
        .orderBy("bucket")
    )
