"""Round-5 wave-59: MLlib estimator depth — ALS collaborative
filtering, FPGrowth frequent itemsets (oracle-checked), and univariate
chi-square feature ranking.

``q_als_recommend`` — seeded ALS matrix factorization over the
customer × brand purchase-count matrix with top-3 recommendations for
a fixed user probe set; rows-only (an iterative latent-factor solver
is not SQL-expressible), with determinism pinned by seed.

``q_fpgrowth_itemsets`` — MLlib FPGrowth IS exact counting, so unlike
the tree fits it gets a full ORACLE: frequent 1- and 2-itemsets over
per-order brand baskets must match DuckDB's brute-force support
counts exactly (minCount = ceil(minSupport·n), MLlib's own rule).
The confidence/lift view of the same pairs is ``q_assoc_rules``;
this one pins the mining engine itself.

``q_feature_selection`` — univariate χ² ranking of categorical
features against the ``lang='en'`` label (the UnivariateFeatureSelector
shape, computed exactly): per feature one contingency aggregate, χ²
from integer counts with per-cell contributions quantized to nano
BEFORE the sum (order-free adds — the q_pagerank discipline).

Reference: ``Data_transform.py:158-179`` fits only RF/GBT regressors;
recommendation, pattern mining, and feature selection are north-star
extensions. Siblings: ``q_item_similarity`` (neighborhood CF),
``q_assoc_rules``, ``q_chisq_independence`` (single global test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

SEED = 42

#: FPGrowth minimum support (fraction of baskets)
_FP_MIN_SUPPORT = 0.01

#: FPGrowth output cut
_FP_TOP_K = 40


@query("q_als_recommend")  # rows-only: iterative latent-factor solver
def q_als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS implicit-feedback factorization (rank 4, 5 iterations,
    seeded) on the customer × brand purchase-count matrix, returning
    top-3 brand recommendations for the 5 lowest customer keys — the
    model-based counterpart of ``q_item_similarity``'s neighborhood
    CF. Rows-only: the solver is iterative linear algebra, but the
    SHAPE is pinned (exactly 15 rows, fixed schema) and the seed makes
    reruns reproducible.

    Scale shape: MLlib ALS is the canonical big-matrix factorizer —
    ratings shuffle by user/item blocks, factors update block-wise;
    the input aggregate here is one map-side-combined count. The probe
    set keeps the output tiny regardless of matrix size."""
    from pyspark.ml.recommendation import ALS

    ratings = (
        load(spark, sf_dir, "lineitem")
        .join(
            load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                load(spark, sf_dir, "part").select("p_partkey", "p_brand")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            # brand id: 'Brand#42' -> 42 (stable integer item key)
            F.regexp_extract("p_brand", r"(\d+)", 1).cast("int")
            .alias("item"),
        )
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
    )
    als = ALS(
        rank=4,
        maxIter=5,
        seed=SEED,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        implicitPrefs=True,
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    probe = ratings.select("user").distinct().orderBy("user").limit(5)
    recs = model.recommendForUserSubset(probe, 3)
    return (
        recs.select(
            "user", F.posexplode("recommendations").alias("rk", "rec")
        )
        .select(
            F.col("user").cast("bigint").alias("user"),
            (F.col("rk") + 1).cast("bigint").alias("rank"),
            F.col("rec.item").cast("bigint").alias("brand_id"),
        )
        .orderBy("user", "rank")
    )


@query("q_fpgrowth_itemsets", oracle=rf"""
WITH b AS (
  SELECT DISTINCT l.l_orderkey AS basket, p.p_brand AS item
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
n AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets FROM b),
thr AS (
  SELECT CAST(ceil({_FP_MIN_SUPPORT} * n_baskets) AS BIGINT) AS min_cnt,
         n_baskets
  FROM n
),
ones AS (
  SELECT item AS items, CAST(count(*) AS BIGINT) AS freq
  FROM b GROUP BY item
),
twos AS (
  SELECT a.item || ' ' || c.item AS items,
         CAST(count(*) AS BIGINT) AS freq
  FROM b a JOIN b c ON a.basket = c.basket AND a.item < c.item
  GROUP BY 1
),
freq_sets AS (
  SELECT items, freq, 1 AS sz FROM ones, thr WHERE freq >= thr.min_cnt
  UNION ALL
  SELECT items, freq, 2 FROM twos, thr WHERE freq >= thr.min_cnt
)
SELECT items, CAST(sz AS BIGINT) AS set_size, freq
FROM freq_sets
ORDER BY freq DESC, items
LIMIT {_FP_TOP_K}
""")
def q_fpgrowth_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FPGrowth frequent itemsets over per-order brand baskets, ORACLE-
    CHECKED: pattern mining is exact counting, so the FP-tree engine's
    1- and 2-itemsets (support ≥ ceil({s}·n), MLlib's own minCount
    rule) must equal DuckDB's brute-force support counts row for row.
    Items inside a set sort lexicographically before joining to a
    string key so both engines name the same set identically.

    Scale shape: FPGrowth is the distributed-mining standard — one
    count pass, then conditional FP-trees per partition-assigned
    suffix (PFP, Li et al. 2008); baskets are order-grain arrays
    (bounded ~4 brands), never a corpus-sized pair explosion. The
    brute-force pair join the ORACLE runs is what the engine exists to
    avoid; the output cut is top-{k} by (freq, items)."""
    from pyspark.ml.fpm import FPGrowth

    baskets = (
        load(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(
                load(spark, sf_dir, "part").select("p_partkey", "p_brand")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(F.col("l_orderkey").alias("basket"))
        .agg(F.array_sort(F.collect_set("p_brand")).alias("items"))
        # FPGrowth scans its input twice (support count, then growth) —
        # persist so the join+collect_set basket build runs once
        .persist()
    )
    fp = FPGrowth(
        itemsCol="items", minSupport=_FP_MIN_SUPPORT, minConfidence=0.1
    )
    model = fp.fit(baskets)
    return (
        model.freqItemsets.where(F.size("items") <= 2)
        .select(
            F.array_join(F.array_sort("items"), " ").alias("items"),
            F.size("items").cast("bigint").alias("set_size"),
            F.col("freq").cast("bigint").alias("freq"),
        )
        .orderBy(F.col("freq").desc(), "items")
        .limit(_FP_TOP_K)
    )


q_fpgrowth_itemsets.__doc__ = q_fpgrowth_itemsets.__doc__.format(
    s=_FP_MIN_SUPPORT, k=_FP_TOP_K
)

#: (feature name, SQL expression over documents, Spark Column factory)
_FS_FEATURES = (
    ("source", "source"),
    ("len_bucket", "CAST(n_chars AS BIGINT) // 200"),
    ("tok_bucket",
     "CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) // 25"),
)


def _fs_oracle_branch(name: str, expr: str) -> str:
    """One feature's χ² as SQL over the (feature value × label)
    contingency; per-cell contributions quantize to nano ints before
    the order-free sum."""
    return f"""
SELECT '{name}' AS feature,
       CAST(count(*) AS BIGINT) AS n_levels,
       CAST(sum(d_nano) AS BIGINT) AS chi2_nano
FROM (
  SELECT v,
         CAST(floor(
           (n_v1 - n_v * pos * 1.0 / n) * (n_v1 - n_v * pos * 1.0 / n)
             / (n_v * pos * 1.0 / n) * 1000000000.0
           + (n_v0 - n_v * neg * 1.0 / n) * (n_v0 - n_v * neg * 1.0 / n)
             / (n_v * neg * 1.0 / n) * 1000000000.0
           + 0.5) AS BIGINT) AS d_nano
  FROM (
    SELECT v, CAST(count(*) AS BIGINT) AS n_v,
           CAST(sum(y) AS BIGINT) AS n_v1,
           CAST(count(*) - sum(y) AS BIGINT) AS n_v0,
           CAST(sum(count(*)) OVER () AS BIGINT) AS n,
           CAST(sum(sum(y)) OVER () AS BIGINT) AS pos,
           CAST(sum(count(*) - sum(y)) OVER () AS BIGINT) AS neg
    FROM (
      SELECT CAST(({expr}) AS VARCHAR) AS v,
             CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y
      FROM documents
    ) GROUP BY v
  )
)
"""


@query("q_feature_selection", oracle=(
    "\nUNION ALL\n".join(
        _fs_oracle_branch(n, e) for n, e in _FS_FEATURES
    )
    + "\nORDER BY chi2_nano DESC, feature"
))
def q_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Univariate χ² feature ranking against the ``lang='en'`` label
    (the UnivariateFeatureSelector / SelectKBest shape, computed
    exactly): for each categorical feature — crawl source, a 200-char
    length band, a 25-token count band — one contingency aggregate
    yields χ² = Σ(observed−expected)²/expected over its (level ×
    label) cells. Features rank by χ²; per-level cell contributions
    quantize to integer nano units before the per-feature sum so the
    statistic is an order-free BIGINT add.

    Scale shape: one corpus pass per feature (three total; a
    production run fuses them into one pass with a posexplode of the
    feature struct — kept separate here so each χ² is independently
    oracle-checkable), each reducing map-side to its level histogram;
    the χ² math runs on the |levels|-row tables. No corpus-sized
    window, no float folds."""
    def chi2_for(name: str, col) -> DataFrame:
        obs = load(spark, sf_dir, "documents").select(
            col.cast("string").alias("v"),
            (F.col("lang") == "en").cast("bigint").alias("y"),
        )
        lv = obs.groupBy("v").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_v"),
            F.sum("y").cast("bigint").alias("n_v1"),
        )
        tot = lv.agg(
            F.sum("n_v").cast("bigint").alias("n"),
            F.sum("n_v1").cast("bigint").alias("pos"),
        )
        j = lv.crossJoin(F.broadcast(tot)).select(
            "v",
            F.floor(
                (
                    (F.col("n_v1") - F.col("n_v") * F.col("pos")
                     * F.lit(1.0) / F.col("n"))
                    * (F.col("n_v1") - F.col("n_v") * F.col("pos")
                       * F.lit(1.0) / F.col("n"))
                    / (F.col("n_v") * F.col("pos") * F.lit(1.0)
                       / F.col("n"))
                    + ((F.col("n_v") - F.col("n_v1"))
                       - F.col("n_v") * (F.col("n") - F.col("pos"))
                       * F.lit(1.0) / F.col("n"))
                    * ((F.col("n_v") - F.col("n_v1"))
                       - F.col("n_v") * (F.col("n") - F.col("pos"))
                       * F.lit(1.0) / F.col("n"))
                    / (F.col("n_v") * (F.col("n") - F.col("pos"))
                       * F.lit(1.0) / F.col("n"))
                )
                * F.lit(1000000000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("d_nano"),
        )
        return j.agg(
            F.lit(name).alias("feature"),
            F.count(F.lit(1)).cast("bigint").alias("n_levels"),
            F.sum("d_nano").cast("bigint").alias("chi2_nano"),
        ).select("feature", "n_levels", "chi2_nano")

    docs_cols = {
        "source": F.col("source"),
        "len_bucket": F.expr("CAST(n_chars AS BIGINT) DIV 200"),
        "tok_bucket": F.expr(
            r"CAST(size(split(trim(text), '\\s+')) AS BIGINT) DIV 25"
        ),
    }
    parts = [chi2_for(n, docs_cols[n]) for n, _ in _FS_FEATURES]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy(F.col("chi2_nano").desc(), "feature")
