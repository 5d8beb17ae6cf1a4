"""Round-5 wave-67: corpus measurement & retrieval-eval depth —
Heaps'-law vocabulary growth, mean reciprocal rank, and a type-token
lexical-diversity profile.

``q_heaps_law`` — vocabulary growth V(N) over nested md5-ordered
corpus prefixes (quartile buckets): Heaps' law V ≈ K·N^β predicts how
the distinct-term count grows as the crawl grows; the consecutive
log-log slope β̂ between prefixes is the curve a tokenizer-vocabulary
budget is planned against (``q_vocab_coverage`` reads coverage at one
corpus size; this measures growth across sizes — from ONE corpus pass).

``q_mrr_eval`` — mean reciprocal rank of the "customers by account
balance" ranking, one query per nation, relevant = the nation's
top-spend decile: MRR rewards putting ANY relevant item first, the
standard companion to ``q_ndcg_eval``'s graded gain.

``q_ttr_profile`` — per-language type-token ratio and hapax-legomenon
share: distinct-types / tokens and once-occurring-types / types, the
two classic lexical-diversity diagnostics a corpus-quality dashboard
reports next to ``q_zipf_audit``'s tail shape.

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_vocab_coverage``, ``q_zipf_audit``, ``q_ndcg_eval``,
``q_vocab_build``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.io.sources import load
from spark_ml_spark.operators.selection import _HEX8
from spark_ml_spark.registry import query

#: number of nested md5 prefix buckets for the Heaps curve
_HEAPS_K = 4

#: MRR relevance: top decile of in-nation spend
_MRR_REL_NTILE = 10


@query("q_heaps_law", oracle=rf"""
WITH tok AS (
  SELECT CAST(floor((({_HEX8.format(g="CAST(doc_id AS VARCHAR) || '#heaps'")}
                      + 0.5) / 4294967296.0) * {_HEAPS_K}) AS BIGINT) + 1
           AS bucket,
         unnest(string_split(lower(trim(text)), ' ')) AS w
  FROM documents
),
pref AS (
  SELECT k.k,
         CAST(count(CASE WHEN t.bucket <= k.k THEN 1 END) AS BIGINT)
           AS n_tokens,
         CAST(count(DISTINCT CASE WHEN t.bucket <= k.k THEN t.w END)
              AS BIGINT) AS v_distinct
  FROM tok t, (SELECT unnest(range(1, {_HEAPS_K} + 1)) AS k) k
  GROUP BY k.k
)
SELECT k, n_tokens, v_distinct,
       CAST(floor(ln(CAST(v_distinct AS DOUBLE)
                     / lag(v_distinct) OVER (ORDER BY k))
                  / ln(CAST(n_tokens AS DOUBLE)
                       / lag(n_tokens) OVER (ORDER BY k))
                  * 1000000.0 + 0.5) AS BIGINT) AS beta_micro
FROM pref
ORDER BY k
""")
def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth over {k} nested md5-ordered corpus
    prefixes: each document lands in a deterministic hash bucket, the
    prefix "crawl at size k" is buckets ≤ k, and each prefix reports
    its token mass N, vocabulary V, and the consecutive log-log slope
    β̂ = ln(V_k/V_k−1)/ln(N_k/N_k−1) (quantized to micro) — sublinear
    β < 1 is the Heaps signature a vocab budget extrapolates with.

    Scale shape: ONE tokenize pass fans each token row across the {k}
    prefix memberships via a bounded ×{k} in-row explode (no join, no
    second scan per prefix); the distinct counts shuffle (k, token)
    pairs once. At 100 TB the exact distincts swap for HLL
    sketches (``q_hll_distinct``) with the same prefix lattice."""
    bucket = (
        F.floor(
            (
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.col("doc_id").cast("string"),
                                    F.lit("#heaps"),
                                )
                            ),
                            1, 8,
                        ),
                        16, 10,
                    ).cast("long")
                    + F.lit(0.5)
                )
                / F.lit(4294967296.0)
            )
            * _HEAPS_K
        ).cast("bigint")
        + 1
    )
    tok = (
        load(spark, sf_dir, "documents")
        .select(
            bucket.alias("bucket"),
            F.explode(F.split(F.lower(F.trim(F.col("text"))), " "))
            .alias("w"),
        )
    )
    pref = (
        tok.select(
            "bucket",
            "w",
            F.explode(
                F.array(*[F.lit(i) for i in range(1, _HEAPS_K + 1)])
            ).alias("k"),
        )
        .groupBy("k")
        .agg(
            F.count(F.when(F.col("bucket") <= F.col("k"), 1))
            .cast("bigint").alias("n_tokens"),
            F.countDistinct(
                F.when(F.col("bucket") <= F.col("k"), F.col("w"))
            ).cast("bigint").alias("v_distinct"),
        )
    )
    w_k = Window.partitionBy(api.one_partition("k")).orderBy("k")
    beta = F.floor(
        F.log(
            F.col("v_distinct").cast("double")
            / F.lag("v_distinct").over(w_k)
        )
        / F.log(
            F.col("n_tokens").cast("double") / F.lag("n_tokens").over(w_k)
        )
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("bigint")
    return pref.select(
        "k", "n_tokens", "v_distinct", beta.alias("beta_micro")
    ).orderBy("k")


q_heaps_law.__doc__ = q_heaps_law.__doc__.format(k=_HEAPS_K)


@query("q_mrr_eval", oracle=rf"""
WITH spend AS (
  SELECT c.c_custkey, c.c_nationkey,
         CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS score,
         CAST(coalesce(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5)
                                AS BIGINT)), 0) AS BIGINT) AS spend
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
),
marked AS (
  SELECT *,
         CASE WHEN ntile({_MRR_REL_NTILE})
                   OVER (PARTITION BY c_nationkey
                         ORDER BY spend DESC, c_custkey) = 1
              THEN 1 ELSE 0 END AS rel,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY score DESC, c_custkey) AS rnk
  FROM spend
),
firstrel AS (
  SELECT c_nationkey,
         CAST(min(CASE WHEN rel = 1 THEN rnk END) AS BIGINT)
           AS first_rel_rank
  FROM marked GROUP BY c_nationkey
)
SELECT c_nationkey, first_rel_rank,
       CAST(floor(1000000.0 / first_rel_rank + 0.5) AS BIGINT) AS rr_micro,
       CAST(floor(avg(1000000.0 / first_rel_rank) OVER () + 0.5) AS BIGINT)
         AS mrr_micro
FROM firstrel
ORDER BY c_nationkey
""")
def q_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank of the acctbal ranking, one query per
    nation, relevant = the nation's top spend decile: per-nation
    reciprocal rank of the FIRST relevant customer plus the corpus MRR
    (both micro-quantized) — the first-hit companion to
    ``q_ndcg_eval``'s graded gain on the identical ranking.

    Scale shape: one orders pass to the customer grain, then the two
    windows share the c_nationkey shuffle and the first-rel reduction
    is a per-nation min; the MRR fold runs on the 25-row nation grain
    (one_partition pin)."""
    oc = F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).cast("bigint")
    spend = (
        load(spark, sf_dir, "customer")
        .join(
            load(spark, sf_dir, "orders").select(
                "o_custkey", oc.alias("ocents")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey", "c_nationkey", "c_acctbal")
        .agg(
            F.coalesce(F.sum("ocents"), F.lit(0))
            .cast("bigint").alias("spend")
        )
        .select(
            "c_custkey",
            "c_nationkey",
            F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5))
            .cast("bigint").alias("score"),
            "spend",
        )
    )
    w_rel = Window.partitionBy("c_nationkey").orderBy(
        F.col("spend").desc(), "c_custkey"
    )
    w_rnk = Window.partitionBy("c_nationkey").orderBy(
        F.col("score").desc(), "c_custkey"
    )
    marked = spend.select(
        "c_nationkey",
        (F.ntile(_MRR_REL_NTILE).over(w_rel) == 1)
        .cast("bigint").alias("rel"),
        F.row_number().over(w_rnk).alias("rnk"),
    )
    firstrel = marked.groupBy("c_nationkey").agg(
        F.min(F.when(F.col("rel") == 1, F.col("rnk")))
        .cast("bigint").alias("first_rel_rank")
    )
    w_all = Window.partitionBy(api.one_partition("c_nationkey"))
    return firstrel.select(
        "c_nationkey",
        "first_rel_rank",
        F.floor(F.lit(1000000.0) / F.col("first_rel_rank") + F.lit(0.5))
        .cast("bigint").alias("rr_micro"),
        F.floor(
            F.avg(F.lit(1000000.0) / F.col("first_rel_rank")).over(w_all)
            + F.lit(0.5)
        ).cast("bigint").alias("mrr_micro"),
    ).orderBy("c_nationkey")


@query("q_ttr_profile", oracle=r"""
WITH tok AS (
  SELECT lang, unnest(string_split(lower(trim(text)), ' ')) AS w
  FROM documents
),
tf AS (
  SELECT lang, w, CAST(count(*) AS BIGINT) AS f
  FROM tok GROUP BY lang, w
)
SELECT lang,
       CAST(sum(f) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       CAST(floor(count(*) * 1000000.0 / sum(f) + 0.5) AS BIGINT)
         AS ttr_micro,
       CAST(floor(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000000.0
                  / count(*) + 0.5) AS BIGINT) AS hapax_micro
FROM tf
GROUP BY lang
ORDER BY lang
""")
def q_ttr_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language type-token ratio and hapax share: tokens N, types
    V, once-occurring types H, TTR = V/N and hapax rate = H/V (both
    micro-quantized) — the lexical-diversity profile that flags both
    templated corpora (low TTR) and noisy ones (high hapax).

    Scale shape: one tokenize pass, one (lang, token) hash aggregate
    (map-side combined — the token-frequency table every corpus job
    already materializes), then a per-language count-of-counts
    reduction; nothing touches document rows twice."""
    tok = load(spark, sf_dir, "documents").select(
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), " ")).alias("w"),
    )
    tf = tok.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    return (
        tf.groupBy("lang")
        .agg(
            F.sum("f").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum((F.col("f") == 1).cast("bigint"))
            .cast("bigint").alias("n_hapax"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.floor(
                F.col("n_types") * F.lit(1000000.0) / F.col("n_tokens")
                + F.lit(0.5)
            ).cast("bigint").alias("ttr_micro"),
            F.floor(
                F.col("n_hapax") * F.lit(1000000.0) / F.col("n_types")
                + F.lit(0.5)
            ).cast("bigint").alias("hapax_micro"),
        )
        .orderBy("lang")
    )
