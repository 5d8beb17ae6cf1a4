"""Round-5 wave-49: fuzzy string matching & canonicalization.

``q_edit_distance_join`` — edit-distance-1 token pairs via FastSS
deletion-neighborhood blocking (Bocek et al. 2007, "Fast Similarity
Search in Large Dictionaries"): two strings are within Levenshtein
distance 1 iff their {self}∪{1-deletion} neighborhoods intersect, so
candidate generation is a linear explode (L+1 variants per word) plus an
equi-join on the variant — never an all-pairs comparison — and the exact
``levenshtein`` verify runs on candidates only. This is the
spelling-variant / entity-resolution primitive (near-dup handles, OCR
noise, typo clustering) the dedup family (``dedup.py``) lacks: MinHash
and PPJoin match on *shared tokens*, FastSS matches on *character
edits inside one token*.

``q_mode_stat`` — exact per-group mode with a deterministic tie-break
(count desc, value asc), the canonical-value pick behind survivorship
rules in master-data management. Completes the describe/percentile
profiling family (``q_describe_stats``, ``q_weighted_median``) with the
one classical location statistic it lacked.

The reference has no string-similarity or mode surface
(``Data_transform.py`` passim); nearest siblings here:
``q_set_similarity_join`` (token-set PPJoin), ``q_canonical_docs``
(cluster-level canonical pick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: bounded working vocabulary for the edit-distance join: top-K distinct
#: alphabetic tokens by (tf desc, token asc). The bound keeps the DuckDB
#: brute-force oracle quadratic-but-tiny; the Spark side's FastSS plan is
#: linear in vocabulary size and needs no such bound at 100 TB.
_FUZZY_V = 600

#: token shape admitted to the dictionary (pure ascii-alpha, 3-12 chars)
_TOKEN_RE = "^[a-z]{3,12}$"

#: result cut: top pairs by combined term frequency
_PAIR_K = 20


@query("q_edit_distance_join", oracle=rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
  UNION ALL
  SELECT unnest(regexp_split_to_array(trim(lower(p_name)), '\s+')) AS token
  FROM part
),
vocab AS (
  SELECT token, CAST(count(*) AS BIGINT) AS tf
  FROM toks
  WHERE regexp_matches(token, '{_TOKEN_RE}')
  GROUP BY token
  ORDER BY tf DESC, token
  LIMIT {_FUZZY_V}
)
SELECT a.token AS word_a, b.token AS word_b,
       a.tf + b.tf AS pair_tf
FROM vocab a JOIN vocab b
  ON a.token < b.token
 AND abs(length(a.token) - length(b.token)) <= 1
 AND levenshtein(a.token, b.token) = 1
ORDER BY pair_tf DESC, word_a, word_b
LIMIT {_PAIR_K}
""")
def q_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 token pairs over the document vocabulary via
    FastSS deletion-neighborhood blocking, verified with exact
    ``levenshtein`` on candidates only; top pairs by combined term
    frequency, tie-broken lexicographically.

    The ORACLE brute-forces the (bounded) vocabulary with a length-gated
    quadratic ``levenshtein`` join — an independent check, not a mirror
    of the blocking. FastSS k=1 has zero false negatives: lev(a,b) ≤ 1
    ⇒ the self∪1-deletion neighborhoods intersect; distance-2 survivors
    of the block (e.g. transpositions sharing two deletions) are removed
    by the exact verify.

    Scale shape: tokenize → hash-agg vocabulary (map-side combined) →
    explode ≤ L+1 variants per word (bounded fan-out, map-only) →
    equi-join on the 16-byte variant digest → ``levenshtein`` verify on
    candidate pairs only → TakeOrderedAndProject top-K. At 100 TB the
    dictionary is corpus-distinct-tokens sized (≪ corpus), the variant
    join shuffles ~13× the dictionary — linear, never all-pairs."""
    def _toks(table: str, col: str) -> DataFrame:
        return (
            load(spark, sf_dir, table)
            .select(
                F.explode(
                    F.split(F.trim(F.lower(F.col(col))), r"\s+")
                ).alias("token")
            )
            .where(F.col("token").rlike(_TOKEN_RE))
        )

    # cross-source dictionary: document corpus ∪ part-name catalog (the
    # entity-resolution case: free text vs a curated attribute domain)
    toks = _toks("documents", "text").unionByName(_toks("part", "p_name"))
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .orderBy(F.col("tf").desc(), "token")
        .limit(_FUZZY_V)
    )
    # self ∪ one-deletion neighborhood; md5 keeps the join key a fixed
    # 16-byte digest instead of a variable-length string at scale
    variants = vocab.select(
        "token",
        "tf",
        F.explode(
            F.array_union(
                F.array(F.col("token")),
                F.expr(
                    "transform(sequence(1, length(token)), "
                    "i -> concat(substr(token, 1, i-1), substr(token, i+1)))"
                ),
            )
        ).alias("v"),
    ).select("token", "tf", F.md5("v").alias("vh"))
    a, b = variants.alias("a"), variants.alias("b")
    cand = (
        a.join(b, on="vh")
        .where(F.col("a.token") < F.col("b.token"))
        .select(
            F.col("a.token").alias("word_a"),
            F.col("b.token").alias("word_b"),
            (F.col("a.tf") + F.col("b.tf")).alias("pair_tf"),
        )
        .dropDuplicates(["word_a", "word_b"])
    )
    return (
        cand.where(F.levenshtein("word_a", "word_b") == 1)
        .orderBy(F.col("pair_tf").desc(), "word_a", "word_b")
        .limit(_PAIR_K)
    )


@query("q_mode_stat", oracle=r"""
WITH counts AS (
  SELECT source, lang,
         CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
ranked AS (
  SELECT source, lang, n,
         CAST(sum(n) OVER (PARTITION BY source) AS BIGINT)
           AS group_total,
         row_number() OVER (PARTITION BY source
                            ORDER BY n DESC, lang) AS rk
  FROM counts
)
SELECT source,
       lang AS mode_lang,
       n AS mode_count,
       group_total,
       CAST(floor(n * 1000000.0 / group_total + 0.5) AS BIGINT)
         AS mode_ppm
FROM ranked WHERE rk = 1
ORDER BY source
""")
def q_mode_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode: the most frequent ``lang`` per document
    ``source``, tie-broken (count desc, value asc) so the answer is
    deterministic — the survivorship/canonical-value rule of MDM and the
    "dominant language per crawl source" readout of a corpus datasheet.

    Scale shape: one hash aggregate to the (group × value) grain — the
    corpus-sized shuffle, map-side combined — then the rank and share
    windows run on the tiny counts table partitioned by group. ppm share
    uses the repo's ``floor(x + 0.5)`` integer discipline, never
    engine-specific ROUND ties."""
    counts = (
        load(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w_tot = Window.partitionBy("source")
    w_rk = Window.partitionBy("source").orderBy(F.col("n").desc(), "lang")
    ranked = counts.select(
        "source",
        "lang",
        "n",
        F.sum("n").over(w_tot).cast("bigint").alias("group_total"),
        F.row_number().over(w_rk).alias("rk"),
    )
    return (
        ranked.where(F.col("rk") == 1)
        .select(
            "source",
            F.col("lang").alias("mode_lang"),
            F.col("n").alias("mode_count"),
            "group_total",
            F.floor(
                F.col("n") * F.lit(1000000.0) / F.col("group_total")
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("mode_ppm"),
        )
        .orderBy("source")
    )
