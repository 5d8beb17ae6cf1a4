"""Round-4 wave-22: corpus-composition analytics — n-gram novelty
attribution, vocabulary coverage curve, Zipf octave audit.

The three reports a pretraining-data curator reads before fixing the
corpus mix: WHICH documents contribute new n-grams (novelty — the
inverse attribution of ``q_substring_dedup``'s duplication view), how
much of the token stream a budgeted vocabulary covers (the
tokenizer-sizing curve for ``q_vocab_build``'s cut), and whether the
token frequency distribution has the Zipf shape natural text should
(constant-ish mass per rank octave; corpora dominated by boilerplate or
templates bend it).

The reference has no corpus-analytics surface (``Data_transform.py``
passim); these extend the repo's N4 text-analysis family.

Engine exactness: everything is integer — gram digests are md5 text
hashes, ranks come from the two-phase ``api.global_rank`` (no
single-partition window), octaves are CASE-chain integer buckets (no
log2 float), shares are floor(x+0.5) ppm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.api import global_rank
from spark_ml_spark.io.sources import load
from spark_ml_spark import api
from spark_ml_spark.registry import query

#: novelty gram width — deliberately ≠ q_substring_dedup's 8 so the two
#: reports measure different span populations
_NOV_N = 6

#: vocabulary budgets probed by the coverage curve (powers of two, the
#: grid a tokenizer-size decision actually scans)
_COVERAGE_KS = [1 << i for i in range(13)]  # 1 .. 4096

#: rank-octave upper bounds for the Zipf audit CASE chain
_OCTAVES = 14  # ranks < 2^14; everything above folds into the last


@query("q_ngram_novelty", oracle=rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(len(t) - {_NOV_N - 1}),
                i -> md5(array_to_string(t[i+1:i+{_NOV_N}], ' ')))) AS g
  FROM toks
  WHERE len(t) >= {_NOV_N}
),
firsts AS (
  SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
)
SELECT grams.doc_id,
       CAST(count(*) AS BIGINT)                                AS total_grams,
       CAST(sum(CASE WHEN f.first_doc = grams.doc_id
                     THEN 1 ELSE 0 END) AS BIGINT)             AS novel_grams,
       CAST(floor(sum(CASE WHEN f.first_doc = grams.doc_id
                           THEN 1 ELSE 0 END)
                  * 1000000.0 / count(*) + 0.5) AS BIGINT)     AS novelty_ppm
FROM grams JOIN firsts f ON grams.g = f.g
GROUP BY grams.doc_id
""")
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: n-gram novelty attribution — for each document, the share of
    its 6-token spans whose FIRST corpus occurrence (min doc_id) is in
    this document. High-novelty documents carry the corpus's marginal
    information; near-zero novelty marks template/boilerplate docs the
    dedup family then removes. (Occurrence-level semantics: repeats of
    a gram inside its first document all count as novel — this is
    first-DOCUMENT attribution, not first-occurrence-within-doc.)

    Scale shape: identical skeleton to ``q_substring_dedup`` — map-side
    md5 digests (the shuffle never carries span text), one digest
    group-by computing min(doc_id) with map-side combine, one
    sort-merge re-join on the high-cardinality uniform digest key, one
    per-doc hash aggregate. Linear, two shuffles, no skew surface."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= _NOV_N)
    grams = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - _NOV_N),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("t", i + 1, _NOV_N)).cast("binary")
                ),
            )
        ).alias("g"),
    )
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        (F.col("first_doc") == F.col("doc_id")).cast("long")
    ).cast("long")
    return (
        grams.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_grams"),
            novel.alias("novel_grams"),
        )
        .select(
            "doc_id",
            "total_grams",
            "novel_grams",
            F.floor(
                F.col("novel_grams") * 1000000.0 / F.col("total_grams") + 0.5
            ).cast("long").alias("novelty_ppm"),
        )
    )


@query("q_vocab_coverage", oracle=rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
),
hist AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY token),
rk AS (
  SELECT tf, row_number() OVER (ORDER BY tf DESC, token) AS r FROM hist
),
tot AS (SELECT CAST(sum(tf) AS BIGINT) AS n FROM hist),
ks AS (SELECT unnest({_COVERAGE_KS}) AS k)
SELECT CAST(ks.k AS BIGINT) AS k,
       CAST(count(CASE WHEN rk.r <= ks.k THEN 1 END) AS BIGINT)
         AS n_tokens_used,
       CAST(sum(CASE WHEN rk.r <= ks.k THEN rk.tf ELSE 0 END) AS BIGINT)
         AS covered_tokens,
       CAST(floor(sum(CASE WHEN rk.r <= ks.k THEN rk.tf ELSE 0 END)
                  * 1000000.0 / max(tot.n) + 0.5) AS BIGINT)
         AS covered_ppm
FROM ks CROSS JOIN rk CROSS JOIN tot
GROUP BY ks.k
""")
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: vocabulary coverage curve — for each candidate vocabulary
    budget k (powers of two, 1..4096), the share of ALL token
    occurrences the top-k tokens by frequency cover. This is the curve
    that sizes ``q_vocab_build``'s cut: the k where it flattens is the
    budget past which added vocab buys only tail tokens.

    Scale shape: one explode → token histogram with map-side combine
    (the only corpus-sized stage); ranking the VOCAB-sized histogram
    uses the two-phase ``api.global_rank`` (range repartition + local
    row_number + broadcast offsets — no single-partition window even
    at web-scale vocabularies); each token then fans out ONLY to the
    budgets ≥ its rank via a bounded array filter+explode (≤13 rows per
    token, tokens ranked past the largest budget emit nothing), and a
    13-group hash aggregate finishes. The oracle's vocab×13 cross join
    is oracle-side only."""
    toks = load(spark, sf_dir, "documents").select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("token")
    )
    hist = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    ranked = global_rank(
        hist.withColumn("neg_tf", -F.col("tf")),
        ["neg_tf", "token"], rank_col="r",
    )
    tot = hist.agg(F.sum("tf").cast("long").alias("n"))
    ks_arr = F.array(*[F.lit(k) for k in _COVERAGE_KS])
    fanout = ranked.select(
        "tf",
        F.explode(
            F.filter(ks_arr, lambda k: k >= F.col("r"))
        ).alias("k"),
    )
    return (
        fanout.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens_used"),
            F.sum("tf").cast("long").alias("covered_tokens"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("long"),
            "n_tokens_used",
            "covered_tokens",
            F.floor(
                F.col("covered_tokens") * 1000000.0 / F.col("n") + 0.5
            ).cast("long").alias("covered_ppm"),
        )
    )


def _octave_case(rank_col: str) -> str:
    """Portable integer rank→octave bucket: CASE chain instead of
    floor(log2(r)) so no float ever appears (identical text semantics
    in Spark and DuckDB)."""
    whens = " ".join(
        f"WHEN {rank_col} < {1 << (i + 1)} THEN {i}"
        for i in range(_OCTAVES - 1)
    )
    return f"CASE {whens} ELSE {_OCTAVES - 1} END"


@query("q_zipf_audit", oracle=rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
),
hist AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY token),
rk AS (
  SELECT tf, row_number() OVER (ORDER BY tf DESC, token) AS r FROM hist
),
oct AS (
  SELECT {_octave_case('r')} AS octave, tf FROM rk
),
agg AS (
  SELECT octave,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(tf) AS BIGINT)  AS mass
  FROM oct GROUP BY octave
)
SELECT CAST(octave AS BIGINT) AS octave,
       n_tokens,
       mass,
       CAST(floor(mass * 1000000.0
                  / lag(mass) OVER (ORDER BY octave) + 0.5) AS BIGINT)
         AS mass_ratio_ppm
FROM agg
""")
def q_zipf_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: Zipf octave audit — token mass per frequency-rank octave
    (ranks [2^i, 2^(i+1))). An ideal Zipf(1) corpus holds roughly
    constant mass per octave (each doubling of rank halves frequency);
    a mass_ratio far above 1e6 in early octaves means a few tokens
    dominate (template/boilerplate corpus), far below means an
    unnaturally flat distribution (synthetic/shuffled text). The
    float-free sibling of a log-log OLS slope fit: octave buckets are
    integer CASE chains, ratios are ppm — zero libm anywhere.

    Scale shape: corpus-sized work is the one histogram aggregation;
    ranking the vocab-sized histogram is two-phase ``global_rank``;
    the octave rollup is a ≤14-group hash agg and the lag runs on ≤14
    rows (constant-key window, single-partition by design)."""
    toks = load(spark, sf_dir, "documents").select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("token")
    )
    hist = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    ranked = global_rank(
        hist.withColumn("neg_tf", -F.col("tf")),
        ["neg_tf", "token"], rank_col="r",
    )
    agg = (
        ranked.select(F.expr(_octave_case("r")).alias("octave"), "tf")
        .groupBy("octave")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("tf").cast("long").alias("mass"),
        )
    )
    w = Window.partitionBy(api.one_partition("octave")).orderBy("octave")
    return agg.select(
        F.col("octave").cast("long"),
        "n_tokens",
        "mass",
        F.floor(
            F.col("mass") * 1000000.0 / F.lag("mass").over(w) + 0.5
        ).cast("long").alias("mass_ratio_ppm"),
    )
