"""Round-3 data-curation operators for the LLM training-data pipeline
(north-star N2/N3/N4 depth, SURVEY.md §2.12).

Four operators a 100 TB curation run needs beyond the dedup/similarity
families already registered, each fully oracle-checkable:

- ``q_vocab_build``      — tokenizer-vocabulary construction: corpus-wide
  term and document frequencies, deterministic top-K cut (the counting
  pass behind every BPE/WordPiece trainer).
- ``q_substring_dedup``  — cross-document duplicated n-gram span
  detection (the exact-substring-dedup shape of Lee et al. 2022,
  "Deduplicating Training Data Makes Language Models Better"): find
  8-gram word spans shared by ≥2 documents, report per-document
  duplicated-span density. ``q_decontaminate`` (dedup.py) is the
  *cross-corpus* variant of this same shape; this one is *intra-corpus*.
- ``q_doc_outliers``     — prototype-distance outlier flagging per label
  over the embeddings table (the centroid-distance filtering step of
  CLIP-score-style curation / SemDeDup §outliers).
- ``q_quantize_embeddings`` — per-vector symmetric int8 quantization
  with integer summary evidence (the storage/serving compression pass an
  embedding store runs before ANN indexing).

Engine-exactness notes (the driver hash-compares values cross-engine):
every float → integer step uses ``floor(x + 0.5)`` — single IEEE ops
that are bit-deterministic given identical inputs in both engines —
never ``ROUND`` (whose half-way tie handling is engine-specific, the
q_heavy_hitters hazard from ADVICE r2). The outlier centroid is computed
in *quantized integer space* (per-element thousandths, summed exactly as
BIGINT) so it is order-free: a plain ``avg(double)`` over a group is
partial-aggregation-order-dependent and can differ by ulps run-to-run,
the same hazard functions/exact.py documents for price sums.

The reference has no counterpart for any of these (its whole pipeline is
``Data_transform.py:59-100``); they are mandated by BASELINE.json's
north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.functions.vector import cosine, to_double_array
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: vocabulary size cut (top-K by term frequency)
_VOCAB_K = 64

#: duplicated-span shingle width, in whitespace tokens
_SPAN_N = 8

#: per-label bottom-k outlier cut
_OUTLIER_K = 5


@query("q_vocab_build", oracle=rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
)
SELECT token,
       CAST(count(*) AS BIGINT)                 AS tf,
       CAST(count(DISTINCT doc_id) AS BIGINT)   AS df
FROM toks
GROUP BY token
ORDER BY tf DESC, token
LIMIT {_VOCAB_K}
""")
def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: vocabulary construction — term frequency + document frequency
    per token, deterministic top-K by (tf desc, token asc).

    Scale shape: explode → hash-aggregate with map-side combine (token
    cardinality ≪ token occurrences, so partial aggregation absorbs the
    explosion before the shuffle); the global top-K is
    TakeOrderedAndProject — no full sort. df uses the two-phase
    count-distinct expand, still partial-aggregated per token. This is
    the counting pass a BPE/WordPiece trainer runs first at corpus scale."""
    toks = F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", toks)
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), "token")
        .limit(_VOCAB_K)
    )


@query("q_substring_dedup", oracle=rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(len(t) - {_SPAN_N - 1}),
                i -> md5(array_to_string(t[i+1:i+{_SPAN_N}], ' ')))) AS g
  FROM toks
  WHERE len(t) >= {_SPAN_N}
),
dup AS (
  SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) >= 2
)
SELECT grams.doc_id,
       CAST(count(*) AS BIGINT)                                   AS total_spans,
       CAST(sum(CASE WHEN dup.g IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT)                                            AS dup_spans,
       CAST(floor(sum(CASE WHEN dup.g IS NOT NULL THEN 1 ELSE 0 END)
                  * 1000000.0 / count(*) + 0.5) AS BIGINT)        AS dup_ppm
FROM grams LEFT JOIN dup ON grams.g = dup.g
GROUP BY grams.doc_id
""")
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: intra-corpus duplicated-span detection (exact-substring-dedup
    shape, Lee et al. 2022): every 8-token span occurring in ≥2 distinct
    documents is a duplicated span; report per-document span counts and
    parts-per-million density — the evidence a span-removal pass acts on.

    Scale shape: spans are md5-digested at the map side, so the shuffle
    carries (doc_id, 32-char digest) — never span text. Stage 1 is a
    digest group-by (map-side combine) keeping digests seen in ≥2 docs;
    stage 2 re-joins that dup set back to the span stream on the digest
    (sort-merge on a high-cardinality uniform key — no skew) and
    hash-aggregates per document. Linear in corpus size, two shuffles;
    the same shape ``q_decontaminate`` uses cross-corpus, where the dup
    side is small enough to broadcast — here it is O(corpus) so it must
    exchange. Cross-engine exactness: dup_ppm uses floor(x + 0.5), not
    ROUND — bit-deterministic in both engines (module docstring)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    ).filter(F.size("t") >= _SPAN_N)
    grams = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - _SPAN_N),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice("t", i + 1, _SPAN_N)).cast("binary")
                ),
            )
        ).alias("g"),
    )
    dup = (
        grams.groupBy("g")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("g", F.lit(1).alias("is_dup"))
    )
    dup_spans = F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).cast("long")
    return (
        grams.join(dup, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("total_spans"),
            dup_spans.alias("dup_spans"),
        )
        .select(
            "doc_id",
            "total_spans",
            "dup_spans",
            F.floor(
                F.col("dup_spans") * 1000000.0 / F.col("total_spans") + 0.5
            ).cast("long").alias("dup_ppm"),
        )
    )


#: DuckDB cosine between two DOUBLE lists — same formula as
#: similarity._ORACLE_COS but over an already-double centroid list.
_COS_DD = """
list_sum(list_transform(list_zip({a}, {b}),
         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
/ NULLIF(
    sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
  * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 0)
"""


@query("q_doc_outliers", oracle=f"""
WITH pos AS (
  SELECT label,
         i AS pos,
         CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS qv
  FROM embeddings, unnest(range(len(embedding))) AS u(i)
),
cent AS (
  SELECT label, pos,
         CAST(sum(qv) AS DOUBLE) / (1000.0 * count(*)) AS cv
  FROM pos GROUP BY label, pos
),
cemb AS (
  SELECT label, list(cv ORDER BY pos) AS ce FROM cent GROUP BY label
),
scored AS (
  -- integer ten-thousandths via floor(x*1e4 + 0.5): single IEEE ops,
  -- bit-deterministic in both engines (ROUND's half-way handling is
  -- engine-specific — Spark HALF_UPs the shortest decimal repr, DuckDB
  -- rounds the binary value — and an integer also cannot carry the
  -- -0.0-vs-0.0 sign-bit hash divergence a near-zero double can)
  SELECT e.vec_id, e.label,
         CAST(floor(({_COS_DD.format(a="e.embedding", b="c.ce")}) * 10000
                    + 0.5) AS BIGINT) AS cos_e4
  FROM embeddings e JOIN cemb c USING (label)
)
SELECT vec_id, label, cos_e4,
       CAST(row_number() OVER
            (PARTITION BY label ORDER BY cos_e4, vec_id) AS BIGINT)
         AS outlier_rank,
       CAST(CASE WHEN row_number() OVER
                      (PARTITION BY label ORDER BY cos_e4, vec_id)
                 <= {_OUTLIER_K} THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
FROM scored
""")
def q_doc_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3: per-label prototype-distance outlier flagging — the
    centroid-distance curation step (CLIP-score-filtering / SemDeDup
    outlier removal shape): score every vector by cosine to its label
    prototype, rank ascending, flag the bottom K per label.

    The prototype is the *quantized* centroid: each element is quantized
    to integer thousandths map-side (``floor(x*1000 + 0.5)`` — single
    IEEE ops, bit-identical cross-engine), summed exactly as BIGINT
    (order-free, unlike a double avg whose partial-merge order varies
    run-to-run), and divided once. posexplode → (label, pos) hash-agg
    with map-side combine (n·dim rows in, |labels|·dim out), the tiny
    centroid table re-assembled and BROADCAST back — the embedding table
    itself never shuffles for scoring. Ranking shuffles by label only;
    at 100 TB with few labels the bottom-K per label would use the
    two-phase ``api.global_rank`` shape instead of a single window
    partition per label (docstring contract; at fixture label
    cardinality the window is the right plan). Ordering is on the
    integer-quantized score with vec_id tiebreak, so rank is
    deterministic even at float-ulp granularity."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("emb")
    )
    qpos = e.select(
        "label",
        F.posexplode("emb").alias("pos", "v"),
    ).select(
        "label", "pos", F.floor(F.col("v") * 1000 + F.lit(0.5)).cast("long").alias("qv")
    )
    cent = qpos.groupBy("label", "pos").agg(
        (F.sum("qv").cast("double") / (F.lit(1000.0) * F.count("qv"))).alias("cv")
    )
    cemb = cent.groupBy("label").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "cv"))), lambda s: s["cv"]
        ).alias("ce")
    )
    # integer ten-thousandths (floor(x*1e4 + 0.5), same form as the
    # oracle): deterministic across engines where ROUND's tie handling
    # is not, and immune to the -0.0 sign-bit hash divergence
    scored = e.join(F.broadcast(cemb), "label").select(
        "vec_id",
        "label",
        F.floor(cosine(F.col("emb"), F.col("ce")) * 10000 + F.lit(0.5))
        .cast("long")
        .alias("cos_e4"),
    )
    w = Window.partitionBy("label").orderBy("cos_e4", "vec_id")
    return scored.select(
        "vec_id",
        "label",
        "cos_e4",
        F.row_number().over(w).cast("long").alias("outlier_rank"),
        (F.row_number().over(w) <= _OUTLIER_K).cast("long").alias("is_outlier"),
    )


@query("q_quantize_embeddings", oracle="""
WITH q AS (
  SELECT vec_id, label,
         list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale,
         list_transform(embedding,
                  x -> CAST(floor(CAST(x AS DOUBLE)
                       / NULLIF(list_max(list_transform(embedding,
                                y -> abs(CAST(y AS DOUBLE)))) / 127.0, 0)
                       + 0.5) AS BIGINT)) AS qe
  FROM embeddings
)
SELECT vec_id, label,
       CAST(floor(scale * 1000000000.0 + 0.5) AS BIGINT) AS scale_nano,
       CAST(list_min(qe) AS BIGINT)                      AS q_min,
       CAST(list_max(qe) AS BIGINT)                      AS q_max,
       CAST(list_sum(list_transform(qe, x -> abs(x))) AS BIGINT) AS q_l1
FROM q
""")
def q_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3: symmetric int8 quantization per vector — the compression pass
    an embedding store applies before ANN indexing (scale = amax/127,
    q = round(x/scale)). Output is integer summary evidence (scale in
    nano units, q range, L1 mass): scalar columns only, because the
    driver's pandas canonicalizer rejects list cells (VERDICT r2 §wrong
    2), and integers because every float→int step here is the
    bit-deterministic floor(x + 0.5) form (module docstring).

    Scale shape: map-only — one projection over the scan, no shuffle, no
    Python; all array math is built-in higher-order functions inside
    codegen. At 100 TB this pipelines with whatever wrote the embeddings
    (zero exchanges added)."""
    emb = to_double_array("embedding")
    amax = F.array_max(F.transform(emb, F.abs))
    scale = amax / F.lit(127.0)
    qe = F.transform(emb, lambda x: F.floor(x / F.nullif(scale, F.lit(0.0)) + 0.5).cast("long"))
    return load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.floor(scale * 1000000000.0 + F.lit(0.5)).cast("long").alias("scale_nano"),
        F.array_min(qe).alias("q_min"),
        F.array_max(qe).alias("q_max"),
        F.aggregate(
            F.transform(qe, F.abs), F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("q_l1"),
    )


@query("q_tokenize_ids", oracle=rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
),
vocab AS (
  SELECT token,
         CAST(row_number() OVER (ORDER BY count(*) DESC, token) AS BIGINT)
           AS token_id
  FROM toks
  GROUP BY token
  ORDER BY count(*) DESC, token
  LIMIT {_VOCAB_K}
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT)                              AS n_tokens,
       CAST(sum(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT)                                       AS n_oov,
       CAST(sum(COALESCE(v.token_id, 0)) AS BIGINT)          AS id_sum
FROM toks t LEFT JOIN vocab v ON t.token = v.token
GROUP BY t.doc_id
""")
def q_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: tokenizer application — map every token to its id in the
    corpus-built vocabulary (id = 1-based rank by tf desc, token asc —
    the same deterministic order as ``q_vocab_build``'s cut) and report
    per-document token count, out-of-vocabulary count, and the exact
    integer id checksum. Together with ``q_vocab_build`` (build) and
    ``q_token_packing`` (pack) this closes the vocab → encode → pack
    path of a pretraining data pipeline.

    Scale shape: the vocabulary is aggregated once (map-side combine)
    and is SMALL by construction (top-K), so the id assignment is a
    single-partition 64-row window followed by a BROADCAST hash join
    against the exploded token stream — the corpus never shuffles for
    encoding; the only corpus-sized exchange is the final per-doc
    hash-aggregate. OOV accounting stays in the same pass via the left
    join's null channel. All outputs integer (module docstring)."""
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token"),
        )
    )
    wv = Window.orderBy(F.col("tf").desc(), "token")
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), "token")
        .limit(_VOCAB_K)
        .select("token", F.row_number().over(wv).cast("long").alias("token_id"))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("token_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
            F.sum(F.coalesce(F.col("token_id"), F.lit(0)))
            .cast("long")
            .alias("id_sum"),
        )
    )
