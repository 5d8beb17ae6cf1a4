"""Training-data pipeline operators (north-star §2.12 extensions):
deterministic dataset splits, stratified sampling, TF-IDF term scoring,
top-k-per-group selection, unpivot/melt, higher-order array functions.

These are the ops a 100 TB pretraining-data pipeline runs between raw
ingest and tokenization. Everything here is built-in Catalyst
expressions — zero Python in the data path — and every query has an
exact DuckDB oracle (deterministic md5-based sampling instead of RNG
sampling precisely so the result IS oracle-checkable and reproducible
across engines, runs, and cluster sizes).

The reference has only an unseeded ``randomSplit([0.7,0.3])``
(``Data_transform.py:155``) — not reproducible even run-to-run. Hash
splits are the scale-correct replacement: assignment is a pure function
of the row key, so it is stable under retries, repartitioning, and
incremental re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from spark_ml_spark.functions.text import ws_tokens
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

# hex-fraction thresholds: 0xb3333333/2^32 ~= 0.70, 0xd999999a/2^32 ~= 0.85.
# md5 hex is uniform, so lexicographic compare of the first 8 hex chars
# partitions rows 70/15/15 with no hex->int conversion (portable to any
# engine that has md5 over UTF-8 strings).
_TRAIN_MAX = "b3333333"
_VAL_MAX = "d999999a"


@query("q_hash_split", oracle=f"""
WITH assigned AS (
  SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_TRAIN_MAX}'
              THEN 'train'
              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '{_VAL_MAX}'
              THEN 'val' ELSE 'test' END AS split,
         doc_id, n_chars
  FROM documents
)
SELECT split,
       count(*)                 AS n_docs,
       ROUND(avg(n_chars), 4)   AS avg_chars,
       min(doc_id)              AS min_doc_id,
       max(doc_id)              AS max_doc_id
FROM assigned GROUP BY split
""")
def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 70/15/15 train/val/test split by md5(doc_id) —
    the scale-correct replacement for the reference's unseeded
    ``randomSplit`` (``Data_transform.py:155``). Assignment is a pure
    row-key function: stable under retries, partitioning, and
    incremental appends (new rows never move old rows between splits).
    One narrow projection + one hash aggregate; no shuffle of data rows
    beyond the tiny per-split partials."""
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
    split = (
        F.when(h < _TRAIN_MAX, "train")
        .when(h < _VAL_MAX, "val")
        .otherwise("test")
    )
    docs = load(spark, sf_dir, "documents").select(
        split.alias("split"), "doc_id", "n_chars"
    )
    return docs.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


@query("q_stratified_sample", oracle="""
WITH sampled AS (
  SELECT lang, doc_id
  FROM documents
  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 9, 8)
        < CASE WHEN lang = 'en' THEN '33333333' ELSE '99999999' END
)
SELECT d.lang,
       count(DISTINCT d.doc_id)             AS n_total,
       count(s.doc_id)                      AS n_sampled,
       CAST(CASE WHEN d.lang = 'en' THEN 0.2 ELSE 0.6 END AS DOUBLE) AS target_rate
FROM documents d LEFT JOIN sampled s
  ON d.doc_id = s.doc_id AND d.lang = s.lang
GROUP BY d.lang
""")
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — per-language rates (down-
    sample dominant 'en' to 0.2, keep others at 0.6), the standard
    corpus-rebalancing step before pretraining. Hash-gated rather than
    ``sampleBy`` so the sample is reproducible and oracle-checkable; at
    100 TB the WHERE clause is a narrow per-row predicate (no shuffle,
    no RNG state), and the reported counts verify the realized rate.
    Uses md5 chars 9-16 so it is independent of q_hash_split's gate."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    gate = F.substring(F.md5(F.col("doc_id").cast("string")), 9, 8)
    thresh = F.when(F.col("lang") == "en", "33333333").otherwise("99999999")
    sampled = F.when(gate < thresh, F.lit(1))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(sampled).alias("n_sampled"),
    ).select(
        "lang", "n_total", "n_sampled",
        F.when(F.col("lang") == "en", F.lit(0.2)).otherwise(F.lit(0.6))
        .alias("target_rate"),
    )


@query("q_topk_per_group", oracle="""
SELECT o_orderpriority, o_orderkey,
       ROUND(o_totalprice, 2) AS total_price, rn
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""")
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (row_number window + filter) — the distributed
    idiom for 'best k rows per key'. One shuffle on the group key; the
    rn <= 3 predicate lets Spark's WindowGroupLimit push the limit into
    the sort, so each partition keeps only k rows per key instead of
    sorting whole groups (crucial when one group holds billions of
    rows). Deterministic tiebreak on o_orderkey."""
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderpriority", "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query("q_unpivot", oracle="""
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
       ROUND(l_quantity, 2) AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice',
       ROUND(l_extendedprice, 2) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount',
       ROUND(l_discount, 2) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_tax',
       ROUND(l_tax, 2) FROM lineitem
""")
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt: wide numeric measures -> long (key, measure,
    value) form — the inverse of q_pivot and the standard reshape before
    per-metric aggregation. ``DataFrame.unpivot`` plans a single Expand
    over ONE scan (4 output rows per input row), where the naive
    UNION-ALL formulation (the oracle text) would scan the table 4
    times — at 100 TB that is a 4x I/O difference for identical
    results."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            F.round("l_quantity", 2).alias("l_quantity"),
            F.round("l_extendedprice", 2).alias("l_extendedprice"),
            F.round("l_discount", 2).alias("l_discount"),
            F.round("l_tax", 2).alias("l_tax"),
        )
        .unpivot(
            ids=["l_orderkey", "l_linenumber"],
            values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            variableColumnName="measure",
            valueColumnName="value",
        )
    )


@query("q_tfidf_topterms", oracle="""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS score
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, ROUND(score, 4) AS tfidf
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn
      FROM scored)
WHERE rn <= 3
""")
def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF with smoothed IDF (ln((N+1)/(df+1))+1, sklearn's
    convention), returning each document's top-3 terms — corpus
    keyword extraction as pure relational algebra. Plan shape at scale:
    explode -> partial-aggregated tf (the explode never shuffles raw
    text, only (doc_id, term) pairs), df is a second aggregate over the
    already-small tf relation, and the corpus size N joins in as a
    broadcast scalar. The final top-3 uses the same WindowGroupLimit
    push-down as q_topk_per_group. Deterministic tiebreak on term."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
        ).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "term", "tf",
            (
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            ).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", F.round("score", 4).alias("tfidf"))
    )


@query("q_array_functions", oracle="""
SELECT vec_id,
       CAST(len(embedding) AS INT)                               AS dim,
       ROUND(list_sum(list_transform(embedding,
                                     x -> CAST(x AS DOUBLE) * x)), 4) AS sq_norm,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT)      AS n_positive,
       ROUND(list_max(list_transform(embedding,
                                     x -> abs(CAST(x AS DOUBLE)))), 4) AS linf_norm
FROM embeddings
""")
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column: lambda
    transform / filter / aggregate entirely inside Catalyst (SURVEY
    §2.11 — the engine's UDF-free path for array math). These run in
    whole-stage codegen over the raw parquet arrays: no explode (which
    would multiply row count by the 64-dim width before re-aggregating)
    and no Python. Elements cast float32->double before arithmetic so
    both engines fold in double precision."""
    emb = load(spark, sf_dir, "embeddings")
    as_dbl = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(as_dbl, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("int")
        .alias("n_positive"),
        F.round(F.array_max(F.transform(as_dbl, F.abs)), 4)
        .alias("linf_norm"),
    )


#: context-window token budget for sequence packing (tokens per bin)
_PACK_BUDGET = 2048

_NTOK_SQL = "len(regexp_split_to_array(trim(text), '\\s+'))"


@query("q_token_packing", oracle=f"""
WITH t AS (
  SELECT source, doc_id, {_NTOK_SQL} AS n_tok FROM documents
), c AS (
  SELECT source, doc_id, n_tok,
         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT source,
       CAST(FLOOR((cum - n_tok) / {_PACK_BUDGET}) AS BIGINT) AS bin_id,
       count(*)                  AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS bin_tokens,
       min(doc_id)               AS first_doc,
       max(doc_id)               AS last_doc
FROM c GROUP BY source, bin_id
""")
def q_token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed token-budget context
    bins (concat-and-chunk, the standard pretraining packer) — per
    source, stream docs in doc_id order, accumulate token counts, and a
    doc's bin is the budget-block its first token lands in.

    Deterministic (pure function of the ordered stream, no RNG), so it is
    oracle-checkable and stable under retries. Scale shape: the running
    sum is a window partitioned by ``source`` — each source packs
    independently in parallel, which is exactly how a 100 TB tokenization
    job shards; no global sort, no single-partition window. Skew bound =
    the largest single source; sub-shard by (source, date) in production
    if one source dominates."""
    toks = ws_tokens("text")
    t = load(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(toks).alias("n_tok")
    )
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.select(
            "source", "doc_id", "n_tok",
            F.floor((F.col("cum") - F.col("n_tok")) / _PACK_BUDGET)
            .alias("bin_id"),
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


@query("q_domain_mix", oracle=f"""
WITH t AS (
  SELECT source, lang, {_NTOK_SQL} AS n_tok FROM documents
), tot AS (
  SELECT CAST(sum(n_tok) AS DOUBLE) AS all_tokens FROM t
)
SELECT source, lang,
       count(*)                                   AS n_docs,
       CAST(sum(n_tok) AS BIGINT)                 AS total_tokens,
       ROUND(sum(n_tok) / tot.all_tokens, 6)      AS token_share
FROM t, tot
GROUP BY source, lang, tot.all_tokens
""")
def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition (data-mixture) report: token counts and share
    of the total token budget per (source, lang) — the table every
    pretraining run is tuned against (domain weights). One scan + one
    hash agg; the corpus-total divisor is a 1-row broadcast, NOT an
    unpartitioned window (which would serialize all groups through one
    partition at scale)."""
    toks = ws_tokens("text")
    t = load(spark, sf_dir, "documents").select(
        "source", "lang", F.size(toks).alias("n_tok")
    )
    per = t.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )
    tot = t.agg(F.sum("n_tok").cast("double").alias("all_tokens"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source", "lang", "n_docs", "total_tokens",
        F.round(F.col("total_tokens") / F.col("all_tokens"), 6)
        .alias("token_share"),
    )


#: shard packing: fixed-size output shards in deterministic-shuffle order.
_SHARD_SIZE = 100


@query("q_shard_assign", oracle=f"""
WITH h AS (
  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hkey,
         {_NTOK_SQL} AS n_tok
  FROM documents
), r AS (
  SELECT doc_id, hkey, n_tok,
         row_number() OVER (ORDER BY hkey, doc_id) AS rn
  FROM h
)
SELECT CAST(FLOOR((rn - 1) / {_SHARD_SIZE}) AS BIGINT) AS shard_id,
       count(*)                   AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
       min(hkey)                  AS first_key,
       max(hkey)                  AS last_key
FROM r GROUP BY shard_id
""")
def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + fixed-size shard assignment — the
    "write the training shards" step: documents ordered by
    md5(doc_id) (a reproducible permutation, the hash-order analogue of
    the reference's unseeded shuffle at ``Data_transform.py:155``), then
    packed into consecutive {_SHARD_SIZE}-doc shards.

    The global order comes from :func:`api.global_rank` — two-phase
    range-partition + broadcast prefix counts, NOT the single-partition
    ``OVER (ORDER BY ...)`` the oracle uses (fine for DuckDB, a
    scale-killer for Spark). Shard stats come from one hash agg on
    shard_id. At 100 TB this is exactly a sort-based shuffle write:
    range partitioning IS the shard boundary, so shard files come out of
    executors in parallel with no post-pass."""
    from spark_ml_spark.api import global_rank

    h = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("hkey"),
        F.size(ws_tokens("text")).alias("n_tok"),
    )
    r = global_rank(h, ["hkey", "doc_id"], rank_col="rn")
    return (
        r.select(
            "hkey", "n_tok",
            F.floor((F.col("rn") - 1) / _SHARD_SIZE).alias("shard_id"),
        )
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("shard_tokens"),
            F.min("hkey").alias("first_key"),
            F.max("hkey").alias("last_key"),
        )
    )


#: temperature sampling: alpha=0.5 (mT5-style square-root temperature),
#: target sample = 40% of the corpus.
_TEMP_FRAC = 0.4


@query("q_temperature_sample", oracle=f"""
WITH per AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(n_docs) AS DOUBLE) AS n_all,
         sum(sqrt(CAST(n_docs AS DOUBLE))) AS sum_w
  FROM per
), tgt AS (
  SELECT p.source, p.n_docs,
         sqrt(CAST(p.n_docs AS DOUBLE)) / t.sum_w AS temp_weight,
         LEAST(p.n_docs, CAST(FLOOR(sqrt(CAST(p.n_docs AS DOUBLE)) / t.sum_w
                              * {_TEMP_FRAC} * t.n_all) AS BIGINT)) AS n_target
  FROM per p, tot t
), ranked AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
)
SELECT r.source, t.n_docs, ROUND(t.temp_weight, 6) AS temp_weight,
       count(*) AS n_sampled, min(r.doc_id) AS min_doc, max(r.doc_id) AS max_doc
FROM ranked r JOIN tgt t ON r.source = t.source
WHERE r.rn <= t.n_target
GROUP BY r.source, t.n_docs, t.temp_weight
""")
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain sampling (the mT5/multilingual-corpus
    balancing step): domain weights ∝ (n_d)^α with α=0.5 — sqrt is
    correctly-rounded IEEE in both engines, so the weights are
    bit-identical cross-engine (pow(x, 0.5) would not be) — then a
    deterministic per-domain gate takes the first n_target docs in
    md5-hash order.

    The gate is a RANK threshold, not a float threshold: hash-order rank
    within each domain is engine-exact (hex strings compare
    lexicographically), where a computed double cutoff against a
    hex-fraction would be a cross-engine boundary risk. The rank window
    partitions by ``source`` — domains sample independently in parallel,
    no global sort. Corpus totals ride one broadcast row, as in
    :func:`q_domain_mix`."""
    docs = load(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(
        F.sum("n_docs").cast("double").alias("n_all"),
        F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("sum_w"),
    )
    w = F.sqrt(F.col("n_docs").cast("double")) / F.col("sum_w")
    tgt = per.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", w.alias("temp_weight"),
        F.least(
            F.col("n_docs"),
            F.floor(w * _TEMP_FRAC * F.col("n_all")).cast("bigint"),
        ).alias("n_target"),
    )
    rn_w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = docs.select(
        "source", "doc_id", F.row_number().over(rn_w).alias("rn")
    )
    return (
        ranked.join(F.broadcast(tgt), "source")
        .filter(F.col("rn") <= F.col("n_target"))
        .groupBy("source", "n_docs", "temp_weight")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .select(
            "source", "n_docs", F.round("temp_weight", 6).alias("temp_weight"),
            "n_sampled", "min_doc", "max_doc",
        )
    )


@query("q_training_data_prep", oracle=f"""
WITH quality AS (
  SELECT doc_id, source, text, {_NTOK_SQL} AS n_tok
  FROM documents
  WHERE {_NTOK_SQL} >= 20
    AND CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
             AS DOUBLE) / NULLIF(length(text), 0) < 0.1
), exact AS (
  SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)
), train AS (
  SELECT q.doc_id, q.source, q.n_tok
  FROM quality q JOIN exact e ON q.doc_id = e.doc_id
  WHERE substr(md5(CAST(q.doc_id AS STRING)), 1, 8) < '{_TRAIN_MAX}'
), per AS (
  SELECT source, count(*) AS n_docs FROM train GROUP BY source
), tot AS (
  SELECT CAST(sum(n_docs) AS DOUBLE) AS n_all,
         sum(sqrt(CAST(n_docs AS DOUBLE))) AS sum_w
  FROM per
), tgt AS (
  SELECT p.source,
         LEAST(p.n_docs, CAST(FLOOR(sqrt(CAST(p.n_docs AS DOUBLE)) / t.sum_w
                              * {_TEMP_FRAC} * t.n_all) AS BIGINT)) AS n_target
  FROM per p, tot t
), ranked AS (
  SELECT t.doc_id, t.source, t.n_tok,
         row_number() OVER (PARTITION BY t.source
                            ORDER BY md5(CAST(t.doc_id AS STRING)), t.doc_id) AS rn
  FROM train t
), sampled AS (
  SELECT r.doc_id, r.source, r.n_tok
  FROM ranked r JOIN tgt g ON r.source = g.source
  WHERE r.rn <= g.n_target
), packed AS (
  SELECT source, n_tok,
         CAST(FLOOR((sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_tok)
                    / {_PACK_BUDGET}) AS BIGINT) AS bin_id
  FROM sampled
)
SELECT source,
       count(*)                       AS n_docs,
       count(DISTINCT bin_id)         AS n_bins,
       CAST(sum(n_tok) AS BIGINT)     AS total_tokens
FROM packed
GROUP BY source
""")
def q_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-2 capstone: the BACK half of a pretraining data pipeline
    (the front half — quality → exact dedup → NEAR-dup → stats — is
    ``q_llm_pipeline``), composed entirely from this repo's operator
    idioms: C4-style quality gate, digest exact-dedup keeping the lowest
    doc_id, deterministic md5 train split (``q_hash_split``),
    sqrt-temperature per-domain sampling with an engine-exact hash-order
    rank gate (``q_temperature_sample``), and token packing into
    {_PACK_BUDGET}-token context bins (``q_token_packing``), reported
    per source.

    Every stage changes the output (drops rows or re-bins), so the
    oracle checks the COMPOSITION, not just the pieces: a disagreement
    anywhere in the five-stage chain moves counts downstream. Shuffle
    ledger at scale: digest agg (16-byte keys), one broadcast of the
    tiny per-source table, one source-partitioned rank window, one
    source-partitioned packing window — no global sorts, no collected
    intermediates, text never shuffles after the quality projection."""
    docs = load(spark, sf_dir, "documents")
    toks = ws_tokens("text")
    punct = F.length("text") - F.length(
        F.regexp_replace("text", "[.,!?;:]", "")
    )
    quality = docs.filter(
        (F.size(toks) >= 20)
        & (punct.cast("double") / F.nullif(F.length("text"), F.lit(0)) < 0.1)
    ).select("doc_id", "source", "text", F.size(toks).alias("n_tok"))
    exact = quality.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    train = (
        quality.join(exact.select("doc_id"), "doc_id")
        .filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8)
            < _TRAIN_MAX
        )
        .select("doc_id", "source", "n_tok")
    )
    per = train.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.agg(
        F.sum("n_docs").cast("double").alias("n_all"),
        F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("sum_w"),
    )
    w = F.sqrt(F.col("n_docs").cast("double")) / F.col("sum_w")
    tgt = per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.col("n_docs"),
            F.floor(w * _TEMP_FRAC * F.col("n_all")).cast("bigint"),
        ).alias("n_target"),
    )
    rn_w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    sampled = (
        train.withColumn("rn", F.row_number().over(rn_w))
        .join(F.broadcast(tgt), "source")
        .filter(F.col("rn") <= F.col("n_target"))
    )
    cum_w = W.partitionBy("source").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    packed = sampled.select(
        "source", "n_tok",
        F.floor(
            (F.sum("n_tok").over(cum_w) - F.col("n_tok")) / _PACK_BUDGET
        ).alias("bin_id"),
    )
    return packed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("bin_id").alias("n_bins"),
        F.sum("n_tok").alias("total_tokens"),
    )
