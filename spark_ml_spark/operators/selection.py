"""Round-3 waves 6-7: data SELECTION, retrieval & monitoring operators
for the LLM training-data pipeline (north-star N2/N3 depth, SURVEY.md
§2.12).

Ten operators covering the "which data do we keep / how do we order
it / how do we watch it" layer that sits between cleaning (dedup/
quality, already registered) and training. Wave 7 adds ``q_bm25_rank``
(BM25 retrieval ranking, Robertson/Lucene shape), ``q_weighted_sample``
(Efraimidis–Spirakis weighted sampling without replacement), and
``q_embedding_drift`` (per-label centroid shift between snapshots).
Wave 6:

- ``q_dsir_select``       — DSIR-style importance resampling (Xie et
  al. 2023, "Data Selection for Language Models via Importance
  Resampling"): score every document by the log-likelihood ratio of a
  smoothed unigram target model vs the raw-corpus model, keep the top-K.
- ``q_canonical_docs``    — quality-aware canonical selection over
  near-duplicate clusters: where ``q_dedup_clusters`` (dedup.py) keeps
  the *min-id* member, production curation keeps the *best* member
  (longest content here); one row per cluster with its representative.
- ``q_domain_split``      — group-disjoint train/val/test assignment:
  every ``source`` domain lands wholly in one split (the leakage-proof
  variant of ``q_hash_split``; grouped splitting is how eval
  contamination via shared domains is prevented).
- ``q_length_batching``   — length-grouped batch construction with
  padding-waste accounting (the bucketed-batching pass of any trainer
  that pads to max-in-batch).
- ``q_hard_negatives``    — contrastive hard-negative mining (the DPR /
  in-batch-negatives recipe, Karpukhin et al. 2020): per query vector,
  top-k vectors of a DIFFERENT label inside a mid-similarity band —
  similar enough to be hard, not so similar they are near-dups.
- ``q_drift_diff``        — snapshot drift/CDC diff: per-key activity
  counts in two time windows, full-outer joined and classified
  added / removed / changed / stable (the monitoring pass between two
  ingest snapshots).
- ``q_quantile_normalize`` — per-language percentile calibration of a
  quality proxy (parts-per-million percent-rank), the cross-lingual
  score-calibration step before a single global quality threshold is
  applied (heuristic-filter calibration à la CCNet/Gopher).

Engine-exactness: every ranked/derived value is either pure-integer
arithmetic or quantized to integer units (micro-nats / ppm / 1e-4 sim
units) with ``floor(x + 0.5)`` — single IEEE ops, never engine-specific
``ROUND`` ties (the q_heavy_hitters hazard, ADVICE r2). The one ``ln``
in DSIR is evaluated at the VOCAB-sized weight table (once per distinct
token, both engines, same double argument — the q_lm_score precedent),
so per-document sums are order-free BIGINT adds.

Skew posture: the two per-group ranking passes (quantile normalize,
length batching) use :func:`spark_ml_spark.api.grouped_rank` — a
two-phase range-partitioned rank — instead of one-reducer-per-group
windows, because both grouping keys here are few-large-groups (5
languages, ~7 length bands): a plain grouped window would put ~43% of
the corpus (lang='en') on one task at 100 TB.

The reference has no counterpart for any of these (its whole pipeline
is ``Data_transform.py:59-100``); they are mandated by BASELINE.json's
north-star scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark import api
from spark_ml_spark.api import connected_components, grouped_rank
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: DSIR: number of documents kept by the importance cut
_DSIR_TOP = 50
#: DSIR: the target distribution is the English slice of the corpus
_DSIR_TARGET_LANG = "en"

#: hard negatives: query vectors, per-query depth, similarity band
#: (in 1e-4 integer units; band chosen from the measured sf0.01 cosine
#: distribution so it holds 20+ different-label candidates per query)
_HN_QUERIES = 5
_HN_TOPK = 5
_HN_LO_E4 = 2000
_HN_HI_E4 = 9000

#: drift diff: window cut at 2024-01-16 00:00 UTC (epoch seconds) —
#: splits the 30-day events fixture into two 15-day snapshots
_DRIFT_CUT = 1705363200

#: length batching: token-count band width and batch size
_LB_BAND = 16
_LB_BATCH = 8

#: domain split: md5-hex prefix thresholds, 70/15/15 (the q_hash_split
#: constants — lexicographic compare on the first 8 hex chars is
#: portable to any engine with md5 over UTF-8 strings)
_TRAIN_MAX = "b3333333"
_VAL_MAX = "d999999a"


# --------------------------------------------------------------------------
# DSIR importance resampling
# --------------------------------------------------------------------------

@query("q_dsir_select", oracle=rf"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
),
raw AS (
  SELECT token, count(*) AS cr FROM toks GROUP BY token
),
tgt AS (
  SELECT token, count(*) AS ct FROM toks
  WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY token
),
tot AS (
  SELECT (SELECT count(*) FROM toks)  AS nr,
         (SELECT count(*) FROM toks
          WHERE lang = '{_DSIR_TARGET_LANG}') AS nt,
         (SELECT count(*) FROM raw)   AS v
),
w AS (
  SELECT raw.token,
         CAST(floor(
           (ln((COALESCE(tgt.ct, 0) + 1.0) / (tot.nt + tot.v))
          - ln((raw.cr + 1.0)            / (tot.nr + tot.v)))
           * 1000000.0 + 0.5) AS BIGINT) AS w_micro
  FROM raw LEFT JOIN tgt ON raw.token = tgt.token CROSS JOIN tot
)
SELECT t.doc_id, t.lang,
       CAST(count(*) AS BIGINT)        AS n_tokens,
       CAST(sum(w.w_micro) AS BIGINT)  AS dsir_micro
FROM toks t JOIN w ON t.token = w.token
GROUP BY t.doc_id, t.lang
ORDER BY dsir_micro DESC, t.doc_id
LIMIT {_DSIR_TOP}
""")
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2/N3: DSIR importance resampling (Xie et al. 2023). Each document
    is scored by sum over its tokens of
    ``ln p_target(tok) - ln p_raw(tok)`` under add-1-smoothed unigram
    models (target = the English slice, raw = whole corpus; shared
    smoothing denominator vocab V = distinct raw tokens); the top-K by
    score is the selected subset. DSIR's hashed-n-gram variant replaces
    ``token`` with a feature-hash bucket — same plan, fixed vocab.

    Scale shape: the model pass is explode → map-side-combined hash agg
    (vocab-sized outputs); the three scalars (nr, nt, v) are one-row
    aggregates cross-joined as broadcasts; the per-token weight table is
    vocab-sized and BROADCAST into the scoring pass, which is the only
    full-corpus shuffle (doc_id group-by of pre-summed longs). ``ln`` is
    evaluated once per DISTINCT token at the weight table, then
    quantized to integer micro-nats — per-doc sums are order-free
    BIGINT adds (the q_lm_score exactness discipline). At 100 TB the
    token explosion is the dominant cost and is embarrassingly parallel;
    a hashed vocabulary (2^20 buckets) bounds the broadcast at ~8 MB."""
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id", "lang",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token"),
        )
    )
    raw = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (
        toks.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("token").agg(F.count(F.lit(1)).alias("ct"))
    )
    tot = (
        toks.agg(
            F.count(F.lit(1)).alias("nr"),
            F.sum(
                F.when(F.col("lang") == _DSIR_TARGET_LANG, 1).otherwise(0)
            ).alias("nt"),
        )
        .crossJoin(F.broadcast(raw.agg(F.count(F.lit(1)).alias("v"))))
    )
    w = (
        raw.join(tgt, "token", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.floor(
                (
                    F.log((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                          / (F.col("nt") + F.col("v")))
                    - F.log((F.col("cr") + F.lit(1.0))
                            / (F.col("nr") + F.col("v")))
                ) * 1000000.0 + F.lit(0.5)
            ).cast("bigint").alias("w_micro"),
        )
    )
    return (
        toks.join(F.broadcast(w), "token")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w_micro").alias("dsir_micro"),
        )
        .orderBy(F.col("dsir_micro").desc(), "doc_id")
        .limit(_DSIR_TOP)
    )


# --------------------------------------------------------------------------
# Quality-aware canonical selection over near-dup clusters
# --------------------------------------------------------------------------

@query("q_canonical_docs", oracle="""
WITH RECURSIVE pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM documents a JOIN documents b
    ON a.lang = b.lang
   AND substr(a.text, 1, 12) = substr(b.text, 1, 12)
   AND a.doc_id < b.doc_id
  WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 10
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
labels AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id
  FROM reach GROUP BY a
),
ranked AS (
  SELECT l.cluster_id, l.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY l.cluster_id
                            ORDER BY d.n_chars DESC, l.doc_id) AS rn,
         count(*)      OVER (PARTITION BY l.cluster_id) AS n_members,
         sum(d.n_chars) OVER (PARTITION BY l.cluster_id) AS total_chars
  FROM labels l JOIN documents d ON l.doc_id = d.doc_id
)
SELECT cluster_id,
       doc_id                        AS canonical_doc,
       CAST(n_chars AS BIGINT)       AS canonical_chars,
       CAST(n_members AS BIGINT)     AS n_members,
       CAST(total_chars AS BIGINT)   AS total_chars
FROM ranked WHERE rn = 1
""")
def q_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N2: canonical-representative selection over near-duplicate
    clusters. ``q_dedup_clusters`` (dedup.py) stops at "one row per
    clustered doc + a min-id keep flag"; real curation keeps the BEST
    member per cluster — here max ``n_chars``, doc_id tiebreak (in
    production: a quality score). One row per cluster: representative,
    its size, member count, total chars absorbed.

    Same candidate graph as q_dedup_clusters (lang + 12-char prefix
    block, Levenshtein<=10 on 40-char prefixes) so the two queries are
    mutually checking; components via :func:`api.connected_components`
    (iterative min-label propagation — (long,long) shuffles only,
    rounds ~= diameter, lineage cut per round). The representative pick
    is a window over CLUSTER id — cluster sizes are dozens of docs, so
    per-cluster windows are skew-free at any corpus size (contrast the
    per-language windows that need grouped_rank). The DuckDB oracle
    reuses q_dedup_clusters' recursive-CTE closure (oracle-only; O(n*e)
    is not the scale path)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars",
        F.substring("text", 1, 12).alias("block_key"),
        F.substring("text", 1, 40).alias("prefix40"),
    )
    a = docs.select(
        F.col("doc_id").alias("doc_a"), F.col("lang").alias("lang_a"),
        F.col("block_key").alias("bk_a"), F.col("prefix40").alias("pref_a"),
    )
    b = docs.select(
        F.col("doc_id").alias("doc_b"), F.col("lang").alias("lang_b"),
        F.col("block_key").alias("bk_b"), F.col("prefix40").alias("pref_b"),
    )
    pairs = (
        a.join(b, (F.col("lang_a") == F.col("lang_b"))
                  & (F.col("bk_a") == F.col("bk_b"))
                  & (F.col("doc_a") < F.col("doc_b")))
        .filter(F.levenshtein("pref_a", "pref_b") <= 10)
        .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    labels = connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    w = Window.partitionBy("cluster_id")
    ranked = (
        labels.join(docs.select("doc_id", "n_chars"), "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                w.orderBy(F.col("n_chars").desc(), "doc_id")
            ),
        )
        .withColumn("n_members", F.count(F.lit(1)).over(w))
        .withColumn("total_chars", F.sum("n_chars").over(w))
    )
    return ranked.filter(F.col("rn") == 1).select(
        "cluster_id",
        F.col("doc_id").alias("canonical_doc"),
        F.col("n_chars").cast("bigint").alias("canonical_chars"),
        F.col("n_members").cast("bigint").alias("n_members"),
        F.col("total_chars").cast("bigint").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# Group-disjoint (leakage-proof) splitting
# --------------------------------------------------------------------------

@query("q_domain_split", oracle=f"""
WITH assigned AS (
  SELECT CASE WHEN substr(md5(source), 1, 8) < '{_TRAIN_MAX}' THEN 'train'
              WHEN substr(md5(source), 1, 8) < '{_VAL_MAX}'   THEN 'val'
              ELSE 'test' END AS split,
         source, doc_id, n_chars
  FROM documents
)
SELECT split,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(*) AS BIGINT)               AS n_docs,
       CAST(sum(n_chars) AS BIGINT)           AS sum_chars
FROM assigned GROUP BY split
""")
def q_domain_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-disjoint train/val/test split: the split is a pure function
    of md5(source), so every DOMAIN lands wholly in one split — the
    leakage-proof variant of ``q_hash_split`` (doc-level hashing lets
    near-identical pages from one site straddle train and eval, which
    inflates eval scores; domain-disjoint splitting is the standard
    guard). Same portable md5-hex-prefix thresholds as q_hash_split
    (70/15/15), so no hex→int conversion and no engine-specific hash.

    Scale shape: map-only assignment (no shuffle to decide the split),
    one hash aggregation for the report. Writing the actual splits is
    ``partitionBy(split)`` on the same map-only column. Disjointness is
    structural (a deterministic function of the group key cannot give
    one source two splits) and pinned by a property test."""
    assigned = load(spark, sf_dir, "documents").withColumn(
        "split",
        F.when(F.substring(F.md5("source"), 1, 8) < _TRAIN_MAX, "train")
        .when(F.substring(F.md5("source"), 1, 8) < _VAL_MAX, "val")
        .otherwise("test"),
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# --------------------------------------------------------------------------
# Length-grouped batching with padding-waste accounting
# --------------------------------------------------------------------------

@query("q_length_batching", oracle=f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok
  FROM documents
),
r AS (
  SELECT doc_id, n_tok,
         CAST(floor(n_tok / {_LB_BAND}) AS BIGINT) AS band,
         row_number() OVER (PARTITION BY floor(n_tok / {_LB_BAND})
                            ORDER BY n_tok, doc_id) AS rn
  FROM t
),
batches AS (
  SELECT band, CAST(floor((rn - 1) / {_LB_BATCH}) AS BIGINT) AS batch_id,
         n_tok
  FROM r
)
SELECT band, batch_id,
       CAST(count(*) AS BIGINT)                         AS batch_docs,
       CAST(max(n_tok) AS BIGINT)                       AS max_tok,
       CAST(sum(n_tok) AS BIGINT)                       AS sum_tok,
       CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_waste
FROM batches GROUP BY band, batch_id
""")
def q_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped batch construction: documents are banded by token
    count (band = n_tok / {band}), ordered (n_tok, doc_id) within a
    band, and packed into fixed-size batches of {batch}; each batch
    reports its padding waste (docs × max-in-batch − sum-of-lengths) —
    the quantity length-grouped batching exists to minimize vs random
    batching (pad-to-max training: ~every trainer's bucketed sampler).

    Scale shape: the within-band ordering uses
    :func:`api.grouped_rank` — range-partitioned two-phase ranking —
    NOT a per-band window, because bands are few and large (7 bands
    here; the modal band can hold most of a real corpus): one
    reducer-per-band would be the q_sql_window_ntile scale-killer. The
    final per-(band, batch) rollup is an ordinary partial-aggregated
    group-by over integer keys."""
    t = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
    ).withColumn(
        "band", F.floor(F.col("n_tok") / _LB_BAND).cast("bigint")
    )
    ranked = grouped_rank(
        t, ["band"], ["n_tok", "doc_id"], rank_col="rn", total_col="_n"
    )
    return (
        ranked.withColumn(
            "batch_id",
            F.floor((F.col("rn") - 1) / _LB_BATCH).cast("bigint"),
        )
        .groupBy("band", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("batch_docs"),
            F.max("n_tok").cast("bigint").alias("max_tok"),
            F.sum("n_tok").cast("bigint").alias("sum_tok"),
        )
        .withColumn(
            "pad_waste",
            (F.col("batch_docs") * F.col("max_tok") - F.col("sum_tok"))
            .cast("bigint"),
        )
    )


q_length_batching.__doc__ = q_length_batching.__doc__.format(
    band=_LB_BAND, batch=_LB_BATCH
)


# --------------------------------------------------------------------------
# Contrastive hard-negative mining
# --------------------------------------------------------------------------

_ORACLE_COS = """
list_sum(list_transform(list_zip({a}, {b}),
         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
/ NULLIF(
    sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
  * sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 0)
"""


@query("q_hard_negatives", oracle=f"""
WITH q AS (
  SELECT vec_id AS qid, label AS q_label, embedding AS qe
  FROM embeddings WHERE vec_id < {_HN_QUERIES}
),
scored AS (
  SELECT q.qid, e.vec_id, e.label,
         CAST(floor(({_ORACLE_COS.format(a="e.embedding", b="q.qe")})
                    * 10000.0 + 0.5) AS BIGINT) AS sim_e4
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.qid AND e.label <> q.q_label
),
banded AS (
  SELECT qid, vec_id, label, sim_e4,
         row_number() OVER (PARTITION BY qid
                            ORDER BY sim_e4 DESC, vec_id) AS rn
  FROM scored
  WHERE sim_e4 >= {_HN_LO_E4} AND sim_e4 < {_HN_HI_E4}
)
SELECT qid, vec_id, label, sim_e4, CAST(rn AS BIGINT) AS rank
FROM banded WHERE rn <= {_HN_TOPK}
""")
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3: contrastive hard-negative mining (the DPR recipe, Karpukhin
    et al. 2020): for each query vector, the top-k vectors with a
    DIFFERENT label whose cosine similarity falls in a mid band
    [{lo}, {hi}) × 1e-4 — similar enough to be informative negatives,
    excluded above the band where they are probable mislabels or
    near-duplicates (the q_embedding_neardup regime).

    Scale shape: the query side is small by construction (a training
    batch / probe set) and BROADCAST; scoring is one distributed scan
    of the corpus — per-row dot products inside codegen, similarity
    quantized to integer 1e-4 units so band membership and ranking are
    engine-exact (no ROUND ties, no float compares). The per-query
    top-k is a window over qid on the band SURVIVORS only (a tiny
    fraction of the corpus; the full top-k-per-group twin is
    ``q_topk_per_group``'s WindowGroupLimit shape). At 100 TB with a
    large query batch, candidates would come from the registered ANN
    paths (IVF / PQ-ADC) instead of the exact scan — same banding and
    ranking on top."""
    from spark_ml_spark.functions.vector import cosine, to_double_array

    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("emb")
    )
    q = emb.filter(F.col("vec_id") < _HN_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("q_label"),
        F.col("emb").alias("qe"),
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(
            (F.col("vec_id") != F.col("qid"))
            & (F.col("label") != F.col("q_label"))
        )
        .select(
            "qid", "vec_id", "label",
            F.floor(
                cosine(F.col("emb"), F.col("qe")) * 10000.0 + F.lit(0.5)
            ).cast("bigint").alias("sim_e4"),
        )
        .filter(
            (F.col("sim_e4") >= _HN_LO_E4) & (F.col("sim_e4") < _HN_HI_E4)
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim_e4").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HN_TOPK)
        .select(
            "qid", "vec_id", "label", "sim_e4",
            F.col("rn").cast("bigint").alias("rank"),
        )
    )


q_hard_negatives.__doc__ = q_hard_negatives.__doc__.format(
    lo=_HN_LO_E4, hi=_HN_HI_E4
)


# --------------------------------------------------------------------------
# Snapshot drift / CDC diff
# --------------------------------------------------------------------------

@query("q_drift_diff", oracle=f"""
WITH a AS (
  SELECT user_id, event_type, count(*) AS cnt_a
  FROM events WHERE epoch(ts) < {_DRIFT_CUT}
  GROUP BY user_id, event_type
),
b AS (
  SELECT user_id, event_type, count(*) AS cnt_b
  FROM events WHERE epoch(ts) >= {_DRIFT_CUT}
  GROUP BY user_id, event_type
)
SELECT COALESCE(a.user_id, b.user_id)       AS user_id,
       COALESCE(a.event_type, b.event_type) AS event_type,
       CAST(COALESCE(a.cnt_a, 0) AS BIGINT) AS cnt_a,
       CAST(COALESCE(b.cnt_b, 0) AS BIGINT) AS cnt_b,
       CASE WHEN a.user_id IS NULL THEN 'added'
            WHEN b.user_id IS NULL THEN 'removed'
            WHEN a.cnt_a = b.cnt_b THEN 'stable'
            ELSE 'changed' END              AS status
FROM a FULL OUTER JOIN b
  ON a.user_id = b.user_id AND a.event_type = b.event_type
""")
def q_drift_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot drift diff (the CDC / data-drift monitoring pass between
    two ingest snapshots): per (user, event_type) activity counts in two
    15-day windows, full-outer joined and classified
    added / removed / changed / stable. The same plan diffs any two
    PARTITIONS of any keyed aggregate (yesterday's table vs today's).

    Scale shape: each side is a partial-aggregated group-by (counts
    collapse BEFORE the join, so the full-outer join carries one row per
    distinct key per side, not one per event); the join shuffles on the
    same (user_id, event_type) key both aggregates just produced — AQE
    coalesces the post-shuffle partitions. The window cut is an
    epoch-seconds literal (timezone-proof under the pinned-UTC session,
    matching every other events query). Filters push to the parquet
    scan; both windows read one table slice each."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type",
        F.unix_timestamp("ts").alias("ets"),
    )
    a = (
        ev.filter(F.col("ets") < _DRIFT_CUT)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt_a"))
    )
    b = (
        ev.filter(F.col("ets") >= _DRIFT_CUT)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt_b"))
    )
    j = a.join(b, ["user_id", "event_type"], "full")
    return j.select(
        "user_id", "event_type",
        F.coalesce("cnt_a", F.lit(0)).cast("bigint").alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).cast("bigint").alias("cnt_b"),
        F.when(F.col("cnt_a").isNull(), "added")
        .when(F.col("cnt_b").isNull(), "removed")
        .when(F.col("cnt_a") == F.col("cnt_b"), "stable")
        .otherwise("changed")
        .alias("status"),
    )


# --------------------------------------------------------------------------
# Per-group percentile calibration
# --------------------------------------------------------------------------

@query("q_quantile_normalize", oracle="""
WITH r AS (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS rk,
         count(*)    OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(CASE WHEN n > 1
                 THEN floor((rk - 1) * 1000000.0 / (n - 1) + 0.5)
                 ELSE 0 END AS BIGINT) AS pct_ppm
FROM r
""")
def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language percentile calibration of a quality proxy
    (``n_chars`` stands in for any raw quality score): each document's
    score becomes its percent-rank WITHIN its language, in integer ppm.
    This is the calibration step before one global keep-threshold is
    applied across languages whose raw score distributions differ
    (CCNet/Gopher-style heuristic filters are calibrated per language
    exactly this way) — keep pct_ppm >= X drops the same FRACTION of
    every language.

    Scale shape: languages are few-large-groups (en alone is ~43% of
    this corpus), so the rank comes from :func:`api.grouped_rank` —
    range-partitioned two-phase per-group ranking — not a per-language
    window that would put the modal language on one reducer. percent
    rank is then pure integer arithmetic ((rk-1)·1e6 / (n-1), floored
    at +0.5): a single exact division, bit-identical cross-engine —
    never the float ``percent_rank()`` builtin whose engine rounding
    could differ. The DuckDB oracle uses the plain window (fine at
    oracle scale)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    ranked = grouped_rank(
        docs, ["lang"], ["n_chars", "doc_id"], rank_col="rk", total_col="n"
    )
    return ranked.select(
        "doc_id", "lang",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.when(
            F.col("n") > 1,
            F.floor(
                (F.col("rk") - 1) * 1000000.0 / (F.col("n") - 1) + F.lit(0.5)
            ),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("pct_ppm"),
    )


# --------------------------------------------------------------------------
# BM25 retrieval ranking
# --------------------------------------------------------------------------

#: BM25 constants (Robertson; the Lucene-default shape). Written as the
#: same decimal literals in Spark and oracle SQL so both engines parse
#: the identical doubles (1.2+1 computed at runtime could differ from a
#: parsed 2.2 in the last bit — precompute k1+1 and 1-b as literals).
_BM25_K1 = "1.2"
_BM25_K1P1 = "2.2"
_BM25_B = "0.75"
_BM25_1MB = "0.25"
#: query terms: the 3 tokens whose document frequency is closest to
#: N/10 (mid-frequency = discriminative; pure-integer |df*10 - N| pick)
_BM25_NTERMS = 3
_BM25_TOPK = 20


@query("q_bm25_rank", oracle=rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
),
dl AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)
           AS dl
  FROM documents
),
n AS (SELECT count(*) AS n_docs FROM documents),
avg_dl AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
vocab AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token
),
qterms AS (
  SELECT token, df,
         ln(1.0 + (n.n_docs - df + 0.5) / (df + 0.5)) AS idf
  FROM vocab, n
  ORDER BY abs(df * 10 - n.n_docs), token
  LIMIT {_BM25_NTERMS}
),
tf AS (
  SELECT t.doc_id, t.token, CAST(count(*) AS BIGINT) AS tf
  FROM toks t JOIN qterms q ON t.token = q.token
  GROUP BY t.doc_id, t.token
),
contrib AS (
  SELECT tf.doc_id,
         CAST(floor(
           q.idf * (CAST(tf.tf AS DOUBLE) * {_BM25_K1P1})
           / (CAST(tf.tf AS DOUBLE)
              + {_BM25_K1} * ({_BM25_1MB}
                 + {_BM25_B} * (CAST(dl.dl AS DOUBLE) / avg_dl.avgdl)))
           * 1000000.0 + 0.5) AS BIGINT) AS c_micro
  FROM tf
  JOIN qterms q ON tf.token = q.token
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN avg_dl
)
SELECT doc_id,
       CAST(count(*) AS BIGINT)       AS n_terms,
       CAST(sum(c_micro) AS BIGINT)   AS bm25_micro
FROM contrib
GROUP BY doc_id
ORDER BY bm25_micro DESC, doc_id
LIMIT {_BM25_TOPK}
""")
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3/RAG: BM25 document ranking (Robertson et al.; the Lucene
    scoring shape) for a deterministic 3-term query — the 3 tokens
    whose df is nearest N/10 (mid-frequency, so the query is
    discriminative on any fixture). idf = ln(1 + (N-df+0.5)/(df+0.5));
    per-term contribution idf·tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)).

    Scale shape: the vocabulary/df pass is the q_vocab_build counting
    shape (map-side-combined agg to vocab-sized output); query-term
    stats and avgdl are one-row/3-row BROADCASTS; per-doc term
    frequencies come from one explode + equi-join against the broadcast
    term set (map-only gate, then a (doc,term)-keyed partial agg whose
    input is already filtered to query-term occurrences only). The
    top-K is TakeOrderedAndProject. Contributions are quantized to
    integer micro-units at the (doc, term) row — both engines evaluate
    the identical IEEE expression tree (constants written as the same
    decimal literals) — so the per-doc score is an order-free BIGINT
    sum; ln runs once per query term (3 rows). This is the inverted-
    index-free BM25 a batch engine uses; a serving system would push
    the same arithmetic at an index."""
    toks = (
        load(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("token"),
        )
    )
    docs = load(spark, sf_dir, "documents")
    dl = docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        .cast("bigint").alias("dl"),
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    avg_dl = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
    )
    vocab = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    qterms = (
        vocab.crossJoin(F.broadcast(n))
        .select(
            "token", "df",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
            F.abs(F.col("df") * 10 - F.col("n_docs")).alias("_dist"),
        )
        .orderBy("_dist", "token")
        .limit(_BM25_NTERMS)
        .drop("_dist")
    )
    tf = (
        toks.join(F.broadcast(qterms.select("token")), "token")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    k1, k1p1, b, onemb = (
        F.expr(f"CAST({_BM25_K1} AS DOUBLE)"),
        F.expr(f"CAST({_BM25_K1P1} AS DOUBLE)"),
        F.expr(f"CAST({_BM25_B} AS DOUBLE)"),
        F.expr(f"CAST({_BM25_1MB} AS DOUBLE)"),
    )
    contrib = (
        tf.join(F.broadcast(qterms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(avg_dl))
        .select(
            "doc_id",
            F.floor(
                F.col("idf") * (F.col("tf").cast("double") * k1p1)
                / (
                    F.col("tf").cast("double")
                    + k1 * (onemb + b * (F.col("dl").cast("double")
                                         / F.col("avgdl")))
                )
                * 1000000.0 + F.lit(0.5)
            ).cast("bigint").alias("c_micro"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("c_micro").cast("bigint").alias("bm25_micro"),
        )
        .orderBy(F.col("bm25_micro").desc(), "doc_id")
        .limit(_BM25_TOPK)
    )


# --------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis–Spirakis)
# --------------------------------------------------------------------------

#: sample size; weights = n_chars (sample documents ∝ their length)
_WS_K = 40

#: DuckDB: value of the first 8 hex chars of md5({g}) as a BIGINT
#: (uint32 range) — strpos-ladder, portable to any engine with md5;
#: the Spark twin is conv(substr(md5, 1, 8), 16, 10)
_HEX8 = """(
  (strpos('0123456789abcdef', substr(md5({g}), 1, 1)) - 1) * 268435456
+ (strpos('0123456789abcdef', substr(md5({g}), 2, 1)) - 1) * 16777216
+ (strpos('0123456789abcdef', substr(md5({g}), 3, 1)) - 1) * 1048576
+ (strpos('0123456789abcdef', substr(md5({g}), 4, 1)) - 1) * 65536
+ (strpos('0123456789abcdef', substr(md5({g}), 5, 1)) - 1) * 4096
+ (strpos('0123456789abcdef', substr(md5({g}), 6, 1)) - 1) * 256
+ (strpos('0123456789abcdef', substr(md5({g}), 7, 1)) - 1) * 16
+ (strpos('0123456789abcdef', substr(md5({g}), 8, 1)) - 1))"""


@query("q_weighted_sample", oracle=rf"""
WITH keyed AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
         -- Efraimidis–Spirakis key: rank by ln(u)/w (monotone in
         -- u^(1/w)); u = (h32 + 0.5) / 2^32 ∈ (0,1) from the doc-id
         -- md5, so the draw is deterministic and engine-portable
         CAST(floor(
           ln(({_HEX8.format(g="CAST(doc_id AS VARCHAR)")} + 0.5)
              / 4294967296.0)
           / CAST(n_chars AS DOUBLE) * 1000000000.0 + 0.5
         ) AS BIGINT) AS key_nano
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, lang, weight, key_nano
FROM keyed
ORDER BY key_nano DESC, doc_id
LIMIT {_WS_K}
""")
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006):
    each row draws key = u^(1/w) (ranked as ln(u)/w, monotone) with a
    DETERMINISTIC uniform u derived from md5(doc_id); the global top-K
    keys are the sample. Inclusion probability ∝ weight (n_chars here —
    length-proportional sampling, the doc-level form of token-budget
    mixture draws). The fixed-K *per-group* twin is
    ``q_reservoir_sample`` (uniform); this one is global and weighted.

    Scale shape: key assignment is map-only (md5 + one ln per row, all
    JVM codegen); the top-K is TakeOrderedAndProject — bounded
    per-partition heaps, no global sort, no shuffle of non-survivors.
    Exactness: u is an exact dyadic rational (h32+0.5)/2^32 identical
    in both engines; keys are quantized to integer nano-units for the
    output; a cross-engine ulp flip in ``ln`` could in principle reorder
    two keys, but distinct docs' keys differ by ≫1e-9 at any realistic
    corpus size (ties would need identical (md5, weight) pairs)."""
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id", "lang",
            F.col("n_chars").cast("bigint").alias("weight"),
            F.floor(
                F.log(u) / F.col("n_chars").cast("double")
                * 1000000000.0 + F.lit(0.5)
            ).cast("bigint").alias("key_nano"),
        )
        .orderBy(F.col("key_nano").desc(), "doc_id")
        .limit(_WS_K)
    )


# --------------------------------------------------------------------------
# Embedding-space drift monitoring
# --------------------------------------------------------------------------

@query("q_embedding_drift", oracle="""
WITH pos AS (
  SELECT label, vec_id % 2 AS snap, i AS pos,
         CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1000 + 0.5) AS BIGINT)
           AS qv
  FROM embeddings, unnest(range(len(embedding))) AS u(i)
),
cent AS (
  SELECT label, snap, pos,
         CAST(floor(CAST(sum(qv) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
           AS c_milli,
         count(*) AS n
  FROM pos GROUP BY label, snap, pos
),
paired AS (
  SELECT a.label, a.pos,
         abs(a.c_milli - b.c_milli) AS d_milli,
         a.n AS n_a, b.n AS n_b
  FROM cent a JOIN cent b
    ON a.label = b.label AND a.pos = b.pos
   AND a.snap = 0 AND b.snap = 1
)
SELECT label,
       CAST(max(n_a) AS BIGINT)      AS n_a,
       CAST(max(n_b) AS BIGINT)      AS n_b,
       CAST(sum(d_milli) AS BIGINT)  AS l1_drift_milli,
       CAST(max(d_milli) AS BIGINT)  AS max_dim_drift_milli
FROM paired
GROUP BY label
""")
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor: split the corpus into two
    interleaved snapshots (vec_id parity — stands in for two ingest
    epochs), compute each label's per-dimension centroid in QUANTIZED
    integer thousandths (order-free BIGINT sums — the q_doc_outliers
    centroid discipline), and report the per-label L1 centroid shift
    and worst single dimension. This is the encoder-rot / distribution-
    shift check a production embedding store runs between index builds
    (re-embed triggers, A/B encoder validation).

    Scale shape: posexplode(dim) → partial-aggregated (label, snap, dim)
    sums (output is |labels|·2·64 rows regardless of corpus size — the
    map-side combine absorbs the 64× row explosion); the snapshot
    pairing joins two tiny centroid tables; everything downstream of
    the first agg is metadata-sized. No window, no full-vector
    shuffles beyond the initial scan."""
    pos = (
        load(spark, sf_dir, "embeddings")
        .select(
            "label",
            (F.col("vec_id") % 2).alias("snap"),
            F.posexplode(F.col("embedding")).alias("pos", "x"),
        )
        .select(
            "label", "snap", "pos",
            F.floor(F.col("x").cast("double") * 1000 + F.lit(0.5))
            .cast("bigint").alias("qv"),
        )
    )
    cent = (
        pos.groupBy("label", "snap", "pos")
        .agg(
            F.floor(
                F.sum("qv").cast("double") / F.count(F.lit(1)) + F.lit(0.5)
            ).cast("bigint").alias("c_milli"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    a = cent.filter(F.col("snap") == 0).select(
        "label", "pos",
        F.col("c_milli").alias("ca"), F.col("n").alias("n_a"),
    )
    b = cent.filter(F.col("snap") == 1).select(
        "label", "pos",
        F.col("c_milli").alias("cb"), F.col("n").alias("n_b"),
    )
    return (
        a.join(b, ["label", "pos"])
        .select(
            "label", "n_a", "n_b",
            F.abs(F.col("ca") - F.col("cb")).alias("d_milli"),
        )
        .groupBy("label")
        .agg(
            F.max("n_a").cast("bigint").alias("n_a"),
            F.max("n_b").cast("bigint").alias("n_b"),
            F.sum("d_milli").cast("bigint").alias("l1_drift_milli"),
            F.max("d_milli").cast("bigint").alias("max_dim_drift_milli"),
        )
    )


#: RRF constant (Cormack et al. 2009's k=60) — inside the integer
#: divisor so the whole fusion is division-of-integers, zero floats
_RRF_K = 60


@query("q_rrf_fusion", oracle=f"""
WITH ra AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
  FROM documents
),
rb AS (
  SELECT doc_id,
         row_number() OVER (
           ORDER BY len(regexp_split_to_array(trim(lower(text)), '\\s+'))
                    - len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                                      t -> t <> 'spark')) DESC,
           doc_id) AS r
  FROM documents
)
SELECT ra.doc_id,
       CAST(ra.r AS BIGINT)                          AS rank_a,
       CAST(rb.r AS BIGINT)                          AS rank_b,
       CAST(1000000 // ({_RRF_K} + ra.r)
            + 1000000 // ({_RRF_K} + rb.r) AS BIGINT) AS rrf_micro
FROM ra JOIN rb USING (doc_id)
ORDER BY rrf_micro DESC, doc_id
LIMIT 20
""")
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N3/N4: reciprocal-rank fusion (Cormack et al. 2009) — the hybrid-
    search combiner: two independent rankings (a length-based proxy for
    a dense ranking; term-frequency of the query token 'spark' for the
    sparse/BM25 side) fuse by Σ 1/(60 + rank), and the top-20 fused
    docs emerge. RRF is THE production merge for dense+sparse retrieval
    because it needs no score calibration between systems — only ranks.

    Engine exactness: fused scores are exact integers — micro-RRF is
    ``1000000 DIV (60 + rank)``, pure non-negative integer division in
    both engines; no floats anywhere.

    Scale shape: each ranking is the two-phase ``api.global_rank``
    (range repartition + broadcast offsets — no single-partition
    window); the fusion is one equi-join on doc_id followed by
    TakeOrderedAndProject. At 100 TB the upstream systems emit top-K
    candidate lists instead of full rankings — the same join+fuse plan
    over K rows."""
    from spark_ml_spark.api import global_rank

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "n_chars",
        F.size(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: t == "spark",
            )
        ).cast("long").alias("qtf"),
    )
    ra = global_rank(
        docs.select("doc_id", (-F.col("n_chars")).alias("neg")),
        ["neg", "doc_id"], rank_col="r",
    ).select("doc_id", F.col("r").alias("rank_a"))
    rb = global_rank(
        docs.select("doc_id", (-F.col("qtf")).alias("neg")),
        ["neg", "doc_id"], rank_col="r",
    ).select("doc_id", F.col("r").alias("rank_b"))
    fused = ra.join(rb, "doc_id").select(
        "doc_id",
        F.col("rank_a").cast("long"),
        F.col("rank_b").cast("long"),
        F.expr(
            f"CAST(1000000 DIV ({_RRF_K} + rank_a)"
            f" + 1000000 DIV ({_RRF_K} + rank_b) AS BIGINT)"
        ).alias("rrf_micro"),
    )
    return fused.orderBy(F.col("rrf_micro").desc(), "doc_id").limit(20)


#: systematic sampling interval and fixed phase
_SYS_K = 50
_SYS_PHASE = 7


@query("q_systematic_sample", oracle=rf"""
WITH r AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
         row_number() OVER (ORDER BY doc_id) AS rnk
  FROM documents
)
SELECT doc_id, lang, n_chars, CAST(rnk AS BIGINT) AS rnk
FROM r
WHERE (rnk - 1) % {_SYS_K} = {_SYS_PHASE}
ORDER BY rnk
""")
def q_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic (every k-th) sampling: rank the frame by its key and
    take one row per stride of {k} at fixed phase {phase} — the survey-
    sampling design whose per-stratum spread beats Bernoulli sampling
    when the frame order correlates with the measurement (here: doc_id
    is ingest order, so the sample spreads evenly across the crawl).
    Completes the sampling family: Bernoulli (``q_hash_split``),
    fixed-K reservoir, weighted, stratified, temperature.

    Caveat the design owns: a frame with periodicity matching the
    stride is biased — the fixed phase makes that failure reproducible
    rather than hidden.

    Scale shape: ``api.global_rank`` two-phase ranking (no single-
    partition window), then a map-only modulus filter — selectivity
    exactly 1/{k} with zero variance in the sample size (±1)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    ranked = api.global_rank(
        docs, ["doc_id"], rank_col="rnk", total_col="_n"
    )
    return (
        ranked.where((F.col("rnk") - 1) % _SYS_K == _SYS_PHASE)
        .select("doc_id", "lang", "n_chars",
                F.col("rnk").cast("bigint").alias("rnk"))
        .orderBy("rnk")
    )


q_systematic_sample.__doc__ = q_systematic_sample.__doc__.format(
    k=_SYS_K, phase=_SYS_PHASE
)
