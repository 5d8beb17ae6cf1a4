"""Round-5 wave-60: corpus-pipeline depth — bigram language model
scoring, RAKE keyword extraction, and small-file compaction planning.

``q_bigram_lm`` — the context-aware upgrade of ``q_lm_score``'s
unigram CCNet filter: fit corpus bigram counts, score each document's
mean conditional surprisal −ln P(w₂|w₁) with add-one smoothing, and
report the per-language cross-entropy profile. Repetitive text that
fools a unigram model (common words, abnormal order) surfaces here.

``q_rake_keywords`` — RAKE (Rose et al. 2010, "Automatic Keyword
Extraction from Individual Documents"): candidate phrases are maximal
stopword-free token runs; each word scores degree/frequency where
degree sums the lengths of phrases containing it — words that live in
long multi-word phrases beat frequent-but-isolated words.

``q_compaction_plan`` — the lakehouse small-file maintenance planner:
given per-partition row counts, assign calendar partitions (in key
order, so files stay range-prunable) to output files of a target row
budget by cumulative bin-fill, and report the resulting file manifest
— the plan an OPTIMIZE/compaction job executes.

The reference has none of these (``Data_transform.py`` passim);
siblings: ``q_lm_score`` (unigram), ``q_tfidf_topterms`` /
``q_bm25_rank`` (frequency scoring), ``q_islands`` (the run-grouping
trick RAKE's phrase extraction reuses), ``q_zorder_layout`` /
``q_skipping_report`` (layout; this adds the file-count dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query

#: RAKE stopword vocabulary (fixed literal — the operator's contract)
_RAKE_STOP = (
    "the", "of", "and", "a", "in", "to", "is", "for", "on", "with",
    "as", "by", "at", "an", "be", "this", "that", "it", "from", "or",
)

#: RAKE output cut
_RAKE_K = 20

#: compaction target rows per output file
_COMPACT_TARGET = 40_000


@query("q_bigram_lm", oracle=r"""
WITH toks AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
),
bg AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(len(t) - 1),
                i -> t[i+1] || ' ' || t[i+2])) AS bigram,
         unnest(list_transform(range(len(t) - 1), i -> t[i+1])) AS w1
  FROM toks WHERE len(t) >= 2
),
model AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY bigram
),
ctx AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1
),
vocab AS (
  SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v
  FROM (SELECT unnest(t) AS tok FROM toks)
),
scored AS (
  SELECT m.bigram,
         CAST(floor(ln((ctx.c1 + vocab.v) / (m.c12 + 1)) * 1000000.0
                    + 0.5) AS BIGINT) AS s
  FROM model m
  JOIN ctx ON ctx.w1 = split_part(m.bigram, ' ', 1)
  CROSS JOIN vocab
),
per_doc AS (
  SELECT b.doc_id, b.lang,
         CAST(count(*) AS BIGINT) AS n_bg,
         CAST(sum(sc.s) AS BIGINT) AS s_micro
  FROM bg b JOIN scored sc ON sc.bigram = b.bigram
  GROUP BY b.doc_id, b.lang
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bg) AS BIGINT) AS n_bigrams,
       CAST(sum(s_micro) // sum(n_bg) AS BIGINT) AS xent_micro
FROM per_doc
GROUP BY lang
ORDER BY lang
""")
def q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM cross-entropy per language: fit corpus bigram counts,
    score −ln((c₁+V)/(c₁₂+1)) per bigram (add-one smoothing over the
    observed vocabulary), aggregate mean conditional surprisal per
    language — the context-aware twin of ``q_lm_score``; the gap
    between the two is the mutual-information payoff of one token of
    context.

    Engine exactness: surprisal quantizes to integer micro-nats AT THE
    MODEL TABLE (one ``ln`` per distinct bigram), so every downstream
    reduction is order-free BIGINT addition (the q_lm_score
    discipline); the per-language mean is one exact integer division.

    Scale shape: bigrams extract IN-ROW from each doc's token array
    (no positional self-join); the model and context tables are
    observed-bigram/vocabulary-sized hash aggregates with map-side
    combine; scoring joins the bigram stream to the model on the
    bigram key — co-partitionable, with the corpus shuffling once."""
    toks = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"),
    )
    bg = (
        toks.where(F.size("t") >= 2)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(concat(t[i-1], ' ', t[i]) AS bigram, "
                    "t[i-1] AS w1))"
                )
            ).alias("p"),
        )
        .select("doc_id", "lang", "p.bigram", "p.w1")
    )
    model = bg.groupBy("bigram").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    )
    ctx = bg.groupBy("w1").agg(
        F.count(F.lit(1)).cast("bigint").alias("c1")
    )
    vocab = (
        toks.select(F.explode("t").alias("tok"))
        .agg(F.countDistinct("tok").cast("double").alias("v"))
    )
    scored = (
        model.withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            F.floor(
                F.log(
                    (F.col("c1") + F.col("v")) / (F.col("c12") + 1)
                )
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("s"),
        )
    )
    per_doc = (
        bg.join(scored, "bigram")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bg"),
            F.sum("s").cast("bigint").alias("s_micro"),
        )
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bg").cast("bigint").alias("n_bigrams"),
            F.expr("CAST(sum(s_micro) DIV sum(n_bg) AS BIGINT)")
            .alias("xent_micro"),
        )
        .orderBy("lang")
    )


@query("q_rake_keywords", oracle=rf"""
WITH toks AS (
  SELECT doc_id, tok,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS pos,
         CASE WHEN tok IN {_RAKE_STOP!r} THEN 1 ELSE 0 END AS stop
  FROM (
    SELECT doc_id, u.tok, u.pos
    FROM documents,
         LATERAL (SELECT unnest(regexp_split_to_array(lower(text),
                                                      '[^a-z]+')) AS tok,
                         generate_subscripts(
                           regexp_split_to_array(lower(text), '[^a-z]+'),
                           1) AS pos) u
  ) WHERE length(tok) >= 2
),
content AS (
  SELECT doc_id, tok, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS island
  FROM toks WHERE stop = 0
),
phrases AS (
  SELECT doc_id, island, CAST(count(*) AS BIGINT) AS plen
  FROM content GROUP BY doc_id, island
),
wordstats AS (
  SELECT c.tok,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(p.plen) AS BIGINT) AS degree
  FROM content c
  JOIN phrases p ON p.doc_id = c.doc_id AND p.island = c.island
  GROUP BY c.tok
)
SELECT tok AS word, freq, degree,
       CAST(degree * 1000000 // freq AS BIGINT) AS rake_micro
FROM wordstats
ORDER BY rake_micro DESC, freq DESC, word
LIMIT {_RAKE_K}
""")
def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword scores over the corpus: tokens split on non-letter
    runs, maximal stopword-free runs form candidate phrases (the
    ``q_islands`` pos − row_number grouping), and each word scores
    degree/frequency where degree sums the lengths of its phrases —
    multi-word-phrase members outrank isolated frequent words. Top-20
    by score.

    Engine exactness: freq and degree are exact BIGINTs; the score is
    one integer micro-division — no floats anywhere.

    Scale shape: tokenization and stopword marking are map-only; the
    island window partitions PER DOCUMENT (bounded by doc length, the
    q_sessionize discipline); phrase stats and word stats are
    map-side-combined hash aggregates; the cut is
    TakeOrderedAndProject."""
    raw = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(
            F.split(F.lower(F.col("text")), "[^a-z]+")
        ).alias("pos0", "tok"),
    ).where(F.length("tok") >= 2)
    w_pos = Window.partitionBy("doc_id").orderBy("pos0")
    toks = raw.select(
        "doc_id",
        "tok",
        F.row_number().over(w_pos).alias("pos"),
        F.col("tok").isin(*_RAKE_STOP).cast("int").alias("stop"),
    )
    w_isl = Window.partitionBy("doc_id").orderBy("pos")
    content = toks.where(F.col("stop") == 0).select(
        "doc_id",
        "tok",
        "pos",
        (F.col("pos") - F.row_number().over(w_isl)).alias("island"),
    )
    phrases = content.groupBy("doc_id", "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("plen")
    )
    wordstats = (
        content.join(phrases, ["doc_id", "island"])
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum("plen").cast("bigint").alias("degree"),
        )
    )
    return (
        wordstats.select(
            F.col("tok").alias("word"),
            "freq",
            "degree",
            F.expr("CAST(degree * 1000000 DIV freq AS BIGINT)")
            .alias("rake_micro"),
        )
        .orderBy(F.col("rake_micro").desc(), F.col("freq").desc(), "word")
        .limit(_RAKE_K)
    )


@query("q_compaction_plan", oracle=rf"""
WITH parts AS (
  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
           AS part_ym,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM lineitem GROUP BY 1
),
cum AS (
  SELECT part_ym, n_rows,
         CAST(coalesce(sum(n_rows) OVER (ORDER BY part_ym
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM parts
)
SELECT CAST(cum_before // {_COMPACT_TARGET} AS BIGINT) AS file_id,
       CAST(count(*) AS BIGINT) AS n_partitions,
       CAST(sum(n_rows) AS BIGINT) AS n_rows,
       CAST(min(part_ym) AS BIGINT) AS ym_min,
       CAST(max(part_ym) AS BIGINT) AS ym_max
FROM cum
GROUP BY 1
ORDER BY file_id
""")
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction manifest: per-month partition row counts
    bin-fill IN KEY ORDER into output files of ~{target} rows
    (file = cumulative-rows-before DIV target), reporting each planned
    file's partition span — key-ordered packing keeps the compacted
    files range-prunable on ship date, which is why OPTIMIZE jobs pack
    sorted rather than first-fit. The executing write is
    ``repartitionByRange`` + sortWithinPartitions (the
    ``q_skipping_report`` layout path); this query IS its planning
    pass.

    Scale shape: one map-side-combined aggregate to the calendar grain
    (≤ months, at any corpus size), a cumulative window over that
    bounded table, and a ≤files-row rollup. All BIGINT."""
    from spark_ml_spark import api

    parts = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
            .cast("bigint")
            .alias("part_ym")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    w = (
        Window.partitionBy(api.one_partition("part_ym"))
        .orderBy("part_ym")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = parts.select(
        "part_ym",
        "n_rows",
        F.coalesce(F.sum("n_rows").over(w), F.lit(0))
        .cast("bigint")
        .alias("cum_before"),
    )
    return (
        cum.groupBy(
            F.expr(f"CAST(cum_before DIV {_COMPACT_TARGET} AS BIGINT)")
            .alias("file_id")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.min("part_ym").cast("bigint").alias("ym_min"),
            F.max("part_ym").cast("bigint").alias("ym_max"),
        )
        .orderBy("file_id")
    )


q_compaction_plan.__doc__ = q_compaction_plan.__doc__.format(
    target=_COMPACT_TARGET
)
