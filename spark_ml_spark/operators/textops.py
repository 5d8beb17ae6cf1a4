"""Text analysis over the ``documents`` table (north-star N4,
SURVEY.md §2.12): language-ID heuristic, quality scoring, token counting,
document fingerprinting — all built-in expressions (split / filter /
regexp / hash), zero Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_spark.functions.text import PUNCT_CLASS, STOPWORDS, ws_tokens
from spark_ml_spark.io.sources import load
from spark_ml_spark.registry import query


def _sw_list_sql(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in STOPWORDS[lang])


@query("q_text_stats", oracle=f"""
WITH t AS (
  SELECT lang, n_chars,
         regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
)
SELECT lang,
       count(*)                                   AS n_docs,
       ROUND(avg(n_chars), 4)                     AS avg_chars,
       CAST(sum(len(toks)) AS BIGINT)             AS total_tokens,
       ROUND(avg(CAST(len(list_filter(toks, x -> x IN ({_sw_list_sql('en')}))) AS DOUBLE)
                 / NULLIF(len(toks), 0)), 6)      AS avg_stopword_ratio
FROM t
GROUP BY lang
""")
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: per-language corpus statistics — doc counts, length, token
    totals, stopword density. One scan, one hash aggregate."""
    toks = ws_tokens("text")
    sw = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"])))
    d = load(spark, sf_dir, "documents").select(
        "lang",
        "n_chars",
        F.size(toks).alias("n_toks"),
        (sw.cast("double") / F.nullif(F.size(toks), F.lit(0))).alias("sw_ratio"),
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum("n_toks").alias("total_tokens"),
        F.round(F.avg("sw_ratio"), 6).alias("avg_stopword_ratio"),
    )


@query("q_token_count", oracle=r"""
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT)    AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
            AS INT)                                                  AS bpe_ish_tokens
FROM documents
""")
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: token counting two ways — whitespace tokens and a BPE-ish
    lexer regex (letter runs | digit runs | single other symbol), the
    standard pre-tokenizer shape."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(ws_tokens("text")).alias("ws_tokens"),
        F.regexp_count("text", F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]")).alias(
            "bpe_ish_tokens"
        ),
    )


def _lang_id_oracle() -> str:
    hits = ",\n         ".join(
        f"len(list_filter(toks, x -> x IN ({_sw_list_sql(lang)}))) AS hits_{lang}"
        for lang in ("en", "es", "de", "fr")
    )
    return f"""
WITH t AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM documents
), h AS (
  SELECT doc_id, lang,
         {hits}
  FROM t
)
SELECT doc_id, lang AS actual_lang,
       CASE WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr THEN 'en'
            WHEN hits_es >= hits_de AND hits_es >= hits_fr THEN 'es'
            WHEN hits_de >= hits_fr THEN 'de'
            ELSE 'fr' END AS predicted_lang
FROM h
"""


@query("q_lang_id", oracle=_lang_id_oracle())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: stopword-vote language identification (n-gram-heuristic
    family). Deterministic, dictionary-driven, expressible in both
    engines; ties break by a fixed language priority."""
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", toks.alias("toks"))

    def hits(words: tuple[str, ...]):
        # NB: plain closure — a lambda default arg would be introspected by
        # PySpark as a second lambda parameter
        return F.size(F.filter(F.col("toks"), lambda t: t.isin(*words)))

    for lang in ("en", "es", "de", "fr"):
        d = d.withColumn(f"hits_{lang}", hits(STOPWORDS[lang]))
    pred = (
        F.when(
            (F.col("hits_en") >= F.col("hits_es"))
            & (F.col("hits_en") >= F.col("hits_de"))
            & (F.col("hits_en") >= F.col("hits_fr")),
            "en",
        )
        .when(
            (F.col("hits_es") >= F.col("hits_de"))
            & (F.col("hits_es") >= F.col("hits_fr")),
            "es",
        )
        .when(F.col("hits_de") >= F.col("hits_fr"), "de")
        .otherwise("fr")
    )
    return d.select(
        "doc_id", F.col("lang").alias("actual_lang"), pred.alias("predicted_lang")
    )


@query("q_quality_score", oracle=f"""
WITH t AS (
  SELECT doc_id, n_chars,
         regexp_split_to_array(trim(text), '\\s+')                       AS toks,
         length(text) - length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS n_punct
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INT)                                        AS n_tokens,
       ROUND(CAST(n_punct AS DOUBLE) / NULLIF(n_chars, 0), 6)        AS punct_ratio,
       ROUND(CAST(len(list_filter(toks, x -> x IN ({_sw_list_sql('en')}))) AS DOUBLE)
             / NULLIF(len(toks), 0), 6)                              AS stopword_ratio,
       CASE WHEN len(toks) >= 20
             AND CAST(n_punct AS DOUBLE) / NULLIF(n_chars, 0) < 0.1
            THEN 1 ELSE 0 END                                        AS keep_flag
FROM t
""")
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: document quality scoring (length / punctuation / stopword
    ratios + a keep/drop gate) — the C4-style heuristic filter shape."""
    toks = ws_tokens("text")
    n_punct = F.length("text") - F.length(
        F.regexp_replace("text", PUNCT_CLASS, "")
    )
    punct_ratio = n_punct.cast("double") / F.nullif(F.col("n_chars"), F.lit(0))
    sw_ratio = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS["en"]))
    ).cast("double") / F.nullif(F.size(toks), F.lit(0))
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(sw_ratio, 6).alias("stopword_ratio"),
        F.when((F.size(toks) >= 20) & (punct_ratio < 0.1), 1)
        .otherwise(0)
        .alias("keep_flag"),
    )


@query("q_doc_fingerprint", oracle="""
SELECT doc_id,
       md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
""")
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: content fingerprinting — digest of whitespace-normalized,
    case-folded text (MD5 computes identically in both engines). The
    rolling-hash/winnowing variant is ``q_simhash_buckets`` (rows-only,
    engine-specific hash)."""
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return load(spark, sf_dir, "documents").select(
        "doc_id", F.md5(norm).alias("fingerprint")
    )


@query("q_repetition_score", oracle="""
WITH t AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), g AS (
  SELECT doc_id, lang, toks,
         [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
          for i in range(1, len(toks) - 1)] AS tg
  FROM t
)
SELECT doc_id, lang,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       ROUND(CASE WHEN len(tg) = 0 THEN 0.0
             ELSE 1.0 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg)
             END, 4) AS dup_trigram_ratio,
       ROUND(CAST(list_max([len(list_filter(toks, x -> x = t))
                            for t in list_distinct(toks)]) AS DOUBLE)
             / NULLIF(len(toks), 0), 4) AS top_token_ratio
FROM g
""")
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N4: intra-document repetition scoring — the Gopher-rules quality
    signal (docs dominated by repeated n-grams or a single token are
    boilerplate/spam and get filtered before training):

    - ``dup_trigram_ratio``: 1 − distinct/total word-trigrams (the
      "duplicate n-gram fraction" rule);
    - ``top_token_ratio``: frequency share of the most common token.

    Pure map-side: every measure is row-local higher-order-function
    algebra on the token array — no shuffle at all (the whole query is
    scan → project), so it runs at scan speed on 100 TB. The trigram
    multiset uses the shifted-slice zip_with construction, not
    transform+element_at (measured 12× difference — element access in a
    lambda re-evaluates the derived split per element)."""
    from spark_ml_spark.functions.text import word_ngrams_all

    t = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", ws_tokens("text").alias("toks"),
        word_ngrams_all("text", 3).alias("tg"),
    )
    top_count = F.array_max(
        F.transform(
            F.array_distinct("toks"),
            lambda tk: F.size(F.filter("toks", lambda x: x == tk)),
        )
    )
    return t.select(
        "doc_id", "lang",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.round(
            F.when(F.size("tg") == 0, F.lit(0.0)).otherwise(
                1.0 - F.size(F.array_distinct("tg")).cast("double") / F.size("tg")
            ), 4,
        ).alias("dup_trigram_ratio"),
        F.round(
            top_count.cast("double") / F.nullif(F.size("toks"), F.lit(0)), 4
        ).alias("top_token_ratio"),
    )


# PII regex library: shared Java-regex/RE2-compatible patterns (no
# backreferences, no lookbehind — the RE2 subset DuckDB requires).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+\d{1,2}-\d{3}-\d{4}"
_PII_SSN = r"\d{3}-\d{2}-\d{4}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: deterministic synthetic-PII injection: the fixture corpus is clean
#: word-salad, so each doc gets reproducible fake contact lines appended
#: (email always; phone on doc_id%2; SSN on doc_id%3; IP on doc_id%5) —
#: the redactor then has real work whose counts are oracle-checkable.
_PII_INJECT_SQL = """
  concat(text, ' contact user', CAST(doc_id AS STRING), '@example.com',
         CASE WHEN doc_id % 2 = 0
              THEN concat(' call +1-555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))
              ELSE '' END,
         CASE WHEN doc_id % 3 = 0 THEN ' ssn 987-65-4321' ELSE '' END,
         CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.42.7' ELSE '' END)
"""


@query("q_pii_redact", oracle=f"""
WITH injected AS (
  SELECT doc_id, lang, {_PII_INJECT_SQL} AS text
  FROM documents
), redacted AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
         len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
         len(regexp_extract_all(regexp_replace(text, '{_PII_PHONE}', '<PHONE>', 'g'),
                                '{_PII_SSN}'))         AS n_ssn,
         len(regexp_extract_all(text, '{_PII_IP}'))    AS n_ip,
         length(text) AS len_before,
         length(regexp_replace(regexp_replace(regexp_replace(regexpreplace_ip, '{_PII_SSN}', '<SSN>', 'g'),
                 '{_PII_EMAIL}', '<EMAIL>', 'g'), '{_PII_PHONE}', '<PHONE>', 'g')) AS len_after
  FROM (SELECT *, regexp_replace(text, '{_PII_IP}', '<IP>', 'g') AS regexpreplace_ip
        FROM injected) i
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_email) AS BIGINT) AS emails_redacted,
       CAST(sum(n_phone) AS BIGINT) AS phones_redacted,
       CAST(sum(n_ssn) AS BIGINT)   AS ssns_redacted,
       CAST(sum(n_ip) AS BIGINT)    AS ips_redacted,
       CAST(sum(len_before - len_after) AS BIGINT) AS chars_removed
FROM redacted
GROUP BY lang
""")
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (the pre-training privacy pass): regex redaction of
    emails / phone numbers / SSN-shaped ids / IPv4 addresses, as pure
    JVM ``regexp_replace`` / ``regexp_count`` expressions — one map-side
    scan, no shuffle until the per-lang report agg, no Python in the
    data path.

    The fixture corpus contains no organic PII, so the query first
    APPENDS deterministic synthetic contact strings per doc (keyed on
    doc_id — reproducible, oracle-replicable), then redacts them;
    redaction counts and removed-char totals are exact in both engines.
    Masking order is fixed and identical in both engines (IP, then SSN,
    then email, then phone), and the SSN count runs over phone-masked
    text so a phone's digit run can never double-count as an SSN;
    patterns are RE2-safe (no backreferences, no lookaround) so Java
    regex and DuckDB RE2 agree."""
    docs = load(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id", "lang",
        F.expr(_PII_INJECT_SQL).alias("text"),
    )
    ip_masked = F.regexp_replace("text", _PII_IP, "<IP>")
    phone_masked_for_ssn = F.regexp_replace("text", _PII_PHONE, "<PHONE>")
    full_masked = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(ip_masked, _PII_SSN, "<SSN>"),
            _PII_EMAIL, "<EMAIL>",
        ),
        _PII_PHONE, "<PHONE>",
    )
    red = injected.select(
        "lang",
        F.regexp_count("text", F.lit(_PII_EMAIL)).alias("n_email"),
        F.regexp_count("text", F.lit(_PII_PHONE)).alias("n_phone"),
        F.regexp_count(phone_masked_for_ssn, F.lit(_PII_SSN)).alias("n_ssn"),
        F.regexp_count("text", F.lit(_PII_IP)).alias("n_ip"),
        (F.length("text") - F.length(full_masked)).alias("delta"),
    )
    return red.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").alias("emails_redacted"),
        F.sum("n_phone").alias("phones_redacted"),
        F.sum("n_ssn").alias("ssns_redacted"),
        F.sum("n_ip").alias("ips_redacted"),
        F.sum("delta").alias("chars_removed"),
    )


#: heavy hitters: tokens above 1/200 of the total corpus token count.
_HH_FRACTION = 200


@query("q_heavy_hitters", oracle=f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM toks
)
SELECT token, count(*) AS cnt,
       CAST(ROUND(count(*) * 1000000.0 / tot.n) AS BIGINT) AS share_ppm
FROM toks, tot
GROUP BY token, tot.n
HAVING count(*) > tot.n / {_HH_FRACTION}
""")
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters (frequent-items, the φ=1/{_HH_FRACTION}
    threshold form): corpus tokens whose frequency exceeds n/{_HH_FRACTION}.
    Shape at 100 TB: explode → two-phase hash agg — the power-law token
    skew is absorbed by MAP-SIDE partial aggregation (each task
    pre-counts its own 'the's, so the shuffle carries one partial row
    per (task, token), not one row per occurrence); the corpus-total
    divisor rides a 1-row broadcast. An approximate Misra-Gries /
    Count-Min pass only becomes necessary when the DISTINCT-token set
    itself overflows executor memory — at that point swap the exact agg
    for ``df.stat.countMinSketch`` and keep the same threshold filter."""
    toks = load(spark, sf_dir, "documents").select(
        F.explode(ws_tokens("text")).alias("token")
    )
    tot = toks.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cnt") > F.col("n") / _HH_FRACTION)
        .select(
            "token", "cnt",
            # exact-integer parts-per-million, not ROUND(frac, 6): Spark
            # HALF_UP and DuckDB binary-value rounding disagree on
            # terminating decimal quotients (ADVICE r2; same fix as
            # q_ml_features' ppm_ columns, commit 69f1545)
            F.round(F.col("cnt") * 1000000.0 / F.col("n"), 0)
            .cast("bigint").alias("share_ppm"),
        )
    )
