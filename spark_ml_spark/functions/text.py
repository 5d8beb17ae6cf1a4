"""Text-analysis building blocks as built-in expressions.

All JVM-side (split / transform / filter / regexp) — the policy from
SURVEY.md §2.11: no row-level Python UDFs; the reference's per-row Python
lambdas (``Data_transform.py:59,75-76``) become codegen'd expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword language-ID
#: heuristic and quality scoring. Deliberately small and static so the
#: same lists can be inlined into the DuckDB oracle SQL.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "a"),
    "es": ("el", "la", "de", "que", "y", "en", "un"),
    "de": ("der", "die", "und", "das", "ist", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "un", "est"),
}

#: punctuation class shared verbatim with the oracle SQL (dialect-neutral).
PUNCT_CLASS = "[.,!?;:]"


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokenization: array of tokens of the trimmed text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def stopword_hits(tokens: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang`` (JVM-side filter)."""
    words = STOPWORDS[lang]
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def punct_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(PUNCT_CLASS))


def char_ngrams(text: Column | str, n: int = 3) -> Column:
    """Distinct character n-gram set (shingles) of a string, built with
    ``sequence`` + ``transform`` + ``substring`` — no Python, no explode
    shuffle; the set stays row-local until the caller aggregates it."""
    col_name = text if isinstance(text, str) else None
    if col_name is None:
        raise ValueError("char_ngrams needs a column name (uses SQL expr)")
    # sequence(1, 0) would count DOWN in Spark, so guard short strings.
    return F.expr(
        f"CASE WHEN length({col_name}) < {n} THEN array()"
        f" ELSE array_distinct(transform(sequence(1, length({col_name}) - {n - 1}),"
        f" i -> substring({col_name}, i, {n}))) END"
    )


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingle set — the standard web-dedup unit
    (char n-grams of a small-vocabulary corpus are near-universal, so
    every doc pair looks similar; word shingles discriminate). Built from
    ``sequence`` + ``transform`` over the token array — row-local, no
    explode shuffle."""
    from functools import reduce

    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(c), r"\s+")
    # zip_with over k shifted slices — NOT transform+element_at, which
    # re-evaluates the split for every element access (measured 12×
    # slower). greatest(n,0) guards docs shorter than k words (slice
    # length must be non-negative; slice(x, j, 0) is an empty array).
    n = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    parts = [F.slice(toks, j + 1, n) for j in range(k)]
    joined = reduce(
        lambda acc, p: F.zip_with(acc, p, lambda x, y: F.concat_ws(" ", x, y)),
        parts,
    )
    return F.array_distinct(joined)


def word_ngrams_all(text: Column | str, k: int = 3) -> Column:
    """ALL k-word n-grams in order, duplicates preserved — the unit for
    intra-document repetition scoring (dedup wants the distinct set,
    repetition measurement needs the multiset). Same shifted-slice
    zip_with construction as :func:`word_shingles`."""
    from functools import reduce

    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.trim(c), r"\s+")
    n = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    parts = [F.slice(toks, j + 1, n) for j in range(k)]
    return reduce(
        lambda acc, p: F.zip_with(acc, p, lambda x, y: F.concat_ws(" ", x, y)),
        parts,
    )
