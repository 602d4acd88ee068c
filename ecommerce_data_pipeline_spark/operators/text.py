"""Text-analysis operators over document tables (SURVEY.md §2.11).

All pure Column expressions (split/filter/transform/aggregate higher-order
functions) — no Python UDFs, so the whole layer stays inside whole-stage
codegen and scales linearly with executors. The unit of text is the
``documents.text`` column (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: str | Column) -> Column:
    """Lowercased word tokens; empty fragments dropped."""
    return F.filter(
        F.split(F.lower(_c(col)), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def word_shingles(tokens_col: str | Column, n: int = 3) -> Column:
    """n-word shingles (the unit for MinHash / Jaccard near-dedup).

    `transform(sequence(...))` builds all windows in one codegen'd pass;
    documents shorter than n words produce an empty array.
    """
    t = _c(tokens_col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, n)))


def char_ngrams(col: str | Column, n: int = 5) -> Column:
    """Character n-grams of the raw text (alternative shingle unit)."""
    c = _c(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(0)))
    return F.transform(idx, lambda i: F.substring(c, i, n).cast("string"))


def punct_ratio(col: str | Column) -> Column:
    """Fraction of characters that are punctuation."""
    c = _c(col)
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[.!?,;:]", ""))
    return F.when(F.length(c) > 0, n_punct / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col: str | Column, stopwords: tuple[str, ...]) -> Column:
    """Fraction of tokens that are stopwords (quality-scoring feature)."""
    t = tokens(col)
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    return F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(0.0))


def mean_token_length(col: str | Column) -> Column:
    t = tokens(col)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(F.size(t) > 0, total / F.size(t)).otherwise(F.lit(0.0))


def non_ascii_ratio(col: str | Column) -> Column:
    """Share of non-ASCII characters — the cheap first cut of language ID."""
    c = _c(col)
    ascii_only = F.regexp_replace(c, r"[\x00-\x7F]", "")
    return F.when(F.length(c) > 0, F.length(ascii_only) / F.length(c)).otherwise(
        F.lit(0.0)
    )


def rolling_fingerprint(col: str | Column) -> Column:
    """Deterministic 128-bit document fingerprint (md5 of the normalized
    token stream) — content-identity key robust to whitespace/case noise."""
    return F.md5(F.concat_ws(" ", tokens(col)))
