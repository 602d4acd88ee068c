"""Corpus-level text mining queries (SURVEY.md §2.11 extension tier):
frequent n-gram vocabulary, per-document novelty against the corpus, and
per-language adaptive quality gating. All pure Column expressions over the
``documents`` table — shingling/tokenizing is row-local (zero shuffle),
the corpus statistics are single hash aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_data_pipeline_spark.operators.text import (
    token_count,
    tokens,
    word_shingles,
)
from ecommerce_data_pipeline_spark.plans.registry import register
from ecommerce_data_pipeline_spark.sources.readers import load_table

_SQL_TOKENS = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"
)


@register(
    "top_bigrams",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS ts FROM documents),
    bg AS (SELECT unnest([ts[i] || ' ' || ts[i+1]
                          for i in generate_series(1, len(ts)-1)]) AS bigram
           FROM tok),
    counted AS (SELECT bigram, count(*) AS n FROM bg GROUP BY bigram)
    SELECT bigram, n FROM counted
    ORDER BY n DESC, bigram
    LIMIT 25
    """,
    tags=("extension", "text", "ngram"),
)
def top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide frequent-bigram mining — the vocabulary/collocation
    profile that drives tokenizer audits and boilerplate detection.
    Shingling is row-local; the count is one map-side-combined hash
    aggregation, and the top-k is a TakeOrdered (no global sort).
    Deterministic ties: count desc, bigram asc."""
    docs = load_table(spark, sf_dir, "documents")
    bg = docs.select(
        F.explode(word_shingles(tokens("text"), 2)).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(25)
    )


@register(
    "doc_novelty_score",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_SQL_TOKENS} AS ts FROM documents),
    sh AS (SELECT doc_id,
                  unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
                                        for i in generate_series(1, len(ts)-2)])) AS s
           FROM tok),
    df AS (SELECT s, count(DISTINCT doc_id) AS docs FROM sh GROUP BY s),
    per_doc AS (
      SELECT sh.doc_id,
             count(*) AS n_shingles,
             count(*) FILTER (df.docs >= 2) AS n_dup_shingles
      FROM sh JOIN df USING (s) GROUP BY sh.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_shingles, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce(p.n_dup_shingles, 0) AS BIGINT) AS n_dup_shingles,
           CASE WHEN p.n_shingles > 0
                THEN round(1.0 - p.n_dup_shingles * 1.0 / p.n_shingles, 6)
           END AS novelty
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    tags=("extension", "text", "dedup"),
)
def doc_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the share of the doc's distinct 3-gram
    shingles that appear in NO other document (1 = all content unique to
    this doc). The corpus-side signal between exact dedup (identical
    docs) and near-dedup (pairwise similarity): cheap — one shingle
    document-frequency aggregation, one join back — and it ranks partial
    boilerplate that pairwise thresholds miss. At 100 TB both sides
    shuffle on the shingle hash; no pairwise expansion anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles(tokens("text"), 3))).alias("s"),
    )
    df_counts = sh.groupBy("s").agg(
        F.count_distinct("doc_id").alias("docs")
    )
    per_doc = (
        sh.join(df_counts, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("docs") >= 2, 1).otherwise(0)).alias(
                "n_dup_shingles"
            ),
        )
    )
    return docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
        F.coalesce("n_dup_shingles", F.lit(0))
        .cast("bigint")
        .alias("n_dup_shingles"),
        F.when(
            F.col("n_shingles") > 0,
            F.round(
                1.0 - F.col("n_dup_shingles") / F.col("n_shingles"), 6
            ),
        ).alias("novelty"),
    )


@register(
    "lang_adaptive_length_gate",
    oracle=f"""
    WITH tok AS (SELECT doc_id, lang, len({_SQL_TOKENS}) AS n_tokens
                 FROM documents),
    bounds AS (SELECT lang,
                      quantile_cont(n_tokens, 0.10) AS lo,
                      quantile_cont(n_tokens, 0.90) AS hi
               FROM tok GROUP BY lang)
    SELECT t.lang,
           count(*) AS n_docs,
           count(*) FILTER (t.n_tokens >= b.lo AND t.n_tokens <= b.hi)
             AS n_kept,
           round(count(*) FILTER (t.n_tokens >= b.lo AND t.n_tokens <= b.hi)
                 * 1.0 / count(*), 6) AS kept_frac,
           round(CAST(b.lo AS DOUBLE), 4) AS lo,
           round(CAST(b.hi AS DOUBLE), 4) AS hi
    FROM tok t JOIN bounds b USING (lang)
    GROUP BY t.lang, b.lo, b.hi
    """,
    tags=("extension", "text", "quality"),
)
def lang_adaptive_length_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language ADAPTIVE quality gate: instead of one global length
    band, each language keeps its [p10, p90] token-count band — the
    data-derived filter a multilingual training mix needs (a fixed global
    band over/under-filters low-resource languages). PERCENTILE_CONT
    interpolation matches DuckDB's quantile_cont exactly at 4dp
    (precedent: percentiles_exact). Two aggregations over the lang key —
    at corpus scale both partition on lang (use the approx-percentile
    twin when a single language's group outgrows a partition's sort)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", "lang", token_count("text").alias("n_tokens"))
    bounds = tok.groupBy("lang").agg(
        F.percentile("n_tokens", F.lit(0.10)).alias("lo_raw"),
        F.percentile("n_tokens", F.lit(0.90)).alias("hi_raw"),
    )
    kept = F.when(
        (F.col("n_tokens") >= F.col("lo_raw"))
        & (F.col("n_tokens") <= F.col("hi_raw")),
        1,
    ).otherwise(0)
    return (
        tok.join(bounds, "lang")
        .groupBy("lang", "lo_raw", "hi_raw")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(kept).cast("bigint").alias("n_kept"),
            F.round(F.sum(kept) / F.count(F.lit(1)), 6).alias("kept_frac"),
        )
        .select(
            "lang",
            "n_docs",
            "n_kept",
            "kept_frac",
            F.round(F.col("lo_raw").cast("double"), 4).alias("lo"),
            F.round(F.col("hi_raw").cast("double"), 4).alias("hi"),
        )
    )
