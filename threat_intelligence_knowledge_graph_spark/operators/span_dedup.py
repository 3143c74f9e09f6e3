"""Substring-level (span) deduplication — duplicated n-gram spans.

Document-level dedup (``operators/dedup.py``) misses the dominant
duplication mode in web-scale corpora: long boilerplate runs repeated
INSIDE otherwise-distinct documents (licenses, navigation chrome,
quoted replies). "Deduplicating Training Data Makes Language Models
Better" (Lee et al., 2021) removes every substring that occurs >= 2
times in the corpus; their exact tool is a single-machine suffix
array, which does not distribute. The standard distributed
re-expression — used here — is positional word n-grams: a token
position is *duplicated* iff some n-gram covering it occurs >=
``min_occurrences`` times corpus-wide, which over-approximates the
suffix-array criterion at n-token granularity.

Tokenization is the repo's engine-portable scheme (lowercase, trim,
split on ``\\s+`` — same as ``text_quality.token_counts`` and
``decontaminate``), so every output is exactly SQL-reproducible and
DuckDB-oracle-able; the scrubbed text is therefore the NORMALIZED
token stream re-joined with single spaces, not the raw bytes.

Scale shape at 100 TB:

* the only corpus-wide shuffle is the gram-occurrence count, keyed on
  ``md5(gram)`` (32 bytes, never the gram text) with map-side partial
  aggregation — the same irreducible shuffle as the MinHash shingle
  pass;
* the duplicated-gram set joins back by the same hash key — a keyed
  equi-join, row-proportional (each occurrence row matches exactly one
  count row), so a hot boilerplate gram fans out linearly, never
  quadratically; AQE skew-join splits the hot hash partitions;
* per-document work (position explode, coverage distinct, token
  filter) is bounded by document length and partitions by doc id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def positional_ngram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, pos, g): md5 of each word n-gram with its 1-based start
    token position. Docs shorter than ``n`` tokens emit no rows (the
    ``F.sequence`` descending-on-stop<1 guard from ``decontaminate``).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = _tokens(text_col)
    last = F.size(toks) - (n - 1)
    idx = F.when(last >= 1, F.sequence(F.lit(1), last)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx, lambda i: F.md5(F.array_join(F.slice(toks, i, n), " "))
    )
    return df.select(
        F.col(id_col), F.posexplode(grams).alias("p0", "g")
    ).select(id_col, (F.col("p0") + 1).alias("pos"), "g")


def _duplicated_positions(
    df: DataFrame, id_col: str, text_col: str, n: int, min_occurrences: int
) -> DataFrame:
    """(id, pos) of every positional n-gram whose hash occurs >=
    min_occurrences times corpus-wide (within-doc repeats count)."""
    if min_occurrences < 2:
        raise ValueError("min_occurrences must be >= 2")
    pg = positional_ngram_hashes(df, id_col, text_col, n)
    dup_grams = (
        pg.groupBy("g")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= min_occurrences)
        .select("g")
    )
    return pg.join(dup_grams, "g").select(id_col, "pos")


def duplicated_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """Per-doc duplication profile: (id, n_tokens, n_grams,
    n_dup_grams, dup_tokens, dup_ratio).

    ``dup_tokens`` counts distinct token positions covered by at least
    one duplicated n-gram; ``dup_ratio`` = dup_tokens / n_tokens — the
    triage signal (Lee et al. drop or trim documents above a
    threshold). A doc with no duplicated grams gets zeros, not null.
    """
    dup = _duplicated_positions(df, id_col, text_col, n, min_occurrences)
    cov = (
        dup.select(
            id_col, F.explode(F.sequence("pos", F.col("pos") + (n - 1))).alias("tp")
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.count("*").alias("dup_tokens"))
    )
    ndup = dup.groupBy(id_col).agg(F.count("*").alias("n_dup_grams"))
    n_tokens = F.size(_tokens(text_col))
    base = df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.greatest(n_tokens - (n - 1), F.lit(0)).cast("long").alias("n_grams"),
    )
    return (
        base.join(ndup, id_col, "left")
        .join(cov, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
            F.coalesce("dup_tokens", F.lit(0)).alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens"),
                6,
            ).alias("dup_ratio"),
        )
    )


def scrub_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_occurrences: int = 2,
) -> DataFrame:
    """(id, clean_text): the normalized token stream with every
    duplicated-span-covered token removed, re-joined with single
    spaces (Lee et al.'s substring removal at n-token granularity —
    a doc that is entirely boilerplate scrubs to '').

    The covered-position set is collected per document (bounded by
    document length — the same per-row bound as the token arrays
    themselves), then the original token array is filtered by index;
    no corpus-wide state reaches the driver.
    """
    dup = _duplicated_positions(df, id_col, text_col, n, min_occurrences)
    cov = (
        dup.select(
            id_col, F.explode(F.sequence("pos", F.col("pos") + (n - 1))).alias("tp")
        )
        .groupBy(id_col)
        .agg(F.collect_set("tp").alias("_cov"))
    )
    toks = _tokens(text_col)
    return (
        df.join(cov, id_col, "left")
        .select(
            F.col(id_col),
            F.array_join(
                F.filter(
                    toks,
                    lambda t, i: ~F.array_contains(
                        F.coalesce(F.col("_cov"), F.array().cast("array<int>")),
                        i + 1,
                    ),
                ),
                " ",
            ).alias("clean_text"),
        )
    )
