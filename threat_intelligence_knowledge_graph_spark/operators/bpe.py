"""Distributed BPE tokenizer training + application.

The reference costs every LLM call in tokens (``evaluation/
model_evaluation.py:105-124`` assumes 4 chars/token); a corpus-scale
pipeline that *trains* the tokenizer needs the classic byte-pair-
encoding merge loop (Sennrich et al. 2016) as a distributed job: count
adjacent symbol pairs over the word vocabulary, merge the most frequent
pair everywhere, repeat k times.

Spark-first shape (the map-reduce BPE used by SentencePiece-style
trainers):

- ONE corpus scan builds the word→freq vocabulary (groupBy absorbs the
  Zipf head map-side); every later iteration touches only the DISTINCT
  word vocabulary — Heaps' law makes that orders of magnitude smaller
  than the corpus, which is what lets 100 TB of text train in k small
  shuffles instead of k corpus passes.
- Per iteration: explode adjacent pairs → ONE map-side-combining sum →
  a **1-row** ``collect()`` for the argmax pair (bounded driver action,
  same budget class as the repo's other 1-row collects) → a pure
  Catalyst ``replace`` projection rewrites every word.
- ``localCheckpoint`` after each rewrite truncates the growing lineage
  (the same fix the iterative graph algorithms use).

Symbol sequences are kept as a delimiter-wrapped string — each token
wrapped in U+001F, tokens concatenated: ``\\x1fh\\x1f\\x1fi\\x1f`` —
so the greedy left-to-right non-overlapping merge of pair (l, r) is
EXACTLY one ``replace(s, '\\x1f l \\x1f\\x1f r \\x1f', '\\x1f lr \\x1f')``:
the per-token double delimiter means adjacent matches never share
characters, and corpus tokens can never contain the delimiter (the
pre-tokenizer is ``[a-z]+``), so cross-boundary false matches are
impossible. That keeps both the Spark plan and the DuckDB oracle on
the engines' native all-occurrence string replace — no per-row Python.

Determinism: pair argmax orders (count DESC, left ASC, right ASC);
both engines compare strings bytewise, and counts are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SEP = "\x1f"
WORD_RE = "[a-z]+"

MERGES_SCHEMA = StructType(
    [
        StructField("step", IntegerType(), False),
        StructField("left_sym", StringType(), False),
        StructField("right_sym", StringType(), False),
        StructField("cnt", LongType(), False),
    ]
)


def _word_vocab(documents: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, s) — s is the delimiter-wrapped char sequence."""
    words = documents.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
        .withColumn("s", F.regexp_replace(F.col("word"), "(.)", SEP + "$1" + SEP))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency (each position
    counts, matching the reference BPE's per-position adjacency)."""
    toks = F.split(F.expr(f"trim(BOTH '{SEP}' FROM s)"), SEP + SEP)
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(1)),
            lambda i: F.struct(
                F.element_at(toks, i.cast("int")).alias("l"),
                F.element_at(toks, (i + F.lit(1)).cast("int")).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        vocab.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def _merge_once(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Apply one merge rule everywhere — a single codegen'd projection."""
    return vocab.withColumn(
        "s",
        F.replace(
            F.col("s"),
            F.lit(SEP + left + SEP + SEP + right + SEP),
            F.lit(SEP + left + right + SEP),
        ),
    )


def train_merges(
    documents: DataFrame,
    k: int = 6,
    text_col: str = "text",
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run ``k`` BPE merge iterations; return (merge rules, final vocab).

    The returned vocab carries the post-merge symbol string ``s`` so
    callers (``bpe_token_counts``) can tokenize without re-training.
    Stops early (fewer than ``k`` rules) if no adjacent pair remains.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    vocab = _word_vocab(documents, text_col).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, k + 1):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        merges.append((step, row["l"], row["r"], int(row["cnt"])))
        # Rewrite + checkpoint: truncate lineage so iteration k's plan
        # doesn't embed k nested replaces over the original scan.
        vocab = _merge_once(vocab, row["l"], row["r"]).localCheckpoint(eager=True)
    return merges, vocab


def bpe_train(
    documents: DataFrame,
    k: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """The learned merge table: (step, left_sym, right_sym, cnt)."""
    merges, vocab = train_merges(documents, k=k, text_col=text_col)
    spark = documents.sparkSession
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_token_counts(
    documents: DataFrame,
    k: int = 6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token statistics under the k-merge BPE trained on
    the same corpus: (doc_id, n_chars, n_tokens, compression) where
    n_chars is the char-level (pre-merge) token count, n_tokens the
    post-merge count, compression = round(n_tokens / n_chars, 6) — the
    fertility signal a data pipeline tracks to budget context windows.

    Docs whose text has no ``[a-z]+`` word are excluded (nothing to
    tokenize — mirrors the INNER join below).

    Scale shape: tokenization reuses the TRAINED VOCAB (distinct words
    only) — per-doc work is a word-count explode joined to the vocab on
    the word key, then one sum agg; the expensive merge loop never
    touches per-document rows.
    """
    _, vocab = train_merges(documents, k=k, text_col=text_col)
    toks = F.split(F.expr(f"trim(BOTH '{SEP}' FROM s)"), SEP + SEP)
    per_word = vocab.select(
        "word",
        F.size(toks).cast("long").alias("n_tok"),
        F.length("word").cast("long").alias("n_chr"),
    )
    doc_words = (
        documents.select(
            F.col(id_col),
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
            ).alias("word"),
        )
        .groupBy(id_col, "word")
        .agg(F.count("*").cast("long").alias("n"))
    )
    joined = doc_words.join(per_word, "word")
    return (
        joined.groupBy(id_col)
        .agg(
            F.sum(F.col("n") * F.col("n_chr")).cast("long").alias("n_chars"),
            F.sum(F.col("n") * F.col("n_tok")).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "compression",
            F.round(F.col("n_tokens") / F.col("n_chars"), 6),
        )
        .select(id_col, "n_chars", "n_tokens", "compression")
    )
