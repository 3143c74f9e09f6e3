"""Benchmark decontamination: n-gram overlap against an eval set.

The standard training-data hygiene step (GPT-3 appendix C / PaLM /
Llama data cards): a training document is "contaminated" if it shares
at least one word n-gram with any benchmark/eval item; contaminated
docs are dropped (or flagged) before training. Tokenization here is the
same engine-portable scheme as ``text_quality.token_counts``:
lowercase, trim, split on ``\\s+`` — so the op is exactly
SQL-reproducible and DuckDB-oracle-able.

Scale shape (100 TB corpus, KB-MB eval set): the eval side's distinct
n-grams are tiny (benchmarks are thousands of items), so the join is a
BROADCAST of eval grams against the corpus gram stream — the corpus is
scanned once, never shuffled on the gram key; only the sparse post-join
(doc, eval) hits reach the final aggregation. The corpus gram explode
is pipelined (scan → project → explode → broadcast-probe in one stage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def ngram_set(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gram): the DISTINCT word n-grams of each row's text.

    Guard: ``F.sequence(1, stop)`` generates a DESCENDING sequence when
    ``stop < 1`` (docs shorter than n tokens), so the index sequence is
    emptied explicitly rather than relying on slice bounds.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = _tokens(text_col)
    last = F.size(toks) - (n - 1)
    idx = F.when(last >= 1, F.sequence(F.lit(1), last)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return df.select(
        F.col(id_col), F.explode(grams).alias("gram")
    ).distinct()


def ngram_contamination(
    docs: DataFrame,
    eval_items: DataFrame,
    n: int = 8,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    eval_id: str = "eval_id",
    eval_text: str = "text",
) -> DataFrame:
    """(doc_id, eval_id, shared_ngrams) for every (doc, eval item) pair
    sharing >= 1 word n-gram; docs absent from the result are clean.

    ``eval_items`` is broadcast (benchmark suites are small by
    construction); pick ``n`` high enough that chance collisions are
    negligible (8-13 words in published pipelines — tests use smaller n
    on synthetic short docs).
    """
    dg = ngram_set(docs, doc_id, doc_text, n)
    eg = ngram_set(eval_items, eval_id, eval_text, n)
    return (
        dg.join(F.broadcast(eg), "gram")
        .groupBy(doc_id, eval_id)
        .agg(F.count_distinct("gram").alias("shared_ngrams"))
    )


def decontaminate(
    docs: DataFrame,
    eval_items: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    eval_id: str = "eval_id",
    eval_text: str = "text",
) -> DataFrame:
    """Drop docs sharing >= ``min_shared`` n-grams with ANY eval item
    (left-anti join on the contamination hits)."""
    hits = ngram_contamination(
        docs, eval_items, n, doc_id, doc_text, eval_id, eval_text
    ).filter(F.col("shared_ngrams") >= min_shared)
    return docs.join(hits.select(doc_id).distinct(), doc_id, "left_anti")


def embedding_decontaminate(
    corpus: DataFrame,
    eval_items: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "eval_id",
    eval_vec_col: str = "embedding",
) -> DataFrame:
    """(id, eval_id, cosine, contaminated): each corpus row's nearest
    eval item by cosine and whether it crosses ``threshold`` — the
    EMBEDDING sibling of ``ngram_contamination`` (catches paraphrased /
    reworded benchmark leakage that shares no exact n-gram, the reason
    modern data cards run both checks).

    Scale shape mirrors the n-gram path: the eval set (benchmarks —
    thousands of vectors) BROADCASTS against one corpus scan; per
    corpus row only its argmax survives the window. Cosines are
    ROUNDED (3) before ranking and thresholding, with an eval-id
    tiebreak, so the flag and the reported neighbor are
    engine-deterministic.

    Zero-norm vectors have no defined cosine: zero-norm EVAL items are
    dropped from the probe set; zero-norm CORPUS rows are returned
    unflagged with a NULL neighbor (no silent row loss).
    """
    from pyspark.sql import Window

    from .similarity import _dot, _norm

    cv = F.col(vec_col).cast("array<double>")
    ev = F.col("_ev")
    probes = (
        eval_items.filter(F.col(eval_vec_col).isNotNull())
        .select(
            F.col(eval_id_col).alias("_eid"),
            F.col(eval_vec_col).cast("array<double>").alias("_ev"),
        )
        .filter(_norm(ev) > 0)
    )
    base = corpus.select(
        F.col(id_col), F.col(vec_col),
        (F.col(vec_col).isNotNull() & (_norm(cv) > 0)).alias("_scorable"),
    )
    scored = (
        base.filter("_scorable")
        .crossJoin(F.broadcast(probes))
        .select(
            id_col,
            F.col("_eid"),
            F.round(_dot(cv, ev) / (_norm(cv) * _norm(ev)), 3).alias("_cos"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_cos").desc(), F.col("_eid").asc()
    )
    nearest = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            F.col("_eid").alias("eval_id"),
            F.col("_cos").alias("cosine"),
            (F.col("_cos") >= F.lit(float(threshold))).alias("contaminated"),
        )
    )
    # LEFT join back so zero-norm corpus rows — and every row when the
    # eval set is empty — come through unflagged instead of vanishing.
    return base.select(id_col).join(nearest, id_col, "left").select(
        id_col,
        "eval_id",
        "cosine",
        F.coalesce(F.col("contaminated"), F.lit(False)).alias("contaminated"),
    )
