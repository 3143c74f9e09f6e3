"""Rank fusion for hybrid retrieval — combine independent rankers.

The reference's query surface is single-modality (Cypher over the
stored graph); a training-data / search engine at scale fuses lexical
(BM25), dense (ANN cosine), and graph (PageRank-weighted) rankings of
the same corpus. Reciprocal Rank Fusion (Cormack, Clarke &
Buettcher, SIGIR'09) is the standard score-free combiner: it needs
only each ranker's RANK, so wildly different score scales compose
without calibration.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rk",
    k: int = 60,
    top: int = 20,
) -> DataFrame:
    """Fuse ranked lists by RRF: score(d) = Σ_r 1/(k + rank_r(d)),
    summed over the rankers that returned ``d`` (absent = contributes
    0, the standard convention). Returns the fused top-``top`` as
    (id, score, rk).

    Determinism: each contribution is the single division
    ``1.0/(k + rank)`` with integer operands; the per-doc sum (≤ the
    number of rankers, each term ≤ 1/61) is rounded to 6 BEFORE the
    (score DESC, id ASC) rank, so both engines pick identical rows.

    Scale shape: a union of the (already small) per-ranker top lists,
    one keyed aggregation, then TakeOrderedAndProject via
    orderBy().limit() — the fused window only ever sees ``top`` rows.
    The rankers themselves bound the data: fusion never rescans the
    corpus.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    parts = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(k) + F.col(rank_col))).alias("_c"),
        )
        for r in rankings
    ]
    contrib = reduce(DataFrame.unionAll, parts)
    scored = contrib.groupBy(id_col).agg(F.round(F.sum("_c"), 6).alias("score"))
    fused = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(top)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return fused.withColumn("rk", F.row_number().over(w).cast("int"))
