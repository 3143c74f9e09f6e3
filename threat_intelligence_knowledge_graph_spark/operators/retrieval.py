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


def ndcg_eval(
    ranking: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    rank_col: str = "rk",
    rel_col: str = "rel",
) -> DataFrame:
    """One-row NDCG@k (Järvelin & Kekäläinen, TOIS'02) of a produced
    ``ranking`` (id, rank) against graded ``relevance`` (id, rel >= 0
    integer grades) — the ranking-quality member of the evaluation
    family next to eval_triple_pr's extraction P/R: DCG@k =
    Σ_{pos<=k} (2^rel − 1)/log2(pos+1), IDCG@k the same sum over the
    top-k of the relevance pool ordered (rel DESC, id ASC), ndcg =
    dcg/idcg.

    Determinism: rel grades are exact integers so 2^rel − 1 is exact;
    the only float ops are the log2 divisions and two bounded sums
    (<= k terms each, round-6 after the division). Unranked-but-
    relevant docs count against the score through IDCG only — the
    standard convention. IDCG = 0 (no relevant docs anywhere) yields
    ndcg NULL, never a fake 0/0.

    Scale shape: the ranking side is <= k rows by construction; the
    ideal side is ``orderBy().limit(k)`` over the relevance pool —
    TakeOrderedAndProject, never a global sort; the final combine is
    a 1-row × 1-row cross join.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    gain = (F.pow(F.lit(2.0), F.col(rel_col)) - F.lit(1.0)) / F.log2(
        F.col("_pos") + F.lit(1.0)
    )
    dcg = (
        ranking.filter(F.col(rank_col) <= k)
        .select(F.col(id_col), F.col(rank_col).cast("double").alias("_pos"))
        .join(relevance.select(id_col, rel_col), id_col, "left")
        .fillna({rel_col: 0})
        .select(gain.alias("_g"))
        .agg(F.coalesce(F.sum("_g"), F.lit(0.0)).alias("_dcg"))
    )
    from pyspark.sql import Window

    ideal_top = (
        relevance.filter(F.col(rel_col) > 0)
        .orderBy(F.col(rel_col).desc(), F.col(id_col).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col(rel_col).desc(), F.col(id_col).asc())
    idcg = (
        ideal_top.withColumn("_pos", F.row_number().over(w).cast("double"))
        .select(gain.alias("_g"))
        .agg(F.coalesce(F.sum("_g"), F.lit(0.0)).alias("_idcg"))
    )
    return (
        dcg.crossJoin(idcg)
        .select(
            F.lit(k).cast("int").alias("k"),
            F.round(F.col("_dcg"), 6).alias("dcg"),
            F.round(F.col("_idcg"), 6).alias("idcg"),
            F.when(
                F.col("_idcg") > 0, F.round(F.col("_dcg") / F.col("_idcg"), 6)
            ).alias("ndcg"),
        )
    )
