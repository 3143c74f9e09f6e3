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


def rank_eval(
    rankings: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rk",
) -> DataFrame:
    """Per-query reciprocal rank + average precision at ``k`` — the
    multi-query members of the retrieval-evaluation family (ndcg_eval
    grades ONE graded ranking; MRR/MAP are THE binary multi-query
    standards, and their corpus means are one trivial aggregation over
    this frame).

    Inputs: ``rankings`` (query_id, doc_id, rk with rk starting at 1
    per query) and binary ``qrels`` (query_id, doc_id) — presence means
    relevant. Output one row per ranked query: (query_id, n_ranked,
    n_rel, first_rel_rank, rr, ap) where rr = 1/first_rel_rank and
    ap = (Σ_{relevant hit at position p ≤ k} hits_up_to_p / p)
    / min(n_rel, k). A query whose ranking hits nothing relevant gets
    rr/ap NULL-free zeros only when it HAS relevant docs to find
    (n_rel > 0); a query with no qrels rows at all is emitted with
    first_rel_rank/rr/ap NULL (undefined, excluded from a mean by the
    caller) — never a fake 0 that would drag MAP down for an
    unjudged query.

    Numeric determinism (the eval_triples discipline): every AP term
    hits_p/p is scaled by L = lcm(1..k) so the numerator
    Σ hits_p·(L/p) is an EXACT bigint (k ≤ 20 keeps every product and
    sum far inside int64); rr and ap are each ONE double division of
    two integers, round-6 — bit-identical on any IEEE-754 engine.

    Scale shape: the ranking side is ≤ k rows per query by
    construction (the rankers cut top-k); one (query,doc) equi-join
    against qrels, one query-keyed window over ≤ k rows, one keyed
    aggregation — a single hash exchange on query_id end to end.
    """
    if not 1 <= k <= 20:
        raise ValueError("k must be in [1, 20] (lcm-exact arithmetic)")
    lcm = 1
    for i in range(2, k + 1):
        g, a, b = 1, lcm, i
        while b:
            a, b = b, a % b
        lcm = lcm * i // a

    from pyspark.sql import Window

    r = rankings.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(rank_col).cast("long").alias("pos"),
    ).filter(F.col("pos") <= k)
    q = qrels.select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.lit(1).alias("_rel"),
    ).distinct()

    n_rel = q.groupBy("query_id").agg(F.count("*").alias("n_rel"))

    j = r.join(q, ["query_id", "doc_id"], "left")
    w = Window.partitionBy("query_id").orderBy("pos")
    # hits_up_to_p over relevant rows only; irrelevant rows contribute 0
    hits = j.withColumn(
        "_hits", F.sum(F.coalesce(F.col("_rel"), F.lit(0))).over(w)
    )
    per_q = hits.groupBy("query_id").agg(
        F.count("*").alias("n_ranked"),
        F.min(F.when(F.col("_rel").isNotNull(), F.col("pos"))).alias(
            "first_rel_rank"
        ),
        # L/pos is an exact integer for pos <= k (L = lcm(1..k)); the
        # double division of two exact ints whose true quotient is an
        # int is correctly rounded to that int, then cast back.
        F.sum(
            F.when(
                F.col("_rel").isNotNull(),
                (F.col("_hits") * (F.lit(lcm) / F.col("pos")).cast("long")),
            ).otherwise(F.lit(0))
        ).alias("_ap_num"),
    )
    out = per_q.join(n_rel, "query_id", "left").na.fill({"n_rel": 0})
    den = F.lit(lcm) * F.least(F.col("n_rel"), F.lit(k))
    return out.select(
        "query_id",
        F.col("n_ranked").cast("long").alias("n_ranked"),
        F.col("n_rel").cast("long").alias("n_rel"),
        F.col("first_rel_rank").cast("long").alias("first_rel_rank"),
        F.when(
            F.col("first_rel_rank").isNotNull(),
            F.round(F.lit(1.0) / F.col("first_rel_rank"), 6),
        )
        .when(F.col("n_rel") > 0, F.lit(0.0))
        .alias("rr"),
        F.when(
            F.col("n_rel") > 0,
            F.round(F.col("_ap_num").cast("double") / den.cast("double"), 6),
        ).alias("ap"),
    )
