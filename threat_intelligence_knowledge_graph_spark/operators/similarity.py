"""Similarity search over an embedding column (``array<float>``).

Baseline: brute-force cosine top-k — a single narrow scan with a JVM-side
``aggregate``/``zip_with`` dot product and ``TakeOrderedAndProject`` (no
global sort, no UDF). Scale path: hyperplane-LSH bucketing — sign-bit
signatures against a deterministic, seed-derived plane set; candidates
are restricted to the query's bucket (multi-probe over 1-bit flips), so
the per-query work drops from O(N) to O(N / 2^bits · probes).

An IVF-style variant assigns vectors to nearest of C sampled centroids
with one Arrow-batched numpy matmul per batch (BLAS — the legitimate use
of a pandas kernel), probing P nearest centroids at query time.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def with_cosine(embeddings: DataFrame, query_vec: list[float], vec_col: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(query_vec))
    return embeddings.withColumn(
        "cosine",
        _dot(F.col(vec_col).cast("array<double>"), q) / (_norm(F.col(vec_col).cast("array<double>")) * F.lit(qn)),
    )


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: narrow map + TakeOrderedAndProject."""
    return (
        with_cosine(embeddings, query_vec, vec_col)
        .select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Hyperplane LSH
# ---------------------------------------------------------------------------

def _planes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def hyperplane_signatures(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) — sign-bit signature against seeded random planes.

    Planes are literal arrays (broadcast with the plan); the signature is
    a pure Catalyst fold, no Python at scan time.
    """
    return embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        _band_bucket_expr(dim, n_planes, seed, vec_col).alias("bucket"),
    )


def query_bucket(query_vec: list[float], n_planes: int = 8, seed: int = 7) -> int:
    planes = _planes(len(query_vec), n_planes, seed)
    signs = planes @ np.asarray(query_vec, dtype=np.float64) > 0
    return int(sum(1 << i for i, s in enumerate(signs) if s))


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 7,
    probes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search the query's bucket plus ``probes``
    one-bit-flip neighbor buckets (multi-probe LSH)."""
    qb = query_bucket(query_vec, n_planes, seed)
    candidates = [qb] + [qb ^ (1 << i) for i in range(min(probes, n_planes))]
    sigs = hyperplane_signatures(
        embeddings, len(query_vec), n_planes, seed, id_col, vec_col
    )
    return (
        with_cosine(
            sigs.filter(F.col("bucket").isin(candidates)), query_vec, vec_col
        )
        .select(id_col, "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF-style partitioned index
# ---------------------------------------------------------------------------

def sample_centroids(
    embeddings: DataFrame, n_centroids: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """Deterministic centroid sample: the n vectors with smallest
    ``xxhash64(id)`` — stable under partitioning, no RNG on data."""
    rows = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .withColumn("_h", F.xxhash64(F.col(id_col).cast("string")))
        .orderBy("_h")
        .limit(n_centroids)
        .collect()
    )
    return np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)


def assign_centroids(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id) via one numpy matmul per Arrow batch."""
    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    schema = StructType(
        [StructField("vec_id", LongType()), StructField("centroid_id", IntegerType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            best = (mat @ c.T).argmax(axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf[id_col].values, "centroid_id": best})

    return embeddings.select(id_col, vec_col).mapInPandas(kernel, schema)


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    assignments: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the ``n_probe`` centroids nearest the query; exact cosine
    within the probed partitions."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(cn @ qn))[:n_probe].tolist()
    cand = assignments.filter(F.col("centroid_id").isin([int(p) for p in probe]))
    subset = embeddings.join(cand.select(id_col), id_col, "left_semi")
    return brute_force_topk(subset, query_vec, k, id_col, vec_col)


def _band_bucket_expr(dim: int, n_planes: int, seed: int, vec_col: str):
    """Catalyst expression for one band's sign-bit bucket."""
    planes = _planes(dim, n_planes, seed)
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(_dot(v, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def embedding_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    bands: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Remove embedding near-duplicates: cluster verified pairs with
    connected components, keep the min id per cluster (the same survivor
    policy as ``minhash_dedup`` — deterministic and join-free)."""
    from .minhash import connected_components

    pairs = embedding_near_duplicates(
        embeddings, threshold, n_planes, bands, seed, id_col, vec_col, dim
    )
    components = connected_components(pairs.select("a", "b"))
    drop = components.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return embeddings.join(drop, id_col, "left_anti")


def embedding_candidate_pairs(
    banded: DataFrame, id_col: str = "vec_id", max_bucket_size: int = 1024
) -> tuple[DataFrame, DataFrame]:
    """Self-join within (band, bucket) → candidate pairs (a < b).

    Returns (pairs, dropped_buckets). A degenerate bucket — a mass of
    near-identical or all-zero vectors, exactly what a real embedding
    corpus contains — would otherwise create O(n²) rows on one key; the
    same cap + dropped-bucket reporting as the MinHash path
    (minhash.lsh_candidate_pairs). Dropping a band's bucket only reduces
    RECALL for pairs seen in no other band; it never admits a false pair
    (verification is exact cosine downstream).
    """
    sized = banded.groupBy("band", "bucket").agg(F.count("*").alias("bucket_size"))
    ok = sized.filter(F.col("bucket_size") <= max_bucket_size)
    dropped = sized.filter(F.col("bucket_size") > max_bucket_size)
    bucketed = banded.join(ok.select("band", "bucket"), ["band", "bucket"])
    left = bucketed.select("band", "bucket", F.col(id_col).alias("a"))
    right = bucketed.select("band", "bucket", F.col(id_col).alias("b"))
    pairs = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return pairs, dropped


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    bands: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_bucket_size: int = 1024,
    return_dropped: bool = False,
) -> DataFrame:
    """(a, b, cosine) pairs with cosine ≥ threshold.

    ``return_dropped=True`` returns ``(pairs, dropped_buckets)`` so the
    caller can observe recall lost to the bucket cap (the "no silent
    caps" rule — a degenerate corpus can exceed ``max_bucket_size`` in
    every band, and those pairs are then only found if another band
    catches them).

    Banded hyperplane LSH: ``bands`` independent plane sets; a pair is a
    candidate if it agrees on ANY band's full signature. A single
    signature would miss most qualifying pairs — at cosine 0.95 a pair
    agrees on one 8-bit signature with p≈0.43, but misses all 8 bands
    with p≈(1-0.43)^8 ≈ 1% (the same banding math the MinHash path uses).

    Scale shape: ONE scan of the input computes every band's bucket in a
    single projection (an ``explode`` over per-band structs), so the only
    per-band cost is the (band, bucket)-keyed self-join on skinny
    (band, bucket, id) rows — capped at ``max_bucket_size`` per bucket
    (see ``embedding_candidate_pairs``); verification joins the sparse
    candidate pairs back to the vectors. Pass ``dim`` when known to skip
    the driver-side dimension probe job.
    """
    if dim is None:
        dim = int(embeddings.select(F.size(vec_col).alias("d")).first()["d"])
    banded = embeddings.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        _band_bucket_expr(
                            dim, n_planes, seed + band * 1009, vec_col
                        ).alias("bucket"),
                    )
                    for band in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")
    candidates, dropped = embedding_candidate_pairs(banded, id_col, max_bucket_size)
    va_df = embeddings.select(
        F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va")
    )
    vb_df = embeddings.select(
        F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("vb")
    )
    va, vb = F.col("va"), F.col("vb")
    pairs = (
        candidates.join(va_df, "a")
        .join(vb_df, "b")
        .withColumn("cosine", _dot(va, vb) / (_norm(va) * _norm(vb)))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )
    return (pairs, dropped) if return_dropped else pairs


def batch_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    round_digits: int = 3,
) -> DataFrame:
    """(query_id, vec_id, cosine): exact cosine top-k over the corpus
    for EVERY query vector — the ANN-join shape (cross-corpus retrieval
    / dedup against a probe set) with a broadcast query side.

    One plan: corpus × broadcast(queries) (the |Q|·|corpus| score
    matrix IS the exact-search cost), then a per-query row_number
    window over (rounded cosine DESC, corpus id). Ranking on the
    ROUNDED cosine — not the raw double — keeps the top-k membership
    engine-portable (ulp-level summation differences cannot reorder
    candidates that agree at ``round_digits``). For query sets too big
    to broadcast, generate candidates with the LSH/IVF paths first and
    score only candidates.

    Zero-norm vectors (all-zero embeddings) have no defined cosine —
    0/0 is NaN in Spark and NaN/NULL in DuckDB, and NaN sorts LARGEST
    under DESC, so unguarded they'd occupy top-k slots with
    engine-divergent ordering. Both sides filter ``norm > 0`` before
    scoring (mirrored in the SQL oracle).
    """
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv")
    ).filter(_norm(F.col("_qv")) > 0)
    v = F.col(vec_col).cast("array<double>")
    scored = embeddings.filter(_norm(v) > 0).crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(
            _dot(v, F.col("_qv")) / (_norm(v) * _norm(F.col("_qv"))),
            round_digits,
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, id_col, "cosine")
    )


# ---------------------------------------------------------------------------
# Scalar quantization (int8) ANN
# ---------------------------------------------------------------------------

def _quant_expr(arr, r: float):
    """clamp(floor(x·r + 0.5), ±127) over an array<double> Column —
    the ONE quantization expression both ``quantize_embeddings`` and
    ``sq_topk``'s candidate scan derive from (and the DuckDB oracle
    mirrors); change the scheme here or nowhere."""
    return F.transform(
        arr,
        lambda x: F.greatest(
            F.lit(-127).cast("bigint"),
            F.least(F.lit(127).cast("bigint"), F.floor(x * F.lit(r) + F.lit(0.5))),
        ),
    )


def quantize_embeddings(
    embeddings: DataFrame,
    scale: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, qvec): symmetric int8 scalar quantization — q_i =
    clamp(floor(x_i · 127/s + 0.5), ±127) with a single corpus-wide
    scale ``s`` (max |component|). The FAISS ``SQ8`` idea: 4× smaller
    vectors (8× vs doubles), integer dot products, exact arithmetic —
    the quantized representation and every derived score are
    bit-identical across engines (floor/mult are exactly-rounded).
    """
    if scale <= 0:
        raise ValueError("scale must be > 0")
    r = 127.0 / scale
    v = F.col(vec_col).cast("array<double>")
    return embeddings.select(F.col(id_col), _quant_expr(v, r).alias("qvec"))


def corpus_scale(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> float:
    """max |component| over the corpus — the shared quantization scale
    (one scan, ONE bounded 1-row collect; max is order-independent, so
    the value is exact and engine-identical)."""
    v = F.col(vec_col).cast("array<double>")
    row = embeddings.select(
        F.max(F.array_max(F.transform(v, lambda x: F.abs(x)))).alias("s")
    ).first()
    if row["s"] is None:
        raise ValueError(
            "corpus_scale: no vectors to quantize (empty corpus or all "
            "rows filtered) — pass an explicit scale or check the input"
        )
    return float(row["s"])


def sq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float | None = None,
) -> DataFrame:
    """Approximate cosine top-k via int8 scalar quantization with exact
    rerank: integer dot products over the quantized corpus pick
    ``k·rerank_factor`` candidates (DESC score, id tiebreak — integer
    arithmetic, so the candidate set is engine-exact), then the
    original float vectors rerank the survivors exactly.

    100 TB shape: the scan that scores candidates touches 1-byte
    components (4× less IO than float32, 8× less than the cast
    doubles), stays in whole-stage codegen, and ends in
    TakeOrderedAndProject; the exact rerank reads only k·rerank_factor
    full vectors. Zero-norm corpus vectors are filtered (cosine
    undefined — the ``batch_topk`` guard).
    """
    if k < 1 or rerank_factor < 1:
        raise ValueError("k and rerank_factor must be >= 1")
    v = F.col(vec_col).cast("array<double>")
    nz = embeddings.filter(_norm(v) > 0)
    if scale is None:
        scale = corpus_scale(nz, vec_col)
    r = 127.0 / scale
    qq = [
        max(-127, min(127, math.floor(float(x) * r + 0.5)))
        for x in query_vec
    ]
    q_arr = F.array(*[F.lit(int(x)).cast("bigint") for x in qq])
    approx = F.aggregate(
        F.zip_with(_quant_expr(v, r), q_arr, lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    cands = (
        nz.withColumn("_aq", approx)
        .orderBy(F.col("_aq").desc(), F.col(id_col))
        .limit(k * rerank_factor)
    )
    return (
        with_cosine(cands, query_vec, vec_col)
        .select(id_col, F.round("cosine", 3).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = 4,
    k_sub: int = 4,
    iterations: int = 2,
    scale: int = 1024,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via product quantization with exact
    rerank — the FAISS IndexPQ / ADC analog (Jégou, Douze, Schmid 2011,
    "Product Quantization for Nearest Neighbor Search"), built
    integer-exact so codes, lookup tables, and the candidate set are
    bit-identical on any engine/run/partitioning:

    - the D dims split into ``m`` subspaces of D/m; each subspace is
      clustered with the deterministic integer-grid Lloyd k-means
      (``clustering.kmeans_assign``, ``k_sub`` centroids), and a
      vector's code is its m per-subspace cluster ids — m small ints
      per vector instead of D floats, the PQ memory win;
    - ADC: the query is quantized on the same integer grid, its
      distance to every centroid precomputed into an m·k_sub-row
      lookup table (integer sums), and a vector's approximate distance
      is the SUM of m table lookups — one broadcast join on
      (sub, code) + one id-keyed agg over the m-rows-per-vector code
      table, never a full-vector scan;
    - candidates = ``k·rerank_factor`` ids by (ADC distance ASC, id)
      via TakeOrderedAndProject; the exact cosine rerank reads only
      those full vectors (the ``sq_topk`` discipline, same rounding
      and tiebreak).

    Codebook training runs m driver-side loop iterations (m is a small
    constant); each is the kmeans broadcast-join round chain over the
    subvector slice. At 100 TB you train the codebooks once on a
    sample, persist (cluster, d, cq), and encode every batch with one
    broadcast join per subspace — the code table is the only thing the
    ANN scan ever reads. Zero-norm corpus vectors are filtered (cosine
    undefined — the ``batch_topk`` guard).
    """
    from .clustering import kmeans_assign

    if k < 1 or rerank_factor < 1:
        raise ValueError("k and rerank_factor must be >= 1")
    if m < 1 or k_sub < 1:
        raise ValueError("m and k_sub must be >= 1")
    d_total = len(query_vec)
    if d_total == 0 or d_total % m != 0:
        raise ValueError("len(query_vec) must be a positive multiple of m")
    dsub = d_total // m
    v = F.col(vec_col).cast("array<double>")
    nz = embeddings.filter(_norm(v) > 0).localCheckpoint(eager=True)

    codes = None
    cents = None
    for s in range(m):
        sub = nz.select(
            F.col(id_col), F.slice(v, s * dsub + 1, dsub).alias("embedding")
        )
        assign, book = kmeans_assign(
            sub,
            id_col=id_col,
            vec_col="embedding",
            k=k_sub,
            iterations=iterations,
            scale=scale,
            return_centroids=True,
        )
        a = assign.withColumn("sub", F.lit(s))
        b = book.withColumn("sub", F.lit(s))
        codes = a if codes is None else codes.unionByName(a)
        cents = b if cents is None else cents.unionByName(b)

    # Quantized query on the same grid (float64 multiply + floor — the
    # identical arithmetic kmeans_assign applies to corpus components).
    qq = [math.floor(float(x) * scale + 0.5) for x in query_vec]
    spark = embeddings.sparkSession
    qdf = spark.createDataFrame(
        [(d // dsub, d % dsub, int(qq[d])) for d in range(d_total)],
        "sub int, d int, qd long",
    )
    lut = (
        cents.join(qdf, ["sub", "d"])
        .groupBy("sub", "cluster")
        .agg(
            F.sum((F.col("qd") - F.col("cq")) * (F.col("qd") - F.col("cq"))).alias(
                "_ad"
            )
        )
    )
    approx = (
        codes.join(F.broadcast(lut), ["sub", "cluster"])
        .groupBy(id_col)
        .agg(F.sum("_ad").alias("_adist"))
    )
    cands = (
        approx.orderBy(F.col("_adist").asc(), F.col(id_col))
        .limit(k * rerank_factor)
        .join(nz.select(id_col, vec_col), id_col)
    )
    return (
        with_cosine(cands, query_vec, vec_col)
        .select(id_col, F.round("cosine", 3).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def mmr_rerank(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    lam: float = 0.3,
    pool: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): select ``k`` results that balance query relevance against
    redundancy with what is already selected —

        mmr(d) = lam * cos(q, d) - (1 - lam) * max_{s in S} cos(d, s)

    (the max over an empty S is 0, so the first pick is the plain
    cosine argmax). The retrieval-diversity pass RAG stacks and
    dedup-aware sampling both want; ties break on the smaller id at
    every step, making the trace deterministic.

    Returns ``(rank, vec_id, cosine, mmr_score)`` — ``mmr_score`` is
    the score the row was selected AT (rank 1's is ``lam * cosine``).

    Scale shape: stage 1 is the distributed exact top-``pool`` cosine
    scan (TakeOrderedAndProject; zero-norm vectors excluded, the
    ADVICE-r4 convention); stage 2 is the inherently-sequential greedy
    selection over the ≤ ``pool`` collected candidates — a BOUNDED
    driver action (pool × k pairwise cosines in plain Python, the
    ``n_centroids``-collect precedent), not a driver loop over the
    corpus. Python mirrors the engine arithmetic exactly: sequential
    dot fold, ``sqrt(sum-of-squares)`` norms, one division — so on
    exact-arithmetic corpora the trace is bit-identical to SQL.
    """
    if k < 1 or pool < k:
        raise ValueError("need k >= 1 and pool >= k")
    cands = (
        with_cosine(embeddings, query_vec, vec_col)
        .filter(_norm(F.col(vec_col).cast("array<double>")) > 0)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>"), "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(pool)
        .collect()
    )

    def cos(a: list[float], b: list[float]) -> float:
        d = 0.0
        sa = 0.0
        sb = 0.0
        for x, y in zip(a, b):
            d += x * y
            sa += x * x
            sb += y * y
        import math

        return d / (math.sqrt(sa) * math.sqrt(sb))

    remaining = [(r[id_col], list(r[vec_col]), float(r["cosine"])) for r in cands]
    selected: list[tuple] = []
    out = []
    while remaining and len(out) < k:
        best = None
        best_score = None
        for item in remaining:
            div = max((cos(item[1], s[1]) for s in selected), default=0.0)
            score = lam * item[2] - (1.0 - lam) * div
            if best is None or score > best_score or (
                score == best_score and item[0] < best[0]
            ):
                best, best_score = item, score
        selected.append(best)
        remaining.remove(best)
        out.append((len(out) + 1, best[0], best[2], best_score))
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        out, schema=f"rank int, {id_col} long, cosine double, mmr_score double"
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive / dual-encoder training data)
# ---------------------------------------------------------------------------

def hard_negatives(
    embeddings: DataFrame,
    pairs: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    pos_id_col: str = "pos_id",
    round_digits: int = 3,
) -> DataFrame:
    """(query_id, pos_id, neg_id, neg_cosine, neg_rank): for each
    labeled (query, positive) retrieval pair, the ``k`` highest-cosine
    corpus vectors that are NEITHER the query's own vector NOR its
    labeled positive — the standard hard-negative mining step that
    turns a positives-only pair table into (anchor, positive, negative)
    triplets for contrastive / dual-encoder training. The near-misses
    ranked just below the positive are exactly the negatives a trained
    retriever most needs to push away.

    Query vectors are resolved from the corpus by ``query_id`` (a pair
    whose query id has no embedding, or a zero-norm query, yields no
    triplets). Ranking is on the ROUNDED cosine (ties → lowest neg id)
    so top-k membership is engine-portable — the ``batch_topk``
    discipline; zero-norm corpus vectors are excluded for the same
    reason.

    100 TB shape: the labeled pair set is training supervision — small
    by construction — so it broadcasts twice (once to resolve query
    vectors, once as the scored probe set) and the corpus streams
    through ONE scan with no shuffle; the per-query window ranks only
    that query's scored candidates. For pair sets too large to
    broadcast, generate candidates with the LSH/IVF paths and score
    candidates only (same contract as ``batch_topk``).
    """
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    q = (
        pairs.select(F.col(query_id_col), F.col(pos_id_col))
        .join(
            F.broadcast(
                embeddings.select(
                    F.col(id_col).alias(query_id_col),
                    F.col(vec_col).cast("array<double>").alias("_qv"),
                )
            ),
            query_id_col,
        )
        .filter(_norm(F.col("_qv")) > 0)
    )
    v = F.col(vec_col).cast("array<double>")
    scored = (
        embeddings.filter(_norm(v) > 0)
        .crossJoin(F.broadcast(q))
        .filter(
            (F.col(id_col) != F.col(query_id_col))
            & (F.col(id_col) != F.col(pos_id_col))
        )
        .select(
            query_id_col,
            pos_id_col,
            F.col(id_col).alias("neg_id"),
            F.round(
                _dot(v, F.col("_qv")) / (_norm(v) * _norm(F.col("_qv"))),
                round_digits,
            ).alias("neg_cosine"),
        )
    )
    w = Window.partitionBy(query_id_col, pos_id_col).orderBy(
        F.desc("neg_cosine"), F.asc("neg_id")
    )
    return (
        scored.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= k)
        .select(query_id_col, pos_id_col, "neg_id", "neg_cosine", "neg_rank")
    )


def mutual_best(
    scores: DataFrame,
    a_col: str = "query_id",
    b_col: str = "vec_id",
    score_col: str = "cosine",
) -> DataFrame:
    """Reciprocal best match over a scored candidate-pair table — the
    high-precision ER/bitext pairing rule (Artetxe & Schwenk's
    margin-family ancestor): a pair survives iff each side is the
    OTHER's top-1 candidate. Input is any (a, b, score) frame from the
    candidate generators (batch_topk, LSH buckets, prefix join); self
    pairs (a = b) are ignored; best-per-side is (score DESC, partner
    ASC) on the already-rounded score — deterministic cross-engine —
    and the output is one row per mutual pair as (a, b, score) with
    a < b.

    Mutuality needs BOTH directions present in ``scores``: candidates
    absent from the table cannot win (exactly the semantics of pruning
    by candidate generation — top-k lists are asymmetric, so a pair is
    emitted only when each member appears in the other's list).

    Scale shape: two per-side row_number windows over the candidate
    table (bounded by the generators, ≤ k rows per side) + ONE keyed
    equi-join of the two top-1 frames on the reversed pair — no
    corpus-sized work at all.
    """
    from pyspark.sql.window import Window

    pairs = scores.filter(F.col(a_col) != F.col(b_col)).select(
        F.col(a_col).alias("_a"),
        F.col(b_col).alias("_b"),
        F.col(score_col).alias("_s"),
    )
    w = Window.partitionBy("_a").orderBy(F.desc("_s"), F.asc("_b"))
    best = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("_a", "_b", "_s")
    )
    rev = best.select(
        F.col("_b").alias("_a"), F.col("_a").alias("_b"), F.col("_s").alias("_s2")
    )
    mutual = best.join(rev, ["_a", "_b"]).filter(F.col("_a") < F.col("_b"))
    return mutual.select(
        F.col("_a").alias(a_col),
        F.col("_b").alias(b_col),
        F.col("_s").alias(score_col),
    )
