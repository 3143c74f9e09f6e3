"""Embedding clustering — integer-exact Lloyd k-means.

The IVF ANN path (``similarity.py::ivf_topk``) needs a coarse
quantizer; dataset curation needs topic-ish grouping for mixture
balancing. Both want k-means — but naive float k-means is
IRREPRODUCIBLE on a cluster: centroid sums change with partition
order, so two runs (or two engines) drift to different assignments.

This variant is deterministic by construction, the same trick as the
SQ8 ANN quantizer (``similarity.py``): components are quantized to
integers once (floor(x·scale + 0.5) — exact and identical in every
engine), so distance sums and centroid sums are INTEGER arithmetic
(order-independent), and centroid updates floor the mean back to the
integer grid. Seeds are the k smallest ids — no RNG. Every step is a
pure function of (input, k, scale, iterations): rerun it on any
engine, any partitioning, and the assignment is bit-identical, which
is what makes it ORACLE-able and what makes an IVF index rebuilt on a
different cluster layout serve identical buckets.

Shape at 100 TB: points explode to (id, dim, q) once; each Lloyd
round is one broadcast-sized centroid join (k·dim rows) + two
map-side-combining aggs — no all-pairs stage, no driver-side loop
over data (the iteration count is a fixed small constant). The
quantization error is bounded by dim/(2·scale)² per squared distance
— irrelevant for bucketing/grouping semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def kmeans_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 2,
    scale: int = 1024,
    return_centroids: bool = False,
) -> DataFrame:
    """(id, cluster): Lloyd k-means assignment after ``iterations``
    synchronous rounds on the integer grid. With
    ``return_centroids=True`` returns ``(assign, codebook)`` where
    codebook is the (cluster, d, cq) centroid table USED by the final
    assignment round (0-based dimension index on the quantized grid) —
    what a product-quantization encoder needs to build ADC lookup
    tables against the same codes.

    - quantize: q_d = floor(x_d · scale + 0.5) (exact, engine-identical)
    - seed: centroid j = the point with the (j+1)-th smallest id among
      rows that HAVE components (NULL or empty vectors carry no
      position and are excluded from seeding and output alike)
    - assign: argmin_j Σ_d (q_d − c_jd)², ties → smallest j
    - update: c_jd = floor(mean of members' q_d); an emptied cluster
      keeps its previous centroid (classic Lloyd convention); the
      final round assigns only (its update would be dead work)

    All sums are integer (order-independent); the only float op is the
    exactly-representable double division inside the floored mean.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if scale < 1:
        raise ValueError("scale must be >= 1")

    pts = (
        emb.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.posexplode(vec_col).alias("_d", "_x"),
        )
        .select(
            "_id",
            "_d",
            F.floor(F.col("_x").cast("double") * scale + F.lit(0.5))
            .cast("long")
            .alias("_q"),
        )
    )
    pts = pts.localCheckpoint(eager=True)

    # Seeds come FROM the exploded points (not the raw table) so a
    # non-NULL empty vector can neither occupy a seed slot nor desync
    # the assignment from the dimension-join universe.
    seed_ids = pts.select("_id").distinct().orderBy("_id").limit(k)
    seeds = seed_ids.select(
        "_id",
        (F.row_number().over(Window.orderBy("_id")) - 1).alias("_c"),
    )
    centroids = (
        seeds.join(pts, "_id")
        .select(F.col("_c").alias("cluster"), "_d", F.col("_q").alias("_cq"))
    )

    assign = None
    for it in range(iterations):
        dist = (
            pts.join(F.broadcast(centroids), "_d")
            .groupBy("_id", "cluster")
            .agg(
                F.sum(
                    (F.col("_q") - F.col("_cq")) * (F.col("_q") - F.col("_cq"))
                ).alias("_dist")
            )
        )
        assign = (
            dist.groupBy("_id")
            .agg(F.min(F.struct("_dist", "cluster")).alias("_best"))
            .select("_id", F.col("_best.cluster").alias("cluster"))
        )
        if it == iterations - 1:
            break  # the last round only assigns; its update is unused
        new_centroids = (
            assign.join(pts, "_id")
            .groupBy("cluster", "_d")
            .agg(
                F.floor(
                    F.sum("_q").cast("double") / F.count("*").cast("double")
                )
                .cast("long")
                .alias("_cq")
            )
        )
        # emptied clusters keep their previous centroid
        centroids = new_centroids.unionByName(
            centroids.join(
                new_centroids.select("cluster").distinct(),
                "cluster",
                "left_anti",
            )
        ).localCheckpoint(eager=True)

    result = assign.select(
        F.col("_id").alias(id_col), F.col("cluster").cast("long").alias("cluster")
    )
    if return_centroids:
        codebook = centroids.select(
            F.col("cluster").cast("long").alias("cluster"),
            F.col("_d").alias("d"),
            F.col("_cq").alias("cq"),
        )
        return result, codebook
    return result


def cluster_sizes(assign: DataFrame) -> DataFrame:
    """(cluster, n_members): one count-agg over an assignment."""
    return assign.groupBy("cluster").agg(F.count("*").alias("n_members"))


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 2,
    scale: int = 1024,
    threshold: float = 0.95,
    max_cluster_size: int = 10_000,
    return_dropped: bool = False,
):
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embeddings with the deterministic
    integer-grid k-means above, then compare pairs ONLY within a
    cluster and drop every row that has a smaller-id cluster-mate with
    rounded cosine >= ``threshold``.

    Returns ``(id, cluster, kept)`` — one row per assigned input row
    (NULL vectors are excluded by ``kmeans_assign`` itself). With
    ``return_dropped=True`` returns ``(result, dropped_clusters)``
    where ``dropped_clusters`` lists clusters whose size exceeded
    ``max_cluster_size`` and were therefore excluded from pairing
    (their rows come through ``kept=true``) — the repo's no-silent-
    truncation rule: a degenerate corpus that collapses into one giant
    cluster surfaces in the report instead of hiding an O(n²) join.

    Survivor policy is PER-PAIR greedy min-id retention — a row is
    dropped iff ANY smaller-id row of its cluster clears the
    threshold, dropped rows included as blockers — not the
    transitive-closure connected-components policy of
    ``similarity.embedding_dedup``. The greedy predicate is exactly
    SQL-expressible (one EXISTS over the in-cluster pair join), which
    is what makes the op DuckDB-oracle-able on real float data; the
    cosine is rounded (3) before thresholding so the flag is
    engine-deterministic (same technique as
    ``decontaminate.embedding_decontaminate``). Zero-norm vectors have
    no defined cosine: they are clustered but never paired, so they
    are always kept.

    Scale shape (the SemDeDup point): the all-pairs work of
    ``embedding_near_duplicates`` is replaced by k independent
    in-cluster joins — choose k ~ n/target_cluster_size so each
    cluster is bounded, and the pair join is a (cluster)-keyed
    equi-join over capped groups. Per Lloyd round the only data
    movement is one broadcast of k·dim centroid rows plus two
    map-side-combining aggs; the pair stage shuffles skinny
    (cluster, id) rows and fetches vectors only for in-cluster pairs.
    """
    from .similarity import _dot, _norm

    assign = kmeans_assign(emb, id_col, vec_col, k, iterations, scale)
    v = F.col("_v")
    vecs = assign.join(
        emb.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ),
        id_col,
    ).select(
        id_col,
        "cluster",
        "_v",
        (_norm(v) > 0).alias("_scorable"),
    )
    sizes = cluster_sizes(assign)
    dropped = sizes.filter(F.col("n_members") > max_cluster_size)
    ok = sizes.filter(F.col("n_members") <= max_cluster_size).select("cluster")
    pairable = vecs.filter("_scorable").join(ok, "cluster")
    left = pairable.select(
        "cluster", F.col(id_col).alias("_a"), F.col("_v").alias("_va")
    )
    right = pairable.select(
        "cluster", F.col(id_col).alias("_b"), F.col("_v").alias("_vb")
    )
    va, vb = F.col("_va"), F.col("_vb")
    blocked = (
        left.join(right, "cluster")
        .filter(F.col("_a") < F.col("_b"))
        .filter(
            F.round(_dot(va, vb) / (_norm(va) * _norm(vb)), 3)
            >= F.lit(float(threshold))
        )
        .select(F.col("_b").alias(id_col))
        .distinct()
        .withColumn("_blk", F.lit(True))
    )
    result = vecs.join(blocked, id_col, "left").select(
        id_col,
        "cluster",
        F.coalesce(~F.col("_blk"), F.lit(True)).alias("kept"),
    )
    return (result, dropped) if return_dropped else result


def cluster_balanced_sample(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    iterations: int = 2,
    scale: int = 1024,
    per_cluster: int = 10,
    salt: str = "cbal",
) -> DataFrame:
    """Diversity-balanced subset: at most ``per_cluster`` rows from
    each k-means cluster, drawn by deterministic md5 priority — the
    embedding-space analog of source-mixture water-filling
    (``packing.mixture_sample``): a corpus dominated by one semantic
    mode (press releases, boilerplate advisories) contributes at most
    its quota, so the sample covers the embedding space instead of
    replaying its density. The standard cheap proxy for
    facility-location/coreset selection at corpus scale.

    (id, cluster, draw_rank): draw_rank is the md5-priority position
    within the cluster (1-based); rows with rank ≤ quota survive.
    Clusters smaller than the quota contribute everything — by design
    (rare modes are what balancing protects), count the output per
    cluster to see which were exhausted. Changing ``salt`` redraws.

    Determinism: the k-means assignment is the integer-grid
    :func:`kmeans_assign` (bit-identical on any engine/partitioning);
    the draw priority is the exact-decimal ``_md5_u64`` with id
    tiebreak — no RNG, no partition dependence anywhere.

    Scale shape: kmeans_assign's bounded-iteration joins, then ONE
    cluster-keyed window. k is dimension-sized, so the window
    partitions are big but few — for huge clusters swap the
    row_number for the sampled-boundary TeraSort rank (the
    sorted-neighborhood machinery) to avoid a single hot partition.
    """
    from .packing import _md5_u64

    if per_cluster < 1:
        raise ValueError("per_cluster must be >= 1")
    assign = kmeans_assign(
        emb, id_col=id_col, vec_col=vec_col, k=k,
        iterations=iterations, scale=scale,
    )
    w = Window.partitionBy("cluster").orderBy(
        _md5_u64(id_col, salt).asc(), F.col(id_col).asc()
    )
    return (
        assign.withColumn("draw_rank", F.row_number().over(w))
        .filter(F.col("draw_rank") <= per_cluster)
        .select(
            id_col,
            F.col("cluster").cast("long").alias("cluster"),
            F.col("draw_rank").cast("int").alias("draw_rank"),
        )
    )
