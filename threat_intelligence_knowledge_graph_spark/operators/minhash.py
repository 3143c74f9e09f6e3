"""Reusable MinHash / LSH blocking + connected components — pure DataFrame ops.

The scale path for entity canonicalization (north_star: "salted-key entity
canonicalization via MinHash/LSH blocking plus connected-components
resolution") and for document near-dup dedup. Pattern follows the public
SparkER / pairwise-dedup literature (PAPERS.md): shingle → minhash
signature → band → bucket join → verify → connected components.

Everything is JVM-side Catalyst expressions (``F.hash`` with seed columns,
exploded shingles, hash-aggregations) — no Python UDFs. Bucket-size capping
guards against degenerate LSH buckets (the skew knob); dropped buckets are
reported, never silently ignored.

Connected components uses iterative label propagation (min-label flooding)
with per-iteration ``localCheckpoint`` to truncate lineage. Alias clusters
are small-diameter, so convergence is a handful of iterations; for
adversarial graphs swap in large-star/small-star — the interface is the
same edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def char_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) — distinct character n-grams of lowercase text.

    Expression-only: sequence over offsets + substring + explode.
    """
    norm = F.lower(F.col(text_col))
    offsets = F.sequence(
        F.lit(1), F.greatest(F.length(norm) - F.lit(n - 1), F.lit(1))
    )
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.transform(offsets, lambda i: norm.substr(i, F.lit(n)))
            ).alias("shingle"),
        )
        .filter(F.length("shingle") > 0)
        .distinct()
    )


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) — distinct word n-grams (token shingles for documents)."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    offsets = F.sequence(F.lit(0), F.greatest(F.size(toks) - F.lit(n), F.lit(0)))
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.transform(offsets, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
            ).alias("shingle"),
        )
        .filter(F.length("shingle") > 0)
        .distinct()
    )


def _wide_signatures(shingles: DataFrame, num_hashes: int) -> DataFrame:
    """(_id, _mh0.._mh{n-1}) — every minhash as a parallel min-agg column
    in one map-side-combinable pass over the shingle rows."""
    return shingles.groupBy("_id").agg(
        *[
            F.min(F.hash("shingle", F.lit(s).cast("int"))).alias(f"_mh{s}")
            for s in range(num_hashes)
        ]
    )


def lsh_band_keys(
    shingles: DataFrame, num_hashes: int = 64, bands: int = 16
) -> DataFrame:
    """(id, band, band_key) directly from shingles — the fused fast path.

    One aggregation pass (wide signatures) + a pure projection of per-band
    hashes + an explode to docs×bands skinny rows. Equivalent grouping to
    ``lsh_bands(minhash_signatures(...))`` — band b covers seeds ≡ b (mod
    bands), and two ids share a (band, band_key) iff that band's mh tuple
    hash-matches — but skips materializing docs×num_hashes narrow rows
    and their second shuffle+collect_list aggregation (the dominant cost
    at corpus scale)."""
    wide = _wide_signatures(shingles, num_hashes)
    # band b holds seeds ≡ b (mod bands); with bands > num_hashes the
    # tail bands are seedless — skip them (the narrow path simply
    # produced no rows for them; a zero-arg hash() would throw).
    structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.hash(
                *[F.col(f"_mh{s}") for s in range(num_hashes) if s % bands == b]
            ).alias("band_key"),
        )
        for b in range(min(bands, num_hashes))
    ]
    return wide.select(
        "_id", F.explode(F.array(*structs)).alias("_x")
    ).select("_id", "_x.band", "_x.band_key")


def minhash_signatures(shingles: DataFrame, num_hashes: int = 64) -> DataFrame:
    """(id, seed, mh) — minhash per seed via seeded murmur3.

    All ``num_hashes`` mins are computed as parallel aggregation columns
    in ONE hash-agg pass over the shingle rows (map-side combinable), so
    the shuffle carries one row of ``num_hashes`` ints per id — not the
    ×num_hashes exploded shingle stream a seed-dimension join would feed
    it (64× less shuffle input at 100 TB). The narrow (id, seed, mh)
    shape is rebuilt afterwards by exploding docs×num_hashes rows, which
    is negligible next to the shingle stream. Values are identical to
    the seed-join formulation: ``hash(shingle, seed)`` per seed literal.
    """
    wide = _wide_signatures(shingles, num_hashes)
    return wide.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).cast("int").alias("seed"),
                        F.col(f"_mh{s}").alias("mh"),
                    )
                    for s in range(num_hashes)
                ]
            )
        ).alias("_x"),
    ).select("_id", "_x.seed", "_x.mh")


def lsh_bands(signatures: DataFrame, bands: int = 16) -> DataFrame:
    """(id, band, band_key) — hash each band's minhash sub-signature."""
    return (
        signatures.withColumn("band", F.col("seed") % bands)
        .groupBy("_id", "band")
        .agg(
            F.hash(F.sort_array(F.collect_list(F.struct("seed", "mh")))).alias(
                "band_key"
            )
        )
    )


def lsh_candidate_pairs(
    banded: DataFrame, max_bucket_size: int = 64
) -> tuple[DataFrame, DataFrame]:
    """Self-join within (band, band_key) buckets → candidate pairs (a < b).

    Returns (pairs, dropped_buckets). Buckets larger than
    ``max_bucket_size`` would create O(n²) pairs on one key (LSH skew);
    they are excluded from the join and returned for reporting — the "no
    silent caps" rule.
    """
    sized = banded.groupBy("band", "band_key").agg(F.count("*").alias("bucket_size"))
    ok = sized.filter(F.col("bucket_size") <= max_bucket_size)
    dropped = sized.filter(F.col("bucket_size") > max_bucket_size)
    bucketed = banded.join(ok.select("band", "band_key"), ["band", "band_key"])
    left = bucketed.select("band", "band_key", F.col("_id").alias("a"))
    right = bucketed.select("band", "band_key", F.col("_id").alias("b"))
    pairs = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return pairs, dropped


def jaccard_verify(
    pairs: DataFrame, shingles: DataFrame, threshold: float = 0.7
) -> DataFrame:
    """Exact Jaccard on shingle sets for candidate pairs → (a, b, jaccard).

    Intersection via join on shingle restricted to candidate ids;
    |A∪B| = |A|+|B|−|A∩B|. All hash-aggs + one shuffle on shingle.
    """
    sizes = shingles.groupBy("_id").agg(F.count("*").alias("sz"))
    sa = shingles.withColumnRenamed("_id", "a")
    sb = shingles.withColumnRenamed("_id", "b")
    inter = (
        pairs.join(sa, "a")
        .join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("_id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("_id", "b").withColumnRenamed("sz", "szb"), "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def _star_round(sym: DataFrame) -> DataFrame:
    """One large-star + small-star round (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SOCC'14). Input/output are
    SYMMETRIC distinct edge lists (x, y); output is the contracted graph.

    - large-star(u): hang every neighbor v > u onto m = min(Γ(u) ∪ {u})
    - small-star(u): hang every neighbor v < u, and u itself, onto the
      minimum of the ≤-neighborhood

    Each round is 2 aggregations + 2 joins on the current edge list —
    no per-node Python, no diameter dependence (O(log² n) rounds).
    """
    x, y = F.col("x"), F.col("y")
    # Large-star.
    mins = sym.groupBy("x").agg(F.min("y").alias("mn"))
    mins = mins.select("x", F.least(F.col("mn"), x).alias("m"))
    large = (
        sym.join(mins, "x")
        .filter(y > x)
        .select(y.alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym2 = (
        large.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .union(large.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .distinct()
    )
    # Small-star over the ≤-neighborhood (no self-loops, so strictly <).
    dn = sym2.filter(y < x)
    dmin = dn.groupBy("x").agg(F.min("y").alias("mn"))
    hang_nbrs = (
        dn.join(dmin, "x")
        .select(y.alias("a"), F.col("mn").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    hang_self = dmin.select(F.col("x").alias("a"), F.col("mn").alias("b"))
    small = hang_nbrs.union(hang_self).distinct()
    return (
        small.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .union(small.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .distinct()
    )


def connected_components_star(
    edges: DataFrame, max_rounds: int = 60
) -> DataFrame:
    """(id, component) via alternating large-star/small-star contraction.

    Diameter-independent: converges in O(log² n) rounds even on a path
    graph that defeats min-label propagation's O(diameter) bound. At
    convergence the edge set is a union of stars rooted at each
    component's minimum id.
    """
    sym = (
        edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .union(edges.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        new_sym = _star_round(sym).localCheckpoint(eager=True)
        changed = (
            new_sym.exceptAll(sym).limit(1).count()
            + sym.exceptAll(new_sym).limit(1).count()
        )
        sym = new_sym
        if changed == 0:
            # Terminal star graph: every edge points (member → root).
            members = sym.filter(F.col("x") > F.col("y")).select(
                F.col("x").alias("id"), F.col("y").alias("component")
            )
            roots = (
                sym.select(F.col("y").alias("id"))
                .subtract(members.select("id"))
                .withColumn("component", F.col("id"))
            )
            return members.union(roots)
    raise RuntimeError(
        f"connected_components_star did not converge in {max_rounds} rounds"
    )


def connected_components(
    edges: DataFrame, max_iterations: int = 50, algorithm: str = "auto"
) -> DataFrame:
    """(id, component) with component = min id in the component.

    ``algorithm``:
    - ``"propagation"`` — min-label propagation; O(component diameter)
      joins. Raises at the iteration cap (silently returning split
      components would make dedup keep duplicate survivors).
    - ``"star"`` — large-star/small-star contraction
      (``connected_components_star``); O(log² n) rounds regardless of
      diameter.
    - ``"auto"`` (default) — propagation (cheapest on the short-diameter
      clusters dedup actually produces), falling back to star
      contraction if the cap is hit instead of raising.

    ``localCheckpoint`` per iteration keeps the plan from growing
    unboundedly.
    """
    if algorithm == "star":
        return connected_components_star(edges)
    sym = (
        edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .union(edges.select(F.col("b").alias("x"), F.col("a").alias("y")))
        .distinct()
    )
    labels = (
        sym.select(F.col("x").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.y == labels.id)
            .select(F.col("x").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("ncomp"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("ncomp"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        if algorithm == "auto":
            # Diameter exceeded the propagation budget — switch to the
            # diameter-independent star contraction (correct answer, more
            # rounds of small shuffles) rather than failing the job.
            return connected_components_star(edges)
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (component diameter too large) — raise "
            "max_iterations or use algorithm='star'"
        )
    return labels
