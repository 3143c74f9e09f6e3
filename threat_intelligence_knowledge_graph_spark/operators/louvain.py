"""Modularity-based community detection — synchronous Louvain-style
local moves (single level).

Classic Louvain (Blondel et al. 2008; GDS ``gds.louvain``) is
inherently sequential: nodes move one at a time, each move reading the
previous one's community state. The standard distributed re-expression
— used by parallel Louvain implementations — makes the local-move
phase SYNCHRONOUS: every node simultaneously evaluates the modularity
gain of joining each neighboring community under the PREVIOUS round's
assignment and adopts the argmax. This file implements that phase with
a FIXED round count and fully deterministic tie-breaking (rounded gain
DESC, community id ASC), which makes the whole recurrence a pure
function of the edge list — the property that lets an unrolled SQL
oracle reproduce it exactly, the same contract discipline as
``label_propagation`` and ``pagerank``.

Gain comparison (unweighted, undirected; 2m = directed-pair count):

    score(i → C) = k_{i→C} − deg_i · (Σ_tot(C) − [C = c(i)]·deg_i) / 2m

the standard ΔQ numerator with constant terms dropped — maximizing it
over candidate communities (neighbors' plus i's own) maximizes
modularity gain. All inputs are integers; the single division and
subtraction are exactly-rounded IEEE ops, so scores are bit-identical
across engines (rounded to 9 decimals anyway, belt and braces).

Naive synchronous updates oscillate (two mutually-best nodes swap
communities forever — sync LPA's two-coloring pathology). Distributed
Louvain implementations break the symmetry by partitioning moves into
conflict-free sub-rounds; this operator uses a DIRECTIONAL alternation
that needs no randomness: on EVEN rounds a node may only move to a
community with a SMALLER id than its current one, on ODD rounds only
to a LARGER one, and only ever on a STRICT improvement over its own
community's score. Within a round a swap is logically impossible (two
nodes cannot both move toward smaller ids into each other's
communities), every accepted move strictly improves the mover's local
score, and converged states are fixed points. The rule is a pure
function of (round parity, edge list) — no draws — which keeps the
whole recurrence SQL-unrollable.

Scale shape per round (the LPA/PageRank discipline): one keyed join
(neighbor community lookup) + two aggregations (community volumes,
per-(node, community) edge counts) + one per-node argmax window — all
keyed shuffles, no cartesian; ``localCheckpoint`` truncates lineage.
At extreme scale deg·vol products can exceed 2^53; the planted-scale
contract keeps them integral — for a 100 TB graph swap the score to
pre-divided doubles (one extra rounding, same argmax in practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window



def louvain_communities(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
) -> DataFrame:
    """(id, community) after ``iterations`` synchronous local-move
    rounds. Undirected (edges symmetrized, self-loops dropped from
    voting but self-loop-only nodes keep a row — the LPA universe
    rule); communities initialize to the node id. Isolated nodes score
    only their own community (gain 0) and never move.

    ``weight`` names an edge-weight column (GDS
    ``relationshipWeightProperty``): k_in, degrees, volumes, and 2m all
    become weight sums, so a heavy edge pulls its endpoints together
    exactly as in weighted modularity. Parallel edges merge by SUM
    (GDS ``aggregation: SUM``); negative weights are rejected (the
    modularity gain comparison is meaningless under them — same rule
    as GDS). Unweighted (default) is the w≡1 special case and yields
    byte-identical assignments to the pre-weight implementation.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")

    if weight is None:
        sym = (
            edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
            .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .withColumn("w", F.lit(1).cast("double"))
            .localCheckpoint(eager=True)
        )
    else:
        sym = (
            edges.select(
                F.col(src).alias("u"),
                F.col(dst).alias("v"),
                F.col(weight).cast("double").alias("w"),
            )
            .unionByName(
                edges.select(
                    F.col(dst).alias("u"),
                    F.col(src).alias("v"),
                    F.col(weight).cast("double").alias("w"),
                )
            )
            .filter(F.col("u") != F.col("v"))
            .groupBy("u", "v")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
        neg = sym.agg(F.min("w").alias("m")).collect()[0].m
        if neg is not None and neg < 0:
            raise ValueError("edge weights must be non-negative")
    nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    m2_row = sym.agg(F.sum("w").alias("s")).collect()[0].s  # 2m
    m2 = float(m2_row or 0.0)
    if m2 == 0:
        return nodes.select("id", F.col("id").alias("community"))
    degs = sym.groupBy(F.col("u").alias("id")).agg(F.sum("w").alias("deg"))

    comm = nodes.select("id", F.col("id").alias("c")).localCheckpoint(eager=True)
    w = Window.partitionBy("u").orderBy(F.desc("score"), F.asc("comm"))
    for it in range(iterations):
        vol = (
            comm.join(degs, "id", "left")
            .groupBy(F.col("c").alias("comm"))
            .agg(F.sum(F.coalesce("deg", F.lit(0))).alias("vol"))
        )
        kin = (
            sym.join(comm.withColumnRenamed("id", "v"), "v")
            .groupBy("u", F.col("c").alias("comm"))
            .agg(F.sum("w").alias("kin"))
        )
        own = comm.join(degs, "id", "left").select(
            F.col("id").alias("u"),
            F.col("c").alias("own_c"),
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
        # Candidate communities: every neighbor community PLUS the
        # node's own (kin floor 0 — present even with no same-community
        # neighbor, so isolated nodes still emit a row and stay put).
        cand = (
            kin.unionByName(
                own.select("u", F.col("own_c").alias("comm"), F.lit(0.0).alias("kin"))
            )
            .groupBy("u", "comm")
            .agg(F.max("kin").alias("kin"))
        )
        scored = (
            cand.join(own, "u")
            .join(vol, "comm")
            .withColumn(
                "score",
                F.round(
                    F.col("kin")
                    - (
                        F.col("deg")
                        * (
                            F.col("vol")
                            - F.when(
                                F.col("comm") == F.col("own_c"), F.col("deg")
                            ).otherwise(F.lit(0))
                        )
                    )
                    / F.lit(m2),
                    9,
                ),
            )
        )
        allowed = (
            F.col("comm") < F.col("own_c")
            if it % 2 == 0
            else F.col("comm") > F.col("own_c")
        )
        best = (
            scored.filter(allowed)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                F.col("u").alias("id"),
                F.col("comm").alias("_best"),
                F.col("score").alias("_best_score"),
            )
        )
        own_score = scored.filter(F.col("comm") == F.col("own_c")).select(
            F.col("u").alias("id"), F.col("score").alias("_own_score")
        )
        comm = (
            comm.join(best, "id", "left")
            .join(own_score, "id", "left")
            .select(
                "id",
                F.when(
                    F.col("_best_score") > F.col("_own_score"), F.col("_best")
                )
                .otherwise(F.col("c"))
                .alias("c"),
            )
            .localCheckpoint(eager=True)
        )
    return comm.select("id", F.col("c").alias("community"))


def modularity(
    edges: DataFrame,
    assignment: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    community_col: str = "community",
) -> DataFrame:
    """One row (modularity): Newman modularity Q of a community
    assignment over the undirected graph —

        Q = Σ_C [ L_C/m − (vol_C / 2m)² ]

    computed from directed-pair counts (dp_C = 2·L_C, 2m = |sym|):
    Q = Σ_C (dp_C/2m − (vol_C/2m)²). All inputs are integers; the per-
    community terms are exactly-rounded double ops, and the final sum
    is rounded to 9 decimals (community count is small — the repo's
    round-before-compare discipline). The quality gauge for
    ``louvain_communities`` output, GDS ``modularity`` analog.

    Shape: two keyed joins of the edge list against the assignment
    (intra-community pair count) + one degree-weighted volume agg —
    no cartesian, output is one row.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    asg = assignment.select(
        F.col(id_col).alias("id"), F.col(community_col).alias("c")
    )
    m2 = float(sym.count())
    if m2 == 0:
        return asg.sparkSession.createDataFrame(
            [(0.0,)], ["modularity"]
        )
    degs = sym.groupBy(F.col("u").alias("id")).agg(F.count("*").alias("deg"))
    dp = (
        sym.join(asg.withColumnRenamed("id", "u").withColumnRenamed("c", "cu"), "u")
        .join(asg.withColumnRenamed("id", "v").withColumnRenamed("c", "cv"), "v")
        .filter(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("c"))
        .agg(F.count("*").alias("dp"))
    )
    vol = (
        asg.join(degs, "id", "left")
        .groupBy("c")
        .agg(F.sum(F.coalesce("deg", F.lit(0))).alias("vol"))
    )
    terms = vol.join(dp, "c", "left").select(
        (
            F.coalesce("dp", F.lit(0)) / F.lit(m2)
            - (F.col("vol") / F.lit(m2)) * (F.col("vol") / F.lit(m2))
        ).alias("t")
    )
    return terms.agg(F.round(F.sum("t"), 9).alias("modularity"))


def conductance(
    edges: DataFrame,
    assignment: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    community_col: str = "community",
) -> DataFrame:
    """(community, n_members, cut, volume, conductance): per-community
    conductance φ(C) = cut(C) / min(vol(C), 2m − vol(C)) over the
    undirected graph (GDS ``gds.conductance`` analog) — modularity's
    local complement: modularity scores the PARTITION, conductance
    flags the individual leaky community (high φ = more boundary than
    body, a candidate to merge or split; a campaign cluster with high
    conductance is bleeding edges into the rest of the graph).

    Directed-pair arithmetic on the symmetrized edge set (the
    ``modularity`` discipline): vol_C = Σ_C deg, cut_C = directed pairs
    with exactly one endpoint in C (each undirected cut edge counted
    once per direction — the standard definition's numerator and
    denominator use the same convention, so the ratio is exact).
    Isolated communities (vol = 0) and communities spanning the whole
    volume (denominator 0) return φ = 0 by convention. The φ division
    is one exactly-rounded double op over integers, rounded to 9.

    Shape: two keyed joins of the edge list against the assignment +
    two aggs — no cartesian, output is community-dimension-sized.
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    asg = assignment.select(
        F.col(id_col).alias("id"), F.col(community_col).alias("c")
    )
    m2 = sym.count()  # bounded 1-long pull (the modularity precedent)
    labeled = (
        sym.join(
            asg.withColumnRenamed("id", "u").withColumnRenamed("c", "cu"), "u"
        ).join(
            asg.withColumnRenamed("id", "v").withColumnRenamed("c", "cv"), "v"
        )
    )
    per_c = labeled.groupBy(F.col("cu").alias("community")).agg(
        F.count("*").cast("long").alias("volume"),
        F.sum(
            F.when(F.col("cu") != F.col("cv"), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("cut"),
    )
    members = asg.groupBy(F.col("c").alias("community")).agg(
        F.count("*").cast("long").alias("n_members")
    )
    denom = F.least(F.col("volume"), F.lit(m2) - F.col("volume"))
    return (
        members.join(per_c, "community", "left")
        .select(
            "community",
            "n_members",
            F.coalesce(F.col("cut"), F.lit(0)).cast("long").alias("cut"),
            F.coalesce(F.col("volume"), F.lit(0)).cast("long").alias("volume"),
            F.round(
                F.when(
                    F.coalesce(denom, F.lit(0)) > 0,
                    F.coalesce(F.col("cut"), F.lit(0)) / denom,
                ).otherwise(F.lit(0.0)),
                9,
            ).alias("conductance"),
        )
    )
