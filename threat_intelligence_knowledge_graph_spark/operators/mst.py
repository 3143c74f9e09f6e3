"""Distributed minimum spanning forest (Borůvka) + single-linkage labels.

The reference repo ranks and clusters related infrastructure by graph
proximity (Cypher over the Neo4j export — reference ``README.md`` query
pack); a minimum spanning forest over a weighted similarity/co-occurrence
graph is the standard scale path for *single-linkage clustering* of that
infrastructure (cut the MSF at a distance threshold and the components
ARE the single-linkage clusters — no O(n²) linkage matrix).

Borůvka is the textbook distributed MST: every phase each component
selects its minimum-weight outgoing edge (deterministic tie-break on
``(weight, a, b)``), the selected pseudo-forest contracts components,
and the component count at least halves — ≤ log2(V) phases. Each phase
is two keyed equi-joins (edge endpoints → component labels) plus one
``min(struct)`` aggregation; contraction runs on the *component graph*
(≤ one edge per component, geometrically shrinking), via the existing
star-contraction connected-components kernel. ``localCheckpoint`` per
phase truncates lineage exactly like the other iterative graph ops
(pagerank/bfs/label propagation).

100 TB shape: no collects, no cartesian products; the only frames that
grow are the MSF accumulator (≤ V−1 rows total) and the per-phase
selected-edge set (≤ #components rows). Skewed high-degree nodes cost
one groupBy key each — the min(struct) aggregation has a map-side
partial combine, so a hot component does not funnel raw edges to one
reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .minhash import connected_components


def _canonical_edges(
    edges: DataFrame, src: str, dst: str, weight: str
) -> DataFrame:
    """Undirected canonical form: (a < b), self-loops dropped, parallel
    edges collapsed to their minimum weight (only the cheapest parallel
    edge can ever be in an MSF)."""
    a = F.least(F.col(src), F.col(dst)).alias("a")
    b = F.greatest(F.col(src), F.col(dst)).alias("b")
    return (
        edges.filter(F.col(src) != F.col(dst))
        .select(a, b, F.col(weight).cast("double").alias("w"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )


def _phase_select(e: DataFrame, comp: DataFrame):
    """One Borůvka phase's (cross-component edges, selected min edges) —
    un-checkpointed so the plan is auditable: two keyed equi-joins
    (endpoint → component label) + one min(struct) hash aggregate with
    a map-side partial; never a cartesian product, never Python."""
    ca = comp.select(F.col("id").alias("a"), F.col("comp").alias("ca"))
    cb = comp.select(F.col("id").alias("b"), F.col("comp").alias("cb"))
    cross = e.join(ca, "a").join(cb, "b").filter(F.col("ca") != F.col("cb"))
    pick = F.struct(F.col("w"), F.col("a"), F.col("b"))
    sel = (
        cross.select(F.col("ca").alias("c"), pick.alias("p"))
        .union(cross.select(F.col("cb").alias("c"), pick.alias("p")))
        .groupBy("c")
        .agg(F.min("p").alias("p"))
        .select("p.a", "p.b", "p.w")
        .distinct()
    )
    return cross, sel


def boruvka_mst(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    max_phases: int = 40,
) -> DataFrame:
    """Minimum spanning forest of the undirected weighted graph.

    Returns ``(src, dst, weight)`` with ``src < b`` canonical endpoint
    order — exactly the MSF edge set (per connected component of the
    input, so a disconnected input yields a spanning *forest*). With
    distinct weights the MSF is unique; with ties the result is the
    deterministic one induced by the ``(weight, a, b)`` tie-break.

    Raises ``RuntimeError`` at ``max_phases`` without convergence —
    silently returning a partial forest would hand single-linkage
    callers split clusters (the same no-silent-truncation contract as
    ``connected_components``). log2(V) phases means 40 covers V ≤ 1e12.
    """
    e = _canonical_edges(edges, src, dst, weight).localCheckpoint(eager=True)
    # component labels: every endpoint starts as its own component
    comp = (
        e.select(F.col("a").alias("id"))
        .union(e.select(F.col("b").alias("id")))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    msf = None
    for _ in range(max_phases):
        cross, sel = _phase_select(e, comp)
        sel = sel.localCheckpoint(eager=True)
        if sel.limit(1).count() == 0:
            break
        msf = sel if msf is None else msf.unionByName(sel).distinct()
        msf = msf.localCheckpoint(eager=True)
        # contract: connected components of the COMPONENT graph under the
        # selected pseudo-forest (star contraction — a phase can select a
        # long chain of components, so propagation depth must not matter)
        comp_edges = (
            cross.join(
                sel.withColumnRenamed("w", "sw"), ["a", "b"], "left_semi"
            )
            .select(F.col("ca").alias("a"), F.col("cb").alias("b"))
            .distinct()
        )
        mapping = connected_components(comp_edges, algorithm="star").select(
            F.col("id").alias("comp"), F.col("component").alias("ncomp")
        )
        comp = (
            comp.join(mapping, "comp", "left")
            .select(
                "id", F.coalesce("ncomp", "comp").alias("comp")
            )
            .localCheckpoint(eager=True)
        )
    else:
        raise RuntimeError(
            f"boruvka_mst: no convergence in {max_phases} phases"
        )
    if msf is None:
        return e.select(
            F.col("a").alias(src), F.col("b").alias(dst),
            F.col("w").alias(weight),
        ).limit(0)
    return msf.select(
        F.col("a").alias(src), F.col("b").alias(dst), F.col("w").alias(weight)
    )


def single_linkage_labels(
    edges: DataFrame,
    threshold: float,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """(id, cluster) single-linkage clusters at distance ``threshold``:
    components of the MSF restricted to edges with weight ≤ threshold
    (cutting the MSF at h is exactly single-linkage dendrogram level h).
    Isolated nodes (all incident edges > threshold) keep themselves as
    singleton clusters."""
    msf = boruvka_mst(edges, src=src, dst=dst, weight=weight)
    kept = msf.filter(F.col(weight) <= threshold).select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    )
    labels = connected_components(kept, algorithm="star").select(
        F.col("id"), F.col("component").alias("cluster")
    )
    all_nodes = (
        edges.select(F.col(src).alias("id"))
        .union(edges.select(F.col(dst).alias("id")))
        .distinct()
    )
    return all_nodes.join(labels, "id", "left").select(
        "id", F.coalesce("cluster", "id").alias("cluster")
    )
