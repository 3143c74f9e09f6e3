"""HITS (hubs & authorities) over the knowledge graph.

Kleinberg's HITS complements PageRank (``operators/pagerank.py``) on
the analyst surface the reference exposes through its stored-graph
query interface (reference main.py:191-210 — the reference ships the
graph, not the algorithms): a *hub* is a node that points at many good
authorities (e.g. a report/document node linking many indicators), an
*authority* is one pointed at by many good hubs (e.g. a C2 domain
referenced across campaigns). The GDS analog is ``gds.hits``.

Scale shape — identical discipline to PageRank:

* each iteration is two keyed equi-joins of the (deduped) edge list
  with the current score vector plus two aggregations, all partitioned
  on the join key — no cartesian, no driver-side loops over rows;
* the two L2 norms per iteration are 1-row driver collects (same
  bounded-scalar pattern as PageRank's dangling mass);
* ``localCheckpoint`` per iteration truncates the growing lineage.

Synchronous update (L2-normalized, hub⁰ ≡ 1):

    auth_raw(v) = Σ_{u→v} hub(u)        auth = auth_raw / ‖auth_raw‖₂
    hub_raw(u)  = Σ_{u→v} auth(v)       hub  = hub_raw  / ‖hub_raw‖₂

With a fixed iteration count this is a deterministic float recurrence
(IEEE ops are exactly rounded; sqrt is exactly rounded), so the
contract entry's DuckDB oracle unrolls the identical arithmetic and
both sides round to 9 decimals (summation-order noise ~1e-16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hits(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """(id, hub, auth) after ``iterations`` synchronous HITS steps.

    ``edges`` is a directed edge list; parallel edges count once
    (deduped up front — the KG's edge semantics). Scores are
    L2-normalized after every half-step, Kleinberg's original scheme:
    the authority pass reads the PREVIOUS hub vector, the hub pass
    reads the JUST-normalized authority vector. Nodes with no in-edges
    get auth 0; nodes with no out-edges get hub 0. A zero norm (no
    edges at all after dedup) leaves that vector all-zero rather than
    dividing by zero.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes.count() == 0:
        return nodes.select(
            "id", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
        )

    hub = nodes.select("id", F.lit(1.0).alias("hub"))
    auth = nodes.select("id", F.lit(0.0).alias("auth"))
    for _ in range(iterations):
        # Authority half-step: pull hub mass along in-edges.
        a_raw = (
            e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("a"))
        )
        # Checkpoint the RAW vector first, then read both the norm and
        # the normalized frame from the checkpoint — computing the norm
        # off the un-materialized plan would execute the join+agg twice
        # per half-step (the pagerank.py scalar-read discipline).
        a_full = (
            nodes.join(a_raw, "id", "left")
            .select("id", F.coalesce(F.col("a"), F.lit(0.0)).alias("a"))
            .localCheckpoint(eager=True)
        )
        na = a_full.agg(F.sqrt(F.sum(F.col("a") * F.col("a")))).first()[0]
        auth = a_full.select(
            "id",
            (F.col("a") / F.lit(na) if na else F.lit(0.0)).alias("auth"),
        )

        # Hub half-step: pull the fresh authority mass along out-edges.
        h_raw = (
            e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("h"))
        )
        h_full = (
            nodes.join(h_raw, "id", "left")
            .select("id", F.coalesce(F.col("h"), F.lit(0.0)).alias("h"))
            .localCheckpoint(eager=True)
        )
        nh = h_full.agg(F.sqrt(F.sum(F.col("h") * F.col("h")))).first()[0]
        hub = h_full.select(
            "id",
            (F.col("h") / F.lit(nh) if nh else F.lit(0.0)).alias("hub"),
        )

    return hub.join(auth, "id").select("id", "hub", "auth")


def eigenvector_centrality(
    edges: DataFrame,
    iterations: int = 5,
    src: str = "src_id",
    dst: str = "dst_id",
) -> DataFrame:
    """(id, score) after ``iterations`` power-iteration steps of
    eigenvector centrality — x ← A^T x / ‖A^T x‖₂ with x⁰ ≡ 1 (the GDS
    ``gds.eigenvector`` analog; Bonacich 1987): a node is central in
    proportion to the centrality of the nodes pointing AT it, the
    recursive strengthening PageRank's damping deliberately flattens.
    HITS' authority half-step iterated alone; for the undirected
    variant pass the symmetrized edge list.

    Same scale discipline as ``hits``: per iteration one keyed
    equi-join + one agg + a node-universe LEFT join, a single bounded
    1-row norm collect, ``localCheckpoint`` lineage truncation.
    Parallel edges dedup; in-degree-0 nodes go (and stay) 0; a zero
    norm leaves the vector all-zero rather than dividing by zero. With
    a fixed iteration count the update is a deterministic float
    recurrence (sum, divide, sqrt exactly rounded), so the contract
    oracle unrolls the identical arithmetic.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")

    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes.count() == 0:
        return nodes.select("id", F.lit(0.0).alias("score"))

    x = nodes.select("id", F.lit(1.0).alias("score"))
    for _ in range(iterations):
        raw = (
            e.join(x.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("score").alias("s"))
        )
        full = (
            nodes.join(raw, "id", "left")
            .select("id", F.coalesce(F.col("s"), F.lit(0.0)).alias("s"))
            .localCheckpoint(eager=True)
        )
        nrm = full.agg(F.sqrt(F.sum(F.col("s") * F.col("s")))).first()[0]
        x = full.select(
            "id",
            (F.col("s") / F.lit(nrm) if nrm else F.lit(0.0)).alias("score"),
        )
    return x
