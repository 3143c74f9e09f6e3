"""Stage E — graph assembly: nodes / edges / triples tables.

DataFrame re-expression of the reference's store semantics
(reference neo4j_store.py:109-164):

- node upsert  = hash-agg dedup on (label, id), last-writer-wins props
  (``max_by`` over a deterministic commit ordering — the reference's
  "last" is serial doc order; we pin ordering by conv_id, which is
  identical when docs are processed in conv order);
- edge upsert  = dedup on (src_id, rel_type, dst_id);
- MATCH-before-MERGE = left-semi joins of edges against the node table on
  both endpoints (edges with missing endpoints silently drop);
- triple view  = distinct (subj, pred, obj) — the P/R comparison artifact.

All aggregations are partial-aggregate friendly (map-side combine); AQE
splits skewed reduce partitions on hot entities (common CVEs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def build_nodes(extraction: DataFrame) -> DataFrame:
    """Global node table: (node_label, node_id, properties)."""
    return (
        extraction.filter(F.col("kind") == "node")
        .groupBy("node_label", "node_id")
        .agg(F.max_by("properties", "conv_id").alias("properties"))
    )


def build_edges(extraction: DataFrame, nodes: DataFrame) -> DataFrame:
    """Global edge table with endpoint-integrity semi-joins."""
    edges = (
        extraction.filter(F.col("kind") == "edge")
        .select("src_label", "src_id", "rel_type", "dst_label", "dst_id")
        .dropDuplicates(["src_id", "rel_type", "dst_id"])
    )
    node_ids = nodes.select(F.col("node_id").alias("_nid"))
    return (
        edges.join(node_ids, edges.src_id == node_ids._nid, "left_semi")
        .join(node_ids, edges.dst_id == node_ids._nid, "left_semi")
    )


def build_triples(edges: DataFrame) -> DataFrame:
    """Distinct (subj, pred, obj) — reference neo4j_store.py:152-161."""
    return (
        edges.select(
            F.col("src_id").alias("subj"),
            F.col("rel_type").alias("pred"),
            F.col("dst_id").alias("obj"),
        )
        .distinct()
    )
