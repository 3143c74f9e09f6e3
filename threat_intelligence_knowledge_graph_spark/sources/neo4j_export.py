"""Neo4j bulk-import export — the bridge back to the reference's store.

The reference persists its graph in Neo4j (reference neo4j_store.py);
users switching to this engine may still serve analysts from Neo4j.
This module renders the committed ``nodes``/``edges`` tables into the
``neo4j-admin database import`` CSV convention (the documented public
format: header row with ``:ID``/``:LABEL``/``:START_ID``/``:END_ID``/
``:TYPE`` reserved columns, one CSV set per file group):

    <out>/nodes.csv/part-*.csv     header: id:ID,:LABEL,name,<prop cols>
    <out>/edges.csv/part-*.csv     header: :START_ID,:END_ID,:TYPE

Written with Spark's distributed CSV writer (quoted/escaped per RFC
4180, which neo4j-admin accepts) — no driver-side collect, so the
export scales with the table. Property maps are flattened to the union
of observed keys (bulk import needs a fixed column set); at 100 TB pass
``prop_keys`` explicitly to skip the discovery aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .tableio import LocalTableCatalog


def _prop_keys(nodes: DataFrame) -> list[str]:
    """Union of property-map keys across all nodes (one aggregation)."""
    row = nodes.select(
        F.array_distinct(
            F.flatten(F.collect_list(F.map_keys("properties")))
        ).alias("ks")
    ).first()
    return sorted(row["ks"] or [])


def export_nodes_csv(
    nodes: DataFrame, out_path: str, prop_keys: list[str] | None = None
) -> list[str]:
    """Write ``<out_path>`` as a neo4j-admin nodes CSV set; returns the
    property columns exported."""
    keys = _prop_keys(nodes) if prop_keys is None else prop_keys
    cols = [
        F.col("node_id").alias("id:ID"),
        F.col("node_label").alias(":LABEL"),
    ] + [F.col("properties").getItem(k).alias(k) for k in keys]
    nodes.select(*cols).write.mode("overwrite").option("header", "true").csv(
        out_path
    )
    return keys


def export_edges_csv(edges: DataFrame, out_path: str) -> None:
    edges.select(
        F.col("src_id").alias(":START_ID"),
        F.col("dst_id").alias(":END_ID"),
        F.col("rel_type").alias(":TYPE"),
    ).write.mode("overwrite").option("header", "true").csv(out_path)


def export_graph(
    spark: SparkSession,
    catalog: LocalTableCatalog,
    out_dir: str,
    prop_keys: list[str] | None = None,
) -> dict:
    """Export the committed graph for ``neo4j-admin database import``.

    Returns a summary dict with row counts and the command line a user
    would run against the produced files.
    """
    import os

    nodes = catalog.read(spark, "nodes")
    edges = catalog.read(spark, "edges")
    nodes_out = os.path.join(out_dir, "nodes.csv")
    edges_out = os.path.join(out_dir, "edges.csv")
    keys = export_nodes_csv(nodes, nodes_out, prop_keys)
    export_edges_csv(edges, edges_out)
    return {
        "nodes": nodes.count(),
        "edges": edges.count(),
        "prop_columns": keys,
        "import_command": (
            "neo4j-admin database import full "
            f"--nodes={nodes_out}/part-.*\\.csv "
            f"--relationships={edges_out}/part-.*\\.csv neo4j"
        ),
    }
