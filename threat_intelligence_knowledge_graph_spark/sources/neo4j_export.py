"""Neo4j bulk-import export — the bridge back to the reference's store.

The reference persists its graph in Neo4j (reference neo4j_store.py);
users switching to this engine may still serve analysts from Neo4j.
This module renders the committed ``nodes``/``edges`` tables into the
``neo4j-admin database import`` CSV convention (the documented public
format: header row with ``:ID``/``:LABEL``/``:START_ID``/``:END_ID``/
``:TYPE`` reserved columns, one CSV set per file group):

    <out>/nodes_header.csv          id:ID,:LABEL,name,<prop cols>
    <out>/nodes.csv/part-*.csv      data rows only
    <out>/edges_header.csv          :START_ID,:END_ID,:TYPE
    <out>/edges.csv/part-*.csv      data rows only

neo4j-admin treats only the FIRST line of the first matched file as the
header, so the header lives in its own single file and the data parts
carry none (the ``--nodes=<header>,<parts regex>`` comma form the tool
documents). Data is written by Spark's distributed CSV writer with
RFC 4180 doubled-quote escaping (``escape='"'`` — Spark's default
backslash escaping would corrupt quoted fields under neo4j-admin) — no
driver-side collect, so the export scales with the table. Property maps
are flattened to the union of observed keys (bulk import needs a fixed
column set); at 100 TB pass ``prop_keys`` explicitly to skip the
discovery aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .tableio import LocalTableCatalog


def _prop_keys(nodes: DataFrame) -> list[str]:
    """Union of property-map keys across all nodes.

    explode → distinct keeps every intermediate bounded by the DISTINCT
    key count (a collect_list of per-row key arrays would funnel one
    entry per node into a single aggregate row — unbounded at scale)."""
    rows = (
        nodes.select(F.explode(F.map_keys("properties")).alias("k"))
        .distinct()
        .collect()
    )
    return sorted(r["k"] for r in rows)


def _write_csv_set(df: DataFrame, out_path: str, header_path: str) -> None:
    """Headerless distributed data parts + ONE driver-written header
    file (neo4j-admin reads the header from the first matched file
    only, so per-part headers would be ingested as data rows)."""
    (
        df.write.mode("overwrite")
        .option("header", "false")
        # RFC 4180 doubled-quote escaping; Spark's default escape='\\'
        # is misread by neo4j-admin and corrupts quoted fields.
        .option("quote", '"')
        .option("escape", '"')
        .csv(out_path)
    )
    # Hadoop FileSystem API, not a driver-local open(): the header must
    # land on the SAME filesystem as the data parts (s3a://, hdfs://,
    # file://), matching the module's no-driver-side-IO scaling claim.
    spark = df.sparkSession
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(header_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray((",".join(df.columns) + "\n").encode("utf-8")))
    finally:
        stream.close()


def export_nodes_csv(
    nodes: DataFrame, out_path: str, prop_keys: list[str] | None = None
) -> list[str]:
    """Write ``<out_path>`` (+ ``<out_path stem>_header.csv``) as a
    neo4j-admin nodes CSV set; returns the property columns exported."""
    keys = _prop_keys(nodes) if prop_keys is None else prop_keys
    cols = [
        F.col("node_id").alias("id:ID"),
        F.col("node_label").alias(":LABEL"),
    ] + [F.col("properties").getItem(k).alias(k) for k in keys]
    _write_csv_set(nodes.select(*cols), out_path, _header_path(out_path))
    return keys


def _header_path(out_path: str) -> str:
    import os

    base, _ext = os.path.splitext(out_path)
    return f"{base}_header.csv"


def export_edges_csv(edges: DataFrame, out_path: str) -> None:
    _write_csv_set(
        edges.select(
            F.col("src_id").alias(":START_ID"),
            F.col("dst_id").alias(":END_ID"),
            F.col("rel_type").alias(":TYPE"),
        ),
        out_path,
        _header_path(out_path),
    )


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
            # --multiline-fields: property values may contain newlines,
            # which the RFC 4180 writer emits inside quoted fields
            "neo4j-admin database import full --multiline-fields=true "
            f"--nodes={_header_path(nodes_out)},{nodes_out}/part-.*\\.csv "
            f"--relationships={_header_path(edges_out)},{edges_out}/part-.*\\.csv "
            "neo4j"
        ),
    }
