"""neo4j-admin CSV export: layout, headers, content round-trip."""

from __future__ import annotations

import csv
import glob
import os

from threat_intelligence_knowledge_graph_spark.datagen import (
    generate_transcripts_df,
)
from threat_intelligence_knowledge_graph_spark.plans.pipeline import run_pipeline
from threat_intelligence_knowledge_graph_spark.sources.neo4j_export import (
    export_graph,
)
from threat_intelligence_knowledge_graph_spark.sources.tableio import (
    LocalTableCatalog,
)


def _read_csv_set(path):
    rows, header = [], None
    for f in sorted(glob.glob(os.path.join(path, "part-*.csv"))):
        with open(f, newline="") as fh:
            r = csv.reader(fh)
            h = next(r, None)
            if h is None:
                continue
            if header is None:
                header = h
            else:
                assert h == header  # every part carries the same header
            rows.extend(r)
    return header, rows


class TestNeo4jExport:
    def test_export_round_trips_graph(self, spark, tmp_path):
        catalog = LocalTableCatalog(str(tmp_path / "wh"))
        run_pipeline(
            spark,
            generate_transcripts_df(spark, 40),
            catalog,
            run_id="a",
            fused=True,
        )
        out = str(tmp_path / "export")
        summary = export_graph(spark, catalog, out)

        nh, nrows = _read_csv_set(os.path.join(out, "nodes.csv"))
        eh, erows = _read_csv_set(os.path.join(out, "edges.csv"))
        # Reserved bulk-import columns present and first.
        assert nh[:2] == ["id:ID", ":LABEL"]
        assert eh == [":START_ID", ":END_ID", ":TYPE"]
        assert len(nrows) == summary["nodes"]
        assert len(erows) == summary["edges"]

        # Content equality with the committed tables.
        nodes = {
            (r["node_id"], r["node_label"])
            for r in catalog.read(spark, "nodes").collect()
        }
        assert {(r[0], r[1]) for r in nrows} == nodes
        edges = {
            (r["src_id"], r["dst_id"], r["rel_type"])
            for r in catalog.read(spark, "edges").collect()
        }
        assert {tuple(r) for r in erows} == edges

        # Every edge endpoint resolves to an exported node id (the
        # bulk importer hard-fails on dangling refs).
        node_ids = {r[0] for r in nrows}
        assert all(r[0] in node_ids and r[1] in node_ids for r in erows)
        assert "neo4j-admin database import" in summary["import_command"]

    def test_property_columns_flattened(self, spark, tmp_path):
        from threat_intelligence_knowledge_graph_spark.sources.neo4j_export import (
            export_nodes_csv,
        )

        nodes = spark.createDataFrame(
            [
                ("Malware", "m1", {"name": "x", "hash_algorithm": "MD5"}),
                ("Domain", "d1", {"name": "evil.example.net"}),
            ],
            "node_label string, node_id string, properties map<string,string>",
        )
        out = str(tmp_path / "n.csv")
        keys = export_nodes_csv(nodes, out)
        assert keys == ["hash_algorithm", "name"]
        header, rows = _read_csv_set(out)
        assert header == ["id:ID", ":LABEL", "hash_algorithm", "name"]
        by_id = {r[0]: r for r in rows}
        assert by_id["m1"][2:] == ["MD5", "x"]
        assert by_id["d1"][2] == ""  # absent key → empty cell
