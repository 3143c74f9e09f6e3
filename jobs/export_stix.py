"""spark-submit entry point: STIX 2.1 export of a built KG warehouse.

The reference's graph lives in Neo4j; the interop format a CTI consumer
(TIP, MISP, OpenCTI) actually exchanges is STIX 2.1. Point this at a
``--warehouse`` produced by ``jobs/run_pipeline.py`` and it writes two
parquet tables:

- ``<out>/objects``       — one SDO/SCO skeleton row per graph node
  (``stix_id, stix_type, node_label, node_id``), and
- ``<out>/relationships`` — one SRO row per graph edge
  (``stix_id, relationship_type, source_ref, target_ref``).

Ids are deterministic content-derived ``<type>--<uuid-shaped md5>``
(see ``operators/stix_export.py``): a re-export after a re-ingest emits
byte-identical ids, so downstream de-duplication works. Prints ONE JSON
summary line: object/relationship counts and the per-type breakdown
(bounded collect — ≤ |types| rows).

Invocation::

    python jobs/export_stix.py --warehouse /tmp/kg-wh --output /tmp/stix

Scale shape: both exports are pure projections of the nodes/edges
tables — no shuffle beyond the parquet write; the driver never collects
the object stream.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.stix_export import (
    stix_objects,
    stix_relationships,
)
from threat_intelligence_knowledge_graph_spark.session import build_session
from threat_intelligence_knowledge_graph_spark.sources.tableio import (
    LocalTableCatalog,
)


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--output", required=True,
                    help="directory for objects/ and relationships/ parquet")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    own_session = spark is None
    if own_session:
        spark = build_session("tikg-export-stix", master=args.master)
    try:
        catalog = LocalTableCatalog(args.warehouse)
        nodes = catalog.read(spark, "nodes").select("node_label", "node_id")
        edges = catalog.read(spark, "edges").select(
            "src_label", "src_id", "rel_type", "dst_label", "dst_id"
        )
        objects = stix_objects(nodes)
        rels = stix_relationships(edges)
        objects.write.mode("overwrite").parquet(
            os.path.join(args.output, "objects")
        )
        rels.write.mode("overwrite").parquet(
            os.path.join(args.output, "relationships")
        )
        by_type = {
            r["stix_type"]: r["n"]
            for r in objects.groupBy("stix_type")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        summary = {
            "objects": sum(by_type.values()),
            "relationships": rels.count(),
            "by_type": dict(sorted(by_type.items())),
            "output": args.output,
        }
        print(json.dumps(summary, sort_keys=True))
        return 0
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
