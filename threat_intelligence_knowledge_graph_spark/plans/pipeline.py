"""End-to-end KG construction pipeline with checkpoint/resume + metrics.

Stage graph (SURVEY.md §3.1 "Spark lifecycle"):

  transcripts ──A reassemble──> documents ──C extract──> extraction
       extraction ──E assemble──> nodes / edges / triples
       every stage ──> metrics rows (run_id, stage, partition_id)

Each stage commits a snapshot via the TableIO seam; a resumed run skips
any stage already committed for its ``run_id`` (idempotent — re-running a
finished run rewrites nothing and the triple set is unchanged, the
run-twice test). Lineage is per-partition row counts in the ``metrics``
table, satisfying the north_star's "per-partition lineage and metrics
rows".
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.canonicalize import apply_canonicalization, build_alias_dictionary
from ..operators.extraction import extract_graph_records, extract_graph_records_fused
from ..operators.reassembly import reassemble
from ..operators.triples import build_edges, build_nodes, build_triples
from ..sources.tableio import LocalTableCatalog


@dataclass
class PipelineResult:
    run_id: str
    tables: dict[str, str] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)


def _partition_metrics(df: DataFrame, run_id: str, stage: str) -> DataFrame:
    """Per-partition row counts — the lineage record for this stage."""
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .count()
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col("partition_id").cast("int"),
            F.lit("rows").alias("metric"),
            F.col("count").cast("long").alias("value"),
        )
    )


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    catalog: LocalTableCatalog,
    run_id: str,
    salt_blocks: int | None = None,
    collect_counts: bool = True,
    fused: bool = False,
    canonicalize: bool = False,
    input_pregrouped: bool = False,
) -> PipelineResult:
    """Execute (or resume) the full pipeline for ``run_id``.

    ``fused=True`` runs reassembly+extraction as one shuffle + one Arrow
    pass (the hot path, see BENCH.md) — it skips the materialized
    ``documents`` checkpoint, trading stage-A resume granularity for ~2×
    throughput. The final graph tables (nodes/edges/triples) are
    identical either way (tested); the intermediate ``extraction`` table
    is NOT: the fused kernel pre-dedups per partition and omits edge
    ``context`` by default, so its row counts/provenance differ from the
    declarative per-conversation records.

    ``input_pregrouped=True`` (fused path only) declares that each input
    partition already holds whole conversations — the layout an Iceberg
    ``bucket(conv_id)``-clustered table scan provides — so the fused
    kernel skips the conv_id exchange entirely (correctness tested in
    test_bucketing.py; measured faster at both core levels with the
    round-3 kernel, see BENCH.md).

    ``canonicalize=True`` enables stage D's alias layer (MinHash/LSH +
    connected components over node surface forms) and rewrites edge
    endpoints through the broadcast alias dictionary before the triple
    view. OFF by default: the NER path's ids are already exact-canonical
    and the parity gate requires the exact triple set (SURVEY.md §7
    step 6). The dictionary is committed as the ``canonical_map`` table.
    """
    result = PipelineResult(run_id=run_id)

    def stage_done(table: str, stage: str, with_metrics: bool = False) -> bool:
        """A stage counts as committed only when its LAST write landed —
        for checkpoint stages that's the metrics merge, not the data
        snapshot, else a crash between the two would skip the lineage
        rows forever on resume (both writes are idempotent to redo)."""
        ok = catalog.committed(table, run_id, stage)
        if with_metrics:
            ok = ok and catalog.committed("metrics", run_id, f"{stage}-metrics")
        return ok

    # --- Stage A: reassembly (skipped in fused mode) ------------------------
    if not fused:
        if not stage_done("documents", "reassemble", with_metrics=True):
            documents = reassemble(transcripts, salt_blocks=salt_blocks)
            catalog.overwrite(documents, "documents", run_id, "reassemble")
            catalog.merge(
                spark,
                _partition_metrics(
                    catalog.read(spark, "documents"), run_id, "reassemble"
                ),
                "metrics",
                keys=["run_id", "stage", "partition_id", "metric"],
                run_id=run_id,
                stage="reassemble-metrics",
            )
        documents = catalog.read(spark, "documents")

    # --- Stage C: extraction (checkpointed once, split by kind after) ------
    if not stage_done("extraction", "extract", with_metrics=True):
        if fused:
            extraction = extract_graph_records_fused(
                transcripts, input_pregrouped=input_pregrouped
            )
        else:
            extraction = extract_graph_records(documents)
        catalog.overwrite(extraction, "extraction", run_id, "extract")
        catalog.merge(
            spark,
            _partition_metrics(catalog.read(spark, "extraction"), run_id, "extract"),
            "metrics",
            keys=["run_id", "stage", "partition_id", "metric"],
            run_id=run_id,
            stage="extract-metrics",
        )
    extraction = catalog.read(spark, "extraction")

    # --- Stage E: graph tables (MERGE upserts — incremental-run ready) -----
    if not stage_done("nodes", "assemble"):
        nodes = build_nodes(extraction)
        catalog.merge(
            spark, nodes, "nodes", keys=["node_label", "node_id"],
            run_id=run_id, stage="assemble",
        )
    nodes = catalog.read(spark, "nodes")

    if not stage_done("edges", "assemble"):
        edges = build_edges(extraction, nodes)
        catalog.merge(
            spark, edges, "edges", keys=["src_id", "rel_type", "dst_id"],
            run_id=run_id, stage="assemble",
        )
    edges = catalog.read(spark, "edges")

    # --- Stage D (optional): alias canonicalization -------------------------
    # The rewrite is committed as its own `edges_canonical` table (and
    # feeds the triples build) rather than silently diverging from the
    # raw `edges` view: the raw edges/nodes tables keep surface-form ids
    # for provenance, `edges_canonical`/`triples` carry resolved ids, and
    # graph queries choose explicitly which layer they read.
    if canonicalize:
        if not stage_done("canonical_map", "canonicalize"):
            # Conservative threshold: ids are already exact-canonical, so
            # only near-identical surface forms (punctuation/underscore
            # variants) may merge — 0.75 would falsely merge distinct
            # domains that differ by one char (evil-1 vs evil-2).
            alias = build_alias_dictionary(nodes, jaccard_threshold=0.9)
            catalog.overwrite(alias, "canonical_map", run_id, "canonicalize")
        alias = catalog.read(spark, "canonical_map")
        if not stage_done("edges_canonical", "canonicalize"):
            # edges_canonical is DERIVED (current edges × current alias
            # map), so it is recomputed and overwritten whole — a MERGE
            # would keep rows rewritten under superseded alias mappings
            # forever when the dictionary changes across runs.
            catalog.overwrite(
                apply_canonicalization(edges, alias),
                "edges_canonical",
                run_id,
                "canonicalize",
            )
        edges = catalog.read(spark, "edges_canonical")

    if not stage_done("triples", "assemble"):
        triples = build_triples(edges)
        catalog.merge(
            spark, triples, "triples", keys=["subj", "pred", "obj"],
            run_id=run_id, stage="assemble",
        )

    tables = ["extraction", "nodes", "edges", "triples", "metrics"]
    if not fused:
        tables.insert(0, "documents")
    for t in tables:
        result.tables[t] = t
        if collect_counts:
            result.counts[t] = catalog.read(spark, t).count()
    return result


def run_incremental(
    spark: SparkSession,
    transcripts: DataFrame,
    catalog: LocalTableCatalog,
    run_id: str,
    fused: bool = True,
) -> PipelineResult:
    """Daily-increment mode: process only conversations not yet in the
    warehouse, then MERGE into the graph tables.

    Seen-conversation lineage comes from the committed ``conv_seen``
    table (conv_id set — tiny relative to the corpus); new transcripts
    anti-join it, so a feed that replays old conversations costs one
    broadcast-able anti-join instead of a full re-extraction. MERGE sinks
    keep the result identical to a from-scratch run over the union
    (asserted by tests).
    """
    if catalog.exists("conv_seen"):
        seen = catalog.read(spark, "conv_seen")
        todo = transcripts.join(seen, "conv_id", "left_anti")
    else:
        todo = transcripts
    result = run_pipeline(
        spark, todo, catalog, run_id=run_id, fused=fused, collect_counts=False
    )
    catalog.merge(
        spark,
        todo.select("conv_id").distinct(),
        "conv_seen",
        keys=["conv_id"],
        run_id=run_id,
        stage="conv-seen",
    )
    for t in ("nodes", "edges", "triples"):
        result.counts[t] = catalog.read(spark, t).count()
    return result


def audit_graph_tables(
    spark: SparkSession, catalog: LocalTableCatalog, run_id: str = ""
) -> DataFrame:
    """Post-run invariants over the committed graph tables — the MERGE
    keys must actually be unique and endpoints non-null, or resume/
    upsert semantics are silently broken. One scan+agg per table
    (``operators/quality_checks``); returns (table, check, violations,
    passed) and, when ``run_id`` is given, merges the results into the
    ``metrics`` table as stage='audit' rows (partition_id −1, value =
    violations) so audits live next to the lineage they guard."""
    from ..operators.quality_checks import not_null, run_checks

    suites = {
        "nodes": [
            not_null("node_id"),
            not_null("node_label"),
            (
                "unique(node_label,node_id)",
                F.count(F.lit(1))
                - F.count_distinct(F.struct("node_label", "node_id")),
            ),
        ],
        "edges": [
            not_null("src_id"),
            not_null("rel_type"),
            not_null("dst_id"),
            (
                "unique(src_id,rel_type,dst_id)",
                F.count(F.lit(1))
                - F.count_distinct(F.struct("src_id", "rel_type", "dst_id")),
            ),
        ],
        "triples": [
            not_null("subj"),
            not_null("pred"),
            not_null("obj"),
            (
                "unique(subj,pred,obj)",
                F.count(F.lit(1))
                - F.count_distinct(F.struct("subj", "pred", "obj")),
            ),
        ],
    }
    results = None
    for table, checks in suites.items():
        if not catalog.exists(table):
            continue
        r = run_checks(catalog.read(spark, table), checks).select(
            F.lit(table).alias("table"), "check", "violations", "passed"
        )
        results = r if results is None else results.union(r)
    if results is None:
        raise FileNotFoundError("no graph tables committed to audit")
    if catalog.exists("triples") and catalog.exists("nodes"):
        # Domain/range conformance (round-5): the kernel can only emit
        # rule-conformant triples, so ANY non-ok status in a committed
        # warehouse means upstream corruption or tampering — the same
        # class of invariant as the MERGE-key checks above.
        from ..operators.triples import validate_triple_schema

        audited = validate_triple_schema(
            catalog.read(spark, "triples"),
            catalog.read(spark, "nodes").select("node_label", "node_id"),
        )
        conf = audited.agg(
            F.coalesce(
                F.sum((F.col("status") != "ok").cast("long")), F.lit(0)
            ).alias("violations")
        ).select(
            F.lit("triples").alias("table"),
            F.lit("schema_conformance").alias("check"),
            F.col("violations"),
            (F.col("violations") == 0).alias("passed"),
        )
        results = results.union(conf)
    if run_id:
        audit_rows = results.select(
            F.lit(run_id).alias("run_id"),
            F.lit("audit").alias("stage"),
            F.lit(-1).alias("partition_id"),
            F.concat(F.col("table"), F.lit(":"), F.col("check")).alias("metric"),
            F.col("violations").cast("long").alias("value"),
        )
        catalog.merge(
            spark,
            audit_rows,
            "metrics",
            keys=["run_id", "stage", "partition_id", "metric"],
            run_id=run_id,
            stage="audit",
        )
    return results


def summarize_metrics(spark: SparkSession, catalog: LocalTableCatalog) -> DataFrame:
    """Stats aggregation (reference main.py:100-108,326-342 → SURVEY.md §2
    op 31): totals per (run, stage) from the per-partition lineage rows."""
    return (
        catalog.read(spark, "metrics")
        .groupBy("run_id", "stage", "metric")
        .agg(
            F.sum("value").alias("total"),
            F.count("*").alias("n_partitions"),
            F.max("value").alias("max_partition"),
        )
    )
