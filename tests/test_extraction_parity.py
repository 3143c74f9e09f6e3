"""The correctness gate: distributed pipeline vs single-process oracle.

BASELINE.json: triple P/R ≥ 0.95 vs the reference-oracle; we assert exact
equality on the tiny corpus (stronger), plus graph-shape invariants
mirroring the store semantics (FIXTURES.md §5).
"""

import pandas as pd
import pytest

from threat_intelligence_knowledge_graph_spark.datagen import transcripts_rows
from threat_intelligence_knowledge_graph_spark.operators.extraction import (
    extract_graph_records,
)
from threat_intelligence_knowledge_graph_spark.operators.reassembly import (
    TURN_SEPARATOR,
    reassemble,
)
from threat_intelligence_knowledge_graph_spark.operators.triples import (
    build_edges,
    build_nodes,
    build_triples,
)
from threat_intelligence_knowledge_graph_spark.oracle import oracle_extract_corpus
from threat_intelligence_knowledge_graph_spark.schemas import TRANSCRIPTS_SCHEMA

N_CONVS = 20  # tiny profile (FIXTURES.md §1)


@pytest.fixture(scope="module")
def corpus():
    rows = transcripts_rows(N_CONVS)
    docs = {}
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        docs.setdefault(r["conv_id"], []).append(r["text"])
    return rows, [(cid, TURN_SEPARATOR.join(ts)) for cid, ts in sorted(docs.items())]


@pytest.fixture(scope="module")
def spark_tables(spark, corpus):
    rows, _ = corpus
    transcripts = spark.createDataFrame(pd.DataFrame(rows), schema=TRANSCRIPTS_SCHEMA)
    extraction = extract_graph_records(reassemble(transcripts)).cache()
    nodes = build_nodes(extraction).cache()
    edges = build_edges(extraction, nodes).cache()
    triples = build_triples(edges)
    return extraction, nodes, edges, triples


@pytest.fixture(scope="module")
def oracle_tables(corpus):
    _, docs = corpus
    return oracle_extract_corpus(docs)


class TestTripleParity:
    def test_exact_triple_set_equality(self, spark_tables, oracle_tables):
        *_, triples = spark_tables
        _, golden, _ = oracle_tables
        got = {(r.subj, r.pred, r.obj) for r in triples.collect()}
        missing = golden - got
        extra = got - golden
        assert not missing and not extra, (
            f"missing={sorted(missing)[:5]} extra={sorted(extra)[:5]} "
            f"(|golden|={len(golden)}, |got|={len(got)})"
        )
        assert len(golden) > 50  # corpus actually exercises relations

    def test_node_set_equality(self, spark_tables, oracle_tables):
        _, nodes, _, _ = spark_tables
        golden_nodes, _, _ = oracle_tables
        got = {
            (r.node_label, r.node_id): dict(r.properties) for r in nodes.collect()
        }
        assert set(got) == set(golden_nodes)
        # Properties equal too (deterministic per (type, value) here).
        for key in got:
            assert got[key] == golden_nodes[key], key

    def test_node_type_distribution(self, spark_tables, oracle_tables):
        _, nodes, _, _ = spark_tables
        golden_nodes, _, _ = oracle_tables
        got = (
            nodes.groupBy("node_label").count().toPandas()
            .set_index("node_label")["count"].to_dict()
        )
        want: dict = {}
        for label, _nid in golden_nodes:
            want[label] = want.get(label, 0) + 1
        assert got == want


class TestGraphShape:
    def test_edge_endpoints_exist(self, spark_tables):
        _, nodes, edges, _ = spark_tables
        ids = {r.node_id for r in nodes.select("node_id").collect()}
        for r in edges.collect():
            assert r.src_id in ids and r.dst_id in ids

    def test_no_duplicate_edges(self, spark_tables):
        _, _, edges, _ = spark_tables
        total = edges.count()
        distinct = edges.select("src_id", "rel_type", "dst_id").distinct().count()
        assert total == distinct

    def test_no_empty_ids_or_types(self, spark_tables):
        # data_models.py:21-35 validators: non-empty id/type.
        extraction, nodes, edges, _ = spark_tables
        from pyspark.sql import functions as F

        assert (
            nodes.filter(
                (F.length(F.trim("node_id")) == 0)
                | (F.length(F.trim("node_label")) == 0)
            ).count()
            == 0
        )
        assert (
            edges.filter(F.length(F.trim("rel_type")) == 0).count() == 0
        )

    def test_pred_vocabulary(self, spark_tables):
        *_, triples = spark_tables
        preds = {r.pred for r in triples.select("pred").distinct().collect()}
        assert preds <= {
            "RESOLVES_TO",
            "COMMUNICATES_WITH",
            "CONTAINS",
            "USES",
            "TARGETS",
            "SUBTECHNIQUE_OF",
        }
