"""HITS operator: analytic fixtures + numpy power-iteration parity."""

from __future__ import annotations

import math

import numpy as np
import pytest

from threat_intelligence_knowledge_graph_spark.operators.hits import hits


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src_id", "dst_id"])


def _numpy_hits(pairs, iterations):
    nodes = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for u, v in set(pairs):
        A[idx[u], idx[v]] = 1.0
    hub = np.ones(len(nodes))
    auth = np.zeros(len(nodes))
    for _ in range(iterations):
        auth = A.T @ hub
        auth = auth / np.linalg.norm(auth)
        hub = A @ auth
        hub = hub / np.linalg.norm(hub)
    return nodes, hub, auth


class TestHits:
    def test_star_graph_analytic(self, spark):
        # Star u -> {a, b, c}: u is the only hub, the leaves are equal
        # authorities. Exact: auth = 1/sqrt(3) each, hub(u) = 1.
        e = _edges(spark, [("u", "a"), ("u", "b"), ("u", "c")])
        got = {r.id: (r.hub, r.auth) for r in hits(e, iterations=3).collect()}
        assert got["u"][0] == pytest.approx(1.0, abs=1e-12)
        assert got["u"][1] == pytest.approx(0.0, abs=1e-12)
        for leaf in "abc":
            assert got[leaf][0] == pytest.approx(0.0, abs=1e-12)
            assert got[leaf][1] == pytest.approx(1 / math.sqrt(3), abs=1e-12)

    def test_matches_numpy_power_iteration(self, spark):
        pairs = [
            ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
            ("d", "c"), ("d", "b"), ("e", "a"), ("b", "e"),
        ]
        nodes, hub, auth = _numpy_hits(pairs, iterations=4)
        got = {r.id: (r.hub, r.auth) for r in hits(_edges(spark, pairs), iterations=4).collect()}
        assert set(got) == set(nodes)
        for n, h, a in zip(nodes, hub, auth):
            assert got[n][0] == pytest.approx(h, abs=1e-9)
            assert got[n][1] == pytest.approx(a, abs=1e-9)

    def test_l2_norms_are_one(self, spark):
        pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a")]
        rows = hits(_edges(spark, pairs), iterations=5).collect()
        assert sum(r.hub ** 2 for r in rows) == pytest.approx(1.0, abs=1e-9)
        assert sum(r.auth ** 2 for r in rows) == pytest.approx(1.0, abs=1e-9)

    def test_parallel_edges_count_once(self, spark):
        base = [("a", "b"), ("c", "b")]
        dup = base + [("a", "b")] * 3
        g1 = {r.id: (r.hub, r.auth) for r in hits(_edges(spark, base), iterations=3).collect()}
        g2 = {r.id: (r.hub, r.auth) for r in hits(_edges(spark, dup), iterations=3).collect()}
        assert g1 == g2

    def test_sink_has_zero_hub(self, spark):
        e = _edges(spark, [("a", "b"), ("b", "c"), ("a", "c")])
        got = {r.id: r.hub for r in hits(e, iterations=3).collect()}
        assert got["c"] == pytest.approx(0.0, abs=1e-12)

    def test_rejects_bad_iterations(self, spark):
        with pytest.raises(ValueError):
            hits(_edges(spark, [("a", "b")]), iterations=0)


class TestEigenvectorCentrality:
    def test_numpy_power_iteration_parity(self, spark):
        import numpy as np

        edges = [
            ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "c"),
        ]
        ids = sorted({u for u, _ in edges} | {v for _, v in edges})
        idx = {n: i for i, n in enumerate(ids)}
        A = np.zeros((len(ids), len(ids)))
        for u, v in set(edges):
            A[idx[u], idx[v]] = 1.0
        x = np.ones(len(ids))
        for _ in range(4):
            x = A.T @ x
            n = np.sqrt((x * x).sum())
            x = x / n if n else x
        from threat_intelligence_knowledge_graph_spark.operators.hits import (
            eigenvector_centrality,
        )

        df = spark.createDataFrame(edges, ["src_id", "dst_id"])
        got = {
            r.id: r.score
            for r in eigenvector_centrality(df, iterations=4).collect()
        }
        for n_ in ids:
            assert abs(got[n_] - x[idx[n_]]) < 1e-12, n_

    def test_l2_invariant_and_source_zero(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.hits import (
            eigenvector_centrality,
        )

        df = spark.createDataFrame(
            [("s", "a"), ("a", "b"), ("b", "a")], ["src_id", "dst_id"]
        )
        rows = eigenvector_centrality(df, iterations=3).collect()
        got = {r.id: r.score for r in rows}
        assert got["s"] == 0.0  # no in-edges → never gains mass
        assert abs(sum(v * v for v in got.values()) - 1.0) < 1e-12

    def test_dag_collapses_to_zero(self, spark):
        # a DAG's adjacency is nilpotent: the dominant eigenvalue is 0
        # and the power iteration legitimately reaches the zero vector
        # once paths from sources are exhausted (the zero-norm guard
        # then stops dividing). GDS converges to the same degenerate
        # answer modulo tolerance.
        from threat_intelligence_knowledge_graph_spark.operators.hits import (
            eigenvector_centrality,
        )

        df = spark.createDataFrame(
            [("s", "a"), ("s", "b"), ("a", "b")], ["src_id", "dst_id"]
        )
        got = {
            r.id: r.score
            for r in eigenvector_centrality(df, iterations=3).collect()
        }
        assert set(got.values()) == {0.0}

    def test_parallel_edges_dedup_and_validation(self, spark):
        import pytest as _pytest

        from threat_intelligence_knowledge_graph_spark.operators.hits import (
            eigenvector_centrality,
        )

        once = spark.createDataFrame([("a", "b")], ["src_id", "dst_id"])
        twice = spark.createDataFrame(
            [("a", "b"), ("a", "b")], ["src_id", "dst_id"]
        )
        r1 = sorted(map(tuple, eigenvector_centrality(once, 2).collect()))
        r2 = sorted(map(tuple, eigenvector_centrality(twice, 2).collect()))
        assert r1 == r2
        with _pytest.raises(ValueError):
            eigenvector_centrality(once, iterations=0)
