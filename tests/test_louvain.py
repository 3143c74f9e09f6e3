"""Synchronous Louvain local moves: planted communities + determinism."""

from __future__ import annotations

import itertools

import pytest

from threat_intelligence_knowledge_graph_spark.operators.louvain import (
    louvain_communities,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _clique(tag, n):
    return [
        (f"{tag}{a}", f"{tag}{b}")
        for a, b in itertools.combinations(range(n), 2)
    ]


class TestLouvain:
    def test_barbell_splits_into_two_communities(self, spark):
        pairs = _clique("a", 5) + _clique("b", 5) + [("a0", "b0")]
        got = {r.id: r.community for r in louvain_communities(_edges(spark, pairs), iterations=4).collect()}
        a = {got[f"a{i}"] for i in range(5)}
        b = {got[f"b{i}"] for i in range(5)}
        assert len(a) == 1 and len(b) == 1
        assert a != b

    def test_disjoint_cliques_each_converge(self, spark):
        pairs = _clique("x", 4) + _clique("y", 4)
        got = {r.id: r.community for r in louvain_communities(_edges(spark, pairs), iterations=3).collect()}
        assert len({got[f"x{i}"] for i in range(4)}) == 1
        assert len({got[f"y{i}"] for i in range(4)}) == 1
        assert got["x0"] != got["y0"]

    def test_deterministic_across_runs(self, spark):
        pairs = _clique("a", 4) + _clique("b", 4) + [("a0", "b1"), ("a2", "b3")]
        e = _edges(spark, pairs)
        r1 = sorted((r.id, r.community) for r in louvain_communities(e, iterations=3).collect())
        r2 = sorted((r.id, r.community) for r in louvain_communities(e, iterations=3).collect())
        assert r1 == r2

    def test_self_loop_only_node_keeps_own_community(self, spark):
        pairs = [("a", "b"), ("b", "a"), ("z", "z")]
        got = {r.id: r.community for r in louvain_communities(_edges(spark, pairs), iterations=2).collect()}
        assert got["z"] == "z"
        assert got["a"] == got["b"]

    def test_isolated_pair_merges(self, spark):
        got = {r.id: r.community for r in louvain_communities(_edges(spark, [("p", "q")]), iterations=2).collect()}
        # p and q each gain by joining the other; sync update converges
        # (deterministic tiebreak) — both end in ONE community.
        assert got["p"] == got["q"]

    def test_rejects_bad_iterations(self, spark):
        with pytest.raises(ValueError):
            louvain_communities(_edges(spark, [("a", "b")]), iterations=0)
