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


class TestModularity:
    def test_two_triangles_with_bridge_hand_value(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.louvain import (
            modularity,
        )

        pairs = _clique("a", 3) + _clique("b", 3) + [("a0", "b0")]
        asg = spark.createDataFrame(
            [(f"a{i}", "A") for i in range(3)] + [(f"b{i}", "B") for i in range(3)],
            ["id", "community"],
        )
        # m = 7; L_C = 3 each; vol_A = vol_B = 2+2+3 = 7;
        # Q = 2 * (3/7 - (7/14)^2) = 5/14 ≈ 0.357142857
        got = modularity(_edges(spark, pairs), asg).collect()[0]
        assert got.modularity == pytest.approx(5.0 / 14.0, abs=1e-9)

    def test_all_one_community_is_zero(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.louvain import (
            modularity,
        )

        pairs = _clique("a", 4)
        asg = spark.createDataFrame(
            [(f"a{i}", "X") for i in range(4)], ["id", "community"]
        )
        # Single community: Q = m/m - (2m/2m)^2 = 0.
        got = modularity(_edges(spark, pairs), asg).collect()[0]
        assert got.modularity == pytest.approx(0.0, abs=1e-12)

    def test_louvain_partition_beats_singletons(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.louvain import (
            louvain_communities,
            modularity,
        )

        pairs = _clique("a", 5) + _clique("b", 5) + [("a0", "b0")]
        e = _edges(spark, pairs)
        part = louvain_communities(e, iterations=4)
        q_louvain = modularity(e, part).collect()[0].modularity
        singles = part.select("id", part.id.alias("community"))
        q_single = modularity(e, singles).collect()[0].modularity
        assert q_louvain > q_single
        assert q_louvain > 0.3


class TestWeightedLouvain:
    def test_heavy_edges_define_communities(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.louvain import (
            louvain_communities,
        )

        # square with heavy opposite sides: the w=5 pairs must end up
        # together, split across the w=1 links.
        df = spark.createDataFrame(
            [("a", "b", 5.0), ("c", "d", 5.0), ("b", "c", 1.0), ("d", "a", 1.0)],
            ["src", "dst", "w"],
        )
        got = {
            r.id: r.community
            for r in louvain_communities(df, iterations=4, weight="w").collect()
        }
        assert got["a"] == got["b"] and got["c"] == got["d"]
        assert got["a"] != got["c"]

    def test_parallel_edges_merge_by_sum(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.louvain import (
            louvain_communities,
        )

        merged = spark.createDataFrame(
            [("a", "b", 2.0), ("b", "a", 3.0), ("c", "d", 5.0),
             ("b", "c", 1.0), ("d", "a", 1.0)],
            ["src", "dst", "w"],
        )
        single = spark.createDataFrame(
            [("a", "b", 5.0), ("c", "d", 5.0), ("b", "c", 1.0), ("d", "a", 1.0)],
            ["src", "dst", "w"],
        )
        g1 = sorted(
            (r.id, r.community)
            for r in louvain_communities(merged, iterations=4, weight="w").collect()
        )
        g2 = sorted(
            (r.id, r.community)
            for r in louvain_communities(single, iterations=4, weight="w").collect()
        )
        assert g1 == g2

    def test_negative_weight_rejected(self, spark):
        import pytest as _pytest

        from threat_intelligence_knowledge_graph_spark.operators.louvain import (
            louvain_communities,
        )

        df = spark.createDataFrame([("a", "b", -1.0)], ["src", "dst", "w"])
        with _pytest.raises(ValueError):
            louvain_communities(df, weight="w")

    def test_unit_weights_equal_unweighted(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.louvain import (
            louvain_communities,
        )

        edges = [(str(a), str(b)) for a in range(4) for b in range(a + 1, 4)]
        edges += [("7", "8"), ("8", "9"), ("7", "9"), ("3", "7")]
        uw = spark.createDataFrame(edges, ["src", "dst"])
        ww = spark.createDataFrame(
            [(s, d, 1.0) for s, d in edges], ["src", "dst", "w"]
        )
        a = sorted(
            (r.id, r.community)
            for r in louvain_communities(uw, iterations=4).collect()
        )
        b = sorted(
            (r.id, r.community)
            for r in louvain_communities(ww, iterations=4, weight="w").collect()
        )
        assert a == b


class TestConductance:
    def test_barbell_hand_computed(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.louvain import (
            conductance,
        )

        # two triangles {a,b,c} {d,e,f} joined by bridge c-d
        edges = [
            ("a", "b"), ("b", "c"), ("a", "c"),
            ("d", "e"), ("e", "f"), ("d", "f"),
            ("c", "d"),
        ]
        asg = [("a", 0), ("b", 0), ("c", 0), ("d", 1), ("e", 1), ("f", 1)]
        e = spark.createDataFrame(edges, ["src", "dst"])
        a = spark.createDataFrame(asg, ["id", "community"])
        got = {r.community: r for r in conductance(e, a).collect()}
        # per community: directed volume 3·2+1 = 7, cut 1, 2m = 14
        for c in (0, 1):
            r = got[c]
            assert (r.n_members, r.cut, r.volume) == (3, 1, 7)
            assert r.conductance == round(1 / 7, 9)

    def test_leaky_community_scores_higher(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.louvain import (
            conductance,
        )

        # same graph, but a bad split puts d with the left triangle
        edges = [
            ("a", "b"), ("b", "c"), ("a", "c"),
            ("d", "e"), ("e", "f"), ("d", "f"),
            ("c", "d"),
        ]
        good = spark.createDataFrame(
            [("a", 0), ("b", 0), ("c", 0), ("d", 1), ("e", 1), ("f", 1)],
            ["id", "community"],
        )
        bad = spark.createDataFrame(
            [("a", 0), ("b", 0), ("c", 0), ("d", 0), ("e", 1), ("f", 1)],
            ["id", "community"],
        )
        e = spark.createDataFrame(edges, ["src", "dst"])
        phi_good = max(r.conductance for r in conductance(e, good).collect())
        phi_bad = max(r.conductance for r in conductance(e, bad).collect())
        assert phi_bad > phi_good

    def test_isolated_and_whole_graph_conventions(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.louvain import (
            conductance,
        )

        e = spark.createDataFrame([("a", "b")], ["src", "dst"])
        # 'c' is an isolated member of community 9 (no edges at all);
        # community 0 spans the whole volume → denominator 0
        a = spark.createDataFrame(
            [("a", 0), ("b", 0), ("c", 9)], ["id", "community"]
        )
        got = {r.community: r for r in conductance(e, a).collect()}
        assert got[9].volume == 0 and got[9].conductance == 0.0
        assert got[0].cut == 0 and got[0].conductance == 0.0
