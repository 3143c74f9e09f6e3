"""GDS-style graph algorithms: triangle count, node similarity, caps."""

from __future__ import annotations

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
    node_similarity,
    triangle_count,
)


class TestTriangleCount:
    def test_clique_and_tail(self, spark):
        # K4 on {1,2,3,4} (4 triangles, each node in 3) + pendant 5.
        edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        edges.append((4, 5))
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r.id: r.triangles for r in triangle_count(df).collect()}
        assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}

    def test_direction_and_duplicates_ignored(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (1, 1)], ["src", "dst"]
        )
        got = {r.id: r.triangles for r in triangle_count(df).collect()}
        assert got == {1: 1, 2: 1, 3: 1}  # one triangle; loop/dups dropped


class TestNodeSimilarity:
    def test_jaccard_values(self, spark):
        # a:{x,y}, b:{x,y}, c:{y,z} → (a,b)=1.0, (a,c)=(b,c)=1/3.
        df = spark.createDataFrame(
            [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("c", "y"), ("c", "z")],
            ["src", "dst"],
        )
        got = {(r.a, r.b): round(r.jaccard, 6) for r in node_similarity(df).collect()}
        assert got == {("a", "b"): 1.0, ("a", "c"): 0.333333, ("b", "c"): 0.333333}

    def test_threshold_filters(self, spark):
        df = spark.createDataFrame(
            [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("c", "y"), ("c", "z")],
            ["src", "dst"],
        )
        got = {(r.a, r.b) for r in node_similarity(df, threshold=0.5).collect()}
        assert got == {("a", "b")}

    def test_hot_neighbor_cap_engages(self, spark):
        """A neighbor shared by every node would create O(n²) pairs; the
        cap removes it from the graph (exact similarity of the filtered
        graph) and reports it."""
        rows = [(f"n{i}", "hub") for i in range(50)]
        rows += [("n0", "p"), ("n1", "p")]
        df = spark.createDataFrame(rows, ["src", "dst"])
        sim, dropped = node_similarity(
            df, max_neighbor_degree=10, return_dropped=True
        )
        pairs = {(r.a, r.b): r.jaccard for r in sim.collect()}
        # hub removed → only the 'p'-sharing pair remains, with degrees
        # computed on the filtered graph (deg=1 each → jaccard 1.0).
        assert pairs == {("n0", "n1"): 1.0}
        drops = dropped.collect()
        assert len(drops) == 1 and drops[0].nbr == "hub" and drops[0].nbr_deg == 50


class TestBfsDistances:
    def test_chain_and_unreachable(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            bfs_distances,
        )

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("d", "b")],
            ["src", "dst"],
        )
        src = spark.createDataFrame([("a",)], ["id"])
        got = {r.id: r.dist for r in bfs_distances(edges, src).collect()}
        # directed: x/y unreachable from a; cycle d->b doesn't shorten b
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3}

    def test_multi_source_min(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            bfs_distances,
        )

        edges = spark.createDataFrame(
            [("a", "m"), ("b", "m"), ("m", "z")], ["src", "dst"]
        )
        src = spark.createDataFrame([("a",), ("b",)], ["id"])
        got = {r.id: r.dist for r in bfs_distances(edges, src).collect()}
        assert got == {"a": 0, "b": 0, "m": 1, "z": 2}

    def test_max_hops_backstop(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            bfs_distances,
        )

        edges = spark.createDataFrame(
            [(f"v{i}", f"v{i+1}") for i in range(10)], ["src", "dst"]
        )
        src = spark.createDataFrame([("v0",)], ["id"])
        got = bfs_distances(edges, src, max_hops=3)
        assert got.agg(F.max("dist")).first()[0] == 3  # truncated at backstop


class TestLabelPropagation:
    def test_clique_converges_to_min_label(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            label_propagation,
        )

        edges = spark.createDataFrame(
            [(a, b) for a in range(4) for b in range(a + 1, 4)]
            + [(10, 11), (11, 12), (10, 12)],
            ["src", "dst"],
        )
        got = {r.id: r.label for r in label_propagation(edges, iterations=4).collect()}
        assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10}

    def test_deterministic_across_runs(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            label_propagation,
        )

        edges = spark.createDataFrame(
            [(i, (i + 1) % 6) for i in range(6)] + [(0, 3)], ["src", "dst"]
        ).repartition(5)
        a = sorted((r.id, r.label) for r in label_propagation(edges, iterations=4).collect())
        b = sorted((r.id, r.label) for r in label_propagation(edges.repartition(2), iterations=4).collect())
        assert a == b  # partition-independent (min-label tie break, sync updates)


class TestReviewFixesR4:
    def test_lpa_self_loop_only_node_kept(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            label_propagation,
        )

        # self-loop-only node + a triangle (a 2-path would oscillate
        # under sync LPA — deterministic, but not converged; the
        # triangle settles on its min label)
        edges = spark.createDataFrame(
            [("a", "a"), ("b", "c"), ("c", "d"), ("b", "d")], ["src", "dst"]
        )
        got = {r.id: r.label for r in label_propagation(edges, iterations=4).collect()}
        assert got["a"] == "a"  # self-loop-only node keeps its label
        assert got["b"] == got["c"] == got["d"] == "b"

    def test_bfs_truncation_flag(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            bfs_distances,
        )

        edges = spark.createDataFrame(
            [(f"v{i}", f"v{i+1}") for i in range(10)], ["src", "dst"]
        )
        src = spark.createDataFrame([("v0",)], ["id"])
        _d, truncated = bfs_distances(edges, src, max_hops=3, return_truncated=True)
        assert truncated  # backstop fired with a live frontier
        _d2, t2 = bfs_distances(edges, src, max_hops=30, return_truncated=True)
        assert not t2  # frontier drained before the cap


class TestKCore:
    def test_clique_with_tail_peels_to_clique(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            k_core,
        )

        # K4 on {1..4} + tail 4-5-6: 3-core is exactly the clique
        edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        edges += [(4, 5), (5, 6)]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r.id: r.degree for r in k_core(df, k=3).collect()}
        assert got == {1: 3, 2: 3, 3: 3, 4: 3}
        # 2-core: tail end 6 peels, then 5; clique survives
        got2 = {r.id: r.degree for r in k_core(df, k=2).collect()}
        assert got2 == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_chain_peels_layer_per_round_and_truncation(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            k_core,
        )

        # open chain 0-1-...-7: 2-core is empty (peels from both ends,
        # 4 rounds); direction/duplicates/self-loops ignored
        chain = [(i, i + 1) for i in range(7)] + [(3, 3), (1, 0)]
        df = spark.createDataFrame(chain, ["src", "dst"])
        out, truncated = k_core(df, k=2, max_iter=10, return_truncated=True)
        assert out.count() == 0 and truncated is False

        # backstop: 1 round is not enough — truncated, and the result
        # is a SUPERSET of the true (empty) 2-core
        out1, trunc1 = k_core(df, k=2, max_iter=1, return_truncated=True)
        assert trunc1 is True
        ids = {r.id for r in out1.collect()}
        assert ids == {2, 3, 4, 5}  # ends 0,7 peeled; 1,6 dropped unpropagated

    def test_validation_and_empty(self, spark):
        import pytest

        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            k_core,
        )

        df = spark.createDataFrame([(1, 2)], ["src", "dst"])
        with pytest.raises(ValueError, match="k must be"):
            k_core(df, k=0)
        assert k_core(df.filter("src > 99"), k=2).count() == 0


class TestSsspWeighted:
    def test_shortest_paths_mix_shortcut_and_chain(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            sssp_weighted,
        )

        # a→b→c→d chain (1+5+1) with shortcut a→c (3): d = 3+1 = 4
        edges = [("a", "b", 1.0), ("b", "c", 5.0), ("c", "d", 1.0),
                 ("a", "c", 3.0), ("x", "y", 1.0)]  # x,y unreachable
        df = spark.createDataFrame(edges, ["src", "dst", "weight"])
        srcs = spark.createDataFrame([("a",)], ["id"])
        got = {r.id: r.dist for r in sssp_weighted(df, srcs).collect()}
        assert got == {"a": 0.0, "b": 1.0, "c": 3.0, "d": 4.0}

    def test_parallel_edges_keep_min_and_zero_weight_ok(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            sssp_weighted,
        )

        edges = [("a", "b", 7.0), ("a", "b", 2.0), ("b", "c", 0.0)]
        df = spark.createDataFrame(edges, ["src", "dst", "weight"])
        srcs = spark.createDataFrame([("a",)], ["id"])
        got = {r.id: r.dist for r in sssp_weighted(df, srcs).collect()}
        assert got == {"a": 0.0, "b": 2.0, "c": 2.0}

    def test_negative_weight_raises(self, spark):
        import pytest

        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            sssp_weighted,
        )

        df = spark.createDataFrame([("a", "b", -1.0)], ["src", "dst", "weight"])
        srcs = spark.createDataFrame([("a",)], ["id"])
        with pytest.raises(ValueError, match="non-negative"):
            sssp_weighted(df, srcs)

    def test_truncation_flag_and_upper_bounds(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            sssp_weighted,
        )

        # chain of 5 unit edges; 2 rounds can't settle the far end
        edges = [(i, i + 1, 1.0) for i in range(5)]
        df = spark.createDataFrame(edges, ["src", "dst", "weight"])
        srcs = spark.createDataFrame([(0,)], ["id"])
        out, truncated = sssp_weighted(df, srcs, max_iter=2, return_truncated=True)
        got = {r.id: r.dist for r in out.collect()}
        assert truncated is True
        # every reported distance is the true one (upper bound met
        # exactly on a chain); deep nodes absent
        assert got == {0: 0.0, 1: 1.0, 2: 2.0}
        out2, t2 = sssp_weighted(df, srcs, max_iter=10, return_truncated=True)
        assert t2 is False and len(out2.collect()) == 6


class TestPerSourceBfsAndCloseness:
    def _edges(self, spark):
        # a→b→c, a→c, c→d
        return spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")], ["src", "dst"]
        )

    def test_per_source_distances(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            bfs_distances,
        )

        seeds = spark.createDataFrame([("a",), ("b",)], ["id"])
        got = {
            (r.source, r.id): r.dist
            for r in bfs_distances(
                self._edges(spark), seeds, per_source=True
            ).collect()
        }
        assert got == {
            ("a", "a"): 0, ("a", "b"): 1, ("a", "c"): 1, ("a", "d"): 2,
            ("b", "b"): 0, ("b", "c"): 1, ("b", "d"): 2,
        }

    def test_harmonic_closeness(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            harmonic_closeness,
        )

        seeds = spark.createDataFrame([("a",), ("b",)], ["id"])
        got = {
            r.id: r.closeness
            for r in harmonic_closeness(self._edges(spark), seeds).collect()
        }
        # b: 1/1 (from a); c: 1/1 + 1/1; d: 1/2 + 1/2; a unreached by b
        assert got == {"b": 1.0, "c": 2.0, "d": 1.0}

    def test_harmonic_truncation_propagates(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            harmonic_closeness,
        )

        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(6)], ["src", "dst"]
        )
        seeds = spark.createDataFrame([(0,)], ["id"])
        out, truncated = harmonic_closeness(
            chain, seeds, max_hops=3, return_truncated=True
        )
        assert truncated is True  # nodes 4..6 beyond the cap
        assert {r.id for r in out.collect()} == {1, 2, 3}
        _o2, t2 = harmonic_closeness(
            chain, seeds, max_hops=10, return_truncated=True
        )
        assert t2 is False


class TestBetweenness:
    def test_diamond_hand_computed(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            betweenness,
        )

        # a→{b,d}→c→e diamond: from source a, σ(c)=2 and the
        # dependencies are b=1, d=1, c=1 (Brandes by hand).
        edges = [("a", "b"), ("b", "c"), ("a", "d"), ("d", "c"), ("c", "e")]
        df = spark.createDataFrame(edges, ["src", "dst"])
        one = spark.createDataFrame([("a",)], ["id"])
        got = {r.id: r.betweenness for r in betweenness(df, one).collect()}
        assert got == {"b": 1.0, "d": 1.0, "c": 1.0}

        # adding source b contributes 1 more to c (path b→c→e)
        two = spark.createDataFrame([("a",), ("b",)], ["id"])
        got2 = {r.id: r.betweenness for r in betweenness(df, two).collect()}
        assert got2 == {"b": 1.0, "d": 1.0, "c": 2.0}

    def test_chain_interior_counts(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            betweenness,
        )

        # directed chain 0→1→2→3→4, source 0: δ(k) = #targets beyond k
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(4)], ["src", "dst"]
        )
        srcs = spark.createDataFrame([(0,)], ["id"])
        got = {r.id: r.betweenness for r in betweenness(chain, srcs).collect()}
        assert got == {1: 3.0, 2: 2.0, 3: 1.0}

    def test_truncation_lower_bounds(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            betweenness,
        )

        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(5)], ["src", "dst"]
        )
        srcs = spark.createDataFrame([(0,)], ["id"])
        out, truncated = betweenness(
            chain, srcs, max_hops=2, return_truncated=True
        )
        got = {r.id: r.betweenness for r in out.collect()}
        assert truncated is True
        # only paths of length ≤ 2 seen: node 1 carries one through-path
        assert got == {1: 1.0}
        full, t2 = betweenness(chain, srcs, max_hops=10, return_truncated=True)
        assert t2 is False and {r.id: r.betweenness for r in full.collect()} == {
            1: 4.0, 2: 3.0, 3: 2.0, 4: 1.0
        }

    def test_source_with_no_edges_and_empty(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            betweenness,
        )

        df = spark.createDataFrame([("a", "b")], ["src", "dst"])
        lone = spark.createDataFrame([("z",)], ["id"])
        assert betweenness(df, lone).count() == 0


def _brute_scc(edges):
    """Min-id SCC labels via Python transitive closure."""
    nodes = {n for e in edges for n in e}
    reach = {n: {n} for n in nodes}
    changed = True
    while changed:
        changed = False
        for u, v in edges:
            new = reach[v] - reach[u]
            if new:
                reach[u] |= new
                changed = True
    return {
        n: min(m for m in nodes if n in reach[m] and m in reach[n])
        for n in nodes
    }


class TestStronglyConnectedComponents:
    def _run(self, spark, edges):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            strongly_connected_components,
        )

        df = spark.createDataFrame(edges, ["src", "dst"])
        got, trunc = strongly_connected_components(df, return_truncated=True)
        assert trunc is False
        return {r.id: r.scc_id for r in got.collect()}

    def test_two_cycles_one_way_bridge(self, spark):
        edges = [
            ("a", "b"), ("b", "c"), ("c", "a"),   # SCC {a,b,c}
            ("c", "x"),                            # bridge, one-way
            ("x", "y"), ("y", "x"),                # SCC {x,y}
            ("y", "z"),                            # sink singleton
        ]
        assert self._run(spark, edges) == _brute_scc(edges)

    def test_nested_color_classes_need_second_round(self, spark):
        # 2→1, 3→1, 0→2, 0→3: node 1's color class root (3) is not
        # backward-reachable from 1, so 1 resolves only in round 2.
        edges = [("n2", "n1"), ("n3", "n1"), ("n0", "n2"), ("n0", "n3")]
        got = self._run(spark, edges)
        assert got == _brute_scc(edges)
        assert len(set(got.values())) == 4  # all singletons

    def test_self_loop_only_node_kept(self, spark):
        edges = [("a", "a"), ("b", "c"), ("c", "b")]
        got = self._run(spark, edges)
        assert got["a"] == "a" and got["b"] == "b" and got["c"] == "b"

    def test_chain_all_singletons(self, spark):
        edges = [(f"v{i}", f"v{i+1}") for i in range(6)]
        got = self._run(spark, edges)
        assert got == {f"v{i}": f"v{i}" for i in range(7)}

    def test_random_digraph_matches_brute_force(self, spark):
        import random

        rng = random.Random(7)
        nodes = [f"k{i}" for i in range(18)]
        edges = list(
            {
                (rng.choice(nodes), rng.choice(nodes))
                for _ in range(45)
            }
        )
        assert self._run(spark, edges) == _brute_scc(edges)


class TestRandomWalks:
    EDGES = [
        ("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"),
        ("c", "a"), ("c", "d"),  # d is a sink
    ]

    def _walks(self, spark, **kw):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            random_walks,
        )

        df = spark.createDataFrame(self.EDGES, ["src", "dst"])
        return random_walks(df, **kw)

    def test_matches_manual_argmin_md5(self, spark):
        import hashlib

        adj = {}
        for u, v in self.EDGES:
            adj.setdefault(u, []).append(v)
        got = self._walks(spark, walk_length=3, walks_per_node=2).collect()
        walks = {}
        for r in got:
            walks.setdefault(r.walk_id, {})[r.step] = (r.start, r.node)
        for wid, steps in walks.items():
            start = wid.split("#")[0]
            assert steps[0] == (start, start)
            cur = start
            for i in range(1, 4):
                nbrs = adj.get(cur, [])
                if not nbrs:
                    assert i not in steps  # sink: walk stopped
                    break
                exp = min(
                    nbrs,
                    key=lambda w: hashlib.md5(
                        f"{wid}|{i}|{w}".encode()
                    ).hexdigest(),
                )
                assert steps[i] == (start, exp), (wid, i)
                cur = exp

    def test_deterministic_across_runs(self, spark):
        a = sorted(map(tuple, self._walks(spark, walk_length=4).collect()))
        b = sorted(map(tuple, self._walks(spark, walk_length=4).collect()))
        assert a == b

    def test_walk_count(self, spark):
        got = self._walks(spark, walk_length=2, walks_per_node=3)
        n_starts = 4  # a,b,c,d
        assert (
            got.filter("step = 0").count() == n_starts * 3
        )


class TestWalkPmiEmbedding:
    """PPMI walk embedding (graph_algos.walk_pmi_embedding) vs a pure-
    Python twin that replays the identical md5-argmin walks and PPMI
    arithmetic."""

    EDGES = [
        ("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"),
        ("c", "a"), ("c", "d"),  # d is a sink
    ]

    def _brute(self, walk_length, walks_per_node, window):
        import hashlib
        import math

        adj = {}
        for u, v in self.EDGES:
            adj.setdefault(u, []).append(v)
        starts = sorted({u for u, _ in self.EDGES} | {v for _, v in self.EDGES})
        walks = []
        for s in starts:
            for j in range(walks_per_node):
                wid, cur, path = f"{s}#{j}", s, [s]
                for i in range(1, walk_length + 1):
                    nbrs = adj.get(cur, [])
                    if not nbrs:
                        break
                    cur = min(
                        nbrs,
                        key=lambda w: hashlib.md5(
                            f"{wid}|{i}|{w}".encode()
                        ).hexdigest(),
                    )
                    path.append(cur)
                walks.append(path)
        co = {}
        for path in walks:
            for i, x in enumerate(path):
                for k, y in enumerate(path):
                    if i != k and abs(i - k) <= window:
                        co[(x, y)] = co.get((x, y), 0) + 1
        marg = {}
        for (x, _), n in co.items():
            marg[x] = marg.get(x, 0) + n
        total = sum(co.values())
        out = {}
        for (x, y), n in co.items():
            if n * total > marg[x] * marg[y]:
                out[(x, y)] = (
                    n,
                    round(math.log(float(n) * total / (float(marg[x]) * marg[y])), 6),
                )
        return out

    def test_matches_brute_force(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            walk_pmi_embedding,
        )

        df = spark.createDataFrame(self.EDGES, ["src", "dst"])
        got = {
            (r.node_id, r.context): (r.n_co, r.ppmi)
            for r in walk_pmi_embedding(
                df, walk_length=3, walks_per_node=2, window=2
            ).collect()
        }
        assert got == self._brute(3, 2, 2)

    def test_symmetric_counts(self, spark):
        """Co-occurrence is direction-symmetric: n_co(x,y) == n_co(y,x)."""
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            walk_pmi_embedding,
        )

        df = spark.createDataFrame(self.EDGES, ["src", "dst"])
        rows = walk_pmi_embedding(df, walk_length=4, window=2).collect()
        n = {(r.node_id, r.context): r.n_co for r in rows}
        for (x, y), v in n.items():
            assert n.get((y, x)) == v

    def test_window_bounds_pairs(self, spark):
        """window=1 only pairs adjacent steps; a 2-step path of distinct
        nodes yields no (start, end) row."""
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            walk_pmi_embedding,
        )

        df = spark.createDataFrame([("x", "y"), ("y", "z")], ["src", "dst"])
        rows = walk_pmi_embedding(df, walk_length=2, window=1).collect()
        assert ("x", "z") not in {(r.node_id, r.context) for r in rows}

    def test_window_validation(self, spark):
        import pytest

        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            walk_pmi_embedding,
        )

        df = spark.createDataFrame(self.EDGES, ["src", "dst"])
        with pytest.raises(ValueError):
            walk_pmi_embedding(df, window=0)


class TestLinkPrediction:
    """gds.alpha.linkprediction.* family, set-wise (graph_algos.link_prediction)."""

    def _base(self, spark):
        # hub h—{a,b,c}, edge a—b, pendant c—d.
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            link_prediction,
        )

        df = spark.createDataFrame(
            [("h", "a"), ("h", "b"), ("h", "c"), ("a", "b"), ("c", "d")],
            ["src", "dst"],
        )
        return link_prediction, df

    def test_measures_hand_computed(self, spark):
        import math

        link_prediction, df = self._base(spark)
        got = {
            (r.a, r.b): (
                r.common_neighbors,
                round(r.adamic_adar, 6),
                round(r.resource_allocation, 6),
                r.preferential_attachment,
            )
            for r in link_prediction(df).collect()
        }
        ln2, ln3 = math.log(2), math.log(3)
        assert got == {
            # (a,c) and (b,c) through h (deg 3); (d,h) through c (deg 2).
            ("a", "c"): (1, round(1 / ln3, 6), 0.333333, 4),
            ("b", "c"): (1, round(1 / ln3, 6), 0.333333, 4),
            ("d", "h"): (1, round(1 / ln2, 6), 0.5, 3),
        }

    def test_adjacent_pairs_excluded_and_min_score(self, spark):
        link_prediction, df = self._base(spark)
        pairs = {(r.a, r.b) for r in link_prediction(df).collect()}
        # (a,b) shares h but is an existing edge; same for (a,h)/(b,h).
        assert ("a", "b") not in pairs and ("a", "h") not in pairs
        strong = {
            (r.a, r.b)
            for r in link_prediction(df, min_score=1.0).collect()
        }
        assert strong == {("d", "h")}  # adamic_adar 1/ln2 ≈ 1.44 only

    def test_multiple_shared_neighbors_sum(self, spark):
        import math

        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            link_prediction,
        )

        # 4-cycle a-b-c-d-a: diagonals share TWO deg-2 neighbors.
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], ["src", "dst"]
        )
        got = {
            (r.a, r.b): (
                r.common_neighbors,
                round(r.adamic_adar, 6),
                round(r.resource_allocation, 6),
                r.preferential_attachment,
            )
            for r in link_prediction(df).collect()
        }
        aa = round(2 / math.log(2), 6)
        assert got == {("a", "c"): (2, aa, 1.0, 4), ("b", "d"): (2, aa, 1.0, 4)}

    def test_hub_cap_bounds_fanout_but_not_degrees(self, spark):
        """Over-cap through-nodes generate no candidate pairs (reported,
        never silent) — but full degrees still weight preferential
        attachment, the documented measure-definition choice."""
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            link_prediction,
        )
        import math

        rows = [("H", f"n{i}") for i in range(20)]
        rows += [("p", "n0"), ("p", "n1")]
        df = spark.createDataFrame(rows, ["src", "dst"])
        scores, dropped = link_prediction(
            df, max_neighbor_degree=10, return_dropped=True
        )
        got = {
            (r.a, r.b): (
                r.common_neighbors,
                round(r.adamic_adar, 6),
                r.preferential_attachment,
            )
            for r in scores.collect()
        }
        # Through-H pairs are gone (190 of them without the cap); what
        # remains: (n0,n1) through p only — CN counts p, NOT the capped
        # H — and (H,p) through the two deg-2 leaves n0/n1. PA keeps
        # full degrees: deg(n0)·deg(n1) = 2·2, deg(H)·deg(p) = 20·2.
        assert got == {
            ("n0", "n1"): (1, round(1 / math.log(2), 6), 4),
            ("H", "p"): (2, round(2 / math.log(2), 6), 40),
        }
        assert {(r.nbr, r.nbr_deg) for r in dropped.collect()} == {("H", 20)}

    def test_score_on_validation(self, spark):
        link_prediction, df = self._base(spark)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            link_prediction(df, score_on="nope")


class TestKTruss:
    GADGET = [
        # K4 core, side triangle {3,4,5}, pendant 5-6, hanging
        # triangle {0,1,7}, second-tier triangle {0,7,8} — the
        # q_graph_ktruss cascade topology on plain int-ish labels.
        ("0", "1"), ("0", "2"), ("0", "3"), ("1", "2"), ("1", "3"),
        ("2", "3"), ("3", "4"), ("3", "5"), ("4", "5"), ("5", "6"),
        ("0", "7"), ("1", "7"), ("0", "8"), ("7", "8"),
    ]

    def test_k3_keeps_all_triangle_edges(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            k_truss,
        )

        df = spark.createDataFrame(self.GADGET, ["src", "dst"])
        got = {(r.a, r.b): r.support for r in k_truss(df, k=3).collect()}
        # only the triangle-free pendant 5-6 dies; everything else has
        # >= 1 in-truss triangle after it goes.
        assert ("5", "6") not in got
        assert set(got) == set(self.GADGET) - {("5", "6")}
        assert got[("0", "1")] == 3  # {2},{3},{7} all still in the 3-truss
        assert got[("4", "5")] == 1

    def test_k4_cascades_to_k4_core(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            k_truss,
        )

        df = spark.createDataFrame(self.GADGET, ["src", "dst"])
        got = {(r.a, r.b): r.support for r in k_truss(df, k=4).collect()}
        # round 1 kills the side/hanging/second-tier triangle edges,
        # round 2 kills (0,7) whose wedges died in round 1 — K4 remains.
        k4 = {("0", "1"), ("0", "2"), ("0", "3"), ("1", "2"), ("1", "3"), ("2", "3")}
        assert set(got) == k4
        assert all(s == 2 for s in got.values())

    def test_truncation_is_superset(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            k_truss,
        )

        df = spark.createDataFrame(self.GADGET, ["src", "dst"])
        # max_iter=0: the final filter applies round 1's removals but
        # round 2 never runs — (0,7), whose support only collapses once
        # the round-1 victims are gone, is still reported.
        part, truncated = k_truss(df, k=4, max_iter=0, return_truncated=True)
        full = k_truss(df, k=4)
        part_set = {(r.a, r.b) for r in part.collect()}
        full_set = {(r.a, r.b) for r in full.collect()}
        assert truncated
        assert full_set < part_set  # backstop fired mid-peel → superset
        assert ("0", "7") in part_set  # the round-2 victim still present
        # max_iter=1 happens to reach the truss here (the final filter
        # IS round 2's removal), but the flag still reports the
        # unverified fixpoint honestly.
        part1, t1 = k_truss(df, k=4, max_iter=1, return_truncated=True)
        assert t1 and {(r.a, r.b) for r in part1.collect()} == full_set

    def test_k2_is_all_edges_and_validation(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            k_truss,
        )
        import pytest as _pytest

        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "a"), ("b", "a")], ["src", "dst"]
        )
        got = {(r.a, r.b): r.support for r in k_truss(df, k=2).collect()}
        # support >= 0 keeps every canonical edge; loops/dups dropped.
        assert got == {("a", "b"): 0, ("b", "c"): 0}
        with _pytest.raises(ValueError):
            k_truss(df, k=1)


class TestDiameterTwoSweep:
    def test_path_graph_exact(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            diameter_two_sweep,
        )

        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], ["src", "dst"]
        )
        r = diameter_two_sweep(df).collect()[0]
        # two-sweep is exact on trees: seed a → farthest e → back to a.
        assert (r.seed, r.peripheral, r.far_node, r.diameter_lb, r.truncated) == (
            "a", "e", "a", 4, False,
        )

    def test_even_cycle_exact_and_star(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            diameter_two_sweep,
        )

        cyc = spark.createDataFrame(
            [(f"c{i}", f"c{(i + 1) % 6}") for i in range(6)], ["src", "dst"]
        )
        assert diameter_two_sweep(cyc).collect()[0].diameter_lb == 3
        star = spark.createDataFrame(
            [("c", "l1"), ("c", "l2"), ("c", "l3")], ["src", "dst"]
        )
        star_r = diameter_two_sweep(star).collect()[0]
        assert star_r.diameter_lb == 2 and star_r.seed == "c"

    def test_disconnected_scopes_to_seed_component(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            diameter_two_sweep,
        )

        df = spark.createDataFrame(
            [("a", "b"), ("x", "y"), ("y", "z"), ("z", "w")], ["src", "dst"]
        )
        r = diameter_two_sweep(df).collect()[0]
        # min id 'a' seeds the 2-node component; the bigger one is
        # invisible by contract.
        assert r.seed == "a" and r.diameter_lb == 1

    def test_truncation_reported(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            diameter_two_sweep,
        )

        df = spark.createDataFrame(
            [(f"v{i}", f"v{i+1}") for i in range(9)], ["src", "dst"]
        )
        r = diameter_two_sweep(df, max_hops=2).collect()[0]
        assert r.truncated and r.diameter_lb <= 4  # slack bound, flagged


class TestGraphStats:
    def test_star_is_maximally_disassortative(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            graph_stats,
        )

        star = spark.createDataFrame(
            [("c", f"l{i}") for i in range(4)], ["src", "dst"]
        )
        r = graph_stats(star).collect()[0]
        assert (r.n_nodes, r.n_edges, r.max_degree) == (5, 4, 4)
        assert r.avg_degree == 1.6
        assert r.assortativity == -1.0  # hubs only ever touch leaves

    def test_regular_graph_null_r_and_hygiene(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            graph_stats,
        )

        # 4-cycle + a self-loop + a duplicate edge: all degrees 2 →
        # zero variance → r is NULL, never a fake number.
        cyc = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "a"), ("b", "a")],
            ["src", "dst"],
        )
        r = graph_stats(cyc).collect()[0]
        assert (r.n_nodes, r.n_edges, r.max_degree, r.avg_degree) == (4, 4, 2, 2.0)
        assert r.assortativity is None

    def test_matches_numpy_pearson(self, spark):
        import numpy as np

        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            graph_stats,
        )

        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("b", "d"), ("d", "e")]
        df = spark.createDataFrame(edges, ["src", "dst"])
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        pairs = [(deg[u], deg[v]) for u, v in edges]
        pairs += [(k, j) for j, k in pairs]
        j = np.array([p[0] for p in pairs], dtype=float)
        k = np.array([p[1] for p in pairs], dtype=float)
        expected = round(float(np.corrcoef(j, k)[0, 1]), 6)
        got = graph_stats(df).collect()[0]
        assert round(got.assortativity, 6) == expected


class TestKatzCentrality:
    """Truncated Katz (graph_algos.katz_centrality) vs a pure-Python
    replay of the affine recurrence."""

    EDGES = [
        ("a", "b"), ("b", "c"), ("c", "a"),  # 3-cycle
        ("a", "c"),                           # shortcut
        ("d", "a"),                           # source-only node d
        ("a", "b"),                           # parallel edge: counted once
    ]

    def _brute(self, alpha, beta, iterations):
        e = sorted(set(self.EDGES))
        nodes = sorted({u for u, _ in e} | {v for _, v in e})
        x = {n: beta for n in nodes}
        for _ in range(iterations):
            s = {n: 0.0 for n in nodes}
            for u, v in e:
                s[v] += x[u]
            x = {n: alpha * s[n] + beta for n in nodes}
        return {n: round(v, 6) for n, v in x.items()}

    def test_matches_brute(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            katz_centrality,
        )

        df = spark.createDataFrame(self.EDGES, ["src", "dst"])
        got = {
            r.node_id: r.katz
            for r in katz_centrality(df, iterations=3).collect()
        }
        assert got == self._brute(0.1, 1.0, 3)
        # d receives no walks → exactly beta at every step
        assert got["d"] == 1.0
        # c gains from the shortcut: strictly more central than d
        assert got["c"] > got["d"]

    def test_alpha_beta_and_validation(self, spark):
        import pytest as _pytest

        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            katz_centrality,
        )

        df = spark.createDataFrame(self.EDGES, ["src", "dst"])
        got = {
            r.node_id: r.katz
            for r in katz_centrality(
                df, alpha=0.25, beta=2.0, iterations=2
            ).collect()
        }
        assert got == self._brute(0.25, 2.0, 2)
        with _pytest.raises(ValueError):
            katz_centrality(df, iterations=0)


class TestNode2vecWalks:
    EDGES = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
        ("a", "c"), ("c", "a"), ("c", "d"), ("d", "c"),
        ("c", "e"),  # e is a sink
    ]

    def _walks(self, spark, **kw):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            node2vec_walks,
        )

        df = spark.createDataFrame(self.EDGES, ["src", "dst"])
        return node2vec_walks(df, **kw)

    @staticmethod
    def _clock(wid, i, x, w):
        import hashlib
        import math

        d = hashlib.md5(f"n2v:{wid}|{i}|{x}".encode()).digest()
        b = int.from_bytes(d[:8], "little") % 1_000_000
        return round(-math.log((b + 0.5) / 1_000_000.0) * w, 9)

    def _replay(self, p, q, walk_length, walks_per_node):
        adj = {}
        for u, v in self.EDGES:
            adj.setdefault(u, set()).add(v)
        nodes = sorted({u for u, _ in self.EDGES} | {v for _, v in self.EDGES})
        rows = set()
        for start in nodes:
            for j in range(walks_per_node):
                wid = f"{start}#{j}"
                prev, cur = None, start
                rows.add((wid, start, 0, start))
                for i in range(1, walk_length + 1):
                    nbrs = sorted(adj.get(cur, ()))
                    if not nbrs:
                        break
                    best = None
                    for x in nbrs:
                        if prev is None:
                            w = 1.0
                        elif x == prev:
                            w = p
                        elif x in adj.get(prev, ()):
                            w = 1.0
                        else:
                            w = q
                        key = (self._clock(wid, i, x, w), x)
                        if best is None or key < best[0]:
                            best = (key, x)
                    prev, cur = cur, best[1]
                    rows.add((wid, start, i, cur))
        return rows

    def test_matches_pure_python_replay(self, spark):
        for p, q in ((4.0, 0.25), (0.25, 4.0), (1.0, 1.0)):
            got = {
                (r.walk_id, r.start, r.step, r.node)
                for r in self._walks(
                    spark, walk_length=3, walks_per_node=2, p=p, q=q
                ).collect()
            }
            assert got == self._replay(p, q, 3, 2), (p, q)

    def test_rerun_deterministic(self, spark):
        a = sorted(
            map(tuple, self._walks(spark, walk_length=3, p=2.0, q=0.5).collect())
        )
        b = sorted(
            map(tuple, self._walks(spark, walk_length=3, p=2.0, q=0.5).collect())
        )
        assert a == b

    def test_sink_terminates(self, spark):
        rows = [
            r
            for r in self._walks(spark, walk_length=5, p=1.0, q=1.0).collect()
            if r.walk_id == "e#0"
        ]
        assert len(rows) == 1 and rows[0].step == 0  # e has no out-edges

    def test_validation(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="positive"):
            self._walks(spark, p=0.0)
        with _pytest.raises(ValueError, match="positive"):
            self._walks(spark, q=-1.0)
        with _pytest.raises(ValueError):
            self._walks(spark, walk_length=-1)


class TestConnectedComponentsIncrement:
    def _cc(self, spark, edges):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            connected_components,
        )

        return connected_components(spark.createDataFrame(edges, ["a", "b"]))

    def _inc(self, spark, assign, batch):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            connected_components_increment,
        )

        return connected_components_increment(
            assign, spark.createDataFrame(batch, ["a", "b"])
        )

    def test_equals_batch_over_union(self, spark):
        import random

        rng = random.Random(7)
        nodes = list(range(40))
        all_edges = [
            (min(x, y), max(x, y))
            for x, y in (
                (rng.choice(nodes), rng.choice(nodes)) for _ in range(60)
            )
            if x != y
        ]
        cut = len(all_edges) // 2
        b1, b2 = all_edges[:cut], all_edges[cut:]
        inc = {
            (r.id, r.component)
            for r in self._inc(spark, self._cc(spark, b1), b2).collect()
        }
        full = {
            (r.id, r.component) for r in self._cc(spark, all_edges).collect()
        }
        assert inc == full

    def test_new_nodes_and_chained_merges(self, spark):
        # batch 1: {1,2} and {5,6}; batch 2 chains them AND brings in
        # brand-new nodes 3,4 as the bridge — a transitive merge that
        # must run THROUGH the new nodes.
        a1 = self._cc(spark, [(1, 2), (5, 6)])
        got = {
            (r.id, r.component)
            for r in self._inc(spark, a1, [(2, 3), (3, 4), (4, 5)]).collect()
        }
        assert got == {(i, 1) for i in range(1, 7)}

    def test_disjoint_batch_adds_singpairs(self, spark):
        a1 = self._cc(spark, [(1, 2)])
        got = {
            (r.id, r.component)
            for r in self._inc(spark, a1, [(10, 11)]).collect()
        }
        assert got == {(1, 1), (2, 1), (10, 10), (11, 10)}

    def test_noop_batch_keeps_assignment(self, spark):
        a1 = self._cc(spark, [(1, 2), (2, 3)])
        got = {
            (r.id, r.component)
            for r in self._inc(spark, a1, [(1, 3)]).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1)}


class TestAnfBallSizes:
    """HyperANF: the sketch after t rounds must equal the HLL built
    directly over the EXACT ball membership (set-union semantics make
    the recurrence path-independent), witnessed by s_scaled."""

    @staticmethod
    def _mirror(edges, hops, m=16, directed=False, scale=59, w_bits=58):
        import collections
        import hashlib

        adj = collections.defaultdict(set)
        nodes = set()
        for u, v in edges:
            nodes.update((u, v))
            adj[u].add(v)
            if not directed:
                adj[v].add(u)

        def rank(w):
            if w == 0:
                return scale
            for r in range(1, w_bits + 1):
                if w >= 1 << (w_bits - r):
                    return r
            return scale

        alpha = 0.7213 / (1.0 + 1.079 / m)
        numer = alpha * m * m * float(1 << scale)
        out = {}
        for v in nodes:
            ball = {v}
            for _ in range(hops):
                ball |= {w for u in ball for w in adj[u]}
            regs = [0] * m
            for u in ball:
                h = int.from_bytes(
                    hashlib.md5(f"anf:{u}".encode()).digest()[:8], "little"
                )
                j = h % m
                regs[j] = max(regs[j], rank(h // m))
            s = sum(1 << (scale - x) for x in regs)
            out[v] = (
                sum(1 for x in regs if x == 0),
                str(s),
                round(numer / s, 3),
            )
        return out

    def test_undirected_matches_exact_ball_hll(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            anf_ball_sizes,
        )

        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            r.id: (r.n_zero, r.s_scaled, r.est_ball)
            for r in anf_ball_sizes(df, hops=2, p=4).collect()
        }
        assert got == self._mirror(edges, hops=2)

    def test_directed_forward_ball(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            anf_ball_sizes,
        )

        edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            r.id: (r.n_zero, r.s_scaled, r.est_ball)
            for r in anf_ball_sizes(df, hops=3, p=3, directed=True).collect()
        }
        assert got == self._mirror(edges, hops=3, m=8, directed=True)

    def test_hops_zero_is_singleton_sketch(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            anf_ball_sizes,
        )

        df = spark.createDataFrame([("a", "b")], ["src", "dst"])
        got = {
            r.id: (r.n_zero, r.s_scaled)
            for r in anf_ball_sizes(df, hops=0, p=4).collect()
        }
        exp = self._mirror([("a", "b")], hops=0)
        assert got == {k: v[:2] for k, v in exp.items()}
        assert all(nz == 15 for nz, _s in got.values())

    def test_null_endpoints_dropped(self, spark):
        # a corrupt null endpoint must not fabricate an all-empty-
        # register node (raw est = alpha*m) in the output
        from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
            anf_ball_sizes,
        )

        df = spark.createDataFrame(
            [("a", "b"), ("b", None), (None, "a")],
            "src string, dst string",
        )
        got = {
            r.id: (r.n_zero, r.s_scaled, r.est_ball)
            for r in anf_ball_sizes(df, hops=2, p=4).collect()
        }
        assert set(got) == {"a", "b"}
        assert got == self._mirror([("a", "b")], hops=2)
