"""PageRank operator: analytic fixtures + exact recurrence parity."""

from __future__ import annotations

import pytest

from threat_intelligence_knowledge_graph_spark.operators.pagerank import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src_id", "dst_id"])


class TestPagerank:
    def test_cycle_is_uniform(self, spark):
        # On a directed cycle every node keeps rank 1/n at every step
        # (uniform start is a fixed point up to float error).
        n = 12
        e = _edges(spark, [(f"v{i}", f"v{(i + 1) % n}") for i in range(n)])
        got = {r.id: r.rank for r in pagerank(e, iterations=5).collect()}
        assert len(got) == n
        for v in got.values():
            assert abs(v - 1.0 / n) < 1e-12

    def test_dangling_mass_conserved(self, spark):
        # b and c are sinks; total rank must still sum to 1 every run.
        e = _edges(spark, [("a", "b"), ("a", "c"), ("d", "a")])
        ranks = pagerank(e, iterations=7).collect()
        assert abs(sum(r.rank for r in ranks) - 1.0) < 1e-9

    def test_matches_numpy_power_iteration(self, spark):
        import random

        import numpy as np

        rng = random.Random(17)
        nodes = [f"n{i}" for i in range(30)]
        pairs = sorted(
            {
                (nodes[rng.randrange(30)], nodes[rng.randrange(30)])
                for _ in range(120)
            }
        )
        pairs = [(a, b) for a, b in pairs if a != b]
        idx = {v: i for i, v in enumerate(nodes)}
        k, d, n = 6, 0.85, len(nodes)

        outdeg = np.zeros(n)
        for a, _b in pairs:
            outdeg[idx[a]] += 1
        r = np.full(n, 1.0 / n)
        for _ in range(k):
            dangling = r[outdeg == 0].sum()
            c = np.zeros(n)
            for a, b in pairs:
                c[idx[b]] += r[idx[a]] * (1.0 / outdeg[idx[a]])
            r = (1.0 - d) / n + d * (c + dangling / n)

        got = {
            row.id: row.rank
            for row in pagerank(
                _edges(spark, pairs), iterations=k, damping=d
            ).collect()
        }
        # Some nodes may be isolated (never drawn) — pagerank only ranks
        # nodes that appear in the edge list.
        for v, i in idx.items():
            if v in got:
                assert got[v] == pytest.approx(r[i], abs=1e-9)

    def test_weighted_matches_numpy_power_iteration(self, spark):
        import random

        import numpy as np

        rng = random.Random(23)
        nodes = [f"n{i}" for i in range(25)]
        triples = sorted(
            {
                (nodes[rng.randrange(25)], nodes[rng.randrange(25)],
                 float(rng.randrange(1, 5)))
                for _ in range(100)
            }
        )
        triples = [(a, b, w) for a, b, w in triples if a != b]
        idx = {v: i for i, v in enumerate(nodes)}
        k, d, n = 5, 0.85, len(nodes)

        # numpy reference: weight-proportional flow, weights summed per
        # (src, dst) — duplicates possible when rng draws (a,b) twice
        from collections import defaultdict
        wsum: dict = defaultdict(float)
        for a, b, w in triples:
            wsum[(a, b)] += w
        outw = np.zeros(n)
        for (a, _b), w in wsum.items():
            outw[idx[a]] += w
        r = np.full(n, 1.0 / n)
        for _ in range(k):
            dangling = r[outw == 0].sum()
            c = np.zeros(n)
            for (a, b), w in wsum.items():
                c[idx[b]] += r[idx[a]] * (w / outw[idx[a]])
            r = (1.0 - d) / n + d * (c + dangling / n)

        df = spark.createDataFrame(triples, ["src_id", "dst_id", "wt"])
        got = {
            row.id: row.rank
            for row in pagerank(
                df, iterations=k, damping=d, weight="wt"
            ).collect()
        }
        for v, i in idx.items():
            if v in got:
                assert got[v] == pytest.approx(r[i], abs=1e-9)

    def test_weighted_drops_nonpositive_and_follows_weight(self, spark):
        # a→b weight 3, a→c weight 1: b receives 3× c's inflow share;
        # a zero-weight edge a→d is dropped entirely (d never appears).
        df = spark.createDataFrame(
            [("a", "b", 3.0), ("a", "c", 1.0), ("a", "d", 0.0)],
            ["src_id", "dst_id", "wt"],
        )
        got = {r.id: r.rank for r in pagerank(df, iterations=2, weight="wt").collect()}
        assert "d" not in got
        assert got["b"] > got["c"]

    def test_star_orders_hub_first(self, spark):
        e = _edges(spark, [(f"leaf{i}", "hub") for i in range(8)])
        got = {r.id: r.rank for r in pagerank(e, iterations=10).collect()}
        assert got["hub"] == max(got.values())
        leaf_vals = {v for k, v in got.items() if k != "hub"}
        assert len(leaf_vals) == 1  # symmetric leaves tie exactly

    def test_empty_graph_returns_empty_frame(self, spark):
        # e.g. hot_infrastructure over a run that produced no triples —
        # must not divide by zero on the driver.
        e = spark.createDataFrame([], "src_id string, dst_id string")
        got = pagerank(e, iterations=3)
        assert got.columns == ["id", "rank"]
        assert got.count() == 0

    def test_validation(self, spark):
        e = _edges(spark, [("a", "b")])
        with pytest.raises(ValueError):
            pagerank(e, iterations=0)
        with pytest.raises(ValueError):
            pagerank(e, damping=1.0)

    def test_personalized_matches_numpy_power_iteration(self, spark):
        import random

        import numpy as np

        rng = random.Random(23)
        nodes = [f"n{i}" for i in range(24)]
        pairs = sorted(
            {
                (nodes[rng.randrange(24)], nodes[rng.randrange(24)])
                for _ in range(90)
            }
        )
        pairs = [(a, b) for a, b in pairs if a != b]
        present = sorted({a for a, _ in pairs} | {b for _, b in pairs})
        idx = {v: i for i, v in enumerate(present)}
        seeds = [present[0], present[3], "not-in-graph"]
        sk = 2  # seeds present in the graph
        k, d, n = 5, 0.85, len(present)

        t = np.zeros(n)
        for s in seeds:
            if s in idx:
                t[idx[s]] = 1.0 / sk
        outdeg = np.zeros(n)
        for a, _b in pairs:
            outdeg[idx[a]] += 1
        r = t.copy()
        for _ in range(k):
            dangling = r[outdeg == 0].sum()
            c = np.zeros(n)
            for a, b in pairs:
                c[idx[b]] += r[idx[a]] * (1.0 / outdeg[idx[a]])
            r = (1.0 - d) * t + d * (c + dangling * t)

        got = {
            row.id: row.rank
            for row in pagerank(
                _edges(spark, pairs), iterations=k, damping=d, seeds=seeds
            ).collect()
        }
        assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
        for v, i in idx.items():
            assert got[v] == pytest.approx(r[i], abs=1e-9)

    def test_personalized_unreachable_is_zero_and_seed_validation(self, spark):
        # two components: a->b and c->d; seeding on a gives c,d rank 0
        e = _edges(spark, [("a", "b"), ("c", "d")])
        got = {r.id: r.rank for r in pagerank(e, iterations=4, seeds=["a"]).collect()}
        assert got["c"] == 0.0 and got["d"] == 0.0
        assert got["a"] > 0 and got["b"] > 0
        with pytest.raises(ValueError, match="no seed"):
            pagerank(e, iterations=2, seeds=["zzz"])
