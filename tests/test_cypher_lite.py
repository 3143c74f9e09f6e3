"""Cypher-lite translator: the ad-hoc MATCH surface (reference
neo4j_store.py:175-208 pass-through parity for the supported subset)."""

from __future__ import annotations

import pytest

from threat_intelligence_knowledge_graph_spark.plans.cypher_lite import (
    CypherSyntaxError,
    cypher_query,
)
from threat_intelligence_knowledge_graph_spark.schemas import (
    EDGES_SCHEMA,
    NODES_SCHEMA,
)


@pytest.fixture(scope="module")
def graph(spark):
    nodes = spark.createDataFrame(
        [
            ("Malware", "Mal_A", {"name": "emotet", "size": "7"}),
            ("Malware", "Mal_B", {"name": "qbot", "size": "3"}),
            ("Domain", "Dom_X", {"name": "x.evil.net"}),
            ("Domain", "Dom_Y", {"name": "y.evil.net"}),
            ("Ipv4", "Ip_1", {"name": "10.0.0.1"}),
        ],
        NODES_SCHEMA,
    )
    edges = spark.createDataFrame(
        [
            ("Malware", "Mal_A", "COMMUNICATES_WITH", "Domain", "Dom_X"),
            ("Malware", "Mal_A", "COMMUNICATES_WITH", "Domain", "Dom_Y"),
            ("Malware", "Mal_B", "COMMUNICATES_WITH", "Domain", "Dom_X"),
            ("Domain", "Dom_X", "RESOLVES_TO", "Ipv4", "Ip_1"),
        ],
        EDGES_SCHEMA,
    )
    return nodes, edges


def q(spark, graph, text):
    return cypher_query(spark, text, nodes=graph[0], edges=graph[1])


class TestMatchBasics:
    def test_label_scan_and_order(self, spark, graph):
        got = q(spark, graph, "MATCH (m:Malware) RETURN m ORDER BY m").collect()
        assert [r.m for r in got] == ["Mal_A", "Mal_B"]

    def test_property_map_and_hop(self, spark, graph):
        got = q(
            spark,
            graph,
            "MATCH (m:Malware {name: 'emotet'})-[r:COMMUNICATES_WITH]->"
            "(d:Domain) RETURN d.name AS domain ORDER BY domain",
        ).collect()
        assert [r.domain for r in got] == ["x.evil.net", "y.evil.net"]

    def test_reversed_direction(self, spark, graph):
        got = q(
            spark, graph, "MATCH (i:Ipv4)<-[:RESOLVES_TO]-(d) RETURN d"
        ).collect()
        assert [r.d for r in got] == ["Dom_X"]

    def test_two_hop_distinct(self, spark, graph):
        got = q(
            spark,
            graph,
            "MATCH (m:Malware)-[:COMMUNICATES_WITH]->(d)-[:RESOLVES_TO]->"
            "(i:Ipv4) RETURN DISTINCT m, i.name AS ip ORDER BY m",
        ).collect()
        assert [(r.m, r.ip) for r in got] == [
            ("Mal_A", "10.0.0.1"),
            ("Mal_B", "10.0.0.1"),
        ]

    def test_undirected_hop(self, spark, graph):
        got = q(
            spark, graph,
            "MATCH (d:Domain)-[:RESOLVES_TO]-(x) RETURN x ORDER BY x",
        ).collect()
        assert [r.x for r in got] == ["Ip_1"]

    def test_rel_variable_returns_type(self, spark, graph):
        got = q(
            spark, graph,
            "MATCH (a)-[r]->(b) RETURN DISTINCT r AS t ORDER BY t",
        ).collect()
        assert [r.t for r in got] == ["COMMUNICATES_WITH", "RESOLVES_TO"]

    def test_limit(self, spark, graph):
        got = q(
            spark, graph, "MATCH (m:Malware) RETURN m ORDER BY m LIMIT 1"
        ).collect()
        assert [r.m for r in got] == ["Mal_A"]


class TestWhere:
    def test_numeric_weak_typing(self, spark, graph):
        got = q(
            spark, graph, "MATCH (m:Malware) WHERE m.size > 5 RETURN m"
        ).collect()
        assert [r.m for r in got] == ["Mal_A"]

    def test_contains_and_pseudo_id(self, spark, graph):
        got = q(
            spark,
            graph,
            "MATCH (d:Domain) WHERE d.name CONTAINS 'evil' "
            "AND d.id <> 'Dom_Y' RETURN d",
        ).collect()
        assert [r.d for r in got] == ["Dom_X"]

    def test_starts_with_and_in(self, spark, graph):
        got = q(
            spark, graph,
            "MATCH (d:Domain) WHERE d.name STARTS WITH 'x.' RETURN d",
        ).collect()
        assert [r.d for r in got] == ["Dom_X"]
        got = q(
            spark, graph,
            "MATCH (m:Malware) WHERE m.name IN ['qbot', 'zeus'] RETURN m",
        ).collect()
        assert [r.m for r in got] == ["Mal_B"]

    def test_rel_type_predicate(self, spark, graph):
        got = q(
            spark, graph,
            "MATCH (a)-[r]->(b) WHERE r.type = 'RESOLVES_TO' RETURN a, b",
        ).collect()
        assert [(r.a, r.b) for r in got] == [("Dom_X", "Ip_1")]


class TestAggregates:
    def test_count_star_implicit_grouping(self, spark, graph):
        got = q(
            spark,
            graph,
            "MATCH (m:Malware)-[:COMMUNICATES_WITH]->(d:Domain) "
            "RETURN m, count(*) AS n ORDER BY n DESC, m",
        ).collect()
        assert [(r.m, r.n) for r in got] == [("Mal_A", 2), ("Mal_B", 1)]

    def test_count_distinct_global(self, spark, graph):
        got = q(
            spark, graph,
            "MATCH (m:Malware)-[]->(d:Domain) RETURN count(DISTINCT d) AS nd",
        ).collect()
        assert got[0].nd == 2

    def test_numeric_aggregates_weak_typed(self, spark, graph):
        got = q(
            spark,
            graph,
            "MATCH (m:Malware) RETURN sum(m.size) AS total, avg(m.size) "
            "AS mean, min(m.name) AS first",
        ).collect()[0]
        assert (got.total, got.mean, got.first) == (10.0, 5.0, "emotet")

    def test_collect_sorted_and_distinct(self, spark, graph):
        got = q(
            spark,
            graph,
            "MATCH (m:Malware)-[:COMMUNICATES_WITH]->(d:Domain) "
            "RETURN m, collect(d.name) AS domains ORDER BY m",
        ).collect()
        assert [(r.m, r.domains) for r in got] == [
            ("Mal_A", ["x.evil.net", "y.evil.net"]),
            ("Mal_B", ["x.evil.net"]),
        ]
        got = q(
            spark, graph,
            "MATCH (m:Malware)-[]->(d:Domain) RETURN collect(DISTINCT d) AS ds",
        ).collect()
        assert got[0].ds == ["Dom_X", "Dom_Y"]

    def test_max_with_grouping(self, spark, graph):
        got = q(
            spark,
            graph,
            "MATCH (m:Malware)-[:COMMUNICATES_WITH]->(d:Domain) "
            "RETURN m, max(d.name) AS top ORDER BY m",
        ).collect()
        assert [(r.m, r.top) for r in got] == [
            ("Mal_A", "y.evil.net"),
            ("Mal_B", "x.evil.net"),
        ]


class TestErrors:
    @pytest.mark.parametrize(
        "bad",
        [
            "RETURN 1",  # no MATCH
            "MATCH (a) RETURN a ORDER BY b",  # ORDER BY not in RETURN
            "MATCH (a)-[r]->(a) RETURN a",  # cyclic rebind
            "MATCH (a), (b) RETURN a",  # cartesian chains
            "MATCH (a) WHERE a.x ~ 'y' RETURN a",  # unsupported operator
            "MATCH (a)-[r]->(b) RETURN r.weight",  # rels expose .type only
            "MATCH (a) RETURN a LIMIT many",  # non-integer limit
        ],
    )
    def test_rejects_outside_subset(self, spark, graph, bad):
        with pytest.raises(CypherSyntaxError):
            q(spark, graph, bad).collect()

    def test_label_and_prop_pushdown_shapes(self, spark, graph):
        # filters sit under the join, no cartesian, no python
        plan = q(
            spark,
            graph,
            "MATCH (m:Malware {name: 'emotet'})-[:COMMUNICATES_WITH]->(d) "
            "RETURN d",
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestOptionalMatch:
    def test_unmatched_rows_kept_with_nulls(self, spark, graph):
        got = q(
            spark,
            graph,
            "MATCH (d:Domain) OPTIONAL MATCH (d)-[r:RESOLVES_TO]->(i:Ipv4) "
            "RETURN d.name AS domain, i AS ip ORDER BY domain",
        ).collect()
        assert [(r.domain, r.ip) for r in got] == [
            ("x.evil.net", "Ip_1"),
            ("y.evil.net", None),
        ]

    def test_optional_rel_type_is_null_when_unmatched(self, spark, graph):
        got = q(
            spark,
            graph,
            "MATCH (d:Domain) OPTIONAL MATCH (d)-[r:RESOLVES_TO]->(i:Ipv4) "
            "RETURN d, r ORDER BY d",
        ).collect()
        assert [(r.d, r.r) for r in got] == [
            ("Dom_X", "RESOLVES_TO"),
            ("Dom_Y", None),
        ]

    def test_where_before_optional_filters_required_side(self, spark, graph):
        got = q(
            spark,
            graph,
            "MATCH (d:Domain) WHERE d.name STARTS WITH 'y' "
            "OPTIONAL MATCH (d)-[:RESOLVES_TO]->(i:Ipv4) "
            "RETURN d, i",
        ).collect()
        assert [(r.d, r.i) for r in got] == [("Dom_Y", None)]

    def test_count_skips_null_optional_matches(self, spark, graph):
        got = q(
            spark,
            graph,
            "MATCH (d:Domain) OPTIONAL MATCH (d)-[:RESOLVES_TO]->(i:Ipv4) "
            "RETURN count(DISTINCT i) AS n_ips",
        ).collect()
        assert got[0].n_ips == 1

    @pytest.mark.parametrize(
        "bad",
        [
            # WHERE after OPTIONAL MATCH: Neo4j attaches it to the
            # optional side; the lite subset refuses
            "MATCH (d:Domain) OPTIONAL MATCH (d)-[:RESOLVES_TO]->(i:Ipv4) "
            "WHERE i.name = 'z' RETURN d, i",
            # anchor not bound by the required MATCH
            "MATCH (d:Domain) OPTIONAL MATCH (x)-[:RESOLVES_TO]->(i) "
            "RETURN d, i",
            # anchor must be bare
            "MATCH (d:Domain) OPTIONAL MATCH (d:Domain)-[:RESOLVES_TO]->(i) "
            "RETURN d, i",
            # non-anchor variables must be new
            "MATCH (d:Domain)-[:RESOLVES_TO]->(i:Ipv4) "
            "OPTIONAL MATCH (d)-[:RESOLVES_TO]->(i) RETURN d, i",
            # a bare anchor with no hop is not an optional pattern
            "MATCH (d:Domain) OPTIONAL MATCH (d) RETURN d",
        ],
    )
    def test_rejects_outside_optional_subset(self, spark, graph, bad):
        with pytest.raises(CypherSyntaxError):
            q(spark, graph, bad)


class TestOptionalMatchReviewRegressions:
    def test_underscore_variable_names_are_fine(self, spark, graph):
        # regression: the first implementation used a hardcoded internal
        # alias that collided with a user variable of the same name
        got = q(
            spark,
            graph,
            "MATCH (_optanchor:Domain) "
            "OPTIONAL MATCH (_optanchor)-[:RESOLVES_TO]->(i:Ipv4) "
            "RETURN _optanchor, i ORDER BY _optanchor",
        ).collect()
        assert [(r._optanchor, r.i) for r in got] == [
            ("Dom_X", "Ip_1"),
            ("Dom_Y", None),
        ]

    def test_clause_order_is_enforced(self, spark, graph):
        # OPTIONAL MATCH after RETURN is invalid Cypher; the translator
        # must refuse rather than silently reordering it
        with pytest.raises(CypherSyntaxError):
            q(
                spark,
                graph,
                "MATCH (d:Domain) RETURN d, i "
                "OPTIONAL MATCH (d)-[:RESOLVES_TO]->(i:Ipv4)",
            )

    def test_multi_hop_optional_chain(self, spark, graph):
        # two-hop optional tail exercises the add_chain continuation
        got = q(
            spark,
            graph,
            "MATCH (m:Malware) "
            "OPTIONAL MATCH (m)-[:COMMUNICATES_WITH]->(d:Domain)"
            "-[:RESOLVES_TO]->(i:Ipv4) "
            "RETURN m, i ORDER BY m, i",
        ).collect()
        # Mal_A reaches Ip_1 via Dom_X (Dom_Y path dies -> no row for it);
        # Mal_B reaches Ip_1 via Dom_X
        assert [(r.m, r.i) for r in got] == [
            ("Mal_A", "Ip_1"),
            ("Mal_B", "Ip_1"),
        ]


class TestVarLengthPaths:
    """Bounded -[:T*lo..hi]-> hops: one row per relationship-unique
    path (Neo4j path semantics), unbounded/deep forms refused."""

    @pytest.fixture(scope="class")
    def chain_graph(self, spark):
        nodes = spark.createDataFrame(
            [("A", f"n{i}", {"name": f"node{i}"}) for i in range(1, 5)],
            NODES_SCHEMA,
        )
        # chain n1→n2→n3→n4 plus the back edge n2→n1 (a 2-cycle)
        edges = spark.createDataFrame(
            [
                ("A", "n1", "T", "A", "n2"),
                ("A", "n2", "T", "A", "n3"),
                ("A", "n3", "T", "A", "n4"),
                ("A", "n2", "T", "A", "n1"),
            ],
            EDGES_SCHEMA,
        )
        return nodes, edges

    def test_directed_paths_rel_unique(self, spark, chain_graph):
        rows = sorted(
            (r.src, r.dst)
            for r in q(
                spark,
                chain_graph,
                "MATCH (a)-[:T*1..3]->(b) RETURN a AS src, b AS dst",
            ).collect()
        )
        # hand enumeration incl. the 2-cycle: n1→n2→n1 is a valid
        # 2-path (distinct edges), n1→n2→n1→n2 is NOT (reuses n1→n2);
        # (n2,n3) appears TWICE — direct and via the cycle — because
        # Cypher returns one row per PATH, not per endpoint pair
        assert rows == sorted(
            [
                ("n1", "n2"), ("n2", "n3"), ("n3", "n4"), ("n2", "n1"),
                ("n1", "n3"), ("n2", "n4"), ("n1", "n1"), ("n2", "n2"),
                ("n1", "n4"), ("n2", "n3"),
            ]
        )

    def test_exact_length_and_typed(self, spark, chain_graph):
        rows = {
            (r.src, r.dst)
            for r in q(
                spark,
                chain_graph,
                "MATCH (a)-[:T*2]->(b) RETURN a AS src, b AS dst",
            ).collect()
        }
        assert rows == {("n1", "n3"), ("n2", "n4"), ("n1", "n1"), ("n2", "n2")}
        # a type that matches nothing → empty, not an error
        assert (
            q(
                spark,
                chain_graph,
                "MATCH (a)-[:NOPE*1..2]->(b) RETURN a AS src",
            ).count()
            == 0
        )

    def test_undirected_physical_edge_uniqueness(self, spark, chain_graph):
        # 4 physical edges; undirected 2-paths: each unordered pair of
        # distinct edges sharing an endpoint, traversed both ways = 10
        assert (
            q(
                spark,
                chain_graph,
                "MATCH (a)-[*2]-(b) RETURN a AS src, b AS dst",
            ).count()
            == 10
        )

    def test_optional_var_length(self, spark, chain_graph):
        rows = {
            (r.src, r.tgt)
            for r in q(
                spark,
                chain_graph,
                "MATCH (a:A {name: 'node4'}) "
                "OPTIONAL MATCH (a)-[:T*1..2]->(b) "
                "RETURN a.name AS src, b AS tgt",
            ).collect()
        }
        # n4 has no outgoing edges → the optional side is NULL
        assert rows == {("node4", None)}

    @pytest.mark.parametrize(
        "bad",
        [
            "MATCH (a)-[*]->(b) RETURN a",        # unbounded
            "MATCH (a)-[*2..]->(b) RETURN a",     # unbounded upper
            "MATCH (a)-[r:T*1..2]->(b) RETURN a", # rel var binds a list
            "MATCH (a)-[:T*2..9]->(b) RETURN a",  # over the hop cap
            "MATCH (a)-[:T*3..2]->(b) RETURN a",  # inverted bounds
            "MATCH (a)-[:T*0..2]->(b) RETURN a",  # zero-length paths
        ],
    )
    def test_rejects(self, spark, chain_graph, bad):
        with pytest.raises(CypherSyntaxError):
            q(spark, chain_graph, bad).collect()
