"""Borůvka MSF vs an in-test Kruskal union-find oracle, plus
single-linkage labels on an analytic planted graph."""

import random

import pytest
from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.mst import (
    boruvka_mst,
    single_linkage_labels,
)


def _kruskal(n_nodes, edges):
    """Classic union-find Kruskal; edges = [(a, b, w)]. Returns the MSF
    edge set under the same (w, a, b) tie-break as the operator."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for a, b, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((min(a, b), max(a, b), float(w)))
    return out


def _spark_msf(spark, edges):
    edges = [(a, b, float(w)) for a, b, w in edges]
    df = spark.createDataFrame(edges, "src int, dst int, weight double")
    got = boruvka_mst(df)
    return {(r.src, r.dst, r.weight) for r in got.collect()}


def test_msf_matches_kruskal_random_graph(spark):
    rng = random.Random(7)
    n = 60
    # connected-ish random graph with DISTINCT weights (unique MSF)
    weights = rng.sample(range(1, 100000), 400)
    edges, seen = [], set()
    wi = 0
    for i in range(1, n):  # spanning backbone
        edges.append((rng.randrange(i), i, weights[wi])); wi += 1
        seen.add((min(edges[-1][0], i), max(edges[-1][0], i)))
    while len(edges) < 300:
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b or (min(a, b), max(a, b)) in seen:
            continue
        seen.add((min(a, b), max(a, b)))
        edges.append((a, b, weights[wi])); wi += 1
    assert _spark_msf(spark, edges) == _kruskal(n, edges)


def test_msf_disconnected_forest_and_parallel_edges(spark):
    edges = [
        # component {0,1,2}: triangle, drops the heaviest edge
        (0, 1, 1.0), (1, 2, 2.0), (0, 2, 9.0),
        # parallel edge: only the cheaper copy can win
        (1, 0, 5.0),
        # component {10,11}: single edge + self-loop (ignored)
        (10, 11, 3.0), (10, 10, 0.5),
    ]
    got = _spark_msf(spark, edges)
    assert got == {(0, 1, 1.0), (1, 2, 2.0), (10, 11, 3.0)}


def test_msf_path_with_heavy_chords(spark):
    # the planted analytic family used by the q_graph_mst contract
    # entry: path weights zig-zag (multi-phase Borůvka), chords heavier
    # than every path edge — MSF == the path, exactly.
    n = 40
    edges = [(i, i + 1, 100 * ((i % 2)) + i + 10) for i in range(n - 1)]
    edges += [(i, i + 2, 100000 + i) for i in range(n - 2)]
    got = _spark_msf(spark, [(a, b, float(w)) for a, b, w in edges])
    assert got == {(i, i + 1, float(100 * (i % 2) + i + 10)) for i in range(n - 1)}


def test_single_linkage_labels(spark):
    # two chains joined by one expensive bridge: cutting at the bridge
    # weight - 1 yields exactly two clusters; isolated node stays alone
    edges = [(0, 1, 1.0), (1, 2, 2.0), (3, 4, 1.5), (2, 3, 50.0),
             (7, 7, 0.1)]
    df = spark.createDataFrame(edges, "src int, dst int, weight double")
    labels = {
        r.id: r.cluster
        for r in single_linkage_labels(df, threshold=10.0).collect()
    }
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]
    assert labels[7] == 7  # self-loop-only node = singleton
    # at threshold >= bridge everything merges
    merged = {
        r.id: r.cluster
        for r in single_linkage_labels(df, threshold=50.0).collect()
    }
    assert len({merged[i] for i in (0, 1, 2, 3, 4)}) == 1


def test_msf_raises_at_phase_cap(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0)],
        "src int, dst int, weight double",
    )
    with pytest.raises(RuntimeError, match="no convergence"):
        boruvka_mst(df, max_phases=1)
