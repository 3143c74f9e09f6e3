"""cooccur_npmi: hand-computed NPMI + cap/prune semantics."""

import math

import pytest

from threat_intelligence_knowledge_graph_spark.operators.collocation import (
    cooccur_npmi,
)

# 4 groups; a+b always together (2 of 4 groups), c everywhere.
ROWS = [
    ("g1", "a"), ("g1", "b"), ("g1", "c"),
    ("g2", "a"), ("g2", "b"), ("g2", "c"),
    ("g3", "c"),
    ("g4", "c"), ("g4", "d"),
]


def _npmi(n_ab, n_a, n_b, n):
    if n_ab == n:
        return 1.0
    return round(
        math.log(n_ab * n / (n_a * n_b)) / -math.log(n_ab / n), 6
    )


def test_hand_computed_values(spark):
    df = spark.createDataFrame(ROWS, ["g", "item"])
    got = {
        (r.item_a, r.item_b): (r.n_ab, r.n_a, r.n_b, r.npmi)
        for r in cooccur_npmi(df, "g", "item").collect()
    }
    # a-b: perfectly collocated but not universal → npmi = 1.0 via the
    # n_ab == n_a == n_b ... actually via formula: ln(2*4/(2*2))/-ln(2/4)
    assert got[("a", "b")] == (2, 2, 2, _npmi(2, 2, 2, 4))
    assert got[("a", "b")][3] == 1.0  # only-ever-together pair
    assert got[("a", "c")] == (2, 2, 4, _npmi(2, 2, 4, 4))
    assert got[("a", "c")][3] == 0.0  # c is everywhere: no information
    assert got[("c", "d")] == (1, 4, 1, _npmi(1, 4, 1, 4))
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")}


def test_universal_pair_pinned_to_one(spark):
    rows = [("g1", "x"), ("g1", "y"), ("g2", "x"), ("g2", "y")]
    df = spark.createDataFrame(rows, ["g", "item"])
    r = cooccur_npmi(df, "g", "item").collect()
    assert len(r) == 1 and r[0].npmi == 1.0  # n_ab == N branch


def test_min_pair_count_prunes(spark):
    df = spark.createDataFrame(ROWS, ["g", "item"])
    got = {
        (r.item_a, r.item_b)
        for r in cooccur_npmi(df, "g", "item", min_pair_count=2).collect()
    }
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}


def test_group_cap_drops_pairs_keeps_marginals(spark):
    big = [("G", t) for t in ("a", "b", "c", "d", "e")]
    df = spark.createDataFrame(ROWS + big, ["g", "item"])
    pairs, dropped = cooccur_npmi(
        df, "g", "item", max_group_size=4, return_dropped=True
    )
    d = dropped.collect()
    assert [(r.g, r.group_size) for r in d] == [("G", 5)]
    got = {
        (r.item_a, r.item_b): (r.n_ab, r.n_a, r.n_b)
        for r in pairs.collect()
    }
    # no pair from G ('e' appears only there → no ('d','e') etc.)
    assert not any("e" in p for p in got)
    # but G still counts toward marginals and N: a now appears in 3 of
    # 5 groups even though its pairs only come from g1/g2
    assert got[("a", "b")] == (2, 3, 3)


def test_duplicate_incidences_collapse(spark):
    df = spark.createDataFrame(ROWS + ROWS, ["g", "item"])
    once = sorted(
        map(tuple, cooccur_npmi(
            spark.createDataFrame(ROWS, ["g", "item"]), "g", "item"
        ).collect())
    )
    twice = sorted(map(tuple, cooccur_npmi(df, "g", "item").collect()))
    assert once == twice


def test_validation(spark):
    df = spark.createDataFrame(ROWS, ["g", "item"])
    with pytest.raises(ValueError, match="min_pair_count"):
        cooccur_npmi(df, "g", "item", min_pair_count=0)
    with pytest.raises(ValueError, match="max_group_size"):
        cooccur_npmi(df, "g", "item", max_group_size=1)
