"""Conversation-level dedup (operators/conv_dedup.py)."""

import pytest
from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.conv_dedup import (
    conversation_dedup_exact,
    conversation_fingerprints,
    conversation_near_dup,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _turns(spark):
    rows = [
        # base conversation (4 turns)
        ("a", 1, "user", "q1"),
        ("a", 2, "assistant", "r1"),
        ("a", 3, "user", "q2"),
        ("a", 4, "assistant", "r2"),
        # byte-identical replay under a new key, turns logged out of order
        ("z", 3, "user", "q2"),
        ("z", 1, "user", "q1"),
        ("z", 4, "assistant", "r2"),
        ("z", 2, "assistant", "r1"),
        # retry: same conv with ONE edited turn → 3/5 Jaccard
        ("r", 1, "user", "q1 edited"),
        ("r", 2, "assistant", "r1"),
        ("r", 3, "user", "q2"),
        ("r", 4, "assistant", "r2"),
        # same CONTENT as "a" but different ORDER → different fingerprint,
        # Jaccard 1.0 (set-identical)
        ("p", 1, "user", "q2"),
        ("p", 2, "assistant", "r2"),
        ("p", 3, "user", "q1"),
        ("p", 4, "assistant", "r1"),
        # unrelated
        ("u", 1, "user", "hello"),
        ("u", 2, "assistant", "world"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


class TestExactDedup:
    def test_replay_collapses_order_sensitive(self, spark):
        got = {
            r.conv_id: r
            for r in conversation_dedup_exact(_turns(spark)).collect()
        }
        assert got["z"].canonical_conv_id == "a" and got["z"].is_dup
        assert not got["a"].is_dup
        # edited turn → distinct fingerprint
        assert got["r"].canonical_conv_id == "r" and not got["r"].is_dup
        # same content, different ORDER → not an exact dup
        assert got["p"].canonical_conv_id == "p" and not got["p"].is_dup
        assert got["a"].fingerprint == got["z"].fingerprint
        assert got["a"].fingerprint != got["p"].fingerprint

    def test_fingerprint_ignores_key_ts_tool(self, spark):
        base = [("a", 1, "user", "x", "search"), ("a", 2, "assistant", "y", None)]
        other = [("b", 1, "user", "x", None), ("b", 2, "assistant", "y", "sql")]
        df = spark.createDataFrame(
            base + other,
            "conv_id string, turn_idx int, role string, text string, tool string",
        )
        fps = {
            r.conv_id: r.fingerprint
            for r in conversation_fingerprints(df).collect()
        }
        assert fps["a"] == fps["b"]

    def test_null_text_stable(self, spark):
        df = spark.createDataFrame(
            [("a", 1, "user", None), ("b", 1, "user", None)], SCHEMA
        )
        rows = conversation_dedup_exact(df).collect()
        assert {r.canonical_conv_id for r in rows} == {"a"}


class TestNearDup:
    def test_jaccard_values(self, spark):
        pairs = {
            (r.conv_a, r.conv_b): r
            for r in conversation_near_dup(_turns(spark), 0.5).collect()
        }
        # a/z byte replay and a/p order-permuted → set-identical 1.0
        assert pairs[("a", "z")].jaccard == 1.0
        assert pairs[("a", "p")].jaccard == 1.0
        # retry pair: 3 shared of 4+4 → 3/5
        assert pairs[("a", "r")].jaccard == 0.6
        assert pairs[("a", "r")].n_common == 3
        assert pairs[("a", "r")].n_a == 4 and pairs[("a", "r")].n_b == 4
        # unrelated conv pairs with nobody
        assert not any("u" in k for k in pairs)

    def test_threshold_excludes(self, spark):
        pairs = {
            (r.conv_a, r.conv_b)
            for r in conversation_near_dup(_turns(spark), 0.7).collect()
        }
        assert ("a", "r") not in pairs and ("a", "z") in pairs

    def test_repeated_turns_not_inflated(self, spark):
        # conv with the same turn content 3× counts ONCE in the set
        df = spark.createDataFrame(
            [
                ("a", 1, "user", "x"),
                ("a", 2, "user", "x"),
                ("a", 3, "user", "x"),
                ("b", 1, "user", "x"),
            ],
            SCHEMA,
        )
        r = conversation_near_dup(df, 0.5).first()
        assert (r.n_a, r.n_b, r.n_common, r.jaccard) == (1, 1, 1, 1.0)

    def test_boilerplate_posting_cap_reported(self, spark):
        # one system turn shared by 6 convs + a real dup family
        rows = [(f"c{i}", 1, "system", "boiler") for i in range(6)]
        rows += [
            ("c0", 2, "user", "same"),
            ("c1", 2, "user", "same"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        pairs, dropped = conversation_near_dup(
            df, 0.5, max_posting=5, return_dropped=True
        )
        d = dropped.collect()
        assert len(d) == 1 and d[0].n_convs == 6
        got = {(r.conv_a, r.conv_b): r.jaccard for r in pairs.collect()}
        # the boiler hash is excluded from PAIR GENERATION but still
        # counts in set sizes: c0/c1 share 1 of 2+2 → 1/3 < 0.5 → no pair
        assert got == {}
        # without the cap the boiler turn matches everything
        uncapped = conversation_near_dup(df, 0.5).collect()
        assert len(uncapped) > 0

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            conversation_near_dup(_turns(spark), 0.0)

    def test_keyed_joins_only(self, spark):
        plan = (
            conversation_near_dup(_turns(spark), 0.5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
