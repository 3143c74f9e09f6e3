"""SFT-pair mining + trace validation (operators/sft.py)."""

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.sft import (
    sft_pairs,
    validate_traces,
)

SCHEMA = "conv_id string, turn_idx int, role string, text string"


def _turns(spark):
    rows = [
        # conv "a": canonical — u/a/tool/a; yields ONE pair (1→2)
        ("a", 1, "user", "what is AQE"),
        ("a", 2, "assistant", "adaptive query execution"),
        ("a", 3, "tool", "docs blob"),
        ("a", 4, "assistant", "summarised"),
        # conv "b": user followed by USER (no pair from 1), then u→a pair
        ("b", 1, "user", "first ask"),
        ("b", 2, "user", "re-ask"),
        ("b", 3, "assistant", "answer"),
        # conv "c": trailing user (no next turn → no pair), empty text,
        # tool opens the conv, sparse turn_idx (2,5,7)
        ("c", 2, "tool", "orphan tool"),
        ("c", 5, "assistant", ""),
        ("c", 7, "user", "dangling"),
        # conv "d": user→assistant but response empty → length filter
        ("d", 1, "user", "ping"),
        ("d", 2, "assistant", ""),
    ]
    return spark.createDataFrame(rows, SCHEMA)


class TestSftPairs:
    def test_adjacency_only(self, spark):
        got = {
            (r.conv_id, r.prompt_turn_idx): (r.prompt, r.response)
            for r in sft_pairs(_turns(spark)).collect()
        }
        assert got == {
            ("a", 1): ("what is AQE", "adaptive query execution"),
            ("b", 2): ("re-ask", "answer"),
        }

    def test_length_filter_off_keeps_empty_response(self, spark):
        got = {
            (r.conv_id, r.prompt_turn_idx)
            for r in sft_pairs(
                _turns(spark), min_response_chars=0
            ).collect()
        }
        assert ("d", 1) in got

    def test_char_counts(self, spark):
        r = {
            r.conv_id: r for r in sft_pairs(_turns(spark)).collect()
        }["a"]
        assert r.n_prompt_chars == len("what is AQE")
        assert r.n_response_chars == len("adaptive query execution")

    def test_single_exchange_plan(self, spark):
        plan = (
            sft_pairs(_turns(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1, plan


class TestValidateTraces:
    def test_checks_per_conversation(self, spark):
        got = {r.conv_id: r for r in validate_traces(_turns(spark)).collect()}
        a, b, c, d = got["a"], got["b"], got["c"], got["d"]
        assert a.is_valid and all(
            getattr(a, f)
            for f in (
                "starts_with_user",
                "ends_with_assistant",
                "no_repeated_role",
                "tool_after_assistant",
                "dense_turn_idx",
                "no_empty_text",
            )
        )
        # b: consecutive user turns
        assert not b.no_repeated_role and not b.is_valid
        assert b.starts_with_user and b.ends_with_assistant
        # c: tool-first, sparse idx, empty text, ends with user
        assert not c.starts_with_user
        assert not c.ends_with_assistant
        assert not c.tool_after_assistant
        assert not c.dense_turn_idx
        assert not c.no_empty_text
        assert not c.is_valid
        # d: structurally fine except the empty assistant text
        assert d.dense_turn_idx and d.no_repeated_role
        assert not d.no_empty_text and not d.is_valid

    def test_duplicate_turn_idx_not_dense(self, spark):
        df = spark.createDataFrame(
            [("x", 1, "user", "a"), ("x", 1, "assistant", "b")], SCHEMA
        )
        r = validate_traces(df).first()
        assert not r.dense_turn_idx

    def test_valid_gate_feeds_pairs(self, spark):
        # quarantine-then-mine: pairs from valid convs only
        turns = _turns(spark)
        valid = validate_traces(turns).filter("is_valid").select("conv_id")
        got = {
            r.conv_id
            for r in sft_pairs(turns.join(valid, "conv_id")).collect()
        }
        assert got == {"a"}

    def test_single_exchange_plan(self, spark):
        plan = (
            validate_traces(_turns(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1, plan


class TestSftRealShape:
    def test_runs_on_synthetic_transcripts(self, spark):
        import sys

        sys.path.insert(0, "/root/repo")
        import __spark_entry__ as m

        pairs = m.queries()["sft_pairs"](spark, "/root/testdata/sf0.001")
        assert pairs.count() > 0
        assert pairs.filter(
            (F.col("n_prompt_chars") <= 0) | (F.col("n_response_chars") <= 0)
        ).count() == 0


class TestSftPairsWithContext:
    ROWS = [
        ("c1", 1, "user", "aaaa"),
        ("c1", 2, "assistant", "bbbb"),
        ("c1", 3, "tool", "tttt"),
        ("c1", 4, "user", "cccc"),
        ("c1", 5, "assistant", "dddd"),
        ("c2", 1, "user", "q"),
        ("c2", 2, "assistant", "r"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.ROWS, "conv_id string, turn_idx int, role string, text string"
        )

    def _ctx(self, spark, budget):
        from threat_intelligence_knowledge_graph_spark.operators.sft import (
            sft_pairs_with_context,
        )

        return {
            (r.conv_id, r.prompt_turn_idx): r
            for r in sft_pairs_with_context(
                self._df(spark), max_context_chars=budget
            ).collect()
        }

    def test_full_history_when_budget_ample(self, spark):
        got = self._ctx(spark, 1000)
        assert got[("c1", 1)].context == ""  # first turn: no history
        assert got[("c1", 4)].context == (
            "user: aaaa\nassistant: bbbb\ntool: tttt"
        )
        assert got[("c2", 1)].context == ""
        r = got[("c1", 4)]
        assert r.prompt == "cccc" and r.response == "dddd"
        assert r.n_context_chars == len(r.context)

    def test_trim_keeps_most_recent_contiguous(self, spark):
        # line costs: 'user: aaaa'(10)+1, 'assistant: bbbb'(15)+1,
        # 'tool: tttt'(10)+1 → DESC cumsum: tool 11, assistant 27, user 38
        got = self._ctx(spark, 27)
        assert got[("c1", 4)].context == "assistant: bbbb\ntool: tttt"
        got = self._ctx(spark, 11)
        assert got[("c1", 4)].context == "tool: tttt"

    def test_nothing_fits_keeps_pair_with_empty_context(self, spark):
        got = self._ctx(spark, 5)
        assert ("c1", 4) in got
        assert got[("c1", 4)].context == ""

    def test_validation(self, spark):
        import pytest as _pytest

        from threat_intelligence_knowledge_graph_spark.operators.sft import (
            sft_pairs_with_context,
        )

        with _pytest.raises(ValueError, match="max_context_chars"):
            sft_pairs_with_context(self._df(spark), max_context_chars=-1)
