"""Per-conversation transcript analytics (operators/transcript_stats.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
    conversation_stats,
    role_transitions,
)


def _turns(spark):
    rows = [
        # conv "a": user(0s) -> assistant(+10s) -> tool(+30s) -> assistant(+34s)
        ("a", 1, "user", "hello there", None, 1_700_000_000),
        ("a", 2, "assistant", "hi", None, 1_700_000_010),
        ("a", 3, "tool", "result", "search", 1_700_000_040),
        ("a", 4, "assistant", "done", None, 1_700_000_044),
        # conv "b": single turn, NULL text
        ("b", 1, "user", None, None, 1_700_000_100),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, sec long",
    )
    return df.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.timestamp_seconds("sec").alias("ts"),
    )


class TestConversationStats:
    def test_hand_computed(self, spark):
        out = {r.conv_id: r for r in conversation_stats(_turns(spark)).collect()}
        a = out["a"]
        assert (a.n_turns, a.n_user, a.n_assistant, a.n_tool) == (4, 1, 2, 1)
        assert a.n_distinct_tools == 1
        assert a.total_chars == 11 + 2 + 6 + 4
        assert a.duration_s == 44
        # gaps 10, 30, 4 -> mean 44/3 rounded
        assert a.mean_gap_s == round(44 / 3, 3)
        assert a.final_role == "assistant"

    def test_single_turn_conv_null_gap_zero_duration(self, spark):
        b = {r.conv_id: r for r in conversation_stats(_turns(spark)).collect()}["b"]
        assert (b.n_turns, b.duration_s, b.total_chars) == (1, 0, 0)
        assert b.mean_gap_s is None and b.final_role == "user"

    def test_gap_uses_turn_order_not_row_order(self, spark):
        # rows delivered out of turn order: gaps must follow turn_idx
        rows = [
            ("c", 3, "user", "x", None, 1_700_000_100),
            ("c", 1, "user", "x", None, 1_700_000_000),
            ("c", 2, "user", "x", None, 1_700_000_090),
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, sec long",
        ).select(
            "conv_id", "turn_idx", "role", "text", "tool",
            F.timestamp_seconds("sec").alias("ts"),
        )
        r = conversation_stats(df).collect()[0]
        # gaps by turn order: 90, 10 -> mean 50; row order would give
        # (-100, 90) instead
        assert r.mean_gap_s == 50.0 and r.duration_s == 100


class TestRoleTransitions:
    def test_counts_within_conv_only(self, spark):
        out = {
            (r.from_role, r.to_role): r.n
            for r in role_transitions(_turns(spark)).collect()
        }
        # conv a: user->assistant, assistant->tool, tool->assistant;
        # conv b contributes nothing (no consecutive pair crosses convs)
        assert out == {
            ("user", "assistant"): 1,
            ("assistant", "tool"): 1,
            ("tool", "assistant"): 1,
        }


class TestSessionizeConversations:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, ts timestamp"
        )

    def test_gap_splits_sessions(self, spark):
        from datetime import datetime as DT

        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            sessionize_conversations,
        )

        rows = [
            ("c1", 1, DT(2024, 1, 1, 0, 0, 0)),
            ("c1", 2, DT(2024, 1, 1, 0, 10, 0)),   # 600s ≤ 1800 → same
            ("c1", 3, DT(2024, 1, 1, 2, 0, 0)),    # >1800 → new session
            ("c1", 4, DT(2024, 1, 1, 2, 5, 0)),
            ("c2", 1, DT(2024, 1, 1, 0, 0, 0)),    # other conv untouched
        ]
        got = {
            (r.conv_id, r.turn_idx): (r.session_idx, r.session_id)
            for r in sessionize_conversations(self._df(spark, rows)).collect()
        }
        assert got[("c1", 1)] == (0, "c1#0")
        assert got[("c1", 2)] == (0, "c1#0")
        assert got[("c1", 3)] == (1, "c1#1")
        assert got[("c1", 4)] == (1, "c1#1")
        assert got[("c2", 1)] == (0, "c2#0")

    def test_turn_order_not_row_order(self, spark):
        from datetime import datetime as DT

        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            sessionize_conversations,
        )

        rows = [  # rows shuffled; gap sits between turn 1 and 2
            ("c", 2, DT(2024, 1, 1, 3, 0, 0)),
            ("c", 1, DT(2024, 1, 1, 0, 0, 0)),
            ("c", 3, DT(2024, 1, 1, 3, 1, 0)),
        ]
        got = {
            r.turn_idx: r.session_idx
            for r in sessionize_conversations(self._df(spark, rows)).collect()
        }
        assert got == {1: 0, 2: 1, 3: 1}

    def test_null_ts_never_splits_and_validation(self, spark):
        from datetime import datetime as DT

        import pytest as _pytest

        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            sessionize_conversations,
        )

        rows = [
            ("c", 1, DT(2024, 1, 1, 0, 0, 0)),
            ("c", 2, None),
            ("c", 3, DT(2024, 1, 1, 9, 0, 0)),
        ]
        got = {
            r.turn_idx: r.session_idx
            for r in sessionize_conversations(self._df(spark, rows)).collect()
        }
        # NULL gap coalesces to 0 on both sides of the hole
        assert got == {1: 0, 2: 0, 3: 0}
        with _pytest.raises(ValueError, match="positive"):
            sessionize_conversations(self._df(spark, rows), gap_seconds=0)


from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
    response_latency,
)


class TestResponseLatency:
    def test_hand_computed_pairs(self, spark):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        s = lambda x: base + datetime.timedelta(seconds=x)  # noqa: E731
        rows = [
            ("c1", 1, "user", s(0)),
            ("c1", 2, "assistant", s(5)),       # user->assistant 5s
            ("c1", 3, "user", s(65)),           # assistant->user 60s
            ("c1", 4, "assistant", s(80)),      # user->assistant 15s
            ("c2", 1, "user", s(0)),
            ("c2", 2, "assistant", s(25)),      # user->assistant 25s
        ]
        df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "ts"])
        got = {(r.from_role, r.to_role): r for r in response_latency(df).collect()}
        ua = got[("user", "assistant")]
        assert (ua.n, ua.mean_s, ua.max_s) == (3, 15.0, 25)
        au = got[("assistant", "user")]
        assert (au.n, au.mean_s, au.max_s) == (1, 60.0, 60)
        assert len(got) == 2  # no cross-conversation pair

    def test_turn_order_not_row_order_and_null_ts(self, spark):
        import datetime

        base = datetime.datetime(2024, 1, 1)
        rows = [
            ("c", 2, "assistant", base + datetime.timedelta(seconds=9)),
            ("c", 1, "user", base),              # rows out of order
            ("c", 3, "tool", None),              # NULL ts pair excluded
        ]
        df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "role", "ts"])
        got = {(r.from_role, r.to_role): r for r in response_latency(df).collect()}
        assert set(got) == {("user", "assistant")}
        assert got[("user", "assistant")].mean_s == 9.0


class TestToolProfile:
    def _df(self, spark, rows):
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, sec long",
        )
        return df.select(
            "conv_id", "turn_idx", "role", "text", "tool",
            F.timestamp_seconds("sec").alias("ts"),
        )

    def test_hand_computed(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            tool_profile,
        )

        rows = [
            # conv a: search call stalls 30s, python call is the LAST
            # turn (counts in n_calls, excluded from gap stats)
            ("a", 1, "user", "q", None, 1_700_000_000),
            ("a", 2, "tool", "r", "search", 1_700_000_010),
            ("a", 3, "assistant", "ok", None, 1_700_000_040),
            ("a", 4, "tool", "r", "python", 1_700_000_050),
            # conv b: second search call stalls 50s; NULL-ts next turn
            # drops the sql call's gap but not the call itself
            ("b", 1, "tool", "r", "search", 1_700_000_100),
            ("b", 2, "assistant", "ok", None, 1_700_000_150),
            ("b", 3, "tool", "r", "sql", 1_700_000_160),
            ("b", 4, "assistant", "late", None, None),
        ]
        out = {r.tool: r for r in tool_profile(self._df(spark, rows)).collect()}
        s = out["search"]
        assert (s.n_calls, s.n_convs, s.n_gaps) == (2, 2, 2)
        assert s.mean_next_gap_s == 40.0  # (30 + 50) / 2
        assert s.max_next_gap_s == 50
        p = out["python"]
        assert (p.n_calls, p.n_convs, p.n_gaps) == (1, 1, 0)
        assert p.mean_next_gap_s is None and p.max_next_gap_s is None
        q = out["sql"]
        assert (q.n_calls, q.n_gaps) == (1, 0)  # NULL-ts successor

    def test_non_tool_roles_never_counted(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            tool_profile,
        )

        rows = [  # tool name on a non-tool turn is a malformed trace;
            ("c", 1, "assistant", "x", "search", 1_700_000_000),
            ("c", 2, "tool", "r", None, 1_700_000_010),  # NULL tool name
        ]
        assert tool_profile(self._df(spark, rows)).count() == 0


class TestLoopDetection:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )

    def test_planted_run_and_clean_conv(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            loop_detection,
        )

        rows = [
            # conv a: x, retry, retry, retry, y -> run of 3, 2 stuttered
            ("a", 1, "x"), ("a", 2, "retry"), ("a", 3, "retry"),
            ("a", 4, "retry"), ("a", 5, "y"),
            # conv b: all distinct
            ("b", 1, "p"), ("b", 2, "q"),
        ]
        out = {
            r.conv_id: r
            for r in loop_detection(self._df(spark, rows), min_run=3).collect()
        }
        a, b = out["a"], out["b"]
        assert (a.n_turns, a.max_stutter_run, a.n_stuttered_turns) == (5, 3, 2)
        assert a.is_looping
        assert (b.n_turns, b.max_stutter_run, b.n_stuttered_turns) == (2, 1, 0)
        assert not b.is_looping

    def test_null_texts_stutter_null_safely(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            loop_detection,
        )

        rows = [("c", 1, None), ("c", 2, None), ("c", 3, "z")]
        r = loop_detection(self._df(spark, rows), min_run=2).collect()[0]
        assert (r.max_stutter_run, r.n_stuttered_turns) == (2, 1)
        assert r.is_looping

    def test_run_uses_turn_order_and_min_run_validated(self, spark):
        import pytest as _pytest

        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            loop_detection,
        )

        # out-of-order rows: texts identical only in turn order 2,3
        rows = [("d", 3, "s"), ("d", 1, "t"), ("d", 2, "s")]
        r = loop_detection(self._df(spark, rows), min_run=2).collect()[0]
        assert r.max_stutter_run == 2 and r.is_looping
        with _pytest.raises(ValueError):
            loop_detection(self._df(spark, rows), min_run=1)


class TestContextGrowth:
    def test_hand_computed(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            context_growth,
        )

        rows = [
            ("a", 1, "12345"), ("a", 2, "12345"), ("a", 3, "12345"),
            ("b", 1, None),  # NULL text counts 0, never over
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )
        out = {
            r.conv_id: r for r in context_growth(df, budget_chars=12).collect()
        }
        a, b = out["a"], out["b"]
        # cum 5, 10, 15 -> only turn 3 over the 12-char budget
        assert (a.total_chars, a.first_over_idx, a.n_turns_over) == (15, 3, 1)
        assert a.frac_over == round(1 / 3, 6)
        assert (b.total_chars, b.first_over_idx, b.n_turns_over) == (0, None, 0)
        assert b.frac_over == 0.0

    def test_budget_validated(self, spark):
        import pytest as _pytest

        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            context_growth,
        )

        df = spark.createDataFrame(
            [("a", 1, "x")], "conv_id string, turn_idx int, text string"
        )
        with _pytest.raises(ValueError):
            context_growth(df, budget_chars=0)


class TestToolErrors:
    def test_rates_and_blast_radius(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            tool_errors,
        )

        rows = [
            # search: 2 calls, 1 error, both in conv a
            ("a", 1, "tool", "ok", "search"),
            ("a", 2, "tool", "ERROR: boom", "search"),
            # python: 1 call, NULL text -> not an error
            ("b", 1, "tool", None, "python"),
            # assistant row mentioning error is NOT a tool call
            ("b", 2, "assistant", "there was an error", None),
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string",
        )
        out = {r.tool: r for r in tool_errors(df).collect()}
        s, p = out["search"], out["python"]
        assert (s.n_calls, s.n_errors, s.error_rate) == (2, 1, 0.5)
        assert (s.n_convs, s.n_convs_with_error) == (1, 1)
        assert (p.n_calls, p.n_errors, p.n_convs_with_error) == (1, 0, 0)
        assert set(out) == {"search", "python"}


class TestToolChains:
    def test_skips_non_tool_turns_and_conv_boundaries(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            tool_chains,
        )

        rows = [
            # conv a: search -> (assistant) -> python -> sql
            ("a", 1, "tool", "search"),
            ("a", 2, "assistant", None),
            ("a", 3, "tool", "python"),
            ("a", 4, "tool", "sql"),
            # conv b: single call -> no transition; must not chain to a
            ("b", 1, "tool", "search"),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, tool string"
        )
        out = {
            (r.from_tool, r.to_tool): (r.n, r.n_convs)
            for r in tool_chains(df).collect()
        }
        assert out == {
            ("search", "python"): (1, 1),
            ("python", "sql"): (1, 1),
        }
