"""Preference-pair mining (DPO / best-of-n) over agent transcripts."""

import pyspark.sql.functions as F
import pytest

from threat_intelligence_knowledge_graph_spark.operators.preference import (
    best_of_n,
    dpo_pairs,
)
from threat_intelligence_knowledge_graph_spark.operators.sft import sft_pairs

TS = "2024-01-01 00:00:00"


def _turns(spark, rows):
    return spark.createDataFrame(
        [(c, i, r, t, None, TS) for (c, i, r, t) in rows],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


class TestDpoPairs:
    def test_basic_pairing(self, spark):
        # conv a: completed (ends assistant). conv b: abandoned (ends
        # user). Both answer the same prompt "P".
        rows = [
            ("a", 1, "user", "P"),
            ("a", 2, "assistant", "good long answer"),
            ("b", 1, "user", "P"),
            ("b", 2, "assistant", "meh"),
            ("b", 3, "user", "hello?"),
        ]
        out = dpo_pairs(_turns(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert r.prompt == "P"
        assert r.chosen == "good long answer"
        assert r.chosen_conv_id == "a"
        assert r.rejected == "meh"
        assert r.rejected_conv_id == "b"
        assert r.rejected_outcome == "abandoned"
        assert (r.n_chosen, r.n_rejected) == (1, 1)

    def test_chosen_longest_then_conv_tiebreak(self, spark):
        rows = [
            # three completed convs answering "P" with different lengths
            ("a", 1, "user", "P"),
            ("a", 2, "assistant", "short"),
            ("c", 1, "user", "P"),
            ("c", 2, "assistant", "longest answer here"),
            ("d", 1, "user", "P"),
            ("d", 2, "assistant", "short"),  # ties with conv a
            # one failing conv for the rejected side
            ("z", 1, "user", "P"),
            ("z", 2, "assistant", "bad"),
            ("z", 3, "user", "??"),
        ]
        r = dpo_pairs(_turns(spark, rows)).collect()[0]
        assert r.chosen == "longest answer here"
        assert r.chosen_conv_id == "c"
        assert r.n_chosen == 3

    def test_rejected_severity_order(self, spark):
        # looping beats abandoned as the rejected side.
        rows = [
            ("ok", 1, "user", "P"),
            ("ok", 2, "assistant", "fine"),
            # abandoned
            ("ab", 1, "user", "P"),
            ("ab", 2, "assistant", "r_ab"),
            ("ab", 3, "user", "?"),
            # looping: three identical consecutive texts
            ("lp", 1, "user", "P"),
            ("lp", 2, "assistant", "retry"),
            ("lp", 3, "user", "retry"),
            ("lp", 4, "assistant", "retry"),
        ]
        r = dpo_pairs(_turns(spark, rows)).collect()[0]
        assert r.rejected_outcome == "looping"
        assert r.rejected_conv_id == "lp"
        assert r.n_rejected == 2

    def test_prompt_without_both_sides_dropped(self, spark):
        rows = [
            ("a", 1, "user", "only completed"),
            ("a", 2, "assistant", "x"),
            ("b", 1, "user", "only failed"),
            ("b", 2, "assistant", "y"),
            ("b", 3, "user", "?"),
        ]
        assert dpo_pairs(_turns(spark, rows)).count() == 0

    def test_tool_failure_side(self, spark):
        rows = [
            ("a", 1, "user", "P"),
            ("a", 2, "assistant", "fine"),
            ("t", 1, "user", "P"),
            ("t", 2, "assistant", "resp"),
            ("t", 3, "tool", "Traceback: boom"),
        ]
        r = dpo_pairs(_turns(spark, rows)).collect()[0]
        assert r.rejected_outcome == "tool_failure"
        assert r.rejected == "resp"


class TestBestOfN:
    def test_keeps_max_score(self, spark):
        rows = [
            ("a", 1, "user", "P"),
            ("a", 2, "assistant", "aa"),
            ("b", 1, "user", "P"),
            ("b", 2, "assistant", "bbbb"),
            ("c", 1, "user", "Q"),
            ("c", 2, "assistant", "c"),
        ]
        pairs = sft_pairs(_turns(spark, rows))
        out = {
            r.prompt: r
            for r in best_of_n(pairs, "n_response_chars").collect()
        }
        assert out["P"].response == "bbbb"
        assert out["P"].n_candidates == 2
        assert out["Q"].response == "c"
        assert out["Q"].n_candidates == 1

    def test_deterministic_tiebreak(self, spark):
        rows = [
            ("b", 1, "user", "P"),
            ("b", 2, "assistant", "yy"),
            ("a", 1, "user", "P"),
            ("a", 2, "assistant", "xx"),
        ]
        pairs = sft_pairs(_turns(spark, rows))
        r = best_of_n(pairs, "n_response_chars").collect()[0]
        # equal scores -> lowest conv_id wins
        assert (r.conv_id, r.response) == ("a", "xx")

    def test_single_shuffle_plan(self, spark):
        rows = [
            ("a", 1, "user", "P"),
            ("a", 2, "assistant", "aa"),
        ]
        pairs = sft_pairs(_turns(spark, rows))
        plan = (
            best_of_n(pairs, "n_response_chars")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # one exchange for conv_id (sft window), one for prompt; the
        # rank window and the agg share the prompt partitioning.
        assert plan.count("Exchange hashpartitioning(prompt") <= 1


class TestMinePreferencesCli:
    def _mod(self):
        import importlib

        return importlib.import_module("jobs.mine_preferences")

    def test_dpo_mode(self, spark, tmp_path, capsys):
        import json

        rows = [
            ("a", 1, "user", "P"),
            ("a", 2, "assistant", "good long answer"),
            ("b", 1, "user", "P"),
            ("b", 2, "assistant", "meh"),
            ("b", 3, "user", "hello?"),
        ]
        src = str(tmp_path / "turns.parquet")
        spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        ).write.parquet(src)
        out = str(tmp_path / "dpo")
        rc = self._mod().main(
            ["--input", src, "--mode", "dpo", "--output", out], spark=spark
        )
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["pairs"] == 1
        assert summary["rejected_outcomes"] == {"abandoned": 1}
        got = spark.read.parquet(out).collect()
        assert got[0].chosen == "good long answer"

    def test_best_of_n_mode_and_bad_score_col(self, spark, tmp_path, capsys):
        import json

        import pytest as _pytest

        rows = [
            ("a", 1, "user", "P"),
            ("a", 2, "assistant", "aa"),
            ("b", 1, "user", "P"),
            ("b", 2, "assistant", "bbbb"),
        ]
        src = str(tmp_path / "turns.parquet")
        spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        ).write.parquet(src)
        out = str(tmp_path / "bon")
        rc = self._mod().main(
            ["--input", src, "--mode", "best-of-n", "--output", out],
            spark=spark,
        )
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary == {
            "candidates": 2,
            "mode": "best-of-n",
            "output": out,
            "prompts": 1,
            "score_col": "n_response_chars",
        }
        assert spark.read.parquet(out).collect()[0].response == "bbbb"
        with _pytest.raises(SystemExit, match="score column 'nope'"):
            self._mod().main(
                ["--input", src, "--mode", "best-of-n", "--score-col", "nope"],
                spark=spark,
            )


class TestHardNegatives:
    def _emb(self, spark, vecs):
        return spark.createDataFrame(
            [(i, v) for i, v in vecs], "vec_id long, embedding array<double>"
        )

    def test_excludes_self_and_positive(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.similarity import (
            hard_negatives,
        )

        emb = self._emb(
            spark,
            [
                (1, [1.0, 0.0]),   # query
                (2, [0.9, 0.1]),   # labeled positive (most similar)
                (3, [0.8, 0.2]),   # the hard negative
                (4, [0.0, 1.0]),   # easy negative
                (5, [0.0, 0.0]),   # zero-norm, must never rank
            ],
        )
        pairs = spark.createDataFrame([(1, 2)], "query_id long, pos_id long")
        out = hard_negatives(emb, pairs, k=2).collect()
        assert [(r.neg_id, r.neg_rank) for r in out] == [(3, 1), (4, 2)]
        assert all(r.pos_id == 2 for r in out)

    def test_missing_query_vector_yields_nothing(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.similarity import (
            hard_negatives,
        )

        emb = self._emb(spark, [(1, [1.0, 0.0]), (2, [0.5, 0.5])])
        pairs = spark.createDataFrame(
            [(99, 2)], "query_id long, pos_id long"
        )
        assert hard_negatives(emb, pairs, k=1).count() == 0

    def test_k_validation_and_broadcast_plan(self, spark):
        import pytest as _pytest

        from threat_intelligence_knowledge_graph_spark.operators.similarity import (
            hard_negatives,
        )

        emb = self._emb(spark, [(1, [1.0, 0.0]), (2, [0.5, 0.5])])
        pairs = spark.createDataFrame([(1, 2)], "query_id long, pos_id long")
        with _pytest.raises(ValueError, match="k must be"):
            hard_negatives(emb, pairs, k=0)
        plan = (
            hard_negatives(emb, pairs, k=1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # corpus never shuffles: the probe set broadcasts, the rank
        # window partitions the per-query candidates only.
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        assert "SortMergeJoin" not in plan
