"""Composed conversation-level curation (plans/transcript_curation.py)."""

import pytest

from threat_intelligence_knowledge_graph_spark.plans.transcript_curation import (
    curate_transcripts,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )


def _verdicts(spark, rows, **kw):
    return {
        r.conv_id: r for r in curate_transcripts(_df(spark, rows), **kw).collect()
    }


class TestCurateTranscripts:
    def test_each_stage_bites_and_clean_passes(self, spark):
        rows = [
            # clean: accepted
            ("ok", 1, "user", "hi"),
            ("ok", 2, "assistant", "hello"),
            # invalid: empty text on turn 2
            ("inv", 1, "user", "hi"),
            ("inv", 2, "assistant", ""),
            # looping: 3 identical texts
            ("loop", 1, "user", "go"),
            ("loop", 2, "assistant", "retry"),
            ("loop", 3, "assistant", "retry"),
            ("loop", 4, "assistant", "retry"),
            # exact dup of "ok" under a later key
            ("zz_dup", 1, "user", "hi"),
            ("zz_dup", 2, "assistant", "hello"),
            # over budget
            ("big", 1, "user", "x" * 500),
        ]
        out = _verdicts(spark, rows, min_run=3, budget_chars=100)
        assert out["ok"].accepted and out["ok"].reason is None
        assert out["inv"].reason == "invalid"
        assert out["loop"].reason == "looping"
        assert out["zz_dup"].reason == "exact_dup"
        assert out["big"].reason == "over_budget"
        # the canonical copy of the dup family survives
        assert out["ok"].accepted

    def test_precedence_invalid_beats_looping_and_dup(self, spark):
        # conversation that is BOTH structurally invalid (gap in
        # turn_idx) and looping -> 'invalid' wins
        rows = [
            ("both", 1, "user", "r"),
            ("both", 2, "user", "r"),
            ("both", 3, "user", "r"),
            ("both", 5, "user", "tail"),  # gap: dense_turn_idx fails
        ]
        out = _verdicts(spark, rows, min_run=3, budget_chars=10_000)
        assert out["both"].reason == "invalid"

    def test_looping_replay_rejected_as_loop_not_dup(self, spark):
        # a replay of a looping conversation: content-determined stages
        # agree across the fingerprint family, so both copies say
        # 'looping' (dedup ordering is immune — see module docstring)
        rows = []
        for cid in ("a", "a_dup"):
            rows += [
                (cid, 1, "user", "go"),
                (cid, 2, "assistant", "retry"),
                (cid, 3, "assistant", "retry"),
                (cid, 4, "assistant", "retry"),
            ]
        out = _verdicts(spark, rows, min_run=3, budget_chars=10_000)
        assert out["a"].reason == "looping"
        assert out["a_dup"].reason == "looping"

    def test_full_grammar_tightens_validity(self, spark):
        # assistant-first conversation: structurally fine, grammar-bad
        rows = [
            ("g", 1, "assistant", "hello"),
            ("g", 2, "user", "hi"),
        ]
        loose = _verdicts(spark, rows, budget_chars=10_000)
        strict = _verdicts(spark, rows, budget_chars=10_000, full_grammar=True)
        assert loose["g"].accepted
        assert strict["g"].reason == "invalid"

    def test_budget_boundary_inclusive(self, spark):
        rows = [("b", 1, "user", "x" * 100)]
        at = _verdicts(spark, rows, budget_chars=100)
        under = _verdicts(spark, rows, budget_chars=99)
        assert at["b"].accepted  # exactly at budget is kept
        assert under["b"].reason == "over_budget"

    def test_min_run_validation_propagates(self, spark):
        with pytest.raises(ValueError):
            curate_transcripts(
                _df(spark, [("a", 1, "user", "x")]), min_run=1
            )


class TestCurateTranscriptsCli:
    def _mod(self):
        import importlib.util as _ilu
        import os as _os

        spec = _ilu.spec_from_file_location(
            "curate_transcripts_job",
            _os.path.join(
                _os.path.dirname(__file__), "..", "jobs",
                "curate_transcripts.py",
            ),
        )
        mod = _ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_funnel_and_outputs(self, spark, tmp_path, capsys):
        import json

        rows = [
            ("ok", 1, "user", "hi"),
            ("ok", 2, "assistant", "hello"),
            ("inv", 1, "user", "hi"),
            ("inv", 2, "assistant", ""),
            ("big", 1, "user", "x" * 500),
        ]
        src = str(tmp_path / "turns.parquet")
        spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        ).write.parquet(src)

        vd, out = str(tmp_path / "v"), str(tmp_path / "c")
        rc = self._mod().main(
            [
                "--input", src, "--budget-chars", "100",
                "--verdicts", vd, "--output", out,
            ],
            spark=spark,
        )
        assert rc == 0
        funnel = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert funnel == {
            "conversations": 3,
            "accepted": 1,
            "rejected": {"invalid": 1, "over_budget": 1},
        }
        # curated turn table contains exactly the accepted conversation
        kept = spark.read.parquet(out)
        assert sorted(r.conv_id for r in kept.select("conv_id").distinct().collect()) == ["ok"]
        assert kept.count() == 2
        # session injected -> not stopped
        assert spark.sql("SELECT 1").count() == 1
