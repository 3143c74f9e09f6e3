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

    def test_invalid_twin_does_not_canonicalize_valid_copy(self, spark):
        # the dense_turn_idx corner (module docstring): a gapped-index
        # conversation fingerprint-equals its dense twin (fingerprint
        # orders BY turn_idx without including values). With the min
        # conv_id on the INVALID copy, full-input dedup would mark the
        # valid twin exact_dup — rejecting both. The survivor-universe
        # dedup keeps exactly one valid copy per content family.
        rows = [
            ("a0", 1, "user", "hi"),
            ("a0", 2, "assistant", "yo"),
            ("a0", 4, "assistant", "ok"),  # gap: dense_turn_idx fails
            ("a1", 1, "user", "hi"),
            ("a1", 2, "assistant", "yo"),
            ("a1", 3, "assistant", "ok"),
        ]
        out = _verdicts(spark, rows, min_run=3, budget_chars=10_000)
        assert out["a0"].reason == "invalid"
        assert out["a1"].accepted and out["a1"].reason is None

    def test_looping_replay_rejected_as_loop_not_dup(self, spark):
        # a replay of a looping conversation: content-determined stages
        # agree across the fingerprint family, so both copies say
        # 'looping' (neither reaches the dedup universe)
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


class TestCurateTranscriptsIncrement:
    def _catalog(self, tmp_path):
        from threat_intelligence_knowledge_graph_spark.sources.tableio import (
            LocalTableCatalog,
        )

        return LocalTableCatalog(str(tmp_path / "wh"))

    def _increment(self, spark, catalog, rows, **kw):
        from threat_intelligence_knowledge_graph_spark.plans.transcript_curation import (
            curate_transcripts_increment,
        )

        out = curate_transcripts_increment(
            spark, _df(spark, rows), catalog, **kw
        )
        return {r.conv_id: r for r in out.collect()}

    # Two batches exercising every cross-batch corner; conv ids are
    # monotone across batches (batch 1 = a*, batch 2 = b*).
    BATCH1 = [
        ("a_ok", 1, "user", "hi"),
        ("a_ok", 2, "assistant", "hello"),
        ("a_big", 1, "user", "x" * 500),  # over_budget, still indexed
        ("a_gap", 1, "user", "q"),
        ("a_gap", 3, "assistant", "r"),  # invalid (gap) — NOT indexed
        ("a_loop", 1, "assistant", "retry"),
        ("a_loop", 2, "assistant", "retry"),
        ("a_loop", 3, "assistant", "retry"),  # looping — NOT indexed
    ]
    BATCH2 = [
        # replay of an accepted batch-1 conversation -> exact_dup
        ("b_replay_ok", 1, "user", "hi"),
        ("b_replay_ok", 2, "assistant", "hello"),
        # replay of the OVER-BUDGET batch-1 conversation -> exact_dup
        # (it reached dedup and is canonical for its family)
        ("b_replay_big", 1, "user", "x" * 500),
        # dense valid twin of batch-1's INVALID gapped conversation:
        # must be ADMITTED (the cross-batch gapped-twin corner)
        ("b_twin", 1, "user", "q"),
        ("b_twin", 2, "assistant", "r"),
        # within-batch dup pair: min id survives
        ("b_new1", 1, "user", "fresh"),
        ("b_new2", 1, "user", "fresh"),
    ]

    def test_two_increments_match_batch_over_union(self, spark, tmp_path):
        from threat_intelligence_knowledge_graph_spark.plans.transcript_curation import (
            curate_transcripts,
        )

        catalog = self._catalog(tmp_path)
        kw = dict(min_run=3, budget_chars=100)
        out1 = self._increment(spark, catalog, self.BATCH1, **kw)
        out2 = self._increment(spark, catalog, self.BATCH2, **kw)
        assert out1["a_ok"].accepted
        assert out1["a_big"].reason == "over_budget"
        assert out1["a_gap"].reason == "invalid"
        assert out1["a_loop"].reason == "looping"
        assert out2["b_replay_ok"].reason == "exact_dup"
        assert out2["b_replay_big"].reason == "exact_dup"
        assert out2["b_twin"].accepted
        assert out2["b_new1"].accepted
        assert out2["b_new2"].reason == "exact_dup"
        # verdict-for-verdict equality with batch mode over the union
        batch = {
            r.conv_id: r
            for r in curate_transcripts(
                _df(spark, self.BATCH1 + self.BATCH2), **kw
            ).collect()
        }
        incr = {**out1, **out2}
        assert set(batch) == set(incr)
        for cid in batch:
            assert (batch[cid].reason, batch[cid].accepted) == (
                incr[cid].reason,
                incr[cid].accepted,
            ), cid
        # corpus holds exactly the accepted conversations' turns
        corpus = catalog.read(spark, "curated_transcripts")
        kept = sorted(
            r.conv_id for r in corpus.select("conv_id").distinct().collect()
        )
        assert kept == ["a_ok", "b_new1", "b_twin"]

    def test_crash_rerun_is_idempotent(self, spark, tmp_path):
        catalog = self._catalog(tmp_path)
        kw = dict(min_run=3, budget_chars=100)
        self._increment(spark, catalog, self.BATCH1, **kw)
        n_corpus = catalog.read(spark, "curated_transcripts").count()
        n_fps = catalog.read(spark, "curated_transcripts_fps").count()
        # same batch again: content-derived run_id resumes — identical
        # verdicts, no duplicate appends
        again = self._increment(spark, catalog, self.BATCH1, **kw)
        assert again["a_ok"].accepted  # NOT exact_dup against itself
        assert catalog.read(spark, "curated_transcripts").count() == n_corpus
        assert catalog.read(spark, "curated_transcripts_fps").count() == n_fps

    def test_over_budget_fp_indexed_but_not_in_corpus(self, spark, tmp_path):
        catalog = self._catalog(tmp_path)
        kw = dict(min_run=3, budget_chars=100)
        self._increment(spark, catalog, self.BATCH1, **kw)
        fps = catalog.read(spark, "curated_transcripts_fps")
        indexed = sorted(r.conv_id for r in fps.collect())
        # reaching conversations only: accepted + over_budget; the
        # invalid/looping ones must NOT be indexed
        assert indexed == ["a_big", "a_ok"]


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

    def test_increment_mode(self, spark, tmp_path, capsys):
        import json

        b1 = [
            ("a1", 1, "user", "hi"),
            ("a1", 2, "assistant", "hello"),
            ("a2", 1, "user", "other"),
        ]
        b2 = [
            ("b1", 1, "user", "hi"),  # replay of a1 -> exact_dup
            ("b1", 2, "assistant", "hello"),
            ("b2", 1, "user", "fresh"),
        ]
        p1, p2 = str(tmp_path / "b1.parquet"), str(tmp_path / "b2.parquet")
        for rows, p in ((b1, p1), (b2, p2)):
            spark.createDataFrame(
                rows, "conv_id string, turn_idx int, role string, text string"
            ).write.parquet(p)
        wh = str(tmp_path / "wh")
        mod = self._mod()
        assert mod.main(
            ["--input", p1, "--increment", "--warehouse", wh,
             "--budget-chars", "100"], spark=spark,
        ) == 0
        s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert s1["accepted"] == 2 and s1["corpus_convs"] == 2
        assert "resumed" not in s1
        assert mod.main(
            ["--input", p2, "--increment", "--warehouse", wh,
             "--budget-chars", "100"], spark=spark,
        ) == 0
        s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert s2["rejected"] == {"exact_dup": 1}
        assert s2["accepted"] == 1 and s2["corpus_convs"] == 3
        # rerun batch 2: content-derived run id -> resumed, no growth
        assert mod.main(
            ["--input", p2, "--increment", "--warehouse", wh,
             "--budget-chars", "100"], spark=spark,
        ) == 0
        s3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert s3.get("resumed") is True
        assert s3["corpus_convs"] == 3 and s3["run_id"] == s2["run_id"]
        # missing --warehouse is a clean one-line exit
        with pytest.raises(SystemExit):
            mod.main(["--input", p2, "--increment"], spark=spark)
