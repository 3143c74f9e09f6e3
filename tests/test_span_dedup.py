"""Span-level dedup: hand-computed coverage + scrub semantics."""

from __future__ import annotations

import pytest

from threat_intelligence_knowledge_graph_spark.operators.span_dedup import (
    duplicated_span_stats,
    positional_ngram_hashes,
    scrub_duplicated_spans,
)

SHARED = "quick brown fox jumps over the lazy dog"


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestStats:
    def test_shared_span_coverage(self, spark):
        # Docs 1/2 share an 8-token run at positions 2-9; with n=3 the
        # shared grams are starts 2..7 (6 grams), covering tokens 2-9.
        df = _docs(
            spark,
            [
                (1, f"The {SHARED} today"),
                (2, f"a {SHARED} indeed"),
                (3, "totally unique text with no overlap at all here"),
            ],
        )
        got = {
            r.doc_id: r
            for r in duplicated_span_stats(df, n=3).collect()
        }
        assert got[1].n_tokens == 10 and got[1].n_grams == 8
        assert got[1].n_dup_grams == 6 and got[1].dup_tokens == 8
        assert got[1].dup_ratio == pytest.approx(0.8)
        assert got[2].n_dup_grams == 6 and got[2].dup_tokens == 8
        assert got[3].n_dup_grams == 0 and got[3].dup_tokens == 0
        assert got[3].dup_ratio == 0.0

    def test_within_doc_repeat_counts(self, spark):
        # The SAME doc repeating a 3-gram twice reaches min_occurrences
        # alone (Lee et al. count occurrences, not documents).
        df = _docs(spark, [(1, "x y z q q q w w q q q v")])
        got = duplicated_span_stats(df, n=3).collect()[0]
        # 'q q q' occurs at positions 4 and 9 -> tokens 4-6 and 9-11.
        assert got.n_dup_grams == 2
        assert got.dup_tokens == 6

    def test_short_doc_zero_grams(self, spark):
        df = _docs(spark, [(1, "just two"), (2, "just two")])
        got = duplicated_span_stats(df, n=3).collect()
        for r in got:
            assert r.n_grams == 0 and r.n_dup_grams == 0
            assert r.dup_tokens == 0 and r.dup_ratio == 0.0

    def test_min_occurrences_threshold(self, spark):
        df = _docs(
            spark,
            [(1, f"The {SHARED} today"), (2, f"a {SHARED} indeed")],
        )
        got = {r.doc_id: r for r in duplicated_span_stats(df, n=3, min_occurrences=3).collect()}
        assert got[1].n_dup_grams == 0 and got[2].n_dup_grams == 0

    def test_rejects_bad_params(self, spark):
        df = _docs(spark, [(1, "a b c")])
        with pytest.raises(ValueError):
            duplicated_span_stats(df, n=0)
        with pytest.raises(ValueError):
            duplicated_span_stats(df, min_occurrences=1)


class TestScrub:
    def test_removes_exactly_covered_tokens(self, spark):
        df = _docs(
            spark,
            [
                (1, f"The {SHARED} today"),
                (2, f"a {SHARED} indeed"),
                (3, "totally unique text with no overlap at all here"),
            ],
        )
        got = {r.doc_id: r.clean_text for r in scrub_duplicated_spans(df, n=3).collect()}
        assert got[1] == "the today"
        assert got[2] == "a indeed"
        assert got[3] == "totally unique text with no overlap at all here"

    def test_entirely_boilerplate_scrubs_to_empty(self, spark):
        df = _docs(spark, [(1, SHARED), (2, SHARED)])
        got = {r.doc_id: r.clean_text for r in scrub_duplicated_spans(df, n=3).collect()}
        assert got == {1: "", 2: ""}

    def test_output_is_normalized_token_stream(self, spark):
        # No duplication: clean_text is the lower/trim/ws-collapsed text.
        df = _docs(spark, [(1, "  MiXeD   Case\tspacing  ")])
        got = scrub_duplicated_spans(df, n=3).collect()[0]
        assert got.clean_text == "mixed case spacing"


class TestPositionalGrams:
    def test_positions_are_one_based_and_count_right(self, spark):
        df = _docs(spark, [(1, "a b c d")])
        rows = positional_ngram_hashes(df, "doc_id", "text", 2).collect()
        assert sorted(r.pos for r in rows) == [1, 2, 3]
        assert len({r.g for r in rows}) == 3
