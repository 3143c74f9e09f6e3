"""Benchmark-decontamination operator tests (n-gram overlap vs eval set)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.decontaminate import (
    embedding_decontaminate,
    decontaminate,
    ngram_contamination,
    ngram_set,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestNgramSet:
    def test_exact_grams_and_distinct(self, spark):
        df = _docs(spark, [(1, "a b c b c d"), (2, "x y")])
        got = {
            (r.doc_id, r.gram)
            for r in ngram_set(df, "doc_id", "text", 2).collect()
        }
        # "b c" appears twice in doc 1 — emitted once (distinct).
        assert got == {
            (1, "a b"),
            (1, "b c"),
            (1, "c b"),
            (1, "c d"),
            (2, "x y"),
        }

    def test_short_and_empty_docs_yield_nothing(self, spark):
        # Docs shorter than n tokens must not crash (F.sequence would
        # otherwise generate a DESCENDING index range) and emit no grams.
        df = _docs(spark, [(1, "only two"), (2, ""), (3, "   ")])
        assert ngram_set(df, "doc_id", "text", 3).count() == 0

    def test_case_and_whitespace_normalized(self, spark):
        df = _docs(spark, [(1, "  Alpha   BETA gamma ")])
        got = {r.gram for r in ngram_set(df, "doc_id", "text", 3).collect()}
        assert got == {"alpha beta gamma"}

    def test_invalid_n(self, spark):
        with pytest.raises(ValueError):
            ngram_set(_docs(spark, [(1, "a")]), "doc_id", "text", 0)


class TestContamination:
    def test_planted_overlap_found_near_miss_not(self, spark):
        docs = _docs(
            spark,
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                # shares only the 2-gram "quick brown" with eval 100 — no
                # 3-gram overlap ("quick brown cat" != "quick brown fox").
                (2, "a quick brown cat sits still"),
                (3, "completely unrelated text about parquet files"),
            ],
        )
        ev = spark.createDataFrame(
            [(100, "said the quick brown fox jumps high")],
            ["eval_id", "text"],
        )
        hits = {
            (r.doc_id, r.eval_id, r.shared_ngrams)
            for r in ngram_contamination(docs, ev, n=3).collect()
        }
        # doc 1 shares "the quick brown", "quick brown fox",
        # "brown fox jumps" → 3 grams.
        assert hits == {(1, 100, 3)}

    def test_decontaminate_drops_hits_keeps_clean(self, spark):
        docs = _docs(
            spark,
            [
                (1, "one two three four"),
                (2, "five six seven eight"),
                (3, "one two three nine"),
            ],
        )
        ev = spark.createDataFrame(
            [(7, "zero one two three")], ["eval_id", "text"]
        )
        kept = {
            r.doc_id for r in decontaminate(docs, ev, n=3).collect()
        }
        assert kept == {2}

    def test_min_shared_threshold(self, spark):
        docs = _docs(spark, [(1, "a b c d e"), (2, "a b c x y")])
        ev = spark.createDataFrame([(9, "a b c d z")], ["eval_id", "text"])
        # doc 1 shares "a b c", "b c d" (2 grams); doc 2 shares "a b c".
        kept = {
            r.doc_id for r in decontaminate(docs, ev, n=3, min_shared=2).collect()
        }
        assert kept == {2}

    def test_plan_broadcasts_eval_side(self, spark):
        docs = _docs(spark, [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)])
        ev = spark.createDataFrame([(1, "w1 w2 w3")], ["eval_id", "text"])
        plan = (
            ngram_contamination(docs, ev, n=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_random_corpus_matches_python_oracle(self, spark):
        """Randomized corpus (small vocab → heavy n-gram collisions) vs a
        direct pure-Python recomputation of every (doc, eval, count)."""

        def py_grams(text: str, n: int) -> set[str]:
            toks = text.strip().lower().split()
            return {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }

        rng = random.Random(23)
        # 6 words → 216 possible 3-grams: collisions are guaranteed at
        # this corpus size, so the equality check is non-vacuous.
        vocab = [f"w{i}" for i in range(6)]
        docs = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
            for i in range(40)
        ]
        evals = [
            (100 + i, " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 8))))
            for i in range(6)
        ]
        n = 3
        want = {}
        for did, dtext in docs:
            dg = py_grams(dtext, n)
            for eid, etext in evals:
                shared = dg & py_grams(etext, n)
                if shared:
                    want[(did, eid)] = len(shared)

        got = {
            (r.doc_id, r.eval_id): r.shared_ngrams
            for r in ngram_contamination(
                spark.createDataFrame(docs, ["doc_id", "text"]),
                spark.createDataFrame(evals, ["eval_id", "text"]),
                n=n,
            ).collect()
        }
        assert got == want and want  # non-vacuous by construction

    def test_entry_matches_analytic_construction(self, spark):
        """The contract entry's eval set is each 25th doc's first 12
        tokens — every eval item must at minimum hit its own source doc
        with (min(12, len) - 2) shared grams."""
        rows = [(i, " ".join(f"tok{i}x{j}" for j in range(5 + i % 9))) for i in range(60)]
        docs = _docs(spark, rows)
        toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ev = docs.filter(F.col("doc_id") % 25 == 0).select(
            F.col("doc_id").alias("eval_id"),
            F.array_join(F.slice(toks, 1, 12), " ").alias("text"),
        )
        got = {
            (r.doc_id, r.eval_id): r.shared_ngrams
            for r in ngram_contamination(docs, ev, n=3).collect()
        }
        for i in (0, 25, 50):
            n_tok = min(12, 5 + i % 9)
            assert got[(i, i)] == n_tok - 2
        # Tokens are doc-unique by construction → no cross hits.
        assert all(d == e for (d, e) in got)


class TestEmbeddingDecontaminate:
    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (0, [1.0, 0.0, 0.0]),   # identical to eval 100
                (1, [2.0, 0.0, 0.0]),   # scaled copy: cosine 1.0
                (2, [0.0, 1.0, 0.0]),   # orthogonal: cosine 0.0
                (3, [1.0, 1.0, 0.0]),   # 45 degrees: cosine 0.707
                (4, [0.0, 0.0, 0.0]),   # zero norm: unscorable
            ],
            "vec_id long, embedding array<double>",
        )

    def _evals(self, spark):
        return spark.createDataFrame(
            [(100, [1.0, 0.0, 0.0]), (200, [0.0, 0.0, 0.0])],
            "eval_id long, embedding array<double>",
        )

    def test_flags_exact_and_scaled_copies_only(self, spark):
        got = {
            r.vec_id: (r.eval_id, r.cosine, r.contaminated)
            for r in embedding_decontaminate(
                self._corpus(spark), self._evals(spark), threshold=0.99
            ).collect()
        }
        assert got[0] == (100, 1.0, True)
        assert got[1] == (100, 1.0, True)       # paraphrase analog: scale-invariant
        assert got[2] == (100, 0.0, False)
        assert got[3] == (100, 0.707, False)    # rounded to 3
        assert got[4] == (None, None, False)    # zero-norm row kept, unflagged

    def test_zero_norm_eval_items_dropped(self, spark):
        # eval 200 is all-zero: it must never be anyone's neighbor
        got = embedding_decontaminate(
            self._corpus(spark), self._evals(spark)
        ).collect()
        assert all(r.eval_id in (100, None) for r in got)

    def test_empty_eval_set_flags_nothing(self, spark):
        got = embedding_decontaminate(
            self._corpus(spark),
            self._evals(spark).filter("eval_id < 0"),
        ).collect()
        assert len(got) == 5
        assert all(not r.contaminated and r.eval_id is None for r in got)

    def test_nearest_tiebreak_prefers_smaller_eval_id(self, spark):
        evals = spark.createDataFrame(
            [(7, [1.0, 0.0, 0.0]), (3, [1.0, 0.0, 0.0])],
            "eval_id long, embedding array<double>",
        )
        got = {
            r.vec_id: r.eval_id
            for r in embedding_decontaminate(
                self._corpus(spark), evals
            ).collect()
        }
        assert got[0] == 3 and got[1] == 3
