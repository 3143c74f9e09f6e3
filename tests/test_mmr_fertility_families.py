"""MMR re-ranking, tokenizer fertility, dup-family histogram."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.dedup import (
    family_size_histogram,
)
from threat_intelligence_knowledge_graph_spark.operators.similarity import (
    mmr_rerank,
)
from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
    corpus_fertility,
)

Q = [1.0, 0.0]


class TestMmrRerank:
    def _emb(self, spark, rows):
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_diversity_beats_redundancy(self, spark):
        # two query-aligned duplicates + one orthogonal; lam=0.3 makes
        # the orthogonal candidate win rank 2 over the redundant copy.
        emb = self._emb(
            spark, [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, [0.0, 1.0])]
        )
        got = [
            (r["rank"], r.vec_id, r.cosine, r.mmr_score)
            for r in mmr_rerank(emb, Q, k=3, lam=0.3, pool=10)
            .orderBy("rank")
            .collect()
        ]
        assert [(g[0], g[1]) for g in got] == [(1, 1), (2, 3), (3, 2)]
        assert got[0][3] == pytest.approx(0.3)  # lam * 1.0
        assert got[1][3] == 0.0  # orthogonal: no relevance, no penalty
        assert got[2][3] == pytest.approx(0.3 - 0.7)  # redundant dup

    def test_pure_relevance_at_lam_one(self, spark):
        emb = self._emb(
            spark, [(1, [1.0, 0.0]), (2, [2.0, 0.0]), (3, [0.0, 1.0])]
        )
        got = [
            r.vec_id
            for r in mmr_rerank(emb, Q, k=3, lam=1.0, pool=10)
            .orderBy("rank")
            .collect()
        ]
        assert got == [1, 2, 3]  # cosine order, id tiebreak

    def test_zero_norm_excluded_and_pool_cut(self, spark):
        emb = self._emb(
            spark,
            [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 1.0]),
             (4, [3.0, 4.0])],
        )
        got = mmr_rerank(emb, Q, k=2, lam=0.3, pool=2).collect()
        ids = {r.vec_id for r in got}
        assert 2 not in ids  # zero vector never a candidate
        # pool=2 keeps only the top-2 by cosine (ids 1, 4): rank 2 must
        # come from the pool even though id 3 is more diverse.
        assert ids == {1, 4}

    def test_short_corpus_returns_fewer(self, spark):
        emb = self._emb(spark, [(1, [1.0, 0.0])])
        assert mmr_rerank(emb, Q, k=5, lam=0.5, pool=10).count() == 1

    def test_validation(self, spark):
        emb = self._emb(spark, [(1, [1.0, 0.0])])
        with pytest.raises(ValueError):
            mmr_rerank(emb, Q, k=0)
        with pytest.raises(ValueError):
            mmr_rerank(emb, Q, k=5, pool=3)


class TestCorpusFertility:
    def test_sums_and_ratios(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "ab cd", "web"),     # 2 tokens, 5 chars
                (2, "x, y", "web"),      # 3 tokens (x , y), 4 chars
                (3, None, "web"),        # NULL: 0 chars, no tokens
                (4, "123", "code"),      # 1 token, 3 chars
            ],
            "doc_id int, text string, source string",
        )
        got = {r["group"]: r for r in corpus_fertility(docs).collect()}
        web = got["web"]
        assert (web.n_docs, web.total_chars, web.total_tokens) == (3, 9, 5)
        assert web.chars_per_token == round(9 / 5, 6)
        assert web.tokens_per_doc == round(5 / 3, 6)
        code = got["code"]
        assert (code.n_docs, code.total_tokens) == (1, 1)
        assert code.chars_per_token == 3.0

    def test_zero_token_group_null_ratio(self, spark):
        docs = spark.createDataFrame(
            [(1, "   ", "blank")], "doc_id int, text string, source string"
        )
        [r] = corpus_fertility(docs).collect()
        assert r.total_tokens == 0 and r.chars_per_token is None
        assert r.tokens_per_doc == 0.0


class TestFamilySizeHistogram:
    def test_histogram(self, spark):
        docs = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c"),
             (7, None), (8, "")],
            "doc_id int, text string",
        )
        got = {
            r.family_size: (r.n_families, r.n_docs)
            for r in family_size_histogram(docs).collect()
        }
        # NULL and '' coalesce into one size-2 family.
        assert got == {3: (1, 3), 2: (2, 4), 1: (1, 1)}
