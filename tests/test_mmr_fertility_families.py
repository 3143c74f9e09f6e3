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


class TestGopherRules:
    def _rules(self, spark, rows, **kw):
        from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
            gopher_rules,
        )

        df = spark.createDataFrame(rows, "doc_id int, text string")
        return {r.doc_id: r for r in gopher_rules(df, **kw).collect()}

    def test_each_rule_and_precedence(self, spark):
        prose = ("the quick brown fox jumps over the lazy dog and keeps "
                 "going to be sure of that with more text here now") * 2
        rows = [
            (1, prose),                          # passes everything
            (2, "too short"),                    # word_count
            (3, "a " * 60),                      # mean_word_len (1 < 3)
            (4, "#### ## " + prose),             # symbol_ratio
            (5, "- a\n- b\n- c\n" + prose),      # bullet_lines @ 0.5
            (6, prose + "..."),                  # ellipsis_lines (1/1)
            (7, "111 " * 60),                    # alpha_words
            (8, "zap flux " * 30),               # stopwords (none of 8)
            (9, None),                           # NULL -> word_count
        ]
        got = self._rules(
            spark, rows, min_words=10, max_bullet_frac=0.5, min_stopwords=2
        )
        assert got[1].passed and got[1].reason is None
        assert got[2].reason == "word_count"
        assert got[3].reason == "mean_word_len"
        assert got[4].reason == "symbol_ratio"
        assert got[5].reason == "bullet_lines"
        assert got[6].reason == "ellipsis_lines"
        assert got[7].reason == "alpha_words"
        assert got[8].reason == "stopwords"
        assert got[9].reason == "word_count" and got[9].n_words == 0

    def test_signal_values(self, spark):
        got = self._rules(spark, [(1, "ab cd  ef\n- gh ...")], min_words=1,
                          min_stopwords=0)
        r = got[1]
        # words: ab cd ef - gh ... -> 6; chars(no ws): 2+2+2+1+2+3 = 12
        assert r.n_words == 6
        assert r.mean_word_len == 2.0
        # one '...' -> symbols 1.0/6; 2 lines, 1 bullet, 1 ellipsis-end
        assert r.symbol_ratio == round(1.0 / 6, 6)
        assert r.bullet_frac == 0.5 and r.ellipsis_frac == 0.5
        # alpha words: ab cd ef gh = 4/6
        assert r.alpha_frac == round(4 / 6, 6)

    def test_word_count_upper_bound(self, spark):
        got = self._rules(spark, [(1, "w " * 30)], min_words=5, max_words=20)
        assert got[1].reason == "word_count" and got[1].n_words == 30

    def test_published_defaults_on_prose(self, spark):
        prose = (
            "the quick brown fox jumps over the lazy dog and that is fine "
            "to be sure of it with many more ordinary words appearing here "
        ) * 5
        got = self._rules(spark, [(1, prose)])
        assert got[1].passed
