"""Round-5 closing operators: local clustering coefficient, CUSUM
level-shift, BM25 retrieval, blocklist gate — hand-computed fixtures."""

from __future__ import annotations

import datetime
import math

import pytest

from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
    cusum_level_shift,
)
from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
    local_clustering_coefficient,
)
from threat_intelligence_knowledge_graph_spark.operators.retrieval import rrf_fuse
from threat_intelligence_knowledge_graph_spark.operators.stats import burstiness_fano
from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
    blocklist_filter,
    bm25_search,
    type_token_ratio,
)


class TestLocalClusteringCoefficient:
    def test_triangle_plus_pendant(self, spark):
        # Triangle (1,2,3) with pendant 4 hanging off node 3.
        e = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], ["src", "dst"]
        )
        got = {r.id: (r.degree, r.lcc) for r in local_clustering_coefficient(e).collect()}
        assert got[1] == (2, 1.0)
        assert got[2] == (2, 1.0)
        assert got[3] == (3, round(2.0 * 1 / (3 * 2), 6))
        assert got[4] == (1, 0.0)

    def test_self_loop_only_node_appears_with_zero(self, spark):
        e = spark.createDataFrame([(1, 2), (9, 9)], ["src", "dst"])
        got = {r.id: (r.degree, r.lcc) for r in local_clustering_coefficient(e).collect()}
        # Node 9's only edge is a self-loop: in the universe, degree 0.
        assert got[9] == (0, 0.0)
        assert got[1] == (1, 0.0)

    def test_parallel_and_reversed_edges_dedupe(self, spark):
        e = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1)], ["src", "dst"]
        )
        got = {r.id: r.lcc for r in local_clustering_coefficient(e).collect()}
        assert got == {1: 1.0, 2: 1.0, 3: 1.0}


class TestCusumLevelShift:
    def _ev(self, spark, counts_by_hour, etype="err"):
        base = datetime.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for h, n in enumerate(counts_by_hour):
            for _ in range(n):
                rows.append((eid, base + datetime.timedelta(hours=h, minutes=5), etype))
                eid += 1
        return spark.createDataFrame(rows, ["event_id", "ts", "event_type"])

    def test_level_shift_grows_linearly_and_alarms(self, spark):
        # 4 hours at 2/h then 4 hours at 18/h: n=8, T=80.
        # d = 8*x - 80: four × -64 then four × +64.
        # cs: -64,-128,-192,-256,-192,-128,-64,0; s = cs - min prefix:
        # 0,0,0,0,64,128,192,256 — alarm only when s > 3*80 = 240.
        ev = self._ev(spark, [2, 2, 2, 2, 18, 18, 18, 18])
        got = sorted(cusum_level_shift(ev).collect(), key=lambda r: r.bucket)
        assert [r.cusum_scaled for r in got] == [0, 0, 0, 0, 64, 128, 192, 256]
        assert [r.alarm for r in got] == [False] * 7 + [True]

    def test_isolated_spike_decays(self, spark):
        # One spike hour in an otherwise flat signal: the max(0, ·)
        # floor keeps the statistic from going negative before the
        # spike, and the negative drift absorbs it afterwards.
        ev = self._ev(spark, [5, 5, 5, 29, 5, 5, 5, 5])
        got = sorted(cusum_level_shift(ev).collect(), key=lambda r: r.bucket)
        # n=8, T=64: d = 8x-64 → -24 ×3, +168, then -24 ×4.
        assert [r.cusum_scaled for r in got] == [0, 0, 0, 168, 144, 120, 96, 72]
        assert not any(r.alarm for r in got)

    def test_groups_are_independent(self, spark):
        a = self._ev(spark, [1, 1, 1, 1], "a")
        b = self._ev(spark, [7, 1, 1, 1], "b")
        got = cusum_level_shift(a.union(b)).collect()
        by = {(r.event_type, str(r.bucket)): r.cusum_scaled for r in got}
        assert all(v == 0 for (g, _), v in by.items() if g == "a")
        # b: n=4, T=10, d = 4x-10 → 18,-6,-6,-6; s = 18,12,6,0.
        bvals = sorted(v for (g, _), v in by.items() if g == "b")
        assert bvals == [0, 6, 12, 18]


class TestBm25Search:
    def test_exact_two_doc_scores(self, spark):
        docs = spark.createDataFrame(
            [(1, "cat dog"), (2, "cat cat fish")], ["doc_id", "text"]
        )
        got = {r.doc_id: (r.score, r.rk) for r in bm25_search(docs, ["cat"], k=5).collect()}
        idf = math.log(1.0 + (2 - 2 + 0.5) / (2 + 0.5))
        s1 = round(idf * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * (2 * 2) / 5)), 6)
        s2 = round(idf * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * (3 * 2) / 5)), 6)
        assert got[1] == (s1, 2)
        assert got[2] == (s2, 1)
        assert s2 > s1  # higher tf wins despite longer doc

    def test_non_matching_docs_absent_and_k_respected(self, spark):
        docs = spark.createDataFrame(
            [(i, "cat toy") for i in range(5)] + [(99, "zebra")],
            ["doc_id", "text"],
        )
        got = bm25_search(docs, ["cat"], k=3).collect()
        assert len(got) == 3
        assert all(r.doc_id != 99 for r in got)
        # Equal scores: doc_id ascending tiebreak.
        assert [r.doc_id for r in got] == [0, 1, 2]

    def test_empty_query_raises(self, spark):
        docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            bm25_search(docs, [])


class TestBlocklistFilter:
    def test_hits_ratio_and_flag(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "bad bad ok ok"),          # 2/4 = 0.5 → blocked
                (2, "ok ok ok ok ok ok ok ok ok bad"),  # 1/10 = 0.1 → not (strict >)
                (3, "clean text only"),
            ],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r for r in blocklist_filter(docs, ["bad"], max_ratio=0.1).collect()}
        assert (got[1].bad_hits, got[1].bad_ratio, got[1].blocked) == (2, 0.5, True)
        assert (got[2].bad_hits, got[2].bad_ratio, got[2].blocked) == (1, 0.1, False)
        assert (got[3].bad_hits, got[3].blocked) == (0, False)

    def test_whole_token_no_substring_trap(self, spark):
        docs = spark.createDataFrame([(1, "scunthorpe is fine")], ["doc_id", "text"])
        got = blocklist_filter(docs, ["thorpe", "horp"]).collect()[0]
        assert got.bad_hits == 0 and not got.blocked


class TestRrfFuse:
    def _ranking(self, spark, pairs):
        return spark.createDataFrame(pairs, ["doc_id", "rk"])

    def test_exact_scores_and_overlap_boost(self, spark):
        r1 = self._ranking(spark, [(1, 1), (2, 2), (3, 3)])
        r2 = self._ranking(spark, [(3, 1), (4, 2)])
        got = {r.doc_id: (r.score, r.rk) for r in rrf_fuse([r1, r2], k=60).collect()}
        # doc 3 appears in both lists: 1/63 + 1/61 beats doc 1's 1/61.
        assert got[3][0] == round(1 / 63 + 1 / 61, 6)
        assert got[3][1] == 1
        assert got[1] == (round(1 / 61, 6), 2)
        assert got[2] == (round(1 / 62, 6), 3)
        assert got[4] == (round(1 / 62, 6), 4)  # ties break by id

    def test_top_cut_and_validation(self, spark):
        r1 = self._ranking(spark, [(i, i + 1) for i in range(10)])
        assert rrf_fuse([r1], top=4).count() == 4
        with pytest.raises(ValueError):
            rrf_fuse([])
        with pytest.raises(ValueError):
            rrf_fuse([r1], k=0)


class TestTypeTokenRatio:
    def test_exact_ratio(self, spark):
        docs = spark.createDataFrame(
            [(1, "spam spam spam spam"), (2, "all four words differ")],
            ["doc_id", "text"],
        )
        got = {r.doc_id: r for r in type_token_ratio(docs).collect()}
        assert (got[1].n_tokens, got[1].n_types, got[1].ttr) == (4, 1, 0.25)
        assert (got[2].n_tokens, got[2].n_types, got[2].ttr) == (4, 4, 1.0)

    def test_case_folds_to_same_type(self, spark):
        docs = spark.createDataFrame([(1, "Spark SPARK spark")], ["doc_id", "text"])
        got = type_token_ratio(docs).collect()[0]
        assert (got.n_tokens, got.n_types) == (3, 1)


class TestBurstinessFano:
    def _ev(self, spark, counts, etype):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (etype + str(h) + str(i), base + datetime.timedelta(hours=h), etype)
            for h, n in enumerate(counts)
            for i in range(n)
        ]
        return spark.createDataFrame(rows, ["event_id", "ts", "event_type"])

    def test_constant_rate_is_zero_poisson_like_near_one(self, spark):
        flat = self._ev(spark, [5, 5, 5, 5], "flat")
        bursty = self._ev(spark, [1, 1, 1, 17], "bursty")
        got = {r.event_type: r for r in burstiness_fano(flat.union(bursty)).collect()}
        assert got["flat"].fano == 0.0
        # bursty: n=4, s1=20, s2=292 → (4*292 - 400)/(4*20) = 768/80 = 9.6
        assert got["bursty"].n_buckets == 4
        assert got["bursty"].fano == 9.6


from threat_intelligence_knowledge_graph_spark.operators.stats import (
    markov_transitions,
)
from threat_intelligence_knowledge_graph_spark.operators.text_quality import top_ngrams


class TestMarkovTransitions:
    def test_exact_probabilities(self, spark):
        base = datetime.datetime(2024, 1, 1)
        seq = ["a", "b", "a", "b", "a", "c"]
        rows = [
            (i, base + datetime.timedelta(minutes=i), 1, s)
            for i, s in enumerate(seq)
        ]
        ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
        got = {(r.src_state, r.dst_state): (r.n, r.prob) for r in markov_transitions(ev).collect()}
        # a→b twice, a→c once, b→a twice.
        assert got[("a", "b")] == (2, round(2 / 3, 6))
        assert got[("a", "c")] == (1, round(1 / 3, 6))
        assert got[("b", "a")] == (2, 1.0)
        assert ("c", "a") not in got  # no transition out of the final state

    def test_no_cross_user_transitions(self, spark):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (0, base, 1, "a"),
            (1, base + datetime.timedelta(minutes=1), 2, "b"),
        ]
        ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
        assert markov_transitions(ev).count() == 0

    def test_same_instant_orders_by_id(self, spark):
        base = datetime.datetime(2024, 1, 1)
        rows = [(0, base, 1, "x"), (1, base, 1, "y")]
        ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
        got = markov_transitions(ev).collect()
        assert [(r.src_state, r.dst_state) for r in got] == [("x", "y")]


class TestTopNgrams:
    def test_bigram_counts_and_rank(self, spark):
        docs = spark.createDataFrame(
            [(1, "the quick fox"), (2, "the quick dog"), (3, "so")],
            ["doc_id", "text"],
        )
        got = [(r.ngram, r.n, r.rk) for r in top_ngrams(docs, n=2, k=10).collect()]
        assert got[0] == ("the quick", 2, 1)
        assert ("quick dog", 1) in [(g, c) for g, c, _ in got]
        # the single-token doc contributes nothing
        assert all(" " in g for g, _, _ in got)

    def test_ties_break_lexicographically_and_k_cuts(self, spark):
        docs = spark.createDataFrame([(1, "bb aa bb aa cc dd")], ["doc_id", "text"])
        got = [(r.ngram, r.rk) for r in top_ngrams(docs, n=2, k=3).collect()]
        # 'bb aa' ×2 leads; the count-1 ties rank lexicographically and
        # k=3 cuts 'cc dd'.
        assert got == [("bb aa", 1), ("aa bb", 2), ("aa cc", 3)]

    def test_validation(self, spark):
        docs = spark.createDataFrame([(1, "x y")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            top_ngrams(docs, n=0)


from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
    vocab_growth,
    vocab_prune,
)


class TestVocabPrune:
    def test_band_bites_both_sides(self, spark):
        # 'common' in all 4 docs (df=4 > floor(0.5*4)=2), 'rare' in 1
        # (< min_df=2), 'mid' in 2 — only 'mid' survives.
        docs = spark.createDataFrame(
            [
                (1, "common rare mid"),
                (2, "common mid"),
                (3, "common"),
                (4, "common"),
            ],
            ["doc_id", "text"],
        )
        got = {r.term: r.df for r in vocab_prune(docs, min_df=2, max_df_ratio=0.5).collect()}
        assert got == {"mid": 2}

    def test_df_is_distinct_doc_count(self, spark):
        docs = spark.createDataFrame([(1, "dup dup dup"), (2, "dup")], ["doc_id", "text"])
        got = vocab_prune(docs, min_df=1, max_df_ratio=1.0).collect()
        assert [(r.term, r.df) for r in got] == [("dup", 2)]

    def test_validation(self, spark):
        docs = spark.createDataFrame([(1, "x y")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            vocab_prune(docs, min_df=0)
        with pytest.raises(ValueError):
            vocab_prune(docs, max_df_ratio=0.0)


class TestVocabGrowth:
    def test_per_source_types_and_ratio(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "aa bb aa bb", "template"),
                (2, "aa bb", "template"),
                (3, "cc dd ee ff", "fresh"),
            ],
            ["doc_id", "text", "source"],
        )
        got = {r.source: r for r in vocab_growth(docs).collect()}
        assert (got["template"].n_tokens, got["template"].n_types) == (6, 2)
        assert got["template"].type_token_ratio == round(2 / 6, 6)
        assert (got["fresh"].n_tokens, got["fresh"].n_types) == (4, 4)
        assert got["fresh"].type_token_ratio == 1.0


from threat_intelligence_knowledge_graph_spark.operators.stats import event_entropy


class TestEventEntropy:
    def _ev(self, spark, rows):
        return spark.createDataFrame(
            [(f"e{i}", u, t) for i, (u, t) in enumerate(rows)],
            ["event_id", "user_id", "event_type"],
        )

    def test_single_state_is_exactly_zero(self, spark):
        df = self._ev(spark, [("beacon", "dns")] * 7)
        (row,) = event_entropy(df).collect()
        assert (row.n_events, row.n_states, row.entropy) == (7, 1, 0.0)

    def test_uniform_k_states_is_ln_k(self, spark):
        df = self._ev(spark, [("u", t) for t in "abcd" for _ in range(3)])
        (row,) = event_entropy(df).collect()
        assert row.n_events == 12 and row.n_states == 4
        assert row.entropy == round(math.log(4), 6)

    def test_hand_computed_mixed_and_group_independence(self, spark):
        # u1: counts {a:3, b:1} → H = ln4 − (3·ln3 + 1·ln1)/4
        df = self._ev(
            spark,
            [("u1", "a")] * 3 + [("u1", "b")] + [("u2", "x")] * 5,
        )
        got = {r.user_id: r for r in event_entropy(df).collect()}
        assert got["u1"].entropy == round(math.log(4) - 3 * math.log(3) / 4, 6)
        assert got["u2"].entropy == 0.0
        assert got["u2"].n_states == 1


from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
    beacon_regularity,
)


class TestBeaconRegularity:
    def _ev(self, spark, user, etype, offsets):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (f"{user}-{etype}-{i}", user, etype,
             base + datetime.timedelta(seconds=o))
            for i, o in enumerate(offsets)
        ]
        return spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        )

    def test_clocked_beacon_is_zero_human_is_large(self, spark):
        beacon = self._ev(spark, "imp", "dns", [0, 60, 120, 180, 240])
        # gaps 10,100,10,100: cv2 = (4*20200 - 220^2)/220^2 = 32400/48400
        human = self._ev(spark, "ana", "web", [0, 10, 110, 120, 220])
        got = {
            (r.user_id, r.event_type): r
            for r in beacon_regularity(beacon.union(human)).collect()
        }
        b = got[("imp", "dns")]
        assert (b.n_events, b.mean_gap_s, b.cv2) == (5, 60.0, 0.0)
        h = got[("ana", "web")]
        assert h.cv2 == round(32400 / 48400, 6)
        assert b.cv2 < h.cv2

    def test_min_events_suppresses_short_channels(self, spark):
        short = self._ev(spark, "u", "a", [0, 60, 120])  # 3 events < 4
        assert beacon_regularity(short).count() == 0
        assert beacon_regularity(short, min_events=3).count() == 1

    def test_same_second_flood_null_cv2_and_channel_independence(self, spark):
        flood = self._ev(spark, "u", "burst", [0, 0, 0, 0])
        clock = self._ev(spark, "u", "tick", [0, 5, 10, 15])
        got = {
            (r.user_id, r.event_type): r
            for r in beacon_regularity(flood.union(clock)).collect()
        }
        assert got[("u", "burst")].cv2 is None
        assert got[("u", "burst")].mean_gap_s == 0.0
        assert got[("u", "tick")].cv2 == 0.0

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            beacon_regularity(self._ev(spark, "u", "a", [0]), min_events=1)


from threat_intelligence_knowledge_graph_spark.operators.stats import (
    gini_concentration,
)


class TestGiniConcentration:
    def test_hand_computed_and_even_and_single(self, spark):
        # counts a:1, b:3 -> sorted x=[1,3]: G = (1*1 + 3*3 - 2*4)/(2*4)
        df = spark.createDataFrame(
            [("a",), ("b",), ("b",), ("b",)], ["source"]
        )
        (row,) = gini_concentration(df).collect()
        assert (row.n_groups, row.total, row.gini) == (2, 4, 0.25)

        even = spark.createDataFrame(
            [(s,) for s in "abcd" for _ in range(5)], ["source"]
        )
        (row,) = gini_concentration(even).collect()
        assert (row.n_groups, row.gini) == (4, 0.0)

        (row,) = gini_concentration(
            spark.createDataFrame([("only",)] * 9, ["source"])
        ).collect()
        assert (row.n_groups, row.gini) == (1, 0.0)

    def test_weighted_mode_and_monotone_concentration(self, spark):
        # chars a:10, b:10, c:80 is more concentrated than 30/30/40
        skew = spark.createDataFrame(
            [("a", 10), ("b", 10), ("c", 80)], ["source", "n_chars"]
        )
        flat = spark.createDataFrame(
            [("a", 30), ("b", 30), ("c", 40)], ["source", "n_chars"]
        )
        g_skew = gini_concentration(skew, weight_col="n_chars").collect()[0]
        g_flat = gini_concentration(flat, weight_col="n_chars").collect()[0]
        # skew: sorted [10,10,80]: (1*10+3*10+5*80-3*100)/(3*100) = 140/300
        assert g_skew.gini == round(140 / 300, 6)
        assert g_flat.gini < g_skew.gini


from threat_intelligence_knowledge_graph_spark.operators.stats import (
    top_event_sequences,
)


class TestTopEventSequences:
    def _ev(self, spark, user, seq, start=0):
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (f"{user}-{i}", user, t, base + datetime.timedelta(seconds=start + i))
            for i, t in enumerate(seq)
        ]
        return spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts"]
        )

    def test_counts_rank_and_no_cross_user_patterns(self, spark):
        # u1: a b c a b c -> 'a > b > c' x2, 'b > c > a' x1, 'c > a > b' x1
        u1 = self._ev(spark, "u1", list("abcabc"))
        # u2: x y z -> 'x > y > z' x1; boundary must not splice u1+u2
        u2 = self._ev(spark, "u2", list("xyz"))
        got = top_event_sequences(u1.union(u2), n=3, k=10).collect()
        m = {r.pattern: (r.n, r.rk) for r in got}
        assert m["a > b > c"] == (2, 1)
        assert m["b > c > a"] == (1, 2)  # ASC pattern tiebreak among n=1
        assert m["x > y > z"][0] == 1
        assert len(got) == 4  # no spliced cross-user trigram

    def test_short_group_emits_nothing_and_k_cut(self, spark):
        short = self._ev(spark, "s", list("ab"))
        assert top_event_sequences(short, n=3, k=5).count() == 0
        u = self._ev(spark, "u", list("abcd"))
        got = top_event_sequences(u, n=3, k=1).collect()
        assert len(got) == 1 and got[0].rk == 1
        assert got[0].pattern == "a > b > c"  # ASC tiebreak at the cut

    def test_bigram_mode_and_validation(self, spark):
        u = self._ev(spark, "u", list("aba"))
        got = {r.pattern: r.n for r in top_event_sequences(u, n=2, k=10).collect()}
        assert got == {"a > b": 1, "b > a": 1}
        with pytest.raises(ValueError):
            top_event_sequences(u, n=1)
        with pytest.raises(ValueError):
            top_event_sequences(u, k=0)


from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
    reciprocity,
)


class TestReciprocity:
    def test_conventions_and_exact_value(self, spark):
        # mutual (1,2)/(2,1), one-way (1,3), self-loop (4,4) dropped,
        # duplicate (1,2) deduped -> 2 of 3 directed edges mutual.
        e = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 3), (4, 4), (1, 2)], ["src", "dst"]
        )
        (row,) = reciprocity(e).collect()
        assert (row.n_directed, row.n_mutual) == (3, 2)
        assert row.reciprocity == round(2 / 3, 6)

    def test_all_mutual_and_empty(self, spark):
        e = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
        (row,) = reciprocity(e).collect()
        assert row.reciprocity == 1.0
        empty = spark.createDataFrame([], "src int, dst int")
        (row,) = reciprocity(empty).collect()
        assert (row.n_directed, row.n_mutual, row.reciprocity) == (0, 0, None)


from threat_intelligence_knowledge_graph_spark.operators.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
)


class TestContainmentPairs:
    def test_quote_inclusion_caught_where_jaccard_misses(self, spark):
        small = "one two three four five six"
        big = small + " p1 p2 p3 p4 p5 p6"
        docs = spark.createDataFrame([(1, small), (2, big)], ["doc_id", "text"])
        pairs, dropped = containment_pairs(docs, threshold=0.8)
        (row,) = pairs.collect()
        # A has 4 shingles, all inside B's 10: C(A->B)=1.0, C(B->A)=0.4.
        assert (row.a, row.b, row.inter) == (1, 2, 4)
        assert (row.c_a_in_b, row.c_b_in_a) == (1.0, 0.4)
        assert dropped.count() == 0
        # symmetric Jaccard at 0.5 misses the same pair (4/10 < 0.5)
        assert ngram_jaccard_pairs(docs, threshold=0.5).count() == 0

    def test_hot_shingle_cap_reports_but_inter_stays_exact(self, spark):
        d1 = "c1 c2 c3 c4 c5 h1 h2 h3"
        d2 = d1 + " d9"
        boiler = [(i, f"y{i} z{i} h1 h2 h3") for i in range(3, 7)]
        docs = spark.createDataFrame(
            [(1, d1), (2, d2)] + boiler, ["doc_id", "text"]
        )
        pairs, dropped = containment_pairs(docs, threshold=0.8, max_postings=3)
        (row,) = pairs.collect()
        # candidacy via the 5 rare shared shingles; the dropped hot
        # shingle h1h2h3 (df 6 > 3) still counts in the EXACT inter.
        assert (row.a, row.b, row.inter) == (1, 2, 6)
        assert (row.c_a_in_b, row.c_b_in_a) == (1.0, round(6 / 7, 6))
        d = dropped.collect()
        assert [(r.shingle, r.df) for r in d] == [("h1 h2 h3", 6)]

    def test_min_shared_and_validation(self, spark):
        # docs sharing exactly ONE shingle are never candidates
        docs = spark.createDataFrame(
            [(1, "a b c x1 y1"), (2, "a b c x2 y2")], ["doc_id", "text"]
        )
        pairs, _ = containment_pairs(docs, threshold=0.1, min_shared=2)
        assert pairs.count() == 0
        pairs1, _ = containment_pairs(docs, threshold=0.3, min_shared=1)
        (row,) = pairs1.collect()
        assert row.inter == 1 and row.c_a_in_b == round(1 / 3, 6)
        with pytest.raises(ValueError):
            containment_pairs(docs, threshold=0.0)
        with pytest.raises(ValueError):
            containment_pairs(docs, min_shared=0)


from threat_intelligence_knowledge_graph_spark.operators.stats import (
    correlated_series,
)


class TestCorrelatedSeries:
    def _ev(self, spark, series):
        base = datetime.datetime(2024, 1, 1)
        rows = []
        for etype, counts in series.items():
            for h, c in enumerate(counts):
                for i in range(c):
                    rows.append(
                        (f"{etype}{h}{i}", etype,
                         base + datetime.timedelta(hours=h, minutes=i % 60))
                    )
        return spark.createDataFrame(rows, ["event_id", "event_type", "ts"])

    def test_perfect_correlation_anticorrelation_and_constant_drop(self, spark):
        ev = self._ev(spark, {
            "p": [1, 2, 3, 4], "q": [2, 4, 6, 8],
            "r": [4, 3, 2, 1], "s": [5, 5, 5, 5],
        })
        got = {(x.a, x.b): x for x in correlated_series(ev).collect()}
        # constant series s has zero variance: every s-pair dropped
        assert set(got) == {("p", "q"), ("p", "r"), ("q", "r")}
        assert (got[("p", "q")].direction, got[("p", "q")].r2) == (1, 1.0)
        assert (got[("p", "r")].direction, got[("p", "r")].r2) == (-1, 1.0)
        assert (got[("q", "r")].direction, got[("q", "r")].r2) == (-1, 1.0)
        assert got[("p", "q")].n_shared == 4

    def test_partial_correlation_exact_value(self, spark):
        ev = self._ev(spark, {"p": [1, 2, 3, 4], "t": [1, 1, 4, 4]})
        (row,) = correlated_series(ev).collect()
        # n=4: num = 4*31-100 = 24, vars 20 and 36 -> 576/720 = 0.8
        assert (row.direction, row.r2) == (1, 0.8)

    def test_min_overlap_gate_and_validation(self, spark):
        ev = self._ev(spark, {"p": [1, 2, 3, 4], "u": [1, 2, 0, 0]})
        assert correlated_series(ev, min_overlap=3).count() == 0
        got = correlated_series(ev, min_overlap=2).collect()
        assert len(got) == 1 and got[0].n_shared == 2
        with pytest.raises(ValueError):
            correlated_series(ev, min_overlap=0)


from threat_intelligence_knowledge_graph_spark.operators.stats import trend_slope


class TestTrendSlope:
    def _ev(self, spark, series):
        base = datetime.datetime(2024, 1, 1)
        rows = []
        for etype, counts in series.items():
            for h, c in enumerate(counts):
                for i in range(c):
                    rows.append(
                        (f"{etype}{h}{i}", etype,
                         base + datetime.timedelta(hours=h, minutes=i))
                    )
        return spark.createDataFrame(rows, ["event_id", "event_type", "ts"])

    def test_ramp_decline_flat_exact(self, spark):
        ev = self._ev(spark, {
            "up": [1, 2, 3, 4], "down": [4, 3, 2, 1],
            "flat": [5, 5], "once": [7],
        })
        got = {r.event_type: r for r in trend_slope(ev).collect()}
        # single-hour type has zero denominator: dropped
        assert set(got) == {"up", "down", "flat"}
        assert (got["up"].direction, got["up"].slope) == (1, 1.0)
        assert (got["down"].direction, got["down"].slope) == (-1, -1.0)
        assert (got["flat"].direction, got["flat"].slope) == (0, 0.0)
        assert got["up"].n_buckets == 4

    def test_gap_uses_true_hour_distance(self, spark):
        # active hours 0 and 2 (hour 1 silent): slope spans 2 hours,
        # (3-1)/2 = 1.0 — not the 2.0 a dense index would fake.
        ev = self._ev(spark, {"g": [1, 0, 3]})
        (row,) = trend_slope(ev).collect()
        assert (row.n_buckets, row.slope) == (2, 1.0)


class TestAnalyzeEventsCli:
    def _mod(self):
        import importlib.util as _ilu
        import os as _os

        spec = _ilu.spec_from_file_location(
            "analyze_events",
            _os.path.join(
                _os.path.dirname(__file__), "..", "jobs", "analyze_events.py"
            ),
        )
        mod = _ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_reports_print_and_write(self, spark, tmp_path, capsys):
        ae = self._mod()
        base = datetime.datetime(2024, 1, 1)
        rows = [
            (f"e{h}{i}", "u1", "dns",
             base + datetime.timedelta(hours=h, minutes=i), float(i))
            for h in range(4)
            for i in range(h + 1)
        ]
        src = str(tmp_path / "events.parquet")
        spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts", "value"]
        ).write.parquet(src)

        rc = ae.main(["--input", src, "--report", "trend"], spark=spark)
        out = capsys.readouterr().out
        assert rc == 0 and "slope" in out and "dns" in out
        # session passed in is not stopped
        assert spark.sql("SELECT 1").collect()[0][0] == 1

        dst = str(tmp_path / "out.parquet")
        rc = ae.main(
            ["--input", src, "--report", "entropy", "--output", dst],
            spark=spark,
        )
        assert rc == 0
        got = spark.read.parquet(dst).collect()
        assert len(got) == 1 and got[0].entropy == 0.0  # single state

    def test_funnel_requires_steps(self, spark, tmp_path):
        ae = self._mod()
        src = str(tmp_path / "ev.parquet")
        spark.createDataFrame(
            [("e1", "u", "a", datetime.datetime(2024, 1, 1))],
            ["event_id", "user_id", "event_type", "ts"],
        ).write.parquet(src)
        with pytest.raises(SystemExit):
            ae.main(["--input", src, "--report", "funnel"], spark=spark)


from threat_intelligence_knowledge_graph_spark.operators.stats import novelty_curve


class TestNoveltyCurve:
    def test_first_seen_counts_and_zero_novelty_day(self, spark):
        base = datetime.datetime(2024, 1, 1)
        day = datetime.timedelta(days=1)
        rows = [
            ("e1", "a", base),            # day 0: a, b new
            ("e2", "b", base),
            ("e3", "a", base + day),      # day 1: only re-sightings
            ("e4", "b", base + day),
            ("e5", "c", base + 2 * day),  # day 2: c new, a active
            ("e6", "a", base + 2 * day),
            ("e7", "a", base + 2 * day),  # dup within (group, day)
        ]
        ev = spark.createDataFrame(rows, ["event_id", "event_type", "ts"])
        got = {r.bucket: r for r in novelty_curve(ev).collect()}
        d0 = min(got)
        assert (got[d0].n_new, got[d0].n_active, got[d0].pct_new) == (2, 2, 1.0)
        assert (got[d0 + 1].n_new, got[d0 + 1].n_active) == (0, 2)
        assert got[d0 + 1].pct_new == 0.0
        assert (got[d0 + 2].n_new, got[d0 + 2].n_active) == (1, 2)
        assert got[d0 + 2].pct_new == 0.5

    def test_null_ts_excluded_and_validation(self, spark):
        ev = spark.createDataFrame(
            [("e1", "a", datetime.datetime(2024, 1, 1)), ("e2", "b", None)],
            ["event_id", "event_type", "ts"],
        )
        got = novelty_curve(ev).collect()
        assert len(got) == 1 and got[0].n_new == 1
        with pytest.raises(ValueError):
            novelty_curve(ev, bucket_seconds=0)


from threat_intelligence_knowledge_graph_spark.operators.stats import (
    autocorrelation,
)


class TestAutocorrelation:
    def _ev(self, spark, series):
        base = datetime.datetime(2024, 1, 1)
        rows = []
        for etype, counts in series.items():
            for h, c in enumerate(counts):
                for i in range(c):
                    rows.append(
                        (f"{etype}{h}{i}", etype,
                         base + datetime.timedelta(hours=h, minutes=i))
                    )
        return spark.createDataFrame(rows, ["event_id", "event_type", "ts"])

    def test_cycle_detected_at_its_period(self, spark):
        # period-2 cycle 1,5,1,5,...: lag 2 aligns peaks (r2=1, +1),
        # lag 1 anti-aligns (r2=1, -1)
        cyc = {"c": [1, 5] * 4}
        ev = self._ev(spark, cyc)
        (r2,) = autocorrelation(ev, lag_hours=2).collect()
        assert (r2.direction, r2.r2, r2.n_pairs) == (1, 1.0, 6)
        (r1,) = autocorrelation(ev, lag_hours=1).collect()
        assert (r1.direction, r1.r2) == (-1, 1.0)

    def test_constant_series_dropped_and_min_pairs(self, spark):
        ev = self._ev(spark, {"flat": [3] * 6, "c": [1, 5] * 3})
        got = {r.event_type for r in autocorrelation(ev, lag_hours=2).collect()}
        assert got == {"c"}  # zero-variance flat series dropped
        short = self._ev(spark, {"s": [1, 5, 1, 5]})  # 2 pairs at lag 2
        assert autocorrelation(short, lag_hours=2, min_pairs=3).count() == 0
        assert autocorrelation(short, lag_hours=2, min_pairs=2).count() == 1

    def test_validation(self, spark):
        ev = self._ev(spark, {"a": [1, 2]})
        with pytest.raises(ValueError):
            autocorrelation(ev, lag_hours=0)
        with pytest.raises(ValueError):
            autocorrelation(ev, min_pairs=1)


from threat_intelligence_knowledge_graph_spark.operators.stats import set_churn


class TestSetChurn:
    def test_hand_computed_day_over_day(self, spark):
        base = datetime.datetime(2024, 1, 1)
        day = datetime.timedelta(days=1)
        rows = (
            [("a", base), ("b", base)]                       # day 0: {a,b}
            + [("b", base + day), ("c", base + day),
               ("b", base + day)]                            # day 1: {b,c}
            + [("x", base + 3 * day)]                        # day 3 (gap at 2)
        )
        ev = spark.createDataFrame(
            [(f"e{i}", g, t) for i, (g, t) in enumerate(rows)],
            ["event_id", "event_type", "ts"],
        )
        got = {r.bucket: r for r in set_churn(ev).collect()}
        d0 = min(
            r.bucket - 1 for r in got.values()
        )  # day 1 is the first emitted bucket
        # day1 vs day0: common {b}=1, union 3 -> jaccard 1/3
        r1 = got[d0 + 1]
        assert (r1.n_cur, r1.n_prev, r1.n_common) == (2, 2, 1)
        assert r1.jaccard == round(1 / 3, 6)
        assert r1.churn == round(1 - 1 / 3, 6)
        # day 3 has no observed day 2: no row; day 2 empty: no row
        assert set(got) == {d0 + 1}

    def test_identical_and_disjoint_days(self, spark):
        base = datetime.datetime(2024, 1, 1)
        day = datetime.timedelta(days=1)
        same = [("a", base), ("a", base + day)]
        ev = spark.createDataFrame(
            [(f"s{i}", g, t) for i, (g, t) in enumerate(same)],
            ["event_id", "event_type", "ts"],
        )
        (r,) = set_churn(ev).collect()
        assert (r.jaccard, r.churn) == (1.0, 0.0)
        disj = [("a", base), ("b", base + day)]
        ev2 = spark.createDataFrame(
            [(f"d{i}", g, t) for i, (g, t) in enumerate(disj)],
            ["event_id", "event_type", "ts"],
        )
        (r2,) = set_churn(ev2).collect()
        assert (r2.n_common, r2.jaccard, r2.churn) == (0, 0.0, 1.0)
        with pytest.raises(ValueError):
            set_churn(ev2, bucket_seconds=-1)


from threat_intelligence_knowledge_graph_spark.operators.dedup import source_overlap


class TestSourceOverlap:
    def test_mirror_shares_and_no_overlap_absent(self, spark):
        docs = spark.createDataFrame(
            [
                ("A", "d1"), ("A", "d2"), ("A", "d3"), ("A", "d4"),
                ("B", "d1"), ("B", "d2"),          # B: 100% inside A
                ("C", "zz"),                        # C: disjoint
                ("A", "d1"),                        # within-source dup collapses
            ],
            ["source", "text"],
        )
        got = {(r.src_a, r.src_b): r for r in source_overlap(docs).collect()}
        assert set(got) == {("A", "B")}  # C emits no row
        r = got[("A", "B")]
        assert r.n_common == 2
        assert r.share_a == 0.5      # 2 of A's 4 distinct docs
        assert r.share_b == 1.0      # all of B is a mirror

    def test_pair_order_pinned_by_source_name(self, spark):
        docs = spark.createDataFrame(
            [("zeta", "x"), ("alpha", "x")], ["source", "text"]
        )
        (r,) = source_overlap(docs).collect()
        assert (r.src_a, r.src_b) == ("alpha", "zeta")


from threat_intelligence_knowledge_graph_spark.operators.dedup import (
    dedup_keep_best,
)


class TestDedupKeepBest:
    def test_best_copy_survives_exact_and_near_stages(self, spark):
        # near-dup family: same 4-word cycle repeated 5x vs 7x
        # (the planted-corpus construction: jaccard exactly 1.0)
        cyc = "wa wb wc wd"
        docs = spark.createDataFrame(
            [
                (1, " ".join([cyc] * 5), 3),   # near-dup of 2, worse score
                (2, " ".join([cyc] * 7), 9),   # best of the cluster
                (10, "same exact text here", 1),
                (11, "same exact text here", 8),  # exact dup, better score
                (20, "completely unrelated singleton doc", 0),
            ],
            ["doc_id", "text", "score"],
        )
        got = {r.doc_id for r in dedup_keep_best(docs, "score").collect()}
        assert got == {2, 11, 20}

    def test_score_tie_falls_back_to_min_id(self, spark):
        docs = spark.createDataFrame(
            [(5, "dup dup", 4), (3, "dup dup", 4)], ["doc_id", "text", "score"]
        )
        got = [r.doc_id for r in dedup_keep_best(docs, "score").collect()]
        assert got == [3]


from threat_intelligence_knowledge_graph_spark.operators.dedup import (
    select_sources_greedy,
)


class TestSelectSourcesGreedy:
    def test_greedy_order_and_zero_gain_early_stop(self, spark):
        docs = spark.createDataFrame(
            [("A", t) for t in ("x1", "x2", "x3")]
            + [("B", t) for t in ("x1", "x2", "x3", "x4")]
            + [("C", "y1")]
            + [("D", "x1")],
            ["source", "text"],
        )
        got = select_sources_greedy(docs, k=4).collect()
        # B covers everything A/D have plus x4; C adds y1; then every
        # remaining source gains 0 -> early stop despite k=4
        assert [(r.rank, r.source, r.n_new, r.n_covered) for r in got] == [
            (1, "B", 4, 4),
            (2, "C", 1, 5),
        ]

    def test_tie_breaks_by_source_name_and_validation(self, spark):
        docs = spark.createDataFrame(
            [("zeta", "a"), ("alpha", "b")], ["source", "text"]
        )
        got = select_sources_greedy(docs, k=2).collect()
        assert [r.source for r in got] == ["alpha", "zeta"]
        with pytest.raises(ValueError):
            select_sources_greedy(docs, k=0)


class TestPagerankDelta:
    def test_new_node_rises_from_zero(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.pagerank import (
            pagerank_delta,
        )

        # Before: 2-cycle a<->b. After: same cycle + both point at c.
        before = spark.createDataFrame(
            [("a", "b"), ("b", "a")], ["src_id", "dst_id"]
        )
        after = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("a", "c"), ("b", "c")],
            ["src_id", "dst_id"],
        )
        got = {
            r.id: r for r in pagerank_delta(before, after, iterations=4).collect()
        }
        assert set(got) == {"a", "b", "c"}
        # c exists only in the after window: rank_before pinned 0.0.
        assert got["c"].rank_before == 0.0
        assert got["c"].rank_after > 0.0
        assert got["c"].delta == got["c"].rank_after
        # a and b lose rank mass (they now split their out-flow with c
        # and the after-universe is larger), so their delta is negative.
        assert got["a"].delta < 0.0 and got["b"].delta < 0.0
        # Symmetric roles → identical values.
        assert got["a"].delta == pytest.approx(got["b"].delta, abs=1e-12)
        # Per-window masses each sum to 1 → deltas sum to ~0.
        assert sum(r.delta for r in got.values()) == pytest.approx(0.0, abs=1e-9)

    def test_equal_windows_zero_delta(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.pagerank import (
            pagerank_delta,
        )

        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], ["src_id", "dst_id"]
        )
        for r in pagerank_delta(e, e, iterations=3).collect():
            assert r.delta == 0.0  # identical recurrence → exact zero

    def test_weighted_shift(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.pagerank import (
            pagerank,
            pagerank_delta,
        )

        before = spark.createDataFrame(
            [("a", "b", 1.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
            ["src_id", "dst_id", "wt"],
        )
        # After: a's out-flow shifts 3:1 toward c.
        after = spark.createDataFrame(
            [("a", "b", 1.0), ("a", "c", 3.0), ("b", "a", 1.0), ("c", "a", 1.0)],
            ["src_id", "dst_id", "wt"],
        )
        got = {
            r.id: r
            for r in pagerank_delta(
                before, after, iterations=5, weight="wt"
            ).collect()
        }
        assert got["c"].delta > 0.0 > got["b"].delta
        # Window columns ARE the standalone operator's outputs.
        solo = {r.id: r.rank for r in pagerank(before, iterations=5, weight="wt").collect()}
        for nid, row in got.items():
            assert row.rank_before == pytest.approx(solo[nid], abs=0.0)


class TestRisingInfrastructure:
    def test_planted_consolidation(self, spark):
        import datetime as _dt

        from threat_intelligence_knowledge_graph_spark.plans.graph_queries import (
            rising_infrastructure,
        )

        t0 = _dt.datetime(2026, 1, 1)
        rows = []
        # Before the split: 4 users each sight their own indicator once;
        # user 1 also sights 'evil.net'.
        for u in range(1, 5):
            rows.append((t0, u, f"ind{u}"))
        rows.append((t0, 1, "evil.net"))
        # After the split: ALL 4 users converge on 'evil.net' (its
        # sighting graph position consolidates), own indicators go
        # quiet except user 2's.
        t1 = _dt.datetime(2026, 1, 2)
        for u in range(1, 5):
            rows.append((t1, u, "evil.net"))
        rows.append((t1, 2, "ind2"))
        events = spark.createDataFrame(rows, ["ts", "user_id", "event_type"])
        top = rising_infrastructure(
            spark, events, "2026-01-01 12:00:00", k=3, iterations=4
        ).collect()
        assert top[0].id == "evil.net"
        assert top[0].delta > 0.0


class TestDormancyReactivation:
    def _run(self, spark, rows, quiet):
        import datetime as _dt

        from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
            dormancy_reactivation,
        )

        t0 = _dt.datetime(2026, 3, 1)
        data = [
            (t0 + _dt.timedelta(seconds=s), k) for k, secs in rows for s in secs
        ]
        ev = spark.createDataFrame(data, ["ts", "event_type"])
        return {
            r.key: r for r in dormancy_reactivation(ev, quiet).collect()
        }

    def test_planted_timelines(self, spark):
        got = self._run(
            spark,
            [
                # dormant then back: gaps 10, 1000, 10 → one quiet gap,
                # but NOT the last one → reactivated False.
                ("cold_mid", [0, 10, 1010, 1020]),
                # resurrected: gaps 10, 2000 → last gap quiet → True.
                ("resurrected", [0, 10, 2010]),
                # steady: gaps all 10.
                ("steady", [0, 10, 20, 30]),
                # singleton: no gaps at all.
                ("once", [0]),
            ],
            quiet=100.0,
        )
        cm = got["cold_mid"]
        assert (cm.n_sightings, cm.n_reactivations) == (4, 1)
        assert cm.max_quiet_s == 1000.0 and cm.last_quiet_s == 10.0
        assert not cm.reactivated
        rs = got["resurrected"]
        assert (rs.n_reactivations, rs.last_quiet_s, rs.reactivated) == (
            1, 2000.0, True,
        )
        st = got["steady"]
        assert (st.n_reactivations, st.reactivated) == (0, False)
        on = got["once"]
        assert (on.n_sightings, on.n_reactivations) == (1, 0)
        assert on.max_quiet_s is None and on.last_quiet_s is None
        assert on.reactivated is False  # NULL-gap coalesced, not dropped

    def test_duplicate_instant_not_a_gap(self, spark):
        # Three sightings at the SAME instant then one later: the burst
        # is one distinct observation, so n_sightings=2 and the only
        # gap is the real one.
        got = self._run(
            spark, [("burst", [0, 0, 0, 500])], quiet=100.0
        )["burst"]
        assert got.n_sightings == 2
        assert (got.n_reactivations, got.last_quiet_s, got.reactivated) == (
            1, 500.0, True,
        )

    def test_validation(self, spark):
        import pytest as _pytest

        from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
            dormancy_reactivation,
        )

        ev = spark.createDataFrame([], "ts timestamp, event_type string")
        with _pytest.raises(ValueError):
            dormancy_reactivation(ev, 0.0)


class TestResurrectedIndicators:
    def test_ordering_and_filter(self, spark):
        import datetime as _dt

        from threat_intelligence_knowledge_graph_spark.plans.graph_queries import (
            resurrected_indicators,
        )

        t0 = _dt.datetime(2026, 3, 1)
        rows = []
        for k, secs in [
            ("deep_sleeper", [0, 5000]),
            ("light_sleeper", [0, 300]),
            ("steady", [0, 10, 20]),
        ]:
            rows += [(t0 + _dt.timedelta(seconds=s), 1, k) for s in secs]
        ev = spark.createDataFrame(rows, ["ts", "user_id", "event_type"])
        top = resurrected_indicators(spark, ev, min_quiet_s=100.0, k=5).collect()
        assert [r.key for r in top] == ["deep_sleeper", "light_sleeper"]
        assert top[0].last_quiet_s == 5000.0


class TestNdcgEval:
    def test_hand_computed(self, spark):
        import math

        from threat_intelligence_knowledge_graph_spark.operators.retrieval import (
            ndcg_eval,
        )

        # ranking: docs 10, 20, 30 at positions 1, 2, 3
        ranking = spark.createDataFrame(
            [(10, 1), (20, 2), (30, 3)], ["doc_id", "rk"]
        )
        # grades: 10→1, 20→3, 30→0 (absent = 0), 40→2 (relevant, unranked)
        rel = spark.createDataFrame(
            [(10, 1), (20, 3), (40, 2)], ["doc_id", "rel"]
        )
        row = ndcg_eval(ranking, rel, k=3).collect()[0]
        dcg = (2**1 - 1) / math.log2(2) + (2**3 - 1) / math.log2(3) + 0.0
        # ideal order by (rel desc, id asc): 20(3), 40(2), 10(1)
        idcg = (
            (2**3 - 1) / math.log2(2)
            + (2**2 - 1) / math.log2(3)
            + (2**1 - 1) / math.log2(4)
        )
        assert row.k == 3
        assert abs(row.dcg - dcg) < 1e-6
        assert abs(row.idcg - idcg) < 1e-6
        assert row.ndcg == round(dcg / idcg, 6)

    def test_perfect_and_empty(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.retrieval import (
            ndcg_eval,
        )

        rel = spark.createDataFrame([(1, 2), (2, 1)], ["doc_id", "rel"])
        perfect = spark.createDataFrame([(1, 1), (2, 2)], ["doc_id", "rk"])
        assert ndcg_eval(perfect, rel, k=2).collect()[0].ndcg == 1.0
        # no relevant docs at all → idcg 0 → ndcg NULL, not 0/0
        none_rel = spark.createDataFrame([(9, 0)], ["doc_id", "rel"])
        row = ndcg_eval(perfect, none_rel, k=2).collect()[0]
        assert row.idcg == 0.0 and row.ndcg is None
