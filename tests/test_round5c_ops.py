"""Round-5 continuation operators, batch C: MRR/MAP rank evaluation,
Flesch readability, A-ES weighted sampling, hour-of-day seasonality,
global transitivity."""

from __future__ import annotations

import math

import pytest

from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
    transitivity,
)
from threat_intelligence_knowledge_graph_spark.operators.packing import (
    weighted_sample,
)
from threat_intelligence_knowledge_graph_spark.operators.retrieval import (
    rank_eval,
)
from threat_intelligence_knowledge_graph_spark.operators.stats import (
    hourly_seasonality,
)
from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
    readability,
)


class TestRankEval:
    def _frames(self, spark):
        rankings = spark.createDataFrame(
            [
                ("qa", "d1", 1), ("qa", "d2", 2), ("qa", "d3", 3),
                ("qb", "d1", 1), ("qb", "d2", 2),
                ("qc", "x", 1),
                ("qd", "d1", 1), ("qd", "d2", 2),
            ],
            "query_id: string, doc_id: string, rk: int",
        )
        qrels = spark.createDataFrame(
            [("qa", "d2"), ("qa", "d9"), ("qc", "x"), ("qd", "d9")],
            "query_id: string, doc_id: string",
        )
        return rankings, qrels

    def test_hand_computed(self, spark):
        rankings, qrels = self._frames(spark)
        got = {r.query_id: r.asDict() for r in rank_eval(rankings, qrels, k=10).collect()}
        # qa: first hit at 2, rr = 0.5; AP = (1/2) / min(2, 10) = 0.25
        assert got["qa"]["first_rel_rank"] == 2
        assert got["qa"]["rr"] == 0.5
        assert got["qa"]["ap"] == 0.25
        assert got["qa"]["n_rel"] == 2
        # qb: no qrels at all -> undefined, NULL
        assert got["qb"]["rr"] is None and got["qb"]["ap"] is None
        assert got["qb"]["n_rel"] == 0
        # qc: perfect single hit -> rr = ap = 1
        assert got["qc"]["rr"] == 1.0 and got["qc"]["ap"] == 1.0
        # qd: has a relevant doc but the ranking missed it -> zeros
        assert got["qd"]["first_rel_rank"] is None
        assert got["qd"]["rr"] == 0.0 and got["qd"]["ap"] == 0.0

    def test_two_hits_ap(self, spark):
        rankings = spark.createDataFrame(
            [("q", "a", 1), ("q", "b", 2), ("q", "c", 3), ("q", "d", 4)],
            "query_id: string, doc_id: string, rk: int",
        )
        qrels = spark.createDataFrame(
            [("q", "a"), ("q", "c")], "query_id: string, doc_id: string"
        )
        row = rank_eval(rankings, qrels, k=10).collect()[0]
        # hits at 1 (1/1) and 3 (2/3): AP = (1 + 2/3)/2 = 5/6
        assert row.ap == round(5 / 6, 6)
        assert row.rr == 1.0

    def test_k_cutoff(self, spark):
        rankings = spark.createDataFrame(
            [("q", "a", 1), ("q", "b", 2), ("q", "c", 3)],
            "query_id: string, doc_id: string, rk: int",
        )
        qrels = spark.createDataFrame([("q", "c")], "query_id: string, doc_id: string")
        row = rank_eval(rankings, qrels, k=2).collect()[0]
        assert row.rr == 0.0 and row.ap == 0.0 and row.n_ranked == 2

    def test_validation(self, spark):
        rankings, qrels = self._frames(spark)
        with pytest.raises(ValueError):
            rank_eval(rankings, qrels, k=0)
        with pytest.raises(ValueError):
            rank_eval(rankings, qrels, k=21)


class TestReadability:
    def test_hand_computed(self, spark):
        docs = spark.createDataFrame(
            [(1, "The cat sat."), (2, ""), (3, "no punctuation here")],
            "doc_id: long, text: string",
        )
        got = {r.doc_id: r.asDict() for r in readability(docs).collect()}
        # 3 words, 3 vowel runs, 1 sentence:
        # 206.835 - 1.015*3 - 84.6*1 = 119.19
        assert got[1]["n_words"] == 3
        assert got[1]["n_syllables"] == 3
        assert got[1]["n_sentences"] == 1
        assert got[1]["flesch"] == round(206.835 - 1.015 * 3 - 84.6, 6)
        # empty doc: no words, NULL score (sentence floor still 1)
        assert got[2]["n_words"] == 0 and got[2]["flesch"] is None
        # punctuation-free doc gets the sentence floor, not 0
        assert got[3]["n_sentences"] == 1 and got[3]["flesch"] is not None

    def test_vowel_runs_not_letters(self, spark):
        docs = spark.createDataFrame(
            [(1, "queueing strength!")], "doc_id: long, text: string"
        )
        row = readability(docs).collect()[0]
        # "queueing" -> ueuei as runs: 'ueuei' is one maximal run? No:
        # q-u-e-u-e-i-n-g => "ueue i"? all of u,e,u,e,i are contiguous
        # vowels -> ONE run; "strength" -> 'e' -> one run. Total 2.
        assert row.n_syllables == 2
        assert row.n_words == 2
        assert row.n_sentences == 1


class TestWeightedSample:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(i, float(1 + (i % 5))) for i in range(100)],
            "doc_id: long, w: double",
        )

    def test_k_rows_and_determinism(self, spark):
        docs = self._docs(spark)
        a = weighted_sample(docs, "doc_id", "w", k=10).collect()
        b = weighted_sample(docs, "doc_id", "w", k=10).collect()
        assert len(a) == 10
        assert [r.doc_id for r in a] == [r.doc_id for r in b]
        assert [r.rk for r in a] == list(range(1, 11))

    def test_nonpositive_and_null_weights_excluded(self, spark):
        docs = spark.createDataFrame(
            [(1, 1.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
            "doc_id: long, w: double",
        )
        got = {r.doc_id for r in weighted_sample(docs, "doc_id", "w", k=10).collect()}
        assert got == {1, 5}

    def test_heavy_weight_always_sampled(self, spark):
        docs = spark.createDataFrame(
            [(i, 1.0) for i in range(50)] + [(999, 1e9)],
            "doc_id: long, w: double",
        )
        got = {r.doc_id for r in weighted_sample(docs, "doc_id", "w", k=5).collect()}
        # Exp(1e9) priority is ~1e-9 of any unit-weight row's: always in.
        assert 999 in got

    def test_salt_redraws(self, spark):
        docs = self._docs(spark)
        a = [r.doc_id for r in weighted_sample(docs, "doc_id", "w", k=10, salt="s1").collect()]
        b = [r.doc_id for r in weighted_sample(docs, "doc_id", "w", k=10, salt="s2").collect()]
        assert a != b

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            weighted_sample(self._docs(spark), "doc_id", "w", k=0)


class TestHourlySeasonality:
    def test_hand_computed(self, spark):
        import datetime as dt

        def t(h, m=0):
            return dt.datetime(2026, 3, 1, h, m)

        rows = [("spike", t(3, i)) for i in range(4)]
        rows += [("flat", t(h)) for h in range(24)]
        ev = spark.createDataFrame(rows, "event_type: string, ts: timestamp")
        got = {r.event_type: r.asDict() for r in hourly_seasonality(ev).collect()}
        # spike: all 4 in hour 3 -> chi2 = (24*16 - 16)/4 = 92
        assert got["spike"]["n"] == 4
        assert got["spike"]["n_hours_active"] == 1
        assert got["spike"]["peak_hour"] == 3
        assert got["spike"]["peak_share"] == 1.0
        assert got["spike"]["chi2"] == 92.0
        # flat: perfectly uniform -> chi2 = 0
        assert got["flat"]["chi2"] == 0.0
        assert got["flat"]["n_hours_active"] == 24
        assert got["flat"]["peak_share"] == round(1 / 24, 6)

    def test_peak_tie_smallest_hour(self, spark):
        import datetime as dt

        ev = spark.createDataFrame(
            [
                ("x", dt.datetime(2026, 3, 1, 7, 0)),
                ("x", dt.datetime(2026, 3, 1, 7, 1)),
                ("x", dt.datetime(2026, 3, 2, 5, 0)),
                ("x", dt.datetime(2026, 3, 2, 5, 1)),
            ],
            "event_type: string, ts: timestamp",
        )
        row = hourly_seasonality(ev).collect()[0]
        assert row.peak_hour == 5
        # chi2 = (24*(4+4) - 16)/4 = 44
        assert row.chi2 == 44.0


class TestTransitivity:
    def test_triangle(self, spark):
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a")], "src: string, dst: string"
        )
        row = transitivity(e).collect()[0]
        assert row.n_triangles == 1
        assert row.n_closed_wedges == 3
        assert row.n_wedges == 3
        assert row.transitivity == 1.0

    def test_path_and_star(self, spark):
        path = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src: string, dst: string"
        )
        row = transitivity(path).collect()[0]
        assert (row.n_triangles, row.n_wedges, row.transitivity) == (0, 1, 0.0)
        star = spark.createDataFrame(
            [("h", "x"), ("h", "y"), ("h", "z")], "src: string, dst: string"
        )
        row = transitivity(star).collect()[0]
        assert (row.n_wedges, row.transitivity) == (3, 0.0)

    def test_single_edge_null(self, spark):
        e = spark.createDataFrame([("a", "b")], "src: string, dst: string")
        row = transitivity(e).collect()[0]
        assert row.n_wedges == 0 and row.transitivity is None

    def test_triangle_plus_pendant(self, spark):
        # triangle abc + pendant d on a: wedges = C(3,2)+C(1,2)*2+C(1,2)
        # deg a=3, b=2, c=2, d=1 -> 3+1+1+0 = 5; closed = 3 -> 0.6
        e = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")],
            "src: string, dst: string",
        )
        row = transitivity(e).collect()[0]
        assert row.n_wedges == 5
        assert row.transitivity == 0.6


from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
    avg_neighbor_degree,
    rich_club,
)
from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
    k_anonymity_audit,
)
from threat_intelligence_knowledge_graph_spark.operators.stats import (
    trimmed_mean,
)


def _tri_pendant(spark):
    # triangle abc + pendant d on c: degrees a2 b2 c3 d1
    return spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
        "src: string, dst: string",
    )


class TestRichClub:
    def test_hand_computed(self, spark):
        got = {r.k: r.asDict() for r in rich_club(_tri_pendant(spark)).collect()}
        # k=1: club {a,b,c}, edges ab/bc/ca all min-deg 2 -> phi 3/3
        assert got[1]["n_club"] == 3
        assert got[1]["e_club"] == 3
        assert got[1]["phi"] == 1.0
        # k=2 (club {c}, size 1) and k=3 (empty) have no defined phi
        assert set(got) == {1}

    def test_clique_is_flat_one(self, spark):
        # K4: degrees all 3 -> only threshold below 3 exists via spectrum {3}
        e = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")],
            "src: string, dst: string",
        )
        assert rich_club(e).collect() == []  # single degree value: club above it is empty

    def test_hub_spoke_low(self, spark):
        # star + one rim edge: hub h deg 4; rim x,y,z,w; edge x-y
        e = spark.createDataFrame(
            [("h", "x"), ("h", "y"), ("h", "z"), ("h", "w"), ("x", "y")],
            "src: string, dst: string",
        )
        got = {r.k: r.asDict() for r in rich_club(e).collect()}
        # spectrum {1, 2, 4}; k=1: club {h,x,y} (deg>1), edges with
        # min>1: hx, hy, xy -> phi 3/3 = 1.0
        assert got[1]["n_club"] == 3 and got[1]["phi"] == 1.0
        # k=2: club {h} -> omitted; k=4 empty -> omitted
        assert set(got) == {1}


class TestAvgNeighborDegree:
    def test_hand_computed(self, spark):
        got = {r.id: r.asDict() for r in avg_neighbor_degree(_tri_pendant(spark)).collect()}
        assert got["a"]["deg"] == 2 and got["a"]["avg_nbr_deg"] == 2.5
        assert got["b"]["avg_nbr_deg"] == 2.5
        assert got["c"]["deg"] == 3 and got["c"]["avg_nbr_deg"] == round(5 / 3, 6)
        assert got["d"]["deg"] == 1 and got["d"]["avg_nbr_deg"] == 3.0

    def test_self_loops_and_duplicates_ignored(self, spark):
        e = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("a", "a")], "src: string, dst: string"
        )
        got = {r.id: r.asDict() for r in avg_neighbor_degree(e).collect()}
        assert got == {
            "a": {"id": "a", "deg": 1, "avg_nbr_deg": 1.0},
            "b": {"id": "b", "deg": 1, "avg_nbr_deg": 1.0},
        }


class TestKAnonymityAudit:
    def test_risky_classes(self, spark):
        rows = [("u1", "t1")] * 5 + [("u2", "t1")] * 2 + [("u3", "t2")]
        df = spark.createDataFrame(rows, "user_id: string, event_type: string")
        got = {
            (r.user_id, r.event_type): r.n
            for r in k_anonymity_audit(df, ["user_id", "event_type"], k=5).collect()
        }
        assert got == {("u2", "t1"): 2, ("u3", "t2"): 1}

    def test_anonymous_table_empty(self, spark):
        rows = [("u1", "t1")] * 5 + [("u2", "t1")] * 5
        df = spark.createDataFrame(rows, "user_id: string, event_type: string")
        assert k_anonymity_audit(df, ["user_id", "event_type"], k=5).collect() == []

    def test_null_is_a_quasi_value(self, spark):
        df = spark.createDataFrame(
            [("u1", None), ("u1", None), ("u2", "t")],
            "user_id: string, event_type: string",
        )
        got = k_anonymity_audit(df, ["user_id", "event_type"], k=3).collect()
        assert {(r.user_id, r.event_type, r.n) for r in got} == {
            ("u1", None, 2),
            ("u2", "t", 1),
        }

    def test_validation(self, spark):
        df = spark.createDataFrame([("a",)], "x: string")
        with pytest.raises(ValueError):
            k_anonymity_audit(df, [], k=5)
        with pytest.raises(ValueError):
            k_anonymity_audit(df, ["x"], k=1)


class TestTrimmedMean:
    def test_hand_computed(self, spark):
        rows = [("g", float(v), i) for i, v in enumerate([1, 2, 3, 4, 1000])]
        df = spark.createDataFrame(rows, "g: string, v: double, id: long")
        row = trimmed_mean(df, "v", "g", "id", trim=0.2).collect()[0]
        # t = floor(0.2*5) = 1: drop 1 and 1000 -> mean(2,3,4) = 3
        assert (row.n, row.n_trimmed_each_side, row.trimmed_mean) == (5, 1, 3.0)

    def test_trim_zero_is_plain_mean(self, spark):
        rows = [("g", float(v), v) for v in range(1, 11)]
        df = spark.createDataFrame(rows, "g: string, v: double, id: long")
        row = trimmed_mean(df, "v", "g", "id", trim=0.0).collect()[0]
        assert (row.n, row.n_trimmed_each_side, row.trimmed_mean) == (10, 0, 5.5)

    def test_nulls_excluded_and_groups_independent(self, spark):
        df = spark.createDataFrame(
            [("a", 10.0, 1), ("a", None, 2), ("a", 20.0, 3), ("b", 7.0, 1)],
            "g: string, v: double, id: long",
        )
        got = {r.g: r.asDict() for r in trimmed_mean(df, "v", "g", "id", trim=0.1).collect()}
        assert got["a"]["n"] == 2 and got["a"]["trimmed_mean"] == 15.0
        assert got["b"]["trimmed_mean"] == 7.0

    def test_validation(self, spark):
        df = spark.createDataFrame([("g", 1.0, 1)], "g: string, v: double, id: long")
        with pytest.raises(ValueError):
            trimmed_mean(df, "v", "g", "id", trim=0.5)
        with pytest.raises(ValueError):
            trimmed_mean(df, "v", "g", "id", trim=-0.1)


from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
    rate_peaks,
)
from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
    l_diversity_audit,
)
from threat_intelligence_knowledge_graph_spark.operators.sketches import (
    hll_overlap,
)


class TestLDiversityAudit:
    def test_homogeneous_class_flagged(self, spark):
        df = spark.createDataFrame(
            [("q1", "a"), ("q1", "a"), ("q1", "a"),
             ("q2", "a"), ("q2", "b"), ("q2", "c"),
             ("q3", "a"), ("q3", "b")],
            "quasi: string, sens: string",
        )
        got2 = {(r.quasi, r.n, r.n_sensitive)
                for r in l_diversity_audit(df, ["quasi"], "sens", l=2).collect()}
        assert got2 == {("q1", 3, 1)}
        got3 = {(r.quasi, r.n_sensitive)
                for r in l_diversity_audit(df, ["quasi"], "sens", l=3).collect()}
        assert got3 == {("q1", 1), ("q3", 2)}

    def test_null_sensitive_is_one_value(self, spark):
        df = spark.createDataFrame(
            [("q", None), ("q", None)], "quasi: string, sens: string"
        )
        row = l_diversity_audit(df, ["quasi"], "sens", l=2).collect()[0]
        assert (row.n, row.n_sensitive) == (2, 1)

    def test_validation(self, spark):
        df = spark.createDataFrame([("q", "a")], "quasi: string, sens: string")
        with pytest.raises(ValueError):
            l_diversity_audit(df, [], "sens", l=2)
        with pytest.raises(ValueError):
            l_diversity_audit(df, ["quasi"], "sens", l=1)


class TestRatePeaks:
    def _ev(self, spark, epochs, user="u"):
        import datetime as dt

        rows = [(user, dt.datetime.fromtimestamp(e, dt.timezone.utc).replace(tzinfo=None))
                for e in epochs]
        return spark.createDataFrame(rows, "user_id: string, ts: timestamp")

    def test_hand_computed_window(self, spark):
        ev = self._ev(spark, [0, 10, 3599, 3600, 7200])
        row = rate_peaks(ev, window_s=3600, limit=2).collect()[0]
        # trailing-3600s counts: 1, 2, 3, 3, 1 -> peak 3, two over limit 2
        assert (row.n_events, row.peak_rate, row.n_over) == (5, 3, 2)

    def test_same_second_burst_counts_fully(self, spark):
        ev = self._ev(spark, [100, 100, 100])
        row = rate_peaks(ev, window_s=60).collect()[0]
        assert row.peak_rate == 3

    def test_burst_straddling_bucket_boundary(self, spark):
        # 2 events just before and 2 just after an hour boundary: any
        # aligned hourly bucket sees 2, the sliding window sees 4.
        ev = self._ev(spark, [3598, 3599, 3600, 3601])
        row = rate_peaks(ev, window_s=3600).collect()[0]
        assert row.peak_rate == 4

    def test_groups_independent_and_validation(self, spark):
        ev = self._ev(spark, [0, 1], "u1").unionAll(self._ev(spark, [0], "u2"))
        got = {r.user_id: r.peak_rate for r in rate_peaks(ev, window_s=10).collect()}
        assert got == {"u1": 2, "u2": 1}
        with pytest.raises(ValueError):
            rate_peaks(ev, window_s=0)
        with pytest.raises(ValueError):
            rate_peaks(ev, window_s=10, limit=0)


class TestHllOverlap:
    def test_identical_groups_full_overlap(self, spark):
        rows = [("A", f"k{i}") for i in range(200)] + [
            ("B", f"k{i}") for i in range(200)
        ]
        df = spark.createDataFrame(rows, "g: string, key: string")
        row = hll_overlap(df, "key", "g").collect()[0]
        # identical key sets: identical sketches, union == either side
        assert row.s_a == row.s_b == row.s_union
        assert row.est_overlap == row.est_a == row.est_b

    def test_subset_overlap_equals_smaller(self, spark):
        rows = [("A", f"k{i}") for i in range(300)] + [
            ("B", f"k{i}") for i in range(50)
        ]
        df = spark.createDataFrame(rows, "g: string, key: string")
        row = hll_overlap(df, "key", "g").collect()[0]
        # B ⊂ A: union sketch == A's sketch, overlap estimate == est_B
        assert row.s_union == row.s_a
        assert row.est_overlap == row.est_b

    def test_all_pairs_emitted(self, spark):
        rows = [(g, f"{g}{i}") for g in "ABC" for i in range(20)]
        df = spark.createDataFrame(rows, "g: string, key: string")
        got = {(r.a, r.b) for r in hll_overlap(df, "key", "g").collect()}
        assert got == {("A", "B"), ("A", "C"), ("B", "C")}


from threat_intelligence_knowledge_graph_spark.operators.stats import (
    percentile_normalize,
    survival_curve,
)


class TestSurvivalCurve:
    def _ev(self, spark, rows):
        import datetime as dt

        base = dt.datetime(2026, 5, 1)
        return spark.createDataFrame(
            [(u, t, base + dt.timedelta(days=d)) for u, t, d in rows],
            "user_id: string, event_type: string, ts: timestamp",
        )

    def test_hand_computed_km(self, spark):
        ev = self._ev(spark, [
            ("u1", "signup", 0), ("u1", "purchase", 2),
            ("u2", "signup", 0), ("u2", "purchase", 5),
            ("u3", "signup", 0),
            ("u4", "purchase", -1), ("u4", "signup", 1),  # pre-start conversion ignored
        ])
        got = {r.t_day: r.asDict() for r in survival_curve(ev, "signup", "purchase").collect()}
        # day 2: risk 4, event u1 -> S = 3/4
        assert got[2]["n_at_risk"] == 4 and got[2]["n_events"] == 1
        assert got[2]["survival"] == 0.75
        # day 4: u4 censored (horizon - its t0), no event -> S unchanged
        assert got[4]["n_censored"] == 1 and got[4]["n_events"] == 0
        assert got[4]["survival"] == 0.75
        # day 5: risk 2 (u2 event + u3 censored at horizon) -> S = 0.375
        assert got[5]["n_at_risk"] == 2
        assert got[5]["survival"] == 0.375
        assert set(got) == {2, 4, 5}

    def test_risk_set_fully_consumed_hits_zero(self, spark):
        ev = self._ev(spark, [
            ("a", "signup", 0), ("a", "purchase", 1),
            ("b", "signup", 0), ("b", "purchase", 1),
        ])
        got = survival_curve(ev, "signup", "purchase").collect()
        assert len(got) == 1
        assert got[0].survival == 0.0 and got[0].n_at_risk == 2

    def test_no_converters_flat_one(self, spark):
        ev = self._ev(spark, [
            ("a", "signup", 0), ("b", "signup", 0), ("b", "click", 3),
        ])
        got = survival_curve(ev, "signup", "purchase").collect()
        assert all(r.survival == 1.0 for r in got)
        assert sum(r.n_censored for r in got) == 2


class TestPercentileNormalize:
    def test_rank_transform(self, spark):
        df = spark.createDataFrame(
            [("g", 10.0), ("g", 20.0), ("g", 30.0), ("h", 7.0)],
            "g: string, v: double",
        )
        got = sorted(
            (r.g, r.v, r.pct) for r in percentile_normalize(df, "v", "g").collect()
        )
        assert got == [("g", 10.0, 0.0), ("g", 20.0, 0.5), ("g", 30.0, 1.0),
                       ("h", 7.0, 0.0)]

    def test_ties_share_rank(self, spark):
        df = spark.createDataFrame(
            [("g", 1.0), ("g", 1.0), ("g", 2.0)], "g: string, v: double"
        )
        got = sorted(r.pct for r in percentile_normalize(df, "v", "g").collect())
        assert got == [0.0, 0.0, 1.0]


class TestAnalyzeEventsCliRound5c:
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

    def test_new_reports(self, spark, tmp_path, capsys):
        import datetime

        ae = self._mod()
        base = datetime.datetime(2024, 1, 1)
        rows = []
        for i in range(4):
            rows.append((f"s{i}", f"u{i}", "signup", base, 1.0))
            if i < 2:
                rows.append(
                    (f"p{i}", f"u{i}", "purchase",
                     base + datetime.timedelta(days=i + 1), 2.0)
                )
        src = str(tmp_path / "ev.parquet")
        spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts", "value"]
        ).write.parquet(src)

        rc = ae.main(
            ["--input", src, "--report", "survival",
             "--steps", "signup,purchase"],
            spark=spark,
        )
        out = capsys.readouterr().out
        assert rc == 0 and "survival" in out and "n_at_risk" in out

        for report in ("seasonality", "rate", "trimmed"):
            rc = ae.main(["--input", src, "--report", report], spark=spark)
            assert rc == 0

        # survival without exactly 2 steps -> clean one-line exit
        with pytest.raises(SystemExit):
            ae.main(
                ["--input", src, "--report", "survival"], spark=spark
            )


from threat_intelligence_knowledge_graph_spark.operators.evaluation import (
    calibration_table,
)
from threat_intelligence_knowledge_graph_spark.operators.graph_algos import (
    degree_histogram,
    hill_tail,
)
from threat_intelligence_knowledge_graph_spark.operators.similarity import (
    mutual_best,
)


class TestMutualBest:
    def test_mutual_pairs_only(self, spark):
        # a<->b mutual best; c's best is a but a's best is b -> no pair
        scores = spark.createDataFrame(
            [
                ("a", "b", 0.9), ("a", "c", 0.5),
                ("b", "a", 0.9), ("b", "c", 0.4),
                ("c", "a", 0.8), ("c", "b", 0.2),
            ],
            "query_id: string, vec_id: string, cosine: double",
        )
        got = [(r.query_id, r.vec_id, r.cosine) for r in mutual_best(scores).collect()]
        assert got == [("a", "b", 0.9)]

    def test_self_pairs_ignored_and_tiebreak(self, spark):
        scores = spark.createDataFrame(
            [
                ("a", "a", 1.0), ("a", "b", 0.7), ("a", "c", 0.7),
                ("b", "b", 1.0), ("b", "a", 0.7),
                ("c", "a", 0.9),
            ],
            "query_id: string, vec_id: string, cosine: double",
        )
        # a's best among ties (b, c) -> b by id tie-break; b's best is a
        got = [(r.query_id, r.vec_id) for r in mutual_best(scores).collect()]
        assert got == [("a", "b")]


class TestCalibrationTable:
    def test_hand_computed_bins(self, spark):
        rows = [(0.05, 0), (0.05, 0), (0.95, 1), (0.95, 0), (1.0, 1)]
        df = spark.createDataFrame(rows, "p: double, y: int")
        got = {r.bin: r.asDict() for r in calibration_table(df, "p", "y").collect()}
        assert set(got) == {0, 9}
        assert got[0]["n"] == 2 and got[0]["frac_pos"] == 0.0
        assert got[0]["mean_pred"] == 0.05
        # brier bin 0: (0.05-0)^2 = 0.0025
        assert got[0]["brier"] == 0.0025
        # top bin: p=1.0 folds in; n=3, frac_pos=2/3
        assert got[9]["n"] == 3
        assert got[9]["frac_pos"] == round(2 / 3, 6)
        # brier bin 9: ((0.95-1)^2 + (0.95-0)^2 + (1-1)^2)/3 = 0.300833...
        assert got[9]["brier"] == round((0.0025 + 0.9025 + 0.0) / 3, 6)

    def test_boundary_bucketing_exact(self, spark):
        # p = 0.3 must land in bin 3 (floor(0.3*10) on doubles says 2)
        df = spark.createDataFrame([(0.3, 1)], "p: double, y: int")
        assert calibration_table(df, "p", "y").collect()[0].bin == 3

    def test_nulls_excluded_and_validation(self, spark):
        df = spark.createDataFrame(
            [(0.5, 1), (None, 1), (0.5, None)], "p: double, y: int"
        )
        got = calibration_table(df, "p", "y").collect()
        assert len(got) == 1 and got[0].n == 1
        with pytest.raises(ValueError):
            calibration_table(df, "p", "y", n_bins=1)


class TestDegreeHistogramHill:
    def test_histogram(self, spark):
        got = {r.deg: r.n_nodes for r in degree_histogram(_tri_pendant(spark)).collect()}
        assert got == {1: 1, 2: 2, 3: 1}

    def test_hill_analytic(self, spark):
        import math

        row = hill_tail(_tri_pendant(spark), d_min=2).collect()[0]
        # tail degrees {2,2,3}: sum ln = ln(3/2); alpha = 1 + 3/ln(1.5)
        assert row.n_tail == 3
        assert row.alpha == round(1 + 3 / math.log(1.5), 6)

    def test_degenerate_tail_null(self, spark):
        # all tail degrees equal d_min -> sum ln = 0 -> alpha NULL
        e = spark.createDataFrame([("a", "b")], "src: string, dst: string")
        row = hill_tail(e, d_min=1).collect()[0]
        assert row.n_tail == 2 and row.alpha is None
        with pytest.raises(ValueError):
            hill_tail(e, d_min=0)
