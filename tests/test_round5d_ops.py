"""Round-5 continuation operators, batch D: exact ROC-AUC, PR
operating-point table, dyadic EWMA surge detection, Simpson
concentration."""

from __future__ import annotations

import datetime

import pytest

from threat_intelligence_knowledge_graph_spark.operators.anomaly import ewma_surge
from threat_intelligence_knowledge_graph_spark.operators.evaluation import (
    pr_curve,
    roc_auc,
)
from threat_intelligence_knowledge_graph_spark.operators.stats import simpson_index


def _scored(spark):
    return spark.createDataFrame(
        [(0.1, 0), (0.2, 0), (0.2, 1), (0.4, 1)],
        "p: double, y: int",
    )


class TestRocAuc:
    def test_hand_computed_with_ties(self, spark):
        # pairs: (0.2+,0.1-)=1, (0.2+,0.2-)=.5, (0.4+,0.1-)=1,
        # (0.4+,0.2-)=1 -> 3.5/4 = 0.875
        row = roc_auc(_scored(spark), "p", "y").collect()[0]
        assert (row.n_pos, row.n_neg) == (2, 2)
        assert row.auc == 0.875

    def test_perfect_and_random(self, spark):
        perfect = spark.createDataFrame(
            [(0.1, 0), (0.9, 1)], "p: double, y: int"
        )
        assert roc_auc(perfect, "p", "y").collect()[0].auc == 1.0
        tied = spark.createDataFrame(
            [(0.5, 0), (0.5, 1), (0.5, 0), (0.5, 1)], "p: double, y: int"
        )
        assert roc_auc(tied, "p", "y").collect()[0].auc == 0.5

    def test_single_class_null(self, spark):
        pos_only = spark.createDataFrame(
            [(0.3, 1), (0.7, 1)], "p: double, y: int"
        )
        row = roc_auc(pos_only, "p", "y").collect()[0]
        assert row.n_neg == 0 and row.auc is None

    def test_null_rows_excluded(self, spark):
        d = spark.createDataFrame(
            [(0.1, 0), (0.2, 0), (0.2, 1), (0.4, 1), (None, 1), (0.9, None)],
            "p: double, y: int",
        )
        row = roc_auc(d, "p", "y").collect()[0]
        assert (row.n_pos, row.n_neg, row.auc) == (2, 2, 0.875)


class TestPrCurve:
    def test_hand_computed_dense(self, spark):
        rows = {
            r.threshold: r.asDict()
            for r in pr_curve(_scored(spark), "p", "y", n_thresholds=10).collect()
        }
        # dense spine: EVERY threshold emits a row
        assert set(rows) == {round(i / 10, 1) for i in range(10)}
        assert rows[0.4]["tp"] == 1 and rows[0.4]["fp"] == 0
        assert rows[0.4]["fn"] == 1
        assert rows[0.4]["precision"] == 1.0 and rows[0.4]["recall"] == 0.5
        assert rows[0.4]["f1"] == 0.666667
        assert rows[0.2]["tp"] == 2 and rows[0.2]["fp"] == 1
        assert rows[0.2]["precision"] == 0.666667 and rows[0.2]["recall"] == 1.0
        assert rows[0.2]["f1"] == 0.8
        assert rows[0.1]["precision"] == 0.5 and rows[0.1]["f1"] == 0.666667
        # empty buckets carry the cumulations of the next populated one
        assert rows[0.3]["tp"] == 1 and rows[0.3]["fp"] == 0
        # above every score: nothing predicted positive -> precision
        # undefined (NULL), recall a true 0
        assert rows[0.9]["tp"] == 0 and rows[0.9]["fp"] == 0
        assert rows[0.9]["precision"] is None and rows[0.9]["recall"] == 0.0

    def test_top_bucket_folds_score_one(self, spark):
        d = spark.createDataFrame([(1.0, 1), (0.95, 0)], "p: double, y: int")
        rows = {r.threshold: r for r in pr_curve(d, "p", "y", n_thresholds=10).collect()}
        # both rows land in the 0.9 bucket; lower thresholds cumulate
        assert len(rows) == 10
        assert rows[0.9].tp == 1 and rows[0.9].fp == 1
        assert rows[0.0].tp == 1 and rows[0.0].fp == 1

    def test_non_divisor_thresholds_exact_boundary(self, spark):
        # n=3 does not divide 1e6: 0.666666 must NOT clear t=2/3,
        # 0.666667 must (the (m*n) div 1e6 identity)
        d = spark.createDataFrame(
            [(0.666666, 1), (0.666667, 1)], "p: double, y: int"
        )
        rows = {r.threshold: r for r in pr_curve(d, "p", "y", n_thresholds=3).collect()}
        assert rows[0.666667].tp == 1  # only the clearing row
        assert rows[0.333333].tp == 2

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            pr_curve(_scored(spark), "p", "y", n_thresholds=1)


def _ts(hour: int, sec: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(
        hours=hour, seconds=sec
    )


class TestEwmaSurge:
    def _events(self, spark):
        rows = (
            [("a", _ts(0, i)) for i in range(2)]
            + [("a", _ts(1, i)) for i in range(4)]
            + [("a", _ts(3, i)) for i in range(8)]
        )
        return spark.createDataFrame(rows, "event_type: string, ts: timestamp")

    def test_dyadic_exact_recurrence(self, spark):
        got = {
            r.bucket: r.asDict()
            for r in ewma_surge(self._events(spark), n_lags=8).collect()
        }
        base = min(got)
        # bucket 0: ewma = 2/2 = 1.0; bucket 1: 4/2 + 2/4 = 2.5;
        # bucket 3 (row-based lag skips the empty hour): 8/2+4/4+2/8 = 5.25
        assert got[base]["cnt"] == 2 and got[base]["ewma"] == 1.0
        assert got[base]["surge_ratio"] == 2.0
        assert got[base + 1]["ewma"] == 2.5
        assert got[base + 1]["surge_ratio"] == 1.6
        assert got[base + 3]["ewma"] == 5.25
        assert got[base + 3]["surge_ratio"] == 1.52381

    def test_single_lag_degenerates_to_constant_ratio(self, spark):
        rows = ewma_surge(self._events(spark), n_lags=1).collect()
        assert all(r.surge_ratio == 2.0 for r in rows)
        assert all(r.ewma == r.cnt / 2 for r in rows)

    def test_groups_independent(self, spark):
        d = spark.createDataFrame(
            [("a", _ts(0)), ("b", _ts(0)), ("b", _ts(1))],
            "event_type: string, ts: timestamp",
        )
        got = {
            (r.event_type, r.bucket): r.ewma for r in ewma_surge(d).collect()
        }
        base = min(b for (_, b) in got)
        # b's second bucket sees only b's history (1/2 + 1/4), never a's
        assert got[("b", base + 1)] == 0.75

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            ewma_surge(self._events(spark), n_lags=0)


class TestSimpsonIndex:
    def test_hand_computed(self, spark):
        d = spark.createDataFrame(
            [(1, "x"), (1, "x"), (1, "x"), (1, "y"), (2, "z")],
            "user_id: long, event_type: string",
        )
        got = {r.user_id: r.asDict() for r in simpson_index(d).collect()}
        # user 1: counts {x:3, y:1} -> lambda = (9+1)/16 = 0.625
        assert got[1]["n_events"] == 4 and got[1]["n_states"] == 2
        assert got[1]["simpson"] == 0.625
        assert got[1]["inv_simpson"] == 1.6
        # single-type group concentrates to exactly 1
        assert got[2]["simpson"] == 1.0 and got[2]["inv_simpson"] == 1.0

    def test_uniform_inverse_equals_state_count(self, spark):
        d = spark.createDataFrame(
            [(1, t) for t in ["a", "b", "c", "d"]],
            "user_id: long, event_type: string",
        )
        row = simpson_index(d).collect()[0]
        assert row.simpson == 0.25 and row.inv_simpson == 4.0


class TestNearestJoin:
    def _run(self, spark, lefts, rights, tol=10):
        from threat_intelligence_knowledge_graph_spark.operators.temporal_join import (
            nearest_join,
        )

        left = spark.createDataFrame(
            [(i, u, _ts(0, s)) for i, (u, s) in enumerate(lefts)],
            "rid: long, user_id: long, ts: timestamp",
        )
        right = spark.createDataFrame(
            [(u, _ts(0, s)) for (u, s) in rights],
            "user_id: long, ts: timestamp",
        )
        out = nearest_join(
            left, right, key="user_id", left_time="ts", right_time="ts",
            tolerance_seconds=tol,
        )
        return {r.rid: (r.nearest_epoch, r.gap_s) for r in out.collect()}

    def test_forward_wins_when_closer(self, spark):
        got = self._run(spark, [(1, 100)], [(1, 90), (1, 105)])
        e, g = got[0]
        assert g == 5 and e is not None

    def test_tie_prefers_earlier(self, spark):
        got = self._run(spark, [(1, 100)], [(1, 95), (1, 105)])
        assert got[0][1] == -5

    def test_simultaneous_is_gap_zero(self, spark):
        got = self._run(spark, [(1, 100)], [(1, 100), (1, 101)])
        assert got[0][1] == 0

    def test_tolerance_and_left_outer(self, spark):
        got = self._run(spark, [(1, 100), (2, 100)], [(1, 130)], tol=10)
        assert got[0] == (None, None)  # out of tolerance
        assert got[1] == (None, None)  # no rights for user 2 at all
        got = self._run(spark, [(1, 100)], [(1, 130)], tol=30)
        assert got[0][1] == 30  # inclusive boundary

    def test_groups_independent(self, spark):
        got = self._run(spark, [(1, 100)], [(2, 100)])
        assert got[0] == (None, None)

    def test_validation(self, spark):
        import pytest as _pt

        with _pt.raises(ValueError):
            self._run(spark, [(1, 100)], [(1, 100)], tol=0)


class TestSoftDedupWeights:
    def test_family_mass_is_one(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.dedup import (
            soft_dedup_weights,
        )

        d = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, None), (6, None)],
            "doc_id: long, text: string",
        )
        got = {r.doc_id: (r.family_size, r.weight) for r in
               soft_dedup_weights(d).collect()}
        assert got[1] == (3, 0.333333) and got[2] == (3, 0.333333)
        assert got[4] == (1, 1.0)
        # NULL text is one family (coalesced to '')
        assert got[5] == (2, 0.5) and got[6] == (2, 0.5)


class TestTextrankKeywords:
    def _docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "alpha beta alpha"),   # alpha-beta edge, weight 2
                (2, "beta gamma"),         # beta-gamma edge, weight 1
                (3, "solo solo"),          # self-pair only -> no edge
                (4, ""),                   # empty doc
                (5, None),                 # NULL doc
            ],
            "doc_id: long, text: string",
        )

    def test_hand_replayed_recurrence(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
            textrank_keywords,
        )

        got = {
            r.term: (r.rank, r.rk)
            for r in textrank_keywords(self._docs(spark), k=10).collect()
        }
        # graph: alpha-(2)-beta-(1)-gamma; solo/empty/NULL contribute
        # no nodes. Replay the exact recurrence in Python floats.
        d, n = 0.85, 3
        w = {
            ("alpha", "beta"): 1.0,
            ("beta", "alpha"): 2.0 / 3.0,
            ("beta", "gamma"): 1.0 / 3.0,
            ("gamma", "beta"): 1.0,
        }
        r = {t: 1.0 / n for t in ("alpha", "beta", "gamma")}
        for _ in range(3):
            c = {t: 0.0 for t in r}
            for (u, v), wt in w.items():
                c[v] += r[u] * wt
            r = {t: (1.0 - d) / n + d * (c[t] + 0.0 / n) for t in r}
        assert set(got) == {"alpha", "beta", "gamma"}
        for t in r:
            assert got[t][0] == pytest.approx(round(r[t], 9), abs=1e-9)
        # beta is the hub; rk follows (rank DESC, term ASC)
        assert got["beta"][1] == 1
        assert got["beta"][0] > got["alpha"][0] > got["gamma"][0]

    def test_top_k_cut_and_rank_order(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
            textrank_keywords,
        )

        rows = textrank_keywords(self._docs(spark), k=2).collect()
        assert [r.rk for r in rows] == [1, 2]
        assert rows[0].term == "beta"


class TestBestLagCorrelation:
    def test_planted_shift_recovers_lag(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.stats import (
            best_lag_correlation,
        )

        rows = []
        # a: counts [1,2,3] at hours 0,1,2; b: the same shape at 2,3,4
        # (b trails a by exactly 2h); c: constant 1 over the full range
        # (zero variance -> every pair with c dropped)
        for h, n in [(0, 1), (1, 2), (2, 3)]:
            rows += [("a", _ts(h))] * n
            rows += [("b", _ts(h + 2))] * n
        rows += [("c", _ts(h)) for h in range(5)]
        ev = spark.createDataFrame(rows, "event_type: string, ts: timestamp")
        got = best_lag_correlation(ev, max_lag=3, min_overlap=3).collect()
        pairs = {(r.a, r.b): r for r in got}
        assert ("a", "b") in pairs
        r = pairs[("a", "b")]
        assert r.lag == 2 and r.r2 == 1.0 and r.direction == 1
        assert r.n_shared == 3
        # one best row per pair, and no pair may beat the planted
        # perfect shift
        assert len(got) == len(pairs)
        assert all(x.r2 <= 1.0 for x in got)
        # c is constant over the DENSE range, so its lag-0 variance is
        # zero; a (x, c) pair can only surface at a SHIFTED lag (where
        # truncation makes c non-constant) — never lag 0
        assert all(x.lag != 0 for x in got if "c" in (x.a, x.b))

    def test_validation(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.stats import (
            best_lag_correlation,
        )

        ev = spark.createDataFrame(
            [("a", _ts(0))], "event_type: string, ts: timestamp"
        )
        with pytest.raises(ValueError):
            best_lag_correlation(ev, max_lag=0)
        with pytest.raises(ValueError):
            best_lag_correlation(ev, min_overlap=0)


class TestAnalyzeEventsCliRound5d:
    def test_new_reports(self, spark, tmp_path):
        import importlib.util as _ilu
        import os as _os

        spec = _ilu.spec_from_file_location(
            "analyze_events",
            _os.path.join(
                _os.path.dirname(__file__), "..", "jobs", "analyze_events.py"
            ),
        )
        ae = _ilu.module_from_spec(spec)
        spec.loader.exec_module(ae)
        rows = [
            (f"e{h}{i}", f"u{i % 2}", t, _ts(h), 1.0)
            for h in range(6)
            for i in range(3)
            for t in ("click", "error")
        ]
        src = str(tmp_path / "ev.parquet")
        spark.createDataFrame(
            rows, ["event_id", "user_id", "event_type", "ts", "value"]
        ).write.parquet(src)
        for report in ("ewma", "lags", "simpson", "surge", "ks"):
            assert ae.main(["--input", src, "--report", report], spark=spark) == 0


class TestSeasonalSurge:
    def test_two_week_baseline(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
            seasonal_surge,
        )

        rows = (
            [("a", _ts(0, i)) for i in range(2)]           # week w, cell H
            + [("a", _ts(7 * 24, i)) for i in range(4)]    # week w+1, same H
            + [("a", _ts(1))]                              # different cell
        )
        ev = spark.createDataFrame(rows, "event_type: string, ts: timestamp")
        got = {
            (r.week, r.hour_of_week): r for r in seasonal_surge(ev).collect()
        }
        hows = {h for (_, h) in got}
        assert len(hows) == 2  # the repeated cell + the lone one
        cells = sorted(
            (r for r in got.values() if r.baseline_total == 6),
            key=lambda r: r.week,
        )
        assert [c.cnt for c in cells] == [2, 4]
        assert cells[0].ratio == 0.666667 and cells[1].ratio == 1.333333
        lone = [r for r in got.values() if r.baseline_total == 1][0]
        # active in 1 of 2 weeks: observed 1 vs per-week mean 0.5
        assert lone.ratio == 2.0

    def test_hour_of_week_alignment(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.anomaly import (
            seasonal_surge,
        )

        # same wall-clock hour, 7 days apart -> SAME hour_of_week
        ev = spark.createDataFrame(
            [("a", _ts(5)), ("a", _ts(5 + 7 * 24))],
            "event_type: string, ts: timestamp",
        )
        rows = seasonal_surge(ev).collect()
        assert len({r.hour_of_week for r in rows}) == 1
        assert len({r.week for r in rows}) == 2


class TestDpNoisyCounts:
    def _ev(self, spark):
        return spark.createDataFrame(
            [("a", 1), ("a", 1), ("a", 2), ("b", 1)],
            "event_type: string, user_id: long",
        )

    def test_reproducible_and_seeded_per_group(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
            dp_noisy_counts,
        )

        r1 = {
            (r.event_type, r.user_id): r.noisy_count
            for r in dp_noisy_counts(
                self._ev(spark), ["event_type", "user_id"]
            ).collect()
        }
        r2 = {
            (r.event_type, r.user_id): r.noisy_count
            for r in dp_noisy_counts(
                self._ev(spark), ["event_type", "user_id"]
            ).collect()
        }
        assert r1 == r2  # pure function of the input
        assert len(set(r1.values())) > 1  # per-group noise differs
        # a different salt re-draws the noise
        r3 = dp_noisy_counts(
            self._ev(spark), ["event_type", "user_id"], salt="dp2"
        ).collect()
        assert {
            (r.event_type, r.user_id): r.noisy_count for r in r3
        } != r1

    def test_include_true_and_noise_scale(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
            dp_noisy_counts,
        )

        tight = dp_noisy_counts(
            self._ev(spark), ["event_type"], epsilon=100.0, include_true=True
        ).collect()
        for r in tight:
            # epsilon huge -> noise tiny: noisy ~ true
            assert abs(r.noisy_count - r.true_count) < 0.2
        # release posture: no true_count column by default
        cols = dp_noisy_counts(self._ev(spark), ["event_type"]).columns
        assert "true_count" not in cols

    def test_null_groups_draw_independent_noise(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
            dp_noisy_counts,
        )

        # ('x', NULL), (NULL, 'x') and ('x', 'x') must all seed
        # DIFFERENTLY (concat_ws alone would collide the first two)
        d = spark.createDataFrame(
            [("x", None), (None, "x"), ("x", "x")], "a: string, b: string"
        )
        rows = dp_noisy_counts(d, ["a", "b"], include_true=True).collect()
        noises = {round(r.noisy_count - r.true_count, 6) for r in rows}
        assert len(noises) == 3

    def test_validation(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
            dp_noisy_counts,
        )

        with pytest.raises(ValueError):
            dp_noisy_counts(self._ev(spark), ["event_type"], epsilon=0.0)
        with pytest.raises(ValueError):
            dp_noisy_counts(self._ev(spark), [])


class TestRefusalRate:
    def test_hand_computed(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            refusal_rate,
        )

        turns = spark.createDataFrame(
            [
                ("c1", "assistant", "Sure, here is the answer."),
                ("c1", "assistant", "I cannot help with that."),
                ("c1", "assistant", "I'M SORRY, BUT no."),  # case-folded
                ("c1", "user", "I cannot believe it"),       # not assistant
                ("c2", "assistant", "Done."),
                ("c3", "user", "hi"),                        # no assistant
                ("c4", "assistant", None),                   # NULL text
            ],
            "conv_id: string, role: string, text: string",
        )
        got = {r.conv_id: r.asDict() for r in refusal_rate(turns).collect()}
        assert got["c1"]["n_assistant"] == 3
        assert got["c1"]["n_refusals"] == 2
        assert got["c1"]["refusal_rate"] == 0.666667
        assert got["c2"]["n_refusals"] == 0 and got["c2"]["refusal_rate"] == 0.0
        # no assistant turns / NULL-only -> no row, never a NULL rate
        assert "c3" not in got and "c4" not in got

    def test_patterns_are_substrings_not_regex(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.transcript_stats import (
            REFUSAL_PATTERNS,
            refusal_rate,
        )

        # every pinned pattern detects itself embedded mid-sentence
        turns = spark.createDataFrame(
            [(f"c{i}", "assistant", f"well, {p}do X")
             for i, p in enumerate(REFUSAL_PATTERNS)],
            "conv_id: string, role: string, text: string",
        )
        rows = refusal_rate(turns).collect()
        assert all(r.refusal_rate == 1.0 for r in rows)
        assert len(rows) == len(REFUSAL_PATTERNS)


class TestClusterBalancedSample:
    def _emb(self, spark):
        # two well-separated 1-d modes: 12 points near 0, 3 near 10
        rows = [(i, [0.0 + i * 0.001]) for i in range(12)]
        rows += [(100 + i, [10.0 + i * 0.001]) for i in range(3)]
        return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")

    def test_quota_and_exhaustion(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.clustering import (
            cluster_balanced_sample,
        )

        got = cluster_balanced_sample(
            self._emb(spark), k=2, per_cluster=5
        ).collect()
        by_cluster = {}
        for r in got:
            by_cluster.setdefault(r.cluster, []).append(r)
        sizes = sorted(len(v) for v in by_cluster.values())
        # dense mode capped at 5, sparse mode exhausted at 3
        assert sizes == [3, 5]
        for rows in by_cluster.values():
            assert sorted(r.draw_rank for r in rows) == list(
                range(1, len(rows) + 1)
            )

    def test_deterministic_and_salt_redraws(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.clustering import (
            cluster_balanced_sample,
        )

        a = {
            (r.vec_id, r.cluster, r.draw_rank)
            for r in cluster_balanced_sample(
                self._emb(spark), k=2, per_cluster=5
            ).collect()
        }
        b = {
            (r.vec_id, r.cluster, r.draw_rank)
            for r in cluster_balanced_sample(
                self._emb(spark), k=2, per_cluster=5
            ).collect()
        }
        assert a == b
        c = {
            (r.vec_id, r.cluster, r.draw_rank)
            for r in cluster_balanced_sample(
                self._emb(spark), k=2, per_cluster=5, salt="other"
            ).collect()
        }
        assert a != c  # different salt, different members/order
        with pytest.raises(ValueError):
            cluster_balanced_sample(self._emb(spark), per_cluster=0)


class TestVocabRichness:
    def test_hand_computed(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
            vocab_richness,
        )

        # terms: aa x3, bb x2, cc x1, dd x1  ->  s_obs=4, n=7, f1=2, f2=1
        d = spark.createDataFrame(
            [(1, "aa aa bb cc"), (2, "aa bb dd")],
            "doc_id: long, text: string",
        )
        row = vocab_richness(d).collect()[0]
        assert (row.s_obs, row.n_tokens, row.f1, row.f2) == (4, 7, 2, 1)
        # chao1 = 4 + 2*1/(2*2) = 4.5 ; coverage = 1 - 2/7
        assert row.chao1 == 4.5
        assert row.coverage == 0.714286

    def test_no_hapax_coverage_one(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
            vocab_richness,
        )

        d = spark.createDataFrame(
            [(1, "aa aa bb bb")], "doc_id: long, text: string"
        )
        row = vocab_richness(d).collect()[0]
        # f1 = 0: chao1 collapses to s_obs, coverage to 1.0
        assert row.f1 == 0 and row.chao1 == 2.0 and row.coverage == 1.0

    def test_empty_corpus_null_estimates(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
            vocab_richness,
        )

        d = spark.createDataFrame([(1, "!!!")], "doc_id: long, text: string")
        row = vocab_richness(d).collect()[0]
        assert row.s_obs == 0 and row.chao1 is None and row.coverage is None


class TestProfileDrift:
    def test_hand_computed(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
            profile_drift,
        )

        a = spark.createDataFrame(
            [("x", 1), ("y", 2), ("z", None), ("x", 4)],
            "t: string, v: int",
        )
        b = spark.createDataFrame(
            [("x", None), ("x", None), ("x", 1), (None, 2)],
            "t: string, v: int",
        )
        got = {r.col: r.asDict() for r in profile_drift(a, b, ["t", "v"]).collect()}
        assert got["t"]["n_a"] == 4 and got["t"]["n_b"] == 4
        assert got["t"]["null_rate_a"] == 0.0 and got["t"]["null_rate_b"] == 0.25
        assert got["t"]["null_rate_delta"] == 0.25
        assert got["t"]["n_distinct_a"] == 3 and got["t"]["n_distinct_b"] == 1
        assert got["t"]["distinct_ratio"] == 0.333333
        assert got["v"]["null_rate_a"] == 0.25 and got["v"]["null_rate_b"] == 0.5
        assert got["v"]["null_rate_delta"] == 0.25

    def test_zero_baseline_distinct_null_ratio(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
            profile_drift,
        )

        a = spark.createDataFrame([(None,), (None,)], "t: string")
        b = spark.createDataFrame([("x",)], "t: string")
        row = profile_drift(a, b, ["t"]).collect()[0]
        assert row.n_distinct_a == 0 and row.distinct_ratio is None
        assert row.null_rate_a == 1.0

    def test_validation(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
            profile_drift,
        )

        a = spark.createDataFrame([("x",)], "t: string")
        with pytest.raises(ValueError):
            profile_drift(a, a, [])


class TestStylometryDelta:
    def test_hand_replayed(self, spark):
        import math

        from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
            stylometry_delta,
        )

        d = spark.createDataFrame(
            [(1, "aa aa bb", "A"), (2, "aa bb bb", "B"), (3, "aa bb", "C")],
            "doc_id: long, text: string, source: string",
        )
        got = {
            (r.a, r.b): r for r in stylometry_delta(d, m=2).collect()
        }
        # replay the fixed-point chain in Python
        f = {}
        for s, toks in {"A": "aa aa bb", "B": "aa bb bb", "C": "aa bb"}.items():
            ts = toks.split()
            for t in ("aa", "bb"):
                f[(s, t)] = round(ts.count(t) * 1_000_000 / len(ts))
        z = {}
        for t in ("aa", "bb"):
            vals = [f[(s, t)] for s in "ABC"]
            sf, sf2, S = sum(vals), sum(v * v for v in vals), 3
            rad = S * sf2 - sf * sf
            for s in "ABC":
                z[(s, t)] = (S * f[(s, t)] - sf) / math.sqrt(rad)
        exp = {}
        for a, b in [("A", "B"), ("A", "C"), ("B", "C")]:
            exp[(a, b)] = round(
                sum(abs(z[(a, t)] - z[(b, t)]) for t in ("aa", "bb")) / 2, 6
            )
        assert set(got) == set(exp)
        for k in exp:
            assert got[k].n_terms == 2
            assert got[k].delta == pytest.approx(exp[k], abs=1e-6)
        # A and B are mirror images around C: symmetric distances
        assert got[("A", "C")].delta == got[("B", "C")].delta
        assert got[("A", "B")].delta > got[("A", "C")].delta

    def test_identical_sources_zero_variance_excluded(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
            stylometry_delta,
        )

        d = spark.createDataFrame(
            [(1, "aa bb cc", "A"), (2, "aa bb cc", "B")],
            "doc_id: long, text: string, source: string",
        )
        # every term has an identical profile -> all variances are
        # EXACTLY zero (integer test) -> no scorable terms, no rows
        assert stylometry_delta(d, m=3).collect() == []

    def test_validation(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.text_quality import (
            stylometry_delta,
        )

        d = spark.createDataFrame(
            [(1, "aa", "A")], "doc_id: long, text: string, source: string"
        )
        with pytest.raises(ValueError):
            stylometry_delta(d, m=0)


class TestRobustTrend:
    def _series(self, spark, ys, typ="a"):
        rows = []
        for h, y in enumerate(ys):
            rows += [(typ, _ts(h))] * y
        return spark.createDataFrame(rows, "event_type: string, ts: timestamp")

    def test_monotone_hand_computed(self, spark):
        import math

        from threat_intelligence_knowledge_graph_spark.operators.stats import (
            robust_trend,
        )

        row = robust_trend(self._series(spark, [1, 2, 3, 4])).collect()[0]
        assert row.n_buckets == 4 and row.mk_s == 6
        # no ties: var = 4*3*13/18; z = (6-1)/sqrt(var)
        assert row.mk_z == pytest.approx(
            round(5 / math.sqrt(156 / 18.0), 6), abs=1e-6
        )
        assert row.sen_slope == 1.0

    def test_outlier_robustness_vs_lsq(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.stats import (
            robust_trend,
            trend_slope,
        )

        ev = self._series(spark, [1, 2, 3, 100])
        sen = robust_trend(ev).collect()[0].sen_slope
        lsq = trend_slope(ev).collect()[0].slope
        # median pairwise slope shrugs off the burst hour; LSQ doesn't
        assert sen == 1.0
        assert lsq > 20

    def test_all_tied_dropped(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.stats import (
            robust_trend,
        )

        assert robust_trend(self._series(spark, [2, 2, 2])).collect() == []

    def test_decreasing_negative(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.stats import (
            robust_trend,
        )

        row = robust_trend(self._series(spark, [4, 3, 2, 1])).collect()[0]
        assert row.mk_s == -6 and row.mk_z < 0 and row.sen_slope == -1.0


class TestKsTwoSample:
    def test_hand_computed(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
            ks_two_sample,
        )

        a = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "v: double")
        b = spark.createDataFrame([(3.0,), (4.0,), (5.0,), (6.0,)], "v: double")
        row = ks_two_sample(a, b, "v").collect()[0]
        # F_a jumps to 1/2 at v=2 while F_b is still 0 -> D = 1/2 at 2.0
        assert (row.n_a, row.n_b) == (4, 4)
        assert row.ks_d == 0.5 and row.at_value == 2.0

    def test_identical_distributions_zero(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
            ks_two_sample,
        )

        a = spark.createDataFrame([(1.0,), (2.0,)], "v: double")
        row = ks_two_sample(a, a, "v").collect()[0]
        assert row.ks_d == 0.0
        # tie on the zero numerator resolves to the smallest value
        assert row.at_value == 1.0

    def test_disjoint_supports_full_distance(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
            ks_two_sample,
        )

        a = spark.createDataFrame([(1.0,), (2.0,)], "v: double")
        b = spark.createDataFrame([(5.0,), (6.0,)], "v: double")
        row = ks_two_sample(a, b, "v").collect()[0]
        assert row.ks_d == 1.0 and row.at_value == 2.0

    def test_empty_side_no_row(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
            ks_two_sample,
        )

        a = spark.createDataFrame([(1.0,)], "v: double")
        empty = spark.createDataFrame([(None,)], "v: double")
        assert ks_two_sample(a, empty, "v").collect() == []
