"""Round-5 continuation operators: paragraph-level boilerplate dedup,
sorted-neighborhood blocking, triple schema conformance audit."""

from __future__ import annotations

import pytest

from threat_intelligence_knowledge_graph_spark.operators.canonicalize import (
    sorted_neighborhood_pairs,
)
from threat_intelligence_knowledge_graph_spark.operators.dedup import (
    paragraph_dedup,
)
from threat_intelligence_knowledge_graph_spark.operators.triples import (
    relation_signatures,
    validate_triple_schema,
)


class TestParagraphDedup:
    def test_footer_removed_order_preserved(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "alpha\nFOOTER\nbeta"),
                (2, "gamma\nFOOTER"),
                (3, "delta"),
            ],
            "doc_id: long, text: string",
        )
        got = {
            r.doc_id: (r.text, r.n_paragraphs, r.n_removed)
            for r in paragraph_dedup(docs).collect()
        }
        assert got == {
            1: ("alpha\nbeta", 3, 1),
            2: ("gamma", 2, 1),
            3: ("delta", 1, 0),
        }

    def test_all_boilerplate_doc_keeps_empty_row(self, spark):
        docs = spark.createDataFrame(
            [(1, "FOOTER"), (2, "FOOTER"), (3, "keep\nFOOTER")],
            "doc_id: long, text: string",
        )
        got = {r.doc_id: (r.text, r.n_removed) for r in paragraph_dedup(docs).collect()}
        assert got[1] == ("", 1)
        assert got[2] == ("", 1)
        assert got[3] == ("keep", 1)

    def test_min_docs_threshold(self, spark):
        # FOOTER in only 2 docs: survives min_docs=3, dies at min_docs=2.
        docs = spark.createDataFrame(
            [(1, "a\nFOOTER"), (2, "b\nFOOTER"), (3, "c")],
            "doc_id: long, text: string",
        )
        keep3 = {r.doc_id: r.text for r in paragraph_dedup(docs, min_docs=3).collect()}
        assert keep3 == {1: "a\nFOOTER", 2: "b\nFOOTER", 3: "c"}
        keep2 = {r.doc_id: r.text for r in paragraph_dedup(docs, min_docs=2).collect()}
        assert keep2 == {1: "a", 2: "b", 3: "c"}

    def test_repeat_within_one_doc_not_boilerplate(self, spark):
        # countDistinct(doc_id): the same paragraph twice in ONE doc is
        # repetition (repetition_ratio's business), not boilerplate.
        docs = spark.createDataFrame(
            [(1, "x\nx\ny"), (2, "z")], "doc_id: long, text: string"
        )
        got = {r.doc_id: r.text for r in paragraph_dedup(docs).collect()}
        assert got[1] == "x\nx\ny"

    def test_empty_paragraphs_follow_frequency_rule(self, spark):
        # '' (from the double separator) appears in docs 1 and 2 → removed;
        # rebuilt text is the surviving subsequence, not a normalization.
        docs = spark.createDataFrame(
            [(1, "a\n\nb"), (2, "c\n\nd"), (3, "e")],
            "doc_id: long, text: string",
        )
        got = {r.doc_id: (r.text, r.n_paragraphs, r.n_removed) for r in paragraph_dedup(docs).collect()}
        assert got[1] == ("a\nb", 3, 1)
        assert got[2] == ("c\nd", 3, 1)
        assert got[3] == ("e", 1, 0)

    def test_null_text_is_one_empty_paragraph(self, spark):
        docs = spark.createDataFrame(
            [(1, None), (2, "a")], "doc_id: long, text: string"
        )
        got = {r.doc_id: (r.text, r.n_paragraphs, r.n_removed) for r in paragraph_dedup(docs).collect()}
        assert got[1] == ("", 1, 0)

    def test_min_docs_validation(self, spark):
        docs = spark.createDataFrame([(1, "a")], "doc_id: long, text: string")
        with pytest.raises(ValueError):
            paragraph_dedup(docs, min_docs=1)


def _brute_snm(rows, window):
    ranked = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (ida, _ka) in enumerate(ranked):
        for j in range(i + 1, min(i + window, len(ranked))):
            out.add((ida, ranked[j][0], j - i))
    return out


class TestSortedNeighborhood:
    def test_matches_brute_force_with_ties(self, spark):
        rows = [(i, f"k{i % 7:02d}") for i in range(40)]
        df = spark.createDataFrame(rows, "node_id: long, block_key: string")
        got = {
            (r.id_a, r.id_b, r.rank_distance)
            for r in sorted_neighborhood_pairs(
                df, window=4, n_buckets=5, sample_pct=50
            ).collect()
        }
        assert got == _brute_snm(rows, 4)

    def test_bucket_count_does_not_change_result(self, spark):
        rows = [(i, f"z{(i * 13) % 23:03d}") for i in range(60)]
        df = spark.createDataFrame(rows, "node_id: long, block_key: string")
        one = {
            (r.id_a, r.id_b, r.rank_distance)
            for r in sorted_neighborhood_pairs(df, window=3, n_buckets=1).collect()
        }
        many = {
            (r.id_a, r.id_b, r.rank_distance)
            for r in sorted_neighborhood_pairs(
                df, window=3, n_buckets=8, sample_pct=40
            ).collect()
        }
        assert one == many == _brute_snm(rows, 3)

    def test_window_two_is_adjacent_only(self, spark):
        rows = [(i, chr(97 + i)) for i in range(5)]
        df = spark.createDataFrame(rows, "node_id: long, block_key: string")
        got = sorted(
            (r.id_a, r.id_b)
            for r in sorted_neighborhood_pairs(df, window=2).collect()
        )
        assert got == [(0, 1), (1, 2), (2, 3), (3, 4)]

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "node_id: long, block_key: string")
        with pytest.raises(ValueError):
            sorted_neighborhood_pairs(df, window=1)
        with pytest.raises(ValueError):
            sorted_neighborhood_pairs(df, n_buckets=0)
        with pytest.raises(ValueError):
            sorted_neighborhood_pairs(df, sample_pct=0)


class TestTripleSchemaAudit:
    def test_signature_expansion_includes_noninjective_stix(self):
        sigs = set(relation_signatures())
        # ipv4-addr expands to BOTH Ipv4 and Cidr store labels.
        assert ("RESOLVES_TO", "Domain", "Ipv4") in sigs
        assert ("RESOLVES_TO", "Domain", "Cidr") in sigs
        # vocabulary-only types appear as their capitalized selves.
        assert ("USES", "Threat_actor", "Malware") in sigs
        assert len(sigs) == len(relation_signatures())  # no dups

    def test_statuses_and_precedence(self, spark):
        nodes = spark.createDataFrame(
            [
                ("Domain", "Domain_X"),
                ("Ipv4", "Ipv4_1"),
                ("Url", "Url_Y"),
            ],
            "node_label: string, node_id: string",
        )
        triples = spark.createDataFrame(
            [
                ("Domain_X", "RESOLVES_TO", "Ipv4_1"),  # ok
                ("Ipv4_1", "RESOLVES_TO", "Domain_X"),  # reversed → mismatch
                ("Domain_X", "FOOBAR", "Ipv4_1"),  # unknown predicate
                ("Domain_X", "FOOBAR", "Missing"),  # endpoint beats predicate
                ("Url_Y", "CONTAINS", "Domain_X"),  # ok
            ],
            "subj: string, pred: string, obj: string",
        )
        got = {
            (r.subj, r.pred, r.obj): r.status
            for r in validate_triple_schema(triples, nodes).collect()
        }
        assert got == {
            ("Domain_X", "RESOLVES_TO", "Ipv4_1"): "ok",
            ("Ipv4_1", "RESOLVES_TO", "Domain_X"): "signature_mismatch",
            ("Domain_X", "FOOBAR", "Ipv4_1"): "unknown_predicate",
            ("Domain_X", "FOOBAR", "Missing"): "unknown_endpoint",
            ("Url_Y", "CONTAINS", "Domain_X"): "ok",
        }

    def test_pipeline_output_is_fully_conformant(self, spark):
        # The kernel can only emit rule-conformant triples: audit of its
        # own output over a synthetic corpus must be all-ok.
        from threat_intelligence_knowledge_graph_spark.datagen import (
            generate_transcripts_df,
        )
        from threat_intelligence_knowledge_graph_spark.operators.extraction import (
            extract_graph_records,
        )
        from threat_intelligence_knowledge_graph_spark.operators.reassembly import (
            reassemble,
        )
        from threat_intelligence_knowledge_graph_spark.operators.triples import (
            build_edges,
            build_nodes,
            build_triples,
        )

        t = generate_transcripts_df(spark, 40)
        ext = extract_graph_records(reassemble(t))
        nodes = build_nodes(ext)
        triples = build_triples(build_edges(ext, nodes))
        audited = validate_triple_schema(
            triples, nodes.select("node_label", "node_id")
        )
        assert audited.filter(audited.status != "ok").count() == 0


class TestScd2Intervals:
    def _obs(self, spark, rows):
        return spark.createDataFrame(
            rows, "subj: string, pred: string, obj: string, ts: timestamp"
        )

    def test_runs_and_reopened_interval(self, spark):
        import datetime as dt

        T = dt.datetime
        obs = self._obs(
            spark,
            [
                ("d1", "R", "ip1", T(2026, 1, 1)),
                ("d1", "R", "ip1", T(2026, 1, 2)),
                ("d1", "R", "ip2", T(2026, 1, 3)),
                ("d1", "R", "ip1", T(2026, 1, 4)),  # ip1 RETURNS → new run
                ("d2", "R", "ip9", T(2026, 1, 1)),
            ],
        )
        from threat_intelligence_knowledge_graph_spark.operators.temporal_join import (
            scd2_intervals,
        )

        got = [
            (r.subj, r.obj, r.valid_from, r.valid_to, r.n_observations, r.is_current)
            for r in scd2_intervals(obs).orderBy("subj", "valid_from", "obj").collect()
        ]
        assert got == [
            ("d1", "ip1", T(2026, 1, 1), T(2026, 1, 3), 2, False),
            ("d1", "ip2", T(2026, 1, 3), T(2026, 1, 4), 1, False),
            ("d1", "ip1", T(2026, 1, 4), None, 1, True),
            ("d2", "ip9", T(2026, 1, 1), None, 1, True),
        ]

    def test_same_instant_conflict_is_deterministic(self, spark):
        import datetime as dt

        T = dt.datetime
        from threat_intelligence_knowledge_graph_spark.operators.temporal_join import (
            scd2_intervals,
        )

        obs = self._obs(
            spark,
            [
                ("d1", "R", "ipB", T(2026, 1, 1)),
                ("d1", "R", "ipA", T(2026, 1, 1)),  # same instant, obj order
                ("d1", "R", "ipC", T(2026, 1, 2)),
            ],
        )
        got = [
            (r.obj, r.valid_from, r.valid_to, r.is_current)
            for r in scd2_intervals(obs)
            .orderBy("valid_from", "obj")
            .collect()
        ]
        # obj-ordered at the tied instant: ipA run then ipB run (both
        # valid_from 1/1, A's valid_to = B's valid_from), then ipC.
        assert got == [
            ("ipA", T(2026, 1, 1), T(2026, 1, 1), False),
            ("ipB", T(2026, 1, 1), T(2026, 1, 2), False),
            ("ipC", T(2026, 1, 2), None, True),
        ]


class TestVerifyPairsEditDistance:
    def test_threshold_and_similarity(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.canonicalize import (
            verify_pairs_edit_distance,
        )

        recs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha bexa"), (3, "zzzz")],
            "node_id: long, name: string",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3)], "id_a: long, id_b: long"
        )
        got = {
            (r.id_a, r.id_b): r.similarity
            for r in verify_pairs_edit_distance(pairs, recs, tau=0.5).collect()
        }
        assert got == {(1, 2): 0.9}

    def test_empty_strings_score_one(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.canonicalize import (
            verify_pairs_edit_distance,
        )

        recs = spark.createDataFrame(
            [(1, ""), (2, "")], "node_id: long, name: string"
        )
        pairs = spark.createDataFrame([(1, 2)], "id_a: long, id_b: long")
        got = verify_pairs_edit_distance(pairs, recs, tau=0.9).collect()
        assert len(got) == 1 and got[0].similarity == 1.0

    def test_tau_validation(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.canonicalize import (
            verify_pairs_edit_distance,
        )

        recs = spark.createDataFrame([(1, "a")], "node_id: long, name: string")
        pairs = spark.createDataFrame([(1, 1)], "id_a: long, id_b: long")
        import pytest as _pt

        with _pt.raises(ValueError):
            verify_pairs_edit_distance(pairs, recs, tau=0)


class TestTemporalTwoHop:
    def _edges(self, spark, rows):
        return spark.createDataFrame(
            rows, "src: string, dst: string, ts: timestamp"
        )

    def test_causal_order_enforced(self, spark):
        import datetime as dt

        T = dt.datetime
        from threat_intelligence_knowledge_graph_spark.operators.temporal_join import (
            temporal_two_hop,
        )

        edges = self._edges(
            spark,
            [
                ("a", "b", T(2026, 1, 1)),
                ("b", "c", T(2026, 1, 2)),  # causal: after a→b
                ("b", "d", T(2025, 12, 31)),  # BEFORE a→b → excluded
                ("b", "e", T(2026, 1, 1)),  # same instant → excluded
            ],
        )
        got = [
            (r.a, r.b, r.c, r.gap_s)
            for r in temporal_two_hop(edges).collect()
        ]
        assert got == [("a", "b", "c", 86400.0)]

    def test_max_gap_bound(self, spark):
        import datetime as dt

        T = dt.datetime
        from threat_intelligence_knowledge_graph_spark.operators.temporal_join import (
            temporal_two_hop,
        )

        edges = self._edges(
            spark,
            [
                ("a", "b", T(2026, 1, 1)),
                ("b", "c", T(2026, 1, 2)),
                ("b", "d", T(2026, 3, 1)),  # 59 days later
            ],
        )
        got = {
            r.c for r in temporal_two_hop(edges, max_gap_s=7 * 86400).collect()
        }
        assert got == {"c"}
        with pytest.raises(ValueError):
            temporal_two_hop(edges, max_gap_s=0)


class TestTripleCorroboration:
    def test_distinct_sources_drive_confidence(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.triples import (
            triple_corroboration,
        )

        obs = spark.createDataFrame(
            [
                # triple X seen by 2 sources, one of them twice
                ("s", "P", "o", "feedA"),
                ("s", "P", "o", "feedA"),
                ("s", "P", "o", "feedB"),
                # triple Y seen once
                ("s2", "P", "o2", "feedA"),
            ],
            "subj: string, pred: string, obj: string, source: string",
        )
        got = {
            (r.subj, r.obj): (r.n_sources, r.n_mentions, r.confidence)
            for r in triple_corroboration(obs, base_conf=0.7).collect()
        }
        assert got[("s", "o")] == (2, 3, 0.91)  # 1 - 0.3^2
        assert got[("s2", "o2")] == (1, 1, 0.7)

    def test_base_conf_validation(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.triples import (
            triple_corroboration,
        )

        obs = spark.createDataFrame(
            [("s", "P", "o", "f")],
            "subj: string, pred: string, obj: string, source: string",
        )
        with pytest.raises(ValueError):
            triple_corroboration(obs, base_conf=1.0)
