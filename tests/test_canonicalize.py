"""Stage D tests: MinHash/LSH primitives, connected components, aliasing."""

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.canonicalize import (
    apply_canonicalization,
    build_alias_dictionary,
)
from threat_intelligence_knowledge_graph_spark.operators.minhash import (
    char_shingles,
    connected_components,
    jaccard_verify,
    lsh_bands,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)


class TestShingles:
    def test_char_shingles(self, spark):
        df = spark.createDataFrame([("x", "abcd")], ["id", "t"])
        got = {
            r.shingle for r in char_shingles(df, "id", "t", n=3).collect()
        }
        assert got == {"abc", "bcd"}

    def test_word_shingles(self, spark):
        df = spark.createDataFrame([("x", "a b c d")], ["id", "t"])
        got = {r.shingle for r in word_shingles(df, "id", "t", n=2).collect()}
        assert got == {"a b", "b c", "c d"}


class TestMinhashLsh:
    def test_identical_texts_share_all_bands(self, spark):
        df = spark.createDataFrame(
            [("a", "the quick brown fox"), ("b", "the quick brown fox")],
            ["id", "t"],
        )
        sh = char_shingles(df, "id", "t")
        banded = lsh_bands(minhash_signatures(sh, 16), bands=4)
        pairs, dropped = lsh_candidate_pairs(banded)
        assert {(r.a, r.b) for r in pairs.collect()} == {("a", "b")}
        assert dropped.count() == 0

    def test_fused_band_keys_group_like_narrow_path(self, spark):
        """lsh_band_keys (one-pass wide agg) must induce the same
        candidate pairs as lsh_bands(minhash_signatures(...)) — the
        band composition (seed ≡ band mod bands) is identical, only the
        band_key hash encoding differs."""
        from threat_intelligence_knowledge_graph_spark.operators.minhash import (
            lsh_band_keys,
        )

        texts = [
            ("a", "the quick brown fox jumps"),
            ("b", "the quick brown fox jumped"),
            ("c", "a completely different sentence here"),
            ("d", "the quick brown fox jumps"),
            ("e", "yet another unrelated string value"),
        ]
        df = spark.createDataFrame(texts, ["id", "t"])
        sh = char_shingles(df, "id", "t")
        old_banded = lsh_bands(minhash_signatures(sh, 16), bands=4)
        old_pairs, _ = lsh_candidate_pairs(old_banded)
        new_pairs, _ = lsh_candidate_pairs(lsh_band_keys(sh, 16, bands=4))
        assert {(r.a, r.b) for r in old_pairs.collect()} == {
            (r.a, r.b) for r in new_pairs.collect()
        }

    def test_disjoint_texts_no_pairs(self, spark):
        df = spark.createDataFrame(
            [("a", "aaaaaaaaaaaa"), ("b", "zzzzzzzzzzzz")], ["id", "t"]
        )
        sh = char_shingles(df, "id", "t")
        banded = lsh_bands(minhash_signatures(sh, 16), bands=4)
        pairs, _ = lsh_candidate_pairs(banded)
        assert pairs.count() == 0

    def test_jaccard_exact(self, spark):
        df = spark.createDataFrame(
            [("a", "abcde"), ("b", "abcdx")], ["id", "t"]
        )
        sh = char_shingles(df, "id", "t", n=2)  # a:{ab,bc,cd,de} b:{ab,bc,cd,dx}
        pairs = spark.createDataFrame([("a", "b")], ["a", "b"])
        got = jaccard_verify(pairs, sh, threshold=0.0).collect()[0]
        assert abs(got.jaccard - 3 / 5) < 1e-9

    def test_bucket_cap_reports_dropped(self, spark):
        rows = [(f"id{i}", "same text every time") for i in range(10)]
        df = spark.createDataFrame(rows, ["id", "t"])
        banded = lsh_bands(
            minhash_signatures(char_shingles(df, "id", "t"), 8), bands=2
        )
        pairs, dropped = lsh_candidate_pairs(banded, max_bucket_size=5)
        assert pairs.count() == 0
        assert dropped.count() > 0


class TestConnectedComponents:
    def test_two_components(self, spark):
        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y")], ["a", "b"]
        )
        got = {
            r.id: r.component for r in connected_components(edges).collect()
        }
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_chain_converges(self, spark):
        # Long chain exercises multi-iteration propagation.
        edges = spark.createDataFrame(
            [(f"n{i:02d}", f"n{i+1:02d}") for i in range(12)], ["a", "b"]
        )
        got = connected_components(edges)
        assert got.select("component").distinct().count() == 1


class TestAliasLayer:
    def test_near_duplicate_ids_merge(self, spark):
        nodes = spark.createDataFrame(
            [
                ("Threat_actor", "Threat-Actor_Apt29"),
                ("Threat_actor", "Threat-Actor_Apt_29"),
                ("Threat_actor", "Threat-Actor_Lazarus_Group"),
                ("Domain", "Domain_Evil_Example_Net"),
            ],
            ["node_label", "node_id"],
        )
        alias = build_alias_dictionary(nodes, jaccard_threshold=0.6)
        got = {r.node_id: r.canonical_id for r in alias.collect()}
        # APT29 variants merge to the lexicographically smaller id.
        assert got == {"Threat-Actor_Apt_29": "Threat-Actor_Apt29"}

    def test_cross_type_never_merges(self, spark):
        # Same value, different type → label salt keeps them apart.
        nodes = spark.createDataFrame(
            [
                ("Ipv4", "X_10_0_0_1"),
                ("Cidr", "X_10_0_0_1"),
            ],
            ["node_label", "node_id"],
        )
        alias = build_alias_dictionary(nodes, jaccard_threshold=0.5)
        assert alias.count() == 0

    def test_apply_canonicalization_rewrites_and_dedups(self, spark):
        edges = spark.createDataFrame(
            [
                ("A", "a1", "USES", "B", "b1"),
                ("A", "a2", "USES", "B", "b1"),  # a2 aliases to a1 → dup
            ],
            ["src_label", "src_id", "rel_type", "dst_label", "dst_id"],
        )
        alias = spark.createDataFrame([("a2", "a1")], ["node_id", "canonical_id"])
        got = apply_canonicalization(edges, alias)
        assert got.count() == 1
        assert got.first().src_id == "a1"


class TestReviewRegressions:
    def test_cc_raises_on_nonconvergence(self, spark):
        import pytest as _pytest
        edges = spark.createDataFrame(
            [(f"n{i:02d}", f"n{i+1:02d}") for i in range(12)], ["a", "b"]
        )
        with _pytest.raises(RuntimeError, match="did not converge"):
            connected_components(edges, max_iterations=3, algorithm="propagation")

    def test_cc_auto_falls_back_to_star_past_cap(self, spark):
        # Same diameter-3-iterations-won't-do chain: auto must return the
        # correct single component via star contraction, not raise.
        edges = spark.createDataFrame(
            [(f"n{i:02d}", f"n{i+1:02d}") for i in range(12)], ["a", "b"]
        )
        got = {
            r.id: r.component
            for r in connected_components(edges, max_iterations=3).collect()
        }
        assert set(got.values()) == {"n00"}
        assert len(got) == 13


class TestStarContraction:
    def test_pathological_path_graph(self, spark):
        """10k-node path graph: diameter 10k defeats propagation's
        50-iteration budget; star contraction converges in O(log² n)
        rounds with the exact same labeling."""
        from threat_intelligence_knowledge_graph_spark.operators.minhash import (
            connected_components_star,
        )

        n = 10_000
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], ["a", "b"]
        ).repartition(8)
        got = connected_components_star(edges)
        assert got.count() == n
        assert got.select("component").distinct().collect()[0][0] == 0
        # spot-check the far end reaches the root
        assert got.filter("id = 9999").first().component == 0

    def test_star_equals_propagation_on_random_graphs(self, spark):
        import random

        from threat_intelligence_knowledge_graph_spark.operators.minhash import (
            connected_components_star,
        )

        rng = random.Random(5)
        pairs = set()
        for _ in range(300):
            a, b = rng.randrange(150), rng.randrange(150)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        edges = spark.createDataFrame(sorted(pairs), ["a", "b"])
        prop = {
            r.id: r.component
            for r in connected_components(
                edges, algorithm="propagation"
            ).collect()
        }
        star = {
            r.id: r.component for r in connected_components_star(edges).collect()
        }
        assert prop == star

    def test_cross_type_hard_guard_long_values(self, spark):
        # Long shared value dilutes the label-prefix shingles — the hard
        # same-label filter must still prevent the merge.
        long_val = "X_" + "_".join(f"Seg{i}" for i in range(60))
        nodes = spark.createDataFrame(
            [("Url", long_val), ("Filepath", long_val)],
            ["node_label", "node_id"],
        )
        alias = build_alias_dictionary(nodes, jaccard_threshold=0.5)
        assert alias.count() == 0


class TestAliasQuality:
    def test_alias_precision_recall_on_planted_families(self, spark):
        """VERDICT r1 #9: planted alias families ("APT29"/"APT 29"/
        "apt-29" style surface variants) + distinct distractors; measure
        pair-level precision/recall of the alias dictionary. Gate: both
        >= 0.95 on this fixture."""
        import itertools

        from threat_intelligence_knowledge_graph_spark.operators.canonicalize import (
            build_alias_dictionary,
        )

        # 20 planted actor families: separator variants of the same name
        # ("Fancy_Bear" / "Fancy-Bear" / "FancyBear" — char-3-shingle
        # jaccard >= 0.80 intra-family). Cross-family names share the
        # "_Group" suffix and half share the animal word (<= 0.48) — the
        # realistic distractor: similar SHAPE, different NAME. (A pure
        # string canonicalizer cannot separate one-DIGIT-different ids
        # like apt29/apt30 — jaccard-identical to a punctuation edit —
        # which is exactly why the pipeline defaults to threshold 0.9 and
        # treats stage D as opt-in.)
        words = ["Fancy", "Cozy", "Energetic", "Venomous", "Charming",
                 "Gothic", "Lazy", "Wicked", "Silent", "Crimson", "Golden",
                 "Iron", "Shadow", "Static", "Mystic", "Turbo", "Nomad",
                 "Ember", "Frost", "Quantum"]
        animals = ["Bear", "Panda", "Kitten", "Spider", "Falcon", "Tiger",
                   "Jackal", "Wolf", "Viper", "Raven", "Mantis", "Lynx",
                   "Otter", "Heron", "Cobra", "Moth", "Bison", "Crane",
                   "Gecko", "Shark"]
        families = {}
        rows = []
        for w, a in zip(words, animals):
            variants = [
                f"Threatactor_{w}_{a}_Group",
                f"Threatactor_{w}-{a}_Group",
                f"Threatactor_{w}{a}_Group",
            ]
            families[f"{w}_{a}"] = variants
            rows += [(v, "Threatactor") for v in variants]
        nodes = spark.createDataFrame(
            [(label, nid) for nid, label in rows], ["node_label", "node_id"]
        )
        alias = build_alias_dictionary(nodes, jaccard_threshold=0.7)
        canon = {r.node_id: r.canonical_id for r in alias.collect()}

        def resolved(x):
            return canon.get(x, x)

        ids = [nid for nid, _ in rows]
        pred_pairs = {
            (a, b)
            for a, b in itertools.combinations(sorted(ids), 2)
            if resolved(a) == resolved(b)
        }
        true_pairs = {
            (a, b)
            for variants in families.values()
            for a, b in itertools.combinations(sorted(variants), 2)
        }
        tp = len(pred_pairs & true_pairs)
        precision = tp / len(pred_pairs) if pred_pairs else 1.0
        recall = tp / len(true_pairs)
        assert precision >= 0.95, (precision, sorted(pred_pairs - true_pairs)[:5])
        assert recall >= 0.95, (recall, sorted(true_pairs - pred_pairs)[:5])
