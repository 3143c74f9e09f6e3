"""Sequence packing + deterministic split operators."""

import hashlib

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.packing import (
    pack_documents,
    pack_stats,
    sample_by_hash,
    split_by_hash,
)

import pytest


class TestPackDocuments:
    def test_bin_by_prefix_sum(self, spark):
        df = spark.createDataFrame(
            [(1, 30), (2, 40), (3, 50), (4, 10), (5, 100)],
            ["doc_id", "n_tokens"],
        )
        got = {r.doc_id: r.pack_id for r in pack_documents(df, 100).collect()}
        # preceding cumsums: 0, 30, 70, 120, 130 → packs 0,0,0,1,1
        assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1}

    def test_oversized_doc_own_pack_region(self, spark):
        df = spark.createDataFrame([(1, 500), (2, 10)], ["doc_id", "n_tokens"])
        got = {r.doc_id: r.pack_id for r in pack_documents(df, 100).collect()}
        assert got[1] == 0 and got[2] == 5  # next doc starts past the big one

    def test_stats_cover_all_tokens(self, spark):
        df = spark.createDataFrame(
            [(i, 37 + i % 11) for i in range(200)], ["doc_id", "n_tokens"]
        )
        packed = pack_documents(df, 256)
        stats = pack_stats(packed)
        total = stats.groupBy().sum("total_tokens").first()[0]
        assert total == sum(37 + i % 11 for i in range(200))
        # every pack except possibly the last holds >= budget-worth of
        # start offsets → fills are near budget, never double
        assert all(r.total_tokens < 2 * 256 for r in stats.collect())

    def test_invalid_budget(self, spark):
        df = spark.createDataFrame([(1, 1)], ["doc_id", "n_tokens"])
        with pytest.raises(ValueError):
            pack_documents(df, 0)

    def test_sharded_equals_per_shard_global(self, spark):
        """shard_col packing == running the global packer on each shard's
        subset independently (pack ids local to the shard)."""
        rows = [(i, 17 + (i * 13) % 91, i % 3) for i in range(300)]
        df = spark.createDataFrame(rows, ["doc_id", "n_tokens", "shard"])
        sharded = {
            (r.shard, r.doc_id): r.pack_id
            for r in pack_documents(df, 200, shard_col="shard").collect()
        }
        assert len(sharded) == 300
        for s in range(3):
            sub = df.filter(f"shard = {s}").drop("shard")
            expect = {
                r.doc_id: r.pack_id for r in pack_documents(sub, 200).collect()
            }
            assert {d: p for (sh, d), p in sharded.items() if sh == s} == expect

    def test_sharded_plan_has_no_global_single_partition_sort(self, spark):
        df = spark.createDataFrame(
            [(i, 10, i % 4) for i in range(100)], ["doc_id", "n_tokens", "shard"]
        )
        plan = pack_documents(df, 100, shard_col="shard")._jdf.queryExecution().executedPlan().toString()
        # A partitionBy window hash-partitions on the shard key; the
        # shard-less window would show SinglePartition here.
        assert "SinglePartition" not in plan
        assert "hashpartitioning(shard" in plan


class TestSplitByHash:
    def test_matches_python_md5(self, spark):
        df = spark.createDataFrame([(i,) for i in range(50)], ["k"])
        got = {r.k: r.split for r in split_by_hash(df, "k", 0.7).collect()}
        for i in range(50):
            h = int.from_bytes(
                hashlib.md5(f"split:{i}".encode()).digest()[:8], "little"
            )
            assert got[i] == ("train" if h % 1_000_000 < 700_000 else "val")

    def test_deterministic_and_salt_redraws(self, spark):
        df = spark.createDataFrame([(i,) for i in range(300)], ["k"])
        a = {r.k: r.split for r in split_by_hash(df, "k", 0.5).collect()}
        b = {r.k: r.split for r in split_by_hash(df, "k", 0.5).collect()}
        assert a == b  # stable across runs
        c = {r.k: r.split for r in split_by_hash(df, "k", 0.5, salt="v2").collect()}
        assert a != c  # a new salt re-draws the assignment
        frac = sum(v == "train" for v in a.values()) / 300
        assert 0.4 < frac < 0.6

    def test_boundary_fracs(self, spark):
        df = spark.createDataFrame([(i,) for i in range(20)], ["k"])
        assert all(
            r.split == "train" for r in split_by_hash(df, "k", 1.0).collect()
        )
        assert all(
            r.split == "val" for r in split_by_hash(df, "k", 0.0).collect()
        )
        with pytest.raises(ValueError):
            split_by_hash(df, "k", 1.5)


class TestSampleByHash:
    @staticmethod
    def _bucket(key, salt="sample"):
        h = int.from_bytes(
            hashlib.md5(f"{salt}:{key}".encode()).digest()[:8], "little"
        )
        return h % 1_000_000

    def test_matches_python_md5_per_stratum(self, spark):
        rows = [(i, "ab"[i % 2]) for i in range(200)]
        df = spark.createDataFrame(rows, ["k", "s"])
        fr = {"a": 0.3, "b": 0.7}
        got = {r.k for r in sample_by_hash(df, "k", "s", fr).collect()}
        want = {
            k
            for k, s in rows
            if self._bucket(k) < int(fr[s] * 1_000_000)
        }
        assert got == want

    def test_monotone_nesting_and_missing_stratum_dropped(self, spark):
        rows = [(i, "xyz"[i % 3]) for i in range(300)]
        df = spark.createDataFrame(rows, ["k", "s"])
        lo = {r.k for r in sample_by_hash(df, "k", "s", {"x": 0.1, "y": 0.2}).collect()}
        hi = {r.k for r in sample_by_hash(df, "k", "s", {"x": 0.4, "y": 0.2}).collect()}
        assert lo <= hi  # raising a rate only adds rows (same salt)
        # stratum 'z' listed in neither → never sampled
        assert all(k % 3 != 2 for k in hi)

    def test_partition_independent(self, spark):
        rows = [(i, "ab"[i % 2]) for i in range(400)]
        one = spark.createDataFrame(rows, ["k", "s"]).coalesce(1)
        many = spark.createDataFrame(rows, ["k", "s"]).repartition(16)
        fr = {"a": 0.25, "b": 0.5}
        assert {r.k for r in sample_by_hash(one, "k", "s", fr).collect()} == {
            r.k for r in sample_by_hash(many, "k", "s", fr).collect()
        }

    def test_invalid_fraction(self, spark):
        df = spark.createDataFrame([(1, "a")], ["k", "s"])
        with pytest.raises(ValueError):
            sample_by_hash(df, "k", "s", {"a": 1.5})


class TestMixtureSample:
    def _df(self, spark):
        rows = [(i, "web") for i in range(400)]
        rows += [(1000 + i, "books") for i in range(100)]
        rows += [(2000 + i, "code") for i in range(50)]
        return spark.createDataFrame(rows, ["k", "src"])

    def test_exact_proportions_binding_source_whole(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.packing import (
            mixture_sample,
        )

        df = self._df(spark)
        # shares 6:3:1 → T = min(400/0.6, 100/0.3, 50/0.1) = 333.3 (books
        # binding at 100/0.3) → books whole? no: T=333.3 ⇒ books rate
        # 0.3·333.3/100 = 1.0 (binding source taken whole).
        got = mixture_sample(df, "k", "src", {"web": 0.6, "books": 0.3, "code": 0.1})
        counts = {r.src: r.n for r in got.groupBy("src").agg(F.count("*").alias("n")).collect()}
        assert counts["books"] == 100  # binding source: taken whole
        # md5 sampling is binomial around the target; bounds are loose
        assert 170 <= counts["web"] <= 230      # target 200
        assert 20 <= counts["code"] <= 46       # target 33
        # unlisted sources dropped
        got2 = mixture_sample(df, "k", "src", {"books": 1.0})
        assert {r.src for r in got2.select("src").distinct().collect()} == {"books"}

    def test_deterministic_and_monotone_free(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.packing import (
            mixture_sample,
        )

        df = self._df(spark)
        a = {r.k for r in mixture_sample(df, "k", "src", {"web": 1.0, "books": 1.0}).collect()}
        b = {r.k for r in mixture_sample(df, "k", "src", {"web": 1.0, "books": 1.0}).collect()}
        assert a == b  # no RNG anywhere

    def test_missing_source_raises_by_default(self, spark):
        import pytest

        from threat_intelligence_knowledge_graph_spark.operators.packing import (
            mixture_sample,
        )

        df = self._df(spark)
        # a requested-but-absent source would silently skew the mixture:
        # default is to refuse, naming the missing sources
        with pytest.raises(ValueError, match="absent"):
            mixture_sample(df, "k", "src", {"web": 0.5, "absent": 0.5})
        # explicit opt-in renormalizes over the present sources
        got = mixture_sample(
            df, "k", "src", {"web": 0.5, "absent": 0.5},
            on_missing="renormalize",
        )
        assert got.filter("src = 'web'").count() == 400  # web binding, whole


class TestCurriculumOrder:
    def test_buckets_monotone_in_difficulty(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.packing import (
            curriculum_order,
        )

        # 200 docs, token count = (i % 40) + 1 → difficulties 1..40
        rows = [(i, " ".join(f"tk{j}" for j in range((i % 40) + 1))) for i in range(200)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = curriculum_order(df, n_buckets=4, sample_pct=50).collect()
        assert len(got) == 200
        assert {r.bucket for r in got} <= {1, 2, 3, 4}
        # monotone: a harder doc never lands in a lower bucket
        by_diff = sorted(got, key=lambda r: (r.difficulty, r.key))
        buckets = [r.bucket for r in by_diff]
        assert buckets == sorted(buckets)
        # equal difficulty → equal bucket (boundaries are value-based)
        seen = {}
        for r in got:
            assert seen.setdefault(r.difficulty, r.bucket) == r.bucket
        # with a 50% sample and 4 buckets each bucket is populated
        assert len({r.bucket for r in got}) == 4

    def test_determinism_and_tiny_input(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.packing import (
            curriculum_order,
        )

        rows = [(i, "aa bb cc"[: 2 + 3 * (i % 3)]) for i in range(20)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        a = {(r.key, r.bucket) for r in curriculum_order(df).collect()}
        b = {(r.key, r.bucket) for r in curriculum_order(df).collect()}
        assert a == b
        # n_buckets=1 → everything in bucket 1, no sampling stage
        one = curriculum_order(df, n_buckets=1).collect()
        assert {r.bucket for r in one} == {1}
        # empty input → empty output, no crash on the empty sample
        assert curriculum_order(df.filter("doc_id < 0")).count() == 0


class TestSplitOversized:
    def test_pieces_reconstruct_document(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.packing import (
            split_oversized,
        )

        text = " ".join(f"t{i}" for i in range(95))
        df = spark.createDataFrame([(1, text), (2, "short doc")], ["doc_id", "text"])
        got = split_oversized(df, 40).collect()
        by_doc = {}
        for r in sorted(got, key=lambda r: (r.doc_id, r.piece_idx)):
            by_doc.setdefault(r.doc_id, []).append(r)
        assert [r.n_tokens for r in by_doc[1]] == [40, 40, 15]
        assert " ".join(r.text for r in by_doc[1]) == text  # order-preserving
        assert len(by_doc[2]) == 1 and by_doc[2][0].n_tokens == 2

    def test_null_text_degrades_to_empty_piece(self, spark):
        """A NULL text must NOT silently vanish from the packing feed
        (review finding r4): it degrades to one empty piece."""
        from threat_intelligence_knowledge_graph_spark.operators.packing import (
            split_oversized,
        )

        df = spark.createDataFrame(
            [(1, None), (2, "a b c")], "doc_id long, text string"
        )
        got = {r.doc_id: (r.piece_idx, r.text, r.n_tokens) for r in split_oversized(df, 40).collect()}
        assert got[1] == (0, "", 1)  # present, empty-piece convention
        assert got[2] == (0, "a b c", 3)

    def test_feeds_packing_without_oversized_rows(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.packing import (
            pack_documents,
            split_oversized,
        )

        text = " ".join(f"t{i}" for i in range(95))
        df = spark.createDataFrame([(1, text), (2, "a b c")], ["doc_id", "text"])
        pieces = split_oversized(df, 40).withColumn(
            "piece_id", F.concat_ws("#", "doc_id", "piece_idx")
        )
        packed = pack_documents(pieces, 40, id_col="piece_id", tokens_col="n_tokens")
        stats = packed.groupBy("pack_id").agg(F.sum("n_tokens").alias("tok")).collect()
        assert all(r.tok <= 80 for r in stats)  # no pack driven over 2x budget
        assert packed.filter(F.col("n_tokens") > 40).count() == 0  # nothing oversized


class TestTemperatureMixture:
    ROWS = (
        [(i, "big") for i in range(400)]
        + [(i + 1000, "mid") for i in range(100)]
        + [(i + 2000, "rare") for i in range(25)]
    )

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, ["doc_id", "source"])

    def test_alpha_one_keeps_everything(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.packing import (
            temperature_mixture,
        )

        got = temperature_mixture(self._df(spark), "doc_id", "source", alpha=1.0)
        # natural proportions: every source binds, nothing is dropped
        assert got.count() == len(self.ROWS)

    def test_alpha_zero_equalizes(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.packing import (
            temperature_mixture,
        )

        got = temperature_mixture(
            self._df(spark), "doc_id", "source", alpha=0.0
        ).groupBy("source").count().collect()
        by_src = {r.source: r["count"] for r in got}
        # equal shares: the rare source (25) binds and is taken whole;
        # big/mid down-sample toward 25 (md5 draw → binomial jitter)
        assert by_src["rare"] == 25
        assert abs(by_src["big"] - 25) <= 15
        assert abs(by_src["mid"] - 25) <= 15

    def test_alpha_half_softens(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.packing import (
            temperature_mixture,
        )

        got = temperature_mixture(
            self._df(spark), "doc_id", "source", alpha=0.5
        ).groupBy("source").count().collect()
        by_src = {r.source: r["count"] for r in got}
        # sqrt shares 20:10:5 — rare binds (25/5 smallest), targets are
        # big=100, mid=50, rare=25
        assert by_src["rare"] == 25
        assert abs(by_src["big"] - 100) <= 25
        assert abs(by_src["mid"] - 50) <= 18
        # rebalanced: big's share of the output well below its 76% input
        total = sum(by_src.values())
        assert by_src["big"] / total < 0.65

    def test_deterministic_and_nested(self, spark):
        from threat_intelligence_knowledge_graph_spark.operators.packing import (
            temperature_mixture,
        )

        df = self._df(spark)
        a = {r.doc_id for r in temperature_mixture(df, "doc_id", "source").collect()}
        b = {r.doc_id for r in temperature_mixture(df, "doc_id", "source").collect()}
        assert a == b

    def test_empty_and_validation(self, spark):
        import pytest as _pytest

        from threat_intelligence_knowledge_graph_spark.operators.packing import (
            temperature_mixture,
        )

        empty = spark.createDataFrame([], "doc_id long, source string")
        assert temperature_mixture(empty, "doc_id", "source").count() == 0
        with _pytest.raises(ValueError, match="alpha"):
            temperature_mixture(self._df(spark), "doc_id", "source", alpha=1.5)
