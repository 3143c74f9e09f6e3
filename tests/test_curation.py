"""Composed curation plan: every stage must bite on the planted corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.plans.curation import (
    curate_documents,
)

# Three DISTINCT prose bases (high stopword density for quality/lang,
# near-disjoint shingle sets so only the planted near-dup pair merges).
PROSE_A = (
    "the cat and the dog went to the house with a friend and they saw "
    "the bird in a tree by the water and it was a good day for all of them"
)
PROSE_B = (
    "a ship was in the harbor for the night and the crew held a watch "
    "on the deck while the captain read from a log of the voyage so far"
)
PROSE_C = (
    "it is a quiet town where the baker opens at dawn and the mill by "
    "the river turns as the farmers bring in the grain for the market"
)


def _corpus(spark):
    rows = [
        (1, PROSE_A + " extra alpha"),             # survives everything
        (2, PROSE_A + " extra beta"),              # near-dup of 1 (dropped)
        (3, "...!!!,,,;;;!!!"),                    # punct soup → quality drop
        (4, "el la los de que y en un una por con para el la de que y en"),  # es
        (5, PROSE_B),                              # survives
        (6, PROSE_B),                              # exact dup of 5 (dropped)
        (7, PROSE_C + " holdout secret evaluation phrase nine"),  # contaminated
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestCurateDocuments:
    def test_stage_metrics_and_survivors(self, spark):
        ev = spark.createDataFrame(
            [(0, "holdout secret evaluation phrase")], ["eval_id", "text"]
        )
        curated, metrics = curate_documents(
            _corpus(spark),
            ev,
            min_quality=0.3,
            languages=("en",),
            near_dup_threshold=0.8,
            decontaminate_n=3,
            token_budget=40,
        )
        m = {r.stage: r.n_docs for r in metrics.collect()}
        assert m == {
            "input": 7,
            "quality": 6,       # -3 (punct soup)
            "language": 5,      # -4 (spanish)
            "exact_dedup": 4,   # -6 (exact dup of 5)
            "near_dedup": 3,    # -2 (near-dup of 1)
            "decontaminate": 2, # -7 (shares eval 3-grams)
        }
        got = {r.doc_id: r for r in curated.collect()}
        assert set(got) == {1, 5}
        for r in got.values():
            assert r.lang_pred == "en"
            assert r.quality >= 0.3
            assert r.split in ("train", "val")
            assert r.n_tokens > 0
            assert r.pack_id >= 0

    def test_stage_order_in_metrics(self, spark):
        curated, metrics = curate_documents(
            _corpus(spark), None, token_budget=None
        )
        rows = sorted(metrics.collect(), key=lambda r: r.stage_idx)
        assert [r.stage for r in rows] == [
            "input", "quality", "language", "exact_dedup", "near_dedup",
        ]
        # counts are monotone non-increasing through the funnel
        counts = [r.n_docs for r in rows]
        assert counts == sorted(counts, reverse=True)
        assert "pack_id" not in curated.columns  # packing disabled

    def test_packing_is_per_split_sharded(self, spark):
        curated, _ = curate_documents(
            _corpus(spark), None, min_quality=0.0, token_budget=10
        )
        plan = curated._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan


class TestCurateIncrement:
    def test_two_batch_reasons_and_equivalence(self, spark, tmp_path):
        """Batch 2 exercises every reject reason against batch 1's
        committed corpus; incremental content equals batch-mode
        curation of the union (monotone-id feeds)."""
        from threat_intelligence_knowledge_graph_spark.plans.curation import (
            curate_increment,
        )
        from threat_intelligence_knowledge_graph_spark.sources.tableio import (
            LocalTableCatalog,
        )

        ev = spark.createDataFrame(
            [(900, "holdout secret evaluation phrase nine ten eleven twelve "
                   "thirteen fourteen fifteen sixteen")],
            ["eval_id", "text"],
        )
        catalog = LocalTableCatalog(str(tmp_path / "cur"))

        b1 = spark.createDataFrame(
            [(1, PROSE_A + " extra alpha"), (5, PROSE_B)], ["doc_id", "text"]
        )
        acc1, rej1 = curate_increment(spark, b1, catalog, ev, run_id="b1")
        assert {r.doc_id for r in acc1.collect()} == {1, 5}
        assert rej1.count() == 0

        b2 = spark.createDataFrame(
            [
                (11, PROSE_A + " extra beta"),   # near-dup of committed 1
                (12, "...!!!,,,;;;!!!"),         # quality
                (13, "el la los de que y en un una por con para el la de que y en"),
                (14, PROSE_B),                   # exact dup of committed 5
                (15, PROSE_C + " holdout secret evaluation phrase nine ten "
                     "eleven twelve thirteen"),  # contaminated
                (16, PROSE_C + " fresh tail words here"),  # survives
            ],
            ["doc_id", "text"],
        )
        acc2, rej2 = curate_increment(spark, b2, catalog, ev, run_id="b2")
        assert {r.doc_id for r in acc2.collect()} == {16}
        reasons = {r.doc_id: r.reason for r in rej2.collect()}
        assert reasons == {
            11: "near_dup",
            12: "quality",
            13: "language",
            14: "exact_dup",
            15: "contaminated",
        }

        # committed corpus + index grew append-only and are readable
        cur = catalog.read(spark, "curated")
        assert {r.doc_id for r in cur.collect()} == {1, 5, 16}
        assert catalog.read(spark, "curated_minhash_index").count() > 0

        # equivalence with batch-mode curation over the union
        from threat_intelligence_knowledge_graph_spark.plans.curation import (
            curate_documents,
        )

        union = b1.unionByName(b2)
        batch, _m = curate_documents(
            union, ev.select(F.col("eval_id"), "text"), token_budget=None
        )
        assert {r.doc_id for r in batch.collect()} == {1, 5, 16}

    def test_transitive_near_dup_chain_collapses(self, spark, tmp_path):
        """Near-dup similarity chains (J(a,c), J(b,c) >= t, J(a,b) < t)
        must collapse to ONE survivor like batch mode — a direct-pair
        drop would admit the chain's middle member (review finding r4)."""
        from threat_intelligence_knowledge_graph_spark.plans.curation import (
            curate_increment,
        )
        from threat_intelligence_knowledge_graph_spark.sources.tableio import (
            LocalTableCatalog,
        )

        catalog = LocalTableCatalog(str(tmp_path / "cur"))
        # 60-word base; c differs from a in the LAST 5 words, b differs
        # from c in the FIRST 5: J(a,c)=J(b,c)=53/63≈0.84 (>=0.8, and
        # high enough for certain LSH candidacy) while J(a,b)=43/73≈0.59
        # (<0.8) — a genuine chain, not a clique.
        base = [f"w{i}" for i in range(60)]
        doc_a = " ".join(base)
        doc_c = " ".join(base[:55] + [f"x{i}" for i in range(5)])
        doc_b = " ".join([f"y{i}" for i in range(5)] + base[5:55] + [f"x{i}" for i in range(5)])
        acc1, _ = curate_increment(
            spark,
            spark.createDataFrame([(1, doc_a)], ["doc_id", "text"]),
            catalog, None, run_id="b1", min_quality=0.0,
        )
        assert {r.doc_id for r in acc1.collect()} == {1}
        acc2, rej2 = curate_increment(
            spark,
            spark.createDataFrame([(12, doc_b), (13, doc_c)], ["doc_id", "text"]),
            catalog, None, run_id="b2", min_quality=0.0,
        )
        # c chains to corpus doc 1 and to b: the whole component
        # collapses onto the existing min (1) — NOTHING admitted.
        assert acc2.count() == 0
        assert {r.doc_id: r.reason for r in rej2.collect()} == {
            12: "near_dup", 13: "near_dup"
        }

    def test_duplicate_of_contaminated_doc_rejected(self, spark, tmp_path):
        """Batch mode dedups BEFORE decontamination, so a later copy (or
        near-dup) of a contaminated doc is dropped as a duplicate even
        though the contaminated doc itself never enters the corpus. The
        shadow table reproduces that (advisor finding r4: without it the
        copy was silently admitted)."""
        from threat_intelligence_knowledge_graph_spark.plans.curation import (
            curate_documents,
            curate_increment,
        )
        from threat_intelligence_knowledge_graph_spark.sources.tableio import (
            LocalTableCatalog,
        )

        poison = (PROSE_A + " holdout secret evaluation phrase nine ten "
                  "eleven twelve thirteen")
        ev = spark.createDataFrame(
            [(900, "holdout secret evaluation phrase nine ten eleven twelve "
                   "thirteen fourteen fifteen sixteen")],
            ["eval_id", "text"],
        )
        catalog = LocalTableCatalog(str(tmp_path / "cur"))
        b1 = spark.createDataFrame([(1, poison)], ["doc_id", "text"])
        acc1, rej1 = curate_increment(spark, b1, catalog, ev, run_id="b1")
        assert acc1.count() == 0
        assert {r.reason for r in rej1.collect()} == {"contaminated"}

        b2 = spark.createDataFrame(
            [(11, poison),                       # exact copy of rejected 1
             (12, poison + " slightly longer")], # near-dup of rejected 1
            ["doc_id", "text"],
        )
        acc2, rej2 = curate_increment(spark, b2, catalog, ev, run_id="b2")
        assert acc2.count() == 0
        assert {r.doc_id: r.reason for r in rej2.collect()} == {
            11: "exact_dup", 12: "near_dup"
        }
        # matches batch mode over the union: nothing survives
        batch, _m = curate_documents(
            b1.unionByName(b2), ev, token_budget=None
        )
        assert batch.count() == 0

    def test_chain_through_rejected_doc_across_batches(self, spark, tmp_path):
        """A near-dup chain 1–3–2 whose middle (3) was rejected in an
        earlier batch must still collapse doc 2 in a later batch: the
        pairs table carries the historical duplicate graph, and the
        shadow keeps 3's bands/text queryable."""
        from threat_intelligence_knowledge_graph_spark.plans.curation import (
            curate_documents,
            curate_increment,
        )
        from threat_intelligence_knowledge_graph_spark.sources.tableio import (
            LocalTableCatalog,
        )

        base = [f"w{i}" for i in range(60)]
        doc_1 = " ".join(base)
        doc_3 = " ".join(base[:55] + [f"x{i}" for i in range(5)])
        doc_2 = " ".join([f"y{i}" for i in range(5)] + base[5:55] + [f"x{i}" for i in range(5)])
        catalog = LocalTableCatalog(str(tmp_path / "cur"))
        b1 = spark.createDataFrame([(1, doc_1), (3, doc_3)], ["doc_id", "text"])
        acc1, rej1 = curate_increment(
            spark, b1, catalog, None, run_id="b1", min_quality=0.0
        )
        assert {r.doc_id for r in acc1.collect()} == {1}
        assert {r.doc_id: r.reason for r in rej1.collect()} == {3: "near_dup"}

        # doc 2 near-dups ONLY the rejected doc 3 (J(1,2) < 0.8): batch
        # mode puts it in component {1,2,3} and keeps only 1.
        b2 = spark.createDataFrame([(22, doc_2)], ["doc_id", "text"])
        acc2, rej2 = curate_increment(
            spark, b2, catalog, None, run_id="b2", min_quality=0.0
        )
        assert acc2.count() == 0
        assert {r.doc_id: r.reason for r in rej2.collect()} == {22: "near_dup"}
        batch, _m = curate_documents(
            b1.unionByName(b2), None, min_quality=0.0, token_budget=None
        )
        assert {r.doc_id for r in batch.collect()} == {1}

    def test_crash_between_appends_is_resumable(self, spark, tmp_path):
        """The four warehouse appends are not atomic: simulate a crash
        right after the FIRST (corpus) append, then rerun the batch with
        the same run_id — the rerun must compute against the pre-run
        state (not its own partial output, which would tag every doc
        exact_dup) and fill in the missing index/shadow/pairs commits,
        leaving exactly the state of an uncrashed run."""
        from threat_intelligence_knowledge_graph_spark.plans.curation import (
            curate_increment,
        )
        from threat_intelligence_knowledge_graph_spark.sources.tableio import (
            LocalTableCatalog,
        )

        catalog = LocalTableCatalog(str(tmp_path / "cur"))
        b1 = spark.createDataFrame(
            [(1, PROSE_A + " alpha"), (2, PROSE_B)], ["doc_id", "text"]
        )
        curate_increment(spark, b1, catalog, None, run_id="b1")

        b2 = spark.createDataFrame(
            [(11, PROSE_A + " beta"),            # near-dup of committed 1
             (12, PROSE_C + " fresh tail")],     # accepted
            ["doc_id", "text"],
        )

        class Boom(RuntimeError):
            pass

        real_append = catalog.append
        calls = {"n": 0}

        def crashing_append(df, name, run_id="", stage=""):
            calls["n"] += 1
            if calls["n"] > 1:
                raise Boom("simulated crash after the corpus append")
            real_append(df, name, run_id=run_id, stage=stage)

        catalog.append = crashing_append
        import pytest

        with pytest.raises(Boom):
            curate_increment(spark, b2, catalog, None, run_id="b2")
        catalog.append = real_append
        # partial state on disk: corpus committed, the other three not
        assert catalog.committed("curated", "b2", "curate")
        assert not catalog.committed("curated_minhash_index", "b2", "index")

        acc, rej = curate_increment(spark, b2, catalog, None, run_id="b2")
        assert {r.doc_id for r in acc.collect()} == {12}
        assert {r.doc_id: r.reason for r in rej.collect()} == {11: "near_dup"}
        # every stage committed exactly once; corpus has no duplicate rows
        log = catalog.log("curated")
        assert sum(1 for e in log if e["run_id"] == "b2") == 1
        cur = catalog.read(spark, "curated")
        assert sorted(r.doc_id for r in cur.collect()) == [1, 2, 12]
        assert catalog.committed("curated_minhash_index", "b2", "index")
        assert catalog.committed("curated_pairs", "b2", "pairs")
        # a third batch still dedups correctly against the healed index
        b3 = spark.createDataFrame([(21, PROSE_C + " fresh tail")], ["doc_id", "text"])
        acc3, rej3 = curate_increment(spark, b3, catalog, None, run_id="b3")
        assert acc3.count() == 0
        assert {r.reason for r in rej3.collect()} == {"exact_dup"}

    def test_first_batch_internal_dedup(self, spark, tmp_path):
        from threat_intelligence_knowledge_graph_spark.plans.curation import (
            curate_increment,
        )
        from threat_intelligence_knowledge_graph_spark.sources.tableio import (
            LocalTableCatalog,
        )

        catalog = LocalTableCatalog(str(tmp_path / "cur"))
        b = spark.createDataFrame(
            [(1, PROSE_A + " one"), (2, PROSE_A + " two"), (3, PROSE_A + " one")],
            ["doc_id", "text"],
        )
        acc, rej = curate_increment(spark, b, catalog, None, run_id="b1")
        assert {r.doc_id for r in acc.collect()} == {1}
        reasons = {r.doc_id: r.reason for r in rej.collect()}
        assert reasons == {2: "near_dup", 3: "exact_dup"}

    def test_default_run_id_is_batch_fingerprint(self, spark, tmp_path):
        """run_id=None derives a content fingerprint: a SECOND,
        different batch under the default must be admitted against the
        first batch's corpus (not resume-excluded into recomputing vs
        the empty pre-batch-1 state and skipping its appends — the
        footgun of a constant default id), while a rerun of the SAME
        batch resumes idempotently."""
        from threat_intelligence_knowledge_graph_spark.plans.curation import (
            batch_run_id,
            curate_increment,
        )
        from threat_intelligence_knowledge_graph_spark.sources.tableio import (
            LocalTableCatalog,
        )

        catalog = LocalTableCatalog(str(tmp_path / "cur"))
        b1 = spark.createDataFrame([(1, PROSE_A + " one")], ["doc_id", "text"])
        # same content, different ids → different fingerprint; shuffled
        # partitioning → same fingerprint (XOR is order-independent)
        assert batch_run_id(b1) == batch_run_id(b1.repartition(7))
        b1_shift = spark.createDataFrame(
            [(101, PROSE_A + " one")], ["doc_id", "text"]
        )
        assert batch_run_id(b1) != batch_run_id(b1_shift)

        acc1, _ = curate_increment(spark, b1, catalog, None)
        assert acc1.count() == 1
        # different batch, default run id: its exact copy of committed
        # content must be REJECTED (the constant-id bug admitted it)
        acc2, rej2 = curate_increment(spark, b1_shift, catalog, None)
        assert acc2.count() == 0
        assert {r.reason for r in rej2.collect()} == {"exact_dup"}
        assert catalog.read(spark, "curated").count() == 1
        # rerun of batch 1 itself under the default: resumes, no growth
        acc1r, _ = curate_increment(spark, b1, catalog, None)
        assert acc1r.count() == 1
        assert catalog.read(spark, "curated").count() == 1
