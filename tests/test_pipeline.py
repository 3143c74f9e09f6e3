"""Pipeline-level tests: checkpoint/resume, idempotence, lineage/metrics."""

import pandas as pd
import pytest

from threat_intelligence_knowledge_graph_spark.datagen import transcripts_rows
from threat_intelligence_knowledge_graph_spark.plans.pipeline import run_pipeline
from threat_intelligence_knowledge_graph_spark.schemas import TRANSCRIPTS_SCHEMA
from threat_intelligence_knowledge_graph_spark.sources.tableio import LocalTableCatalog


@pytest.fixture()
def transcripts(spark):
    return spark.createDataFrame(
        pd.DataFrame(transcripts_rows(10)), schema=TRANSCRIPTS_SCHEMA
    )


def _triples(spark, catalog):
    return {
        (r.subj, r.pred, r.obj) for r in catalog.read(spark, "triples").collect()
    }


class TestPipeline:
    def test_end_to_end(self, spark, transcripts, tmp_path):
        catalog = LocalTableCatalog(str(tmp_path / "wh"))
        result = run_pipeline(spark, transcripts, catalog, run_id="r1")
        assert result.counts["documents"] == 10
        assert result.counts["triples"] > 0
        assert result.counts["nodes"] > result.counts["triples"] * 0  # exists
        # Every stage left lineage rows.
        stages = {
            r.stage for r in catalog.read(spark, "metrics").collect()
        }
        assert {"reassemble", "extract"} <= stages

    def test_rerun_is_idempotent(self, spark, transcripts, tmp_path):
        catalog = LocalTableCatalog(str(tmp_path / "wh"))
        run_pipeline(spark, transcripts, catalog, run_id="r1")
        before = _triples(spark, catalog)
        nodes_before = catalog.read(spark, "nodes").count()
        #

        # Re-run same run_id: every stage committed → all skipped, tables
        # unchanged (resume path).
        run_pipeline(spark, transcripts, catalog, run_id="r1")
        assert _triples(spark, catalog) == before
        assert catalog.read(spark, "nodes").count() == nodes_before

        # Fresh run_id over same input: stages recompute, MERGE upserts →
        # content still identical (MERGE idempotence, reference
        # neo4j_store.py:126-164 semantics).
        run_pipeline(spark, transcripts, catalog, run_id="r2")
        assert _triples(spark, catalog) == before
        assert catalog.read(spark, "nodes").count() == nodes_before

    def test_resume_skips_committed_stages(self, spark, transcripts, tmp_path):
        catalog = LocalTableCatalog(str(tmp_path / "wh"))
        run_pipeline(spark, transcripts, catalog, run_id="r1")
        log_before = catalog.log("extraction")
        run_pipeline(spark, transcripts, catalog, run_id="r1")
        # No new extraction snapshot was written on resume.
        assert catalog.log("extraction") == log_before

    def test_incremental_merge_union(self, spark, tmp_path):
        """Two disjoint corpus halves merged incrementally == one-shot run."""
        catalog = LocalTableCatalog(str(tmp_path / "inc"))
        rows = transcripts_rows(8)
        half1 = [r for r in rows if int(r["conv_id"][-2:]) < 4]
        half2 = [r for r in rows if int(r["conv_id"][-2:]) >= 4]
        df1 = spark.createDataFrame(pd.DataFrame(half1), schema=TRANSCRIPTS_SCHEMA)
        df2 = spark.createDataFrame(pd.DataFrame(half2), schema=TRANSCRIPTS_SCHEMA)
        full = spark.createDataFrame(pd.DataFrame(rows), schema=TRANSCRIPTS_SCHEMA)

        run_pipeline(spark, df1, catalog, run_id="h1")
        run_pipeline(spark, df2, catalog, run_id="h2")
        inc = _triples(spark, catalog)

        catalog2 = LocalTableCatalog(str(tmp_path / "full"))
        run_pipeline(spark, full, catalog2, run_id="f")
        assert inc == _triples(spark, catalog2)


class TestTableIO:
    def test_merge_upsert(self, spark, tmp_path):
        catalog = LocalTableCatalog(str(tmp_path / "t"))
        df1 = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
        catalog.merge(spark, df1, "t1", keys=["k"])
        df2 = spark.createDataFrame([("b", 20), ("c", 3)], ["k", "v"])
        catalog.merge(spark, df2, "t1", keys=["k"])
        got = {(r.k, r.v) for r in catalog.read(spark, "t1").collect()}
        assert got == {("a", 1), ("b", 20), ("c", 3)}  # new wins on match

    def test_compact_rewrites_layout_not_content(self, spark, tmp_path):
        import os

        catalog = LocalTableCatalog(str(tmp_path / "t"))
        # Accrete a fragmented table: 32-partition write → many files.
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(2000)], ["k", "v"]
        ).repartition(32)
        catalog.overwrite(df, "t1", run_id="r", stage="load")
        before = {(r.k, r.v) for r in catalog.read(spark, "t1").collect()}

        written = catalog.compact(spark, "t1", target_file_bytes=1 << 30)
        assert written == 1  # tiny table → single file
        snap_dir = catalog._snap_dir("t1", catalog.log("t1")[-1]["snapshot"])
        n_parquet = sum(
            1 for f in os.listdir(snap_dir) if f.endswith(".parquet")
        )
        assert n_parquet == 1
        # Content bit-identical; commit log records the rewrite; the
        # original stage commit is still resumable (committed() true).
        assert {(r.k, r.v) for r in catalog.read(spark, "t1").collect()} == before
        assert catalog.log("t1")[-1]["operation"] == "compact"
        assert catalog.committed("t1", "r", "load")
        # vacuum reclaims the fragmented layout
        removed = catalog.vacuum("t1", keep_last=1)
        assert removed and catalog.read(spark, "t1").count() == 2000

    def test_time_travel_read(self, spark, tmp_path):
        catalog = LocalTableCatalog(str(tmp_path / "tt"))
        catalog.overwrite(
            spark.createDataFrame([("a", 1)], ["k", "v"]), "t", run_id="r0"
        )
        catalog.append(
            spark.createDataFrame([("b", 2)], ["k", "v"]), "t", run_id="r1"
        )
        catalog.merge(
            spark,
            spark.createDataFrame([("a", 10)], ["k", "v"]),
            "t",
            keys=["k"],
            run_id="r2",
        )
        states = {
            0: {("a", 1)},
            1: {("a", 1), ("b", 2)},
            2: {("a", 10), ("b", 2)},
        }
        for snap, exp in states.items():
            got = {
                (r.k, r.v)
                for r in catalog.read(spark, "t", as_of_snapshot=snap).collect()
            }
            assert got == exp, snap
        # as-of between commits resolves to the newest not-newer snapshot
        assert catalog.read(spark, "t", as_of_snapshot=99).count() == 2
        import pytest as _pytest

        with _pytest.raises(FileNotFoundError):
            catalog.read(spark, "t", as_of_snapshot=-1)

    def test_snapshot_diff(self, spark, tmp_path):
        catalog = LocalTableCatalog(str(tmp_path / "cdf"))
        catalog.overwrite(
            spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"]),
            "t",
            run_id="r0",
        )
        catalog.append(
            spark.createDataFrame([("c", 3)], ["k", "v"]), "t", run_id="r1"
        )
        catalog.merge(
            spark,
            spark.createDataFrame([("a", 10)], ["k", "v"]),
            "t",
            keys=["k"],
            run_id="r2",
        )
        # append interval: the diff IS the appended row
        got = {
            (r._change, r.k, r.v)
            for r in catalog.diff(spark, "t", 0, 1).collect()
        }
        assert got == {("insert", "c", 3)}
        # merge interval without keys: raw insert/delete pair
        got = {
            (r._change, r.k, r.v)
            for r in catalog.diff(spark, "t", 1, 2).collect()
        }
        assert got == {("insert", "a", 10), ("delete", "a", 1)}
        # with keys: the pair reclassifies as an update
        got = {
            (r._change, r.k, r.v)
            for r in catalog.diff(spark, "t", 1, 2, key_cols=["k"]).collect()
        }
        assert got == {("update_post", "a", 10), ("update_pre", "a", 1)}
        # full interval to the head (to_snapshot omitted)
        got = {
            (r._change, r.k, r.v)
            for r in catalog.diff(spark, "t", 0, key_cols=["k"]).collect()
        }
        assert got == {
            ("insert", "c", 3),
            ("update_post", "a", 10),
            ("update_pre", "a", 1),
        }
        # identical states → empty diff
        assert catalog.diff(spark, "t", 2).count() == 0

    def test_time_travel_bounded_by_vacuum(self, spark, tmp_path):
        import pytest as _pytest

        catalog = LocalTableCatalog(str(tmp_path / "ttv"))
        for i in range(4):
            catalog.overwrite(
                spark.createDataFrame([(i,)], ["v"]), "t", run_id=f"r{i}"
            )
        catalog.vacuum("t", keep_last=1)
        assert catalog.read(spark, "t", as_of_snapshot=3).collect()[0].v == 3
        with _pytest.raises(FileNotFoundError, match="vacuum"):
            catalog.read(spark, "t", as_of_snapshot=1)

    def test_audit_graph_tables(self, spark, tmp_path):
        """Clean warehouse passes every invariant; a planted duplicate/
        null violation is detected and recorded in metrics."""
        from threat_intelligence_knowledge_graph_spark.datagen import (
            generate_transcripts_df,
        )
        from threat_intelligence_knowledge_graph_spark.plans.pipeline import (
            audit_graph_tables,
            run_pipeline,
        )

        catalog = LocalTableCatalog(str(tmp_path / "wh"))
        t = generate_transcripts_df(spark, 30)
        run_pipeline(spark, t, catalog, run_id="a", fused=True)
        audit = audit_graph_tables(spark, catalog, run_id="a")
        assert all(r.passed for r in audit.collect())
        # audit rows merged into metrics as stage='audit'
        m = catalog.read(spark, "metrics").filter("stage = 'audit'")
        assert m.count() == audit.count()
        assert {r.value for r in m.collect()} == {0}

        # Plant a duplicate triple + a null endpoint → audit must fail.
        bad = catalog.read(spark, "triples").limit(1).union(
            spark.createDataFrame(
                [(None, "X", "y")], "subj string, pred string, obj string"
            )
        )
        snap = catalog.read(spark, "triples").union(bad)
        catalog.overwrite(snap, "triples", run_id="b", stage="tamper")
        audit2 = {
            (r["table"], r["check"]): r["passed"]
            for r in audit_graph_tables(spark, catalog).collect()
        }
        assert audit2[("triples", "unique(subj,pred,obj)")] is False
        assert audit2[("triples", "not_null(subj)")] is False
        # The planted row's pred 'X' is no rule's predicate and its null
        # subj resolves to no node → domain/range conformance trips too,
        # while the clean run above passed it (asserted via `all(passed)`).
        assert audit2[("triples", "schema_conformance")] is False

    def test_compact_sorted_rewrite(self, spark, tmp_path):
        catalog = LocalTableCatalog(str(tmp_path / "t"))
        df = spark.createDataFrame(
            [(i % 7, i) for i in range(500)], ["bucket", "v"]
        ).repartition(16)
        catalog.overwrite(df, "t1")
        before = {(r.bucket, r.v) for r in catalog.read(spark, "t1").collect()}
        catalog.compact(
            spark, "t1", target_file_bytes=1 << 30, sort_cols=["bucket"]
        )
        assert {
            (r.bucket, r.v) for r in catalog.read(spark, "t1").collect()
        } == before

    def test_snapshot_history(self, spark, tmp_path):
        catalog = LocalTableCatalog(str(tmp_path / "t"))
        df = spark.createDataFrame([(1,)], ["x"])
        catalog.overwrite(df, "t2", run_id="r", stage="s")
        catalog.overwrite(df, "t2", run_id="r", stage="s2")
        log = catalog.log("t2")
        assert [e["snapshot"] for e in log] == [0, 1]
        assert catalog.committed("t2", "r", "s")
        assert not catalog.committed("t2", "other", "s")


class TestCanonicalizePipeline:
    def test_alias_layer_keeps_graph_valid(self, spark, transcripts, tmp_path):
        catalog = LocalTableCatalog(str(tmp_path / "canon"))
        base = LocalTableCatalog(str(tmp_path / "base"))
        run_pipeline(spark, transcripts, base, run_id="r", fused=True)
        run_pipeline(
            spark, transcripts, catalog, run_id="r", fused=True, canonicalize=True
        )
        raw = base.read(spark, "triples").count()
        canon = catalog.read(spark, "triples").count()
        # Canonicalization can only merge — never invent — triples.
        assert 0 < canon <= raw
        assert catalog.exists("canonical_map")
        # Conservative threshold on exact-canonical NER ids: distinct
        # domains that differ by one char must NOT have merged.
        alias = {r.node_id: r.canonical_id for r in catalog.read(spark, "canonical_map").collect()}
        for a, b in alias.items():
            assert a.split("_")[0] == b.split("_")[0]  # same type prefix


class TestIncremental:
    def test_daily_increments_equal_full_run(self, spark, tmp_path):
        from threat_intelligence_knowledge_graph_spark.plans.pipeline import (
            run_incremental,
        )

        rows = transcripts_rows(8)
        day1 = [r for r in rows if int(r["conv_id"][-2:]) < 5]
        # Day 2 feed REPLAYS day-1 conversations plus the new ones.
        df1 = spark.createDataFrame(pd.DataFrame(day1), schema=TRANSCRIPTS_SCHEMA)
        dfall = spark.createDataFrame(pd.DataFrame(rows), schema=TRANSCRIPTS_SCHEMA)

        catalog = LocalTableCatalog(str(tmp_path / "incr"))
        run_incremental(spark, df1, catalog, run_id="day1")
        r2 = run_incremental(spark, dfall, catalog, run_id="day2")

        full = LocalTableCatalog(str(tmp_path / "full"))
        run_pipeline(spark, dfall, full, run_id="f", fused=True)
        assert _triples(spark, catalog) == _triples(spark, full)
        assert r2.counts["triples"] == full.read(spark, "triples").count()

        # Third increment with a pure replay: nothing changes.
        r3 = run_incremental(spark, dfall, catalog, run_id="day3")
        assert r3.counts["triples"] == r2.counts["triples"]


class TestVacuum:
    def test_vacuum_keeps_latest_readable(self, spark, tmp_path):
        catalog = LocalTableCatalog(str(tmp_path / "v"))
        for i in range(4):
            catalog.overwrite(
                spark.createDataFrame([(i,)], ["x"]), "t", run_id=f"r{i}", stage="s"
            )
        removed = catalog.vacuum("t", keep_last=2)
        assert removed == [0, 1]
        assert catalog.read(spark, "t").first().x == 3  # latest intact
        assert len(catalog.log("t")) == 4  # history preserved


class TestAppendSnapshots:
    """Fast append (Iceberg append-manifest analog): per-batch writes,
    chain-aware reads, compaction materializes, vacuum never tears a
    live chain."""

    def test_append_accumulates_without_rewrite(self, spark, tmp_path):
        import os

        catalog = LocalTableCatalog(str(tmp_path / "a"))
        for i in range(3):
            catalog.append(
                spark.createDataFrame([(i, f"v{i}")], ["k", "v"]),
                "t", run_id=f"b{i}", stage="ingest",
            )
        got = {(r.k, r.v) for r in catalog.read(spark, "t").collect()}
        assert got == {(0, "v0"), (1, "v1"), (2, "v2")}
        # Each append snapshot dir holds ONLY its batch (no rewrite):
        # every batch here is 1 row; a rewriting append would put all
        # accumulated rows in the newest dir.
        last = catalog.log("t")[-1]
        assert last["operation"] == "append" and last["parent"] == 1
        last_dir = catalog._snap_dir("t", last["snapshot"])
        assert spark.read.parquet(last_dir).count() == 1

    def test_vacuum_preserves_live_append_chain(self, spark, tmp_path):
        catalog = LocalTableCatalog(str(tmp_path / "a"))
        for i in range(3):
            catalog.append(
                spark.createDataFrame([(i,)], ["x"]), "t", run_id=f"b{i}", stage="s"
            )
        # keep_last=1: the head is an append whose chain reaches back to
        # snapshot 0 — nothing is reclaimable yet.
        assert catalog.vacuum("t", keep_last=1) == []
        assert catalog.read(spark, "t").count() == 3
        # compact materializes; now the old chain is dead and reclaimed
        catalog.compact(spark, "t", target_file_bytes=1 << 30)
        removed = catalog.vacuum("t", keep_last=1)
        assert removed == [0, 1, 2]
        assert {r.x for r in catalog.read(spark, "t").collect()} == {0, 1, 2}

    def test_compacted_minhash_index_identical_pairs(self, spark, tmp_path):
        """The ingest-path maintenance story end-to-end: band index
        appended per batch, compacted, vacuumed — incremental pairs
        identical before and after compaction."""
        from threat_intelligence_knowledge_graph_spark.operators.dedup import (
            minhash_band_index,
            minhash_incremental_near_duplicates,
        )

        text = "alpha beta gamma delta epsilon zeta eta theta " * 3
        b0 = spark.createDataFrame([(1, text), (2, "unrelated words only here")], ["doc_id", "text"])
        b1 = spark.createDataFrame([(3, text)], ["doc_id", "text"])
        b2 = spark.createDataFrame([(4, text)], ["doc_id", "text"])

        catalog = LocalTableCatalog(str(tmp_path / "ix"))
        catalog.append(minhash_band_index(b0), "minhash_index", run_id="b0", stage="index")
        corpus = b0
        _p, idx_rows, _d = minhash_incremental_near_duplicates(
            corpus, catalog.read(spark, "minhash_index"), b1
        )
        catalog.append(idx_rows, "minhash_index", run_id="b1", stage="index")
        corpus = corpus.unionByName(b1)

        before = {
            (r.a, r.b)
            for r in minhash_incremental_near_duplicates(
                corpus, catalog.read(spark, "minhash_index"), b2
            )[0].collect()
        }
        assert before == {(1, 4), (3, 4)}  # new×old pairs only
        catalog.compact(spark, "minhash_index", target_file_bytes=1 << 30)
        catalog.vacuum("minhash_index", keep_last=1)
        after = {
            (r.a, r.b)
            for r in minhash_incremental_near_duplicates(
                corpus, catalog.read(spark, "minhash_index"), b2
            )[0].collect()
        }
        assert after == before


class TestCrashWindowResume:
    def test_metrics_gap_recomputed_on_resume(self, spark, transcripts, tmp_path):
        """Crash between a stage's data commit and its metrics commit must
        not skip the stage on resume (review finding): the gate requires
        BOTH commits."""
        from threat_intelligence_knowledge_graph_spark.operators.reassembly import (
            reassemble,
        )

        catalog = LocalTableCatalog(str(tmp_path / "crash"))
        # Simulate the crash: data snapshot committed, metrics never merged.
        catalog.overwrite(
            reassemble(transcripts), "documents", run_id="r1", stage="reassemble"
        )
        assert not catalog.exists("metrics")

        run_pipeline(spark, transcripts, catalog, run_id="r1")
        stages = {r.stage for r in catalog.read(spark, "metrics").collect()}
        assert "reassemble" in stages  # lineage recovered, not lost forever
