"""Structured Streaming tests: foreachBatch KG sink + windowed mentions."""

import os

import pandas as pd
import pytest

from threat_intelligence_knowledge_graph_spark.datagen import transcripts_rows
from threat_intelligence_knowledge_graph_spark.oracle import oracle_triples
from threat_intelligence_knowledge_graph_spark.operators.reassembly import TURN_SEPARATOR
from threat_intelligence_knowledge_graph_spark.schemas import TRANSCRIPTS_SCHEMA
from threat_intelligence_knowledge_graph_spark.sources.tableio import LocalTableCatalog
from threat_intelligence_knowledge_graph_spark.streaming.stream_extract import (
    stream_extract,
    windowed_mention_counts,
)


@pytest.fixture()
def corpus_dir(spark, tmp_path):
    """Transcripts written as several parquet files (streaming micro-batches);
    each file holds whole conversations."""
    rows = transcripts_rows(12)
    path = str(tmp_path / "stream_in")
    for shard in range(3):
        shard_rows = [r for r in rows if int(r["conv_id"][-2:]) % 3 == shard]
        spark.createDataFrame(
            pd.DataFrame(shard_rows), schema=TRANSCRIPTS_SCHEMA
        ).coalesce(1).write.mode("append").parquet(path)
    return path, rows


class TestStreamExtract:
    def test_stream_matches_oracle(self, spark, corpus_dir, tmp_path):
        path, rows = corpus_dir
        catalog = LocalTableCatalog(str(tmp_path / "wh"))
        q = stream_extract(
            spark, path, str(tmp_path / "ckpt"), catalog, available_now=True
        )
        q.awaitTermination(300)

        docs = {}
        for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
            docs.setdefault(r["conv_id"], []).append(r["text"])
        golden = oracle_triples(
            [(cid, TURN_SEPARATOR.join(ts)) for cid, ts in sorted(docs.items())]
        )
        got = {
            (r.subj, r.pred, r.obj)
            for r in catalog.read(spark, "triples").collect()
        }
        assert got == golden and len(golden) > 10

    def test_restart_is_idempotent(self, spark, corpus_dir, tmp_path):
        path, _ = corpus_dir
        catalog = LocalTableCatalog(str(tmp_path / "wh"))
        ckpt = str(tmp_path / "ckpt")
        stream_extract(spark, path, ckpt, catalog, available_now=True).awaitTermination(300)
        before = {
            (r.subj, r.pred, r.obj)
            for r in catalog.read(spark, "triples").collect()
        }
        # Restart from the same checkpoint: no new files → no new batches;
        # triple set unchanged.
        stream_extract(spark, path, ckpt, catalog, available_now=True).awaitTermination(300)
        after = {
            (r.subj, r.pred, r.obj)
            for r in catalog.read(spark, "triples").collect()
        }
        assert after == before


class TestWindowedMentions:
    def test_windowed_counts(self, spark, corpus_dir, tmp_path):
        path, rows = corpus_dir
        out = (
            windowed_mention_counts(spark, path, window="1 hour")
            .writeStream.format("memory")
            .queryName("cve_windows")
            .outputMode("append")  # finalized windows only
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "wc"))
            .start()
        )
        out.awaitTermination(300)
        # availableNow drains everything; watermark passes end → windows close.
        got = spark.sql("SELECT * FROM cve_windows").collect()
        # Corpus contains CVE mentions; at least the hot CVEs must appear.
        cves = {r.cve for r in got}
        total = sum(r.n_mentions for r in got)
        import re

        expected = sum(
            len(re.findall(r"CVE-\d{4}-\d{4,7}", r["text"])) for r in rows
        )
        if got:
            assert total <= expected
        # The aggregation plan itself is valid streaming (no exception) and
        # deterministic columns:
        assert {c for c in ("window_start", "cve", "n_mentions")} <= set(
            spark.table("cve_windows").columns
        )


class TestSessionWindows:
    def test_sessions_match_batch_gap_rule(self, spark, tmp_path):
        import datetime as dt

        from threat_intelligence_knowledge_graph_spark.streaming.stream_extract import (
            sessionized_event_counts,
        )

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        m = dt.timedelta(minutes=1)
        rows = [
            # user 1: burst of 3 (gaps 5m), 40m silence, burst of 2
            (1, t0), (1, t0 + 5 * m), (1, t0 + 10 * m),
            (1, t0 + 50 * m), (1, t0 + 55 * m),
            # user 2: single event
            (2, t0 + 7 * m),
            # sentinel far in the future so the watermark passes every
            # real session's end and append mode emits them all
            (99, t0 + dt.timedelta(days=2)),
        ]
        src = tmp_path / "events"
        spark.createDataFrame(rows, "user_id long, ts timestamp").write.parquet(
            str(src)
        )
        q = (
            sessionized_event_counts(
                spark, str(src), "user_id long, ts timestamp",
                gap="30 minutes", watermark="10 minutes",
            )
            .writeStream.format("memory")
            .queryName("sessions")
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(300)
        got = {
            (r.user_id, r.session_start, r.n_events)
            for r in spark.sql(
                "SELECT * FROM sessions WHERE user_id != 99"
            ).collect()
        }
        assert got == {
            (1, t0, 3),
            (1, t0 + 50 * m, 2),
            (2, t0 + 7 * m, 1),
        }
        # session_end extends gap past the last event (spark semantics)
        ends = {
            (r.user_id, r.session_start): r.session_end
            for r in spark.sql("SELECT * FROM sessions").collect()
        }
        assert ends[(1, t0)] == t0 + 10 * m + 30 * m


class TestStreamingDedup:
    def test_duplicates_dropped_across_micro_batches(self, spark, tmp_path):
        from datetime import datetime

        from pyspark.sql.types import (
            StringType,
            StructField,
            StructType,
            TimestampType,
        )

        from threat_intelligence_knowledge_graph_spark.streaming.stream_extract import (
            streaming_exact_dedup,
        )

        schema = StructType(
            [
                StructField("doc_id", StringType()),
                StructField("content_hash", StringType()),
                StructField("ts", TimestampType()),
            ]
        )
        base = datetime(2024, 1, 1, 12, 0, 0)
        # 6 unique hashes; h0-h2 duplicated in shard 2 (later arrival,
        # same event-time neighborhood, inside the watermark).
        shard1 = [(f"d{i}", f"h{i}", base.replace(minute=i)) for i in range(6)]
        shard2 = [(f"dup{i}", f"h{i}", base.replace(minute=10 + i)) for i in range(3)]
        path = str(tmp_path / "in")
        spark.createDataFrame(shard1, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)
        spark.createDataFrame(shard2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(path)

        out = streaming_exact_dedup(
            spark,
            path,
            schema,
            key_cols=("content_hash",),
            watermark="2 hours",
            max_files_per_trigger=1,  # force >= 2 micro-batches
        )
        q = (
            out.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("dedup_out").collect()
        hashes = [r.content_hash for r in got]
        # Exactly one survivor per hash. The duplicated hashes h0-h2
        # live in DIFFERENT micro-batches (maxFilesPerTrigger=1), so
        # uniqueness here proves the dedup state spans batches. Which
        # arrival wins depends on file-processing order — accept either
        # (asserting a specific winner would race on mtime ties).
        assert sorted(hashes) == [f"h{i}" for i in range(6)]
        assert len(set(hashes)) == len(hashes)
        winners = {r.content_hash: r.doc_id for r in got}
        for i in range(3):
            assert winners[f"h{i}"] in (f"d{i}", f"dup{i}")
        for i in range(3, 6):
            assert winners[f"h{i}"] == f"d{i}"
