"""Stateful cross-batch conversation reassembly (applyInPandasWithState).

Turns for each conversation arrive split across two micro-batches within
the idle window; the operator must emit each conversation exactly once,
complete and turn-ordered, after the idle timeout.
"""

import os
import time

import pandas as pd

from threat_intelligence_knowledge_graph_spark.datagen import transcripts_rows
from threat_intelligence_knowledge_graph_spark.schemas import TRANSCRIPTS_SCHEMA
from threat_intelligence_knowledge_graph_spark.streaming.stream_extract import (
    stateful_reassembly,
)


class TestStatefulReassembly:
    def test_cross_batch_emission(self, spark, tmp_path):
        inp = str(tmp_path / "in")
        rows = transcripts_rows(3)
        half1 = [r for r in rows if r["turn_idx"] % 2 == 0]
        half2 = [r for r in rows if r["turn_idx"] % 2 == 1]
        spark.createDataFrame(pd.DataFrame(half1), TRANSCRIPTS_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(inp)

        stream = (
            spark.readStream.schema(TRANSCRIPTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(inp)
        )
        q = (
            stateful_reassembly(stream, idle_timeout_ms=6000)
            .writeStream.format("memory")
            .queryName("stateful_docs")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            # Second half lands well inside the idle window.
            time.sleep(2)
            spark.createDataFrame(
                pd.DataFrame(half2), TRANSCRIPTS_SCHEMA
            ).coalesce(1).write.mode("append").parquet(inp)

            expected = {}
            for r in sorted(rows, key=lambda x: (x["conv_id"], x["turn_idx"])):
                expected.setdefault(r["conv_id"], []).append(r["text"])

            deadline = time.time() + 90
            out = []
            while time.time() < deadline:
                out = spark.sql("SELECT * FROM stateful_docs").collect()
                if len(out) >= len(expected):
                    break
                time.sleep(2)
        finally:
            q.stop()

        assert len(out) == len(expected)
        for r in out:
            assert r.doc_text == "\n".join(expected[r.conv_id]), r.conv_id
            assert r.n_turns == len(expected[r.conv_id])

    def test_restart_recovers_state_exactly_once(self, spark, tmp_path):
        """Kill the query mid-stream — after the first half of every
        conversation's turns is buffered in group state but BEFORE any
        idle timeout emits — then restart from the same checkpoint and
        feed the second half. Every conversation must be emitted EXACTLY
        once, complete and turn-ordered: the state store recovered the
        buffered turns across the restart (the exactly-once discipline
        of the MERGE sinks, extended to the stateful operator)."""
        inp = str(tmp_path / "in")
        ck = str(tmp_path / "ck")
        outp = str(tmp_path / "out")
        rows = transcripts_rows(3)
        half1 = [r for r in rows if r["turn_idx"] % 2 == 0]
        half2 = [r for r in rows if r["turn_idx"] % 2 == 1]
        spark.createDataFrame(pd.DataFrame(half1), TRANSCRIPTS_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(inp)

        def start():
            # FILE sink, not memory: the memory sink refuses checkpoint
            # recovery; the parquet sink's commit log is what gives the
            # restarted query exactly-once output semantics. 30 s idle
            # timeout (not the other test's 6 s): the kill must land
            # before any timeout emission even under this host's
            # documented multi-second co-tenant stalls.
            stream = (
                spark.readStream.schema(TRANSCRIPTS_SCHEMA)
                .option("maxFilesPerTrigger", "1")
                .parquet(inp)
            )
            return (
                stateful_reassembly(stream, idle_timeout_ms=30_000)
                .writeStream.format("parquet")
                .option("path", outp)
                .outputMode("append")
                .option("checkpointLocation", ck)
                .trigger(processingTime="1 second")
                .start()
            )

        def emitted():
            try:
                return spark.read.parquet(outp).collect()
            except Exception:  # sink dir not created yet
                return []

        q1 = start()
        try:
            # wait until batch 1 is committed (half1 buffered in state),
            # then kill before the 30 s idle timeout can fire
            deadline = time.time() + 60
            while time.time() < deadline:
                if any(p.numInputRows > 0 for p in q1.recentProgress):
                    break
                time.sleep(0.5)
        finally:
            q1.stop()
        assert emitted() == []  # nothing emitted before the kill

        spark.createDataFrame(pd.DataFrame(half2), TRANSCRIPTS_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(inp)
        expected = {}
        for r in sorted(rows, key=lambda x: (x["conv_id"], x["turn_idx"])):
            expected.setdefault(r["conv_id"], []).append(r["text"])

        q2 = start()
        try:
            deadline = time.time() + 150
            out = []
            while time.time() < deadline:
                out = emitted()
                if len(out) >= len(expected):
                    break
                time.sleep(2)
        finally:
            q2.stop()

        # exactly once: no conv missing, none duplicated
        assert sorted(r.conv_id for r in out) == sorted(expected)
        for r in out:
            assert r.doc_text == "\n".join(expected[r.conv_id]), r.conv_id
            assert r.n_turns == len(expected[r.conv_id])
