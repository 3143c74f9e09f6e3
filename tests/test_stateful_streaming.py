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
