"""Streaming throughput/latency bench (VERDICT r2 item 6).

Measures the Structured Streaming path end-to-end: a transcripts corpus
is written as N parquet files, ``stream_extract`` drains it with
``availableNow`` (maxFilesPerTrigger bounds each micro-batch), and we
report sustained rows/s plus per-micro-batch latency from the query's
own progress events (triggerExecution durations).

Usage: python scripts/bench_streaming.py [n_convs] [cores]
Prints one JSON line:
  {"n_turns": ..., "sec": ..., "turns_per_sec": ...,
   "n_batches": ..., "batch_latency_sec": {"p50": ..., "max": ...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from threat_intelligence_knowledge_graph_spark.datagen import (
    generate_transcripts_df,
)
from threat_intelligence_knowledge_graph_spark.session import build_session
from threat_intelligence_knowledge_graph_spark.sources.tableio import (
    LocalTableCatalog,
)
from threat_intelligence_knowledge_graph_spark.streaming.stream_extract import (
    stream_extract,
)


def main(n_convs: int = 50_000, cores: int = 32) -> None:
    spark = build_session(
        "tikg-stream-bench", master=f"local[{cores}]", shuffle_partitions=cores
    )
    work = tempfile.mkdtemp(prefix="tikg-stream-bench-")
    try:
        inp = os.path.join(work, "in")
        # 32 files → 4 micro-batches at maxFilesPerTrigger=8.
        df = generate_transcripts_df(spark, n_convs, partitions=32)
        df.write.parquet(inp)
        n_turns = spark.read.parquet(inp).count()

        catalog = LocalTableCatalog(os.path.join(work, "wh"))
        t0 = time.time()
        q = stream_extract(
            spark,
            inp,
            os.path.join(work, "ckpt"),
            catalog,
            available_now=True,
        )
        q.awaitTermination()
        sec = time.time() - t0

        # Spark 4 returns StreamingQueryProgress objects (Spark 3 returned
        # JSON strings) — normalize through each event's .json payload.
        progress = [
            json.loads(p if isinstance(p, str) else p.json)
            for p in q.recentProgress
        ]
        lat = sorted(
            p["durationMs"].get("triggerExecution", 0) / 1000.0
            for p in progress
            if p.get("numInputRows", 0) > 0
        )
        triples = catalog.read(spark, "triples").count()
        out = {
            "n_turns": n_turns,
            "sec": round(sec, 2),
            "turns_per_sec": round(n_turns / sec, 1),
            "n_batches": len(lat),
            "n_triples": triples,
            "batch_latency_sec": {
                "p50": round(lat[len(lat) // 2], 2) if lat else None,
                "max": round(lat[-1], 2) if lat else None,
            },
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 50_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 32,
    )
