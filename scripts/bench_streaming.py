"""Streaming throughput/latency bench (VERDICT r2 item 6, r3 item 6).

Measures the Structured Streaming path end-to-end at TWO operating
points of the same pipeline (``stream_extract``):

- **latency mode** — maxFilesPerTrigger=8: small micro-batches bound
  per-row latency; each batch pays the MERGE + checkpoint commit cost.
- **throughput mode** — no file cap: ``availableNow`` drains the
  backlog in the fewest micro-batches, amortizing the commit cost —
  the backfill/catch-up profile.

Both report sustained rows/s plus per-micro-batch latency from the
query's own progress events (triggerExecution durations). Output
semantics are identical (same MERGE keys) — only batching differs.

Usage: python scripts/bench_streaming.py [n_convs] [cores]
Prints one JSON line:
  {"n_turns": ..., "latency_mode": {...}, "throughput_mode": {...}}
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


def _run_mode(
    spark, inp: str, work: str, tag: str, max_files_per_trigger: int | None,
    n_turns: int,
) -> dict:
    catalog = LocalTableCatalog(os.path.join(work, f"wh-{tag}"))
    t0 = time.time()
    q = stream_extract(
        spark,
        inp,
        os.path.join(work, f"ckpt-{tag}"),
        catalog,
        available_now=True,
        max_files_per_trigger=max_files_per_trigger,
    )
    q.awaitTermination()
    sec = time.time() - t0

    # Spark 4 returns StreamingQueryProgress objects (Spark 3 returned
    # JSON strings) — normalize through each event's .json payload.
    progress = [
        json.loads(p if isinstance(p, str) else p.json) for p in q.recentProgress
    ]
    lat = sorted(
        p["durationMs"].get("triggerExecution", 0) / 1000.0
        for p in progress
        if p.get("numInputRows", 0) > 0
    )
    triples = catalog.read(spark, "triples").count()
    return {
        "sec": round(sec, 2),
        "turns_per_sec": round(n_turns / sec, 1),
        "n_batches": len(lat),
        "n_triples": triples,
        "batch_latency_sec": {
            "p50": round(lat[len(lat) // 2], 2) if lat else None,
            "max": round(lat[-1], 2) if lat else None,
        },
    }


def _run_stateful(
    spark, inp: str, work: str, n_turns: int, n_convs: int,
    idle_timeout_ms: int = 5_000,
) -> dict:
    """Throughput + state-store footprint of the CROSS-BATCH stateful
    reassembly path (applyInPandasWithState), the trickle-feed profile:
    every conversation's turns buffer in group state and emit after the
    idle timeout. Wall time necessarily includes one idle-timeout tail
    after the last input batch (reported separately so the reader can
    subtract it)."""
    from threat_intelligence_knowledge_graph_spark.schemas import (
        TRANSCRIPTS_SCHEMA,
    )
    from threat_intelligence_knowledge_graph_spark.streaming.stream_extract import (
        stateful_reassembly,
    )

    outp = os.path.join(work, "out-stateful")
    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(inp)
    t0 = time.time()
    q = (
        stateful_reassembly(stream, idle_timeout_ms=idle_timeout_ms)
        .writeStream.format("parquet")
        .option("path", outp)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt-stateful"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    state_rows_peak = 0
    state_mem_peak = 0
    emitted = 0
    sec = None
    deadline = time.time() + 1800
    try:
        while time.time() < deadline:
            # recentProgress (history), not lastProgress: 500 ms
            # triggers outpace the 2 s poll and the true state peak can
            # sit in a batch whose event a lastProgress poll never sees.
            for rp in q.recentProgress:
                p = json.loads(rp if isinstance(rp, str) else rp.json)
                for so in p.get("stateOperators", []):
                    state_rows_peak = max(state_rows_peak, so.get("numRowsTotal", 0))
                    state_mem_peak = max(state_mem_peak, so.get("memoryUsedBytes", 0))
            try:
                emitted = spark.read.parquet(outp).count()
            except Exception:
                emitted = 0
            if emitted >= n_convs:
                # clock stops at drain detection, BEFORE q.stop() —
                # stop latency is not part of the pipeline's throughput
                sec = time.time() - t0
                break
            time.sleep(2)
    finally:
        q.stop()
    if sec is None:
        sec = time.time() - t0
    return {
        "sec": round(sec, 2),
        "turns_per_sec": round(n_turns / sec, 1),
        "n_docs_emitted": emitted,
        "idle_timeout_tail_sec": idle_timeout_ms / 1000.0,
        "state_rows_peak": state_rows_peak,
        "state_memory_peak_mb": round(state_mem_peak / 1e6, 1),
    }


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

        # Warm-up drain over a small slice: without it the FIRST mode
        # pays class-loading/codegen/shuffle warm-up and the reported
        # mode ratio conflates batching with cold-start (review r4).
        warm = os.path.join(work, "warm")
        generate_transcripts_df(spark, 2_000, partitions=8).write.parquet(warm)
        _run_mode(spark, warm, work, "warm", max_files_per_trigger=8, n_turns=1)

        latency = _run_mode(
            spark, inp, work, "lat", max_files_per_trigger=8, n_turns=n_turns
        )
        throughput = _run_mode(
            spark, inp, work, "thr", max_files_per_trigger=None, n_turns=n_turns
        )
        stateful = _run_stateful(spark, inp, work, n_turns, n_convs)
        out = {
            "n_turns": n_turns,
            "latency_mode": latency,
            "throughput_mode": throughput,
            "stateful_mode": stateful,
            "throughput_gain": round(
                throughput["turns_per_sec"] / latency["turns_per_sec"], 2
            ),
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
