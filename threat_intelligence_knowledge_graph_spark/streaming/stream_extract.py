"""Structured Streaming ingestion of transcript turns.

The reference is batch-only (SURVEY.md §2: no streaming operators); this
module is OUR scale addition: continuous transcript ingestion with the
same extraction semantics and idempotent MERGE sinks.

Design: ``readStream`` over a transcripts directory → ``foreachBatch`` →
fused extraction kernel per micro-batch → MERGE into the snapshot-table
catalog (the Iceberg seam). The sinks dedup on their natural keys, so
replays after failure are idempotent — the Structured Streaming
exactly-once discipline the batch checkpoint design mirrors (SURVEY.md
§2 op-checklist, streaming row).

Assumption (documented): a conversation's turns arrive within one
micro-batch (file-shipping granularity = whole conversations). For feeds
where turns trickle in across batches, ``stateful_reassembly`` buffers
turns per conv_id with ``applyInPandasWithState`` and emits a document
only after an idle timeout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extraction import extract_graph_records_fused
from ..operators.triples import build_edges, build_nodes, build_triples
from ..schemas import TRANSCRIPTS_SCHEMA
from ..sources.tableio import LocalTableCatalog


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    catalog: LocalTableCatalog,
    run_id: str = "stream",
    available_now: bool = True,
    max_files_per_trigger: int | None = 8,
):
    """Stream transcripts from ``input_dir`` into nodes/edges/triples.

    Returns the started StreamingQuery; with ``available_now`` the query
    drains existing files and stops (test/backfill mode), otherwise it
    runs continuously.

    ``max_files_per_trigger`` picks the latency/throughput point: small
    micro-batches bound per-row latency but pay the MERGE + checkpoint
    commit cost per batch (the dominant cost — each commit rewrites the
    merged tables); ``None`` removes the cap so ``availableNow`` drains
    the backlog in the fewest batches — the high-throughput/backfill
    profile (scripts/bench_streaming.py measures both points).
    """
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        extraction = extract_graph_records_fused(batch_df)
        # Persist: nodes and edges both read the extraction output.
        extraction = extraction.persist()
        try:
            nodes = build_nodes(extraction)
            catalog.merge(
                spark, nodes, "nodes", keys=["node_label", "node_id"],
                run_id=run_id, stage=f"batch-{batch_id}-nodes",
            )
            all_nodes = catalog.read(spark, "nodes")
            edges = build_edges(extraction, all_nodes)
            catalog.merge(
                spark, edges, "edges", keys=["src_id", "rel_type", "dst_id"],
                run_id=run_id, stage=f"batch-{batch_id}-edges",
            )
            # Triples delta comes from THIS batch's (already endpoint-
            # checked) edges, not a re-read of the whole edges table —
            # per-batch work stays O(batch), not O(total graph); the
            # key-based MERGE keeps the result identical and idempotent.
            triples = build_triples(edges)
            catalog.merge(
                spark, triples, "triples", keys=["subj", "pred", "obj"],
                run_id=run_id, stage=f"batch-{batch_id}-triples",
            )
        finally:
            extraction.unpersist()

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stateful_reassembly(
    stream: DataFrame,
    idle_timeout_ms: int = 30_000,
    turn_separator: str = "\n",
) -> DataFrame:
    """Cross-batch conversation reassembly with ``applyInPandasWithState``.

    For feeds where a conversation's turns trickle in across micro-batches:
    turns buffer in per-conv_id group state; when no new turns arrive for
    ``idle_timeout_ms`` (processing time), the conversation is considered
    complete and its document row is emitted — the custom stateful
    operator slot from the north_star ("applyInPandasWithState for custom
    stateful operators").

    Output: (conv_id, doc_text, n_turns). Exactly-once downstream via the
    same MERGE sinks.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    import json

    out_schema = StructType(
        [
            StructField("conv_id", StringType()),
            StructField("doc_text", StringType()),
            StructField("n_turns", IntegerType()),
        ]
    )
    # State: accumulated (turn_idx, text) pairs, JSON-encoded — a joined-
    # string encoding would corrupt on texts containing the join char.
    state_schema = StructType(
        [
            StructField("turn_idxs", StringType()),  # json list of ints
            StructField("texts", StringType()),      # json list of strings
        ]
    )

    def fn(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            idxs_json, texts_json = state.get
            idxs = json.loads(idxs_json)
            texts = json.loads(texts_json)
            ordered = [t for _, t in sorted(zip(idxs, texts))]
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "doc_text": [turn_separator.join(ordered)],
                    "n_turns": [len(ordered)],
                }
            )
            return
        new_idxs: list[int] = []
        new_texts: list[str] = []
        for pdf in pdfs:
            new_idxs.extend(int(i) for i in pdf["turn_idx"])
            # NULL text pinned to '' (same contract as reassemble()).
            new_texts.extend("" if t is None else str(t) for t in pdf["text"])
        if state.exists:
            idxs_json, texts_json = state.get
            new_idxs = json.loads(idxs_json) + new_idxs
            new_texts = json.loads(texts_json) + new_texts
        state.update((json.dumps(new_idxs), json.dumps(new_texts)))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({"conv_id": [], "doc_text": [], "n_turns": []})

    return (
        stream.groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def windowed_mention_counts(
    spark: SparkSession,
    input_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming windowed aggregation demo: CVE mentions per event-time
    window with late-data watermarking — the watermark + tumbling-window
    operator pair over the transcript stream (pure expressions, no UDF)."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_dir)
    )
    return (
        stream.withWatermark("ts", watermark)
        .select(
            "ts",
            F.explode(
                F.regexp_extract_all("text", F.lit(r"CVE-\d{4}-\d{4,7}"), 0)
            ).alias("cve"),
        )
        .groupBy(F.window("ts", window).alias("w"), "cve")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("cve"),
            F.col("n_mentions"),
        )
    )


def sessionized_event_counts(
    spark: SparkSession,
    input_dir: str,
    schema,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming gap-sessionization (the streaming twin of the batch
    ``events_sessionize`` contract entry): per-user sessions via
    ``session_window`` — consecutive events closer than ``gap`` merge
    into one growing window, state is per-OPEN-session (bounded by
    concurrent users, not history), and the watermark both admits late
    events inside ``watermark`` and lets closed sessions emit and
    evict. Same session boundaries as the batch gap rule: a new
    session starts exactly when the gap to the previous event exceeds
    ``gap``."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), user_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    schema,
    key_cols: tuple[str, ...] = ("content_hash",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of the batch
    ``dedup_exact_docs`` entry: the first row per ``key_cols`` passes,
    later duplicates are dropped, via ``dropDuplicatesWithinWatermark``.

    State discipline at 100 TB/day: plain streaming ``dropDuplicates``
    keys state on every key EVER seen (unbounded); the within-watermark
    variant evicts a key's state once the watermark passes its event
    time, so state is bounded by the duplicate-arrival horizon (how far
    apart duplicates can arrive), not stream history. Duplicates
    arriving further apart than ``watermark`` are NOT caught — that is
    the documented contract; the periodic batch dedup over the
    materialized table (``operators/dedup.py``) is the backstop,
    exactly the lambda split the curation pipeline uses.

    ``max_files_per_trigger`` throttles file ingestion so tests can
    force duplicates into DIFFERENT micro-batches (proving the dedup is
    stateful across batches, not batch-local).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
