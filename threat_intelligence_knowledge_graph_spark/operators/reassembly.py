"""Stage A — conversation reassembly (turns → documents).

The reference consumes whole documents (reference main.py:110-156); our
input is transcript turns (BASELINE.json input_hint), so documents are
rebuilt per ``conv_id`` with turns ordered by ``turn_idx``, preserving
per-turn text equality (validated by :func:`explode_back`).

Spark-first shape: a single hash-aggregation with ``collect_list`` +
``array_sort`` — one shuffle on ``conv_id``, no window (a window would
shuffle AND sort the full partition). For skewed conversations (a conv
with millions of turns at 10^12 scale) the salted two-phase variant caps
group size: partial concat per (conv_id, block) then final concat —
both phases are map-side-combinable hash aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TURN_SEPARATOR = "\n"


def _doc_cols(turns_col):
    return [
        F.array_join(F.transform(turns_col, lambda t: t["text"]), TURN_SEPARATOR).alias(
            "doc_text"
        ),
        F.size(turns_col).cast("int").alias("n_turns"),
    ]


def reassemble(transcripts: DataFrame, salt_blocks: int | None = None) -> DataFrame:
    """Turns → one row per conversation: (conv_id, doc_text, n_turns, n_chars).

    ``salt_blocks``: if set, turns are pre-aggregated per
    ``(conv_id, turn_idx div salt_blocks)`` so no single reduce task ever
    sees more than ``salt_blocks`` turns of one conversation (skew cap —
    SURVEY.md §4.1a). Output is byte-identical to the direct path.
    """
    # NULL turn text is pinned to '' (an empty line in the document):
    # array_join would otherwise silently DROP null elements, breaking the
    # per-turn equality invariant (turn count vs exploded lines).
    transcripts = transcripts.withColumn("text", F.coalesce("text", F.lit("")))
    if salt_blocks is None:
        turns = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
        return (
            transcripts.groupBy("conv_id")
            .agg(turns.alias("turns"))
            .select("conv_id", *_doc_cols(F.col("turns")))
            .withColumn("n_chars", F.length("doc_text").cast("long"))
        )

    block = (F.col("turn_idx") / F.lit(salt_blocks)).cast("long").alias("block")
    partial = (
        transcripts.groupBy("conv_id", block)
        .agg(F.array_sort(F.collect_list(F.struct("turn_idx", "text"))).alias("turns"))
        .select(
            "conv_id",
            "block",
            F.array_join(F.transform("turns", lambda t: t["text"]), TURN_SEPARATOR).alias(
                "block_text"
            ),
            F.size("turns").cast("int").alias("block_turns"),
        )
    )
    return (
        partial.groupBy("conv_id")
        .agg(F.array_sort(F.collect_list(F.struct("block", "block_text", "block_turns"))).alias("blocks"))
        .select(
            "conv_id",
            F.array_join(
                F.transform("blocks", lambda b: b["block_text"]), TURN_SEPARATOR
            ).alias("doc_text"),
            F.aggregate(
                F.transform("blocks", lambda b: b["block_turns"].cast("int")),
                F.lit(0),
                lambda acc, x: acc + x,
            ).alias("n_turns"),
        )
        .withColumn("n_chars", F.length("doc_text").cast("long"))
    )


def explode_back(documents: DataFrame) -> DataFrame:
    """Inverse of :func:`reassemble` for the per-turn equality invariant:
    (conv_id, turn_idx, text). Valid because ingestion asserts turns do not
    contain the separator (see :func:`validate_turns`)."""
    return documents.select(
        "conv_id",
        F.posexplode(F.split("doc_text", TURN_SEPARATOR)).alias("turn_idx", "text"),
    )


def validate_turns(transcripts: DataFrame) -> DataFrame:
    """Rows violating the separator contract (must be empty)."""
    return transcripts.filter(F.col("text").contains(TURN_SEPARATOR))
