"""Conversation-level deduplication over agent transcripts.

Agent runtimes produce duplicate conversations constantly — replayed
jobs, retry loops that re-run a whole conversation with one changed
turn, fan-out workers that log the same session twice. Deduplicating at
the CONVERSATION grain (not the document grain the `dedup` module
serves) needs order-aware content identity:

- ``conversation_fingerprints`` / ``conversation_dedup_exact`` — an
  order-preserving content fingerprint (md5 over the turn_idx-sorted
  ``role␟text`` sequence, conv_id/ts/tool excluded) and min-id
  canonical assignment: byte-identical replays collapse regardless of
  how they were keyed or when they were logged.
- ``conversation_near_dup`` — turn-SET Jaccard pairs: two
  conversations sharing ≥ ``threshold`` of their distinct
  ``role␟text`` turns (a retry loop that edited one turn scores
  (n−1)/(n+1)). EXACT, not approximate: any pair with Jaccard > 0
  shares ≥ 1 turn hash, so the inverted-index join enumerates every
  qualifying pair — no MinHash recall loss. The one scale hazard is a
  boilerplate turn shared by millions of conversations (a constant
  system prompt): its posting list explodes the self-join, so postings
  longer than ``max_posting`` are excluded from pair generation and
  reported via ``return_dropped`` (the repo's LSH bucket-cap rule —
  never silently). A turn that common carries no dedup signal anyway.

Scale shape: fingerprints are one conv_id aggregation (collect_list is
bounded by turns-per-conversation, not corpus size); near-dup is one
distinct + one turn-hash-keyed self-join with capped keys + one pair
aggregation — all keyed equi-joins, no cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_FIELD_SEP = "\x1f"
_TURN_SEP = "\x1e"


def _turn_content(role_col: str, text_col: str):
    return F.concat(
        F.coalesce(F.col(role_col), F.lit("")),
        F.lit(_FIELD_SEP),
        F.coalesce(F.col(text_col), F.lit("")),
    )


def conversation_fingerprints(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """(conv_id, n_turns, fingerprint): md5 over the turn_idx-ordered
    ``role␟text`` sequence (␞-joined). Identity is CONTENT + ORDER:
    conv_id, timestamps, and tool annotations don't contribute, so a
    replayed conversation fingerprints identically under a fresh key.
    Requires unique turn_idx per conversation (the reassembly
    contract) for a deterministic sort."""
    item = F.struct(
        F.col(turn_col).alias("t"),
        _turn_content(role_col, text_col).alias("c"),
    )
    seq = F.array_sort(F.collect_list(item))
    return turns.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        F.md5(
            F.concat_ws(_TURN_SEP, F.transform(seq, lambda x: x["c"]))
        ).alias("fingerprint"),
    )


def conversation_dedup_exact(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """(conv_id, n_turns, fingerprint, canonical_conv_id, is_dup):
    min-conv_id canonical assignment per fingerprint. Keep rows with
    ``is_dup = false`` for the deduplicated corpus; the mapping rows
    let provenance tables re-point at the canonical conversation.
    One fingerprint-keyed join; only the 32-byte fingerprint and ids
    shuffle."""
    fps = conversation_fingerprints(
        turns, conv_col, turn_col, role_col, text_col
    )
    canon = fps.groupBy("fingerprint").agg(
        F.min(conv_col).alias("canonical_conv_id")
    )
    return fps.join(canon, "fingerprint").select(
        conv_col,
        "n_turns",
        "fingerprint",
        "canonical_conv_id",
        (F.col(conv_col) != F.col("canonical_conv_id")).alias("is_dup"),
    )


def conversation_near_dup(
    turns: DataFrame,
    threshold: float = 0.6,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
    max_posting: int = 10_000,
    return_dropped: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """(conv_a, conv_b, n_common, n_a, n_b, jaccard): conversation
    pairs (conv_a < conv_b) whose distinct-turn-content sets overlap at
    Jaccard ≥ ``threshold``. Exact enumeration via an inverted index on
    the turn-content hash; turn hashes with posting lists longer than
    ``max_posting`` are excluded from pair generation (boilerplate
    turns — no dedup signal, quadratic cost) and returned as
    (turn_hash, n_convs) when ``return_dropped=True``. ``jaccard`` is
    |A∩B| / (|A|+|B|−|A∩B|) on DISTINCT turn contents, rounded to 6;
    sizes n_a/n_b count distinct contents too, so a conversation that
    repeats a turn isn't inflated."""
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    th = turns.select(
        F.col(conv_col), F.md5(_turn_content(role_col, text_col)).alias("th")
    ).distinct()
    sizes = th.groupBy(conv_col).agg(F.count("*").alias("n"))
    posting = th.groupBy("th").agg(F.count("*").alias("_p"))
    dropped = (
        posting.filter(F.col("_p") > max_posting)
        .select("th", F.col("_p").alias("n_convs"))
    )
    kept = th.join(
        F.broadcast(dropped.select("th")), "th", "left_anti"
    )
    a = kept.select(F.col(conv_col).alias("conv_a"), "th")
    b = kept.select(F.col(conv_col).alias("conv_b"), "th")
    co = (
        a.join(b, "th")
        .filter(F.col("conv_a") < F.col("conv_b"))
        .groupBy("conv_a", "conv_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(conv_col).alias("conv_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col(conv_col).alias("conv_b"), F.col("n").alias("n_b"))
    pairs = (
        co.join(sa, "conv_a")
        .join(sb, "conv_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                "double"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            "conv_a",
            "conv_b",
            "n_common",
            "n_a",
            "n_b",
            F.round("jaccard", 6).alias("jaccard"),
        )
    )
    if return_dropped:
        return pairs, dropped
    return pairs
