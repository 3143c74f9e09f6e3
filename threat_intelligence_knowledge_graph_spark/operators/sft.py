"""SFT-pair mining and trace validation over agent transcripts.

The most common downstream use of a transcript corpus at training time
is supervised fine-tuning data: (prompt, response) pairs mined from
user→assistant adjacencies, drawn only from conversations whose role
grammar is well-formed. These two operators are that surface:

- ``sft_pairs``   — every user turn immediately followed by an
  assistant turn becomes one training pair, with length columns for
  downstream quality filters.
- ``validate_traces`` — one row per conversation with the standard
  structural checks (starts with user, no consecutive same-role turns,
  every tool turn follows an assistant turn, dense 1-based turn
  indexing, no empty text) and the AND-fold ``is_valid`` flag — the
  quarantine gate a 10^12-turn ingest runs before pair mining.

Scale shape: each operator is ONE hash exchange on conv_id — the
lead/lag windows and (for validation) the final per-conv aggregation
share the same partitioning, so Catalyst plans a single Exchange and a
single partition-local Sort (the `transcript_stats` discipline). All
comparisons are on strings/integers — engine-portable, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sft_pairs(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    user_role: str = "user",
    assistant_role: str = "assistant",
    min_prompt_chars: int = 1,
    min_response_chars: int = 1,
) -> DataFrame:
    """(conv_id, prompt_turn_idx, prompt, response, n_prompt_chars,
    n_response_chars): one row per user turn whose IMMEDIATELY
    following turn (turn_idx order) is an assistant turn. A user turn
    followed by a tool call, another user turn, or nothing yields no
    pair — adjacency is the pair contract, not "next assistant
    eventually".

    Pairs shorter than ``min_prompt_chars`` / ``min_response_chars``
    (NULL text counts as length 0) are dropped — the first-line SFT
    quality filter; set both to 0 to keep everything.

    100 TB shape: one conv_id exchange + one partition-local sort
    feeding two lead() frames over the same window spec; the filter is
    applied post-window in the same stage. Output is linear in the
    number of user turns.
    """
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    paired = turns.select(
        F.col(conv_col),
        F.col(turn_col).alias("prompt_turn_idx"),
        F.col(role_col).alias("_role"),
        F.col(text_col).alias("prompt"),
        F.lead(role_col).over(w).alias("_next_role"),
        F.lead(text_col).over(w).alias("response"),
    )
    return (
        paired.filter(
            (F.col("_role") == user_role)
            & (F.col("_next_role") == assistant_role)
        )
        .select(
            conv_col,
            "prompt_turn_idx",
            "prompt",
            "response",
            F.coalesce(F.length("prompt"), F.lit(0)).alias("n_prompt_chars"),
            F.coalesce(F.length("response"), F.lit(0)).alias(
                "n_response_chars"
            ),
        )
        .filter(
            (F.col("n_prompt_chars") >= min_prompt_chars)
            & (F.col("n_response_chars") >= min_response_chars)
        )
    )


def validate_traces(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    user_role: str = "user",
    assistant_role: str = "assistant",
    tool_role: str = "tool",
) -> DataFrame:
    """One row per conversation with boolean structural checks and the
    AND-fold ``is_valid``:

    - ``starts_with_user``      first turn (min turn_idx) is a user turn
    - ``ends_with_assistant``   last turn is an assistant turn
    - ``no_repeated_role``      no two CONSECUTIVE turns share a role
    - ``tool_after_assistant``  every tool turn's previous turn is an
      assistant turn (an agent runtime emits tool results only in
      response to an assistant call)
    - ``dense_turn_idx``        turn_idx is exactly 1..n_turns (no
      gaps, duplicates, or 0/negative indices — the reassembly
      operators' ordering contract)
    - ``no_empty_text``         every turn has non-NULL, non-empty text

    ``is_valid`` is the conjunction — the quarantine predicate. The
    checks are per-conversation aggregates of window comparisons, so
    the whole validation is one conv_id exchange (window partition key
    == groupBy key; Catalyst reuses the partitioning).
    """
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    g = turns.select(
        F.col(conv_col),
        F.col(turn_col),
        F.col(role_col),
        F.col(text_col),
        F.lag(role_col).over(w).alias("_prev_role"),
    )
    same_as_prev = F.col(role_col) == F.col("_prev_role")
    tool_bad = (F.col(role_col) == tool_role) & (
        F.col("_prev_role").isNull()
        | (F.col("_prev_role") != assistant_role)
    )
    empty = F.col(text_col).isNull() | (F.length(text_col) == 0)
    agg = g.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        (F.min_by(role_col, turn_col) == user_role).alias(
            "starts_with_user"
        ),
        (F.max_by(role_col, turn_col) == assistant_role).alias(
            "ends_with_assistant"
        ),
        (F.count(F.when(same_as_prev, 1)) == 0).alias("no_repeated_role"),
        (F.count(F.when(tool_bad, 1)) == 0).alias("tool_after_assistant"),
        (
            (F.min(turn_col) == 1)
            & (F.max(turn_col) == F.count("*"))
            & (F.count_distinct(F.col(turn_col)) == F.count("*"))
        ).alias("dense_turn_idx"),
        (F.count(F.when(empty, 1)) == 0).alias("no_empty_text"),
    )
    checks = [
        "starts_with_user",
        "ends_with_assistant",
        "no_repeated_role",
        "tool_after_assistant",
        "dense_turn_idx",
        "no_empty_text",
    ]
    is_valid = F.lit(True)
    for c in checks:
        is_valid = is_valid & F.col(c)
    return agg.select(conv_col, "n_turns", *checks, is_valid.alias("is_valid"))


def sft_pairs_with_context(
    turns: DataFrame,
    max_context_chars: int = 2048,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    **pair_kwargs,
) -> DataFrame:
    """``sft_pairs`` plus a ``context`` column: the conversation history
    BEFORE the prompt, formatted one ``role: text`` line per turn,
    trimmed to the maximal contiguous MOST-RECENT suffix whose formatted
    length fits ``max_context_chars`` — multi-turn SFT's standard
    context-window assembly (recent turns matter most; a window that
    skipped a middle turn would fabricate a dialogue that never
    happened, so trimming is strictly contiguous-from-the-end).

    Mechanics (no Python, engine-portable): pairs join back to the turn
    table on conv_id (one keyed equi-join) with a ``turn < prompt_turn``
    range filter; per pair a DESC-by-turn window cumulative-sums each
    history line's formatted cost (len(role)+2+len(text)+1 for the
    newline), rows beyond the budget drop (the cumsum is monotone, so
    this IS stop-at-first-overflow), and the survivors re-sort ascending
    into the printed context. A pair with no affordable history gets
    ``context = ''``.

    Cost note: materializing per-pair context duplicates history turns
    across pairs by construction (every pair of a conversation carries
    its own window) — the join is conv_id-keyed and the fan-out is
    bounded by turns-per-conv × pairs-per-conv, never cross-
    conversation.
    """
    if max_context_chars < 0:
        raise ValueError("max_context_chars must be >= 0")
    pairs = sft_pairs(
        turns,
        conv_col=conv_col,
        turn_col=turn_col,
        role_col=role_col,
        text_col=text_col,
        **pair_kwargs,
    )
    hist = turns.select(
        F.col(conv_col).alias("_hc"),
        F.col(turn_col).alias("_ht"),
        F.concat(
            F.col(role_col), F.lit(": "), F.coalesce(F.col(text_col), F.lit(""))
        ).alias("_line"),
    )
    # Range predicate INSIDE the left join: a post-join filter would
    # drop a history-less pair's only (null-extended) row and lose the
    # pair; in the join condition, no-match pairs keep one NULL row.
    j = pairs.join(
        hist,
        (pairs[conv_col] == hist["_hc"])
        & (hist["_ht"] < pairs["prompt_turn_idx"]),
        "left",
    ).drop("_hc")
    w = (
        Window.partitionBy(conv_col, "prompt_turn_idx")
        .orderBy(F.desc("_ht"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # The budget test lives in the collect expression, NOT a row filter:
    # filtering would delete a pair entirely when none of its history
    # fits (every joined row gone → no group), where the contract is
    # context = ''.
    j = j.withColumn("_csum", F.sum(F.length("_line") + F.lit(1)).over(w))
    kept = F.when(
        F.col("_ht").isNotNull() & (F.col("_csum") <= max_context_chars),
        F.struct(F.col("_ht"), F.col("_line")),
    )
    return (
        j.groupBy(
            conv_col,
            "prompt_turn_idx",
            "prompt",
            "response",
            "n_prompt_chars",
            "n_response_chars",
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda x: x["_line"]
                ),
                "\n",
            ).alias("context")
        )
        .select(
            conv_col,
            "prompt_turn_idx",
            "context",
            "prompt",
            "response",
            F.length("context").alias("n_context_chars"),
            "n_prompt_chars",
            "n_response_chars",
        )
    )
