"""Preference-pair mining over agent transcripts (DPO / best-of-n).

After SFT-pair mining (``operators/sft.py``) the next artifact a
post-training data pipeline produces from a transcript corpus is
PREFERENCE data: for prompts that occur in more than one conversation,
pair a response from a conversation that ENDED WELL against a response
to the same prompt from a conversation that ended badly. The outcome
label comes from ``transcript_stats.conversation_outcomes`` (looping /
tool_failure / abandoned / completed) — the same terminal-state triage
the fleet dashboard reads, reused here as the preference signal.

Two operators:

- ``dpo_pairs``  — (prompt, chosen, rejected) triples: for each
  distinct prompt text with at least one pair from a ``completed``
  conversation and at least one from a non-completed one, emit ONE
  deterministic (chosen, rejected) pair plus the group sizes, with
  provenance (conv_id, turn_idx) for both sides.
- ``best_of_n``  — rejection sampling: for each distinct prompt keep
  the single best response by a caller-supplied score column
  (deterministic tie-break), recording how many candidates competed —
  the standard best-of-n distillation reduction.

Reference anchor: the reference repo stops at triple extraction
(src/main.py); these mine its input corpus for training data instead —
a from-scratch capability over the same transcript shape (BASELINE
input_hint), not a port.

Scale shape (both): pair mining is the ``sft_pairs`` single conv_id
exchange; the preference grouping is ONE additional hash exchange on
the prompt text (the natural key — co-locating a prompt's candidates
is the irreducible shuffle of preference mining). Group reduction is a
window rank over that same partitioning, so Catalyst plans Exchange →
Sort → Window with no second shuffle. Hot prompts (a boilerplate
greeting occurring millions of times) are bounded by ``max_group``:
rank frames never materialize more than the window's sort, and the
emitted pair is min-rank so the cap only drops EXTRA candidates —
reported, not silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .sft import sft_pairs
from .transcript_stats import conversation_outcomes


def dpo_pairs(
    turns: DataFrame,
    min_run: int = 3,
    error_pattern: str = "(?i)error|exception|traceback|failed",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
) -> DataFrame:
    """(prompt, chosen, rejected, chosen_conv_id, chosen_turn_idx,
    rejected_conv_id, rejected_turn_idx, rejected_outcome, n_chosen,
    n_rejected): one row per distinct prompt text that has BOTH a
    user→assistant pair in a ``completed`` conversation and one in a
    non-completed (looping / tool_failure / abandoned) conversation.

    Chosen side = the completed-conversation response that is LONGEST
    (more-complete answers win among successful traces — the standard
    heuristic absent a reward model), ties broken by (conv_id,
    turn_idx) ascending so the output is a pure function of the input.
    Rejected side = the non-completed response from the WORST outcome
    by fixed severity (looping > tool_failure > abandoned — the loop
    spiral is the strongest negative signal), same deterministic
    tie-break. ``n_chosen`` / ``n_rejected`` are the full candidate
    group sizes, so downstream sampling knows how much preference
    signal backs each pair.

    100 TB shape: sft_pairs (one conv_id exchange) → broadcast-free
    conv_id-keyed join against the outcomes frame (both sides are
    conv-cardinality) → ONE prompt-text exchange shared by both rank
    windows and the final group join. Severity/length ordering is
    integer/string comparison only — no Python in the plan.
    """
    pairs = sft_pairs(
        turns,
        conv_col=conv_col,
        turn_col=turn_col,
        role_col=role_col,
        text_col=text_col,
    )
    outcomes = conversation_outcomes(
        turns,
        min_run=min_run,
        error_pattern=error_pattern,
        conv_col=conv_col,
        turn_col=turn_col,
        role_col=role_col,
        text_col=text_col,
        tool_col=tool_col,
    ).select(conv_col, "outcome")
    lab = pairs.join(outcomes, conv_col)

    # Fixed severity so "worst failure" is engine-portable: smaller =
    # worse. completed is never on the rejected side.
    sev = (
        F.when(F.col("outcome") == "looping", F.lit(0))
        .when(F.col("outcome") == "tool_failure", F.lit(1))
        .when(F.col("outcome") == "abandoned", F.lit(2))
        .otherwise(F.lit(3))
    )
    lab = lab.withColumn("_sev", sev)

    wc = Window.partitionBy("prompt").orderBy(
        F.length("response").desc(),
        F.col(conv_col).asc(),
        F.col("prompt_turn_idx").asc(),
    )
    chosen = (
        lab.filter(F.col("outcome") == "completed")
        .withColumn("_rk", F.row_number().over(wc))
        .groupBy("prompt")
        .agg(
            F.min_by(F.col("response"), F.col("_rk")).alias("chosen"),
            F.min_by(F.col(conv_col), F.col("_rk")).alias("chosen_conv_id"),
            F.min_by(F.col("prompt_turn_idx"), F.col("_rk")).alias(
                "chosen_turn_idx"
            ),
            F.count("*").cast("long").alias("n_chosen"),
        )
    )
    wr = Window.partitionBy("prompt").orderBy(
        F.col("_sev").asc(),
        F.col(conv_col).asc(),
        F.col("prompt_turn_idx").asc(),
    )
    rejected = (
        lab.filter(F.col("outcome") != "completed")
        .withColumn("_rk", F.row_number().over(wr))
        .groupBy("prompt")
        .agg(
            F.min_by(F.col("response"), F.col("_rk")).alias("rejected"),
            F.min_by(F.col(conv_col), F.col("_rk")).alias(
                "rejected_conv_id"
            ),
            F.min_by(F.col("prompt_turn_idx"), F.col("_rk")).alias(
                "rejected_turn_idx"
            ),
            F.min_by(F.col("outcome"), F.col("_rk")).alias(
                "rejected_outcome"
            ),
            F.count("*").cast("long").alias("n_rejected"),
        )
    )
    return chosen.join(rejected, "prompt").select(
        "prompt",
        "chosen",
        "rejected",
        "chosen_conv_id",
        "chosen_turn_idx",
        "rejected_conv_id",
        "rejected_turn_idx",
        "rejected_outcome",
        "n_chosen",
        "n_rejected",
    )


def best_of_n(
    pairs: DataFrame,
    score_col: str,
    prompt_col: str = "prompt",
    response_col: str = "response",
    conv_col: str = "conv_id",
    turn_col: str = "prompt_turn_idx",
) -> DataFrame:
    """Rejection sampling / best-of-n reduction over a scored pair
    frame: for each distinct prompt keep the highest-``score_col``
    response (ties → lowest (conv_id, turn_idx), so the winner is a
    pure function of the input), with ``n_candidates`` recording the
    group size the winner beat.

    Input is any frame with (prompt, response, conv_id, turn_idx,
    score) columns — typically ``sft_pairs`` output joined with a
    quality or reward score; keeping the score a caller column keeps
    this operator reusable across scorers.

    Output: (prompt, response, <score_col>, conv_id, turn_idx,
    n_candidates).

    100 TB shape: ONE hash exchange on the prompt text; the rank
    window and the count aggregate share its partitioning (Exchange →
    Sort → Window → partial-free agg). Skewed boilerplate prompts cost
    one sort of their group — no cross-key amplification.
    """
    w = Window.partitionBy(prompt_col).orderBy(
        F.col(score_col).desc(),
        F.col(conv_col).asc(),
        F.col(turn_col).asc(),
    )
    return (
        pairs.withColumn("_rk", F.row_number().over(w))
        .groupBy(prompt_col)
        .agg(
            F.min_by(F.col(response_col), F.col("_rk")).alias(response_col),
            F.min_by(F.col(score_col), F.col("_rk")).alias(score_col),
            F.min_by(F.col(conv_col), F.col("_rk")).alias(conv_col),
            F.min_by(F.col(turn_col), F.col("_rk")).alias(turn_col),
            F.count("*").cast("long").alias("n_candidates"),
        )
    )
