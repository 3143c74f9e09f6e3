"""Transcript curation plan: the composed conversation-level pipeline.

The engine's INPUT is an Iceberg table of multi-turn agent transcripts,
and before those conversations become SFT data (``operators/sft``) or
KG extraction input a real deployment curates at CONVERSATION
granularity — the transcript twin of ``plans/curation.curate_documents``
(which curates flat documents). One call chains the individually-
oracled transcript operators into the standard flow:

    structural validity → stuck-agent loop rejection
    → exact replay dedup → context-budget gate

Each stage is the already-tested operator (``operators/sft``,
``operators/transcript_stats``, ``operators/conv_dedup``); this module
adds only composition, a fixed rejection precedence, and the verdict
frame a quarantine job writes.

Stage semantics and ordering (first matching reason wins):

1. ``invalid``     — structural checks from ``validate_traces``. By
   default the two log-integrity checks every runtime must satisfy
   (dense 1..n ``turn_idx``, no empty/NULL text); ``full_grammar=True``
   adds the role-grammar conjunction (starts-with-user, alternating
   roles, tool-after-assistant) for corpora that promise it.
2. ``looping``     — ``loop_detection``: a run of ``min_run``
   byte-identical consecutive turn texts (retry loops are SFT poison).
3. ``exact_dup``   — ``conversation_dedup_exact``: content+order
   fingerprint replay; the min-conv_id copy survives.
4. ``over_budget`` — total chars above ``budget_chars`` (conversations
   that can never fit the training context; pair with
   ``context_growth`` to pick the budget).

Dedup is computed over the FULL input rather than stage-1/2 survivors:
stages 1-2 are pure functions of conversation CONTENT, and the
fingerprint is content+order, so every member of a fingerprint group
gets the same stage-1/2 verdict — the canonical pick is identical
either way, without the cross-stage ordering trap the incremental
document pipeline had to solve with a shadow table
(``plans/curation.py``).

Scale shape: every per-conversation signal (validity aggregates, loop
windows, fingerprint collect, char totals) groups or windows on
conv_id — ONE turn-table exchange pattern per stage, reusable under
bucketing — and the verdict assembly joins N_convs-sized frames on
conv_id plus the 32-byte fingerprint-keyed canonical join. Nothing
collects; the verdict frame is a lazy plan for the caller's single
action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.conv_dedup import conversation_dedup_exact
from ..operators.sft import validate_traces
from ..operators.transcript_stats import context_growth, loop_detection


def curate_transcripts(
    turns: DataFrame,
    *,
    min_run: int = 3,
    budget_chars: int = 4000,
    full_grammar: bool = False,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """One verdict row per conversation:

    ``(conv_id, n_turns, total_chars, reason, accepted)`` — ``reason``
    is the first failing stage in the precedence ``invalid`` →
    ``looping`` → ``exact_dup`` → ``over_budget`` (NULL when
    accepted). Filter ``accepted`` and semi-join the turn table to
    materialize the curated corpus; group ``reason`` for the funnel.
    """
    v = validate_traces(
        turns, conv_col, turn_col, role_col, text_col
    ).select(
        conv_col,
        (
            (F.col("dense_turn_idx") & F.col("no_empty_text"))
            if not full_grammar
            else F.col("is_valid")
        ).alias("_ok"),
    )
    lp = loop_detection(
        turns,
        min_run=min_run,
        conv_col=conv_col,
        turn_col=turn_col,
        text_col=text_col,
    ).select(conv_col, "is_looping")
    dd = conversation_dedup_exact(
        turns, conv_col, turn_col, role_col, text_col
    ).select(conv_col, "is_dup")
    cg = context_growth(
        turns,
        budget_chars=budget_chars,
        conv_col=conv_col,
        turn_col=turn_col,
        text_col=text_col,
    ).select(conv_col, "n_turns", "total_chars")
    reason = (
        F.when(~F.col("_ok"), F.lit("invalid"))
        .when(F.col("is_looping"), F.lit("looping"))
        .when(F.col("is_dup"), F.lit("exact_dup"))
        .when(F.col("total_chars") > budget_chars, F.lit("over_budget"))
    )
    return (
        cg.join(v, conv_col)
        .join(lp, conv_col)
        .join(dd, conv_col)
        .select(
            conv_col,
            "n_turns",
            "total_chars",
            reason.alias("reason"),
            reason.isNull().alias("accepted"),
        )
    )
