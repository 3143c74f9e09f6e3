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
3. ``exact_dup``   — content+order fingerprint replay
   (``conversation_fingerprints``); the min-conv_id copy survives.
4. ``over_budget`` — total chars above ``budget_chars`` (conversations
   that can never fit the training context; pair with
   ``context_growth`` to pick the budget).

The canonical universe for dedup is the DEDUP-REACHING set (stage-1/2
survivors), not the full input. Most stage-1/2 signals are functions
of the fingerprinted content (empty text and loops appear in the
role+text sequence, so a replay of an invalid-empty or looping
conversation fails the same stage) — but ``dense_turn_idx`` is NOT:
the fingerprint orders BY turn_idx without including its values, so a
gapped-index conversation can fingerprint-equal a dense one. Were the
canonical pick taken over the full input, such an invalid conversation
(when it holds the min conv_id) would canonicalize its valid twin away
— rejecting BOTH copies. Restricting the universe to reaching
conversations makes the kept set exactly "one valid copy per content
family", the batch-mode semantics the incremental variant must match.

Scale shape: every per-conversation signal (validity aggregates, loop
windows, fingerprint collect, char totals) groups or windows on
conv_id — ONE turn-table exchange pattern per stage, reusable under
bucketing — and the verdict assembly joins N_convs-sized frames on
conv_id plus the 32-byte fingerprint-keyed canonical join. Nothing
collects; the verdict frame is a lazy plan for the caller's single
action.

``curate_transcripts_increment`` is the steady-state ingest twin
(the ``plans.curation.curate_increment`` pattern at conversation
grain): O(batch) per increment, with a persisted fingerprint table
standing in for re-reading the corpus — exact dedup needs only the
32-byte fingerprints, so no shadow-text or pair-graph side tables are
required (replay identity is exact, not similarity-based).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.conv_dedup import (
    conversation_dedup_exact,
    conversation_fingerprints,
)
from ..operators.sft import validate_traces
from ..operators.transcript_stats import context_growth, loop_detection


def _stage_signals(
    turns: DataFrame,
    *,
    min_run: int,
    budget_chars: int,
    full_grammar: bool,
    conv_col: str,
    turn_col: str,
    role_col: str,
    text_col: str,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(validity, looping, sizes) per conversation — the stage-1/2
    signals plus the char totals, shared by batch and incremental
    curation so the two modes cannot drift."""
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
    cg = context_growth(
        turns,
        budget_chars=budget_chars,
        conv_col=conv_col,
        turn_col=turn_col,
        text_col=text_col,
    ).select(conv_col, "n_turns", "total_chars")
    return v, lp, cg


def _verdicts(
    cg: DataFrame,
    v: DataFrame,
    lp: DataFrame,
    dd: DataFrame,
    conv_col: str,
    budget_chars: int,
) -> DataFrame:
    """Assemble the verdict frame under the fixed precedence. ``dd``
    may cover only the dedup-reaching subset (left join — non-reaching
    conversations already carry an earlier reason)."""
    reason = (
        F.when(~F.col("_ok"), F.lit("invalid"))
        .when(F.col("is_looping"), F.lit("looping"))
        .when(F.col("is_dup"), F.lit("exact_dup"))
        .when(F.col("total_chars") > budget_chars, F.lit("over_budget"))
    )
    return (
        cg.join(v, conv_col)
        .join(lp, conv_col)
        .join(dd, conv_col, "left")
        .select(
            conv_col,
            "n_turns",
            "total_chars",
            reason.alias("reason"),
            reason.isNull().alias("accepted"),
        )
    )


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
    v, lp, cg = _stage_signals(
        turns,
        min_run=min_run,
        budget_chars=budget_chars,
        full_grammar=full_grammar,
        conv_col=conv_col,
        turn_col=turn_col,
        role_col=role_col,
        text_col=text_col,
    )
    # Dedup universe = stage-1/2 survivors (see module docstring): an
    # invalid gapped-index conversation can fingerprint-equal a dense
    # valid one, and must not canonicalize it away. N_convs-sized
    # reaching frame, conv_id-keyed semi-join into the turn table.
    reaching = (
        v.join(lp, conv_col)
        .where(F.col("_ok") & ~F.col("is_looping"))
        .select(conv_col)
    )
    dd = conversation_dedup_exact(
        turns.join(reaching, conv_col, "left_semi"),
        conv_col,
        turn_col,
        role_col,
        text_col,
    ).select(conv_col, "is_dup")
    return _verdicts(cg, v, lp, dd, conv_col, budget_chars)


def transcripts_batch_run_id(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> str:
    """Deterministic run id for a transcript ingest batch: XOR of
    per-turn ``xxhash64(conv_id, turn_idx, role, text)`` plus the turn
    count — order- and partitioning-independent, the transcript twin of
    ``plans.curation.batch_run_id`` and the same resume contract: a
    crash-rerun of the SAME batch derives the same id and resumes; a
    DIFFERENT batch always gets a fresh id."""
    row = turns.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(
                F.xxhash64(
                    F.col(conv_col).cast("string"),
                    F.col(turn_col).cast("string"),
                    F.coalesce(F.col(role_col), F.lit("")),
                    F.coalesce(F.col(text_col), F.lit("")),
                )
            ),
            F.lit(0),
        ).alias("fp"),
    ).collect()[0]
    return f"tbatch-{row['n']}-{row['fp'] & 0xFFFFFFFFFFFFFFFF:016x}"


def curate_transcripts_increment(
    spark,
    new_turns: DataFrame,
    catalog,
    *,
    min_run: int = 3,
    budget_chars: int = 4000,
    full_grammar: bool = False,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    run_id: str | None = None,
    corpus_table: str = "curated_transcripts",
    fp_table: str = "curated_transcripts_fps",
) -> DataFrame:
    """Steady-state ingest curation at CONVERSATION grain: admit a new
    batch of turns against the already-curated transcript corpus
    without re-processing it — the transcript twin of
    ``plans.curation.curate_increment``.

    Per batch the work is O(batch): validity, loop, and char-total
    signals scan only the batch (``_stage_signals``); exact replay
    dedup fingerprints the batch's stage-1/2 survivors and anti-joins
    the 32-byte fingerprints against the persisted fingerprint table —
    never re-reading stored turn text. Two committed()-guarded appends
    make the next increment see this one:

    - ``fp_table`` ``(conv_id, fingerprint)``: one row per NEW distinct
      fingerprint among this batch's dedup-reaching conversations. A
      conversation rejected ``over_budget`` is included — it reached
      dedup and is canonical for its content family, so a later replay
      must be ``exact_dup`` (exactly what batch mode over the union
      decides). Invalid/looping conversations are NOT indexed: those
      signals are content-determined for fingerprint-equal replays
      (empty text and loop runs live in the role+text sequence), so a
      replay fails the same stage on its own — and indexing them would
      re-open the gapped-twin hole batch mode closed (a later valid
      dense twin must be ADMITTED, not deduped against its invalid
      sibling; see the module docstring).
    - ``corpus_table``: the accepted conversations' turn rows
      (``tableio.append`` — per-batch files only; ``compact``
      periodically).

    Returns the same verdict frame as batch mode: ``(conv_id, n_turns,
    total_chars, reason, accepted)``.

    Crash safety — the ``curate_increment`` discipline: ``run_id=None``
    derives a content fingerprint (``transcripts_batch_run_id``), every
    read excludes this run's own commits, every append is
    ``committed()``-guarded, so a rerun after a crash between the two
    appends recomputes identical verdicts against the pre-run state and
    fills in only the missing commit.

    Equivalence: when conv ids are monotone across batches (append-only
    feed invariant), every verdict matches batch-mode
    ``curate_transcripts`` over the union — asserted by
    test_transcript_curation.py, including the cross-batch replay of an
    over-budget conversation and the cross-batch gapped-twin corner.
    """
    if run_id is None:
        run_id = transcripts_batch_run_id(
            new_turns, conv_col, turn_col, role_col, text_col
        )

    # One ingest increment is small by definition; eager lineage
    # truncation keeps every downstream action's plan flat (the
    # curate_increment precedent).
    new_turns = new_turns.localCheckpoint(eager=True)
    v, lp, cg = _stage_signals(
        new_turns,
        min_run=min_run,
        budget_chars=budget_chars,
        full_grammar=full_grammar,
        conv_col=conv_col,
        turn_col=turn_col,
        role_col=role_col,
        text_col=text_col,
    )
    reaching = (
        v.join(lp, conv_col)
        .where(F.col("_ok") & ~F.col("is_looping"))
        .select(conv_col)
    )
    fps = conversation_fingerprints(
        new_turns.join(reaching, conv_col, "left_semi"),
        conv_col,
        turn_col,
        role_col,
        text_col,
    ).select(conv_col, "fingerprint")

    known = (
        catalog.read(spark, fp_table, exclude_run_id=run_id)
        .select("fingerprint")
        .distinct()
        if catalog.exists_before(fp_table, run_id)
        else fps.select("fingerprint").limit(0)
    )
    # Within-batch min-id canonical + known-fingerprint membership: a
    # batch conversation is a dup if an earlier batch indexed its
    # fingerprint (monotone ids ⇒ the earlier copy holds the family
    # min) or a lower-id batch sibling shares it. Only 32-byte
    # fingerprints and ids shuffle.
    canon = fps.groupBy("fingerprint").agg(
        F.min(conv_col).alias("_canon")
    )
    dd = (
        fps.join(canon, "fingerprint")
        .join(
            known.withColumn("_known", F.lit(True)), "fingerprint", "left"
        )
        .select(
            conv_col,
            (
                (F.col(conv_col) != F.col("_canon"))
                | F.coalesce(F.col("_known"), F.lit(False))
            ).alias("is_dup"),
        )
    )
    verdicts = _verdicts(cg, v, lp, dd, conv_col, budget_chars).localCheckpoint(
        eager=True
    )

    new_fps = fps.join(
        dd.filter(~F.col("is_dup")).select(conv_col), conv_col, "left_semi"
    )
    if not catalog.committed(fp_table, run_id, "fps"):
        catalog.append(new_fps, fp_table, run_id=run_id, stage="fps")
    accepted_turns = new_turns.join(
        verdicts.filter(F.col("accepted")).select(conv_col),
        conv_col,
        "left_semi",
    )
    if not catalog.committed(corpus_table, run_id, "turns"):
        catalog.append(accepted_turns, corpus_table, run_id=run_id, stage="turns")
    return verdicts
