"""Per-conversation analytics over raw agent transcripts.

The pipeline's input is an Iceberg table of multi-turn conversation /
agent transcripts — (conv_id, turn_idx, role, text, tool, ts) — and
before (or alongside) KG extraction a real deployment wants corpus
analytics over that exact shape: turn/role mix, tool-usage frequency,
latency profile, conversation duration. The reference repo has no
equivalent (it consumes flat documents); this is transcript-payload
coverage in the same spirit as the curation operators.

Scale shape: ONE hash exchange on conv_id serves both the lag window
(per-conv gap between consecutive turns, turn_idx order) and the final
per-conv aggregation — Catalyst reuses the partitioning because the
window partition key equals the groupBy key, so a 10^12-turn table is
shuffled once, with map-side-combining aggregation on top. Timestamp
arithmetic is done on epoch seconds (integers), so the outputs are
engine-portable numerics, never raw timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def conversation_stats(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """One row per conversation:

    - ``n_turns``, ``n_user`` / ``n_assistant`` / ``n_tool`` (role mix)
    - ``n_distinct_tools`` (non-NULL ``tool`` values)
    - ``total_chars`` (sum of turn text lengths; NULL text counts 0)
    - ``duration_s`` (last epoch second − first)
    - ``mean_gap_s`` (mean consecutive-turn gap in turn_idx order,
      rounded to 3 — NULL for single-turn conversations)
    - ``final_role`` (role of the max-turn_idx turn)

    Gap/duration math uses ``unix_timestamp`` integers so results are
    identical across engines and session timezones.
    """
    epoch = F.unix_timestamp(F.col(ts_col))
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    gapped = turns.select(
        F.col(conv_col),
        F.col(turn_col),
        F.col(role_col),
        F.col(tool_col),
        F.coalesce(F.length(text_col), F.lit(0)).alias("_chars"),
        epoch.alias("_epoch"),
    ).withColumn("_gap", F.col("_epoch") - F.lag("_epoch").over(w))
    return gapped.groupBy(conv_col).agg(
        F.count("*").alias("n_turns"),
        F.count(F.when(F.col(role_col) == "user", 1)).alias("n_user"),
        F.count(F.when(F.col(role_col) == "assistant", 1)).alias(
            "n_assistant"
        ),
        F.count(F.when(F.col(role_col) == "tool", 1)).alias("n_tool"),
        F.count_distinct(F.col(tool_col)).alias("n_distinct_tools"),
        F.sum("_chars").alias("total_chars"),
        (F.max("_epoch") - F.min("_epoch")).alias("duration_s"),
        F.round(F.avg("_gap"), 3).alias("mean_gap_s"),
        F.max_by(F.col(role_col), F.col(turn_col)).alias("final_role"),
    )


def role_transitions(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
) -> DataFrame:
    """(from_role, to_role, n): corpus-wide counts of consecutive-turn
    role transitions (turn_idx order within each conversation) — the
    conversation-flow profile (user→assistant→tool→… loops) that
    surfaces malformed traces (assistant→assistant runs, tool turns
    with no assistant call) in one aggregate.

    Same single conv_id exchange as ``conversation_stats``; the
    transition pairs then reduce map-side to at most |roles|² rows.
    """
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    return (
        turns.select(
            F.col(conv_col),
            F.col(turn_col),
            F.col(role_col).alias("to_role"),
        )
        .withColumn("from_role", F.lag("to_role").over(w))
        .filter(F.col("from_role").isNotNull())
        .groupBy("from_role", "to_role")
        .agg(F.count("*").alias("n"))
    )


def sessionize_conversations(
    transcripts: DataFrame,
    gap_seconds: int = 1800,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Adds ``session_idx`` (0-based within conversation) and
    ``session_id`` (``conv_id#session_idx``): a conversation splits
    where consecutive turns (in ``turn_col`` order) are more than
    ``gap_seconds`` apart — the events-table gap rule applied to the
    pipeline's transcript input. Long-lived agent threads resumed after
    hours are one conv_id in the log but several DIALOGUES for training
    (context windows must not leak across the gap) and several
    INCIDENTS for CTI triage.

    One conv_id hash exchange: the lag window and the cumulative
    gap-flag sum share the same partition key (the transcript_stats
    discipline). Gap math is epoch-second integers (timezone/engine
    portable); a NULL ts never starts a new session (coalesced gap 0 —
    ordering stays turn_idx-driven).
    """
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    epoch = F.unix_timestamp(F.col(ts_col))
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(
        F.coalesce(gap, F.lit(0)) > gap_seconds, F.lit(1)
    ).otherwise(F.lit(0))
    sess = F.sum(new_session).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    ).cast("long")
    return transcripts.select(
        "*",
        sess.alias("session_idx"),
        F.concat(
            F.col(conv_col).cast("string"), F.lit("#"), sess.cast("string")
        ).alias("session_id"),
    )


def response_latency(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
) -> DataFrame:
    """(from_role, to_role, n, mean_s, max_s): corpus-wide latency
    profile of consecutive-turn role handoffs — how long the assistant
    takes after a user turn, how long tool calls run before the
    assistant consumes them. The SLA/regression view a serving team
    watches, and a curation signal (user→assistant gaps of hours mark
    resumed threads the sessionizer should split — tune ``gap_seconds``
    from this table's tail).

    Gaps are epoch-second integers over the ``turn_col`` order (the
    ``conversation_stats`` discipline: turn order, not row order);
    mean is ONE round-6 division of exact integer sums, max an exact
    integer. Pairs with either ``ts`` NULL are excluded. Same single
    conv_id exchange as ``role_transitions``; the (from, to) aggregate
    reduces map-side to ≤ |roles|² rows.
    """
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    pairs = (
        turns.select(
            F.col(conv_col),
            F.col(turn_col),
            F.col(role_col).alias("to_role"),
            epoch.alias("_e"),
        )
        .withColumn("from_role", F.lag("to_role").over(w))
        .withColumn("gap", F.col("_e") - F.lag("_e").over(w))
        .filter(F.col("from_role").isNotNull() & F.col("gap").isNotNull())
    )
    return (
        pairs.groupBy("from_role", "to_role")
        .agg(
            F.count("*").alias("_n"),
            F.sum("gap").alias("_sg"),
            F.max("gap").alias("_mx"),
        )
        .select(
            "from_role",
            "to_role",
            F.col("_n").cast("long").alias("n"),
            F.round(F.col("_sg") / F.col("_n"), 6).alias("mean_s"),
            F.col("_mx").cast("long").alias("max_s"),
        )
    )


def tool_profile(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> DataFrame:
    """(tool, n_calls, n_convs, n_gaps, mean_next_gap_s, max_next_gap_s):
    the per-TOOL fleet profile of an agent corpus — how often each tool
    is invoked, how many conversations rely on it, and how long the
    conversation stalls after a call (epoch gap to the NEXT turn,
    whoever speaks it) — the dashboard a serving team watches per tool
    where ``response_latency`` watches per role pair, and a curation
    signal (a tool whose post-call gaps dwarf the rest marks traces to
    split or down-weight).

    A call with no following turn (tool speaks last) or a NULL ts on
    either side counts in ``n_calls`` but not in the gap stats —
    ``n_gaps`` carries the effective sample size, mean is ONE round-6
    division of exact integer sums (NULL when n_gaps = 0, never 0/0).

    Scale shape: the lead window shares the family's single conv_id
    exchange; the per-tool aggregate reduces map-side to ≤ |tools|
    rows — a dimension, not a turn count.
    """
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    calls = (
        turns.select(
            F.col(conv_col),
            F.col(turn_col),
            F.col(role_col),
            F.col(tool_col),
            epoch.alias("_e"),
        )
        .withColumn("_gap", F.lead("_e").over(w) - F.col("_e"))
        .filter((F.col(role_col) == "tool") & F.col(tool_col).isNotNull())
    )
    return (
        calls.groupBy(F.col(tool_col).alias("tool"))
        .agg(
            F.count("*").cast("long").alias("n_calls"),
            F.count_distinct(F.col(conv_col)).cast("long").alias("n_convs"),
            F.count("_gap").cast("long").alias("n_gaps"),
            F.sum("_gap").alias("_sg"),
            F.max("_gap").cast("long").alias("max_next_gap_s"),
        )
        .select(
            "tool",
            "n_calls",
            "n_convs",
            "n_gaps",
            F.when(
                F.col("n_gaps") > 0, F.round(F.col("_sg") / F.col("n_gaps"), 6)
            ).alias("mean_next_gap_s"),
            "max_next_gap_s",
        )
    )


def loop_detection(
    turns: DataFrame,
    min_run: int = 3,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Stuck-agent detector: one row per conversation with
    ``n_turns``, ``max_stutter_run`` (longest run of consecutive turns
    — ``turn_col`` order — whose ``text`` is byte-identical),
    ``n_stuttered_turns`` (turns whose text equals the previous
    turn's), and ``is_looping`` (max run ≥ ``min_run``). Repeated
    identical content is the classic failure signature of a retrying
    agent (same tool call re-emitted, same apology re-generated);
    training on such traces teaches the loop, so curation wants them
    flagged. Text equality is NULL-safe (two NULL texts count as a
    stutter — an empty-turn loop is still a loop).

    Scale shape: ONE conv_id hash exchange serves everything — the lag
    window, the run-id cumulative sum, the per-run position window
    (its (conv, run) partition key is a superset of conv_id, so only a
    partition-local re-sort is inserted, never a shuffle), and the
    final per-conv aggregation (``max(_pos)`` per conversation IS the
    longest run's length — no per-run groupBy, no self-join).
    """
    if min_run < 2:
        raise ValueError("min_run must be >= 2")
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    flagged = turns.select(
        F.col(conv_col), F.col(turn_col), F.col(text_col).alias("_t")
    ).select(
        conv_col,
        turn_col,
        # NULL-safe: a turn "breaks" the run iff text differs from prev.
        # The first turn of a conv always breaks — tested explicitly via
        # row_number, because lag()'s NULL would null-safe-equal a NULL
        # first text and silently fuse it into a phantom run.
        F.when(
            (F.row_number().over(w) > 1)
            & F.lag("_t").over(w).eqNullSafe(F.col("_t")),
            F.lit(0),
        ).otherwise(F.lit(1)).alias("_brk"),
    )
    runs = flagged.withColumn("_run", F.sum("_brk").over(cum))
    pos = runs.withColumn(
        "_pos",
        F.row_number().over(
            Window.partitionBy(conv_col, "_run").orderBy(turn_col)
        ),
    )
    return pos.groupBy(conv_col).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.max("_pos").cast("long").alias("max_stutter_run"),
        F.sum(F.lit(1) - F.col("_brk")).cast("long").alias(
            "n_stuttered_turns"
        ),
        (F.max("_pos") >= min_run).alias("is_looping"),
    )


def context_growth(
    turns: DataFrame,
    budget_chars: int = 4000,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Context-window budget profile: one row per conversation with
    ``n_turns``, ``total_chars`` (NULL text counts 0), ``first_over_idx``
    (smallest ``turn_col`` whose INCLUSIVE running char total exceeds
    ``budget_chars`` — NULL if the conversation never exceeds it),
    ``n_turns_over`` and ``frac_over`` (round-6 share of turns past the
    budget). The planning table for serving and SFT packing: how deep
    into a conversation the context budget dies, and what fraction of
    turns would be truncated at a given budget.

    ONE conv_id exchange: the cumulative-sum window and the final
    aggregation share the partition key; everything else is scan-local
    integer arithmetic.
    """
    if budget_chars <= 0:
        raise ValueError("budget_chars must be positive")
    w = Window.partitionBy(conv_col).orderBy(turn_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = turns.select(
        F.col(conv_col),
        F.col(turn_col),
        F.coalesce(F.length(text_col), F.lit(0)).alias("_chars"),
    ).withColumn("_cum", F.sum("_chars").over(w))
    over = F.col("_cum") > budget_chars
    return cum.groupBy(conv_col).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum("_chars").cast("long").alias("total_chars"),
        F.min(F.when(over, F.col(turn_col))).alias("first_over_idx"),
        F.count(F.when(over, 1)).cast("long").alias("n_turns_over"),
        F.round(
            F.count(F.when(over, 1)) / F.count("*"), 6
        ).alias("frac_over"),
    )


def tool_errors(
    turns: DataFrame,
    error_pattern: str = "(?i)error|exception|traceback|failed",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
) -> DataFrame:
    """(tool, n_calls, n_errors, error_rate, n_convs, n_convs_with_error):
    per-tool failure profile — the fraction of a tool's result turns
    whose text matches ``error_pattern`` (RE2-safe, case-insensitive by
    default) and the conversation blast radius of those failures. The
    reliability dashboard that pairs with ``tool_profile``'s latency
    view, and a curation signal (traces dominated by failing tool calls
    are poor SFT material). NULL text never matches (rlike → NULL →
    not-an-error).

    Scale shape: pure scan-local filter + regex, then ONE map-side-
    combining aggregate to ≤ |tools| rows. No window, no second
    exchange — the cheapest operator in the family.
    """
    is_err = F.coalesce(
        F.col(text_col).rlike(error_pattern), F.lit(False)
    )
    calls = turns.filter(
        (F.col(role_col) == "tool") & F.col(tool_col).isNotNull()
    ).select(
        F.col(tool_col).alias("tool"),
        F.col(conv_col).alias("_conv"),
        is_err.alias("_err"),
    )
    return calls.groupBy("tool").agg(
        F.count("*").cast("long").alias("n_calls"),
        F.count(F.when(F.col("_err"), 1)).cast("long").alias("n_errors"),
        F.round(
            F.count(F.when(F.col("_err"), 1)) / F.count("*"), 6
        ).alias("error_rate"),
        F.count_distinct("_conv").cast("long").alias("n_convs"),
        F.count_distinct(F.when(F.col("_err"), F.col("_conv"))).cast(
            "long"
        ).alias("n_convs_with_error"),
    )


def tool_chains(
    turns: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    tool_col: str = "tool",
) -> DataFrame:
    """(from_tool, to_tool, n, n_convs): corpus-wide counts of
    consecutive TOOL-call transitions — the tool-workflow graph of an
    agent fleet (search→browser→python chains), skipping the user /
    assistant turns between calls. ``role_transitions`` profiles the
    dialogue loop; this profiles the tool pipeline inside it. Feed the
    result to the graph operators (PageRank on the tool graph = which
    tool the fleet's workflows load-bear on).

    Scale shape: scan-local filter to tool turns only (usually a small
    fraction of a 10^12-turn table), ONE conv_id exchange for the lag
    window over the filtered rows, then a map-side-combining aggregate
    to ≤ |tools|² rows.
    """
    w = Window.partitionBy(conv_col).orderBy(turn_col)
    calls = turns.filter(
        (F.col(role_col) == "tool") & F.col(tool_col).isNotNull()
    ).select(
        F.col(conv_col),
        F.col(turn_col),
        F.col(tool_col).alias("to_tool"),
    ).withColumn("from_tool", F.lag("to_tool").over(w))
    return (
        calls.filter(F.col("from_tool").isNotNull())
        .groupBy("from_tool", "to_tool")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.count_distinct(F.col(conv_col)).cast("long").alias(
                "n_convs"
            ),
        )
    )


def conversation_outcomes(
    turns: DataFrame,
    min_run: int = 3,
    error_pattern: str = "(?i)error|exception|traceback|failed",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-conversation terminal-state label — the triage rollup a
    fleet dashboard and an SFT-curation pass both read first:

    ``(conv_id, n_turns, last_role, outcome)`` with outcome decided by
    fixed precedence (first match wins):

    1. ``looping``      — a run of ``min_run`` byte-identical
       consecutive turn texts anywhere (``loop_detection``'s signal:
       the retry spiral dominates whatever happened after it);
    2. ``tool_failure`` — the conversation's LAST tool-role turn (by
       ``turn_col``) matches ``error_pattern`` (NULL-safe: no tool
       turns, or a non-matching last tool text, is not a failure) —
       the agent's final tool interaction errored and nothing
       recovered it;
    3. ``abandoned``    — the last turn is a ``user`` turn: the user
       asked and nobody answered (cut-off or gave-up trace);
    4. ``completed``    — everything else.

    Scale shape: the loop signal reuses ``loop_detection`` (ONE conv_id
    exchange), the last-turn and last-tool-turn signals are max_by
    aggregates over the same conv_id key (map-side partials), and the
    verdict assembly is conv_id-keyed joins of N_convs-sized frames.
    Nothing collects; no window beyond loop_detection's.
    """
    lp = loop_detection(
        turns,
        min_run=min_run,
        conv_col=conv_col,
        turn_col=turn_col,
        text_col=text_col,
    ).select(conv_col, "is_looping")
    last = turns.groupBy(conv_col).agg(
        F.count("*").cast("long").alias("n_turns"),
        F.max_by(F.col(role_col), F.col(turn_col)).alias("last_role"),
    )
    last_tool_err = (
        turns.filter(F.col(role_col) == "tool")
        .groupBy(conv_col)
        .agg(
            F.coalesce(
                F.max_by(F.col(text_col), F.col(turn_col)).rlike(
                    error_pattern
                ),
                F.lit(False),
            ).alias("_tool_err")
        )
    )
    outcome = (
        F.when(F.col("is_looping"), F.lit("looping"))
        .when(
            F.coalesce(F.col("_tool_err"), F.lit(False)),
            F.lit("tool_failure"),
        )
        .when(F.col("last_role") == "user", F.lit("abandoned"))
        .otherwise(F.lit("completed"))
    )
    return (
        last.join(lp, conv_col)
        .join(last_tool_err, conv_col, "left")
        .select(
            conv_col, "n_turns", "last_role", outcome.alias("outcome")
        )
    )


REFUSAL_PATTERNS = (
    # Pinned, RE2-safe, case-insensitive-by-lowering; matched against
    # assistant turns only. The standard SFT-curation screen: a
    # refusal-heavy conversation teaches the model to refuse, not to
    # help — filter or downweight before training (and a rising
    # refusal rate across ingest batches is a data-drift alarm).
    "i cannot ",
    "i can't ",
    "i'm sorry, but",
    "i am sorry, but",
    "i'm unable to",
    "i am unable to",
    "as an ai",
)


def refusal_rate(
    turns: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Per-conversation assistant-refusal profile: (conv_id,
    n_assistant, n_refusals, refusal_rate) — the SFT screen that keeps
    refusal-heavy conversations out of (or downweighted in) a training
    mix. A turn counts as a refusal when its LOWERCASED text contains
    any :data:`REFUSAL_PATTERNS` substring — plain ``contains``, not
    regex: the patterns are literals, substring scan is cheaper, and
    both engines agree on byte semantics with no regex-dialect seam.
    Conversations with assistant turns only are profiled; a
    conversation with NO assistant turn has no rate to report and is
    excluded (NULL-rate rows would poison a mean downstream).

    Exactness: counts are exact integers from one keyed aggregate;
    the rate is ONE round-6 division.

    Scale shape: scan-local lowercase + OR-of-contains projection,
    ONE map-side-combining aggregate on conv_id. No join, no window,
    no Python.
    """
    lowered = F.lower(F.col(text_col))
    is_refusal = None
    for p in REFUSAL_PATTERNS:
        c = lowered.contains(p)
        is_refusal = c if is_refusal is None else (is_refusal | c)
    is_assistant = F.col(role_col) == "assistant"
    agg = (
        turns.filter(is_assistant & F.col(text_col).isNotNull())
        .groupBy(F.col(conv_col))
        .agg(
            F.count("*").alias("n_assistant"),
            F.sum(is_refusal.cast("long")).alias("n_refusals"),
        )
    )
    return agg.select(
        conv_col,
        F.col("n_assistant").cast("long").alias("n_assistant"),
        F.col("n_refusals").cast("long").alias("n_refusals"),
        F.round(
            F.col("n_refusals").cast("double")
            / F.col("n_assistant").cast("double"),
            6,
        ).alias("refusal_rate"),
    )
