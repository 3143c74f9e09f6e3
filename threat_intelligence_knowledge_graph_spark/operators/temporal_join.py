"""Temporal joins: as-of (point-in-time) and interval (range) joins.

The reference pipeline timestamps every IOC sighting and graph edge
(first_seen/last_seen properties on nodes; see the sink contract in
SURVEY.md §2 ops 27-28) but queries them only through Cypher
equality predicates. A training-data / enrichment pipeline over the
same tables needs the two temporal join shapes Spark lacks as
built-ins:

- ``asof_join`` — for every left row, the most recent right row for
  the same key at-or-before the left timestamp ("what was the latest
  indicator/config/price when this event happened"). Implemented as
  the union-merge plan: tag both sides, union, ONE hash exchange on
  the key, one partition-local sort, and a running ``last(payload,
  ignorenulls=True)`` window — no range-join explosion, no per-key
  collect. At 100 TB this is a single shuffle of left+right sized
  rows; the window is pipelined inside the sorted partition.
- ``interval_join`` — facts against (start, end] windows WITHOUT an
  equi-key (incident windows, maintenance windows, ad campaigns).
  A naive inequality join is a cartesian product; this bucketizes
  time (windows explode to the fixed-width buckets they cover, facts
  map to exactly one bucket), equi-joins on the bucket, and applies
  the exact containment filter as a residual. Each (fact, window)
  match is found in exactly one bucket — the fact's — so no
  post-join dedup is needed. Bucket width trades explode factor
  (long windows / small buckets) against join fan-in (short buckets
  / many facts per bucket); windows much longer than the bucket
  should use a wider bucket.

Both operators are pure Catalyst (no Python UDFs) and deterministic:
``asof_join`` requires an explicit ``tie_break`` column so equal
right timestamps resolve identically on every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    tie_break: str,
    tolerance: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: latest right row per key at-or-before left time.

    Every left row is preserved (left-outer semantics); the matched
    right columns come back as ``{prefix}{col}``, NULL when no right
    row for the key is old enough. Among right rows sharing the
    maximal eligible ``right_time``, the one with the greatest
    ``tie_break`` wins — pass the right table's unique id.

    ``tolerance`` (an SQL interval string like ``'3 days'``) turns
    matches older than ``left_time - tolerance`` back into NULLs
    without a second shuffle — the match's own timestamp rides along
    in the payload struct.

    Plan shape (audited): one Exchange hashpartitioning(key), one
    partition-local Sort, one running-window pass. The union carries
    left rows with a NULL payload and right rows with NULL left
    columns; ``last(_p, ignorenulls=True)`` over rows-unbounded-
    preceding is the merge. Right rows sort BEFORE left rows at an
    equal timestamp (side 0 < 1), which is what makes the join
    inclusive (right_time == left_time matches).
    """
    lcols = list(left.columns)
    key_t = left.schema[left_key].dataType
    payload = F.struct(
        F.col(right_time).alias("_rt"),
        *[F.col(c) for c in right_cols],
    )
    r2 = right.select(
        F.col(right_key).cast(key_t).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tie_break).alias("_tb"),
        payload.alias("_p"),
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in left.schema.fields
        ],
    )
    l2 = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tie_break].dataType).alias("_tb"),
        F.lit(None).cast(r2.schema["_p"].dataType).alias("_p"),
        *lcols,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        r2.unionByName(l2)
        .withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    match: Column = F.col("_m")
    if tolerance is not None:
        fresh = F.col("_m._rt") >= F.col("_t") - F.expr(
            f"INTERVAL {tolerance}"
        )
        match = F.when(fresh, match)
    return merged.select(
        *lcols,
        *[match.getField(c).alias(f"{prefix}{c}") for c in right_cols],
    )


def interval_join(
    facts: DataFrame,
    windows: DataFrame,
    *,
    fact_time: str,
    win_start: str,
    win_end: str,
    bucket_seconds: int = 86400,
    keys: list[tuple[str, str]] | None = None,
    broadcast_windows: bool = False,
) -> DataFrame:
    """Inner-join facts to every window with start <= t < end.

    ``keys`` optionally adds (fact_col, window_col) equi-conditions on
    top of the containment. ``broadcast_windows=True`` hints the
    exploded window side as a broadcast build (right when the window
    table is dimension-sized — the common case); otherwise AQE picks.

    Bucket cover is computed on second-truncated timestamps and is a
    SUPERSET of the true cover (one extra trailing bucket when the
    end has sub-second or mid-bucket precision) — the exact residual
    filter restores precision, and a fact's single bucket assignment
    guarantees no duplicate pairs. Output keeps all fact columns plus
    all window columns.
    """
    b = int(bucket_seconds)
    if b <= 0:
        raise ValueError("bucket_seconds must be positive")
    wb = windows.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(win_start)) / b),
                F.floor(F.unix_timestamp(F.col(win_end)) / b),
            )
        ),
    )
    if broadcast_windows:
        wb = F.broadcast(wb)
    fb = facts.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(fact_time)) / b)
    )
    cond = fb["_bucket"] == wb["_bucket"]
    for fc, wc in keys or []:
        cond = cond & (fb[fc] == wb[wc])
    contained = (F.col(fact_time) >= F.col(win_start)) & (
        F.col(fact_time) < F.col(win_end)
    )
    return (
        fb.join(wb, cond, "inner")
        .filter(contained)
        .drop("_bucket")
    )


def scd2_intervals(
    observations: DataFrame,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    ts_col: str = "ts",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) validity intervals for
    temporal triples: collapse a per-timestamp observation stream
    ``(subj, pred, obj, ts)`` into change-run rows ``(subj, pred, obj,
    valid_from, valid_to, n_observations, is_current)`` — the "what
    did this domain resolve to LAST month" view that ``min/max
    first-last-seen`` cannot express: an object that disappears and
    RETURNS opens a NEW interval (two runs, two rows), which is
    exactly the fast-flux / re-pointed-infrastructure timeline an
    analyst walks.

    Semantics: per (subj, pred), observations are totally ordered by
    ``(ts, obj)`` (the obj tiebreak makes same-instant conflicting
    observations deterministic on every engine); a run is a maximal
    stretch of equal obj; ``valid_from`` = first observation of the
    run, ``valid_to`` = the next run's valid_from (NULL on the last
    run — open interval, ``is_current`` true).

    Scale shape: ONE (subj, pred) hash exchange serves the lag window,
    the run-id cumulative sum, the run aggregate, and the valid_to
    lead window (all (subj, pred)-partitioned, local re-sorts only);
    nothing collects, output is bounded by the number of change
    points, not observations. The hot-subject case (one domain in
    10^8 events) is a single partition-local sort — AQE skew split
    applies as everywhere else.
    """
    key = [F.col(subj_col), F.col(pred_col)]
    w_order = Window.partitionBy(*key).orderBy(
        F.col(ts_col).asc(), F.col(obj_col).asc()
    )
    flagged = observations.select(
        subj_col, pred_col, obj_col, ts_col
    ).withColumn(
        "_chg",
        F.when(
            F.lag(obj_col).over(w_order).eqNullSafe(F.col(obj_col)),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    run = flagged.withColumn(
        "_run",
        F.sum("_chg").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    runs = run.groupBy(subj_col, pred_col, "_run", obj_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count("*").cast("long").alias("n_observations"),
    )
    # Two runs of one (subj, pred) can share valid_from only when
    # conflicting objs arrive at the SAME instant (then they are
    # adjacent obj-ordered runs) — the obj tiebreak keeps the lead
    # deterministic on every engine; (valid_from, obj) is unique per
    # key by construction (equal-obj stretches collapse into one run).
    w_next = Window.partitionBy(*key).orderBy(
        F.col("valid_from").asc(), F.col(obj_col).asc()
    )
    return runs.select(
        subj_col,
        pred_col,
        obj_col,
        "valid_from",
        F.lead("valid_from").over(w_next).alias("valid_to"),
        "n_observations",
    ).withColumn("is_current", F.col("valid_to").isNull())


def temporal_two_hop(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    ts_col: str = "ts",
    max_gap_s: int | None = None,
) -> DataFrame:
    """Time-respecting two-hop chains: ``a → b`` at ``t1`` followed by
    ``b → c`` at ``t2 > t1`` (optionally within ``max_gap_s``) — the
    lateral-movement / infection-chain primitive a static two-hop
    cannot express (a static join happily reports B→C *before* A→B
    ever happened, which is causally impossible).

    Output: ``(a, b, c, t1, t2, gap_s)`` with ``gap_s`` from exact
    integer microseconds and ONE /1e6 at the output seam (the repo's
    epoch-arithmetic discipline). Strict ``t2 > t1``: a same-instant
    pair has no causal order and is excluded.

    Scale shape: ONE keyed equi-join on the pivot node ``b`` (the ts
    inequality and gap bound evaluate inside the join as post-filters
    — never a cartesian or range join). Hub pivots fan out
    quadratically in their degree — the same power-law reality as
    triangle counting; ``max_gap_s`` is the semantic bound (a chain
    months apart is not one movement), and the graph_algos degree-cap
    pattern composes unchanged if a corpus needs it.
    """
    a = edges.select(
        F.col(src_col).alias("a"),
        F.col(dst_col).alias("_b1"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_t1u"),
        F.col(ts_col).alias("t1"),
    )
    b = edges.select(
        F.col(src_col).alias("_b2"),
        F.col(dst_col).alias("c"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_t2u"),
        F.col(ts_col).alias("t2"),
    )
    cond = (F.col("_b1") == F.col("_b2")) & (F.col("_t2u") > F.col("_t1u"))
    if max_gap_s is not None:
        if max_gap_s <= 0:
            raise ValueError("max_gap_s must be positive")
        cond = cond & (
            F.col("_t2u") - F.col("_t1u") <= F.lit(int(max_gap_s) * 1_000_000)
        )
    return a.join(b, cond).select(
        "a",
        F.col("_b1").alias("b"),
        "c",
        "t1",
        "t2",
        ((F.col("_t2u") - F.col("_t1u")) / F.lit(1_000_000.0)).alias("gap_s"),
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_time: str,
    right_time: str,
    tolerance_seconds: int,
) -> DataFrame:
    """Nearest-event join: for every left row, the right-side event
    time closest in EITHER direction within ``tolerance_seconds`` —
    the "which probe fired around this alert" primitive that as-of
    (backward-only) cannot express. Equidistant candidates resolve to
    the EARLIER right event (pinned; an alert is more plausibly the
    effect of what preceded it).

    Left-outer semantics: every left row survives, with NULL
    ``nearest_epoch``/``gap_s`` when no right event is in tolerance.
    ``gap_s`` is SIGNED (right − left: negative = before). Everything
    is epoch-second integer arithmetic — this operator emits no
    floats at all.

    Plan shape (the asof_join union-merge, doubled): ONE Exchange on
    the key, ONE partition-local sort, and TWO window passes sharing
    that sort — a backward ``last(ignorenulls)`` over unbounded-
    preceding for the latest right event at-or-before, and a forward
    ``first(ignorenulls)`` over unbounded-following for the earliest
    right event strictly after. Right rows sort BEFORE left rows at an
    equal timestamp (side 0 < 1), so an exactly-simultaneous right
    event is the backward match at gap 0 and is never double-counted
    by the forward frame. NO join node, no broadcast: cost is the
    union scan + one shuffle regardless of either side's size — at
    100 TB the alternative (banded self-join on time buckets) pays a
    multiplicative candidate blow-up this plan never generates.
    """
    if tolerance_seconds <= 0:
        raise ValueError("tolerance_seconds must be positive")
    lcols = list(left.columns)
    key_t = left.schema[key].dataType
    r2 = right.select(
        F.col(key).cast(key_t).alias("_k"),
        F.unix_timestamp(F.col(right_time)).alias("_e"),
        F.lit(0).alias("_side"),
        F.unix_timestamp(F.col(right_time)).alias("_re"),
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in left.schema.fields
        ],
    )
    l2 = left.select(
        F.col(key).alias("_k"),
        F.unix_timestamp(F.col(left_time)).alias("_e"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_re"),
        *lcols,
    )
    order = [F.col("_e").asc(), F.col("_side").asc()]
    wback = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wfwd = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = (
        r2.unionByName(l2)
        .withColumn("_prev", F.last("_re", ignorenulls=True).over(wback))
        .withColumn("_next", F.first("_re", ignorenulls=True).over(wfwd))
        .filter(F.col("_side") == 1)
    )
    d_prev = F.col("_e") - F.col("_prev")
    d_next = F.col("_next") - F.col("_e")
    tol = F.lit(tolerance_seconds)
    ok_prev = F.col("_prev").isNotNull() & (d_prev <= tol)
    ok_next = F.col("_next").isNotNull() & (d_next <= tol)
    nearest = (
        F.when(ok_prev & ok_next,
               F.when(d_prev <= d_next, F.col("_prev")).otherwise(F.col("_next")))
        .when(ok_prev, F.col("_prev"))
        .when(ok_next, F.col("_next"))
    )
    return merged.select(
        *lcols,
        F.col("_e").cast("long").alias("left_epoch"),
        nearest.cast("long").alias("nearest_epoch"),
        (nearest - F.col("_e")).cast("long").alias("gap_s"),
    )
