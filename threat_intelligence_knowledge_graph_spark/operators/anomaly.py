"""Group-relative anomaly scoring — z-score outliers over an event log.

The SOC triage primitive the reference's stored graph feeds into
(reference surface: its Cypher interface exposes observations for
exactly this kind of downstream scoring; the reference ships no
scorer): score each observation against ITS OWN group's distribution
(per event type, per sensor, per tenant), not the global one, so a
value that is normal for `purchase` but absurd for `heartbeat` is
caught.

Scale shape: one map-side-combining aggregation computes per-group
moments (groups are dimension-sized — event types, sensors), which
then BROADCAST back onto the event stream; scoring is a scan-local
projection. Top-k selection is TakeOrderedAndProject, never a global
sort. The z-score is ROUNDED before ranking (the repo's round-before-
compare discipline): both engines agree on the ranking key even though
their variance accumulation orders differ at ~1e-12.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def zscore_outliers(
    df: DataFrame,
    value_col: str = "value",
    group_cols: tuple[str, ...] = ("event_type",),
    id_col: str = "event_id",
    k: int = 20,
    round_to: int = 3,
) -> DataFrame:
    """Top-``k`` most anomalous rows by |z| within their group:
    (id, group…, value, z) ordered by rounded |z| DESC then id ASC (a
    fully deterministic rank key). Groups with zero variance score
    z = 0 (a constant signal has no outliers) rather than dividing by
    zero; population stddev so a 1-row group is also z = 0.

    Rows with a NULL group column have no group to be relative TO and
    are dropped EXPLICITLY up front (an inner equi-join would drop
    them silently — NULL never equals NULL); route untyped events
    through a sentinel group value if they must be scored.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    gcols = list(group_cols)
    for g in gcols:
        df = df.filter(F.col(g).isNotNull())
    stats = df.groupBy(*gcols).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_pop(value_col).alias("_sigma"),
    )
    scored = (
        df.join(F.broadcast(stats), gcols)
        .withColumn(
            "z",
            F.round(
                F.when(
                    F.col("_sigma") > 0,
                    (F.col(value_col) - F.col("_mu")) / F.col("_sigma"),
                ).otherwise(F.lit(0.0)),
                round_to,
            ),
        )
        .select(id_col, *gcols, value_col, "z")
    )
    return scored.orderBy(F.abs(F.col("z")).desc(), F.col(id_col).asc()).limit(k)


def recency_weighted_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    half_life_days: float = 7.0,
) -> DataFrame:
    """(key, n_events, decayed_count, last_seen_epoch): exponential
    recency decay — each observation contributes 0.5^(age/half_life)
    with age measured back from the NEWEST event in the frame (a
    data-derived anchor, so the score is a pure function of the input —
    no wall clock, reproducible across runs/engines). The triage signal
    behind "still-hot indicator" lists: an IOC mentioned 40 times last
    year scores below one mentioned twice today, where the raw count
    ranks them the other way.

    One map-side-combining agg for the anchor (1-row broadcast back),
    one scan projection for the weights (epoch-integer age math, the
    single pow() rounds only after the per-key sum), one keyed agg.
    """
    if half_life_days <= 0:
        raise ValueError("half_life_days must be positive")
    epoch = F.unix_timestamp(F.col(ts_col))
    anchored = df.filter(F.col(ts_col).isNotNull()).crossJoin(
        F.broadcast(
            df.agg(F.max(F.unix_timestamp(F.col(ts_col))).alias("_now"))
        )
    )
    age_days = (F.col("_now") - epoch) / F.lit(86400.0)
    w = F.pow(F.lit(0.5), age_days / F.lit(float(half_life_days)))
    return (
        anchored.groupBy(key_col)
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum(w), 6).alias("decayed_count"),
            F.max(epoch).cast("long").alias("last_seen_epoch"),
        )
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    threshold: float = 3.5,
    k: int = 20,
) -> DataFrame:
    """(id, group, value, robust_z): top-``k`` rows by |robust z|
    using median/MAD instead of mean/σ — ``zscore_outliers``'s robust
    sibling (Iglewicz & Hoaglin's modified z): one extreme beacon burst
    inflates a mean/σ baseline enough to hide itself; the median and
    the median-absolute-deviation barely move. robust_z =
    0.6745·(x − median)/MAD, rows with |z| ≥ threshold ranked by
    (|z| DESC, id).

    Determinism: both medians are the repo's nearest-rank percentile
    (``stats.exact_percentiles`` semantics — the value at ordered row
    ceil(n/2) with id tiebreak), so every engine picks the SAME
    physical rows; the only float ops are one subtraction/division
    chain rounded to 6 before ranking. Zero-MAD groups (over half the
    group identical) emit no outliers by convention — the zscore
    zero-variance guard.

    Shape: two group-keyed windows (median, then MAD's median — the
    second over the derived |x − median| column), a scan-local z
    projection, TakeOrderedAndProject top-k.
    """
    if threshold < 0:
        raise ValueError("threshold must be >= 0")
    if k < 1:
        raise ValueError("k must be >= 1")
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("x"),
    )

    def _median(frame, col, out):
        w = Window.partitionBy("grp").orderBy(col, "id")
        n = Window.partitionBy("grp")
        ranked = frame.select(
            "*",
            F.row_number().over(w).alias("_rn"),
            F.count("*").over(n).alias("_n"),
        )
        med = ranked.filter(
            F.col("_rn") == F.ceil(F.col("_n") / 2)
        ).select("grp", F.col(col).alias(out))
        return frame.join(med, "grp")

    with_med = _median(base, "x", "med")
    dev = with_med.select(
        "id", "grp", "x", "med", (F.abs(F.col("x") - F.col("med"))).alias("adev")
    )
    with_mad = _median(dev, "adev", "mad")
    scored = with_mad.select(
        "id",
        F.col("grp").alias("group"),
        F.col("x").alias("value"),
        F.round(
            F.when(
                F.col("mad") > 0,
                F.lit(0.6745) * (F.col("x") - F.col("med")) / F.col("mad"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("robust_z"),
    )
    return (
        scored.filter(F.abs(F.col("robust_z")) >= threshold)
        .orderBy(F.abs(F.col("robust_z")).desc(), "id")
        .limit(k)
    )


def cusum_level_shift(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    h_factor: int = 3,
) -> DataFrame:
    """Integer-exact one-sided CUSUM level-shift detector over per-group
    hourly volumes (Page 1954, the drift-vs-spike complement to the
    point-outlier scorers above): per group, bucket events into hours,
    take deviations from the group's own mean rate, and accumulate with
    a floor at zero — a sustained upward shift in volume grows the
    statistic linearly while isolated spikes decay.

    Determinism: the recursive ``s_t = max(0, s_{t-1} + d_t)`` is
    re-expressed with the prefix identity ``s_t = cs_t − min(0,
    min_{i≤t} cs_i)`` (two plain window functions — no recursion), and
    the deviations are scaled by the group's bucket count ``n`` so
    everything stays in exact integer arithmetic: ``d_t = n·x_t − T``
    (T = the group's total events; the true deviation times n). The
    alarm fires when the scaled statistic exceeds ``h_factor · T``,
    i.e. the raw CUSUM exceeds ``h_factor`` times the group's mean
    hourly volume. No floats anywhere — bit-identical cross-engine.

    Scale shape: one map-side-combining (group, hour) count, one
    dimension-sized per-group aggregate broadcast back, and one
    window partitioned by group ordered by hour — a single exchange
    on the group key; the window state is one running sum + one
    running min.
    """
    hour = F.date_trunc("hour", F.col(ts_col).cast("timestamp"))
    counts = (
        events.groupBy(F.col(group_col).alias("grp"), hour.alias("bucket"))
        .agg(F.count("*").alias("x"))
    )
    totals = counts.groupBy("grp").agg(
        F.count("*").alias("n_buckets"), F.sum("x").alias("total")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = F.col("n_buckets") * F.col("x") - F.col("total")
    joined = counts.join(F.broadcast(totals), "grp").withColumn(
        "_cs", F.sum(d).over(w)
    )
    return joined.select(
        F.col("grp").alias(group_col),
        "bucket",
        "x",
        (F.col("_cs") - F.least(F.lit(0), F.min("_cs").over(w)))
        .cast("long")
        .alias("cusum_scaled"),
        (
            (F.col("_cs") - F.least(F.lit(0), F.min("_cs").over(w)))
            > F.lit(h_factor) * F.col("total")
        ).alias("alarm"),
    )


def beacon_regularity(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "user_id",
    state_col: str = "event_type",
    id_col: str = "event_id",
    min_events: int = 4,
) -> DataFrame:
    """RITA-style C2-beacon detection by inter-arrival REGULARITY: per
    (group, state) channel, the squared coefficient of variation of
    consecutive-event gaps. A clocked implant checks in every ~N
    seconds (cv2 ≈ 0, plus jitter); human traffic is ragged (cv2 ≳ 1).
    Complements ``stats.burstiness_fano``, which scores COUNT
    dispersion per bucket and cannot distinguish a metronome from a
    uniform trickle.

    Determinism: gaps are epoch-second integers over the (ts, id)
    total order (same-instant events sequence identically
    cross-engine), and ``cv² = var/mean² = (n·Σg² − (Σg)²) / (Σg)²``
    makes numerator and denominator exact integers — ONE identical
    round-6 division per channel. All-zero-gap channels (same-second
    floods, Σg = 0) are emitted with cv2 NULL rather than dropped.

    Scale shape: one lag window over the (group, state) exchange, one
    map-side-combining aggregate on the same key — the window and the
    groupBy share ONE hash partitioning; no Python, no broadcast.
    ``min_events`` (≥ 3 gaps by default) suppresses channels too short
    to call periodic.
    """
    if min_events < 2:
        raise ValueError("min_events must be >= 2 (need at least one gap)")
    epoch = F.unix_timestamp(F.col(ts_col).cast("timestamp"))
    # NULL ts rows are excluded up front: engines disagree on NULL sort
    # placement (Spark NULLS FIRST vs DuckDB NULLS LAST), so letting a
    # NULL into the sequence would make the pairing engine-dependent.
    events = events.filter(F.col(ts_col).isNotNull())
    w = Window.partitionBy(group_col, state_col).orderBy(
        F.col(ts_col), F.col(id_col)
    )
    # Keep the original column names through the gap projection: an
    # alias here hides the window's hashpartitioning(group, state) from
    # the aggregate and buys a second, redundant exchange.
    gaps = (
        events.select(
            F.col(group_col),
            F.col(state_col),
            (epoch - F.lag(epoch).over(w)).alias("g"),
        )
        .filter(F.col("g").isNotNull())
    )
    agg = gaps.groupBy(group_col, state_col).agg(
        F.count("*").alias("_n"),
        F.sum("g").alias("_s1"),
        F.sum(F.col("g") * F.col("g")).alias("_s2"),
    )
    return (
        agg.filter(F.col("_n") >= F.lit(min_events - 1))
        .select(
            F.col(group_col),
            F.col(state_col),
            (F.col("_n") + F.lit(1)).cast("long").alias("n_events"),
            F.round(F.col("_s1") / F.col("_n"), 6).alias("mean_gap_s"),
            F.when(F.col("_s1") > 0,
                F.round(
                    (F.col("_n") * F.col("_s2") - F.col("_s1") * F.col("_s1"))
                    / (F.col("_s1") * F.col("_s1")),
                    6,
                ),
            ).alias("cv2"),
        )
    )


def dormancy_reactivation(
    events: DataFrame,
    min_quiet_s: float,
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Resurrected-infrastructure triage: per indicator, quiet-period
    structure of its sighting timeline — ``(key, n_sightings,
    n_reactivations, max_quiet_s, last_quiet_s, reactivated)``.

    Infrastructure that goes dark and returns is a classic
    campaign-reuse signal (a parked domain re-armed, a C2 IP rotated
    back in): ``n_reactivations`` counts quiet gaps longer than
    ``min_quiet_s`` anywhere in the history, and ``reactivated`` flags
    indicators whose MOST RECENT sighting follows such a gap — "came
    back from the dead and is live right now", the triage cut.
    Complements ``recency_weighted_counts`` (still hot) and
    ``stats.novelty_curve`` (first ever seen): this is *seen before,
    vanished, now back*.

    Determinism: gaps are taken between consecutive DISTINCT sighting
    timestamps (same-instant duplicate sightings are one observation —
    a burst is not a gap), so the gap multiset and the last-gap are
    total-order-free: no tiebreak column needed, identical
    cross-engine. Gap arithmetic is exact integer microseconds
    (``unix_micros`` / DuckDB ``epoch_us``) divided by the double
    1e6 once at the output seam (round 6).

    Singleton indicators (one distinct sighting) are kept with
    n_reactivations 0 and NULL quiet columns — never silently dropped.

    Scale shape: distinct on (key, ts), ONE lag window over the key
    exchange, one map-side-combining aggregate on the same key (window
    and groupBy share one hash partitioning); output is
    indicator-sized. No Python, no broadcast, no collect.
    """
    if min_quiet_s <= 0:
        raise ValueError("min_quiet_s must be > 0")
    quiet_us = int(min_quiet_s * 1_000_000)
    e = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        )
        .distinct()
    )
    w = Window.partitionBy("key").orderBy("_us")
    gaps = e.select(
        "key",
        "_us",
        (F.col("_us") - F.lag("_us").over(w)).alias("_gap"),
    )
    agg = gaps.groupBy("key").agg(
        F.count("*").alias("n_sightings"),
        F.sum(
            F.when(F.col("_gap") > F.lit(quiet_us), 1).otherwise(0)
        ).alias("n_reactivations"),
        F.max("_gap").alias("_max_gap"),
        F.max_by("_gap", "_us").alias("_last_gap"),
    )
    return agg.select(
        "key",
        "n_sightings",
        F.col("n_reactivations").cast("long").alias("n_reactivations"),
        F.round(F.col("_max_gap") / F.lit(1e6), 6).alias("max_quiet_s"),
        F.round(F.col("_last_gap") / F.lit(1e6), 6).alias("last_quiet_s"),
        F.coalesce(
            F.col("_last_gap") > F.lit(quiet_us), F.lit(False)
        ).alias("reactivated"),
    )


def rate_peaks(
    events: DataFrame,
    window_s: int = 3600,
    limit: int | None = None,
    group_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window rate profile per channel — the abuse/exfil
    detector the fixed-bucket family (hourly counts, Fano, CUSUM)
    structurally misses: a 500-event burst straddling an hour boundary
    halves in every aligned bucket but is ONE window here. For each
    channel: ``peak_rate`` = the max number of its events in ANY
    trailing ``window_s``-second window (windows anchored at events —
    the max over event-anchored windows equals the max over all
    windows), and, when ``limit`` is set, ``n_over`` = how many events
    land in a trailing window already holding > ``limit`` events (the
    throttle-violation count a rate limiter would have rejected).

    Exactness: epoch-integer RANGE frame ``[ts − window_s + 1, ts]``
    (inclusive trailing window) — same-second bursts are RANGE ties
    and count fully in both engines; every output is an exact bigint,
    no floats at all.

    Scale shape: the range-frame window and the per-channel aggregate
    share ONE channel-keyed exchange; nothing global, nothing
    collects. State per channel is bounded by window occupancy, the
    same bound a streaming rate limiter carries.
    """
    if window_s < 1:
        raise ValueError("window_s must be >= 1")
    if limit is not None and limit < 1:
        raise ValueError("limit must be >= 1 when set")
    # floor-of-seconds epoch (integer `div`, no float in the frame
    # key): handles NTZ inputs and sub-second timestamps identically
    # to DuckDB's epoch_us // 1000000
    epoch = F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 1000000")
    w = (
        Window.partitionBy(group_col)
        .orderBy(epoch)
        .rangeBetween(-(window_s - 1), 0)
    )
    rated = events.filter(F.col(ts_col).isNotNull()).withColumn(
        "_rate", F.count("*").over(w)
    )
    aggs = [
        F.count("*").alias("n_events"),
        F.max("_rate").cast("long").alias("peak_rate"),
    ]
    if limit is not None:
        aggs.append(
            F.sum((F.col("_rate") > limit).cast("long")).alias("n_over")
        )
    return rated.groupBy(group_col).agg(*aggs)


def ewma_surge(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
    n_lags: int = 8,
) -> DataFrame:
    """Truncated exponentially-weighted moving average of per-group
    bucket volumes, with a current-vs-EWMA surge ratio — the classic
    SOC volume-spike detector (a sudden 5× on `login_failure` while
    the EWMA remembers the calm baseline), complementary to
    :func:`cusum_level_shift` (slow drifts) and :func:`rate_peaks`
    (absolute windows).

    EWMA here is the DYADIC truncation Σⱼ₌₀..L₋₁ cnt₍ₜ₋ⱼ₎ / 2^(j+1)
    over the group's last L present buckets (α = ½, geometric weights;
    missing history at a series head contributes 0 — the cold-start
    convention, weights documented as summing to 1 − 2⁻ᴸ over a full
    window so the ratio is mildly conservative there). Bucket counts
    are integers and every weight is a power of two, so EACH term and
    EVERY partial sum is an exactly-representable dyadic rational —
    the whole EWMA is bit-identical on any IEEE-754 engine in ANY
    summation order, no fixed-point scaffolding needed. The only
    rounded division is the surge ratio cnt/ewma (round-6; ewma > 0
    whenever the row exists since the current bucket contributes
    cnt/2 ≥ ½).

    Lag semantics are ROW-based over buckets PRESENT in the data
    (empty buckets are skipped, not zero-filled — at 100 TB the dense
    bucket × group grid is exactly the materialization to avoid; a
    zero-filled variant is one sequence-join away if wanted).

    Scale shape: one map-side-combining (group, bucket) count, then a
    per-group window ordered by bucket — ONE exchange on group, one
    partition-local sort, L lag expressions in a single projection.
    """
    if not 1 <= n_lags <= 32:
        raise ValueError("n_lags must be in [1, 32]")
    # NULL ts/group rows are excluded HERE, not left to the caller: a
    # NULL bucket would sort first in the window and be consumed as
    # lag history, corrupting the group's earliest real EWMA terms.
    # cast-truncation (NOT floor) is deliberate: DuckDB's integer //
    # also truncates toward zero, so pre-1970 garbage buckets
    # identically on both engines.
    events = events.filter(
        F.col(ts_col).isNotNull() & F.col(group_col).isNotNull()
    )
    b = (
        (F.unix_timestamp(F.col(ts_col)) / F.lit(bucket_seconds))
        .cast("long")
        .alias("bucket")
    )
    counts = (
        events.select(F.col(group_col).alias("grp"), b)
        .groupBy("grp", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy("bucket")
    ewma = None
    for j in range(n_lags):
        term = (
            F.coalesce(F.lag("cnt", j).over(w), F.lit(0)).cast("double")
            / F.lit(float(2 ** (j + 1)))
        )
        ewma = term if ewma is None else ewma + term
    out = counts.select(
        F.col("grp").alias(group_col),
        # epoch-bucket ordinal, not a timestamp: engine-portable (no
        # session-timezone re-interpretation on either side) and the
        # natural partition key downstream.
        F.col("bucket").cast("long").alias("bucket"),
        F.col("cnt").cast("long").alias("cnt"),
        ewma.alias("ewma"),
    )
    return out.select(
        group_col,
        "bucket",
        "cnt",
        "ewma",
        F.round(F.col("cnt").cast("double") / F.col("ewma"), 6).alias(
            "surge_ratio"
        ),
    )


def seasonal_surge(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Seasonally-adjusted volume deviation: each (group, week,
    hour-of-week) cell's count against that group's SAME-hour-of-week
    baseline across all weeks — the triage that separates "9am Monday
    login spike" (normal) from "3am Sunday login spike at Monday
    volume" (not), which :func:`ewma_surge` (recency-relative) and
    ``hourly_seasonality`` (profile-only) each miss half of.

    ``ratio`` = observed · n_weeks / baseline_total — observed over
    the group-hour's per-week mean, with zero-weeks correctly counted
    through the GLOBAL distinct-week count (exact integers, ONE
    round-6 division). Calendar math is pure epoch-integer arithmetic
    (weeks are Thursday-aligned: epoch day 0 was a Thursday;
    hour_of_week = dow·24 + hour with dow = (days+4) mod 7 giving
    0 = Sunday) — no timezone/date functions to diverge on.

    Scale shape: one (group, week, how) map-side-combining count; the
    baseline is a re-agg of that frame on (group, how) (dimension-
    sized: groups × 168) joined back BROADCAST; n_weeks is a 1-row
    broadcast. No window, no Python.
    """
    e = F.unix_timestamp(F.col(ts_col))
    # cast-truncation (NOT floor) on every epoch division is
    # deliberate: DuckDB's integer // truncates toward zero too, so
    # pre-1970 garbage timestamps bucket identically on both engines
    # (both % operators are C-style dividend-signed as well).
    days = (e / F.lit(86400)).cast("long")
    cells = (
        events.filter(F.col(ts_col).isNotNull())
        .select(
            F.col(group_col).alias("grp"),
            ((e + F.lit(4 * 86400)) / F.lit(7 * 86400)).cast("long").alias("week"),
            (
                ((days + F.lit(4)) % F.lit(7)) * F.lit(24)
                + ((e / F.lit(3600)).cast("long") % F.lit(24))
            ).alias("hour_of_week"),
        )
        .groupBy("grp", "week", "hour_of_week")
        .agg(F.count("*").alias("cnt"))
    )
    n_weeks = cells.select("week").distinct().agg(
        F.count("*").alias("_nw")
    )
    baseline = cells.groupBy("grp", "hour_of_week").agg(
        F.sum("cnt").alias("baseline_total")
    )
    return (
        cells.join(F.broadcast(baseline), ["grp", "hour_of_week"])
        .crossJoin(F.broadcast(n_weeks))
        .select(
            F.col("grp").alias(group_col),
            F.col("week").cast("long").alias("week"),
            F.col("hour_of_week").cast("int").alias("hour_of_week"),
            F.col("cnt").cast("long").alias("cnt"),
            F.col("baseline_total").cast("long").alias("baseline_total"),
            F.round(
                (F.col("cnt") * F.col("_nw")).cast("double")
                / F.col("baseline_total").cast("double"),
                6,
            ).alias("ratio"),
        )
    )
