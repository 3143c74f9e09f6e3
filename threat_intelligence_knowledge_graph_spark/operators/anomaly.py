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

from pyspark.sql import DataFrame, functions as F


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
