"""Watchlist alerting: indicator mentions × analyst watchlist.

The SOC workflow the KG feeds: an analyst maintains a (small) watchlist
of indicators — CVEs being exploited this week, known-bad domains — and
wants an alert row whenever a watched value is mentioned, plus a rollup
of how hot each watched indicator is. This is the join the pipeline's
mention stream exists to serve.

Scale shape: the watchlist is tiny by definition (10²-10⁵ rows) and is
explicitly broadcast — the mention stream (10¹²-turn scale) is never
shuffled; the rollup is ONE map-side-combining aggregate keyed by the
watched value. AQE cannot mis-plan this into a shuffle join because the
broadcast hint is explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def watchlist_alerts(
    mentions: DataFrame,
    watchlist: DataFrame,
    value_col: str = "value",
    conv_col: str = "conv_id",
) -> DataFrame:
    """Alert feed: one row per (watched value, conversation) mention —
    ``(value, conv_id)`` plus every extra mention column (ts, doc refs)
    passed through untouched. Inner join against the broadcast
    watchlist; a value on the watchlist but never mentioned produces no
    alert (use :func:`watchlist_summary` for coverage)."""
    wl = watchlist.select(F.col(value_col)).distinct()
    return mentions.join(F.broadcast(wl), value_col)


def watchlist_summary(
    mentions: DataFrame,
    watchlist: DataFrame,
    value_col: str = "value",
    conv_col: str = "conv_id",
) -> DataFrame:
    """Per-watched-value rollup INCLUDING silent entries:
    ``(value, n_mentions, n_convs)`` — a watched value with no mention
    reports ``(0, 0)`` (the coverage view; silence is signal too).
    Left join from the watchlist side, aggregate keyed by value."""
    agg = (
        mentions.join(
            F.broadcast(watchlist.select(F.col(value_col)).distinct()),
            value_col,
        )
        .groupBy(value_col)
        .agg(
            F.count("*").cast("long").alias("n_mentions"),
            F.count_distinct(F.col(conv_col)).cast("long").alias("n_convs"),
        )
    )
    return (
        watchlist.select(F.col(value_col))
        .distinct()
        .join(agg, value_col, "left")
        .select(
            value_col,
            F.coalesce(F.col("n_mentions"), F.lit(0)).cast("long").alias(
                "n_mentions"
            ),
            F.coalesce(F.col("n_convs"), F.lit(0)).cast("long").alias(
                "n_convs"
            ),
        )
    )
