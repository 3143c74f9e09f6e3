"""Exact order statistics — engine-deterministic percentiles.

Spark's ``percentile_approx`` and DuckDB's ``quantile_cont`` disagree
with each other (different sketches / interpolation), so a monitoring
query built on either is unverifiable cross-engine. The nearest-rank
definition — the value at ordered row ceil(q·n), ties broken by a
pinned id — is pure integer/comparison logic: both engines pick the
SAME physical row, no interpolation arithmetic to diverge on.

At 100 TB the shape is one window shuffle keyed by the group column
(per-group ordering only — no global sort) plus a group-sized count
agg joined back broadcast. For a single giant group the right tool is
a sketch (KMV/CMS in ``sketches.py``) or a two-pass range partition;
this operator is the exact path for dimension-sized groups (event
types, sources, languages), where per-group rows fit a partition
comfortably and the answer must be exact and reproducible.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    tiebreak_col: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-``group_col`` nearest-rank percentiles of ``value_col``.

    For each q in ``qs``: the value at row ceil(q·n) of the group's
    rows ordered by (value, tiebreak) — the classic nearest-rank
    percentile (exact, no interpolation). Output: one row per group
    with columns (group, n, p<q·100> …), q·100 rendered without a
    trailing .0 (0.5 → p50, 0.999 → p99_9).

    NULL values are excluded from the order statistics (SQL ORDER BY
    semantics for NULL differ between engines, and a NULL percentile
    is meaningless); a group that is all-NULL disappears.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"q must be in (0, 1], got {q}")

    rows = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(tiebreak_col).asc()
    )
    ranked = rows.select(
        F.col(group_col).alias("_g"),
        F.col(value_col).alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(Window.partitionBy(group_col)).alias("_n"),
    )
    aggs = [F.max("_n").alias("n")]
    for q in qs:
        name = f"p{q * 100:g}".replace(".", "_")
        # ceil(q·n) in EXACT integer arithmetic: q is read back as the
        # decimal the caller wrote (Fraction(str(0.07)) = 7/100, not
        # the IEEE neighbor), and ceil(num·n/den) = (num·n + den − 1)
        # div den — a double multiply would round 0.07·100 up to
        # 7.000000000000001 and pick rank 8 instead of 7.
        fr = Fraction(str(q))
        num, den = fr.numerator, fr.denominator
        target = F.expr(f"CAST(({num} * _n + {den - 1}) DIV {den} AS BIGINT)")
        aggs.append(
            F.max(F.when(F.col("_rn") == target, F.col("_v"))).alias(name)
        )
    return (
        ranked.groupBy(F.col("_g").alias(group_col))
        .agg(*aggs)
    )
