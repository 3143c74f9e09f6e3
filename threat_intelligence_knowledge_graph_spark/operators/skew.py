"""Explicit skew handling for hot keys (north rule: "AQE skew handling on
hot entities like common CVEs").

Three layers of defense in this engine, outermost first:

1. **Partial aggregation** — every groupBy/distinct in the pipeline is a
   hash aggregate, so Catalyst's map-side combine absorbs most hot-key
   duplicates before the shuffle (free).
2. **AQE skew-join splitting** — enabled in session.py for residual join
   skew at runtime (free).
3. **Salted two-phase aggregation (this module)** — for pathological
   heavy hitters where even the *combined* per-key partial results
   overwhelm one reducer (a CVE appearing in 10^9 conversations at
   10^12-turn scale): phase 1 aggregates per (key, salt) over
   ``n_salts`` shards, phase 2 merges the ≤ n_salts shard rows per key.
   Both phases are partial-agg-friendly; no reducer ever sees more than
   total/n_salts of a hot key's rows.

Salt = ``pmod(monotonically_increasing_id(), n_salts)`` — a row's salt is
independent of its VALUES (a hash-of-columns salt degenerates to a pure
function of the key whenever the grouping keys cover all columns, which
silently disables the protection for exactly the hot-key rollups this
module exists for). The id is deterministic given the input partitioning;
results are partition-independent either way since the salt only shapes
the intermediate grouping.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _row_salt(n_salts: int) -> Column:
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))


def salted_count(df: DataFrame, keys: list[str], n_salts: int = 64) -> DataFrame:
    """``df.groupBy(keys).count()`` with two-phase salting."""
    phase1 = (
        df.withColumn("_salt", _row_salt(n_salts))
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return phase1.groupBy(*keys).agg(F.sum("_partial").alias("count"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 64,
) -> DataFrame:
    """Generic two-phase salted aggregation.

    ``aggs`` maps output column name → (phase1 aggregate over input rows,
    phase2 aggregate over phase1 partials aliased by the same name).
    Only decomposable aggregates are valid (sum/count/min/max — anything
    with an associative merge).
    """
    phase1 = (
        df.withColumn("_salt", _row_salt(n_salts))
        .groupBy(*keys, "_salt")
        .agg(*[p1.alias(name) for name, (p1, _p2) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[p2.alias(name) for name, (_p1, p2) in aggs.items()]
    )


def hot_entity_counts(triples: DataFrame, n_salts: int = 64) -> DataFrame:
    """Per-entity mention degree over the triple table, salted — the
    canonical hot-CVE rollup at 10^12 scale."""
    mentions = triples.select(F.col("subj").alias("entity")).unionAll(
        triples.select(F.col("obj").alias("entity"))
    )
    return salted_count(mentions, ["entity"], n_salts=n_salts)
