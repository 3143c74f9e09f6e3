"""Extraction-quality evaluation — the metric the pipeline is graded on.

The reference ships an evaluation harness
(`/root/reference/evaluation/model_evaluation.py:129-138`) that records
node/relationship COUNTS per model run and its README admits counts are
not quality (`/root/reference/README.md:119`). The acceptance bar for
this rebuild, by contrast, is set-level agreement: emitted
(subj, pred, obj) triples must match the reference extractor's at
P/R >= 0.95. These operators make that metric a first-class DISTRIBUTED
computation, so a 100 TB run can grade itself against a gold slice
without collecting either side:

- :func:`eval_triples` — corpus-level TP/FP/FN + precision/recall/F1
  under set semantics.
- :func:`eval_triples_by_pred` — the same, per predicate, so a
  regression in one relation rule (e.g. RESOLVES_TO) is visible even
  when the aggregate still clears the bar.
- :func:`eval_clusters_pairwise` — pairwise precision/recall/F1 for an
  entity-canonicalization assignment vs a gold clustering (the stage-D
  twin of triple P/R), via the contingency-cell identity — no pair set
  is ever materialized.

Numeric determinism: every count is an exact integer produced by keyed
aggregation (binomial terms n*(n-1)/2 stay integral), and each emitted
ratio is ONE double division of two integers — exactly rounded and
bit-identical on any IEEE-754 engine, so these are hash-checkable
against a SQL oracle. Zero denominators yield NULL (undefined), never
a sentinel that could be mistaken for a score.

Scale shape: set-distinct both sides, one equi-join on the composite
key, count-aggregate — all keyed shuffles with map-side combining. A
gold slice is small by construction (it is labeled data): broadcast it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TRIPLE = ["subj", "pred", "obj"]


def _ratio(num, den):
    """num / den as ONE double division, NULL when den == 0."""
    return F.when(den != 0, num.cast("double") / den.cast("double"))


def _f1(p, r):
    """Harmonic mean of two already-computed doubles; NULL-safe."""
    return F.when(p + r != 0, F.lit(2.0) * p * r / (p + r))


def eval_triples(
    predicted: DataFrame,
    gold: DataFrame,
    broadcast_gold: bool = False,
) -> DataFrame:
    """One row: (n_predicted, n_gold, tp, fp, fn, precision, recall, f1)
    under SET semantics over (subj, pred, obj).

    Duplicates on either side are collapsed first (the reference store
    MERGEs, so multiplicity is storage detail, not extraction quality).
    ``broadcast_gold`` pins a BroadcastHashJoin when the gold slice is
    known-small — the normal case: gold is hand-labeled.
    """
    p = predicted.select(*_TRIPLE).distinct()
    g = gold.select(*_TRIPLE).distinct().withColumn("_g", F.lit(1))
    # LEFT outer (not full outer): a full-outer join is not
    # broadcastable in Spark, a left outer with the gold side on the
    # right is — n_gold comes from a separate 1-row aggregate instead.
    # No driver-side actions, so the result frame composes
    # (checkpointable, unionable across gold slices).
    j = p.join(
        F.broadcast(g) if broadcast_gold else g, _TRIPLE, "left_outer"
    )
    counts = j.agg(
        F.count("*").alias("n_predicted"),
        F.count("_g").alias("tp"),
    )
    base = counts.crossJoin(
        g.agg(F.count("*").alias("n_gold"))
    ).select(
        "n_predicted",
        "n_gold",
        "tp",
        (F.col("n_predicted") - F.col("tp")).alias("fp"),
        (F.col("n_gold") - F.col("tp")).alias("fn"),
    )
    prec = _ratio(F.col("tp"), F.col("n_predicted"))
    rec = _ratio(F.col("tp"), F.col("n_gold"))
    return base.select(
        "*",
        prec.alias("precision"),
        rec.alias("recall"),
        _f1(prec, rec).alias("f1"),
    )


def eval_triples_by_pred(
    predicted: DataFrame,
    gold: DataFrame,
) -> DataFrame:
    """(pred, n_predicted, n_gold, tp, precision, recall, f1), one row
    per predicate appearing on EITHER side — the per-relation-rule
    report card. A predicate extracted but never gold has recall NULL
    (no gold to recall); one gold but never extracted has precision
    NULL.

    Shape: distinct both sides, count per pred, plus a tp count from
    one composite-key semi-join — then a pred-keyed full outer join of
    three small per-predicate frames (rows = |predicate vocabulary|,
    dozens at most: dimension-sized).
    """
    p = predicted.select(*_TRIPLE).distinct()
    g = gold.select(*_TRIPLE).distinct()
    n_p = p.groupBy("pred").agg(F.count("*").alias("n_predicted"))
    n_g = g.groupBy("pred").agg(F.count("*").alias("n_gold"))
    tp = (
        p.join(g, _TRIPLE, "left_semi")
        .groupBy("pred")
        .agg(F.count("*").alias("tp"))
    )
    base = (
        n_p.join(n_g, "pred", "full_outer")
        .join(tp, "pred", "full_outer")
        .na.fill({"n_predicted": 0, "n_gold": 0, "tp": 0})
    )
    prec = _ratio(F.col("tp"), F.col("n_predicted"))
    rec = _ratio(F.col("tp"), F.col("n_gold"))
    return base.select(
        "pred",
        "n_predicted",
        "n_gold",
        "tp",
        prec.alias("precision"),
        rec.alias("recall"),
        _f1(prec, rec).alias("f1"),
    )


def eval_clusters_pairwise(
    predicted: DataFrame,
    gold: DataFrame,
    item_col: str = "item",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """One row: (n_items, pred_pairs, gold_pairs, tp_pairs, precision,
    recall, f1) — pairwise clustering agreement between a predicted
    assignment and a gold one (both frames: one row per item, its
    cluster id; items must coincide — extra/missing items raise).

    Pairwise P/R is THE standard entity-resolution metric: precision =
    fraction of same-predicted-cluster pairs that are same-gold-cluster,
    recall = the converse. Computed via the contingency-table identity
    — for each (pred_cluster, gold_cluster) cell of size n, the cell
    contributes C(n,2) true-positive pairs — so the computation is
    three keyed count-aggregations over cells/clusters and NEVER forms
    a pair: a 10^9-item clustering with a hot mega-cluster would
    otherwise explode quadratically. All terms are exact integers
    (bigint-safe up to ~4.3e9-item clusters: C(n,2) < 2^63).
    """
    p = predicted.select(
        F.col(item_col).alias("item"), F.col(cluster_col).alias("pc")
    )
    g = gold.select(
        F.col(item_col).alias("item"), F.col(cluster_col).alias("gc")
    )
    joined = p.join(g, "item", "full_outer")
    bad = joined.filter(F.col("pc").isNull() | F.col("gc").isNull()).count()
    if bad:
        raise ValueError(
            f"predicted and gold item sets differ on {bad} items"
        )

    def _pairs(n):
        # n*(n-1) is always even; shiftright keeps the arithmetic in
        # exact bigints (a double `/ 2` would lose bits past 2^53).
        return F.shiftright(n * (n - F.lit(1)), 1)

    cells = joined.groupBy("pc", "gc").agg(F.count("*").alias("n"))
    agg = cells.agg(
        F.sum("n").alias("n_items"),
        F.sum(_pairs(F.col("n"))).alias("tp_pairs"),
    )
    pp = (
        cells.groupBy("pc")
        .agg(F.sum("n").alias("n"))
        .agg(F.sum(_pairs(F.col("n"))).alias("pred_pairs"))
    )
    gp = (
        cells.groupBy("gc")
        .agg(F.sum("n").alias("n"))
        .agg(F.sum(_pairs(F.col("n"))).alias("gold_pairs"))
    )
    base = agg.crossJoin(pp).crossJoin(gp)  # three 1-row frames
    prec = _ratio(F.col("tp_pairs"), F.col("pred_pairs"))
    rec = _ratio(F.col("tp_pairs"), F.col("gold_pairs"))
    return base.select(
        "n_items",
        "pred_pairs",
        "gold_pairs",
        "tp_pairs",
        prec.alias("precision"),
        rec.alias("recall"),
        _f1(prec, rec).alias("f1"),
    )


def calibration_table(
    scored: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability diagram + Brier decomposition input for a
    probabilistic scorer (the quality-filter model audit: a filter
    whose 0.9-bucket is only 60% positive silently over-prunes):
    rows bucketed by predicted probability into ``n_bins`` equal-width
    bins, one output row per non-empty bin — (bin, n, mean_pred,
    frac_pos, brier) where brier is the bin's mean squared error
    Σ(p − y)²/n.

    Exactness: probabilities are fixed-pointed to exact integer
    MILLIONTHS first (round(p·1e6) — the inputs are round-6 scores by
    repo discipline, so this recovers the intended integer exactly;
    a raw ``floor(p·n_bins)`` would misbucket p = 0.3 whose double is
    below 3/10), the bin is an integer div, sums of millionths and of
    squared-millionths are exact bigints/decimals, and each emitted
    ratio is ONE round-6 division. p = 1.0 folds into the top bin.
    NULL probabilities or labels are excluded (unscored rows are a
    coverage question, not a calibration one).

    Scale shape: ONE map-side-combining keyed aggregate over ≤ n_bins
    groups; everything before it is scan-local.
    """
    if not 2 <= n_bins <= 100:
        raise ValueError("n_bins must be in [2, 100]")
    milli = F.round(F.col(prob_col) * F.lit(1_000_000)).cast("long")
    y = F.col(label_col).cast("long")
    width = 1_000_000 // n_bins
    rows = (
        scored.filter(
            F.col(prob_col).isNotNull() & F.col(label_col).isNotNull()
        )
        .select(milli.alias("_m"), y.alias("_y"))
        # integer `div`, not float division-and-truncate: same operator
        # the DuckDB oracle's `//` performs
        .select(
            F.least(F.expr(f"_m div {width}"), F.lit(n_bins - 1)).alias("bin"),
            "_m",
            "_y",
        )
    )
    err = F.col("_m") - F.col("_y") * F.lit(1_000_000)
    agg = rows.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.sum("_m").alias("_sm"),
        F.sum("_y").alias("_sy"),
        F.sum((err * err).cast("decimal(38,0)")).alias("_se"),
    )
    return agg.select(
        F.col("bin").cast("int").alias("bin"),
        F.col("n").cast("long").alias("n"),
        F.round(F.col("_sm").cast("double") / (F.col("n") * F.lit(1e6)), 6).alias(
            "mean_pred"
        ),
        F.round(F.col("_sy").cast("double") / F.col("n").cast("double"), 6).alias(
            "frac_pos"
        ),
        F.round(
            F.col("_se").cast("double") / (F.col("n").cast("double") * F.lit(1e12)),
            6,
        ).alias("brier"),
    )
