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


def roc_auc(
    scored: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact tie-aware ROC-AUC of a binary scorer (the quality-filter /
    dedup-classifier ranking audit) via the Mann-Whitney rank-sum
    identity — no threshold sweep, no trapezoid approximation:

        AUC = (S2 - n_pos * (n_pos + 1)) / (2 * n_pos * n_neg)

    where ``S2`` is twice the sum of the positives' average ranks under
    ascending score order (ties get the tied group's average rank — the
    standard mid-rank convention, equal to counting tied pos/neg pairs
    as half-concordant).

    Exactness: scores are fixed-pointed to integer millionths
    (round(s·1e6) — repo round-6 discipline recovers the intended
    integer), ranks come from cumulative integer counts over the
    DISTINCT-score groups, and twice-the-average-rank of a tied group
    (2·cnt_lt + n_s + 1) is integral, so S2 is an exact bigint and the
    emitted AUC is ONE round-6 double division. NULL scores/labels are
    excluded.

    Scale shape: one map-side-combining aggregate over distinct score
    values (≤ 1e6+1 groups under millionth quantization — bounded by
    the quantization, NOT the row count), then a single-partition
    running sum over those ≤ 1e6 group rows (a dimension-sized window,
    same posture as the percentile/histogram entries), then one global
    agg. Row data never leaves its scan partition unaggregated.
    """
    m = F.round(F.col(score_col) * F.lit(1_000_000)).cast("long")
    y = F.col(label_col).cast("long")
    groups = (
        scored.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .select(m.alias("_m"), y.alias("_y"))
        .groupBy("_m")
        .agg(F.count("*").alias("_n"), F.sum("_y").alias("_np"))
    )
    from pyspark.sql import Window

    w = (
        Window.orderBy("_m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = groups.select(
        "_m",
        "_n",
        "_np",
        (F.sum("_n").over(w) - F.col("_n")).alias("_lt"),
    )
    # 2 × avg rank of the tied group at score m = 2·cnt_lt + n_group + 1.
    # decimal(38,0)-widened (the simpson/calibration discipline): at
    # multi-billion-row scale S2 ~ n_pos·2n exceeds int64 and would
    # silently wrap as a long.
    s2 = cum.select(
        (F.col("_np") * (F.lit(2) * F.col("_lt") + F.col("_n") + F.lit(1)))
        .cast("decimal(38,0)")
        .alias("_s2"),
        "_n",
        "_np",
    ).agg(
        F.sum("_s2").alias("_S2"),
        F.sum("_np").alias("n_pos"),
        (F.sum("_n") - F.sum("_np")).alias("n_neg"),
    )
    np38 = F.col("n_pos").cast("decimal(19,0)")
    nn38 = F.col("n_neg").cast("decimal(19,0)")
    return s2.select(
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(
            F.when(
                (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
                (F.col("_S2") - np38 * (np38 + F.lit(1)))
                .cast("double")
                / (F.lit(2) * np38 * nn38).cast("double"),
            ),
            6,
        ).alias("auc"),
    )


def pr_curve(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    n_thresholds: int = 10,
) -> DataFrame:
    """Precision/recall/F1 at ``n_thresholds`` equal-width score
    thresholds (t = i/n for i in 0..n-1, predict positive when
    score ≥ t) — the operating-point table behind a PR curve, for
    picking a quality-filter cutoff with eyes open.

    Exactness: scores fixed-pointed to integer millionths, rows
    bucketed once by the exact integer test (m·n) div 1e6 (correct for
    EVERY n — see the inline note), per-bucket (n, n_pos) aggregated
    onto a DENSE threshold spine (every threshold emits a row, even
    when its score bucket is empty — a consumer picking a cutoff needs
    those rows and their cumulations are well-defined), and the
    ≥-threshold cumulations run DESCENDING over exactly
    ``n_thresholds`` rows — every TP/FP/FN is an exact bigint and each
    emitted ratio is ONE round-6 double division (NULL when undefined:
    precision at a threshold nothing clears, F1 when every component
    is zero).

    Scale shape: one map-side-combining aggregate over ≤ n_thresholds
    buckets joined to the n-row spine, then window + arithmetic over
    those few rows. Thresholds are inclusive: TP(t) counts precisely
    the rows whose quantized score m satisfies m·n ≥ t·n·1e6, i.e.
    score ≥ t under the quantization.
    """
    if not 2 <= n_thresholds <= 1000:
        raise ValueError("n_thresholds must be in [2, 1000]")
    # bucket i ⟺ m·n ≥ i·1e6 and < (i+1)·1e6: (m·n) div 1e6 is exact
    # for EVERY n, divisor of 1e6 or not (a plain m div (1e6//n) puts
    # boundary scores in the wrong bucket when n does not divide 1e6)
    rows = (
        scored.filter(F.col(score_col).isNotNull() & F.col(label_col).isNotNull())
        .select(
            F.least(
                F.expr(
                    f"(cast(round({score_col} * 1000000) as bigint)"
                    f" * {n_thresholds}) div 1000000"
                ),
                F.lit(n_thresholds - 1),
            ).alias("bucket"),
            F.col(label_col).cast("long").alias("_y"),
        )
    )
    # dense threshold spine: every threshold gets a row even when its
    # score bucket is empty (the cumulations below are well-defined
    # there, and a consumer picking a cutoff needs the row)
    spine = (
        scored.sparkSession.range(0, n_thresholds)
        .select(F.col("id").cast("long").alias("bucket"))
    )
    per = spine.join(
        rows.groupBy("bucket").agg(
            F.count("*").alias("_n"), F.sum("_y").alias("_np")
        ),
        "bucket",
        "left",
    ).select(
        "bucket",
        F.coalesce(F.col("_n"), F.lit(0)).alias("_n"),
        F.coalesce(F.col("_np"), F.lit(0)).alias("_np"),
    )
    from pyspark.sql import Window

    wdesc = (
        Window.orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = per.select(
        "bucket",
        F.sum("_np").over(wdesc).alias("tp"),
        (F.sum("_n").over(wdesc) - F.sum("_np").over(wdesc)).alias("fp"),
        (F.sum("_np").over(tot) - F.sum("_np").over(wdesc)).alias("fn"),
    )
    prec = _ratio(F.col("tp"), F.col("tp") + F.col("fp"))
    rec = _ratio(F.col("tp"), F.col("tp") + F.col("fn"))
    return cum.select(
        F.round(
            F.col("bucket").cast("double") / F.lit(float(n_thresholds)), 6
        ).alias("threshold"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(
                (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")) != 0,
                (F.lit(2) * F.col("tp")).cast("double")
                / (F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")).cast(
                    "double"
                ),
            ),
            6,
        ).alias("f1"),
    )
