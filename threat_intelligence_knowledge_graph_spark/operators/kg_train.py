"""KG-embedding training-data operators: filtered negative sampling.

Downstream of the pipeline's triple materialization, a knowledge-graph
embedding trainer (TransE / DistMult / RotatE family) needs, for every
positive ``(subj, pred, obj)``, k corrupted negatives drawn from the
entity universe with true triples filtered out — the "filtered" setting
of Bordes et al. 2013 (NeurIPS, "Translating Embeddings…"), which every
published KG-embedding benchmark uses. The reference repo materializes
triples for Neo4j (reference kg.py: graph assembly → Neo4jStore) but has
no trainer feed; this operator is the Spark-native bridge from its
triple table to an embedding-training corpus.

Design (all deterministic, engine-portable — no RNG, no seed drift):

- The entity dictionary gets a dense index via ``row_number() OVER
  (ORDER BY id)``. That window funnels through one task, but it runs
  over the DICTIONARY (dimension-sized — the same canonical dictionary
  the pipeline already broadcasts), never the triple stream; at 100 TB
  you index the dictionary once, persist it, and reuse it across
  epochs/batches.
- Each distinct positive explodes to k candidate rows; the corrupted
  side (head vs tail) and the replacement-entity index both come from
  the md5 family (``operators.packing._md5_u64`` — DuckDB
  ``md5_number_upper`` twin), keyed on ``subj|pred|obj|sample_idx``.
  Same triple + same k ⇒ byte-identical negatives on any engine, run,
  or partitioning — training sets are auditable and resumable.
- The replacement joins back through the indexed dictionary. With a
  dimension-sized dictionary this is a BROADCAST equi-join on the drawn
  index — the negative stream never shuffles until the filter step.
- Degenerate draws (replacement == the entity it replaces) are dropped,
  and the filtered setting drops corrupted triples that collide with a
  TRUE triple via one LEFT ANTI equi-join on (subj, pred, obj) — the
  only shuffle in the plan, keyed exactly like the pipeline's own
  triple dedup. Yield is therefore ≤ k per positive; the drop is a
  per-row deterministic fact (re-derivable), not silent data loss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .packing import _md5_u64


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    entities: DataFrame | None = None,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
    salt: str = "neg",
) -> DataFrame:
    """k filtered corrupted negatives per distinct positive triple.

    Returns ``(subj, pred, obj, corrupted, sample_idx, pos_subj,
    pos_obj)`` where (subj, pred, obj) is the NEGATIVE triple,
    ``corrupted`` is ``'head'`` or ``'tail'``, and pos_* carry the
    positive it was derived from. ``entities`` (one ``id`` column)
    defaults to the distinct subj ∪ obj universe of ``triples``.

    Deterministic: side and replacement are md5-derived from
    ``subj|pred|obj|sample_idx`` (salts ``{salt}side:`` / ``{salt}:``),
    so the draw is reproducible across engines and partitionings.
    Degenerate draws (replacement == original) and corrupted triples
    that exist as true triples are dropped (filtered setting), so the
    per-positive yield is ≤ k.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    true_t = (
        triples.select(
            F.col(subj_col).cast("string").alias("subj"),
            F.col(pred_col).cast("string").alias("pred"),
            F.col(obj_col).cast("string").alias("obj"),
        )
        .where(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        )
        .distinct()
    )
    if entities is None:
        ents = (
            true_t.select(F.col("subj").alias("id"))
            .union(true_t.select(F.col("obj").alias("id")))
            .distinct()
        )
    else:
        ents = entities.select(F.col("id").cast("string").alias("id")).distinct()
    # Bounded 1-row driver pull (the IVF-centroid precedent): the modulus
    # must be a literal so both engines compute the identical draw.
    n_ents = ents.count()
    if n_ents == 0:
        raise ValueError("entity universe is empty")
    # Dictionary-sized global window — see module docstring.
    ents_idx = ents.select(
        "id",
        (F.row_number().over(Window.orderBy("id")) - 1).alias("_eidx"),
    )
    key = F.concat_ws("|", "subj", "pred", "obj", "sample_idx")
    drawn = (
        true_t.withColumn(
            "sample_idx", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
        )
        .withColumn(
            "_side", (_md5_u64(key, salt + "side") % F.lit(2)).cast("int")
        )
        .withColumn(
            "_didx", (_md5_u64(key, salt) % F.lit(n_ents)).cast("long")
        )
    )
    neg = (
        drawn.join(
            F.broadcast(ents_idx),
            drawn["_didx"] == ents_idx["_eidx"],
            "inner",
        )
        .where(
            ((F.col("_side") == 0) & (F.col("id") != F.col("subj")))
            | ((F.col("_side") == 1) & (F.col("id") != F.col("obj")))
        )
        .select(
            F.when(F.col("_side") == 0, F.col("id"))
            .otherwise(F.col("subj"))
            .alias("n_subj"),
            F.col("pred"),
            F.when(F.col("_side") == 1, F.col("id"))
            .otherwise(F.col("obj"))
            .alias("n_obj"),
            F.when(F.col("_side") == 0, F.lit("head"))
            .otherwise(F.lit("tail"))
            .alias("corrupted"),
            "sample_idx",
            F.col("subj").alias("pos_subj"),
            F.col("obj").alias("pos_obj"),
        )
    )
    # Filtered setting: a corrupted triple that happens to be TRUE is not
    # a negative. One keyed anti-join — the plan's only shuffle. Renamed
    # projection breaks the shared-lineage column ambiguity (neg derives
    # from true_t).
    tt = true_t.select(
        F.col("subj").alias("t_subj"),
        F.col("pred").alias("t_pred"),
        F.col("obj").alias("t_obj"),
    )
    filtered = neg.join(
        tt,
        (neg["n_subj"] == tt["t_subj"])
        & (neg["pred"] == tt["t_pred"])
        & (neg["n_obj"] == tt["t_obj"]),
        "left_anti",
    )
    return filtered.select(
        F.col("n_subj").alias("subj"),
        "pred",
        F.col("n_obj").alias("obj"),
        "corrupted",
        "sample_idx",
        "pos_subj",
        "pos_obj",
    )
