"""Training-data curation plan: the composed document pipeline.

One call chains the individually-oracled operators into the standard
pretraining-corpus assembly flow:

    quality filter → language filter → exact dedup → near-dup dedup
    → benchmark decontamination → deterministic split → token counts
    → sequence packing

Each stage is the already-tested operator (``operators/text_quality``,
``operators/dedup``, ``operators/decontaminate``, ``operators/packing``)
— this module adds only composition and per-stage survivor metrics.

Scale notes: every stage is a Catalyst plan over the previous one; the
whole chain materializes in the caller's single action. The metrics
frame is LAZY — each stage row is an aggregate over that stage's frame,
so collecting metrics re-executes lineage unless stages are retained:
pass ``cache_stages=True`` for a one-shot job that materializes both
outputs (``jobs/curate_corpus.py`` does), or checkpoint each stage to a
table at 100 TB (the ``plans/pipeline.py`` pattern) where cached frames
would not fit storage memory.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from ..operators.decontaminate import decontaminate
from ..operators.dedup import exact_dedup, minhash_dedup
from ..operators.packing import pack_documents, split_by_hash
from ..operators.text_quality import language_id, quality_score, token_counts


def curate_documents(
    docs: DataFrame,
    eval_items: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    languages: tuple[str, ...] = ("en",),
    near_dup_threshold: float = 0.8,
    decontaminate_n: int = 8,
    train_frac: float = 0.9,
    token_budget: int | None = 2048,
    shard_col: str | None = None,
    cache_stages: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(curated, metrics)``.

    ``curated``: (id, text, quality, lang_pred, split, n_tokens[,
    pack_id]) — pack ids are local to (split[, shard]) so packing never
    funnels through one task (see ``pack_documents``).
    ``metrics``: (stage, n_docs) survivor counts per stage, in order.

    ``cache_stages=True`` caches each stage frame so collecting
    ``metrics`` (and the final write) does not re-execute the upstream
    chain once per stage row — the right setting for a one-shot job that
    will materialize both outputs (``jobs/curate_corpus.py``). Leave
    False when the caller checkpoints stages to tables instead (the
    100 TB pattern — cached stages must fit cluster storage memory).
    """

    def _stage(frame: DataFrame) -> DataFrame:
        return frame.cache() if cache_stages else frame

    stages: list[tuple[str, DataFrame]] = [("input", _stage(docs))]

    q = quality_score(docs, id_col, text_col)
    d = _stage(docs.join(q.filter(F.col("quality") >= min_quality), id_col))
    stages.append(("quality", d))

    lang = language_id(d, id_col, text_col)
    d = _stage(d.join(lang.filter(F.col("lang_pred").isin(*languages)), id_col))
    stages.append(("language", d))

    d = _stage(exact_dedup(d, id_col, text_col))
    stages.append(("exact_dedup", d))

    kept = minhash_dedup(
        d.select(id_col, text_col),
        id_col,
        text_col,
        jaccard_threshold=near_dup_threshold,
    ).select(id_col)
    d = _stage(d.join(kept, id_col, "left_semi"))
    stages.append(("near_dedup", d))

    if eval_items is not None:
        d = decontaminate(
            d, eval_items, n=decontaminate_n, doc_id=id_col, doc_text=text_col
        )
        d = _stage(d)
        stages.append(("decontaminate", d))

    d = split_by_hash(d, id_col, train_frac)
    d = d.join(
        token_counts(d.select(id_col, text_col), id_col, text_col).select(
            id_col, F.col("ws_tokens").cast("long").alias("n_tokens")
        ),
        id_col,
    )

    if token_budget is not None:
        pack_shard = F.concat_ws(
            "|", "split", *( [shard_col] if shard_col else [] )
        )
        packed = pack_documents(
            d.withColumn("_pack_shard", pack_shard),
            token_budget,
            id_col=id_col,
            tokens_col="n_tokens",
            shard_col="_pack_shard",
        ).select(id_col, "pack_id")
        d = d.join(packed, id_col)

    metrics = reduce(
        DataFrame.union,
        [
            frame.agg(
                F.lit(i).alias("stage_idx"),
                F.lit(name).alias("stage"),
                F.count("*").alias("n_docs"),
            )
            for i, (name, frame) in enumerate(stages)
        ],
    )
    return d, metrics


def batch_run_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> str:
    """Deterministic run id for an ingest batch: XOR of per-row
    ``xxhash64(id, text)`` plus the row count. Order- and
    partitioning-independent (XOR is commutative), so a crash-rerun of
    the SAME batch derives the same id and resumes, while a DIFFERENT
    batch (even one reusing doc ids) gets a fresh id. This is the safe
    default for ``curate_increment``'s resume contract — a fixed id
    reused across different batches makes the second batch compute
    against the pre-first-batch state and silently skip its own
    ``committed()``-guarded appends."""
    row = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64(F.col(id_col).cast("string"), F.col(text_col))),
            F.lit(0),
        ).alias("fp"),
    ).collect()[0]
    return f"batch-{row['n']}-{row['fp'] & 0xFFFFFFFFFFFFFFFF:016x}"


def curate_increment(
    spark,
    new_docs: DataFrame,
    catalog,
    eval_items: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    languages: tuple[str, ...] = ("en",),
    near_dup_threshold: float = 0.8,
    decontaminate_n: int = 8,
    run_id: str | None = None,
    corpus_table: str = "curated",
    index_table: str = "curated_minhash_index",
) -> tuple[DataFrame, DataFrame]:
    """Steady-state ingest curation: admit a NEW batch against the
    already-curated corpus without re-processing it.

    Per batch the work is O(batch) + O(dup-graph): quality/language
    filters scan only the batch; exact dedup joins the batch's content
    hashes against the known set (one semi-join); near-dup uses the
    persisted MinHash band index
    (``minhash_incremental_near_duplicates`` — the batch is shingled
    once and joined only into touched buckets); contamination checks
    the batch against the broadcast eval set. Accepted rows and the
    batch's band-index rows are APPENDED (``tableio.append`` —
    per-batch files only) so the next increment sees them.

    Besides the corpus and band index, two small side tables make the
    admission decision match batch mode exactly:

    - ``<corpus_table>_shadow`` (id, text): docs that REACHED the dedup
      stage but were rejected by near-dup or decontamination. In batch
      mode those docs participate in dedup (a contaminated doc absorbs
      its later duplicates before decon removes it; a dropped near-dup
      can chain two other docs into one cluster) — so their content
      hashes stay in the exact-dedup anti-join set, and their band rows
      stay in the index, with the shadow providing the text that pair
      verification re-shingles.
    - ``<corpus_table>_pairs`` (a, b): every verified near-dup pair
      seen so far — the duplicate graph of all dedup-reaching docs.
      Connected components run over this graph plus the batch's new
      pairs, so cross-batch transitive chains (1–3 in batch one, 3–2 in
      batch two) collapse to the same component min that batch mode
      finds. CC cost is proportional to the duplicate graph, not the
      corpus.

    Returns ``(accepted, rejected)`` where ``rejected`` carries a
    ``reason`` column ('quality' | 'language' | 'exact_dup' |
    'near_dup' | 'contaminated') — reject-don't-drop, the quarantine
    philosophy of ``sources/ingest.py`` applied to curation.

    Crash safety: the four table appends are not one atomic commit, so
    every read excludes this ``run_id``'s own commits and every append
    is ``committed()``-guarded — rerunning the batch with the same
    ``run_id`` after a crash anywhere between the appends recomputes
    the identical decisions against the pre-run state and fills in only
    the missing commits (the pipeline runner's resume-log discipline).
    The flip side: the SAME run_id must never be reused for a DIFFERENT
    batch (it would read the pre-first-batch state and skip its own
    appends), so ``run_id=None`` (the default) derives a content
    fingerprint via ``batch_run_id`` — same batch resumes, different
    batches always get distinct ids.

    Equivalence: when ingest ids are monotone across batches (the
    append-only feed invariant), every ADMISSION decision matches
    batch-mode ``curate_documents`` over the union — including the
    decon/dedup and chained-near-dup cross-batch corners — asserted by
    test_curation.py. The one inherent divergence of any append-only
    system remains: a previously-admitted doc is never retroactively
    revoked when a later bridge doc merges two old clusters (batch mode
    would keep only the merged component's min); the bridge doc itself
    is still rejected.
    """
    from ..operators.dedup import (
        minhash_band_index,
        minhash_incremental_near_duplicates,
    )

    if run_id is None:
        run_id = batch_run_id(new_docs, id_col, text_col)

    def _tag(df: DataFrame, reason: str) -> DataFrame:
        return df.select(id_col, text_col).withColumn("reason", F.lit(reason))

    rejects: list[DataFrame] = []

    # The batch is small by definition (one ingest increment), and every
    # stage frame below feeds BOTH the accept chain and a reject tag.
    # localCheckpoint (not persist): each stage's plan references the
    # previous stage's plan several times over, so the LOGICAL plan — and
    # with it Catalyst analysis time per action — grows multiplicatively;
    # eager lineage truncation keeps every downstream action's plan flat
    # (the same reason the CC loop checkpoints per iteration).
    new_docs = new_docs.localCheckpoint(eager=True)
    q = quality_score(new_docs, id_col, text_col)
    ok_q = new_docs.join(q.filter(F.col("quality") >= min_quality), id_col).localCheckpoint(eager=True)
    rejects.append(_tag(new_docs.join(ok_q.select(id_col), id_col, "left_anti"), "quality"))

    lang = language_id(ok_q, id_col, text_col)
    d = ok_q.join(
        lang.filter(F.col("lang_pred").isin(*languages)), id_col
    ).localCheckpoint(eager=True)
    rejects.append(_tag(ok_q.join(d.select(id_col), id_col, "left_anti"), "language"))

    shadow_table = corpus_table + "_shadow"
    pairs_table = corpus_table + "_pairs"

    # "Known" = every distinct-content doc that has ever reached the
    # dedup stage: the curated corpus PLUS the shadow of dedup-visible
    # rejects (near-dup / contaminated). Batch mode dedups against all
    # of them, so the increment must too.
    # All reads exclude this run_id and all appends are committed()-
    # guarded: a rerun after a crash between the four table appends
    # recomputes the identical decisions against the PRE-run state and
    # fills in only the missing commits — without this, a crash after
    # the corpus append would make the rerun tag its own rows exact_dup
    # and permanently lose their band-index/pairs rows.
    known_parts = []
    if catalog.exists_before(corpus_table, run_id):
        known_parts.append(
            catalog.read(spark, corpus_table, exclude_run_id=run_id).select(
                id_col, text_col
            )
        )
    if catalog.exists_before(shadow_table, run_id):
        known_parts.append(
            catalog.read(spark, shadow_table, exclude_run_id=run_id).select(
                id_col, text_col
            )
        )
    empty_docs = d.select(id_col, text_col).limit(0)
    known = reduce(DataFrame.union, known_parts) if known_parts else empty_docs

    # Exact dedup: within-batch (min id per content) AND against the
    # known set (hash anti-join — never rescans stored text beyond one
    # md5 projection); one reject tag covers both.
    deduped = exact_dedup(d, id_col, text_col)
    known_hashes = known.select(F.md5(F.col(text_col)).alias("_h")).distinct()
    survivors = deduped.join(
        known_hashes, F.md5(F.col(text_col)) == F.col("_h"), "left_anti"
    )
    rejects.append(
        _tag(d.join(survivors.select(id_col), id_col, "left_anti"), "exact_dup")
    )
    d = survivors.localCheckpoint(eager=True)

    from ..operators.minhash import connected_components

    index = (
        catalog.read(spark, index_table, exclude_run_id=run_id)
        if catalog.exists_before(index_table, run_id)
        else minhash_band_index(empty_docs, id_col, text_col)
    )
    pairs, idx_rows, _dropped = minhash_incremental_near_duplicates(
        known,
        index,
        d.select(id_col, text_col),
        id_col,
        text_col,
        jaccard_threshold=near_dup_threshold,
    )
    pairs = pairs.select("a", "b").localCheckpoint(eager=True)
    # Connected components over the FULL duplicate graph (all persisted
    # pairs + the batch's), not just batch-touching pairs: near-dup
    # similarity is not transitive-free — J(1,3), J(2,3) >= t with
    # J(1,2) < t chains 1-3-2 into one cluster even when 3 was itself
    # rejected in an earlier batch, and batch mode keeps only the
    # component min. The pairs table is the whole history, so CC here
    # reproduces batch-mode components exactly (monotone ids ⇒ old
    # components keep their old min).
    all_pairs = (
        catalog.read(spark, pairs_table, exclude_run_id=run_id)
        .select("a", "b")
        .union(pairs)
        if catalog.exists_before(pairs_table, run_id)
        else pairs
    )
    new_ids = d.select(F.col(id_col).alias("_nid"))
    components = connected_components(all_pairs)
    drop = (
        components.filter(F.col("id") != F.col("component"))
        .select(F.col("id").alias(id_col))
        .join(new_ids, F.col(id_col) == F.col("_nid"), "left_semi")
        .distinct()
    )
    kept = d.join(drop, id_col, "left_anti").localCheckpoint(eager=True)
    rejects.append(_tag(d.join(kept.select(id_col), id_col, "left_anti"), "near_dup"))
    dedup_reaching = d  # exact-dedup survivors: accepted ∪ shadow-to-be
    d = kept

    if eval_items is not None:
        clean = decontaminate(
            d, eval_items, n=decontaminate_n, doc_id=id_col, doc_text=text_col
        )
        rejects.append(_tag(d.join(clean.select(id_col), id_col, "left_anti"), "contaminated"))
        d = clean

    # Eager checkpoint: accepted feeds several consumers (corpus
    # append, shadow anti-join, the caller's count/inspection) — without
    # it the post-dedup tail (incl. decontamination) re-executes per
    # consumer.
    accepted = d.select(id_col, text_col, "quality", "lang_pred").localCheckpoint(
        eager=True
    )
    def _commit(df, table, stage):
        # idempotent under rerun: a stage that already committed for
        # this run_id is skipped, the missing ones are filled in
        if not catalog.committed(table, run_id, stage):
            catalog.append(df, table, run_id=run_id, stage=stage)

    _commit(accepted, corpus_table, "curate")
    # Band rows for EVERY exact-dedup survivor (accepted AND the
    # near-dup/decon rejects) — batch mode lets all of them generate
    # pairs, so future batches must see all of them in the index.
    _commit(idx_rows, index_table, "index")
    shadow_new = dedup_reaching.select(id_col, text_col).join(
        accepted.select(id_col), id_col, "left_anti"
    )
    _commit(shadow_new, shadow_table, "shadow")
    _commit(pairs, pairs_table, "pairs")
    rejected = reduce(DataFrame.union, rejects)
    return accepted, rejected
