"""spark-submit entry point: documents parquet → curated training corpus.

Runs the composed curation pipeline (``plans/curation.py``): quality
filter → language filter → exact dedup → MinHash near-dup dedup →
benchmark decontamination (if ``--eval`` is given) → deterministic
train/val split → token counts → per-(split[, shard]) sequence packing.

Invocation::

    spark-submit --py-files tikg_pyfiles.zip jobs/curate_corpus.py \
        --input s3a://bucket/documents/ --eval /data/benchmarks.parquet \
        --output /mnt/shared/curated --token-budget 4096 --shard-col date_bucket

Local::

    python jobs/curate_corpus.py --input /root/testdata/sf0.001/documents.parquet \
        --output /tmp/curated

Writes ``<output>/curated.parquet`` and ``<output>/metrics.parquet``
(per-stage survivor counts) and prints a one-line JSON summary.
``--eval`` must point to a (eval_id, text) parquet; it is broadcast, so
keep it benchmark-sized (the operator is built for a small eval set vs
a huge corpus, not the reverse).

Steady-state mode: ``--increment --warehouse <dir>`` admits the input as
a NEW batch against the warehouse's already-curated corpus in O(batch)
(``plans/curation.py::curate_increment``): accepted rows, the batch's
MinHash band-index rows, dedup-visible rejects (the shadow) and the
batch's verified near-dup pairs are APPENDED to the warehouse tables
(``curated``, ``curated_minhash_index``, ``curated_shadow``,
``curated_pairs``); rejected rows land in ``<output>/rejected.parquet``
with a ``reason`` column. Re-running with batches of monotone doc ids
makes every ADMISSION decision equal to batch-mode curation of the
union (including duplicates-of-contaminated and cross-batch near-dup
chains); the one append-only caveat is that previously-admitted docs
are never retroactively revoked when a later bridge doc merges two old
clusters. Run ``--compact-index`` periodically to fold the accreted
per-batch index files (content-identical; incremental pairs unchanged).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from threat_intelligence_knowledge_graph_spark.plans.curation import (
    curate_documents,
)
from threat_intelligence_knowledge_graph_spark.session import build_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    ap.add_argument("--eval", default=None, help="eval-set parquet (eval_id, text) for decontamination")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--languages", default="en", help="comma-separated keep list")
    ap.add_argument("--near-dup-threshold", type=float, default=0.8)
    ap.add_argument("--decontaminate-n", type=int, default=8)
    ap.add_argument("--train-frac", type=float, default=None,
                    help="train fraction (default 0.9; batch mode only)")
    ap.add_argument("--token-budget", type=int, default=None,
                    help="packing budget (default 2048; 0 disables; batch mode only)")
    ap.add_argument("--shard-col", default=None,
                    help="extra packing shard column present in the input (batch mode only)")
    ap.add_argument("--increment", action="store_true",
                    help="admit input as a new batch against --warehouse")
    ap.add_argument("--warehouse", default=None,
                    help="curated-corpus warehouse dir (required with --increment)")
    ap.add_argument(
        "--run-id", default=None,
        help="resume id for --increment; default derives a content "
        "fingerprint of the batch (same batch resumes after a crash, "
        "different batches never collide). Only pass an explicit id to "
        "resume under the exact id of the crashed run.",
    )
    ap.add_argument("--compact-index", action="store_true",
                    help="compact+vacuum the warehouse band index after the batch")
    args = ap.parse_args()

    spark = build_session("tikg-curate")
    docs = spark.read.parquet(args.input)
    ev = spark.read.parquet(args.eval) if args.eval else None

    if args.increment:
        if not args.warehouse:
            raise SystemExit("--increment requires --warehouse")
        # Split/packing belong to the batch-mode output shape; silently
        # ignoring them would leave the warehouse corpus unpacked while
        # the CLI appeared to accept the options (review finding r4).
        dropped_flags = [
            n for n, v in [
                ("--train-frac", args.train_frac),
                ("--token-budget", args.token_budget),
                ("--shard-col", args.shard_col),
            ] if v is not None
        ]
        if dropped_flags:
            raise SystemExit(
                f"{', '.join(dropped_flags)} do not apply with --increment "
                "(the warehouse stores curated documents; run batch-mode "
                "packing/splitting over the corpus when assembling batches)"
            )
        from threat_intelligence_knowledge_graph_spark.plans.curation import (
            batch_run_id,
            curate_increment,
        )
        from threat_intelligence_knowledge_graph_spark.sources.tableio import (
            LocalTableCatalog,
        )

        catalog = LocalTableCatalog(args.warehouse)
        run_id = args.run_id or batch_run_id(docs)
        # All four stage commits already present for this run id means
        # this invocation is a full rerun of an already-committed batch:
        # the appends below are no-ops and the printed decisions were
        # recomputed against the PRE-batch state — surface that instead
        # of letting the summary read like a fresh admission.
        resumed = all(
            catalog.committed(t, run_id, s)
            for t, s in [
                ("curated", "curate"),
                ("curated_minhash_index", "index"),
                ("curated_shadow", "shadow"),
                ("curated_pairs", "pairs"),
            ]
        )
        accepted, rejected = curate_increment(
            spark, docs, catalog, ev,
            min_quality=args.min_quality,
            languages=tuple(args.languages.split(",")),
            near_dup_threshold=args.near_dup_threshold,
            decontaminate_n=args.decontaminate_n,
            run_id=run_id,
        )
        rejected.write.mode("overwrite").parquet(
            os.path.join(args.output, "rejected.parquet")
        )
        rej = spark.read.parquet(os.path.join(args.output, "rejected.parquet"))
        reasons = {
            r.reason: r.n
            for r in rej.groupBy("reason").agg(F.count("*").alias("n")).collect()
        }
        summary = {
            "accepted": accepted.count(),
            "rejected": reasons,
            "corpus_total": catalog.read(spark, "curated").count(),
            "run_id": run_id,
        }
        if resumed:
            summary["resumed"] = True
        if args.compact_index:
            files = catalog.compact(spark, "curated_minhash_index")
            removed = catalog.vacuum("curated_minhash_index", keep_last=1)
            summary["index_compacted_files"] = files
            summary["index_vacuumed_snapshots"] = removed
        print(json.dumps(summary))
        spark.stop()
        return

    curated, metrics = curate_documents(
        docs,
        ev,
        min_quality=args.min_quality,
        languages=tuple(args.languages.split(",")),
        near_dup_threshold=args.near_dup_threshold,
        decontaminate_n=args.decontaminate_n,
        train_frac=0.9 if args.train_frac is None else args.train_frac,
        token_budget=(
            2048 if args.token_budget is None else (args.token_budget or None)
        ),
        shard_col=args.shard_col,
        # One-shot job that materializes curated AND metrics: caching
        # stages stops the metrics rows re-running the dedup chain.
        cache_stages=True,
    )
    curated.write.mode("overwrite").parquet(
        os.path.join(args.output, "curated.parquet")
    )
    metrics.write.mode("overwrite").parquet(
        os.path.join(args.output, "metrics.parquet")
    )
    out = spark.read.parquet(os.path.join(args.output, "curated.parquet"))
    m = {
        r.stage: r.n_docs
        for r in spark.read.parquet(
            os.path.join(args.output, "metrics.parquet")
        ).collect()
    }
    print(json.dumps({"curated_docs": out.count(), "stages": m}))
    spark.stop()


if __name__ == "__main__":
    main()
