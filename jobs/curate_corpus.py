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
"""

from __future__ import annotations

import argparse
import json
import os
import sys

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
    ap.add_argument("--train-frac", type=float, default=0.9)
    ap.add_argument("--token-budget", type=int, default=2048,
                    help="0 disables packing")
    ap.add_argument("--shard-col", default=None,
                    help="extra packing shard column present in the input")
    args = ap.parse_args()

    spark = build_session("tikg-curate")
    docs = spark.read.parquet(args.input)
    ev = spark.read.parquet(args.eval) if args.eval else None
    curated, metrics = curate_documents(
        docs,
        ev,
        min_quality=args.min_quality,
        languages=tuple(args.languages.split(",")),
        near_dup_threshold=args.near_dup_threshold,
        decontaminate_n=args.decontaminate_n,
        train_frac=args.train_frac,
        token_budget=args.token_budget or None,
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
