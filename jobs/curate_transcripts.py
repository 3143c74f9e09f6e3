"""spark-submit entry point: conversation-level curation of a transcript log.

Runs ``plans/transcript_curation.curate_transcripts`` over a parquet
table of the engine's input shape (conv_id, turn_idx, role, text, …)
and prints the rejection funnel as ONE JSON line::

    python jobs/curate_transcripts.py --input turns.parquet \
        --budget-chars 4000 --min-run 3 \
        --verdicts out/verdicts --output out/curated

- ``--verdicts`` writes the per-conversation verdict frame
  (conv_id, n_turns, total_chars, reason, accepted) as parquet.
- ``--output`` writes the curated TURN table: the input left-semi-joined
  to accepted conversations (the 100 TB path — only conv_id crosses
  the join, the driver never collects turns).
- ``--full-grammar`` adds the role-grammar validity conjunction
  (starts-with-user, alternating roles, tool-after-assistant) for
  corpora that promise it; default is the structural pair every log
  must satisfy (dense turn_idx, no empty text).

Steady-state mode: ``--increment --warehouse <dir>`` admits the input
as a NEW batch against the warehouse's already-curated transcript
corpus in O(batch) (``curate_transcripts_increment``): accepted turns
and the batch's new content fingerprints are APPENDED so the next
increment sees them. The default run id is a batch content fingerprint
— a crash-rerun of the same batch resumes idempotently (summary gains
``"resumed": true``); different batches always get distinct ids.

The funnel JSON is dict-of-counts — one bounded collect over ≤ 5 rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from threat_intelligence_knowledge_graph_spark.session import build_session


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True, help="transcript parquet path")
    ap.add_argument("--budget-chars", type=int, default=4000)
    ap.add_argument("--min-run", type=int, default=3)
    ap.add_argument("--full-grammar", action="store_true")
    ap.add_argument("--verdicts", help="write verdict parquet here")
    ap.add_argument("--output", help="write curated turn parquet here")
    ap.add_argument("--increment", action="store_true",
                    help="admit input as a new batch against --warehouse")
    ap.add_argument("--warehouse", default=None,
                    help="curated-transcripts warehouse dir (required "
                    "with --increment)")
    ap.add_argument("--run-id", default=None,
                    help="resume id for --increment; default derives a "
                    "content fingerprint of the batch")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from threat_intelligence_knowledge_graph_spark.plans.transcript_curation import (
        curate_transcripts,
        curate_transcripts_increment,
        transcripts_batch_run_id,
    )

    if args.increment and not args.warehouse:
        raise SystemExit("--increment requires --warehouse")

    own_session = spark is None
    if own_session:
        spark = build_session("tikg-curate-transcripts", master=args.master)
    try:
        turns = spark.read.parquet(args.input)
        if args.increment:
            from threat_intelligence_knowledge_graph_spark.sources.tableio import (
                LocalTableCatalog,
            )

            catalog = LocalTableCatalog(args.warehouse)
            run_id = args.run_id or transcripts_batch_run_id(turns)
            # Both stage commits already present for this run id means
            # a full rerun of an already-committed batch: the appends
            # are no-ops and the verdicts were recomputed against the
            # PRE-batch state — surface that in the summary.
            resumed = all(
                catalog.committed(t, run_id, s)
                for t, s in [
                    ("curated_transcripts_fps", "fps"),
                    ("curated_transcripts", "turns"),
                ]
            )
            verdicts = curate_transcripts_increment(
                spark,
                turns,
                catalog,
                min_run=args.min_run,
                budget_chars=args.budget_chars,
                full_grammar=args.full_grammar,
                run_id=run_id,
            )
            funnel = {
                (r["reason"] or "accepted"): r["n"]
                for r in verdicts.groupBy("reason")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            if args.verdicts:
                verdicts.write.mode("overwrite").parquet(args.verdicts)
            summary = {
                "conversations": sum(funnel.values()),
                "accepted": funnel.get("accepted", 0),
                "rejected": {
                    k: v for k, v in sorted(funnel.items())
                    if k != "accepted"
                },
                "corpus_convs": catalog.read(spark, "curated_transcripts")
                .select("conv_id")
                .distinct()
                .count(),
                "run_id": run_id,
            }
            if resumed:
                summary["resumed"] = True
            print(json.dumps(summary, sort_keys=True))
            return 0
        verdicts = curate_transcripts(
            turns,
            min_run=args.min_run,
            budget_chars=args.budget_chars,
            full_grammar=args.full_grammar,
        )
        if args.verdicts or args.output:
            # both consumers reuse one materialization of the verdict plan
            verdicts = verdicts.localCheckpoint(eager=True)
        funnel = {
            (r["reason"] or "accepted"): r["n"]
            for r in verdicts.groupBy("reason")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        if args.verdicts:
            verdicts.write.mode("overwrite").parquet(args.verdicts)
        if args.output:
            kept = verdicts.filter("accepted").select("conv_id")
            turns.join(kept, "conv_id", "left_semi").write.mode(
                "overwrite"
            ).parquet(args.output)
        print(
            json.dumps(
                {
                    "conversations": sum(funnel.values()),
                    "accepted": funnel.get("accepted", 0),
                    "rejected": {
                        k: v for k, v in sorted(funnel.items())
                        if k != "accepted"
                    },
                },
                sort_keys=True,
            )
        )
        return 0
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
