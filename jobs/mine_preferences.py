"""spark-submit entry point: preference-data mining from a transcript log.

Runs ``operators/preference`` over a parquet table of the engine's
input shape (conv_id, turn_idx, role, text, tool, ts) and prints ONE
JSON summary line::

    python jobs/mine_preferences.py --input turns.parquet \
        --mode dpo --output out/dpo_pairs

Modes:

- ``dpo`` (default) — (prompt, chosen, rejected) triples: per prompt
  answered in BOTH a completed and a failing conversation, the longest
  completed response vs the worst-outcome failing response (severity
  looping > tool_failure > abandoned), outcome labels from
  ``conversation_outcomes``. Summary reports the pair count and the
  rejected-outcome mix.
- ``best-of-n`` — rejection sampling over the SFT pairs: per prompt
  the single best response by score (``--score-col``, default
  ``n_response_chars`` — response length; point it at a joined reward
  column for model-scored corpora) plus the candidate-group size.

Both write parquet with ``--output`` and never collect row data to
the driver beyond the bounded summary aggregates (pair count, outcome
mix — ≤4 rows).
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
    ap.add_argument(
        "--mode", choices=["dpo", "best-of-n"], default="dpo"
    )
    ap.add_argument(
        "--score-col",
        default="n_response_chars",
        help="best-of-n ranking column over the sft_pairs frame",
    )
    ap.add_argument("--min-run", type=int, default=3,
                    help="loop-detection run length for outcome labels")
    ap.add_argument("--output", help="write mined pairs parquet here")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from threat_intelligence_knowledge_graph_spark.operators.preference import (
        best_of_n,
        dpo_pairs,
    )
    from threat_intelligence_knowledge_graph_spark.operators.sft import (
        sft_pairs,
    )

    own_session = spark is None
    if own_session:
        spark = build_session("tikg-mine-preferences", master=args.master)
    try:
        turns = spark.read.parquet(args.input)
        if args.mode == "dpo":
            pairs = dpo_pairs(turns, min_run=args.min_run)
            if args.output:
                pairs.write.mode("overwrite").parquet(args.output)
                pairs = spark.read.parquet(args.output)
            mix_rows = (
                pairs.groupBy("rejected_outcome")
                .agg(F.count("*").alias("n"))
                .collect()
            )
            summary = {
                "mode": "dpo",
                "pairs": sum(r["n"] for r in mix_rows),
                "rejected_outcomes": {
                    r["rejected_outcome"]: r["n"]
                    for r in sorted(mix_rows, key=lambda r: r[0])
                },
            }
        else:
            base = sft_pairs(turns)
            if args.score_col not in base.columns:
                raise SystemExit(
                    f"mine-preferences: score column {args.score_col!r} "
                    "not in the sft_pairs frame "
                    f"(have: {', '.join(base.columns)})"
                )
            winners = best_of_n(base, args.score_col)
            if args.output:
                winners.write.mode("overwrite").parquet(args.output)
                winners = spark.read.parquet(args.output)
            agg = winners.agg(
                F.count("*").alias("prompts"),
                F.coalesce(F.sum("n_candidates"), F.lit(0)).alias("cands"),
            ).collect()[0]
            summary = {
                "mode": "best-of-n",
                "prompts": agg["prompts"],
                "candidates": agg["cands"],
                "score_col": args.score_col,
            }
        if args.output:
            summary["output"] = args.output
        print(json.dumps(summary, sort_keys=True))
        return 0
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
