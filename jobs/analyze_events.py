"""spark-submit entry point: timeline analytics over an event/observation log.

The reference stores observations in Neo4j and leaves timeline triage
to the analyst's browser; this CLI is the distributed version of that
triage loop over any parquet event log with columns
(event_id, ts, user_id, event_type, ...) — each report is one of the
oracled operators in ``operators/stats.py`` / ``operators/anomaly.py``:

- ``--report beacons``     inter-arrival cv² per (user, type) channel
                           (clocked C2 ≈ 0, human ≳ 1)
- ``--report entropy``     per-user event-type Shannon entropy
                           (scripted ≈ 0, organic near ln k)
- ``--report fano``        per-type burstiness (Fano factor of hourly
                           volumes)
- ``--report trend``       per-type hourly-volume LSQ slope
                           (ramping up / winding down)
- ``--report correlation`` pairwise r² of per-type hourly series
                           (campaign-linked infrastructure)
- ``--report autocorr``    per-type lag-24 autocorrelation (diurnal
                           cycles; ``--lag`` overrides)
- ``--report novelty``     per-day first-seen indicator counts
- ``--report churn``       day-over-day active-set Jaccard churn
- ``--report cusum``       integer-exact CUSUM level-shift detection
- ``--report mad``         robust MAD point outliers on ``value``
- ``--report markov``      first-order event-type transition model
- ``--report sequences``   top consecutive event-type trigrams
- ``--report funnel``      ordered progression through --steps a,b,c
- ``--report retention``   weekly cohort retention
- ``--report seasonality`` per-type hour-of-day chi-square profile
                           (office hours vs around-the-clock)
- ``--report rate``        sliding 24h-window peak rate per user
                           (bursts aligned buckets miss)
- ``--report survival``    Kaplan-Meier time-to-conversion between
                           --steps start,convert (censored honestly)
- ``--report trimmed``     per-type 10%-trimmed mean of ``value``
- ``--report ewma``        dyadic EWMA surge ratios of per-type hourly
                           volumes (spike triage)
- ``--report lags``        best-lag cross-correlation between type
                           series (±3 h relay/lead-lag detection)
- ``--report simpson``     per-user Simpson concentration + effective
                           state count
- ``--report surge``       seasonally-adjusted (type, week,
                           hour-of-week) volume deviation cells
- ``--report ks``          two-sample KS drift of ``value`` between
                           two deterministic halves (xxhash64 parity
                           of ``event_id`` — works for any id type; a
                           real pipeline splits on its batch column)

Invocation::

    python jobs/analyze_events.py --input events.parquet --report beacons
    python jobs/analyze_events.py --input events.parquet \
        --report funnel --steps login,recon,exfil

``--max-rows`` bounds what is printed (default 50); ``--output`` writes
the full result as parquet instead (the 100 TB path — the driver never
collects the result set).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from threat_intelligence_knowledge_graph_spark.session import build_session

REPORTS = (
    "beacons", "entropy", "fano", "trend", "correlation", "autocorr",
    "novelty", "churn", "cusum", "mad", "markov", "sequences",
    "funnel", "retention", "seasonality", "rate", "survival", "trimmed",
    "ewma", "lags", "simpson", "surge", "ks",
)


def _build(report: str, events, steps: list[str], lag: int = 24):
    from threat_intelligence_knowledge_graph_spark.operators import anomaly, stats

    if report == "beacons":
        return anomaly.beacon_regularity(events)
    if report == "entropy":
        return stats.event_entropy(events)
    if report == "fano":
        return stats.burstiness_fano(events)
    if report == "trend":
        return stats.trend_slope(events)
    if report == "correlation":
        return stats.correlated_series(events)
    if report == "autocorr":
        return stats.autocorrelation(events, lag_hours=lag)
    if report == "novelty":
        return stats.novelty_curve(events)
    if report == "churn":
        return stats.set_churn(events)
    if report == "cusum":
        return anomaly.cusum_level_shift(events)
    if report == "mad":
        return anomaly.mad_outliers(events)
    if report == "markov":
        return stats.markov_transitions(events)
    if report == "sequences":
        return stats.top_event_sequences(events)
    if report == "funnel":
        if not steps:
            raise SystemExit("--report funnel requires --steps a,b,c")
        return stats.funnel(events, steps)
    if report == "retention":
        return stats.retention_cohorts(events)
    if report == "seasonality":
        return stats.hourly_seasonality(events)
    if report == "rate":
        return anomaly.rate_peaks(events, window_s=86400, limit=3)
    if report == "survival":
        if len(steps) != 2:
            raise SystemExit("--report survival requires --steps start,convert")
        return stats.survival_curve(events, steps[0], steps[1])
    if report == "trimmed":
        return stats.trimmed_mean(events, "value", "event_type", "event_id")
    if report == "ewma":
        return anomaly.ewma_surge(events)
    if report == "lags":
        return stats.best_lag_correlation(events, max_lag=3)
    if report == "simpson":
        return stats.simpson_index(events)
    if report == "surge":
        return anomaly.seasonal_surge(events)
    if report == "ks":
        from threat_intelligence_knowledge_graph_spark.operators import (
            quality_checks,
        )
        from pyspark.sql import functions as F

        side = F.pmod(F.xxhash64(F.col("event_id").cast("string")), F.lit(2))
        return quality_checks.ks_two_sample(
            events.filter(side == 0),
            events.filter(side == 1),
            "value",
        )
    raise SystemExit(f"unknown report {report!r} (choose from {REPORTS})")


def main(argv: list[str] | None = None, spark=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--input", required=True, help="event-log parquet path")
    ap.add_argument("--report", required=True, choices=REPORTS)
    ap.add_argument("--steps", default=None,
                    help="funnel: comma-separated ordered step names")
    ap.add_argument("--lag", type=int, default=24,
                    help="autocorr: lag in hours (default 24)")
    ap.add_argument("--max-rows", type=int, default=50)
    ap.add_argument("--output", help="write result parquet here instead of printing")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    own_session = spark is None
    if own_session:
        spark = build_session("tikg-analyze", master=args.master)
    try:
        events = spark.read.parquet(args.input)
        df = _build(
            args.report, events,
            args.steps.split(",") if args.steps else [], lag=args.lag,
        )
        if args.output:
            df.write.mode("overwrite").parquet(args.output)
            print(f"wrote {args.output}")
        else:
            df.show(args.max_rows, truncate=False)
        return 0
    finally:
        if own_session:
            spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
