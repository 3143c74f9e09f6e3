"""as-of and interval join: brute-force parity + plan-shape guards."""

import datetime as dt

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.temporal_join import (
    asof_join,
    interval_join,
)


def _ts(day, hour=0, minute=0, second=0, micro=0):
    return dt.datetime(2024, 1, day, hour, minute, second, micro)


def _quotes(spark):
    # (key, time, quote_id, px): includes same-timestamp ties for key 1.
    rows = [
        (1, _ts(1), 10, 100.0),
        (1, _ts(3), 11, 110.0),
        (1, _ts(3), 12, 120.0),  # tie on time: quote_id 12 must win
        (1, _ts(9), 13, 130.0),
        (2, _ts(5), 20, 200.0),
        (3, _ts(2), 30, 300.0),  # key with no trades
    ]
    return spark.createDataFrame(rows, "k long, t timestamp, quote_id long, px double")


def _trades(spark):
    rows = [
        (1, _ts(2), 1000),  # after quote 10 only
        (1, _ts(3), 1001),  # equal to quote time: inclusive, tie -> 12
        (1, _ts(8), 1002),  # quotes 10..12 eligible -> 12
        (2, _ts(4), 2000),  # before key-2's only quote -> null
        (2, _ts(6), 2001),  # -> 20
        (4, _ts(5), 4000),  # key absent on right -> null
    ]
    return spark.createDataFrame(rows, "k long, t timestamp, trade_id long")


def _brute_asof(trades, quotes, tolerance=None):
    out = {}
    for k, t, trade_id in trades:
        best = None
        for qk, qt, qid, px in quotes:
            if qk != k or qt > t:
                continue
            if tolerance is not None and qt < t - tolerance:
                continue
            if best is None or (qt, qid) > (best[0], best[1]):
                best = (qt, qid, px)
        out[trade_id] = (best[1], best[2]) if best else (None, None)
    return out


def test_asof_backward_with_ties_and_misses(spark):
    got = asof_join(
        _trades(spark),
        _quotes(spark),
        left_key="k",
        right_key="k",
        left_time="t",
        right_time="t",
        right_cols=["quote_id", "px"],
        tie_break="quote_id",
    ).collect()
    exp = _brute_asof(
        [(r.k, r.t, r.trade_id) for r in _trades(spark).collect()],
        [(r.k, r.t, r.quote_id, r.px) for r in _quotes(spark).collect()],
    )
    assert len(got) == 6  # left-outer: every trade survives
    for r in got:
        assert (r.asof_quote_id, r.asof_px) == exp[r.trade_id], r


def test_asof_tolerance_nulls_stale_matches(spark):
    got = asof_join(
        _trades(spark),
        _quotes(spark),
        left_key="k",
        right_key="k",
        left_time="t",
        right_time="t",
        right_cols=["quote_id"],
        tie_break="quote_id",
        tolerance="2 days",
    ).collect()
    exp = _brute_asof(
        [(r.k, r.t, r.trade_id) for r in _trades(spark).collect()],
        [(r.k, r.t, r.quote_id, r.px) for r in _quotes(spark).collect()],
        tolerance=dt.timedelta(days=2),
    )
    for r in got:
        assert r.asof_quote_id == exp[r.trade_id][0], r


def test_asof_plan_single_exchange(spark):
    plan = asof_join(
        _trades(spark),
        _quotes(spark),
        left_key="k",
        right_key="k",
        left_time="t",
        right_time="t",
        right_cols=["px"],
        tie_break="quote_id",
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def _windows(spark):
    rows = [
        # (win_id, start, end): end-exclusive. Window 101 starts exactly
        # on a day-bucket boundary; 102 ends mid-bucket with microseconds.
        (101, _ts(2), _ts(4)),
        (102, _ts(3, 12), _ts(5, 6, 30, 15, 500000)),
        (103, _ts(20), _ts(21)),  # matches nothing
    ]
    return spark.createDataFrame(rows, "win_id long, ws timestamp, we timestamp")


def _facts(spark):
    rows = [
        (1, _ts(2)),                      # == 101 start: included
        (2, _ts(4)),                      # == 101 end: EXCLUDED, inside 102
        (3, _ts(3, 13)),                  # inside both
        (4, _ts(5, 6, 30, 15, 499999)),   # 1 microsecond before 102's end
        (5, _ts(5, 6, 30, 15, 500000)),   # exactly 102's end: excluded
        (6, _ts(15)),                     # no window
    ]
    return spark.createDataFrame(rows, "fact_id long, ft timestamp")


def test_interval_join_matches_brute_force(spark):
    got = interval_join(
        _facts(spark),
        _windows(spark),
        fact_time="ft",
        win_start="ws",
        win_end="we",
        bucket_seconds=86400,
    )
    pairs = {(r.fact_id, r.win_id) for r in got.collect()}
    brute = {
        (f.fact_id, w.win_id)
        for f in _facts(spark).collect()
        for w in _windows(spark).collect()
        if w.ws <= f.ft < w.we
    }
    assert pairs == brute
    assert (1, 101) in pairs and (2, 102) in pairs and (4, 102) in pairs
    assert all(f != 5 and f != 6 for f, _ in pairs)
    # no duplicate pairs despite the multi-bucket window cover
    assert got.count() == len(pairs)


def test_interval_join_keyed_and_small_buckets(spark):
    facts = _facts(spark).withColumn("region", F.col("fact_id") % 2)
    wins = _windows(spark).withColumn("wregion", F.col("win_id") % 2)
    got = interval_join(
        facts,
        wins,
        fact_time="ft",
        win_start="ws",
        win_end="we",
        bucket_seconds=3600,  # windows span many buckets
        keys=[("region", "wregion")],
        broadcast_windows=True,
    )
    pairs = {(r.fact_id, r.win_id) for r in got.collect()}
    brute = {
        (f.fact_id, w.win_id)
        for f in facts.collect()
        for w in wins.collect()
        if w.ws <= f.ft < w.we and f.region == w.wregion
    }
    assert pairs == brute and pairs  # non-empty


def test_interval_join_plan_no_cartesian(spark):
    plan = interval_join(
        _facts(spark),
        _windows(spark),
        fact_time="ft",
        win_start="ws",
        win_end="we",
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
