"""One-pass declarative table expectations."""

from __future__ import annotations

import pytest

from threat_intelligence_knowledge_graph_spark.operators.quality_checks import (
    in_range,
    in_set,
    matches,
    not_null,
    run_checks,
    unique,
)


@pytest.fixture
def table(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0, "1-URGENT"),
            (2, "b", 20.0, "5-LOW"),
            (2, "c", -1.0, "9-BOGUS"),   # dup id, out-of-range, bad prio
            (4, None, 30.0, None),       # null status, null prio
        ],
        ["id", "status", "price", "prio"],
    )


class TestChecks:
    def test_suite_counts(self, spark, table):
        got = {
            r.check: (r.violations, r.passed)
            for r in run_checks(
                table,
                [
                    not_null("id"),
                    not_null("status"),
                    unique("id"),
                    in_set("status", ["a", "b", "c"]),
                    in_range("price", 0.0, 100.0),
                    matches("prio", r"^[1-5]-"),
                ],
            ).collect()
        }
        assert got == {
            "not_null(id)": (0, True),
            "not_null(status)": (1, False),
            "unique(id)": (1, False),
            "in_set(status)": (1, False),  # null status is a violation (consistent with matches)
            "in_range(price)": (1, False),
            "matches(prio)": (2, False),  # bad prio + null prio
        }

    def test_unique_counts_null_group(self, spark):
        df = spark.createDataFrame(
            [(None,), (None,), (1,)], "id int"
        )
        got = run_checks(df, [unique("id")]).collect()[0]
        assert got.violations == 1  # two nulls = one extra copy

    def test_empty_table_all_pass(self, spark, table):
        got = run_checks(
            table.limit(0), [not_null("id"), unique("id")]
        ).collect()
        assert all(r.passed and r.violations == 0 for r in got)

    def test_single_agg_pass_plan(self, spark, table):
        df = run_checks(
            table, [not_null("id"), in_range("price", 0, 100)]
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        # no distinct checks → exactly one partial/final agg pair, one scan
        assert plan.count("Scan ExistingRDD") <= 1

    def test_no_checks_raises(self, spark, table):
        with pytest.raises(ValueError):
            run_checks(table, [])
