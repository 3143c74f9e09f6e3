"""Salted aggregation ≡ direct aggregation; hot-key shard balance."""

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.skew import (
    hot_entity_counts,
    salted_agg,
    salted_count,
)


def _skewed_df(spark):
    # one heavy hitter (80%), long uniform tail
    hot = spark.range(8000).select(
        F.lit("CVE-2021-44228").alias("k"), F.col("id").alias("v")
    )
    tail = spark.range(2000).select(
        F.concat(F.lit("CVE-2021-"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    return hot.unionAll(tail)


class TestSaltedAgg:
    def test_salted_count_equals_direct(self, spark):
        df = _skewed_df(spark)
        direct = {(r.k, r["count"]) for r in df.groupBy("k").count().collect()}
        salted = {(r.k, r["count"]) for r in salted_count(df, ["k"]).collect()}
        assert salted == direct

    def test_salted_generic_agg(self, spark):
        df = _skewed_df(spark)
        direct = {
            (r.k, r.total, r.mx)
            for r in df.groupBy("k")
            .agg(F.sum("v").alias("total"), F.max("v").alias("mx"))
            .collect()
        }
        salted = {
            (r.k, r.total, r.mx)
            for r in salted_agg(
                df,
                ["k"],
                {
                    "total": (F.sum("v"), F.sum("total")),
                    "mx": (F.max("v"), F.max("mx")),
                },
            ).collect()
        }
        assert salted == direct

    def test_phase1_shards_bounded_single_column(self, spark):
        # The degenerate shape that matters: grouping keys == all columns
        # (hot_entity_counts). The salt must still split the hot key — a
        # value-derived salt would collapse to ONE shard here.
        from threat_intelligence_knowledge_graph_spark.operators.skew import _row_salt

        df = _skewed_df(spark).select("k")  # single column == the key
        shards = (
            df.withColumn("s", _row_salt(16))
            .groupBy("k", "s")
            .count()
            .filter(F.col("k") == "CVE-2021-44228")
            .collect()
        )
        assert len(shards) > 1  # hot key genuinely sharded
        assert max(r["count"] for r in shards) < 8000  # no single-shard collapse

    def test_hot_entity_counts(self, spark):
        triples = spark.createDataFrame(
            [("a", "USES", "cve1"), ("b", "USES", "cve1"), ("a", "USES", "x")],
            ["subj", "pred", "obj"],
        )
        got = {(r.entity, r["count"]) for r in hot_entity_counts(triples).collect()}
        assert got == {("a", 2), ("b", 1), ("cve1", 2), ("x", 1)}
