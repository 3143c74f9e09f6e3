"""Z-order layout: Morton key arithmetic + clustering locality."""

import pytest

from threat_intelligence_knowledge_graph_spark.operators.layout import (
    morton_key,
    zorder_by,
)


def _py_morton(vals, bits):
    key = 0
    n = len(vals)
    for j, v in enumerate(vals):
        v = max(0, min((1 << bits) - 1, int(v)))
        for i in range(bits):
            key |= ((v >> i) & 1) << (i * n + j)
    return key


class TestMortonKey:
    def test_matches_pure_python(self, spark):
        rows = [
            (0, 0), (1, 0), (0, 1), (255, 255), (65535, 65535),
            (12345, 54321), (7, 70000), (-5, 3),
        ]
        df = spark.createDataFrame(rows, ["x", "y"])
        got = df.select(
            "x", "y", morton_key(["x", "y"], bits=16).alias("z")
        ).collect()
        for r in got:
            assert r.z == _py_morton([r.x, r.y], 16), (r.x, r.y)

    def test_three_columns_and_bit_lanes(self, spark):
        df = spark.createDataFrame([(1, 1, 1)], ["a", "b", "c"])
        z = df.select(morton_key(["a", "b", "c"], bits=4).alias("z")).first().z
        # bit 0 of col j lands at output bit j: 0b111 = 7
        assert z == 7

    def test_clamping(self, spark):
        df = spark.createDataFrame([(-10, 1 << 20)], ["x", "y"])
        z = df.select(morton_key(["x", "y"], bits=8).alias("z")).first().z
        assert z == _py_morton([0, 255], 8)

    def test_validation(self, spark):
        with pytest.raises(ValueError, match="non-empty"):
            morton_key([], bits=8)
        with pytest.raises(ValueError, match="63"):
            morton_key(["a", "b"], bits=32)


class TestZorderBy:
    def test_locality_beats_single_column_sort(self, spark):
        # 32×32 grid: after z-ordering into 8 partitions, BOTH x and y
        # ranges per partition are tight; a y-sort leaves x unclustered.
        rows = [(x, y) for x in range(32) for y in range(32)]
        df = spark.createDataFrame(rows, ["x", "y"])
        import pyspark.sql.functions as F

        z = zorder_by(df, ["x", "y"], bits=5, n_files=8)
        spans = (
            z.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .agg(
                (F.max("x") - F.min("x")).alias("sx"),
                (F.max("y") - F.min("y")).alias("sy"),
            )
            .collect()
        )
        assert spans, "partitions exist"
        # every partition covers far less than the full 0..31 range on
        # BOTH dimensions (the z-curve guarantee a 1-column sort lacks)
        for r in spans:
            assert r.sx <= 16 and r.sy <= 16, (r.pid, r.sx, r.sy)

    def test_key_column_kept_and_sorted(self, spark):
        df = spark.createDataFrame([(i, i) for i in range(64)], ["x", "y"])
        z = zorder_by(df, ["x", "y"], bits=6, n_files=2)
        assert "zkey" in z.columns
        part0 = z.rdd.glom().collect()
        for part in part0:
            keys = [row.zkey for row in part]
            assert keys == sorted(keys)
