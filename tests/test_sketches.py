"""Count-min sketch: guarantees, determinism, and sizing."""

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)


def _skewed(spark):
    # key 'hot' 50×, 'warm' 10×, 20 singletons
    rows = (
        [("hot",)] * 50 + [("warm",)] * 10 + [(f"cold{i}",) for i in range(20)]
    )
    return spark.createDataFrame(rows, ["k"])


def test_estimate_never_underestimates(spark):
    df = _skewed(spark)
    # width 8 << 22 distinct keys: collisions guaranteed
    sketch = cms_build(df, "k", depth=3, width=8)
    est = cms_estimate(sketch, df.distinct(), "k", depth=3, width=8)
    exact = df.groupBy("k").agg(F.count("*").alias("t"))
    joined = est.join(exact, "k").collect()
    assert len(joined) == 22
    assert all(r.cms_count >= r.t for r in joined)


def test_exact_when_width_ample(spark):
    df = _skewed(spark)
    sketch = cms_build(df, "k", depth=4, width=4096)
    est = {r.k: r.cms_count for r in cms_estimate(
        sketch, df.distinct(), "k", depth=4, width=4096
    ).collect()}
    assert est["hot"] == 50 and est["warm"] == 10 and est["cold3"] == 1


def test_sketch_size_bounded_and_mergeable(spark):
    df = _skewed(spark)
    sketch = cms_build(df, "k", depth=3, width=8)
    assert sketch.count() <= 3 * 8
    # mergeability: sketch(A ∪ B) == cellwise sum of sketch(A), sketch(B)
    a = df.filter(F.col("k") != "hot")
    b = df.filter(F.col("k") == "hot")
    merged = (
        cms_build(a, "k", depth=3, width=8)
        .unionByName(cms_build(b, "k", depth=3, width=8))
        .groupBy("row", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    whole = {(r.row, r.bucket): r.n for r in sketch.collect()}
    assert {(r.row, r.bucket): r.n for r in merged.collect()} == whole


def test_heavy_hitters_no_false_negatives(spark):
    df = _skewed(spark)
    hh = {r.k for r in cms_heavy_hitters(df, "k", min_count=10, depth=3, width=8).collect()}
    assert {"hot", "warm"} <= hh  # true heavies always surface


def test_salt_redraws_hashes(spark):
    df = _skewed(spark)
    s1 = {(r.row, r.bucket): r.n for r in cms_build(df, "k", 3, 8, salt="a").collect()}
    s2 = {(r.row, r.bucket): r.n for r in cms_build(df, "k", 3, 8, salt="b").collect()}
    assert s1 != s2
