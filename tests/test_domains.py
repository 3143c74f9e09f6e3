"""Registrable-domain (eTLD+1) extraction: PSL semantics."""

from threat_intelligence_knowledge_graph_spark.operators.domains import (
    registrable_domain,
)


def _run(spark, hosts, **kw):
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    return {
        r.host: (r.suffix, r.registrable)
        for r in registrable_domain(df, **kw).collect()
    }


def test_psl_semantics(spark):
    got = _run(
        spark,
        [
            "a.cdn.evil.com",      # deep subdomain rolls to evil.com
            "evil.com",
            "b.evil.co.uk",        # depth-2 suffix beats 'uk'
            "evil.co.uk",
            "user1.github.io",     # PSL'd platform: user is registrable
            "github.io",           # bare suffix: no registrable
            "x.y.unlistedtld",     # unknown TLD: both NULL
            "com",                 # bare depth-1 suffix
        ],
    )
    assert got["a.cdn.evil.com"] == ("com", "evil.com")
    assert got["evil.com"] == ("com", "evil.com")
    assert got["b.evil.co.uk"] == ("co.uk", "evil.co.uk")
    assert got["evil.co.uk"] == ("co.uk", "evil.co.uk")
    assert got["user1.github.io"] == ("github.io", "user1.github.io")
    assert got["github.io"] == ("github.io", None)
    assert got["x.y.unlistedtld"] == (None, None)
    assert got["com"] == ("com", None)


def test_normalization(spark):
    got = _run(spark, ["WWW.Evil.COM", "evil.com."])
    assert got["WWW.Evil.COM"] == ("com", "evil.com")
    assert got["evil.com."] == ("com", "evil.com")


def test_custom_suffix_list(spark):
    got = _run(
        spark,
        ["a.b.internal", "b.internal", "x.com"],
        suffixes=["internal", "b.internal"],
    )
    assert got["a.b.internal"] == ("b.internal", "a.b.internal")
    assert got["b.internal"] == ("b.internal", None)
    assert got["x.com"] == (None, None)


def test_no_python_no_shuffle_plan(spark):
    df = spark.createDataFrame([("a.evil.com",)], ["host"])
    plan = (
        registrable_domain(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode: fixed-width projection
