"""Property tests: Catalyst string expressions ≡ CPython semantics."""

import string

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.functions.strings import (
    node_id_expr,
    py_title_expr,
    store_label_expr,
    store_rel_type_expr,
)
from threat_intelligence_knowledge_graph_spark.kernel.extract import (
    create_node_id,
    store_label,
    store_rel_type,
)

# Sanitized-id alphabet (what actually reaches py_title in the store).
ID_ALPHABET = string.ascii_letters + string.digits + "_-"
id_strings = st.text(alphabet=ID_ALPHABET, min_size=0, max_size=40)
type_strings = st.text(
    alphabet=string.ascii_letters + "-&_", min_size=1, max_size=20
)


def _eval(spark, values, expr_fn):
    df = spark.createDataFrame([(v,) for v in values], ["s"])
    return [r.out for r in df.select(expr_fn(F.col("s")).alias("out")).collect()]


class TestPyTitleExpr:
    @settings(max_examples=20, deadline=None)
    @given(st.lists(id_strings, min_size=1, max_size=30))
    def test_matches_python_title(self, spark, values):
        got = _eval(spark, values, py_title_expr)
        assert got == [v.title() for v in values]

    def test_known_hard_cases(self, spark):
        cases = [
            "ipv4_10_0_0_1",
            "vulnerability_cve-2021-44228",
            "domain_evil-1_example_net",
            "url_https___a_com_x_y_1",
            "hash_d41d8cd98f00b204e9800998ecf8427e",
            "",
            "a",
            "9abc",
            "ABC_DEF",
        ]
        got = _eval(spark, cases, py_title_expr)
        assert got == [c.title() for c in cases]


class TestStoreExprs:
    @settings(max_examples=20, deadline=None)
    @given(st.lists(type_strings, min_size=1, max_size=20))
    def test_store_label_matches_python(self, spark, values):
        got = _eval(spark, values, store_label_expr)
        assert got == [store_label(v) for v in values]

    def test_store_rel_type(self, spark):
        vals = ["resolves-to", "COMMUNICATES-WITH", "uses"]
        got = _eval(spark, vals, store_rel_type_expr)
        assert got == [store_rel_type(v) for v in vals]

    def test_node_id_expr(self, spark):
        pairs = [
            ("Domain", "evil.example.net"),
            ("URL", "https://a.com/x?y=1"),
            ("IPv4", "10.0.0.1"),
        ]
        df = spark.createDataFrame(pairs, ["t", "v"])
        got = [
            r.out
            for r in df.select(
                node_id_expr(F.col("t"), F.col("v")).alias("out")
            ).collect()
        ]
        assert got == [create_node_id(t, v) for t, v in pairs]


class TestUrlNormalize:
    CASES = [
        # two spellings of one address collide
        ("HTTP://Evil.COM:80/a?b=2&a=1", "http://evil.com/a?a=1&b=2"),
        ("http://evil.com/a?a=1&b=2#frag", "http://evil.com/a?a=1&b=2"),
        # default port only strips for the matching scheme
        ("https://C2.example:443/x", "https://c2.example/x"),
        ("https://c2.example:80/x", "https://c2.example:80/x"),
        ("http://h.example:8080/", "http://h.example:8080/"),
        # empty path, tracking params, all-tracking query
        ("http://a.example", "http://a.example/"),
        ("http://a.example/p?utm_source=t&utm_medium=m", "http://a.example/p"),
        ("http://a.example/p?gclid=1&keep=2", "http://a.example/p?keep=2"),
        # scheme case, surrounding whitespace
        ("  FTP://Files.example/Pub  ", "ftp://files.example/Pub"),
        # non-URLs → NULL
        ("evil.com/no-scheme", None),
        ("", None),
    ]

    def test_cases(self, spark):
        from threat_intelligence_knowledge_graph_spark.functions.strings import (
            url_normalize_expr,
        )

        df = spark.createDataFrame(
            [(u,) for u, _ in self.CASES], ["u"]
        ).select("u", url_normalize_expr(F.col("u")).alias("n"))
        got = {r.u: r.n for r in df.collect()}
        for u, exp in self.CASES:
            assert got[u] == exp, (u, got[u], exp)

    def test_dedup_collision_property(self, spark):
        # the point of the op: spelling variants of one URL land on one
        # canonical form, distinct() then counts indicators not spellings
        from threat_intelligence_knowledge_graph_spark.functions.strings import (
            url_normalize_expr,
        )

        variants = [
            "http://x.example/p?a=1&b=2",
            "HTTP://X.EXAMPLE:80/p?b=2&a=1",
            "http://x.example/p?utm_campaign=z&a=1&b=2#sec",
        ]
        df = spark.createDataFrame([(u,) for u in variants], ["u"])
        n = (
            df.select(url_normalize_expr(F.col("u")).alias("n"))
            .distinct()
            .count()
        )
        assert n == 1
