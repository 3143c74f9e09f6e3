"""HTML→text extraction (URL/report ingestion twin, reference
main.py:136-142): region pick, script/style strip, entity decode,
whitespace normalization — and Spark/DuckDB chain equivalence."""

import duckdb
import pytest

from pyspark.sql import functions as F

from threat_intelligence_knowledge_graph_spark.sources.html import (
    html_to_text,
    html_to_text_sql,
)


def _extract(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], ["h"])
    return df.select(html_to_text(F.col("h")).alias("t")).first().t


class TestHtmlToText:
    def test_article_preferred_over_body(self, spark):
        html = (
            "<html><body>noise before"
            "<article><p>the real report</p></article>"
            "noise after</body></html>"
        )
        assert _extract(spark, html) == "the real report"

    def test_main_fallback_then_body(self, spark):
        assert (
            _extract(spark, "<body><main><p>from main</p></main></body>")
            == "from main"
        )
        assert _extract(spark, "<body><p>from body</p></body>") == "from body"

    def test_no_shell_uses_whole_doc(self, spark):
        assert _extract(spark, "<p>bare fragment</p>") == "bare fragment"

    def test_script_style_comments_stripped(self, spark):
        html = (
            "<body><script>if (a < b) alert('x')</script>"
            "<style>p { color: red }</style>"
            "<!-- secret -->"
            "<p>visible</p></body>"
        )
        assert _extract(spark, html) == "visible"

    def test_entities_decoded(self, spark):
        html = "<body>A &amp; B &lt;C&gt; &quot;D&quot; &#39;E&#39;&nbsp;F</body>"
        assert _extract(spark, html) == 'A & B <C> "D" \'E\' F'

    def test_tags_become_line_separators(self, spark):
        html = "<body><h1>Title</h1><p>one</p><p>two</p></body>"
        assert _extract(spark, html) == "Title\none\ntwo"

    def test_spark_equals_duckdb_chain(self, spark):
        cases = [
            "<html><body><article><h1>T</h1><p>a &amp; b</p></article></body></html>",
            "<body><script>x<y</script><p>keep &lt;this&gt;</p></body>",
            "plain text, no tags at all",
            "<body>  spaced   <b>bold</b>\n\n\nlines  </body>",
            "",
        ]
        con = duckdb.connect()
        for html in cases:
            got_spark = _extract(spark, html)
            lit = html.replace("'", "''").replace("\n", "' || chr(10) || '")
            expr = html_to_text_sql("('" + lit + "')")
            got_duck = con.sql("SELECT " + expr + " AS t").fetchone()[0]
            assert got_spark == got_duck, html
