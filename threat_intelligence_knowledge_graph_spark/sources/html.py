"""HTML → text extraction for the URL/report ingestion path.

The reference fetches report URLs and extracts text with BeautifulSoup
(reference main.py:136-142: prefer <article>, else <main>, else <body>;
get_text with newline separators). This sandbox has no network and no
bs4, so the operator is the deterministic regex twin of that heuristic,
pinned as an ordered step list that GENERATES both execution paths:

- ``html_to_text(col)``   — pure Catalyst expression chain (whole-stage
  codegen; a 100 TB crawl detags without a UDF call);
- ``html_to_text_sql(x)`` — the identical chain as DuckDB SQL, so the
  operator is oracle-checkable cell-for-cell (driver contract entry
  ``html_to_text``).

Pinned spec (applied to the main region, in order): drop <script>/<style>
blocks and comments; tags → newline; decode the six common entities;
collapse horizontal whitespace; collapse newline runs; trim. All patterns
are RE2-safe (no backreferences/lookarounds) so the same strings run on
Spark's Java regex and DuckDB's RE2.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# region-pick patterns, most-specific first (reference main.py:138).
MAIN_REGION_PATTERNS = [
    r"(?is)<article[^>]*>(.*?)</article>",
    r"(?is)<main[^>]*>(.*?)</main>",
    r"(?is)<body[^>]*>(.*?)</body>",
]

# ordered (pattern, replacement) regex steps after region pick.
STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?is)<script[^>]*>.*?</script>", " "),
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", "\n"),  # any remaining tag → separator
]

# plain string replacements (entity decode), order matters (&amp; last
# so '&amp;lt;' decodes to '&lt;' not '<').
ENTITY_STEPS: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# whitespace normalization, in order.
WS_STEPS: list[tuple[str, str]] = [
    (r"[ \t\r]+", " "),          # collapse horizontal runs
    (r" ?\n ?", "\n"),           # strip spaces around newlines
    (r"\n{2,}", "\n"),           # collapse blank lines
    (r"^\s+", ""),               # leading trim
    (r"\s+$", ""),               # trailing trim
]


def html_to_text(col: Column) -> Column:
    """Extract readable text from an HTML column — pure Catalyst."""
    region = col
    for pat in reversed(MAIN_REGION_PATTERNS):
        region = F.coalesce(
            F.nullif(F.regexp_extract(col, pat, 1), F.lit("")), region
        )
    out = region
    for pat, repl in STRIP_STEPS:
        out = F.regexp_replace(out, pat, repl)
    for lit, repl in ENTITY_STEPS:
        out = F.replace(out, F.lit(lit), F.lit(repl))
    for pat, repl in WS_STEPS:
        out = F.regexp_replace(out, pat, repl)
    return out


def html_to_text_sql(expr: str) -> str:
    """The identical chain as a DuckDB SQL scalar expression over
    ``expr`` — generated from the same pinned step lists."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"

    region = expr
    for pat in reversed(MAIN_REGION_PATTERNS):
        region = (
            f"coalesce(nullif(regexp_extract({expr}, {q(pat)}, 1), ''), {region})"
        )
    out = region
    for pat, repl in STRIP_STEPS:
        out = f"regexp_replace({out}, {q(pat)}, {q(repl)}, 'g')"
    for lit, repl in ENTITY_STEPS:
        out = f"replace({out}, {q(lit)}, {q(repl)})"
    for pat, repl in WS_STEPS:
        out = f"regexp_replace({out}, {q(pat)}, {q(repl)}, 'g')"
    return out
