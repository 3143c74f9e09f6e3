"""Catalyst-expression string functions for the store-identity rules.

The extraction kernel applies these in Python (native semantics); these
JVM-side equivalents exist so SQL-only consumers (views, downstream jobs
that never touch Python) can reproduce the exact same identities — and so
the subtle ``str.title()`` ≠ ``initcap`` trap (SURVEY.md §7 hard part 1)
is solved once, with a property test against CPython.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Split points at every alpha/non-alpha boundary: each piece is either a
# pure alpha run or a pure non-alpha run.
_BOUNDARY = r"(?<=[a-zA-Z])(?=[^a-zA-Z])|(?<=[^a-zA-Z])(?=[a-zA-Z])"


def py_title_expr(col: Column) -> Column:
    """Python ``str.title()`` semantics as a pure Catalyst expression.

    Python title-cases the first letter after EVERY non-alpha character
    (``"ipv4_10_0_0_1".title()`` → ``"Ipv4_10_0_0_1"``), while Spark
    ``initcap`` only splits on whitespace AND lowercases the rest. Here:
    split into alpha/non-alpha runs, ``initcap`` each run (capitalizes
    first letter, lowercases the rest — exactly Python's per-run rule),
    re-join. ASCII scope (node ids are sanitized to ``[a-zA-Z0-9_-]``
    before this applies).
    """
    return F.array_join(
        F.transform(F.split(col, _BOUNDARY), lambda p: F.initcap(p)), ""
    )


def node_id_expr(entity_type: Column, value: Column) -> Column:
    """Reference node-id canonicalization (ner_extractor.py:159-163) as an
    expression: ``lower(type) || '_' || sanitize(value)``."""
    return F.concat(
        F.lower(entity_type),
        F.lit("_"),
        F.regexp_replace(value, r"[^a-zA-Z0-9_-]", "_"),
    )


def store_label_expr(node_type: Column) -> Column:
    """``type.replace('-','_').capitalize()`` (neo4j_store.py:123):
    capitalize = first char upper, REST lowered (Python semantics)."""
    replaced = F.regexp_replace(node_type, "-", "_")
    return F.concat(
        F.upper(F.substring(replaced, 1, 1)),
        F.lower(replaced.substr(F.lit(2), F.length(replaced))),
    )


def store_rel_type_expr(rel_type: Column) -> Column:
    """``type.replace('-','_').upper()`` (neo4j_store.py:149)."""
    return F.upper(F.regexp_replace(rel_type, "-", "_"))


# URL canonicalization (RFC 3986-lite): the regex splits
# scheme://authority[path][?query][#fragment]; fragment is dropped.
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"
# tracking params dropped from the query before sorting
_TRACKING_RE = r"^(utm_|fbclid=|gclid=|msclkid=)"


def url_normalize_expr(col: Column) -> Column:
    """Canonical URL form as a pure Catalyst expression — the
    normalization every web-corpus pipeline applies BEFORE URL-level
    dedup (two spellings of one address must collide) and that CTI
    pivoting needs (the same C2 endpoint reported with/without :443,
    with tracking junk, or with a fragment is ONE indicator):

    - scheme and host lowercase; default ports stripped (:80 for http,
      :443 for https); empty path → '/'
    - query: tracking params (utm_*, fbclid, gclid, msclkid) dropped,
      the rest SORTED (param order is transport noise), '?' omitted if
      nothing survives
    - fragment dropped (never sent to the server)

    Non-URL input (no scheme://) → NULL for triage, the
    ``registrable_domain`` convention. ASCII scope; percent-encoding is
    preserved as-is (normalizing it needs a decode table — out of
    scope, documented). Engine-portable: split/filter/sort/join on
    ASCII strings behave identically in Spark and DuckDB, so the
    contract oracle mirrors this expression verbatim.
    """
    s = F.trim(col)
    scheme = F.lower(F.regexp_extract(s, _URL_RE, 1))
    host0 = F.lower(F.regexp_extract(s, _URL_RE, 2))
    path0 = F.regexp_extract(s, _URL_RE, 3)
    query0 = F.regexp_extract(s, _URL_RE, 4)  # includes leading '?' or ''
    host = F.when(
        scheme == "http", F.regexp_replace(host0, r":80$", "")
    ).otherwise(
        F.when(scheme == "https", F.regexp_replace(host0, r":443$", "")).otherwise(
            host0
        )
    )
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_replace(query0, r"^\?", ""), "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qnorm = F.array_join(params, "&")
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qnorm == "", F.lit("")).otherwise(F.concat(F.lit("?"), qnorm)),
    )
    return F.when(scheme == "", F.lit(None).cast("string")).otherwise(rebuilt)
