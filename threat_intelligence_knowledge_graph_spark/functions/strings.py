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
