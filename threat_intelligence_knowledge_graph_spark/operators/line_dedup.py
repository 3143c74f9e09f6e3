"""Corpus-level line deduplication (C4-style boilerplate removal).

C4 (Raffel et al. 2020, §2.2) deduplicates at LINE granularity:
navigation chrome, cookie banners, license headers and generated
footers repeat across millions of pages, and keeping them teaches the
model boilerplate. The transcript corpus has the same failure shape —
injected system preambles and tool banners repeat across conversations.
This is the line-grain sibling of ``operators/span_dedup`` (token-span
grain, Lee et al. 2021) and ``operators/dedup`` (document grain).

Semantics (pinned, oracle-checked):

- a document's lines are ``split(text, '\\n')`` — '' stays one empty
  line, so blank boilerplate dedups like any other line;
- a line is *duplicated* when its byte-exact content occurs
  ``min_count``-or-more times corpus-wide (occurrences counted at line
  grain, WITHIN-document repeats included);
- ``keep='first'`` keeps only the globally first occurrence of a
  duplicated line — "first" = smallest ``(doc, line_idx)`` under the
  natural column ordering (deterministic: that pair is unique);
  ``keep='none'`` drops every occurrence (the stricter C4 variant);
- surviving lines are re-joined with '\\n' in original order; a doc
  whose every line is dropped yields ``''`` (the row is never lost).

Scale shape: one posexplode, ONE aggregation keyed by the 32-hex md5 of
the line (count + min position — map-side partials), one hash join of
the line stream back against the N_distinct_lines-sized stats frame,
then one per-doc sort_array/array_join aggregation. No windows over the
full corpus, nothing collects, and the only wide rows (full line text)
travel exactly twice (explode + rejoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_lines(
    docs: DataFrame,
    min_count: int = 2,
    keep: str = "first",
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per input document:

    ``(doc_col, text, n_lines, n_removed)`` — ``text`` is the document
    with corpus-duplicated lines removed (see module docstring),
    ``n_lines`` the original line count, ``n_removed`` how many were
    dropped.
    """
    if min_count < 2:
        raise ValueError("min_count must be >= 2")
    if keep not in ("first", "none"):
        raise ValueError("keep must be 'first' or 'none'")

    lines = docs.select(
        F.col(doc_col).alias("_doc"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "_idx", "_line"
        ),
    )
    stats = lines.groupBy(F.md5(F.col("_line")).alias("_h")).agg(
        F.count("*").alias("_cnt"),
        F.min(F.struct("_doc", "_idx")).alias("_first"),
    )
    flagged = lines.join(stats, F.md5(F.col("_line")) == F.col("_h")).withColumn(
        "_drop",
        (F.col("_cnt") >= min_count)
        & (
            F.lit(True)
            if keep == "none"
            else ~(
                (F.col("_first._doc") == F.col("_doc"))
                & (F.col("_first._idx") == F.col("_idx"))
            )
        ),
    )
    rebuilt = flagged.groupBy("_doc").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("_drop").cast("long")).cast("long").alias("n_removed"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            ~F.col("_drop"), F.struct("_idx", "_line")
                        )
                    )
                ),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("_text"),
    )
    return rebuilt.select(
        F.col("_doc").alias(doc_col),
        F.col("_text").alias(text_col),
        "n_lines",
        "n_removed",
    )
