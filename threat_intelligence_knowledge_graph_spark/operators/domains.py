"""Registrable-domain (eTLD+1) extraction — CTI pivot normalization.

Analysts pivot on REGISTRABLE domains, not hostnames: ``a.cdn.evil.com``
and ``b.evil.com`` are the same actor asset (``evil.com``), while
``x.github.io`` and ``y.github.io`` are NOT (``github.io`` is a public
suffix — each user subdomain is independently registered). The
reference stores raw domain nodes (SURVEY.md §2 op 11); this adds the
rollup a campaign-level view needs.

The match rule is the Public Suffix List algorithm on a vendored,
pinned PSL subset: the longest listed suffix wins, and the registrable
domain is that suffix plus one leading label. Pure Catalyst — the
candidate suffixes of a hostname are its last-k label tails (k ≤ the
longest listed suffix), generated with ``substring_index``-style
arithmetic, checked against the broadcast suffix dimension, and reduced
with ``greatest`` on match depth. No Python, no explode: a fixed-width
``when``-free projection per row.

The vendored list is a DELIBERATE subset (the full PSL is ~9k rules and
revisioned; pinning a subset keeps the oracle self-contained) — extend
``PUBLIC_SUFFIXES`` for production use; the algorithm is list-agnostic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Pinned PSL subset: ICANN TLDs seen in CTI feeds plus the multi-label
# suffixes that change the rollup answer. Max depth 2 labels.
PUBLIC_SUFFIXES: list[str] = [
    "com", "net", "org", "io", "info", "biz", "ru", "cn", "de", "uk",
    "fr", "nl", "eu", "us", "br", "in", "jp", "au", "xyz", "top",
    "online", "site", "club", "cc", "tv", "me", "co",
    # multi-label (eTLD depth 2)
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "com.br",
    "com.cn", "co.jp", "co.in", "github.io", "blogspot.com",
    "cloudfront.net", "amazonaws.com", "herokuapp.com",
]

_MAX_SUFFIX_LABELS = 2


def _tail(col: Column, k: int) -> Column:
    """Last k dot-separated labels of a hostname."""
    return F.substring_index(col, ".", -k)


def registrable_domain(
    hostnames: DataFrame,
    host_col: str = "host",
    suffixes: list[str] | None = None,
) -> DataFrame:
    """Adds ``suffix`` (the matched public suffix, NULL if the TLD is
    unlisted) and ``registrable`` (eTLD+1, NULL when the hostname IS a
    bare public suffix or its TLD is unlisted) to the input rows.

    Longest-match: a depth-2 suffix hit (``co.uk``) beats the depth-1
    hit (``uk``) its tail also produces. Hostnames are lowercased and
    stripped of a trailing dot first (DNS root form).
    """
    sfx = suffixes if suffixes is not None else PUBLIC_SUFFIXES
    depth_of = {s: s.count(".") + 1 for s in sfx}
    max_d = max(depth_of.values(), default=1)
    host = F.regexp_replace(F.lower(F.col(host_col)), r"\.$", "")
    n_labels = F.size(F.split(host, r"\."))
    # matched depth per candidate tail, 0 when unlisted
    match_depth = F.lit(0)
    for d in range(1, max_d + 1):
        listed = F.array(
            *[F.lit(s) for s, dd in depth_of.items() if dd == d]
        )
        hit = (n_labels >= d) & F.array_contains(listed, _tail(host, d))
        match_depth = F.when(hit, F.lit(d)).otherwise(match_depth)
    # substring_index takes a literal count: select the tail per
    # matched depth with a when-chain (max_d is small and fixed)
    suffix = F.lit(None).cast("string")
    registrable = F.lit(None).cast("string")
    for d in range(1, max_d + 1):
        suffix = F.when(match_depth == d, _tail(host, d)).otherwise(suffix)
        registrable = F.when(
            (match_depth == d) & (n_labels > d), _tail(host, d + 1)
        ).otherwise(registrable)
    return hostnames.withColumn("suffix", suffix).withColumn(
        "registrable", registrable
    )
