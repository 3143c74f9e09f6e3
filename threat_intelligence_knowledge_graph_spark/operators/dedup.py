"""Deduplication suite for large-scale training-data pipelines.

Five strategies over a ``documents(doc_id, text)``-shaped table, each
scale-shaped for 100 TB:

- **exact**         — content-hash groupBy (map-side combinable agg; the
                      only full-data shuffle is on a 32-byte hash).
- **MinHash+LSH**   — shingle → minhash → band → bucket join (reuses
                      ``operators/minhash.py``); near-O(n) candidate
                      generation instead of O(n²) pairs.
- **SimHash**       — 64-bit signature via an Arrow-batched numpy kernel,
                      Hamming-band join + ``bit_count`` verify (pure JVM).
- **n-gram Jaccard**— LSH candidates verified with *exact* Jaccard.
- **embedding cosine** — see ``operators/similarity.py`` near-dup pairs.

Survivor policy everywhere: keep the minimum ``doc_id`` of a duplicate
cluster (deterministic, join-free to express).
"""

from __future__ import annotations

from collections.abc import Iterator
from fractions import Fraction

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .minhash import (
    connected_components,
    jaccard_verify,
    lsh_band_keys,
    lsh_candidate_pairs,
    word_shingles,
)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(content_hash, n_copies, keep_id) for every duplicated text."""
    return (
        documents.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


def exact_dedup(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Documents with exact duplicates removed (min doc_id survives)."""
    keep = (
        documents.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_id"))
        .select(F.col("keep_id").alias(id_col))
    )
    return documents.join(keep, id_col, "left_semi")


def bow_duplicates(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_term_len: int = 2,
) -> DataFrame:
    """(bow_hash, n_copies, keep_id): ORDER-INSENSITIVE exact dedup —
    content identity is the md5 of the doc's sorted token MULTISET, so
    two docs that are word-reorderings of each other (template
    stitching, sentence-shuffled spins of one article, column-reordered
    exports) collapse to one family even though byte-level
    :func:`exact_duplicates` sees them as distinct. The cheap middle
    rung of the dedup ladder: byte-exact < bag-of-words < MinHash.

    Same plan shape as exact dedup: the tokenize + ``array_sort`` +
    fingerprint is scan-local, then ONE 32-byte-key groupBy shuffles.
    Token order inside the fingerprint is bytewise-lexicographic, which
    for the ``[a-z0-9]+`` token alphabet is engine-independent. Docs
    with zero tokens all share the empty fingerprint by construction
    and are excluded (an empty bag is not evidence of duplication).
    """
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), "
        f"'[a-z0-9]{{{min_term_len},}}', 0)"
    )
    return (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.md5(F.concat_ws(" ", F.array_sort(toks))).alias("bow_hash"),
            F.size(toks).alias("_nt"),
        )
        .filter(F.col("_nt") > 0)
        .groupBy("bow_hash")
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keep_id"))
        .filter(F.col("n_copies") > 1)
    )


def prefix_filter_pairs(
    documents: DataFrame,
    tau: float = 0.9,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_term_len: int = 2,
) -> DataFrame:
    """EXACT all-pairs token-set Jaccard join at threshold ``tau`` via
    the prefix filter (AllPairs/PPJoin, Bayardo et al. WWW'07 /
    Xiao et al. WWW'08) — the deterministic complement to MinHash-LSH:
    no probabilistic misses, every pair with ``J(A,B) >= tau`` is
    returned, and the filter is what makes that affordable — two sets
    can reach Jaccard tau only if they share a token among each one's
    ``|X| - ceil(tau·|X|) + 1`` RAREST tokens, so only prefix tokens
    are join keys instead of all tokens.

    Output: ``(id_a, id_b, n_inter, n_union, jaccard)`` with
    ``id_a < id_b``; the threshold compare is exact integer arithmetic
    (``den·inter >= num·union`` with tau read back as the decimal the
    caller wrote), never a float boundary.

    100 TB shape: token sets are scan-side distinct; document
    frequency is a Zipf-bounded dimension agg; the global rarity order
    (df ASC, term ASC — total and engine-independent) ranks tokens
    per doc with a doc-partitioned window; the candidate join keys on
    prefix tokens only, with the PPJoin LENGTH filter
    (``tau·|A| <= |B| <= |A|/tau``, integer form) pruning inside the
    join; verification joins each candidate pair back to the two
    (sorted) token arrays and intersects in one projection. Candidate
    fan-out per join key is bounded by that token's df *within
    prefixes* — rare tokens by construction; there is no cartesian
    anywhere.
    """
    if not 0.0 < tau <= 1.0:
        raise ValueError("tau must be in (0, 1]")
    # limit_denominator bounds den <= 1e6 so den*|set| stays far from
    # bigint overflow for any real token-set size (a repr-long tau like
    # 2/3 -> str() gives 16 digits -> den ~ 5e15, and den*nb would
    # overflow under ANSI mode); short decimals (0.9, 0.85) are exact,
    # and 2/3-style floats recover their true small fraction.
    fr = Fraction(str(tau)).limit_denominator(10**6)
    num, den = fr.numerator, fr.denominator

    toks = (
        documents.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}), "
                    f"'[a-z0-9]{{{min_term_len},}}', 0)"
                )
            ).alias("term"),
        )
        .distinct()
    )
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    dfreq = toks.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("df").asc(), F.col("term").asc()
    )
    ranked = (
        toks.join(dfreq, "term")
        .select("doc_id", "term", F.row_number().over(w).alias("rk"))
        .join(sizes, "doc_id")
    )
    # prefix length = n - ceil(tau*n) + 1, ceil in exact integers
    prefix = ranked.filter(
        F.col("rk")
        <= F.col("n")
        - F.expr(f"CAST(({num} * n + {den - 1}) DIV {den} AS BIGINT)")
        + F.lit(1)
    ).select("doc_id", "term", "n")
    a = prefix.select(
        F.col("doc_id").alias("id_a"), "term", F.col("n").alias("na")
    )
    b = prefix.select(
        F.col("doc_id").alias("id_b"), "term", F.col("n").alias("nb")
    )
    cand = (
        a.join(b, "term")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # PPJoin length filter: tau*na <= nb <= na/tau (either
            # order — apply symmetrically in integer form)
            & (F.lit(den) * F.col("nb") >= F.lit(num) * F.col("na"))
            & (F.lit(num) * F.col("nb") <= F.lit(den) * F.col("na"))
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sets = toks.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("term")).alias("ts")
    )
    return (
        cand.join(
            sets.select(F.col("doc_id").alias("id_a"), F.col("ts").alias("ta")),
            "id_a",
        )
        .join(
            sets.select(F.col("doc_id").alias("id_b"), F.col("ts").alias("tb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ta", "tb")).cast("long").alias("n_inter"),
            (F.size("ta") + F.size("tb")
             - F.size(F.array_intersect("ta", "tb"))).cast("long").alias("n_union"),
        )
        .filter(F.lit(den) * F.col("n_inter") >= F.lit(num) * F.col("n_union"))
        .select(
            "id_a",
            "id_b",
            "n_inter",
            "n_union",
            F.round(F.col("n_inter") / F.col("n_union"), 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# MinHash-LSH near-dup
# ---------------------------------------------------------------------------

def minhash_near_duplicates(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    max_bucket_size: int = 256,
    return_dropped: bool = False,
) -> DataFrame:
    """(a, b, jaccard) verified near-duplicate pairs.

    ``return_dropped=True`` returns ``(pairs, dropped_buckets)`` so the
    caller can observe recall lost to the bucket cap instead of a
    silent truncation (the exact pre-pass in ``minhash_dedup`` removes
    the only unbounded source of over-cap buckets, but raw corpora fed
    straight to this function may still hit it)."""
    shingles = word_shingles(documents, id_col, text_col, n=shingle_words)
    banded = lsh_band_keys(shingles, num_hashes=num_hashes, bands=bands)
    pairs, dropped = lsh_candidate_pairs(banded, max_bucket_size=max_bucket_size)
    verified = jaccard_verify(pairs, shingles, threshold=jaccard_threshold)
    return (verified, dropped) if return_dropped else verified


def minhash_dedup(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Remove near-duplicates: exact-dedup first, then cluster verified
    LSH pairs with connected components and keep min id per cluster.

    The exact pre-pass matters beyond speed: a text duplicated more times
    than ``max_bucket_size`` would blow the LSH bucket cap and be dropped
    from candidate generation entirely (see ``lsh_candidate_pairs`` —
    dropped buckets are returned there, and the exact pass removes the
    only unbounded source of identical-signature buckets)."""
    exact = exact_dedup(documents, id_col, text_col)
    pairs = minhash_near_duplicates(exact, id_col, text_col, **kwargs)
    components = connected_components(pairs.select("a", "b"))
    drop = components.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return exact.join(drop, id_col, "left_anti")


def minhash_band_index(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """(id, band, band_key): the persistable LSH index for incremental
    dedup — write this to a table once, then dedup each ingest batch
    against it with ``minhash_incremental_near_duplicates`` instead of
    re-scanning the corpus.

    Maintenance: persist via ``LocalTableCatalog.append`` (each batch's
    ``new_index_rows`` is an append snapshot — per-batch write cost is
    the batch, not the table), then ``compact``/``vacuum`` periodically
    to fold the accreted per-batch files into one snapshot; compaction
    is content-identical, so incremental pairs are unchanged
    (test_dedup_similarity.py asserts this end-to-end)."""
    banded = lsh_band_keys(
        word_shingles(documents, id_col, text_col, n=shingle_words),
        num_hashes=num_hashes,
        bands=bands,
    )
    return banded.select(F.col("_id").alias(id_col), "band", "band_key")


def minhash_incremental_near_duplicates(
    corpus: DataFrame,
    index: DataFrame,
    new_documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    max_bucket_size: int = 256,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Near-dup pairs touching an ingest batch WITHOUT re-processing the
    corpus — the 100 TB steady-state shape (the batch-mode self-join
    re-shingles and re-bands everything every run).

    Inputs: ``corpus`` (id, text) — existing documents, scanned only for
    the handful of rows that verification touches; ``index`` — their
    persisted ``minhash_band_index``; ``new_documents`` — the ingest
    batch (ids must be new).

    Returns ``(pairs, new_index_rows, dropped_buckets)``:
    - pairs — verified (a, b, jaccard) where at least one side is new
      (new×new and new×old; old×old pairs were reported when those docs
      were ingested).
    - new_index_rows — the batch's band keys; append to the index table
      to maintain it.
    - dropped_buckets — combined (band, band_key) buckets over
      ``max_bucket_size`` (same cap + reporting as the batch path; sized
      over index ∪ batch so a bucket's cap can't be evaded by splitting
      arrivals across batches).

    Work per batch: shingle/band the BATCH only; one bucket join
    restricted to buckets containing a new id; exact-Jaccard verify
    re-shingles only the touched old docs (left-semi join into
    ``corpus``). Equivalence with the full self-join (restricted to
    pairs touching the batch) is pytest-asserted.
    """
    # Fail fast on id-type drift between batches: the index/batch union
    # would implicitly coerce, but least/greatest on the pair columns
    # has no implicit coercion (opaque AnalysisException), and even if
    # it did, string-vs-numeric ordering silently changes the a/b
    # orientation and the min-id survivor choice vs batch mode.
    for side, df in (("index", index), ("corpus", corpus)):
        got = df.schema[id_col].dataType
        want = new_documents.schema[id_col].dataType
        if got != want:
            raise TypeError(
                f"id column {id_col!r} type drift: new_documents has "
                f"{want.simpleString()} but {side} has "
                f"{got.simpleString()}; cast the batch ids to the "
                "corpus/index type before ingesting"
            )
    new_sh = word_shingles(new_documents, id_col, text_col, n=shingle_words)
    # Checkpoint the batch's banding: it feeds the bucket sizing, the
    # bucket join AND the returned new_index_rows (which callers append
    # to the index table) — without it the shingle + 64-hash minhash
    # pass, the heaviest per-batch stage, re-executes per consumer.
    new_banded = lsh_band_keys(
        new_sh, num_hashes=num_hashes, bands=bands
    ).localCheckpoint(eager=True)
    all_banded = index.select(
        F.col(id_col).alias("_id"), "band", "band_key"
    ).union(new_banded)

    sized = all_banded.groupBy("band", "band_key").agg(
        F.count("*").alias("bucket_size")
    )
    ok = sized.filter(F.col("bucket_size") <= max_bucket_size)
    dropped = sized.filter(F.col("bucket_size") > max_bucket_size)
    # Only buckets containing at least one NEW id can produce new pairs.
    hot = ok.join(
        new_banded.select("band", "band_key").distinct(),
        ["band", "band_key"],
        "left_semi",
    ).select("band", "band_key")

    left = new_banded.join(hot, ["band", "band_key"]).select(
        "band", "band_key", F.col("_id").alias("x")
    )
    right = all_banded.join(hot, ["band", "band_key"]).select(
        "band", "band_key", F.col("_id").alias("y")
    )
    pairs = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b")
        )
        .distinct()
    )

    new_ids = new_documents.select(F.col(id_col).alias("_nid")).distinct()
    touched = (
        pairs.select(F.explode(F.array("a", "b")).alias(id_col))
        .distinct()
        .join(new_ids.withColumnRenamed("_nid", id_col), id_col, "left_anti")
    )
    old_sh = word_shingles(
        corpus.join(touched, id_col, "left_semi"),
        id_col,
        text_col,
        n=shingle_words,
    )
    verified = jaccard_verify(
        pairs, new_sh.union(old_sh), threshold=jaccard_threshold
    )
    new_index_rows = new_banded.select(
        F.col("_id").alias(id_col), "band", "band_key"
    )
    return verified, new_index_rows, dropped


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("simhash", LongType())]
)


def _token_hash_u64(token: str) -> int:
    """Engine-portable 64-bit token hash: first 8 md5 digest bytes,
    little-endian — exactly DuckDB's ``md5_number_upper(token)``. Using a
    cross-engine-reproducible hash (instead of e.g. pandas' internal
    hash) is what makes simhash signatures SQL-oracle-able."""
    import hashlib

    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "little")


def _simhash_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """64-bit simhash per doc: sign of per-bit sums of token hashes.

    Token hashes are md5-derived (see ``_token_hash_u64``) with a
    per-batch memo (token vocab across a batch is much smaller than the
    token stream); the per-bit balance is one numpy unpackbits + sum per
    doc, no per-token Python beyond the memoized hash.
    """
    memo: dict[str, int] = {}
    out_ids, out_hashes = [], []
    for doc_id, text in zip(pdf["doc_id"].values, pdf["text"].values):
        tokens = str(text).lower().split()
        if not tokens:
            out_ids.append(doc_id)
            out_hashes.append(0)
            continue
        for t in tokens:
            if t not in memo:
                memo[t] = _token_hash_u64(t)
        hashes = np.fromiter(
            (memo[t] for t in tokens), dtype=np.uint64, count=len(tokens)
        )
        bits = np.unpackbits(hashes.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
        # signed: a uint64 sum would underflow below len/2 ones per bit
        balance = bits.sum(axis=0).astype(np.int64) * 2 - len(tokens)
        sig_bits = (balance > 0).astype(np.uint8)
        sig = int.from_bytes(np.packbits(sig_bits, bitorder="little").tobytes(), "little")
        out_ids.append(doc_id)
        out_hashes.append(sig - (1 << 64) if sig >= (1 << 63) else sig)  # to signed
    return pd.DataFrame({"doc_id": out_ids, "simhash": out_hashes})


def simhash_signatures_df(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _simhash_batch(pdf.rename(columns={id_col: "doc_id", text_col: "text"}))

    return documents.select(id_col, text_col).mapInPandas(kernel, _SIMHASH_SCHEMA)


def simhash_near_duplicates(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_size: int = 1024,
    return_dropped: bool = False,
) -> DataFrame:
    """(a, b, hamming) pairs with Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: 64 bits split into ``max_hamming + 1`` bands — a
    pair within the distance budget must agree exactly on ≥1 band (it
    can't touch all of them), so an equi-join per band finds every
    qualifying pair; ``bit_count`` on XOR verifies JVM-side. No O(n²)
    stage. Scale note: larger ``max_hamming`` ⇒ narrower band keys ⇒
    bigger buckets — keep it small (≤ 7, i.e. ≥ 8-bit bands) on large
    corpora.

    Buckets over ``max_bucket_size`` (a degenerate corpus — e.g. a mass
    of empty docs, which all hash to signature 0 — puts O(n²) pairs on
    one (band, band_val) key) are excluded from the join and reported
    via ``return_dropped=True`` → ``(pairs, dropped_buckets)``: the same
    cap + no-silent-truncation rule as ``lsh_candidate_pairs`` and
    ``embedding_candidate_pairs``. Dropping a bucket only loses recall
    for pairs seen in no other band; it never admits a false pair (the
    bit_count verify is exact).
    """
    # ≥2 bands always: max_hamming=0 still means "identical signature",
    # which two 32-bit bands detect completely — and a single 64-bit band
    # would need a (1<<64)-1 literal that overflows LongType.
    nbands = max(max_hamming + 1, 2)
    if nbands > 32:
        raise ValueError("max_hamming must be ≤ 31 (bands need ≥2 bits)")
    bounds = [64 * i // nbands for i in range(nbands + 1)]
    sigs = simhash_signatures_df(documents, id_col, text_col)
    banded = sigs.select(
        F.col("doc_id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", bounds[i])
                        .bitwiseAND(F.lit((1 << (bounds[i + 1] - bounds[i])) - 1))
                        .alias("band_val"),
                    )
                    for i in range(nbands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.band_val")
    sized = banded.groupBy("band", "band_val").agg(F.count("*").alias("bucket_size"))
    ok = sized.filter(F.col("bucket_size") <= max_bucket_size)
    dropped = sized.filter(F.col("bucket_size") > max_bucket_size)
    bucketed = banded.join(ok.select("band", "band_val"), ["band", "band_val"])
    left = bucketed.select(
        "band", "band_val", F.col("doc_id").alias("a"), F.col("simhash").alias("sig_a")
    )
    right = bucketed.select(
        "band", "band_val", F.col("doc_id").alias("b"), F.col("simhash").alias("sig_b")
    )
    pairs = (
        left.join(right, ["band", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.expr("bit_count(sig_a ^ sig_b)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return (pairs, dropped) if return_dropped else pairs


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verify over LSH candidates)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """(a, b, jaccard) — exact word-n-gram Jaccard ≥ threshold, with LSH
    pre-filtering so the exact computation only touches candidates."""
    shingles = word_shingles(documents, id_col, text_col, n=n)
    banded = lsh_band_keys(shingles, num_hashes=num_hashes, bands=bands)
    pairs, _ = lsh_candidate_pairs(banded)
    return jaccard_verify(pairs, shingles, threshold=threshold)


def containment_pairs(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_postings: int = 64,
    min_shared: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """(pairs, dropped_shingles) — ASYMMETRIC n-gram containment
    C(A→B) = |grams(A) ∩ grams(B)| / |grams(A)|: the quote-inclusion /
    subset-duplicate detector that symmetric Jaccard structurally
    misses (a doc fully quoted inside one 10× its size has containment
    1.0 but Jaccard 0.1 — below every near-dup threshold, and size
    mismatch defeats MinHash-LSH candidacy too, which is why this
    does NOT reuse the banded machinery).

    Candidates come from an inverted-index join on shingles whose
    document frequency is ≤ ``max_postings`` (ubiquitous boilerplate
    shingles are excluded from candidacy and RETURNED for reporting —
    the "no silent caps" rule), pairs keep ≥ ``min_shared`` shared rare
    shingles; the intersection is then recomputed EXACTLY over the
    full shingle sets for candidates only, so the cap bounds the join,
    never the reported score. Output rows (a < b): (a, b, inter,
    c_a_in_b, c_b_in_a) where ``greatest(c_a_in_b, c_b_in_a) ≥
    threshold``; integer counts, round-6 divisions.

    Scale shape: one shingle explode + two map-side-combining counts,
    one posting-bounded shingle self-join (≤ max_postings² pairs per
    shingle), one candidate-restricted exact-intersection join — no
    all-pairs stage anywhere.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    shingles = word_shingles(documents, id_col, text_col, n=n)
    sizes = shingles.groupBy("_id").agg(F.count("*").alias("sz"))
    dfc = shingles.groupBy("shingle").agg(F.count("*").alias("df"))
    dropped = dfc.filter(F.col("df") > max_postings)
    kept = shingles.join(
        dfc.filter(F.col("df") <= max_postings).select("shingle"), "shingle"
    )
    la = kept.select(F.col("_id").alias("a"), "shingle")
    lb = kept.select(F.col("_id").alias("b"), "shingle")
    cand = (
        la.join(lb, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("_shared"))
        .filter(F.col("_shared") >= min_shared)
        .select("a", "b")
    )
    sa = shingles.withColumnRenamed("_id", "a")
    sb = shingles.withColumnRenamed("_id", "b")
    inter = (
        cand.join(sa, "a")
        .join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(
            sizes.select(F.col("_id").alias("a"), F.col("sz").alias("_sza")), "a"
        )
        .join(
            sizes.select(F.col("_id").alias("b"), F.col("sz").alias("_szb")), "b"
        )
        .select(
            "a",
            "b",
            F.col("inter").cast("long").alias("inter"),
            F.round(F.col("inter") / F.col("_sza"), 6).alias("c_a_in_b"),
            F.round(F.col("inter") / F.col("_szb"), 6).alias("c_b_in_a"),
        )
        .filter(F.greatest(F.col("c_a_in_b"), F.col("c_b_in_a")) >= threshold)
    )
    return out, dropped


def source_overlap(
    documents: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(src_a, src_b, n_common, share_a, share_b): cross-source
    EXACT-duplicate matrix — how much of source A's distinct content
    also appears in source B. The corpus-composition diagnostic that
    catches mirror crawls ("drop B, it is 90% a re-crawl of A") before
    mixture sampling double-counts them; on a CTI feed the same table
    shows which vendors republish each other's reports.

    Content identity is md5(text) (the exact-dedup key); per-source
    hash sets are distinct'd scan-side, the pair intersection is ONE
    hash-keyed self-join (a < b pinned by source name), and the shares
    are exact-integer divisions (round-6) against each source's
    distinct-hash count. Sources with no overlap emit no row.

    Scale shape: one (source, hash) map-side distinct, one hash-keyed
    self-join whose per-hash blowup is bounded by the number of
    sources carrying that hash (≤ #sources, a dimension), one
    dimension-sized agg + broadcast size joins.
    """
    sh = (
        documents.select(
            F.col(source_col).alias("s"), F.md5(F.col(text_col)).alias("h")
        )
        .distinct()
    )
    sizes = sh.groupBy("s").agg(F.count("*").alias("n"))
    a = sh.select(F.col("s").alias("src_a"), "h")
    b = sh.select(F.col("s").alias("src_b"), "h")
    common = (
        a.join(b, "h")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(
            F.broadcast(sizes.select(F.col("s").alias("src_a"), F.col("n").alias("_na"))),
            "src_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("s").alias("src_b"), F.col("n").alias("_nb"))),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(F.col("n_common") / F.col("_na"), 6).alias("share_a"),
            F.round(F.col("n_common") / F.col("_nb"), 6).alias("share_b"),
        )
    )


def dedup_keep_best(
    documents: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Near-dup removal keeping the BEST copy per duplicate cluster —
    the curation-grade survivor policy: ``minhash_dedup`` keeps the
    min-id copy (stable, but id order is ingestion accident), while a
    training pipeline wants the highest-quality rendition of each
    duplicated document (cleanest OCR, least-truncated mirror). The
    survivor is argmax(``score_col``, ties broken by min id) — applied
    at BOTH stages, so an exact duplicate with a better score also
    wins (the min-id exact pre-pass would silently discard the better
    copy before clustering).

    Same candidate machinery as ``minhash_dedup`` (exact pre-pass →
    LSH pairs → connected components); the survivor pick is one
    cluster-keyed window, rows never rewritten. Returns surviving full
    rows.

    100 TB note: the singleton fast path matters — docs in no pair
    never enter the component map, so the window runs over
    pair-involved rows only (duplicates are a small fraction of a
    deduped corpus), joined back left-anti.
    """
    # Exact stage, score-aware: per content hash keep argmax(score, min id).
    h = F.md5(F.col(text_col))
    wex = Window.partitionBy("_h").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    exact = (
        documents.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(wex))
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )
    pairs = minhash_near_duplicates(exact, id_col, text_col, **kwargs)
    components = connected_components(pairs.select("a", "b"))
    member = components.select(
        F.col("id").alias(id_col), F.col("component").alias("_c")
    )
    clustered = exact.join(member, id_col)  # pair-involved rows only
    wcl = Window.partitionBy("_c").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    losers = (
        clustered.withColumn("_rn", F.row_number().over(wcl))
        .filter(F.col("_rn") > 1)
        .select(F.col(id_col))
    )
    return exact.join(losers, id_col, "left_anti")


def select_sources_greedy(
    documents: DataFrame,
    k: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(rank, source, n_new, n_covered): greedy weighted set cover
    over sources — "which k feeds/crawls cover the most distinct
    content" — the licensing/acquisition question a corpus team
    actually budgets with, and on a CTI desk the feed-subscription
    version of it. Round r picks the source adding the most NOT-YET-
    COVERED distinct md5 contents (ties by source name ASC); the
    classic (1 − 1/e)-approximation, made engine-deterministic by the
    exact-integer gain counts and the pinned tiebreak.

    Mechanics: the (source, hash) incidence is distinct'd once and
    cached by the caller if reused; each of the ≤ k rounds is ONE
    aggregate over the uncovered incidence plus a 1-row driver pick
    (the ``k_core``/``funnel`` bounded-driver-action discipline) and a
    hash-keyed left-anti join to shrink the uncovered set. k is
    dimension-bounded (≤ #sources), never data-bounded.

    Stops early when every remaining source adds zero new content
    (fully-mirrored tails never pad the result).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    sh = (
        documents.select(
            F.col(source_col).alias("s"), F.md5(F.col(text_col)).alias("h")
        )
        .distinct()
    )
    spark = documents.sparkSession
    uncovered = sh
    picks = []
    covered = 0
    for r in range(1, k + 1):
        gains = uncovered.groupBy("s").agg(F.count("*").alias("n"))
        top = gains.orderBy(F.col("n").desc(), F.col("s").asc()).take(1)
        if not top or top[0]["n"] == 0:
            break
        s, n = top[0]["s"], top[0]["n"]
        covered += n
        picks.append((r, s, n, covered))
        won = uncovered.filter(F.col("s") == s).select("h")
        uncovered = uncovered.join(won, "h", "left_anti").localCheckpoint(
            eager=True
        )
    return spark.createDataFrame(
        picks, "rank int, source string, n_new long, n_covered long"
    )


def family_size_histogram(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-duplicate family-size histogram — the corpus-health view a
    dedup pass is judged by: ``(family_size, n_families, n_docs)``
    where a *family* is an md5-equal content class. family_size 1 rows
    are the unique mass; the heavy tail (one text in 10^6 docs) is what
    the dedup operators above exist to remove, and watching this
    histogram across ingest batches shows whether duplication is
    growing faster than the corpus.

    Scale shape: two cascaded map-side-combining aggregates — the first
    keyed by the 32-hex md5 (only hashes shuffle, never text), the
    second by the bigint family size (<= log-ish distinct sizes). The
    classic hot-key case (a single huge family) is exactly ONE row into
    the second aggregate. Nothing collects.
    """
    fam = documents.groupBy(
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h")
    ).agg(F.count("*").cast("long").alias("family_size"))
    return (
        fam.groupBy("family_size")
        .agg(F.count("*").cast("long").alias("n_families"))
        .select(
            "family_size",
            "n_families",
            (F.col("family_size") * F.col("n_families"))
            .cast("long")
            .alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# Paragraph-level boilerplate removal (CCNet / Dolma-style)
# ---------------------------------------------------------------------------

def paragraph_dedup(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Remove paragraphs that repeat across >= ``min_docs`` distinct
    documents (nav bars, cookie banners, license footers) and rebuild
    each document's text with its paragraph order preserved — the
    CCNet/Dolma paragraph-granularity dedup that document-level dedup
    cannot express (two docs sharing a footer are NOT near-duplicates
    of each other, yet a trained model sees the footer 10^6 times).

    Output: ``(doc_id, text, n_paragraphs, n_removed)`` — one row per
    input document; a document whose every paragraph is boilerplate
    keeps a row with empty text (quarantine-don't-drop convention, the
    caller decides). Empty paragraphs (consecutive separators) are
    paragraphs too and follow the same frequency rule, so the rebuilt
    text is NOT merely ``sep``-normalized — what survives is exactly
    the non-boilerplate subsequence.

    Scale shape (100 TB): posexplode is map-side; the frequency
    aggregate shuffles only ``(md5, doc_id)`` pairs with partial
    countDistinct; the boilerplate set joins back by 32-hex key (an
    anti join — never a collect, the set can be arbitrarily large);
    reassembly is one ``id_col`` aggregate whose per-group state is
    bounded by a single document's paragraphs. The classic hot case (a
    footer in every doc) is ONE group in the frequency agg and an
    anti-join key hit — no skew amplification.
    """
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2")
    # ``sep`` is a LITERAL separator: F.split takes a Java regex, so
    # escape every non-alphanumeric char — an unescaped "|" or "."
    # would split between every character AND diverge from the literal
    # concat_ws rejoin below.
    sep_rx = "".join(ch if ch.isalnum() else "\\" + ch for ch in sep)
    paras = documents.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), sep_rx)
        ).alias("_pos", "_para"),
    ).select("_id", "_pos", "_para", F.md5(F.col("_para")).alias("_ph"))
    boiler = (
        paras.groupBy("_ph")
        .agg(F.countDistinct("_id").alias("_nd"))
        .filter(F.col("_nd") >= F.lit(min_docs))
        .select("_ph")
    )
    kept = paras.join(boiler, "_ph", "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
                lambda s: s["_para"],
            ),
        ).alias("_text"),
        F.count("*").cast("long").alias("_n_kept"),
    )
    totals = paras.groupBy("_id").agg(
        F.count("*").cast("long").alias("n_paragraphs")
    )
    return (
        totals.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("_text"), F.lit("")).alias(text_col),
            "n_paragraphs",
            (
                F.col("n_paragraphs") - F.coalesce(F.col("_n_kept"), F.lit(0))
            ).cast("long").alias("n_removed"),
        )
    )


def soft_dedup_weights(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """SlimPajama-style SOFT deduplication: instead of dropping
    duplicates, every row gets sampling weight 1/family_size (md5-equal
    content classes), so each distinct text contributes total mass 1 to
    a weighted draw no matter how often it was crawled. The downstream
    weighted sampler (packing.weighted_sample) consumes the weight
    column directly — soft dedup composes with temperature mixing
    where hard dedup would have already destroyed the signal that a
    text was popular.

    Emits (id, family_size, weight): weight is the ONE round-6
    division 1/family_size; family_size is an exact bigint.

    Scale shape: ONE window count partitioned by the 32-hex md5 — a
    single exchange where the equivalent groupBy+rejoin costs two, and
    only (id, hash) pairs shuffle, never text. The classic hot family
    (one boilerplate text in 10^6 copies) lands in one partition as
    10^6 skinny rows — the same bounded skew every md5-keyed dedup op
    here carries, and the reason text is dropped before the exchange.
    """
    h = F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h")
    w = Window.partitionBy("_h")
    return (
        documents.select(F.col(id_col), h)
        .withColumn("family_size", F.count("*").over(w).cast("long"))
        .select(
            id_col,
            "family_size",
            F.round(
                F.lit(1.0) / F.col("family_size").cast("double"), 6
            ).alias("weight"),
        )
    )
