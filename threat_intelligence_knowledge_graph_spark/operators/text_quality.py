"""Text analysis for training-data curation — all Catalyst expressions.

Language-ID (stopword-hit heuristic), quality scoring (length / punctuation
/ stopword ratios), token counting (whitespace + BPE-ish regex), and
document fingerprinting (min-k of shingle hashes, winnowing-style). Every
operator is a pure column expression over ``documents(doc_id, text)`` —
whole-stage-codegen'd, zero Python — and each is mirrored by an ANSI-SQL
oracle in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, Window, functions as F

STOPWORDS_EN = [
    "the", "and", "of", "to", "in", "a", "is", "that", "it", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
]
STOPWORDS_ES = [
    "el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
    "por", "con", "para", "es", "del", "se", "no", "al", "lo", "como",
]
STOPWORDS_DE = [
    "der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist",
    "des", "im", "ein", "eine", "auf", "für", "als", "auch", "an", "nicht",
]

LANG_STOPWORDS = {"en": STOPWORDS_EN, "es": STOPWORDS_ES, "de": STOPWORDS_DE}

# A BPE-ish pre-tokenizer split: word pieces, numbers, or single
# non-space symbols (the GPT-2-style pattern family, simplified to be
# portable between Java regex and RE2/DuckDB).
BPE_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _tokens(text_col: str) -> Column:
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def _stopword_hits(text_col: str, words: list[str]) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(_tokens(text_col), lambda t: F.array_contains(wl, t)))


def token_counts(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    return documents.select(
        F.col(id_col),
        F.size(_tokens(text_col)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_REGEX), 0)).alias(
            "bpe_tokens"
        ),
    )


def quality_metrics(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc curation features: lengths, ratios, stopword density."""
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(_tokens(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[.,;:!?]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[A-Z]", ""))
    hits = _stopword_hits(text_col, STOPWORDS_EN)
    return documents.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        (n_chars / n_tokens).alias("mean_token_len"),
        (n_punct / n_chars).alias("punct_ratio"),
        (n_upper / n_chars).alias("upper_ratio"),
        (hits / n_tokens).alias("stopword_ratio"),
    )


def quality_score(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Scalar [0,1] quality score: documents that look like prose score
    high; word salad / symbol soup scores low. Fixed weights, documented
    here so the oracle SQL can reproduce them exactly."""
    m = quality_metrics(documents, id_col, text_col)
    score = (
        F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0)) * 0.3
        + F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(F.col("punct_ratio") * F.lit(10.0), F.lit(1.0))) * 0.2
        + (F.lit(1.0) - F.least(F.col("upper_ratio") * F.lit(5.0), F.lit(1.0))) * 0.1
    )
    return m.select(F.col(id_col), F.round(score, 6).alias("quality"))


def language_id(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Argmax of per-language stopword hit counts (n-gram-free heuristic;
    deterministic ties broken by language code order en < es < de via
    strictly-greater comparison chain)."""
    hits = {lang: _stopword_hits(text_col, words) for lang, words in LANG_STOPWORDS.items()}
    pred = (
        F.when(
            (hits["es"] > hits["en"]) & (hits["es"] >= hits["de"]), F.lit("es")
        )
        .when((hits["de"] > hits["en"]) & (hits["de"] > hits["es"]), F.lit("de"))
        .otherwise(F.lit("en"))
    )
    return documents.select(F.col(id_col), pred.alias("lang_pred"))


def fingerprints(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 8,
    k: int = 5,
) -> DataFrame:
    """Winnowing-style fingerprint: the k lexicographically-smallest md5s
    of character shingles. md5 (not murmur) so the DuckDB oracle computes
    the identical fingerprint."""
    norm = F.lower(F.col(text_col))
    offsets = F.sequence(
        F.lit(1), F.greatest(F.length(norm) - F.lit(shingle - 1), F.lit(1))
    )
    hashes = F.transform(offsets, lambda i: F.md5(norm.substr(i, F.lit(shingle))))
    return documents.select(
        F.col(id_col),
        F.slice(F.array_sort(F.array_distinct(hashes)), 1, k).alias("fingerprint"),
    )


# PII scrub patterns — portable between Java regex (Spark) and RE2/DuckDB
# (no lookarounds, no backrefs) so the transform is SQL-oracle-able. The
# replacement tokens follow the common pretraining-corpus convention of
# typed placeholders.
PII_PATTERNS: list[tuple[str, str]] = [
    # order matters: emails before phone-ish digit runs (an email's
    # digits must not be half-redacted first)
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # leading \b only on the digit alternative: '\b(' is never a word
    # boundary after a space, so a single leading \b would reject
    # '(555) 123-4567' outright
    # separators optional so bare '5551234567' and '(555)123-4567' are
    # caught too; the trailing \b keeps 10-of-N-digit substrings of
    # longer runs (card numbers, ids) from half-matching
    (r"(?:\+?\d{1,3}[ .-])?(?:\(\d{3}\)|\b\d{3})[ .-]?\d{3}[ .-]?\d{4}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    # 15-digit Amex (4-6-5 grouping) alternative alongside the 16-digit
    # 4-4-4-4 networks; 3[47] prefixes are Amex-only so they moved there
    (r"\b(?:3[47]\d{2}[ -]?\d{6}[ -]?\d{5}|(?:4\d{3}|5[1-5]\d{2}|6011)(?:[ -]?\d{4}){3})\b", "<CARD>"),
]


def scrub_pii(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text): PII redacted with typed placeholders — the standard
    pretraining-corpus cleaning transform (emails, phone numbers, SSNs,
    card numbers). Pure Catalyst ``regexp_replace`` chain: one
    projection, zero Python, applied in pattern order (the list order is
    part of the contract — earlier patterns consume text later ones
    would otherwise half-match)."""
    out = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return documents.select(F.col(id_col), out.alias(text_col))


def pii_audit(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "role",
    doc_col: str = "conv_id",
) -> DataFrame:
    """(group, pii_class, n_hits, n_turns, n_convs): PII-leakage audit —
    the privacy report a transcript-derived training corpus needs BEFORE
    deciding to train (which roles leak emails/phones/SSNs/cards, how
    often, across how many conversations), the reporting twin of
    ``scrub_pii``.

    Counting is **sequential**, mirroring the scrub's pattern order:
    class k is counted on the text with classes 0..k-1 already replaced,
    so a digit run consumed by an earlier class (an email's digits, a
    phone inside what a card grabbed) is never double-counted — the
    counts are exactly "how many placeholders would scrub_pii emit".

    Pure Catalyst: one projection (regexp_count over nested
    regexp_replace), one explode, one hash aggregate — scan-local until
    the tiny (group × class) rollup. All-integer output, exact
    cross-engine."""
    structs = []
    for k, (pat, repl) in enumerate(PII_PATTERNS):
        cls = repl.strip("<>")
        scrubbed = F.col(text_col)
        for ppat, prepl in PII_PATTERNS[:k]:
            scrubbed = F.regexp_replace(scrubbed, ppat, prepl)
        structs.append(
            F.struct(
                F.lit(cls).alias("pii_class"),
                F.regexp_count(scrubbed, F.lit(pat)).alias("cnt"),
            )
        )
    hit = F.col("x.cnt") > 0
    return (
        df.select(
            F.col(group_col),
            F.col(doc_col),
            F.explode(F.array(*structs)).alias("x"),
        )
        .groupBy(group_col, F.col("x.pii_class").alias("pii_class"))
        .agg(
            F.sum("x.cnt").alias("n_hits"),
            F.sum(F.when(hit, 1).otherwise(0)).alias("n_turns"),
            F.countDistinct(F.when(hit, F.col(doc_col))).alias("n_convs"),
        )
    )


def tfidf_top_terms(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_term_len: int = 2,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by smoothed TF-IDF —
    the classic keyword-extraction / corpus-exploration primitive
    (``tfidf = tf · ln((N+1)/(df+1))``, terms = lowercase ``[a-z0-9]``
    runs of length ≥ ``min_term_len``).

    Cross-engine determinism (the oracle-parity discipline): the score
    is **rounded to 6 decimals BEFORE ranking**, and the ranking is a
    ``row_number`` over the fully deterministic key ``(tfidf DESC, df
    ASC, term ASC)``. Distinct ``(tf, df)`` pairs whose products are
    mathematically equal (e.g. ``2·ln(10)`` vs ``ln(100)``) can round
    differently in the last ulp per engine; rounding first collapses
    them to the same key so the integer tiebreaks decide identically
    everywhere (ln of a rational is transcendental, so a true value
    never sits exactly on a rounding boundary).

    100 TB shape: token explode is scan-local; ``tf`` shuffles on
    ``(doc, term)``, ``df`` is a map-side-combining re-agg of the tf
    frame on ``term`` (vocabulary-sized, Zipf-bounded); the tf⋈df join
    and the per-doc window shuffle on their natural keys; N is one
    bounded count scalar. No Python anywhere."""
    toks = documents.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"regexp_extract_all(lower({text_col}), "
                f"'[a-z0-9]{{{min_term_len},}}', 0)"
            )
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = documents.select(F.count("*").alias("_n"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log((F.col("_n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            id_col,
            "term",
            "tf",
            "df",
            "tfidf",
            F.col("rk").cast("int").alias("rk"),
        )
    )


def repetition_ratio(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 8,
) -> DataFrame:
    """(id, rep_ratio): 1 − distinct/total character shingles — the
    boilerplate/repetition quality signal (Gopher/RefinedWeb-style rep
    filters). 0 for fully novel text, → 1 for highly repetitive text;
    docs shorter than ``shingle`` chars have a single degenerate shingle
    and score 0. Pure Catalyst (same shingling as ``fingerprints``)."""
    norm = F.lower(F.col(text_col))
    offsets = F.sequence(
        F.lit(1), F.greatest(F.length(norm) - F.lit(shingle - 1), F.lit(1))
    )
    shingles = F.transform(offsets, lambda i: norm.substr(i, F.lit(shingle)))
    total = F.size(shingles)
    distinct = F.size(F.array_distinct(shingles))
    return documents.select(
        F.col(id_col),
        (F.lit(1.0) - distinct.cast("double") / total.cast("double")).alias(
            "rep_ratio"
        ),
    )


def unigram_logprob(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_term_len: int = 2,
) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob): mean ln p(token) under the
    corpus's OWN unigram LM — the cheap in-engine stand-in for the
    CCNet/Gopher LM-perplexity quality signal. Corpus-typical docs
    score high (closer to 0); OOV-heavy, garbled, or boilerplate-coded
    docs score low. ``p(t) = count(t) / total_tokens`` (MLE — every
    scored token is in the vocabulary by construction, so no smoothing
    is needed); docs with zero tokens are absent from the result.

    Determinism: ``avg_logprob`` is rounded to 6 decimals AFTER the
    per-doc mean (the tfidf_top_terms discipline — ln of a rational is
    transcendental, so true values never sit on rounding boundaries;
    only last-ulp sum-order noise is collapsed).

    100 TB shape: one scan-local token explode → (doc, term) tf agg →
    vocabulary-sized term re-agg (map-side combining, Zipf-bounded) →
    tf⋈counts keyed join + ONE-ROW broadcast total → per-doc agg. The
    same plan skeleton as tfidf_top_terms; no Python anywhere.
    """
    toks = documents.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"regexp_extract_all(lower({text_col}), "
                f"'[a-z0-9]{{{min_term_len},}}', 0)"
            )
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    counts = tf.groupBy("term").agg(F.sum("tf").alias("ct"))
    total = tf.select(F.sum("tf").alias("_total"))
    return (
        tf.join(counts, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.col("ct") / F.col("_total").cast("double"))
                )
                / F.sum("tf"),
                6,
            ).alias("avg_logprob"),
        )
    )


def bigram_logprob(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_term_len: int = 2,
) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob2): mean ln p(w2 | w1) under the
    corpus's OWN bigram LM — the order-2 member of the CCNet/KenLM
    perplexity-filter family next to :func:`unigram_logprob` (order 1).
    The bigram score separates corpus-typical PHRASING from merely
    corpus-typical vocabulary: shuffled or template-stitched text keeps
    its unigram score but craters here. ``p(w2|w1) = ct(w1 w2) /
    ct(w1 ·)`` (MLE — every scored bigram is in the corpus model by
    construction, so no smoothing is needed); docs with fewer than two
    tokens are absent from the result.

    Determinism: round-6 AFTER the per-doc mean (the unigram_logprob
    discipline — ln of a rational never sits on a rounding boundary;
    only last-ulp sum-order noise is collapsed).

    100 TB shape: scan-local tokenize + adjacent-pair explode (the
    ``transform(sequence(...))`` pair build is per-row, no shuffle) →
    (doc, bigram) tf agg → bigram-vocabulary re-agg (map-side
    combining, Zipf-bounded like the unigram vocab) → a second
    dimension-sized agg folds bigram counts to left-context counts →
    two keyed joins + per-doc agg. No Python anywhere; the bigram
    dictionary is larger than the unigram one but still sublinear in
    corpus size, and both model aggs combine map-side.
    """
    toks = documents.select(
        F.col(id_col),
        F.expr(
            f"regexp_extract_all(lower({text_col}), "
            f"'[a-z0-9]{{{min_term_len},}}', 0)"
        ).alias("_toks"),
    )
    bigr = (
        toks.filter(F.size("_toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    "transform(sequence(2, size(_toks)), "
                    "i -> concat(_toks[i-2], ' ', _toks[i-1]))"
                )
            ).alias("bg"),
        )
    )
    tf = bigr.groupBy(id_col, "bg").agg(F.count("*").alias("tf"))
    cts = tf.groupBy("bg").agg(F.sum("tf").alias("ct"))
    ctx = cts.groupBy(
        F.substring_index(F.col("bg"), " ", 1).alias("_w1")
    ).agg(F.sum("ct").alias("ctx"))
    return (
        tf.join(cts, "bg")
        .withColumn("_w1", F.substring_index(F.col("bg"), " ", 1))
        .join(ctx, "_w1")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.col("ct") / F.col("ctx").cast("double"))
                )
                / F.sum("tf"),
                6,
            ).alias("avg_logprob2"),
        )
    )


def feature_hash(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    min_term_len: int = 2,
) -> DataFrame:
    """(doc_id, idx, weight): hashing-trick featurization (Weinberger
    et al.) — terms hash to ``idx = h(term) % dim`` with a ±1 sign
    hash, weights sum per (doc, idx). The fixed-dimension, vocabulary-
    free featurizer for corpus-scale quality/topic classifiers: no
    dictionary to build, broadcast, or version — new terms at ingest
    time just hash. Sign-cancelled cells (weight 0) are dropped, so
    the output is the sparse representation.

    Hashes are the engine-portable md5 family (``operators.packing``),
    so feature vectors are reproducible across engines, runs, and
    partitionings — a model trained on yesterday's features scores
    today's batch. One explode + two aggs, no Python.
    """
    from .packing import _md5_bucket

    if dim < 1:
        raise ValueError("dim must be >= 1")
    toks = documents.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"regexp_extract_all(lower({text_col}), "
                f"'[a-z0-9]{{{min_term_len},}}', 0)"
            )
        ).alias("term"),
    )
    hashed = toks.select(
        id_col,
        _md5_bucket("term", "fh", dim).alias("idx"),
        (_md5_bucket("term", "fhs", 2) * 2 - 1).alias("sign"),
    )
    return (
        hashed.groupBy(id_col, "idx")
        .agg(F.sum("sign").cast("long").alias("weight"))
        .filter(F.col("weight") != 0)
    )


def unigram_kl(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    min_term_len: int = 2,
) -> DataFrame:
    """One row (vocab_size, total_a, total_b, kl_divergence):
    KL(P_a ‖ P_b) between the two corpora's add-1-smoothed unigram
    distributions over their SHARED vocabulary — the standard domain-
    shift / distribution-drift monitor for a training-data pipeline
    (is today's ingest batch drifting from the curated corpus? is a
    source suddenly off-distribution?). 0 = identical distributions;
    grows as A concentrates where B is thin.

    p_x(t) = (ct_x(t) + 1) / (total_x + V) with V = |vocab(A ∪ B)| —
    smoothing keeps every term in both supports, so the sum is finite
    by construction. Every ln argument is a ratio of exact-integer
    products (the dsir discipline): both engines build the identical
    doubles, and round-6 after the sum collapses summation-order noise.

    Shape: two scan-local token explodes → two vocabulary-sized count
    aggs (map-side combining, Zipf-bounded) → one FULL OUTER keyed join
    on term → three 1-row broadcasts (totals, V) → one global sum. No
    per-row Python, no driver collects.
    """
    def _counts(df, name):
        toks = df.select(
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}), "
                    f"'[a-z0-9]{{{min_term_len},}}', 0)"
                )
            ).alias("term")
        )
        return toks.groupBy("term").agg(F.count("*").cast("long").alias(name))

    ca = _counts(docs_a, "ca")
    cb = _counts(docs_b, "cb")
    merged = (
        ca.join(cb, "term", "full_outer")
        .select(
            "term",
            F.coalesce(F.col("ca"), F.lit(0)).cast("long").alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).cast("long").alias("cb"),
        )
    )
    sums = merged.agg(
        F.count("*").cast("long").alias("v"),
        F.sum("ca").cast("long").alias("ta"),
        F.sum("cb").cast("long").alias("tb"),
    )
    j = merged.crossJoin(F.broadcast(sums))
    contrib = (
        (F.col("ca") + 1) / (F.col("ta") + F.col("v"))
    ) * F.log(
        ((F.col("ca") + 1) * (F.col("tb") + F.col("v")))
        / ((F.col("cb") + 1) * (F.col("ta") + F.col("v")))
    )
    return j.groupBy().agg(
        F.max("v").alias("vocab_size"),
        F.max("ta").alias("total_a"),
        F.max("tb").alias("total_b"),
        F.round(F.sum(contrib), 6).alias("kl_divergence"),
    )


def quality_gate(
    documents: DataFrame,
    q: float = 0.25,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, group, quality, threshold): documents at or above their
    OWN group's nearest-rank q-quantile of ``quality_score`` — the
    auto-calibrated quality cut. A fixed global threshold misfires on
    heterogeneous corpora (a threshold tuned on web prose guts a code
    or chat-log source whose scores sit lower wholesale); cutting each
    source at its own percentile drops the worst q of EVERY source
    while preserving the mixture.

    The threshold is the value at ordered row ceil(q·n) with id
    tiebreak (the ``exact_percentiles`` same-physical-row discipline),
    so gate membership is engine/partitioning-exact. One group-keyed
    window over the scored frame; scoring itself is the scan-local
    ``quality_score`` projection.
    """
    if not 0.0 < q < 1.0:
        raise ValueError("q must be in (0, 1)")
    scores = quality_score(documents, id_col, text_col)
    base = documents.select(
        F.col(id_col), F.col(group_col).alias("group")
    ).join(scores, id_col)
    w = Window.partitionBy("group").orderBy("quality", id_col)
    n = Window.partitionBy("group")
    ranked = base.select(
        "*",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(n).alias("_n"),
    )
    thr = ranked.filter(
        F.col("_rn") == F.ceil(F.lit(q) * F.col("_n"))
    ).select("group", F.col("quality").alias("threshold"))
    return (
        base.join(thr, "group")
        .filter(F.col("quality") >= F.col("threshold"))
        .select(id_col, "group", "quality", "threshold")
    )


def bm25_search(
    documents: DataFrame,
    query_terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-``k`` retrieval (Robertson-Sparck Jones; the
    Lucene-default k1 = 1.2, b = 0.75 pinned as literals 2.2 / 0.75 /
    0.25 so the oracle reproduces the float expression SHAPE exactly):
    score(d) = Σ_t idf(t) · tf·2.2 / (tf + 1.2·(0.25 + 0.75·dl·N/Σdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Determinism: per-(doc, term) contributions are exact-shaped double
    chains; the per-doc sum is rounded to 6 decimals BEFORE ranking and
    the rank key is (score DESC, id ASC) — both engines pick identical
    rows. Only documents containing at least one query term are scored.

    Scale shape: the corpus-level constants (N, Σdl) are a 1-row
    aggregate cross-joined (broadcast) onto the matches; df is a
    query-terms-sized aggregate, also broadcast; the token explode is
    filtered to the query vocabulary BEFORE the shuffle so the per-term
    tf aggregation moves only matching tokens; top-k is
    TakeOrderedAndProject via row_number ≤ k on a rank key, never a
    global sort of the corpus.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qlit = F.array(*[F.lit(t) for t in sorted(set(query_terms))])
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z0-9]{2,}"), 0)
    base = documents.select(
        F.col(id_col), F.size(toks).alias("dl"), toks.alias("_toks")
    )
    consts = base.agg(
        F.count("*").alias("n"), F.sum("dl").alias("tdl")
    )
    tf = (
        base.select(
            id_col,
            "dl",
            F.explode(F.filter(F.col("_toks"), lambda t: F.array_contains(qlit, t))).alias(
                "term"
            ),
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    contrib = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(consts))
        .select(
            F.col(id_col),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(2.2))
                / (
                    F.col("tf")
                    + F.lit(1.2)
                    * (
                        F.lit(0.25)
                        + F.lit(0.75) * (F.col("dl") * F.col("n")) / F.col("tdl")
                    )
                )
            ).alias("_c"),
        )
    )
    from pyspark.sql import Window

    scored = contrib.groupBy(id_col).agg(F.round(F.sum("_c"), 6).alias("score"))
    # orderBy().limit() compiles to TakeOrderedAndProject (no global
    # sort); the rank column is assigned AFTER the cut so the window
    # only ever sees k rows.
    top = scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn("rk", F.row_number().over(w).cast("int"))


def blocklist_filter(
    documents: DataFrame,
    blocklist: list[str],
    max_ratio: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style bad-word gate: the fraction of whitespace tokens that
    are in the pinned ``blocklist`` (exact lowercase token match — the
    word-boundary semantics that avoid the Scunthorpe substring trap);
    ``blocked`` marks documents whose ratio EXCEEDS ``max_ratio``.
    Quarantine-don't-drop: every document is returned with its ratio
    and flag so the caller routes rejects to a quarantine sink instead
    of silently losing them.

    Determinism: hits/ratio are an exact integer count over the same
    ``\\s+`` token split the quality metrics use, one division rounded
    to 6; the flag is a strict > on the rounded value. Scale shape:
    a single scan-local codegen'd projection — no shuffle, no Python.
    """
    wl = F.array(*[F.lit(w) for w in sorted(set(blocklist))])
    tokens = _tokens(text_col)
    hits = F.size(F.filter(tokens, lambda t: F.array_contains(wl, t)))
    ratio = F.round(hits / F.size(tokens), 6)
    return documents.select(
        F.col(id_col),
        hits.cast("int").alias("bad_hits"),
        ratio.alias("bad_ratio"),
        (ratio > F.lit(max_ratio)).alias("blocked"),
    )


def type_token_ratio(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Lexical diversity (type-token ratio): distinct regexp tokens
    over total tokens — low TTR flags template spam / keyword-stuffed
    boilerplate that the repetition-ratio signal (consecutive-run
    based) can miss when the repeats are shuffled. Same ``[a-z0-9]{2,}``
    token class as the TF-IDF/BM25 family; one round-6 division;
    scan-local codegen'd projection, zero shuffle."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z0-9]{2,}"), 0)
    return documents.select(
        F.col(id_col),
        F.size(toks).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("int").alias("n_types"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("ttr"),
    )


def top_ngrams(
    documents: DataFrame,
    n: int = 2,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-``k`` word n-grams by raw count — the
    corpus-exploration / boilerplate-discovery primitive (a bigram that
    appears in half the corpus is a template phrase worth a dedup or
    scrub rule). Same ``[a-z0-9]{2,}`` token class as the TF-IDF/BM25
    family; space-joined n-grams; fully deterministic
    (count DESC, ngram ASC) rank.

    Scale shape: the explode happens scan-side and feeds ONE
    map-side-combining count aggregation (partial aggregation absorbs
    the Zipf head before the shuffle); top-k is a TakeOrderedAndProject
    via orderBy().limit(), with the rank column assigned after the cut.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z0-9]{2,}"), 0)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counted = (
        documents.select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n"))
    )
    top = counted.orderBy(F.col("n").desc(), F.col("ngram").asc()).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("ngram").asc())
    return top.select(
        "ngram",
        F.col("n").cast("long").alias("n"),
        F.row_number().over(w).cast("int").alias("rk"),
    )


def vocab_prune(
    documents: DataFrame,
    min_df: int = 2,
    max_df_ratio: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document-frequency-band vocabulary selection (the sklearn
    min_df/max_df contract): keep terms appearing in at least
    ``min_df`` documents and at most ``floor(max_df_ratio · N)`` —
    dropping hapax noise below and stopword-like ubiquity above —
    the vocabulary feeding TF-IDF / hashing featurizers.

    Determinism: df is an exact integer distinct-doc count; the upper
    bound is floor(ratio·N) computed identically on both engines; the
    output is the kept (term, df) set. Scale shape: one scan-side
    distinct-per-doc explode into ONE map-side-combining count, then a
    scan-local band filter against a 1-row broadcast N — the Zipf head
    collapses before the shuffle because per-doc terms are
    pre-distincted."""
    if min_df < 1:
        raise ValueError("min_df must be >= 1")
    if not (0.0 < max_df_ratio <= 1.0):
        raise ValueError("max_df_ratio must be in (0, 1]")
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z0-9]{2,}"), 0)
    per_doc = documents.select(
        F.col(id_col), F.explode(F.array_distinct(toks)).alias("term")
    )
    dfreq = per_doc.groupBy("term").agg(F.count("*").alias("df"))
    n = documents.agg(F.count("*").alias("_n"))
    return (
        dfreq.crossJoin(F.broadcast(n))
        .filter(
            (F.col("df") >= min_df)
            & (F.col("df") <= F.floor(F.lit(max_df_ratio) * F.col("_n")))
        )
        .select("term", F.col("df").cast("long").alias("df"))
    )


def vocab_growth(
    documents: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source vocabulary growth (the Heaps'-law corpus diagnostic):
    total tokens, distinct types, and their round-6 ratio per source —
    a source whose type count stops growing with token count is
    template/boilerplate-heavy and wants a dedup pass before mixing.
    Scale shape: one explode into one map-side-combining
    (source, term) distinct, then a per-source count + a per-source
    token-sum agg joined on the dimension-sized source key."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[a-z0-9]{2,}"), 0)
    base = documents.select(F.col(group_col).alias("grp"), toks.alias("_toks"))
    token_sums = base.groupBy("grp").agg(F.sum(F.size("_toks")).alias("n_tokens"))
    types = (
        base.select("grp", F.explode("_toks").alias("term"))
        .distinct()
        .groupBy("grp")
        .agg(F.count("*").alias("n_types"))
    )
    return token_sums.join(types, "grp").select(
        F.col("grp").alias(group_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("type_token_ratio"),
    )


def corpus_fertility(
    documents: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source tokenizer-fertility diagnostic: ``(group, n_docs,
    total_chars, total_tokens, chars_per_token, tokens_per_doc)`` using
    the BPE-ish regex tokens of ``token_counts``. chars/token is the
    compression-ratio proxy pretraining mixes are balanced by (a source
    whose fertility is far off the corpus norm is either non-prose or
    mis-encoded); tokens/doc sizes the packing budget per source.

    Exact bigint sums, two round-6 divisions (NULL when the denominator
    is 0, never a fake value). ONE map-side-combining aggregate to
    <= |sources| rows; the regex token count is scan-local.
    """
    toks = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_REGEX), 0))
    chars = F.coalesce(F.length(F.col(text_col)), F.lit(0))
    return (
        documents.select(
            F.col(group_col).alias("group"),
            chars.alias("_c"),
            toks.alias("_t"),
        )
        .groupBy("group")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_c").cast("long").alias("total_chars"),
            F.sum("_t").cast("long").alias("total_tokens"),
        )
        .select(
            "group",
            "n_docs",
            "total_chars",
            "total_tokens",
            F.when(
                F.col("total_tokens") > 0,
                F.round(F.col("total_chars") / F.col("total_tokens"), 6),
            ).alias("chars_per_token"),
            F.when(
                F.col("n_docs") > 0,
                F.round(F.col("total_tokens") / F.col("n_docs"), 6),
            ).alias("tokens_per_doc"),
        )
    )


def source_datasheet(
    documents: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    min_term_len: int = 2,
) -> DataFrame:
    """Per-source dataset-card rollup ``(source, n_docs,
    n_distinct_texts, dup_rate, n_langs, vocab_size)`` — the
    "datasheets for datasets" composition sheet a pretraining mix is
    reviewed against, orthogonal to :func:`corpus_fertility` (which
    carries the token/char budget): exact-duplicate rate inside each
    source (md5 content identity, the exact-dedup key), language
    spread, and per-source distinct vocabulary (a crawl whose vocab
    plateaus while docs grow is boilerplate).

    ``dup_rate = 1 - n_distinct_texts / n_docs`` (round-6, 0 for a
    fully-distinct source). Three independent map-side-distinct
    aggregates (hash, lang, term — each keyed by source, each
    dimension-sized after its distinct) joined back on the source
    dimension; no multi-distinct expand on one agg, so each pass
    combines map-side. The term explode is scan-local. NULL texts and
    langs are excluded from the distinct counts (SQL ``count(DISTINCT
    …)`` semantics — a NULL is not a distinct value), and the side
    aggregates LEFT-join back with coalesce-0 so a source whose docs
    are all NULL/token-less still gets its row — a datasheet that
    drops exactly the most pathological source would defeat its
    purpose.
    """
    base = documents.groupBy(F.col(group_col).alias("source")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    hashes = (
        documents.filter(F.col(text_col).isNotNull())
        .select(
            F.col(group_col).alias("source"),
            F.md5(F.col(text_col)).alias("_h"),
        )
        .distinct()
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_distinct_texts"))
    )
    langs = (
        documents.filter(F.col(lang_col).isNotNull())
        .select(
            F.col(group_col).alias("source"), F.col(lang_col).alias("_l")
        )
        .distinct()
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_langs"))
    )
    vocab = (
        documents.select(
            F.col(group_col).alias("source"),
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}), "
                    f"'[a-z0-9]{{{min_term_len},}}', 0)"
                )
            ).alias("_t"),
        )
        .distinct()
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("vocab_size"))
    )
    return (
        base.join(hashes, "source", "left")
        .join(langs, "source", "left")
        .join(vocab, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce(F.col("n_distinct_texts"), F.lit(0)).alias(
                "n_distinct_texts"
            ),
            F.round(
                F.lit(1.0)
                - F.coalesce(F.col("n_distinct_texts"), F.lit(0))
                / F.col("n_docs"),
                6,
            ).alias("dup_rate"),
            F.coalesce(F.col("n_langs"), F.lit(0)).alias("n_langs"),
            F.coalesce(F.col("vocab_size"), F.lit(0)).alias("vocab_size"),
        )
    )


def gopher_rules(
    documents: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021, App. A1.1) as one
    verdict frame: ``(id, n_words, mean_word_len, symbol_ratio,
    bullet_frac, ellipsis_frac, alpha_frac, n_stopwords, reason,
    passed)`` — ``reason`` is the FIRST failing rule under the fixed
    precedence word_count → mean_word_len → symbol_ratio →
    bullet_lines → ellipsis_lines → alpha_words → stopwords (NULL when
    passed). The published defaults are the parameter defaults; tune
    per corpus (agent transcripts run shorter than web pages).

    Signal definitions (pinned, oracle-checked): words =
    whitespace-split of the lowercased trimmed text; mean word length
    = non-whitespace chars / words (exactly the split's total since
    words partition the non-space text); symbols = '#' occurrences +
    non-overlapping '...' occurrences; lines = '\\n'-split, bullets =
    lines starting '- ' or '* ', ellipsis lines end '...'; alpha words
    contain at least one ASCII letter; stopwords counted as DISTINCT
    members of the pinned 8-word Gopher set present. Ratios are exact
    int/int divisions; rules compare raw doubles (round-6 only for the
    REPORTED columns), NULL-free.

    Scale shape: one codegen'd projection — every signal is split/
    regexp/length arithmetic on the row; no exchange, no UDF, no join.
    """
    stop_set = ["the", "be", "to", "of", "and", "that", "have", "with"]
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    words = F.split(F.trim(low), r"\s+")
    # split('') yields [''] — count real words only.
    n_words = F.when(F.length(F.trim(low)) == 0, F.lit(0)).otherwise(
        F.size(words)
    )
    n_chars_no_ws = F.length(F.regexp_replace(low, r"\s+", ""))
    n_hash = F.length(low) - F.length(F.regexp_replace(low, "#", ""))
    n_ellipsis = (
        F.length(low) - F.length(F.replace(low, F.lit("..."), F.lit("")))
    ) / 3
    lines = F.split(low, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("- ") | ln.startswith("* "),
        )
    )
    n_ell_lines = F.size(F.filter(lines, lambda ln: ln.endswith("...")))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
    n_stop = sum(
        F.array_contains(words, s).cast("int") for s in stop_set
    )

    d = documents.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_chars_no_ws.cast("long").alias("_chars"),
        (n_hash + n_ellipsis).alias("_symbols"),
        n_lines.cast("long").alias("_lines"),
        n_bullet.cast("long").alias("_bullets"),
        n_ell_lines.cast("long").alias("_ell"),
        n_alpha.cast("long").alias("_alpha"),
        n_stop.cast("long").alias("n_stopwords"),
    )
    # Zero-word documents fail word_count first; NULL-guarding the
    # ratios keeps the projection total (no divide-by-zero) and
    # engine-aligned.
    nz = F.col("n_words") > 0
    mean_len = F.when(nz, F.col("_chars") / F.col("n_words"))
    sym = F.when(nz, F.col("_symbols") / F.col("n_words"))
    bullet = F.col("_bullets") / F.col("_lines")  # n_lines >= 1 always
    ell = F.col("_ell") / F.col("_lines")
    alpha = F.when(nz, F.col("_alpha") / F.col("n_words"))
    reason = (
        F.when(
            (F.col("n_words") < min_words) | (F.col("n_words") > max_words),
            F.lit("word_count"),
        )
        .when(
            (mean_len < min_mean_word_len) | (mean_len > max_mean_word_len),
            F.lit("mean_word_len"),
        )
        .when(sym > max_symbol_ratio, F.lit("symbol_ratio"))
        .when(bullet > max_bullet_frac, F.lit("bullet_lines"))
        .when(ell > max_ellipsis_frac, F.lit("ellipsis_lines"))
        .when(alpha < min_alpha_frac, F.lit("alpha_words"))
        .when(F.col("n_stopwords") < min_stopwords, F.lit("stopwords"))
    )
    return d.select(
        id_col,
        "n_words",
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(sym, 6).alias("symbol_ratio"),
        F.round(bullet, 6).alias("bullet_frac"),
        F.round(ell, 6).alias("ellipsis_frac"),
        F.round(alpha, 6).alias("alpha_frac"),
        "n_stopwords",
        reason.alias("reason"),
        reason.isNull().alias("passed"),
    )


def hash_grid_weights(
    spark,
    dim: int = 1024,
    salt: str = "qw",
    scale: int = 1000,
) -> DataFrame:
    """``(idx, w)`` weight table on the md5 hash grid: ``w(idx) =
    (md5_number_upper(salt || ':' || idx) % (2·scale+1) - scale) /
    scale`` — a dense, engine-portable rational grid in [-1, 1]. The
    deterministic stand-in for a TRAINED quality-model weight vector
    (the real artifact is whatever ``(idx, w)`` frame the modeling job
    exports); using the grid keeps oracles and fixtures reproducible
    without shipping a model file."""
    from .packing import _md5_bucket

    return spark.range(dim).select(
        F.col("id").alias("idx"),
        (
            (_md5_bucket(F.col("id").cast("string"), salt, 2 * scale + 1) - scale)
            / F.lit(float(scale))
        ).alias("w"),
    )


def quality_model_score(
    documents: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 1024,
    bias: float = 0.0,
    threshold: float = 0.5,
    min_term_len: int = 2,
) -> DataFrame:
    """Model-based quality filtering (the fastText / DCLM-style filter
    stage): score every document with a PINNED linear model over
    hashing-trick features and return ``(id, score, keep)`` —
    ``score = round(sigmoid(Σ feature_weight·w + bias), 6)``, ``keep =
    score ≥ threshold``. Complements the heuristic gates
    (``gopher_rules``/``quality_gate``): heuristics encode rules,
    this encodes a trained preference (classifier weights over the
    same ``feature_hash`` features it was trained on).

    ``weights`` is the model: an ``(idx:long, w:double)`` frame with
    ``idx < dim`` (see ``hash_grid_weights`` for the deterministic
    test grid). Docs with no surviving features (empty text, or every
    cell sign-cancelled or unweighted) score ``sigmoid(bias)``.

    Determinism: the dot product is a float sum (cell weights are
    exact longs, model weights rationals), so only last-ulp sum-order
    noise enters; ``round(·, 6)`` AFTER the sigmoid collapses it, and
    ``keep`` compares the ROUNDED score so both engines see the same
    boundary (the tfidf/unigram_logprob discipline). ``dot + bias = 0``
    exactly yields score 0.500000, keep true.

    100 TB shape: corpus scanned ONCE (explode → (doc, idx) partial
    agg, map-side combined); the model is dimension-sized (dim ≤ a few
    million cells ≪ corpus) and BROADCAST, so scoring never shuffles
    the corpus beyond the feature agg's own doc-keyed exchange; the
    final per-doc sum rides the same key. No Python anywhere; swapping
    in real trained weights changes no plan shape.
    """
    feats = feature_hash(documents, id_col, text_col, dim, min_term_len)
    dots = (
        feats.join(F.broadcast(weights), "idx")
        .groupBy(id_col)
        .agg(F.sum(F.col("weight") * F.col("w")).alias("_dot"))
    )
    score = F.round(
        F.lit(1.0)
        / (F.lit(1.0) + F.exp(-(F.coalesce(F.col("_dot"), F.lit(0.0)) + F.lit(bias)))),
        6,
    )
    return (
        documents.select(id_col)
        .join(dots, id_col, "left")
        .select(
            id_col,
            score.alias("score"),
            (score >= F.lit(threshold)).alias("keep"),
        )
    )


def readability(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flesch reading-ease per document (Flesch 1948; the curation
    signal CCNet/Gopher-style pipelines bucket corpora by): score =
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words) with a
    deterministic, engine-portable syllable heuristic — a syllable is
    one maximal vowel run ``[aeiouy]+`` in the lowercased text (runs
    cannot span word boundaries, so no word split is needed), words
    are maximal ``[a-z]+`` runs, sentences are maximal ``[.!?]+`` runs
    floored at 1. This is the standard vowel-group approximation (no
    dictionary lookups, no silent-e modeling — those are lexicon
    features, not text features, and would break oracle parity).

    Numeric determinism: the three counts are exact integers; the
    score is two correctly-rounded IEEE divisions and a fused
    multiply-add-free linear combination of double literals, round-6 —
    identical on any IEEE-754 engine (the gini/trend discipline).
    Empty/word-free docs emit NULL score, never a fake 206.835.

    Scale shape: ONE scan-local codegen'd projection — three
    regexp_extract_all counts, zero Python, zero shuffle (the
    repetition_ratio/TTR family shape).
    """
    low = F.lower(F.col(text_col))
    n_words = F.size(F.regexp_extract_all(low, F.lit(r"[a-z]+"), 0))
    n_syll = F.size(F.regexp_extract_all(low, F.lit(r"[aeiouy]+"), 0))
    n_sent_raw = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), 0))
    n_sent = F.greatest(n_sent_raw, F.lit(1))
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sent.cast("double"))
        - F.lit(84.6) * (n_syll.cast("double") / n_words.cast("double"))
    )
    return documents.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
        F.when(n_words > 0, F.round(score, 6)).alias("flesch"),
    )


def textrank_keywords(
    documents: DataFrame,
    text_col: str = "text",
    iterations: int = 3,
    damping: float = 0.85,
    k: int = 20,
    min_term_len: int = 2,
) -> DataFrame:
    """Corpus-level TextRank (Mihalcea & Tarau, EMNLP'04) keywords:
    build the word co-occurrence graph (undirected, adjacent lowercase
    ``[a-z0-9]`` tokens, edge weight = adjacency count) and rank terms
    by weighted PageRank — the graph-centrality complement to
    :func:`tfidf_top_terms` (TF-IDF finds *distinctive* terms; TextRank
    finds *structurally central* ones that co-occur with everything).

    Pair generation is SCAN-LOCAL (no per-token shuffle): the token
    array never leaves its row — adjacent pairs come from a
    ``transform(sequence(...))`` over the array with out-of-bounds
    NULLs filtered, so the first exchange in the plan is already the
    (a, b) pair count. Self-pairs (a repeated token) are dropped;
    "a b" and "b a" both count toward the unordered edge {a, b}.

    Ranking reuses :func:`operators.pagerank.pagerank` (weighted path,
    dangling-safe) — every node of this graph has out-edges, so the
    dangling term is exactly 0 but the generic arithmetic is kept for
    oracle parity. The emitted rank is **rounded to 9 BEFORE the
    top-k ordering** (the tfidf discipline: summation-order noise is
    ~1e-17, collapsed before it can flip a tiebreak), then
    (rank DESC, term ASC) row-numbers the top ``k``.

    100 TB shape: tokenize+pair scan-local; pair count and the
    per-iteration rank⋈edge joins shuffle on term keys (vocabulary-
    sized, Zipf-bounded — the same posture as tfidf's df frame); the
    final top-k is a TakeOrderedAndProject over the vocab frame plus a
    k-row window. Stop-word hubs ("the") are the documented hot keys;
    at extreme scale pre-drop the top-percentile-df terms (tfidf's df
    frame gives the list) before the PageRank loop.
    """
    from .pagerank import pagerank

    ts = F.expr(
        f"regexp_extract_all(lower({text_col}), "
        f"'[a-z0-9]{{{min_term_len},}}', 0)"
    )
    pairs = (
        documents.select(ts.alias("_ts"))
        .select(
            F.explode(
                F.expr(
                    # get() (not []) so the i = size probe is a NULL,
                    # not an ANSI INVALID_ARRAY_INDEX error
                    "filter(transform(sequence(1, greatest(size(_ts), 1)), "
                    "i -> struct(least(get(_ts, i-1), get(_ts, i)) AS a, "
                    "greatest(get(_ts, i-1), get(_ts, i)) AS b)), "
                    "p -> p.a IS NOT NULL AND p.b IS NOT NULL "
                    "AND p.a != p.b)"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    p = pairs.groupBy("a", "b").agg(F.count("*").alias("wt"))
    edges = p.select(
        F.col("a").alias("src_id"), F.col("b").alias("dst_id"), "wt"
    ).unionByName(
        p.select(
            F.col("b").alias("src_id"), F.col("a").alias("dst_id"), "wt"
        )
    )
    ranks = pagerank(
        edges, iterations=iterations, damping=damping, weight="wt"
    )
    top = (
        ranks.select(
            F.col("id").alias("term"), F.round("rank", 9).alias("rank")
        )
        .orderBy(F.col("rank").desc(), F.col("term").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("rank").desc(), F.col("term").asc())
    return top.withColumn("rk", F.row_number().over(w).cast("int"))


def vocab_richness(
    documents: DataFrame,
    text_col: str = "text",
    min_term_len: int = 2,
) -> DataFrame:
    """One-row vocabulary-richness card: observed vocabulary, token
    mass, hapax/dis legomena, the bias-corrected Chao1 estimate of the
    TRUE vocabulary size, and Good-Turing coverage — the "how much of
    this corpus's vocabulary have we actually seen" answer that decides
    whether more crawling buys new content or replays (a coverage near
    1 says the source is exhausted; a Chao1 far above s_obs says keep
    crawling).

        chao1    = s_obs + f1·(f1−1) / (2·(f2+1))   (always defined)
        coverage = 1 − f1/n                          (Good–Turing)

    Exactness: term counts, f1, f2, s_obs, n are exact integers from
    two cascaded aggregates; each estimate is ONE round-6 division
    (the f2+1 denominator keeps Chao1 defined when f2 = 0 — the
    standard bias-corrected form, not the f1²/2f2 classic that
    divides by zero). Empty corpus → zero row with NULL estimates.

    Scale shape: scan-local tokenize/explode, one (term) count
    (vocabulary-sized, Zipf-bounded), one frequency-of-frequencies
    re-agg (≤ log-ish distinct counts), one 1-row final agg. The same
    two-cascade shape as family_size_histogram.
    """
    toks = documents.select(
        F.explode(
            F.expr(
                f"regexp_extract_all(lower({text_col}), "
                f"'[a-z0-9]{{{min_term_len},}}', 0)"
            )
        ).alias("term")
    )
    tf = toks.groupBy("term").agg(F.count("*").alias("c"))
    agg = tf.agg(
        F.count("*").alias("s_obs"),
        F.sum("c").alias("n"),
        F.sum((F.col("c") == 1).cast("long")).alias("f1"),
        F.sum((F.col("c") == 2).cast("long")).alias("f2"),
    )
    chao1 = F.col("s_obs") + (
        (F.col("f1") * (F.col("f1") - 1)).cast("double")
        / (F.lit(2) * (F.col("f2") + 1)).cast("double")
    )
    coverage = F.lit(1.0) - F.col("f1").cast("double") / F.col("n").cast(
        "double"
    )
    return agg.select(
        F.col("s_obs").cast("long").alias("s_obs"),
        F.col("n").cast("long").alias("n_tokens"),
        F.col("f1").cast("long").alias("f1"),
        F.col("f2").cast("long").alias("f2"),
        F.round(F.when(F.col("n") > 0, chao1), 6).alias("chao1"),
        F.round(F.when(F.col("n") > 0, coverage), 6).alias("coverage"),
    )


def stylometry_delta(
    documents: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    m: int = 30,
    min_term_len: int = 2,
) -> DataFrame:
    """Burrows' Delta (Burrows 2002) between sources — stylometric
    attribution over function-word profiles: the CTI read is "these
    two 'different' feeds/personas write alike" (shared authorship or
    republication), the curation read is near-duplicate SOURCES that
    content-level dedup misses because the texts differ while the
    style doesn't. Delta(a,b) = mean over the corpus's top-``m`` terms
    of |z_a(t) − z_b(t)|, where z is the term's relative-frequency
    z-score across sources.

    Exactness discipline: per-source relative frequencies are
    fixed-pointed to integer MILLIONTHS (round(c·1e6/N) — one double
    division + round, engine-identical), so the cross-source moments
    are exact integers and each z is the Pearson-style identity
    (S·f − Σf) / √(S·Σf² − (Σf)²) — ONE division over ONE IEEE sqrt
    of an exact integer. Zero-variance terms (identical millionth
    profile in every source — an exact INTEGER test, never a float
    near-zero boundary) are excluded from every pair's mean alike;
    ``n_terms`` reports how many survived. The final mean rounds to 6
    AFTER the m-term sum (absorbing summation-order ULPs). A source
    absent from a term's counts contributes f = 0 through the
    source × top-term grid — required: omitting zeros would bias every
    μ upward.

    Scale shape: tokenize scan-local; (source, term) counts shuffle on
    vocabulary keys; top-m is one ordered cut of the term-count frame;
    everything after runs on the S×m grid (dimension-sized) — two
    broadcast-joined moment frames and one term-keyed pair self-join
    bounded by S²·m rows. No Python.
    """
    if not 1 <= m <= 500:
        raise ValueError("m must be in [1, 500]")
    toks = documents.filter(F.col(source_col).isNotNull()).select(
        F.col(source_col).alias("src"),
        F.explode(
            F.expr(
                f"regexp_extract_all(lower({text_col}), "
                f"'[a-z0-9]{{{min_term_len},}}', 0)"
            )
        ).alias("term"),
    )
    counts = toks.groupBy("src", "term").agg(F.count("*").alias("c"))
    totals = counts.groupBy("src").agg(F.sum("c").alias("n"))
    top = (
        counts.groupBy("term")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.col("tc").desc(), F.col("term").asc())
        .limit(m)
        .select("term")
    )
    grid = (
        totals.crossJoin(F.broadcast(top))
        .join(counts, ["src", "term"], "left")
        .select(
            "src",
            "term",
            F.round(
                (F.coalesce(F.col("c"), F.lit(0)) * F.lit(1_000_000)).cast(
                    "double"
                )
                / F.col("n").cast("double")
            )
            .cast("long")
            .alias("f"),
        )
    )
    mom = grid.groupBy("term").agg(
        F.count("*").alias("s"),
        F.sum("f").alias("sf"),
        F.sum(F.col("f") * F.col("f")).alias("sf2"),
    )
    rad = F.col("s") * F.col("sf2") - F.col("sf") * F.col("sf")
    z = (
        grid.join(F.broadcast(mom), "term")
        .filter(rad > 0)
        .select(
            "src",
            "term",
            (
                (F.col("s") * F.col("f") - F.col("sf")).cast("double")
                / F.sqrt(rad.cast("double"))
            ).alias("z"),
        )
    )
    za = z.select(
        F.col("src").alias("a"), "term", F.col("z").alias("za")
    )
    zb = z.select(
        F.col("src").alias("b"), "term", F.col("z").alias("zb")
    )
    return (
        za.join(zb, "term")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.round(
                F.sum(F.abs(F.col("za") - F.col("zb"))) / F.count("*"), 6
            ).alias("delta"),
        )
    )
