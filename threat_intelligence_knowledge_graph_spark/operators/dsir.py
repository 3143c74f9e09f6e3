"""DSIR-style data selection: hashed n-gram importance weighting.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
arXiv:2302.03169) scores every raw document by how much more likely its
hashed n-gram bag is under a TARGET corpus's feature distribution than
under the RAW corpus's own — ``log w(x) = Σ_b n_b(x)·(ln p̂[b] − ln q̂[b])``
— then resamples raw docs with Gumbel-top-k on the weights. It is the
standard cheap lever for steering a web-scale pretraining mixture toward
a quality/domain target without training a classifier.

Spark-first shape (no Python in the plan):

- Features are unigrams + bigrams of the ``[a-z0-9]{min_term_len,}``
  token stream, hashed to ``dim`` buckets with the engine-portable md5
  family (`operators.packing._md5_bucket`) — vocabulary-free, so the
  target histogram built yesterday scores today's batch bit-identically.
- Bigrams are built ARRAY-SIDE (``transform(slice(toks,...), (t,i) ->
  concat(...))``) so the feature stream stays scan-local: one explode,
  no per-doc window/exchange.
- Both bucket histograms are ≤ ``dim`` rows (map-side combining aggs);
  they and the two 1-row totals join back by broadcast. Per-doc scoring
  is therefore ONE (doc,bucket) aggregate plus broadcast joins — the
  tfidf/unigram_logprob plan skeleton, linear in corpus size.

Cross-engine determinism: the smoothed log-ratio is decomposed so every
``ln`` argument is an exact INTEGER (``ct+α``, ``total+α·dim``); floats
appear only in the final per-doc sum, rounded to ``round_to`` after
summation (the repo's transcendental-rounding discipline — true values
never sit on rounding boundaries, so round-6 collapses ulp noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .packing import _md5_bucket


def _feature_stream(
    df: DataFrame, id_col: str, text_col: str, min_term_len: int, dim: int
) -> DataFrame:
    """(id, bucket) — one row per unigram AND bigram occurrence, hashed
    to ``dim`` md5 buckets. Array-side bigram construction keeps this a
    single scan-local projection + explode (no window, no exchange)."""
    toks = F.expr(
        f"regexp_extract_all(lower({text_col}), "
        f"'[a-z0-9]{{{min_term_len},}}', 0)"
    )
    bigrams = (
        "transform(slice(_toks, 1, greatest(size(_toks) - 1, 0)), "
        "(t, i) -> concat(t, ' ', element_at(_toks, i + 2)))"
    )
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .select(
            id_col,
            F.explode(F.concat(F.col("_toks"), F.expr(bigrams))).alias(
                "_feat"
            ),
        )
        .select(id_col, _md5_bucket("_feat", "dsir", dim).alias("bucket"))
    )


def dsir_logratio(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    alpha: int = 1,
    min_term_len: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """(doc_id, n_feats, log_weight): per-raw-doc DSIR importance
    log-weight of ``raw`` against ``target``.

    With add-``alpha`` smoothing over ``dim`` buckets,

        log w = Σ_b n_b·(ln(ct_p[b]+α) − ln(ct_q[b]+α))
                + n_feats·(ln(Q+α·dim) − ln(P+α·dim))

    where ct_p/ct_q are target/raw bucket counts and P/Q their totals —
    algebraically the smoothed ``Σ n_b·ln(p̂[b]/q̂[b])`` with every ln
    taken on an exact integer (cross-engine sign- and ulp-stable).
    Docs with zero features are absent from the result (their weight is
    0 under any distribution pair; emitting them would need an anti-join
    the caller can do if it cares).

    100 TB shape: two feature scans (target once, raw once), two
    ≤``dim``-row histograms + two 1-row totals broadcast back onto the
    per-doc (doc,bucket) aggregate. No shuffle keyed on anything wider
    than (doc_id, bucket).
    """
    if dim < 1:
        raise ValueError("dim must be >= 1")
    if alpha < 1:
        raise ValueError("alpha must be a positive integer (exact ln args)")
    tf = (
        _feature_stream(raw, id_col, text_col, min_term_len, dim)
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("n"))
    )
    p_hist = (
        _feature_stream(target, id_col, text_col, min_term_len, dim)
        .groupBy("bucket")
        .agg(F.count("*").alias("ct_p"))
    )
    q_hist = tf.groupBy("bucket").agg(F.sum("n").alias("ct_q"))
    p_tot = p_hist.select(F.sum("ct_p").alias("_p"))
    q_tot = q_hist.select(F.sum("ct_q").alias("_q"))
    a = F.lit(alpha).cast("double")
    # smoothed totals; coalesce covers an EMPTY target (sum → NULL)
    p_denom = F.log(F.coalesce(F.col("_p"), F.lit(0)) + alpha * dim)
    q_denom = F.log(F.coalesce(F.col("_q"), F.lit(0)) + alpha * dim)
    return (
        tf.join(F.broadcast(p_hist), "bucket", "left")
        .join(F.broadcast(q_hist), "bucket")
        .crossJoin(F.broadcast(p_tot))
        .crossJoin(F.broadcast(q_tot))
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("long").alias("n_feats"),
            F.round(
                F.sum(
                    F.col("n")
                    * (
                        F.log(F.coalesce(F.col("ct_p"), F.lit(0)) + a)
                        - F.log(F.col("ct_q") + a)
                    )
                )
                + F.sum("n") * (F.first(q_denom) - F.first(p_denom)),
                round_to,
            ).alias("log_weight"),
        )
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 4096,
    alpha: int = 1,
    min_term_len: int = 2,
    round_to: int = 6,
    salt: str = "gumbel",
) -> DataFrame:
    """(doc_id, n_feats, log_weight, gumbel_key): the DSIR Gumbel-top-k
    resample — ``k`` raw docs drawn WITHOUT replacement proportionally
    to ``exp(log_weight)``, via the Gumbel-max trick: rank on
    ``log_weight + g_i`` with i.i.d. standard-Gumbel noise
    ``g = −ln(−ln(u))``.

    The noise is hash-seeded (``u = (md5_bucket(id, salt, 10^6)+0.5)/10^6``),
    so the draw is partition-, run-, and engine-independent; change
    ``salt`` to redraw. ``gumbel_key`` is rounded BEFORE ranking and
    ties break on ``id_col``, making the selected set a total-order
    prefix — deterministic on any engine.

    100 TB shape: scoring as in ``dsir_logratio``; selection is a
    global top-k on doc-level rows (TakeOrderedAndProject: per-partition
    heaps → single k-row merge, no full sort, no SinglePartition
    window).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = dsir_logratio(
        raw, target, id_col, text_col, dim, alpha, min_term_len, round_to
    )
    u = (_md5_bucket(id_col, salt, 1_000_000) + F.lit(0.5)) / F.lit(
        1_000_000.0
    )
    key = F.round(F.col("log_weight") - F.log(-F.log(u)), round_to)
    return (
        w.withColumn("gumbel_key", key)
        .orderBy(F.desc("gumbel_key"), F.col(id_col))
        .limit(k)
    )
