"""Tests for DSIR importance weighting + Gumbel-top-k resampling
(`operators/dsir.py`) against a pure-Python twin that replays the
identical md5 bucketing and smoothed log-ratio arithmetic."""

import hashlib
import math

import pytest

from threat_intelligence_knowledge_graph_spark.operators.dsir import (
    dsir_logratio,
    dsir_resample,
)

SF_DIR = "/root/testdata/sf0.001"


def _md5_u64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def _bucket(feat: str, dim: int) -> int:
    return _md5_u64(f"dsir:{feat}") % dim


def _feats(text: str, min_len: int = 2) -> list[str]:
    import re

    toks = re.findall(rf"[a-z0-9]{{{min_len},}}", text.lower())
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _brute_weights(raw, target, dim, alpha=1):
    """raw/target: list[(id, text)] → {id: (n_feats, log_weight)}."""
    tf = {}
    for i, t in raw:
        for f in _feats(t):
            b = _bucket(f, dim)
            tf.setdefault(i, {})[b] = tf.setdefault(i, {}).get(b, 0) + 1
    p = {}
    for _, t in target:
        for f in _feats(t):
            b = _bucket(f, dim)
            p[b] = p.get(b, 0) + 1
    q = {}
    for bs in tf.values():
        for b, n in bs.items():
            q[b] = q.get(b, 0) + n
    P, Q = sum(p.values()), sum(q.values())
    out = {}
    for i, bs in tf.items():
        n_tot = sum(bs.values())
        s = sum(
            n * (math.log(p.get(b, 0) + alpha) - math.log(q[b] + alpha))
            for b, n in bs.items()
        )
        s += n_tot * (math.log(Q + alpha * dim) - math.log(P + alpha * dim))
        out[i] = (n_tot, round(s, 6))
    return out


RAW = [
    (1, "spark shuffle join spark shuffle"),
    (2, "malware beacon c2 exfil malware"),
    (3, "spark join window agg"),
    (4, ""),  # zero features → absent from output
]
TARGET = [
    (10, "spark shuffle join window"),
    (11, "spark agg join"),
]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    return raw, tgt


class TestDsirLogratio:
    def test_matches_brute(self, spark, frames):
        raw, tgt = frames
        got = {
            r.doc_id: (r.n_feats, r.log_weight)
            for r in dsir_logratio(raw, tgt, dim=64).collect()
        }
        exp = _brute_weights(RAW, TARGET, 64)
        exp.pop(4, None)
        assert got == exp

    def test_target_like_doc_outranks_off_distribution(self, spark, frames):
        raw, tgt = frames
        got = {
            r.doc_id: r.log_weight
            for r in dsir_logratio(raw, tgt, dim=64).collect()
        }
        # docs 1/3 share the target's spark vocabulary; doc 2 is CTI
        # jargon absent from the target → strictly lower weight
        assert got[2] < min(got[1], got[3])

    def test_zero_feature_doc_absent(self, spark, frames):
        raw, tgt = frames
        ids = {r.doc_id for r in dsir_logratio(raw, tgt, dim=64).collect()}
        assert 4 not in ids and ids == {1, 2, 3}

    def test_partitioning_invariance(self, spark, frames):
        raw, tgt = frames
        a = sorted(
            map(tuple, dsir_logratio(raw, tgt, dim=64).collect())
        )
        b = sorted(
            map(
                tuple,
                dsir_logratio(raw.repartition(7), tgt.repartition(3), dim=64)
                .collect(),
            )
        )
        assert a == b

    def test_empty_target_uniform_smoothing(self, spark, frames):
        raw, tgt = frames
        # empty target → p̂ is the uniform α/(α·dim) everywhere; weights
        # are finite and defined (coalesced totals), not NaN/∞
        got = dsir_logratio(raw, tgt.filter("doc_id < 0"), dim=64).collect()
        assert len(got) == 3
        assert all(math.isfinite(r.log_weight) for r in got)

    def test_validation(self, spark, frames):
        raw, tgt = frames
        with pytest.raises(ValueError):
            dsir_logratio(raw, tgt, dim=0)
        with pytest.raises(ValueError):
            dsir_logratio(raw, tgt, alpha=0)


class TestDsirResample:
    def test_topk_prefix_and_key(self, spark, frames):
        raw, tgt = frames
        all_rows = {
            r.doc_id: r
            for r in dsir_resample(raw, tgt, 3, dim=64).collect()
        }
        assert len(all_rows) == 3
        # gumbel_key replays exactly: rounded log_weight + hash-seeded
        # standard-Gumbel noise, re-rounded
        w = _brute_weights(RAW, TARGET, 64)
        for i, r in all_rows.items():
            u = (_md5_u64(f"gumbel:{i}") % 1_000_000 + 0.5) / 1_000_000.0
            assert r.gumbel_key == round(
                w[i][1] - math.log(-math.log(u)), 6
            ), i

    def test_k_larger_than_corpus(self, spark, frames):
        raw, tgt = frames
        assert dsir_resample(raw, tgt, 50, dim=64).count() == 3

    def test_salt_redraws(self, spark):
        # enough docs that two salts almost surely pick different sets
        raw = spark.createDataFrame(
            [(i, f"tok{i} tok{i + 1} tok{i + 2}") for i in range(40)],
            ["doc_id", "text"],
        )
        tgt = raw.filter("doc_id % 4 = 0")
        s1 = {r.doc_id for r in dsir_resample(raw, tgt, 10, dim=64).collect()}
        s2 = {
            r.doc_id
            for r in dsir_resample(
                raw, tgt, 10, dim=64, salt="gumbel2"
            ).collect()
        }
        assert len(s1) == len(s2) == 10
        assert s1 != s2

    def test_validation(self, spark, frames):
        raw, tgt = frames
        with pytest.raises(ValueError):
            dsir_resample(raw, tgt, 0)


class TestDsirRealCorpus:
    def test_runs_on_documents_table(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        w = dsir_logratio(docs, docs.filter("source = 'src0'"), dim=512)
        assert w.count() == 500
        # src0 docs score their own distribution: mean weight of the
        # target slice exceeds the corpus mean
        rows = w.join(
            docs.select("doc_id", "source"), "doc_id"
        ).collect()
        tgt_mean = sum(
            r.log_weight for r in rows if r.source == "src0"
        ) / sum(1 for r in rows if r.source == "src0")
        all_mean = sum(r.log_weight for r in rows) / len(rows)
        assert tgt_mean > all_mean
