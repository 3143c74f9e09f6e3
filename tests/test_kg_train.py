"""negative_samples: pure-Python md5 replay + filter semantics.

The draw is fully deterministic (md5 family), so the ground truth is a
hashlib replay of the same arithmetic over the same planted triples.
"""

import hashlib

import pytest

from threat_intelligence_knowledge_graph_spark.operators.kg_train import (
    negative_samples,
)

TRIPLES = [
    ("a", "USES", "m1"),
    ("a", "USES", "m2"),
    ("b", "USES", "m1"),
    ("m1", "COMMUNICATES_WITH", "ip1"),
    ("m2", "COMMUNICATES_WITH", "ip1"),
]


def _u64(salt: str, key: str) -> int:
    """DuckDB md5_number_upper(salt || ':' || key): first 8 digest bytes
    little-endian (the operators.packing._md5_u64 contract)."""
    d = hashlib.md5(f"{salt}:{key}".encode()).digest()
    return int.from_bytes(d[:8], "little")


def _expected(triples, k):
    ents = sorted({s for s, _, _ in triples} | {o for _, _, o in triples})
    true_set = set(triples)
    out = set()
    for s, p, o in sorted(set(triples)):
        for i in range(k):
            key = f"{s}|{p}|{o}|{i}"
            side = _u64("negside", key) % 2
            repl = ents[_u64("neg", key) % len(ents)]
            if side == 0:
                if repl == s:
                    continue
                cand = (repl, p, o, "head", i, s, o)
            else:
                if repl == o:
                    continue
                cand = (s, p, repl, "tail", i, s, o)
            if (cand[0], cand[1], cand[2]) in true_set:
                continue
            out.add(cand)
    return out


def test_replay_matches_hashlib(spark):
    df = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])
    got = {
        tuple(r)
        for r in negative_samples(df, k=4).collect()
    }
    assert got == _expected(TRIPLES, 4)


def test_negatives_never_true_and_never_degenerate(spark):
    df = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])
    rows = negative_samples(df, k=8).collect()
    true_set = set(TRIPLES)
    assert rows, "tiny universe must still yield some negatives"
    for r in rows:
        assert (r.subj, r.pred, r.obj) not in true_set
        if r.corrupted == "head":
            assert r.obj == r.pos_obj and r.subj != r.pos_subj
        else:
            assert r.corrupted == "tail"
            assert r.subj == r.pos_subj and r.obj != r.pos_obj


def test_duplicate_positives_collapse(spark):
    df = spark.createDataFrame(TRIPLES + TRIPLES, ["subj", "pred", "obj"])
    once = negative_samples(
        spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"]), k=3
    ).collect()
    twice = negative_samples(df, k=3).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


def test_explicit_entity_universe(spark):
    df = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])
    ents = spark.createDataFrame([("x",), ("y",)], ["id"])
    rows = negative_samples(df, k=2, entities=ents).collect()
    # every replacement comes from the given universe
    for r in rows:
        repl = r.subj if r.corrupted == "head" else r.obj
        assert repl in ("x", "y")


def test_validation(spark):
    df = spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])
    with pytest.raises(ValueError, match="k must be positive"):
        negative_samples(df, k=0)
    empty = spark.createDataFrame([], "subj string, pred string, obj string")
    with pytest.raises(ValueError, match="entity universe is empty"):
        negative_samples(empty, k=1)
