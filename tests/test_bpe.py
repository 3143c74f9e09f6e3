"""BPE trainer parity vs a pure-Python reference implementation.

The reference implementation below is the textbook Sennrich-style loop
(pair counts weighted by word freq, greedy left-to-right non-overlapping
merge) — independent of the delimiter-replace encoding the Spark
operator uses, so agreement checks the encoding trick, not itself.
"""

from __future__ import annotations

import collections
import re

import pytest

from threat_intelligence_knowledge_graph_spark.operators.bpe import (
    bpe_token_counts,
    bpe_train,
)


def _py_bpe(words_freq: dict[str, int], k: int):
    vocab = {w: tuple(w) for w in words_freq}
    merges = []
    for step in range(1, k + 1):
        pc: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            f = words_freq[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (left, right), cnt = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((step, left, right, cnt))
        new_vocab = {}
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges, vocab


def _word_freqs(texts: list[str]) -> dict[str, int]:
    wf: collections.Counter = collections.Counter()
    for t in texts:
        wf.update(re.findall(r"[a-z]+", t.lower()))
    return dict(wf)


CORPUS = [
    "the threat actor used malware to attack the network",
    "the malware communicated with the command and control server",
    "attack attack attack banana bandana",
    "aaaa aaaa baaab",  # greedy-overlap stressor: (a,a) must merge pairwise
    "Zebra ZEBRA zebra",  # case folding
    "123 --- !!!",  # no [a-z]+ words at all
]


def _df(spark, texts=CORPUS):
    return spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_merges_match_reference(spark):
    got = [
        (r["step"], r["left_sym"], r["right_sym"], r["cnt"])
        for r in bpe_train(_df(spark), k=8).collect()
    ]
    want, _ = _py_bpe(_word_freqs(CORPUS), 8)
    assert got == want


def test_token_counts_match_reference(spark):
    k = 6
    _, vocab = _py_bpe(_word_freqs(CORPUS), k)
    rows = bpe_token_counts(_df(spark), k=k).collect()
    got = {r["doc_id"]: (r["n_chars"], r["n_tokens"], r["compression"]) for r in rows}
    for i, text in enumerate(CORPUS):
        words = re.findall(r"[a-z]+", text.lower())
        if not words:
            assert f"d{i}" not in got  # wordless docs excluded
            continue
        n_chars = sum(len(w) for w in words)
        n_tokens = sum(len(vocab[w]) for w in words)
        assert got[f"d{i}"] == (
            n_chars,
            n_tokens,
            pytest.approx(round(n_tokens / n_chars, 6)),
        )


def test_greedy_overlap_semantics(spark):
    # 'aaaa' under merge (a,a) must become [aa, aa] (pairwise greedy),
    # never [aa, a, a] — the double-delimiter replace trick's key case.
    df = _df(spark, ["aaaa aaaa aaaa"])
    merges = bpe_train(df, k=2).collect()
    assert (merges[0]["left_sym"], merges[0]["right_sym"]) == ("a", "a")
    assert (merges[1]["left_sym"], merges[1]["right_sym"]) == ("aa", "aa")
    counts = bpe_token_counts(df, k=2).collect()[0]
    assert (counts["n_chars"], counts["n_tokens"]) == (12, 3)


def test_early_stop_when_no_pairs(spark):
    # Corpus of single-char words: no adjacent pairs, zero merges.
    assert bpe_train(_df(spark, ["a b c a b"]), k=4).count() == 0


def test_tie_break_is_lexicographic(spark):
    # 'ba' and 'ab' both appear twice; (a,b) wins on left ASC.
    merges = bpe_train(_df(spark, ["ab ab ba ba"]), k=1).collect()
    assert (merges[0]["left_sym"], merges[0]["right_sym"]) == ("a", "b")
