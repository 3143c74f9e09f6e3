"""Semantic drift guard: the oracle's output on the pinned tiny corpus is
COMMITTED (tests/goldens/tiny_corpus_golden.json). Any change to the rule
library, the kernel, or the datagen that alters extraction semantics
fails here first — intentional semantic changes must regenerate the
golden file explicitly (scripts in the file header) and say why.
"""

import json
import os

from threat_intelligence_knowledge_graph_spark.datagen import gen_conversation
from threat_intelligence_knowledge_graph_spark.oracle import oracle_extract_corpus

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "tiny_corpus_golden.json")


def _corpus():
    docs = []
    for i in range(20):
        rows = sorted(gen_conversation(i), key=lambda r: r["turn_idx"])
        docs.append((f"conv_{i:08d}", "\n".join(r["text"] for r in rows)))
    return docs


class TestGoldenStability:
    def test_oracle_matches_committed_golden(self):
        with open(GOLDEN) as f:
            golden = json.load(f)
        nodes, triples, _edges = oracle_extract_corpus(_corpus())
        assert sorted(list(t) for t in triples) == golden["triples"]
        assert sorted(list(k) for k in nodes) == golden["node_keys"]
        counts: dict = {}
        for label, _nid in nodes:
            counts[label] = counts.get(label, 0) + 1
        assert counts == golden["node_count_by_label"]
