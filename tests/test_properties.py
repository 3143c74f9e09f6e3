"""Property-based tests (SURVEY.md §5e): chunker ≡ reference loop on
random inputs, allowlist monotonicity, dedup idempotence at the kernel
level, malformed-input behavior."""

import random
import string

from hypothesis import given, settings, strategies as st

from threat_intelligence_knowledge_graph_spark.kernel.extract import extract_document
from threat_intelligence_knowledge_graph_spark.rules.mappings import IOC_TO_ENTITY_TYPE


def reference_chunker(text: str, char_limit: int, overlap: int) -> list[str]:
    """Verbatim semantics of reference main.py:59-74."""
    chunks, start = [], 0
    while start < len(text):
        chunk = text[start : start + char_limit]
        if not chunk:
            break
        chunks.append(chunk)
        start += char_limit - overlap
        if start >= len(text):
            break
    return chunks


def expression_chunk_starts(n: int, step: int) -> list[int]:
    """The closed form our Catalyst chunker implements: starts at
    0, step, 2·step, … while start < len."""
    if n <= 0:
        return []
    return list(range(0, n, step))


class TestChunkerClosedForm:
    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=0, max_value=5000),
        st.integers(min_value=2, max_value=300),
        st.integers(min_value=0, max_value=100),
    )
    def test_starts_match_reference_loop(self, n, char_limit, overlap):
        if overlap >= char_limit:
            return
        text = "x" * n
        expected = reference_chunker(text, char_limit, overlap)
        starts = expression_chunk_starts(n, char_limit - overlap)
        got = [text[s : s + char_limit] for s in starts]
        assert got == expected


# Text strategy seeded with IOC-shaped fragments so relations actually fire.
_FRAGMENTS = [
    "evil.example.net", "10.1.2.3", "resolves to", "communicates with",
    "https://evil.example.net/p", "CVE-2021-44228",
    "d41d8cd98f00b204e9800998ecf8427e", "the malware", ". ", " and ",
    "Russian", "AS13335", "targets",
]
texts = st.lists(st.sampled_from(_FRAGMENTS), min_size=0, max_size=25).map(" ".join)

_ALL_TYPES = sorted(set(IOC_TO_ENTITY_TYPE.values()))


class TestAllowlistMonotonicity:
    @settings(max_examples=60, deadline=None)
    @given(texts, st.integers(min_value=0, max_value=2**30))
    def test_shrinking_allowlist_never_adds_sentence_triples(self, text, seed):
        """Monotonicity holds for the SENTENCE-pass output (edges carrying
        a context sentence). It deliberately does NOT hold for the whole
        edge set: the reference's doc-level fallback (ner_extractor.py:
        666-726) activates only when the sentence pass is empty, so
        shrinking the allowlist can swap sentence edges for fallback
        edges — faithful behavior, excluded from the property."""
        rng = random.Random(seed)
        k = rng.randint(0, len(_ALL_TYPES))
        subset = set(rng.sample(_ALL_TYPES, k))
        superset = subset | set(
            rng.sample(_ALL_TYPES, rng.randint(0, len(_ALL_TYPES)))
        )
        small = {
            (e[0], e[2], e[3])
            for e in extract_document(text, allowed_nodes=subset).edges
            if e[5]  # sentence-pass edges carry their context
        }
        big = {
            (e[0], e[2], e[3])
            for e in extract_document(text, allowed_nodes=superset).edges
            if e[5]
        }
        assert small <= big

    @settings(max_examples=30, deadline=None)
    @given(texts)
    def test_node_allowlist_filters_nodes(self, text):
        full = {n[1] for n in extract_document(text).nodes}
        only_domain = {
            n[1]
            for n in extract_document(text, allowed_nodes={"Domain"}).nodes
        }
        assert only_domain <= {"Domain"}
        assert only_domain <= full


class TestKernelDeterminism:
    @settings(max_examples=40, deadline=None)
    @given(texts)
    def test_extract_is_deterministic(self, text):
        a = extract_document(text)
        b = extract_document(text)
        assert a.nodes == b.nodes and a.edges == b.edges

    @settings(max_examples=40, deadline=None)
    @given(st.text(alphabet=string.printable, max_size=200))
    def test_never_raises_on_arbitrary_text(self, text):
        g = extract_document(text)
        for node_id, node_type, props in g.nodes:
            assert node_id.strip() and node_type.strip()
