"""Single-process reference oracle.

Replays the reference's serial per-document control flow (reference
main.py:255-324: per-doc loop → NER extract → store) using the shared
per-document kernel, producing golden node/edge/triple sets that the
distributed Spark pipeline must reproduce (P/R ≥ 0.95; exact on the tiny
corpus). This is the correctness instrument BASELINE.json demands — the
reference itself ships no tests (SURVEY.md §5).

Documents enter in corpus order, mirroring the reference's serial URL loop
(main.py:451-457); cross-document node identity falls out of the MERGE
semantics in ``finalize_*`` applied over the concatenated stream.
"""

from __future__ import annotations

from ..kernel.extract import (
    DocGraph,
    extract_document,
    finalize_edges,
    finalize_nodes,
)


def oracle_extract_corpus(
    docs: list[tuple[str, str]],
) -> tuple[
    dict[tuple[str, str], dict[str, str]],
    set[tuple[str, str, str]],
    list[tuple[str, str, str, str, str, str]],
]:
    """Run the oracle over ``[(doc_id, text)]``.

    Returns (global nodes keyed (label, stored_id) with last-write-wins
    props, global triple set, per-doc stored edges with doc provenance).
    """
    global_nodes: dict[tuple[str, str], dict[str, str]] = {}
    triples: set[tuple[str, str, str]] = set()
    edges: list[tuple[str, str, str, str, str, str]] = []

    for doc_id, text in docs:
        graph: DocGraph = extract_document(text)
        for label, node_id, props in finalize_nodes(graph):
            key = (label, node_id)
            if key in global_nodes:
                global_nodes[key].update(props)
            else:
                global_nodes[key] = dict(props)
        for src_label, src_id, rel_type, dst_label, dst_id, _ctx in finalize_edges(
            graph
        ):
            triples.add((src_id, rel_type, dst_id))
            edges.append((doc_id, src_label, src_id, rel_type, dst_label, dst_id))

    return global_nodes, triples, edges


def oracle_triples(docs: list[tuple[str, str]]) -> set[tuple[str, str, str]]:
    """Golden distinct (subj, pred, obj) set for a corpus."""
    return oracle_extract_corpus(docs)[1]
