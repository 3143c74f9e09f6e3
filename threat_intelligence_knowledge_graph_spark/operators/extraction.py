"""Stage C — Arrow-batched extraction kernel (``mapInPandas``).

One pass over reassembled documents emits a tagged union of stored-form
node and edge records (EXTRACTION_SCHEMA). The per-document work is the
shared deterministic kernel (``kernel/extract.py``) — zero cross-document
state, so the operator is a narrow map over however the documents are
partitioned; no shuffle is introduced here.

Why one pass, not two: the regex sweep dominates extraction cost; emitting
nodes and edges together halves kernel executions. The pipeline
checkpoints this output once and splits by ``kind`` downstream (two cheap
filtered scans of columnar parquet beat re-running regexes).

Scale posture (SURVEY.md §4): Arrow batch size is bounded in session.py so
giant reassembled conversations can't blow executor memory; per-row Python
is confined to document granularity (one kernel call per *conversation*,
not per turn/mention) per the input_hint mandate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..kernel.extract import extract_document, finalize_edges, finalize_nodes
from ..schemas import EXTRACTION_SCHEMA

_COLS = [f.name for f in EXTRACTION_SCHEMA.fields]


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    rows: list[tuple] = []
    for conv_id, text in zip(pdf["conv_id"].values, pdf["doc_text"].values):
        graph = extract_document(text)
        for label, node_id, props in finalize_nodes(graph):
            rows.append(
                (conv_id, "node", label, node_id, props,
                 None, None, None, None, None, None)
            )
        for src_l, src_id, rel, dst_l, dst_id, ctx in finalize_edges(graph):
            rows.append(
                (conv_id, "edge", None, None, None,
                 src_l, src_id, rel, dst_l, dst_id, ctx)
            )
    return pd.DataFrame(rows, columns=_COLS)


def extract_graph_records(documents: DataFrame) -> DataFrame:
    """(conv_id, doc_text, …) → EXTRACTION_SCHEMA records."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extract_batch(pdf)

    return documents.select("conv_id", "doc_text").mapInPandas(
        kernel, schema=EXTRACTION_SCHEMA
    )
