"""Stage B — expression-based overlapping character chunker.

Reproduces reference main.py:59-74 exactly: chunk starts at
``0, step, 2·step, …`` with ``step = char_limit - overlap``, each chunk is
``text[start : start+char_limit]``, last chunk starts while ``start <
len(text)``. Chunk-strategy dispatch (reference main.py:159-245): the NER
profile is *whole document* (no chunking, main.py:166-172); the default
LLM profile is 2048/24 (reference config.py:100-101).

Pure Catalyst (``sequence`` + ``transform`` + ``posexplode``) — stays in
whole-stage codegen, no Python. A 100 TB corpus chunks without a single
UDF call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (char_limit, overlap) profiles — reference main.py:27-53, config.py:99-102.
CHUNK_PROFILES: dict[str, tuple[int, int] | None] = {
    "ner": None,  # whole document (reference main.py:166-172)
    "default": (2048, 24),
    "gemini-pro": (3_200_000, 500),
    "gemini-flash": (400_000, 500),
    "claude-sonnet": (1_280_000, 500),
    "claude-haiku": (640_000, 500),
}


def chunk_documents(
    documents: DataFrame, char_limit: int, overlap: int
) -> DataFrame:
    """(conv_id, doc_text) → (conv_id, chunk_index, total_chunks, chunk_text)."""
    if overlap >= char_limit:
        raise ValueError("overlap must be < char_limit (reference main.py:71-73)")
    step = char_limit - overlap
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("doc_text") - 1, F.lit(0)),
        F.lit(step),
    )
    chunks = F.transform(
        starts, lambda s: F.col("doc_text").substr(s + 1, F.lit(char_limit))
    )
    # total_chunks = size of the chunk array computed in the SAME
    # projection — a count-over-window here would shuffle+sort every chunk
    # row just to recount what the array already knows.
    return (
        documents.filter(F.length("doc_text") > 0)
        .select(
            "conv_id",
            F.size(chunks).cast("int").alias("total_chunks"),
            F.posexplode(chunks).alias("chunk_index", "chunk_text"),
        )
        .select("conv_id", "chunk_index", "total_chunks", "chunk_text")
    )


def chunk_for_profile(documents: DataFrame, profile: str = "ner") -> DataFrame:
    """Chunk-strategy dispatch (reference main.py:159-245)."""
    spec = CHUNK_PROFILES[profile]
    if spec is None:
        return documents.select(
            "conv_id",
            F.lit(0).alias("chunk_index"),
            F.lit(1).alias("total_chunks"),
            F.col("doc_text").alias("chunk_text"),
        )
    return chunk_documents(documents, *spec)
