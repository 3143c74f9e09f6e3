"""Fixed table schemas (StructTypes) for every pipeline stage.

The reference is schema-dynamic (pydantic lists per chunk,
reference data_models.py:9-64); we declare every stage's schema once so
Catalyst can prune columns and push filters into parquet scans.
"""

from pyspark.sql.types import (
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Input: BASELINE.json input_hint, exactly.
TRANSCRIPTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)

# Stage A output: one row per conversation.
DOCUMENTS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("doc_text", StringType()),
        StructField("n_turns", IntegerType()),
        StructField("n_chars", LongType()),
    ]
)

# Stage B output (reference main.py:59-74 chunk dicts).
CHUNKS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("chunk_index", IntegerType()),
        StructField("total_chunks", IntegerType()),
        StructField("chunk_text", StringType()),
    ]
)

# Stage C output: tagged union of node and edge records — one mapInPandas
# pass emits both; downstream splits by `kind` after a checkpoint write.
EXTRACTION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("kind", StringType()),  # 'node' | 'edge'
        StructField("node_label", StringType()),
        StructField("node_id", StringType()),
        StructField("properties", MapType(StringType(), StringType())),
        StructField("src_label", StringType()),
        StructField("src_id", StringType()),
        StructField("rel_type", StringType()),
        StructField("dst_label", StringType()),
        StructField("dst_id", StringType()),
        StructField("context", StringType()),
    ]
)

NODES_SCHEMA = StructType(
    [
        StructField("node_label", StringType()),
        StructField("node_id", StringType()),
        StructField("properties", MapType(StringType(), StringType())),
    ]
)

EDGES_SCHEMA = StructType(
    [
        StructField("src_label", StringType()),
        StructField("src_id", StringType()),
        StructField("rel_type", StringType()),
        StructField("dst_label", StringType()),
        StructField("dst_id", StringType()),
    ]
)

TRIPLES_SCHEMA = StructType(
    [
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
    ]
)

# Per-(run, stage, partition) lineage + metrics (north_star requirement).
METRICS_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("stage", StringType()),
        StructField("partition_id", IntegerType()),
        StructField("metric", StringType()),
        StructField("value", LongType()),
    ]
)

# Canonical entity dictionary (stage D).
CANON_SCHEMA = StructType(
    [
        StructField("node_id", StringType()),
        StructField("canonical_id", StringType()),
    ]
)
