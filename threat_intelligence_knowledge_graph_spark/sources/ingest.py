"""Schema-enforced transcript ingest with bad-record quarantine.

Transcripts arrive as parquet in the happy path (Iceberg scan), but
real feeds deliver JSONL and CSV exports. This module reads any of the
three against the pinned ``TRANSCRIPTS_SCHEMA`` (BASELINE input_hint)
and splits the input into (valid, quarantined):

- **valid** — rows parsed cleanly AND carrying the non-null key fields
  (``conv_id``, ``turn_idx``) the pipeline groups on; column types are
  exactly the contract schema.
- **quarantined** — unparseable lines (PERMISSIVE corrupt-record
  capture) and parseable rows missing key fields, each tagged with a
  ``_reason``. Quarantine-don't-drop is the operational contract: a bad
  feed day is visible in a table, not silently vanished rows.

Scale notes: parsing is the scan itself (JSON/CSV datasources with an
explicit schema — no sampling/inference pass over 100 TB), and the
valid/quarantine split is two filters over one cached scan. At scale,
write both sides out and read back rather than caching (the
``jobs/run_pipeline.py`` warehouse pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..schemas import TRANSCRIPTS_SCHEMA

_CORRUPT = "_corrupt_record"
# Key fields the pipeline's reassembly groups/sorts on — a null here is
# not recoverable downstream.
_KEY_FIELDS = ("conv_id", "turn_idx")


def read_transcripts(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
) -> tuple[DataFrame, DataFrame]:
    """Returns ``(valid, quarantined)``.

    ``valid`` has exactly ``TRANSCRIPTS_SCHEMA``; ``quarantined`` has
    the raw parse columns plus ``_reason`` ('corrupt' | 'null_key').
    For parquet the file format enforces types natively, so only the
    null-key split applies.
    """
    if fmt == "parquet":
        raw = spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path)
        corrupt = F.lit(False)
    elif fmt in ("json", "csv"):
        schema = StructType(
            list(TRANSCRIPTS_SCHEMA.fields)
            + [StructField(_CORRUPT, StringType())]
        )
        reader = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", _CORRUPT)
        )
        if fmt == "csv":
            # enforceSchema=false makes Spark CHECK header names against
            # the pinned schema instead of applying it positionally — a
            # feed with reordered columns fails loudly rather than
            # silently misassigning same-typed fields.
            reader = reader.option("header", "true").option(
                "enforceSchema", "false"
            )
        raw = getattr(reader, fmt)(path)
        # NB: SPARK-21610 only forbids queries whose referenced columns
        # are SOLELY the corrupt-record column; both outputs here filter
        # on the key fields too, so no materialization is needed — and
        # caching here would pin the whole parsed corpus in storage
        # memory for the session's lifetime (each action re-parses the
        # files instead, which is the cheaper trade for one-shot reads;
        # callers doing repeated passes should cache or write-and-read).
        corrupt = F.col(_CORRUPT).isNotNull()
    else:
        raise ValueError(f"unsupported format: {fmt}")

    null_key = F.lit(False)
    for k in _KEY_FIELDS:
        null_key = null_key | F.col(k).isNull()

    valid = raw.filter(~corrupt & ~null_key).select(
        *[F.col(f.name).cast(f.dataType) for f in TRANSCRIPTS_SCHEMA.fields]
    )
    reason = (
        F.when(corrupt, F.lit("corrupt"))
        .when(null_key, F.lit("null_key"))
    )
    quarantined = raw.withColumn("_reason", reason).filter(
        F.col("_reason").isNotNull()
    )
    return valid, quarantined
