"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB the scan you DON'T do is the fastest one: parquet/Iceberg
readers prune files and row groups by min/max column statistics, and
those statistics only bite if rows with nearby values sit in the same
files. Sorting by one column clusters that column only; writing in
Z-order — sort by the bit-interleave of several columns — keeps EVERY
interleaved column's min/max ranges tight simultaneously, so a filter
on any of them (or any combination) prunes. This is Delta Lake's
``OPTIMIZE ZORDER BY`` / Iceberg's ``rewrite_data_files(strategy =>
'sort', sort_order => zorder(...))``, expressed as a plain Catalyst
projection you can hand to ``repartitionByRange``/``sortWithinPartitions``
or ``tableio.compact``-style rewrites.

Implementation: each column is first normalized to an unsigned
``bits``-wide integer (caller-chosen quantization — rank, epoch bucket,
hash prefix…), then the Morton code interleaves the columns' bits
round-robin (column 0 gets the least-significant lane). The interleave
is an unrolled chain of shift/mask/or expressions — integer-exact,
whole-stage-codegen-friendly, no UDF, identical on any engine with
64-bit integers, and the unrolled form is visible in the plan rather
than hidden in a black-box function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def morton_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton/Z-order interleave of ``cols`` as a non-negative long.

    Each input must already be an integer in ``[0, 2^bits)`` — values
    outside are clamped (negatives to 0, overflow to 2^bits − 1) so a
    stray outlier degrades locality instead of corrupting the key.
    ``len(cols) · bits`` must fit in 63 bits (signed long). Bit i of
    column j lands at output bit ``i · n_cols + j``.
    """
    n = len(cols)
    if n < 1:
        raise ValueError("cols must be non-empty")
    if bits < 1 or n * bits > 63:
        raise ValueError("need 1 <= bits and len(cols)*bits <= 63")
    lo = F.lit(0).cast("long")
    hi = F.lit((1 << bits) - 1).cast("long")
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.col(c) if isinstance(c, str) else c
        v = F.least(F.greatest(v.cast("long"), lo), hi)
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, i * n + j))
    return key


def zorder_by(
    df: DataFrame,
    cols: list[Column | str],
    bits: int = 16,
    key_name: str = "zkey",
    n_files: int | None = None,
) -> DataFrame:
    """Rows re-clustered in Z-order of ``cols`` (pre-quantized — see
    ``morton_key``): range-partition by the Morton key (``n_files``
    target partitions, default Spark's shuffle parallelism) and sort
    within each partition, the OPTIMIZE ZORDER write shape. The key
    column ``key_name`` is kept so tests/audits can assert cluster
    locality; drop it at write time if unwanted.
    """
    keyed = df.withColumn(key_name, morton_key(cols, bits))
    parts = (
        keyed.repartitionByRange(n_files, key_name)
        if n_files
        else keyed.repartitionByRange(key_name)
    )
    return parts.sortWithinPartitions(key_name)
