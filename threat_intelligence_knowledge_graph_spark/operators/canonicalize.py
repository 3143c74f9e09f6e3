"""Stage D — entity canonicalization.

Two layers (SURVEY.md §7 step 6):

1. **Exact layer** — the NER path's ids are already canonical by
   construction (same (type, value) ⇒ same id, reference
   ner_extractor.py:159-163), so exact canonicalization is the identity
   and parity with the reference holds with the alias layer OFF. That is
   the default.

2. **Alias layer (scale path, opt-in)** — MinHash/LSH blocking over
   normalized surface forms + connected components merges near-duplicate
   surface forms ("APT29" / "APT 29" / "apt-29") into one canonical id
   (min id in cluster). Cross-type merges are forbidden: blocking is
   salted by node_label so LSH buckets never mix types — the "salted-key"
   canonicalization of the north_star, and also the skew guard (hot
   common shingles can't build one giant bucket across types).

The output canonical dictionary is small relative to the corpus (only
ids that alias), so applying it to the edge stream is a broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .minhash import (
    char_shingles,
    connected_components,
    jaccard_verify,
    lsh_band_keys,
    lsh_candidate_pairs,
)


def build_alias_dictionary(
    nodes: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    jaccard_threshold: float = 0.75,
    max_bucket_size: int = 64,
) -> DataFrame:
    """nodes(node_label, node_id, properties) → (node_id, canonical_id).

    Only rows where canonical_id != node_id are returned (the dictionary
    is the exception set — broadcastable).
    """
    surface = nodes.select(
        F.col("node_id").alias("raw_id"),
        # Salt the blocking key with the label: type prefix joins the
        # shingled text so cross-type ids rarely collide in a bucket.
        F.concat_ws("|", "node_label", F.lower("node_id")).alias("surface"),
    )
    shingles = char_shingles(surface, "raw_id", "surface", n=3)
    banded = lsh_band_keys(shingles, num_hashes=num_hashes, bands=bands)
    pairs, _dropped = lsh_candidate_pairs(banded, max_bucket_size=max_bucket_size)
    verified = jaccard_verify(pairs, shingles, threshold=jaccard_threshold)
    # HARD same-label guard: the prefix salt is probabilistic (long ids
    # dilute the label shingles below any Jaccard threshold), so enforce
    # label equality on verified pairs before clustering — cross-type
    # merges must be impossible, not merely unlikely.
    labels_df = nodes.select(
        F.col("node_id").alias("_lid"), F.col("node_label").alias("_label")
    )
    verified = (
        verified.join(
            labels_df.withColumnRenamed("_lid", "a").withColumnRenamed("_label", "_la"),
            "a",
        )
        .join(
            labels_df.withColumnRenamed("_lid", "b").withColumnRenamed("_label", "_lb"),
            "b",
        )
        .filter(F.col("_la") == F.col("_lb"))
        .select("a", "b", "jaccard")
    )
    components = connected_components(verified.select("a", "b"))
    return (
        components.filter(F.col("id") != F.col("component"))
        .select(
            F.col("id").alias("node_id"),
            F.col("component").alias("canonical_id"),
        )
    )


def apply_canonicalization(
    edges: DataFrame, alias_dict: DataFrame
) -> DataFrame:
    """Rewrite edge endpoints through the (broadcast) alias dictionary."""
    src_map = F.broadcast(
        alias_dict.select(
            F.col("node_id").alias("src_id"), F.col("canonical_id").alias("_src_canon")
        )
    )
    dst_map = F.broadcast(
        alias_dict.select(
            F.col("node_id").alias("dst_id"), F.col("canonical_id").alias("_dst_canon")
        )
    )
    return (
        edges.join(src_map, "src_id", "left")
        .join(dst_map, "dst_id", "left")
        .withColumn("src_id", F.coalesce("_src_canon", "src_id"))
        .withColumn("dst_id", F.coalesce("_dst_canon", "dst_id"))
        .drop("_src_canon", "_dst_canon")
        .dropDuplicates(["src_id", "rel_type", "dst_id"])
    )
