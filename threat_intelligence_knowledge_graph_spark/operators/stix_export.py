"""STIX 2.1 export skeleton: graph-store nodes/edges → SDO/SCO/SRO rows.

The reference stores its graph in Neo4j (neo4j_store.py); the interop
surface a CTI consumer actually exchanges is STIX 2.1 — so this module
maps the store's (label, id) node identity and (src, rel, dst) edge
identity onto STIX object rows. Two deliberate conventions:

- **Deterministic content-derived ids.** STIX prescribes
  ``<type>--<uuid>``; real producers use UUIDv5 over the object's
  contents so re-exports are stable. We derive the UUID-shaped suffix
  from the md5 of the store identity (formatted 8-4-4-4-12) — the same
  stability property, reproducible in ANY engine (uuid5/sha1 truncation
  would work too; md5 is the hash family every oracle here shares).
  Re-running the export after a re-ingest emits byte-identical ids, so
  downstream TIP de-duplication works.
- **Custom types for unmapped labels.** Labels outside the pinned
  STIX_TYPE_MAPPING (reference config) export as ``x-<label>`` — the
  STIX custom-object convention — rather than being silently dropped
  (the repo's no-silent-truncation rule).

Scale shape: both exports are pure projections (one codegen'd stage, no
exchange, no UDF); id derivation is md5 + substring arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..kernel.extract import store_label
from ..rules.mappings import STIX_TYPE_MAPPING

# Store label (what finalize_nodes emits) → STIX type. Distinct keys by
# construction (capitalize() collides for none of the pinned types).
STORE_LABEL_TO_STIX: dict[str, str] = {
    store_label(k): v for k, v in STIX_TYPE_MAPPING.items()
}


def _uuidish(col) -> F.Column:
    """md5 hex → UUID-shaped 8-4-4-4-12 string (deterministic)."""
    h = F.md5(col)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def _stix_type(label_col: str) -> F.Column:
    expr = None
    for k, v in sorted(STORE_LABEL_TO_STIX.items()):
        cond = F.col(label_col) == k
        expr = F.when(cond, F.lit(v)) if expr is None else expr.when(cond, F.lit(v))
    return expr.otherwise(F.concat(F.lit("x-"), F.lower(F.col(label_col))))


def object_ref(label_col: str, id_col: str) -> F.Column:
    """``<stix_type>--<uuid-shaped md5(node_id)>`` for a store node."""
    return F.concat(_stix_type(label_col), F.lit("--"), _uuidish(F.col(id_col)))


def stix_objects(
    nodes: DataFrame, label_col: str = "node_label", id_col: str = "node_id"
) -> DataFrame:
    """One STIX object row per store node:
    ``(stix_id, stix_type, node_label, node_id)`` — the node columns are
    kept as the provenance back-reference a TIP import wants."""
    return nodes.select(
        object_ref(label_col, id_col).alias("stix_id"),
        _stix_type(label_col).alias("stix_type"),
        F.col(label_col),
        F.col(id_col),
    )


def stix_relationships(
    edges: DataFrame,
    src_label_col: str = "src_label",
    src_col: str = "src_id",
    rel_col: str = "rel_type",
    dst_label_col: str = "dst_label",
    dst_col: str = "dst_id",
) -> DataFrame:
    """One STIX SRO row per store edge: ``(stix_id, relationship_type,
    source_ref, target_ref)``. relationship_type is the store rel
    lowered with ``_`` → ``-`` (the inverse of ``store_rel_type``); the
    SRO id hashes the full (src, rel, dst) identity with unit
    separators so distinct edges never collide."""
    rel = F.lower(F.regexp_replace(F.col(rel_col), "_", "-"))
    identity = F.concat_ws(
        "\x1f", F.col(src_col), F.col(rel_col), F.col(dst_col)
    )
    return edges.select(
        F.concat(F.lit("relationship--"), _uuidish(identity)).alias("stix_id"),
        rel.alias("relationship_type"),
        object_ref(src_label_col, src_col).alias("source_ref"),
        object_ref(dst_label_col, dst_col).alias("target_ref"),
    )
