from .extract import (
    create_node_id,
    py_title,
    format_property_key,
    extract_document,
    finalize_nodes,
    finalize_edges,
)

__all__ = [
    "create_node_id",
    "py_title",
    "format_property_key",
    "extract_document",
    "finalize_nodes",
    "finalize_edges",
]
