"""Rule data shared by the reference-oracle and the Spark kernel.

Everything in this package is *data* (regexes, dictionaries, cue lists),
pinned once so that the pure-Python oracle and the vectorized Spark kernel
agree bit-for-bit. Sources are cited per item; where the reference's
un-vendored STIXnet submodule owned the data (IOC regexes, nationality KB,
Relations.csv) we pin self-contained equivalents derived from the
reference's call sites — see SURVEY.md §2.8-2.10.
"""

from .iocs import IOC_CLASS_ORDER, find_iocs_doc, fang_text, FANG_RULES
from .mappings import (
    IOC_TO_ENTITY_TYPE,
    STIX_TYPE_MAPPING,
    DEFAULT_ALLOWED_NODES,
    DEFAULT_ALLOWED_RELATIONSHIPS,
)
from .relations import RELATION_RULES, RELATION_LOOKUP, CUE_WORDS
from .locations import NATIONALITY_KB

__all__ = [
    "IOC_CLASS_ORDER",
    "find_iocs_doc",
    "fang_text",
    "FANG_RULES",
    "IOC_TO_ENTITY_TYPE",
    "STIX_TYPE_MAPPING",
    "DEFAULT_ALLOWED_NODES",
    "DEFAULT_ALLOWED_RELATIONSHIPS",
    "RELATION_RULES",
    "RELATION_LOOKUP",
    "CUE_WORDS",
    "NATIONALITY_KB",
]
