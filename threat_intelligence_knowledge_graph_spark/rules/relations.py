"""Relation schema + cue-word rules.

The reference loads ``Relations.csv`` from its (absent) submodule and falls
back to a hardcoded 10-row table (reference stix_relation_extractor.py:93-116)
— the fallback is what actually executes, so that table *is* the contract.
Row order matters: "first candidate" selection is order-sensitive
(reference stix_relation_extractor.py:266-267), hence ``rule_idx``.
"""

# (rule_idx, src_stix_type, rel_type, dst_stix_type, reverse_name)
# Verbatim semantics of reference stix_relation_extractor.py:96-107.
RELATION_RULES: list[tuple[int, str, str, str, str]] = [
    (0, "threat-actor", "uses", "malware", "used-by"),
    (1, "threat-actor", "uses", "tool", "used-by"),
    (2, "threat-actor", "targets", "identity", "targeted-by"),
    (3, "threat-actor", "targets", "vulnerability", "targeted-by"),
    (4, "malware", "targets", "vulnerability", "targeted-by"),
    (5, "malware", "communicates-with", "ipv4-addr", "communicated-with"),
    (6, "malware", "communicates-with", "domain-name", "communicated-with"),
    (7, "malware", "communicates-with", "url", "communicated-with"),
    (8, "domain-name", "resolves-to", "ipv4-addr", "resolved-from"),
    (9, "url", "contains", "domain-name", "contained-in"),
]

# (src_stix, dst_stix) → [rel_type, ...] in rule order
# (reference stix_relation_extractor.py:72-77).
RELATION_LOOKUP: dict[tuple[str, str], list[str]] = {}
for _idx, _src, _rel, _dst, _rev in RELATION_RULES:
    RELATION_LOOKUP.setdefault((_src, _dst), []).append(_rel)

# Cue-word heuristics, checked per candidate rel_type inside the loop
# (reference stix_relation_extractor.py:242-262). Loop order: (1) literal
# rel_type name in lowercase sentence, then (2) these cue sets — preserved
# exactly by the kernel.
CUE_WORDS: dict[str, list[str]] = {
    "communicates-with": [
        "communicate", "connection", "connecting", "connect", "beacon",
        "c2", "command and control",
    ],
    "resolves-to": ["resolve", "resolving", "resolved", "points to", "pointing to"],
    "uses": ["use", "using", "used", "utilize", "deploy", "leverage"],
    "targets": ["target", "targeting", "targeted", "against", "victim"],
}

# Pinned sentence splitter: the reference's regex fallback
# (stix_relation_extractor.py:145). We pin the fallback — not NLTK punkt —
# for cross-executor determinism (documented deviation, SURVEY.md §7).
SENTENCE_SPLIT_REGEX = r"[.!?]+\s+"
