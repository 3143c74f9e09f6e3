"""Per-document extraction kernel — the shared, deterministic core.

This module is pure Python + ``re`` (no Spark imports) so it can run

1. inside the Spark ``mapInPandas`` extraction operator, once per
   reassembled conversation document within an Arrow batch, and
2. standalone as the reference-oracle used by the pytest parity gate
   (``oracle/reference_oracle.py`` wraps it 1:1 with the reference's
   control flow, cited per step).

Semantics are a faithful re-derivation (NOT a copy) of the reference's
deterministic NER path:

- fang → IOC sweep:            reference ner_extractor.py:447,455
- typing + allowlists:         reference ner_extractor.py:458-474
- node id canonicalization:    reference ner_extractor.py:159-163
- per-type properties:         reference ner_extractor.py:477-516
- location KB scan:            reference ner_extractor.py:165-216,529-554
- relation extraction:         reference stix_relation_extractor.py:118-296
- doc-level fallback edges:    reference ner_extractor.py:666-726
- store-time normalization:    reference neo4j_store.py:109-164
- camelCase property keys:     reference utils/helpers.py:17-57

Scale note: everything here is O(doc) local work with zero cross-document
state — the property that makes the pipeline embarrassingly partitionable
over conversations at 10^12-turn scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache

from ..rules.iocs import fang_text, find_iocs_doc
from ..rules.mappings import IOC_TO_ENTITY_TYPE, STIX_TYPE_MAPPING
from ..rules.relations import CUE_WORDS, RELATION_LOOKUP, SENTENCE_SPLIT_REGEX
from ..rules.locations import NATIONALITY_KB

_SANITIZE_RX = re.compile(r"[^a-zA-Z0-9_-]")
_SENT_RX = re.compile(SENTENCE_SPLIT_REGEX)
_URL_HOST_RX = re.compile(r"(?:https?|ftp|sftp)://([^:/]+)")

# Sentence-splitter seam. The reference PREFERS NLTK punkt and falls back
# to the regex (stix_relation_extractor.py:133-145); we pin the regex as
# the parity default (cross-engine determinism — the DuckDB oracle can't
# run punkt) and expose punkt as an opt-in: TIKG_SENTENCE_SPLITTER=punkt.
# Resolution is lazy PER PROCESS so Spark workers (which don't share the
# driver's module state) resolve it from their own environment; if nltk
# or its punkt data is absent the regex fallback engages silently — the
# same degradation path the reference takes.
_SPLITTER = None


def _resolve_splitter():
    global _SPLITTER
    if _SPLITTER is None:
        import os

        fn = _SENT_RX.split
        if os.environ.get("TIKG_SENTENCE_SPLITTER") == "punkt":
            try:
                from nltk.tokenize import sent_tokenize

                sent_tokenize("Probe one. Probe two.")  # punkt data present?
                fn = sent_tokenize
            except Exception:
                pass
        _SPLITTER = fn
    return _SPLITTER


def _split_sentences(text: str) -> list[str]:
    return _resolve_splitter()(text)


# Bounded memos: pure string→string maps; IOC values repeat heavily both
# within and across documents, and the caches are capped so a long-lived
# Python worker cannot grow without bound over a 100 TB scan.
@lru_cache(maxsize=65536)
def create_node_id(entity_type: str, entity_value: str) -> str:
    """``{type.lower()}_{value with non [a-zA-Z0-9_-] → _}``
    (reference ner_extractor.py:159-163)."""
    return f"{entity_type.lower()}_{_SANITIZE_RX.sub('_', entity_value)}"


@lru_cache(maxsize=65536)
def py_title(s: str) -> str:
    """Python ``str.title()`` semantics — capitalizes after every
    non-alpha, which differs from Spark ``initcap`` (whitespace-only).
    The store title-cases every node id (reference neo4j_store.py:114,
    132,160), so this exact behavior is part of triple identity."""
    return s.title()


@lru_cache(maxsize=4096)
def format_property_key(s: str) -> str:
    """camelCase on whitespace-separated words
    (reference utils/helpers.py:17-37)."""
    if not s:
        return ""
    words = s.split()
    if not words:
        return s
    return "".join([words[0].lower()] + [w.capitalize() for w in words[1:]])


@dataclass
class DocGraph:
    """Raw per-document extraction output (pre store-normalization)."""

    nodes: list[tuple[str, str, dict[str, str]]] = field(default_factory=list)
    # (src_id, src_type, rel_type_raw, dst_id, dst_type, context)
    edges: list[tuple[str, str, str, str, str, str]] = field(default_factory=list)


def _hash_algorithm(ioc_class: str, value: str) -> str:
    """Algorithm inference: source class first, then length
    (reference ner_extractor.py:485-503)."""
    if ioc_class == "md5s" or len(value) == 32:
        return "MD5"
    if ioc_class == "sha1s" or len(value) == 40:
        return "SHA-1"
    if ioc_class == "sha256s" or len(value) == 64:
        return "SHA-256"
    if ioc_class == "sha512s" or len(value) == 128:
        return "SHA-512"
    if ioc_class == "imphashes":
        return "IMPHASH"
    if ioc_class == "authentihashes":
        return "AUTHENTIHASH"
    if ioc_class == "ssdeeps":
        return "SSDEEP"
    return "Unknown"


def _entity_properties(node_type: str, ioc_class: str, value: str) -> dict[str, str]:
    """Per-type property enrichment (reference ner_extractor.py:477-516)."""
    if node_type == "Hash":
        return {"algorithm": _hash_algorithm(ioc_class, value), "value": value}
    if node_type == "Vulnerability" and value.startswith("CVE-"):
        return {"id": value, "value": value}
    if node_type == "CryptocurrencyAddress":
        currency = "Bitcoin" if ioc_class == "bitcoin_addresses" else "Monero"
        return {"currency_type": currency, "value": value}
    return {"value": value}


def _extract_locations(raw_text: str) -> list[tuple[str, str, dict[str, str]]]:
    """Nationality substring scan over RAW text
    (reference ner_extractor.py:165-216).

    Scan strategy note (r5, measured): 35 C-speed ``in`` scans beat a
    single alternation regex pass by 2-9× on the kernel corpus (stdlib
    ``re`` has no literal-prefix optimization for alternations and the
    ``regex`` engine's is slower than memchr here) — the per-entry loop
    IS the fast path. Semantics pinned by
    tests/test_kernel.py::test_location_alternation_scan_equals_per_entry_scan."""
    text_lower = raw_text.lower()
    seen: set[str] = set()
    out: list[tuple[str, str, dict[str, str]]] = []
    for nationality, nation in NATIONALITY_KB:
        if len(nationality) < 4:
            continue
        if nationality in text_lower:
            node_id = create_node_id("Location", nation)
            if node_id in seen:
                continue
            seen.add(node_id)
            out.append((node_id, "Location", {"name": nation, "type": "nation"}))
    return out


def _select_rel_type(candidates: list[str], sentence_lower: str) -> str | None:
    """Order-sensitive cue selection
    (reference stix_relation_extractor.py:231-267)."""
    for rel_type in candidates:
        if rel_type in sentence_lower:
            return rel_type
        cues = CUE_WORDS.get(rel_type)
        if cues and any(c in sentence_lower for c in cues):
            return rel_type
    return candidates[0] if candidates else None


def _extract_relations(
    entities: list[dict], raw_text: str
) -> list[tuple[str, str, str, str, str, str]]:
    """Sentence-scoped pairwise relation extraction
    (reference stix_relation_extractor.py:118-296). Runs on RAW text.

    Hot path: rebuilt allocation-light (entity tuples instead of dict
    copies per (entity, sentence) hit; per-sentence memo of the
    order-sensitive cue selection, which depends only on the candidate
    list and the sentence). Semantics identical — asserted by the parity
    suite and the kernel tests."""
    if len(entities) < 2:
        # A pair needs two entities; skips the sentence split + containment
        # scan for single-IOC documents (the common filler-doc fast path).
        # Semantics identical: with <2 entities no sentence group can pair.
        return []

    # (id, type, value, stix) tuples, entity order preserved.
    ents: list[tuple[str, str, str, str]] = []
    for entity in entities:
        stix_type = STIX_TYPE_MAPPING.get(entity["type"])
        if stix_type:
            ents.append((entity["id"], entity["type"], entity["value"], stix_type))

    # Group entities by sentence (substring containment, case-sensitive) —
    # reference stix_relation_extractor.py:151-176.
    splitter = _resolve_splitter()
    # NB: `splitter is _SENT_RX.split` would always be False — attribute
    # access mints a fresh bound-method object; compare the bound target.
    if getattr(splitter, "__self__", None) is _SENT_RX:
        # Fast path for the pinned regex splitter: ONE separator pass
        # yields sentence [start, end) spans, then each entity value is
        # located with str.find over the whole text and mapped to its
        # sentence by bisect — replacing the O(entities × sentences)
        # per-sentence containment scans. A value occurrence counts iff
        # it lies wholly inside one span, which is exactly `value in
        # sentence` (sentences are contiguous substrings of raw_text).
        # Exact-equality with the containment path is pytest-asserted.
        from bisect import bisect_right

        spans: list[tuple[int, int]] = []
        starts: list[int] = []
        pos = 0
        for m in _SENT_RX.finditer(raw_text):
            spans.append((pos, m.start()))
            starts.append(pos)
            pos = m.end()
        spans.append((pos, len(raw_text)))
        starts.append(pos)

        sentences = None  # sliced lazily from spans below
        by_sentence: dict[int, list[tuple[str, str, str, str]]] = {}
        find = raw_text.find
        if len(spans) == 1:
            # Separator-free document: every occurrence is wholly inside
            # the single span, so presence alone decides.
            for ent in ents:
                if find(ent[2]) != -1:
                    by_sentence.setdefault(0, []).append(ent)
        else:
            for ent in ents:
                value = ent[2]
                vlen = len(value)
                p = find(value)
                last_si = -1
                while p != -1:
                    si = bisect_right(starts, p) - 1
                    if p + vlen <= spans[si][1]:
                        # Occurrences scan left→right, so si is
                        # non-decreasing — an int compare replaces the
                        # per-entity hit set.
                        if si != last_si:
                            last_si = si
                            by_sentence.setdefault(si, []).append(ent)
                        # Any overlapping occurrence in [p+1, p+vlen)
                        # that lies wholly inside a sentence lies inside
                        # THIS one (sentences are disjoint contiguous
                        # ranges and p+vlen ≤ its end) — already counted,
                        # so restart past the accepted match.
                        p = find(value, p + vlen)
                    else:
                        p = find(value, p + 1)
    else:
        # Punkt (or any opt-in splitter): sentences need not be
        # contiguous substrings of raw_text, so keep the reference's
        # literal containment scan.
        sentences = splitter(raw_text)
        by_sentence = {}
        for ent in ents:
            value = ent[2]
            for i, sentence in enumerate(sentences):
                if value in sentence:
                    by_sentence.setdefault(i, []).append(ent)

    relationships: list[tuple[str, str, str, str, str, str]] = []
    url_host_memo: dict[str, str | None] = {}
    for sent_idx, sent_entities in by_sentence.items():
        if len(sent_entities) < 2:
            continue
        if sentences is None:
            s0, s1 = spans[sent_idx]
            sentence = raw_text[s0:s1]
        else:
            sentence = sentences[sent_idx]
        sentence_lower = sentence.lower()
        sel_memo: dict[tuple[str, ...], str | None] = {}
        for i, e1 in enumerate(sent_entities):
            src_stix = e1[3]
            for j, e2 in enumerate(sent_entities):
                if i == j:
                    continue
                dst_stix = e2[3]
                candidates = RELATION_LOOKUP.get((src_stix, dst_stix))
                if not candidates:
                    # Special-case rules (stix_relation_extractor.py:201-224)
                    if src_stix == "domain-name" and dst_stix == "ipv4-addr":
                        candidates = ("resolves-to",)
                    elif src_stix == "url" and dst_stix == "domain-name":
                        url_l = e1[2].lower()
                        if url_l not in url_host_memo:
                            m = _URL_HOST_RX.search(url_l)
                            url_host_memo[url_l] = m.group(1) if m else None
                        if url_host_memo[url_l] == e2[2].lower():
                            candidates = ("contains",)
                        else:
                            continue
                    elif src_stix == "file" and dst_stix in (
                        "ipv4-addr",
                        "domain-name",
                        "url",
                    ):
                        candidates = ("communicates-with",)
                    else:
                        continue
                ckey = tuple(candidates)
                if ckey in sel_memo:
                    selected = sel_memo[ckey]
                else:
                    selected = _select_rel_type(list(candidates), sentence_lower)
                    sel_memo[ckey] = selected
                if selected:
                    relationships.append(
                        (
                            e1[0],
                            e1[1],
                            selected.upper(),
                            e2[0],
                            e2[1],
                            sentence,
                        )
                    )

    # Dedup on (src_id, TYPE, dst_id), first kept
    # (stix_relation_extractor.py:279-293).
    seen: set[tuple[str, str, str]] = set()
    unique: list[tuple[str, str, str, str, str, str]] = []
    for rel in relationships:
        key = (rel[0], rel[2], rel[3])
        if key not in seen:
            seen.add(key)
            unique.append(rel)
    return unique


def extract_document(
    text: str,
    allowed_nodes: set[str] | None = None,
    allowed_relationships: set[str] | None = None,
) -> DocGraph:
    """Full deterministic extraction for one document.

    Mirrors reference ner_extractor.py:429-776 end-to-end: IOC sweep on
    fanged text, locations on raw text, relation extraction on raw text,
    doc-level fallback edges when the sentence pass yields nothing.
    ``None`` allowlists mean wildcard (the NER path's configuration,
    reference main.py:406-414).
    """
    allow_all_nodes = allowed_nodes is None or "*" in allowed_nodes
    allow_all_rels = allowed_relationships is None or "*" in allowed_relationships

    def node_ok(t: str) -> bool:
        return allow_all_nodes or t in (allowed_nodes or set())

    def rel_ok(t: str) -> bool:
        return allow_all_rels or t in (allowed_relationships or set())

    graph = DocGraph()
    if not text or not text.strip():
        return graph

    fanged = fang_text(text)
    iocs = find_iocs_doc(fanged)

    node_map: dict[str, tuple[str, str, dict[str, str]]] = {}
    entity_list: list[dict] = []

    # Step 1: typed IOC nodes (reference ner_extractor.py:458-527).
    for ioc_class, values in iocs.items():
        mapped_type = IOC_TO_ENTITY_TYPE.get(ioc_class)
        if not mapped_type or not values:
            continue
        if not node_ok(mapped_type):
            continue
        for value in values:
            node_id = create_node_id(mapped_type, value)
            props = _entity_properties(mapped_type, ioc_class, value)
            node = (node_id, mapped_type, props)
            node_map[f"{mapped_type}:{value}"] = node
            graph.nodes.append(node)

    # Step 2: locations (reference ner_extractor.py:529-554).
    if node_ok("Location"):
        for node in _extract_locations(text):
            node_map[f"Location:{node[2]['name']}"] = node
            graph.nodes.append(node)

    # Step 3: rcATT tactics/techniques — the reference executes the empty
    # fallback when model assets are absent (ner_extractor.py:128-135,
    # 231-233); we pin that fallback (no ATT&CK nodes). Interface slot kept.

    # Step 4: relation extraction over RAW text
    # (reference ner_extractor.py:606-664). Entity list rebuilt in the same
    # class order as step 1 (ner_extractor.py:609-626).
    for ioc_class, values in iocs.items():
        mapped_type = IOC_TO_ENTITY_TYPE.get(ioc_class)
        if not mapped_type or not values or not node_ok(mapped_type):
            continue
        for value in values:
            node = node_map.get(f"{mapped_type}:{value}")
            if node is not None:
                entity_list.append(
                    # Reuse the id computed at node creation (step 1) —
                    # identical by construction, skips a second sanitize.
                    {"id": node[0], "type": mapped_type, "value": value}
                )

    for rel in _extract_relations(entity_list, text):
        if rel_ok(rel[2]):
            graph.edges.append(rel)

    # Step 5: doc-level fallback when NO relationship was found at all
    # (reference ner_extractor.py:666-726).
    if not graph.edges:
        domains = iocs.get("domains", [])
        ipv4s = iocs.get("ipv4s", [])
        urls = iocs.get("urls", [])
        if domains and ipv4s and rel_ok("RESOLVES_TO"):
            for domain in domains:
                if f"Domain:{domain}" not in node_map:
                    continue
                for ip in ipv4s:
                    if f"IPv4:{ip}" in node_map:
                        graph.edges.append(
                            (
                                create_node_id("Domain", domain),
                                "Domain",
                                "RESOLVES_TO",
                                create_node_id("IPv4", ip),
                                "IPv4",
                                "",
                            )
                        )
        if domains and urls and rel_ok("CONTAINS"):
            seen_pairs: set[tuple[str, str]] = set()
            for url in urls:
                m = _URL_HOST_RX.search(url)
                if not m:
                    continue
                host = m.group(1)
                if host not in domains:
                    continue
                pair = (url, host)
                if pair in seen_pairs:
                    continue
                seen_pairs.add(pair)
                if f"URL:{url}" in node_map and f"Domain:{host}" in node_map:
                    graph.edges.append(
                        (
                            create_node_id("URL", url),
                            "URL",
                            "CONTAINS",
                            create_node_id("Domain", host),
                            "Domain",
                            "",
                        )
                    )

    return graph


# ---------------------------------------------------------------------------
# Store-time normalization (reference neo4j_store.py:109-164): these produce
# the *stored* identity used for triple equality.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=1024)
def store_label(node_type: str) -> str:
    """``type.replace('-','_').capitalize()`` (neo4j_store.py:123,147-148)."""
    return node_type.replace("-", "_").capitalize()


def store_rel_type(rel_type: str) -> str:
    """``type.replace('-','_').upper()`` (neo4j_store.py:149)."""
    return rel_type.replace("-", "_").upper()


def finalize_nodes(graph: DocGraph) -> list[tuple[str, str, dict[str, str]]]:
    """Stored-node form: (label, title-cased id, camelCased props + name).

    MERGE semantics: dedup on (label, id), later properties win
    (neo4j_store.py:126-135). ``sourceUrl``/``batchId`` are replaced by
    explicit lineage columns at the table layer (uuid4 per batch is not
    reproducible — SURVEY.md §2 op 27).
    """
    merged: dict[tuple[str, str], dict[str, str]] = {}
    order: list[tuple[str, str]] = []
    for node_id, node_type, props in graph.nodes:
        stored_id = py_title(node_id)
        label = store_label(node_type)
        stored_props = {format_property_key(k): v for k, v in props.items()}
        stored_props["name"] = stored_id
        key = (label, stored_id)
        if key not in merged:
            order.append(key)
            merged[key] = stored_props
        else:
            merged[key].update(stored_props)
    return [(label, node_id, merged[(label, node_id)]) for label, node_id in order]


def finalize_edges(graph: DocGraph) -> list[tuple[str, str, str, str, str, str]]:
    """Stored-edge form: labels + title-cased endpoint ids + normalized
    rel type, dedup on (src, type, dst) (neo4j_store.py:137-164)."""
    seen: set[tuple[str, str, str]] = set()
    out: list[tuple[str, str, str, str, str, str]] = []
    for src_id, src_type, rel_type, dst_id, dst_type, context in graph.edges:
        stored = (
            store_label(src_type),
            py_title(src_id),
            store_rel_type(rel_type),
            store_label(dst_type),
            py_title(dst_id),
            context,
        )
        key = (stored[1], stored[2], stored[4])
        if key not in seen:
            seen.add(key)
            out.append(stored)
    return out
