"""Engine-equivalence gate for the per-class regex engine choices.

``rules/iocs.py`` compiles some IOC pattern strings under the
third-party ``regex`` engine (faster prefix scanning) and scans MACs
with a backreference fast-path. The pattern STRINGS remain the contract;
these tests assert the alternative engines/formulations produce
byte-identical findall results on (a) adversarial fuzz tailored per
class and (b) a realistic transcript corpus.
"""

from __future__ import annotations

import random
import re

import pytest

regex = pytest.importorskip("regex")

from threat_intelligence_knowledge_graph_spark.datagen import transcripts_rows
from threat_intelligence_knowledge_graph_spark.rules.iocs import (
    _MAC_FAST,
    _REGEX_ENGINE_CLASSES,
    IOC_PATTERNS,
    fang_text,
)

_PATTERNS = dict(IOC_PATTERNS)

# Class-tailored fuzz alphabets: dense in each pattern's own structural
# characters so boundary/lookaround behavior is exercised, not skipped.
_ALPHABETS = {
    "ipv6s": "0123456789abcdefABCDEF:.- xg",
    "urls": "htpsf:/.axb 'u\"<>)]w",
    "ssdeeps": "0123456789:ABCab/+ .x",
    "imphashes": "imphash:= 0123456789abcdefIMPHASH",
    "authentihashes": "authentihash:= 0123456789abcdefAUTH",
    "cves": "CVEcve-0123456789 x.",
    "file_paths": "C:\\abc .d\\exe /x\"",
    "registry_key_paths": "HKLMCUR\\abc_ .\"'x",
    "asns": "ASN 0123456789x.",
    "bitcoin_addresses": "13bc0123456789aBkmzNOP xl",
    "monero_addresses": "4AB123456789abcdefghijkmnopqrstuvwxyz x",
    "ipv4_cidrs": "0123456789./ x",
    "credit_cards": "0123456789 -x4567",
    "user_agents": "Mozilla/5.0 (Windows; x);,:+_-",
}


def _fuzz(alphabet: str, n: int = 4000, seed: int = 11) -> list[str]:
    rng = random.Random(seed)
    return [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 60)))
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def corpus() -> list[str]:
    from collections import defaultdict

    docs = defaultdict(list)
    for r in transcripts_rows(300):
        docs[r["conv_id"]].append((r["turn_idx"], r["text"]))
    return [fang_text("\n".join(t for _, t in sorted(v))) for v in docs.values()]


@pytest.mark.parametrize("cls", sorted(_REGEX_ENGINE_CLASSES))
def test_regex_engine_matches_re_fuzz(cls):
    pat = _PATTERNS[cls]
    r_std, r_alt = re.compile(pat), regex.compile(pat)
    for s in _fuzz(_ALPHABETS[cls]):
        assert r_std.findall(s) == r_alt.findall(s), (cls, s)


@pytest.mark.parametrize("cls", sorted(_REGEX_ENGINE_CLASSES))
def test_regex_engine_matches_re_corpus(cls, corpus):
    pat = _PATTERNS[cls]
    r_std, r_alt = re.compile(pat), regex.compile(pat)
    for t in corpus:
        assert r_std.findall(t) == r_alt.findall(t), cls


def test_ipv4_fused_engine_equivalence(corpus):
    from threat_intelligence_knowledge_graph_spark.rules.iocs import _IPV4_OR_CIDR

    std = re.compile(_IPV4_OR_CIDR.pattern)
    for s in _fuzz("0123456789./ ab", n=6000):
        assert std.findall(s) == _IPV4_OR_CIDR.findall(s), s
    for t in corpus:
        assert std.findall(t) == _IPV4_OR_CIDR.findall(t)


def test_mac_backref_equals_alternation(corpus):
    strict = re.compile(_PATTERNS["mac_addresses"])
    for s in _fuzz("0123456789abcdefABCDEF:- x", n=8000, seed=7):
        assert strict.findall(s) == [m[0] for m in _MAC_FAST.findall(s)], s
    for t in corpus:
        assert strict.findall(t) == [m[0] for m in _MAC_FAST.findall(t)]


def test_mac_sep_anchored_equals_contract(corpus):
    """The r5 separator-anchored scan (`_find_macs`) must equal the
    contract alternation — fuzz dense in hex/separator/boundary chars
    (incl. '_' and 'g': word chars outside the hex set, exercising the
    Python-side \\b precheck) plus the parity corpus."""
    from threat_intelligence_knowledge_graph_spark.rules.iocs import _find_macs

    strict = re.compile(_PATTERNS["mac_addresses"])
    for s in _fuzz("0123456789abcdefABCDEF:- x_g", n=8000, seed=13):
        assert strict.findall(s) == _find_macs(s), s
    # Unicode \b (r5 fix): non-ASCII word chars abutting a MAC must
    # block the match exactly as the contract pattern does.
    for s in _fuzz("0123456789abcdef:- é²x", n=6000, seed=15):
        assert strict.findall(s) == _find_macs(s), s
    for s in ["é00:11:22:33:44:55", "²00:11:22:33:44:55 x",
              "00:11:22:33:44:55é", "weird é 00:11:22:33:44:55"]:
        assert strict.findall(s) == _find_macs(s), s
    for t in corpus:
        assert strict.findall(t) == _find_macs(t)


def test_domains_tld_prescan_equals_scan(corpus):
    """The '.<tld>' prescan + run-start anchored match must equal the
    contract pattern's findall — adversarial dot/dash runs included."""
    from threat_intelligence_knowledge_graph_spark.rules.iocs import _find_domains

    strict = re.compile(_PATTERNS["domains"])
    for s in _fuzz("abc.-xcomnetru 019", n=8000, seed=3):
        assert strict.findall(s) == _find_domains(s), s
    # pathological same-run repetition (the walk-barrier path)
    for s in [".com" * 50, "a" + ".com" * 30, "x..com", "a-.com", "-a.com",
              "evil.com.evil2.net", "a.co.uk b.com.c", "." * 40 + "com"]:
        assert strict.findall(s) == _find_domains(s), s
    for t in corpus:
        assert strict.findall(t) == _find_domains(t)


def test_hexrun_simple_equals_lookaround(corpus):
    from threat_intelligence_knowledge_graph_spark.rules.iocs import (
        _HEX_RUN,
        _HEX_RUN_SIMPLE,
    )

    def simple(s):
        return [r for r in _HEX_RUN_SIMPLE.findall(s) if len(r) <= 128]

    for s in _fuzz("0123456789abcdefABCDEF xg", n=8000, seed=5):
        assert _HEX_RUN.findall(s) == simple(s), s
    long = "a" * 129 + " " + "b" * 64 + " " + "c" * 200
    assert _HEX_RUN.findall(long) == simple(long)
    for t in corpus:
        assert _HEX_RUN.findall(t) == simple(t)


def test_email_gate_is_necessary_condition():
    # The '@' gate can only skip texts the pattern cannot match.
    assert "@" in _PATTERNS["email_addresses"]
    assert re.compile(_PATTERNS["email_addresses"]).findall("alice a.b.com") == []


def test_email_at_prescan_equals_scan(corpus):
    """The '@'-anchored walk-back fast path must equal the contract
    pattern's findall — including non-word local-part prefixes where \\b
    holds mid-run, adjacent '@'s, and runs abutting earlier matches."""
    from threat_intelligence_knowledge_graph_spark.rules.iocs import _find_emails

    strict = re.compile(_PATTERNS["email_addresses"])
    for s in _fuzz("ab9._%+-@. comx ", n=8000, seed=13):
        assert strict.findall(s) == _find_emails(s), s
    # Unicode \b: 'é'/'²' are \w to the contract pattern but outside
    # every ASCII set — the manual boundary test must agree (r5 fix).
    for s in _fuzz("ab9._%+-@. comé² ", n=6000, seed=14):
        assert strict.findall(s) == _find_emails(s), s
    for s in ["éa@b.com", "²x@y.org", "é.a@b.com", "aé@b.com x@y.io"]:
        assert strict.findall(s) == _find_emails(s), s
    for s in ["-.a@b.com", "..a@b.com", "_a@b.com", "%a@b.com", "a@@b.com",
              "a@b.com c@d.net", "a@b.comc@d.net", "x a@b@c.com", "@b.com",
              "a@b", "a@b.c", "9@b.io", "a.b@c.d.com", "+tag@x.org",
              "a@b.com" * 20, "--@x.com", "a-@x.com", "@@a@x.com@@"]:
        assert strict.findall(s) == _find_emails(s), s
    for t in corpus:
        assert strict.findall(t) == _find_emails(t)


def test_ssdeep_rx_gate_is_necessary_condition(corpus):
    """Every ssdeep match contains a ':<base64ish>{3,}:' substring, so a
    doc without a gate hit cannot contain a match."""
    from threat_intelligence_knowledge_graph_spark.rules.iocs import (
        _RX_GATES,
        COMPILED_IOC_PATTERNS,
    )

    gate = _RX_GATES["ssdeeps"]
    rx_ss = dict(COMPILED_IOC_PATTERNS)["ssdeeps"]
    for s in _fuzz("0123456789abcAB/+: x", n=8000, seed=17):
        if gate.search(s) is None:
            assert rx_ss.findall(s) == [], s
    assert gate.search("3:AXGBicFlgVNhBGcL6wCrFQEv:AXGHsNhxLsr2C") is not None
    for t in corpus:
        if gate.search(t) is None:
            assert rx_ss.findall(t) == []


def _containment_relations(entities, raw_text):
    """Verbatim reimplementation of the pre-optimization containment
    path (reference stix_relation_extractor.py:118-296 semantics): split
    into sentences, group by `value in sentence`, pair within sentence
    groups. Used only as the equality oracle for the span fast-path."""
    from threat_intelligence_knowledge_graph_spark.kernel import extract as KE
    from threat_intelligence_knowledge_graph_spark.rules.mappings import (
        STIX_TYPE_MAPPING,
    )
    from threat_intelligence_knowledge_graph_spark.rules.relations import (
        RELATION_LOOKUP,
    )

    if len(entities) < 2:
        return []
    sentences = KE._SENT_RX.split(raw_text)
    ents = []
    for e in entities:
        stx = STIX_TYPE_MAPPING.get(e["type"])
        if stx:
            ents.append((e["id"], e["type"], e["value"], stx))
    by_sentence = {}
    for ent in ents:
        for i, sentence in enumerate(sentences):
            if ent[2] in sentence:
                by_sentence.setdefault(i, []).append(ent)
    relationships = []
    url_host_memo = {}
    for sent_idx, sent_entities in by_sentence.items():
        if len(sent_entities) < 2:
            continue
        sentence = sentences[sent_idx]
        sentence_lower = sentence.lower()
        sel_memo = {}
        for i, e1 in enumerate(sent_entities):
            src_stix = e1[3]
            for j, e2 in enumerate(sent_entities):
                if i == j:
                    continue
                dst_stix = e2[3]
                candidates = RELATION_LOOKUP.get((src_stix, dst_stix))
                if not candidates:
                    if src_stix == "domain-name" and dst_stix == "ipv4-addr":
                        candidates = ("resolves-to",)
                    elif src_stix == "url" and dst_stix == "domain-name":
                        url_l = e1[2].lower()
                        if url_l not in url_host_memo:
                            m = KE._URL_HOST_RX.search(url_l)
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
                    selected = KE._select_rel_type(list(candidates), sentence_lower)
                    sel_memo[ckey] = selected
                if selected:
                    relationships.append(
                        (e1[0], e1[1], selected.upper(), e2[0], e2[1], sentence)
                    )
    seen = set()
    unique = []
    for rel in relationships:
        key = (rel[0], rel[2], rel[3])
        if key not in seen:
            seen.add(key)
            unique.append(rel)
    return unique


def test_relation_span_path_equals_containment_path(corpus):
    """The span-based grouping must produce relation lists byte-equal
    (including ORDER and context sentences) to the containment scan."""
    from threat_intelligence_knowledge_graph_spark.kernel import extract as KE
    from threat_intelligence_knowledge_graph_spark.rules.iocs import find_iocs_doc
    from threat_intelligence_knowledge_graph_spark.rules.mappings import (
        IOC_TO_ENTITY_TYPE,
    )

    checked_rels = 0
    for t in corpus:
        iocs = find_iocs_doc(t)
        entities = []
        for cls, vals in iocs.items():
            mt = IOC_TO_ENTITY_TYPE.get(cls)
            if not mt:
                continue
            for v in vals:
                entities.append(
                    {"id": KE.create_node_id(mt, v), "type": mt, "value": v}
                )
        got = KE._extract_relations(entities, t)
        assert got == _containment_relations(entities, t)
        checked_rels += len(got)
    assert checked_rels > 100  # non-vacuous

    # Boundary-straddling value: a separator inside the value must keep
    # it out of every sentence group on both paths.
    ua = "Mozilla/5.0 (Windows NT 10. 0) beacon"
    text = f"Agent {ua} hits 10.1.2.3. Second sentence mentions evil.com."
    ents = [
        {"id": "a", "type": "UserAgent", "value": ua},
        {"id": "b", "type": "IPv4", "value": "10.1.2.3"},
        {"id": "c", "type": "Domain", "value": "evil.com"},
    ]
    assert KE._extract_relations(ents, text) == _containment_relations(ents, text)


def test_relation_span_path_fuzz_repeats_and_overlaps():
    """Stress the span-path occurrence loop (monotone sentence index +
    restart-past-accepted-match): values that repeat many times inside
    one sentence, straddle separators, overlap each other (domain
    inside URL), and self-overlap ('aaa' in 'aaaaa') must group
    byte-identically to the containment scan."""
    import random

    from threat_intelligence_knowledge_graph_spark.kernel import extract as KE

    rng = random.Random(23)
    # (type, value) pool chosen so STIX mapping exists and values
    # overlap: the domain is a substring of the URL, the ipv4 repeats,
    # and the self-overlapping 'aaa'/'aaaaa' pair draws 'aaaa…' runs.
    pool = [
        ("Domain", "evil.com"),
        ("URL", "http://evil.com/x"),
        ("IPv4", "10.1.2.3"),
        ("Hash", "aaa"),
        ("Domain", "aaaaa"),
        ("FilePath", "deadbeef"),
    ]
    seps = [". ", "! ", "? ", "\n", " "]
    checked = 0
    for _ in range(2500):
        n_ent = rng.randint(2, 5)
        ents = rng.sample(pool, n_ent)
        entities = [
            {"id": KE.create_node_id(t, v), "type": t, "value": v}
            for t, v in ents
        ]
        parts = []
        for _ in range(rng.randint(2, 14)):
            parts.append(rng.choice([v for _, v in pool] + ["filler", "a"]))
            parts.append(rng.choice(seps))
        text = "".join(parts)
        got = KE._extract_relations(entities, text)
        assert got == _containment_relations(entities, text), text
        checked += len(got)
    assert checked > 500  # non-vacuous
