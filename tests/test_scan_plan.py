"""Property test: the fused scan plan ≡ scanning every class regex
one-by-one (the fused hex-run / ipv4-or-cidr scans and substring gates
must never change results)."""

import re

from hypothesis import given, settings, strategies as st

from threat_intelligence_knowledge_graph_spark.datagen import gen_conversation
from threat_intelligence_knowledge_graph_spark.rules.iocs import (
    COMPILED_IOC_PATTERNS,
    _dedup_keep_order,
    fang_text,
    find_iocs_doc,
    normalize_value,
)

_MAC = re.compile(r"^(?:[0-9A-Fa-f]{2}[:-]){5}[0-9A-Fa-f]{2}$")


def naive_scan(fanged: str) -> dict:
    iocs = {}
    for cls, rx in COMPILED_IOC_PATTERNS:
        iocs[cls] = _dedup_keep_order(
            [normalize_value(cls, m) for m in rx.findall(fanged)]
        )
    if iocs.get("xmpp_addresses"):
        xm = set(iocs["xmpp_addresses"])
        iocs["email_addresses"] = [v for v in iocs["email_addresses"] if v not in xm]
    iocs["ipv6s"] = [v for v in iocs["ipv6s"] if not _MAC.match(v)]
    return iocs


SNIPPETS = [
    "imphash: d41d8cd98f00b204e9800998ecf8427e",
    "IMPHASH=d41d8cd98f00b204e9800998ecf8427e",
    "ip 10.0.0.0/24. then 10.1.2.3. done",
    "bad mask 10.0.0.0/99 here",
    "jabber id a@b.jabber.org and email x@y.example.com",
    "Mozilla/5.0 (Windows NT 10.0) AppleWebKit/537.36",
    "HKEY_CURRENT_USER\\Run\\x and C:\\tmp\\a.dll",
    "ssdeep 3:AXGBicFlgVNhBGcL6wCrFQEv:AXGHsNhxLsr2C",
    "hex run aabbccddeeff00112233445566778899aabbccddeeff0011",  # 48 hex: no class
    "2001:db8::1 vs 00:11:22:33:44:55",
    "CVE-2021-44228 and cve-2017-0144",
]


class TestScanPlanEquivalence:
    def test_snippets(self):
        for s in SNIPPETS:
            assert find_iocs_doc(s) == naive_scan(s), s

    def test_corpus_docs(self):
        for i in range(60):
            rows = sorted(gen_conversation(i), key=lambda r: r["turn_idx"])
            fanged = fang_text("\n".join(r["text"] for r in rows))
            assert find_iocs_doc(fanged) == naive_scan(fanged)

    @settings(max_examples=150, deadline=None)
    @given(
        st.text(
            alphabet="0123456789abcdefABCDEF.:/- @\\\nxyzXYZ",
            min_size=0,
            max_size=120,
        )
    )
    def test_random_adversarial_text(self, text):
        assert find_iocs_doc(text) == naive_scan(text)


class TestCidrRegressions:
    """Review finding: shared trailing lookahead dropped CIDRs like
    '1.2.3.4/24.5' that the per-class pattern accepts."""

    def test_cidr_followed_by_dot_digit(self):
        got = find_iocs_doc("ip 1.2.3.4/24.5 end")
        assert got["ipv4_cidrs"] == ["1.2.3.4/24"] == naive_scan("ip 1.2.3.4/24.5 end")["ipv4_cidrs"]
        assert got["ipv4s"] == []

    def test_cidr_double_mask(self):
        t = "range 10.0.0.0/8/24 end"
        assert find_iocs_doc(t) == naive_scan(t)
        assert find_iocs_doc(t)["ipv4_cidrs"] == ["10.0.0.0/8"]
