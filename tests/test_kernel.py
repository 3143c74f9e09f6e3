"""Unit tests for the shared per-document kernel — hand-computed goldens.

These encode the reference's semantics directly (cited per case) so the
kernel is validated against *independent* expectations, not against
itself.
"""

from threat_intelligence_knowledge_graph_spark.kernel.extract import (
    create_node_id,
    extract_document,
    finalize_edges,
    finalize_nodes,
    format_property_key,
    py_title,
    store_label,
    store_rel_type,
)
from threat_intelligence_knowledge_graph_spark.rules.iocs import fang_text, find_iocs_doc


class TestStringRules:
    def test_node_id_sanitization(self):
        # reference ner_extractor.py:159-163
        assert create_node_id("Domain", "evil.example.net") == "domain_evil_example_net"
        assert create_node_id("IPv4", "10.0.0.1") == "ipv4_10_0_0_1"
        assert create_node_id("URL", "https://a.com/x?y=1") == "url_https___a_com_x_y_1"

    def test_py_title_differs_from_initcap(self):
        # Python title() capitalizes after EVERY non-alpha
        # (reference neo4j_store.py:114,132,160) — SURVEY.md §7 hard part 1.
        assert py_title("ipv4_10_0_0_1") == "Ipv4_10_0_0_1"
        assert py_title("vulnerability_cve-2021-44228") == "Vulnerability_Cve-2021-44228"
        assert py_title("domain_evil-1_example_net") == "Domain_Evil-1_Example_Net"

    def test_store_label(self):
        # reference neo4j_store.py:123
        assert store_label("threat-actor") == "Threat_actor"
        assert store_label("IPv4") == "Ipv4"
        assert store_label("ATT&CK_Tactic") == "Att&ck_tactic"

    def test_store_rel_type(self):
        # reference neo4j_store.py:149
        assert store_rel_type("resolves-to") == "RESOLVES_TO"
        assert store_rel_type("COMMUNICATES-WITH") == "COMMUNICATES_WITH"

    def test_format_property_key(self):
        # reference utils/helpers.py:17-37
        assert format_property_key("currency_type") == "currency_type"
        assert format_property_key("hash algorithm") == "hashAlgorithm"
        assert format_property_key("") == ""


class TestFanging:
    def test_refang(self):
        assert fang_text("hxxps://evil[.]example[.]net") == "https://evil.example.net"
        assert fang_text("user[at]mail[.]com") == "user@mail.com"
        assert fang_text("hXXp://a[.]io") == "http://a.io"

    def test_single_pass_equals_sequential_rules(self):
        """fang_text's one-alternation scan must equal applying
        FANG_RULES sequentially (incl. case-sensitivity of [dot]/[at]
        and nested-bracket forms)."""
        from threat_intelligence_knowledge_graph_spark.rules.iocs import (
            _FANG_COMPILED,
        )

        cases = [
            "hxxps://a[.]b(dot)c[/]path[:]8080 u[at]v(at)w fxp://x[.]y",
            "[[dot]] [DOT] (AT) hXXp FXP [.](.)[:][@][/]",
            "no defanging here at all",
            "edge[.][.]cases(.)(.)", "",
            "HxXpS://MiXeD[.]CaSe[At]x",  # [At] is case-sensitive → kept
        ]
        for text in cases:
            seq = text
            for rx, repl in _FANG_COMPILED:
                seq = rx.sub(repl, seq)
            assert fang_text(text) == seq, text


class TestIocSweep:
    def test_basic_classes(self):
        text = (
            "Contact bad@mail.example.com about 10.1.2.3 and 10.0.0.0/24. "
            "Hash d41d8cd98f00b204e9800998ecf8427e and "
            "da39a3ee5e6b4b0d3255bfef95601890afd80709 seen at "
            "https://evil.example.net/x plus CVE-2021-44228 via AS13335 "
            "on 00:11:22:33:44:55 writing C:\\Windows\\Temp\\a.dll and "
            "HKEY_LOCAL_MACHINE\\Software\\Run\\x."
        )
        iocs = find_iocs_doc(text)
        assert iocs["email_addresses"] == ["bad@mail.example.com"]
        assert iocs["ipv4s"] == ["10.1.2.3"]  # CIDR base excluded
        assert iocs["ipv4_cidrs"] == ["10.0.0.0/24"]
        assert iocs["md5s"] == ["d41d8cd98f00b204e9800998ecf8427e"]
        assert iocs["sha1s"] == ["da39a3ee5e6b4b0d3255bfef95601890afd80709"]
        assert iocs["urls"] == ["https://evil.example.net/x"]
        assert "evil.example.net" in iocs["domains"]
        assert "mail.example.com" in iocs["domains"]
        assert iocs["cves"] == ["CVE-2021-44228"]
        assert iocs["asns"] == ["ASN13335"]
        assert iocs["mac_addresses"] == ["00:11:22:33:44:55"]
        assert iocs["file_paths"] == ["C:\\Windows\\Temp\\a.dll"]
        assert iocs["registry_key_paths"] == ["HKEY_LOCAL_MACHINE\\Software\\Run\\x."]

    def test_mac_not_ipv6(self):
        iocs = find_iocs_doc("MAC 00:11:22:33:44:55 but ipv6 2001:db8::1 here")
        assert iocs["mac_addresses"] == ["00:11:22:33:44:55"]
        assert iocs["ipv6s"] == ["2001:db8::1"]

    def test_dedup_keeps_first_order(self):
        iocs = find_iocs_doc("10.0.0.1 then 10.0.0.2 then 10.0.0.1 again")
        assert iocs["ipv4s"] == ["10.0.0.1", "10.0.0.2"]


class TestExtractDocument:
    def test_hash_algorithm_properties(self):
        # reference ner_extractor.py:485-503
        g = extract_document(
            "Hashes d41d8cd98f00b204e9800998ecf8427e and "
            "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855."
        )
        algos = {n[0]: n[2]["algorithm"] for n in g.nodes if n[1] == "Hash"}
        assert algos["hash_d41d8cd98f00b204e9800998ecf8427e"] == "MD5"
        assert (
            algos[
                "hash_e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
            ]
            == "SHA-256"
        )

    def test_cve_property(self):
        g = extract_document("Exploits CVE-2024-1234 today.")
        vuln = [n for n in g.nodes if n[1] == "Vulnerability"][0]
        assert vuln[2] == {"id": "CVE-2024-1234", "value": "CVE-2024-1234"}

    def test_cosentence_relations(self):
        # domain×ipv4 in one sentence → RESOLVES-TO (rule idx 8, lookup hit);
        # hash×ipv4 → special-case communicates-with
        # (reference stix_relation_extractor.py:223-224).
        g = extract_document(
            "The domain evil.example.net resolves to 10.1.1.1 now. "
            "The malware d41d8cd98f00b204e9800998ecf8427e communicates with 10.2.2.2 daily."
        )
        rels = {(e[0], e[2], e[3]) for e in g.edges}
        assert ("domain_evil_example_net", "RESOLVES-TO", "ipv4_10_1_1_1") in rels
        assert (
            "hash_d41d8cd98f00b204e9800998ecf8427e",
            "COMMUNICATES-WITH",
            "ipv4_10_2_2_2",
        ) in rels
        # Reverse direction (ipv4→domain) has no rule and no special case.
        assert ("ipv4_10_1_1_1", "RESOLVES-TO", "domain_evil_example_net") not in rels

    def test_url_contains_domain_via_lookup(self):
        # (url, domain-name) is a LOOKUP HIT (rule idx 9) so every
        # co-sentence url×domain pair gets CONTAINS — host equality is NOT
        # checked on this path (the special case only runs on lookup miss,
        # reference stix_relation_extractor.py:198-221).
        g = extract_document(
            "Saw https://a.example.com/x near domain b.example.net today."
        )
        rels = {(e[0], e[2], e[3]) for e in g.edges}
        assert ("url_https___a_example_com_x", "CONTAINS", "domain_b_example_net") in rels

    def test_defanged_no_sentence_relation(self):
        # IOC sweep runs on fanged text; relation containment runs on RAW
        # text (reference ner_extractor.py:455 vs :629) → defanged values
        # never co-locate. Fallback CONTAINS does fire (works on iocs dict,
        # reference ner_extractor.py:693-726).
        g = extract_document("Beacon to hxxps://bad[.]example[.]com/gate seen.")
        ids = {n[0] for n in g.nodes}
        assert "domain_bad_example_com" in ids
        assert "url_https___bad_example_com_gate" in ids
        rels = {(e[0], e[2], e[3]) for e in g.edges}
        assert ("url_https___bad_example_com_gate", "CONTAINS", "domain_bad_example_com") in rels

    def test_fallback_cross_product_when_no_relations(self):
        # Zero sentence-level relations → domains × ipv4s RESOLVES_TO
        # (reference ner_extractor.py:666-691). Separate sentences so no
        # co-location.
        g = extract_document(
            "Domain one.example.net was registered.\n"
            "Domain two.example.org was registered.\n"
            "Address 10.5.5.5 was scanned."
        )
        rels = {(e[0], e[2], e[3]) for e in g.edges}
        assert ("domain_one_example_net", "RESOLVES_TO", "ipv4_10_5_5_5") in rels
        assert ("domain_two_example_org", "RESOLVES_TO", "ipv4_10_5_5_5") in rels

    def test_no_fallback_when_any_relation_exists(self):
        g = extract_document(
            "The domain a.example.net resolves to 10.1.1.1 now.\n"
            "Domain b.example.org was mentioned separately."
        )
        rels = {(e[0], e[2], e[3]) for e in g.edges}
        assert ("domain_a_example_net", "RESOLVES-TO", "ipv4_10_1_1_1") in rels
        assert ("domain_b_example_org", "RESOLVES_TO", "ipv4_10_1_1_1") not in rels

    def test_location_extraction(self):
        g = extract_document("Attributed to a Russian and Ukrainian operation.")
        locs = {n[0]: n[2] for n in g.nodes if n[1] == "Location"}
        assert locs["location_Russia"]["name"] == "Russia"
        assert locs["location_Ukraine"]["type"] == "nation"

    def test_location_alternation_scan_equals_per_entry_scan(self):
        """The one-pass overlapping alternation scan must equal the
        per-entry `in` scan byte-for-byte (order, dedup, properties) —
        fuzz over nationality fragments so prefix-collision and
        adjacency corners are drawn."""
        import random

        from threat_intelligence_knowledge_graph_spark.kernel.extract import (
            _extract_locations,
        )
        from threat_intelligence_knowledge_graph_spark.kernel.extract import (
            create_node_id,
        )
        from threat_intelligence_knowledge_graph_spark.rules.locations import (
            NATIONALITY_KB,
        )

        def per_entry(raw_text):
            text_lower = raw_text.lower()
            seen, out = set(), []
            for nationality, nation in NATIONALITY_KB:
                if len(nationality) < 4:
                    continue
                if nationality in text_lower:
                    node_id = create_node_id("Location", nation)
                    if node_id in seen:
                        continue
                    seen.add(node_id)
                    out.append(
                        (node_id, "Location", {"name": nation, "type": "nation"})
                    )
            return out

        rng = random.Random(7)
        names = [n for n, _ in NATIONALITY_KB]
        frags = names + [n[: rng.randint(2, len(n))] for n in names] + [
            " ", "x", "RUSSIAN", "Chinese", ""
        ]
        checked_hits = 0
        for _ in range(4000):
            s = "".join(rng.choice(frags) for _ in range(rng.randint(1, 6)))
            got = _extract_locations(s)
            assert got == per_entry(s), s
            checked_hits += len(got)
        assert checked_hits > 1000  # non-vacuous

    def test_empty_doc(self):
        g = extract_document("   ")
        assert g.nodes == [] and g.edges == []

    def test_allowlist_filters(self):
        g = extract_document(
            "The domain evil.example.net resolves to 10.1.1.1 now.",
            allowed_nodes={"Domain"},
            allowed_relationships={"*"},
        )
        assert {n[1] for n in g.nodes} == {"Domain"}
        assert g.edges == []  # IPv4 node filtered → entity absent → no pair

    def test_allowlist_monotonicity(self):
        # Shrinking the allowlist never ADDS triples
        # (reference ner_extractor.py:471-474,657-658).
        text = (
            "The domain evil.example.net resolves to 10.1.1.1 now. "
            "Malware d41d8cd98f00b204e9800998ecf8427e communicates with 10.1.1.1."
        )
        full = {(e[0], e[2], e[3]) for e in extract_document(text).edges}
        small = {
            (e[0], e[2], e[3])
            for e in extract_document(text, allowed_nodes={"Domain", "IPv4"}).edges
        }
        assert small <= full


class TestFinalization:
    def test_node_merge_last_wins_and_name(self):
        g = extract_document(
            "imphash: d41d8cd98f00b204e9800998ecf8427e also raw "
            "d41d8cd98f00b204e9800998ecf8427e in text."
        )
        nodes = finalize_nodes(g)
        hashes = [n for n in nodes if n[0] == "Hash"]
        assert len(hashes) == 1  # MERGE dedup on (label, id)
        label, node_id, props = hashes[0]
        assert node_id == "Hash_D41D8Cd98F00B204E9800998Ecf8427E"
        # The length-32 check precedes the imphash class check in the
        # reference (ner_extractor.py:488), so even the imphashes-class
        # mention is labeled MD5 — last-write is the same value.
        assert props["algorithm"] == "MD5"
        assert props["name"] == node_id  # neo4j_store.py:114

    def test_edge_dedup(self):
        g = extract_document(
            "evil.example.net resolves to 10.1.1.1. "
            "Again evil.example.net resolves to 10.1.1.1."
        )
        edges = finalize_edges(g)
        keys = [(e[1], e[2], e[4]) for e in edges]
        assert len(keys) == len(set(keys))


class TestSentenceSplitterSeam:
    def test_punkt_optin_falls_back_without_nltk(self, monkeypatch):
        """TIKG_SENTENCE_SPLITTER=punkt with nltk absent must degrade to
        the pinned regex (the reference's own fallback path)."""
        import threat_intelligence_knowledge_graph_spark.kernel.extract as ke

        monkeypatch.setenv("TIKG_SENTENCE_SPLITTER", "punkt")
        monkeypatch.setattr(ke, "_SPLITTER", None)
        got = ke._split_sentences("One sentence. Two sentence. ")
        monkeypatch.setattr(ke, "_SPLITTER", None)  # reset for other tests
        assert got == ke._SENT_RX.split("One sentence. Two sentence. ")

    def test_default_is_pinned_regex(self, monkeypatch):
        import threat_intelligence_knowledge_graph_spark.kernel.extract as ke

        monkeypatch.delenv("TIKG_SENTENCE_SPLITTER", raising=False)
        monkeypatch.setattr(ke, "_SPLITTER", None)
        text = "A uses B! C resolves D? End."
        got = ke._split_sentences(text)
        monkeypatch.setattr(ke, "_SPLITTER", None)
        assert got == ke._SENT_RX.split(text)
