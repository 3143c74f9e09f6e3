"""Entity-type dictionaries (public STIX 2.1 vocabulary, arranged per the
reference's behavior — cited per table).

These are *broadcast dimension tables* in the Spark pipeline: every one is
well under 10^3 rows, so joins against them must always be broadcast-hash
joins (never shuffle), mirroring the reference's in-memory dict lookups
(reference ner_extractor.py:464, stix_relation_extractor.py:162).
"""

# ioc-finder class key → node type (reference stix_mappings.py:32-60).
IOC_TO_ENTITY_TYPE: dict[str, str] = {
    "domains": "Domain",
    "ipv4s": "IPv4",
    "ipv6s": "IPv6",
    "urls": "URL",
    "email_addresses": "EmailAddress",
    "email_addresses_complete": "EmailAddress",
    "md5s": "Hash",
    "sha1s": "Hash",
    "sha256s": "Hash",
    "sha512s": "Hash",
    "ssdeeps": "Hash",
    "imphashes": "Hash",
    "authentihashes": "Hash",
    "cves": "Vulnerability",
    "file_paths": "FilePath",
    "registry_key_paths": "RegistryKey",
    "asns": "ASN",
    "bitcoin_addresses": "CryptocurrencyAddress",
    "monero_addresses": "CryptocurrencyAddress",
    "mac_addresses": "MACAddress",
    "ipv4_cidrs": "CIDR",
    "xmpp_addresses": "XMPPAddress",
    "user_agents": "UserAgent",
    "credit_cards": "CreditCard",
    "nationality": "Location",
    "attack_tactic": "ATT&CK_Tactic",
    "attack_technique": "ATT&CK_Technique",
}

# node type → STIX 2.1 object type (reference stix_mappings.py:6-26).
STIX_TYPE_MAPPING: dict[str, str] = {
    "Domain": "domain-name",
    "URL": "url",
    "IPv4": "ipv4-addr",
    "IPv6": "ipv6-addr",
    "EmailAddress": "email-addr",
    "Hash": "file",
    "Vulnerability": "vulnerability",
    "FilePath": "file",
    "RegistryKey": "windows-registry-key",
    "ASN": "autonomous-system",
    "CryptocurrencyAddress": "cryptocurrency-wallet",
    "MACAddress": "mac-addr",
    "CIDR": "ipv4-addr",
    "XMPPAddress": "user-account",
    "UserAgent": "user-agent",
    "CreditCard": "payment-card",
    "Location": "location",
    "ATT&CK_Tactic": "attack-pattern",
    "ATT&CK_Technique": "attack-pattern",
}

# STIX 2.1 default allowlists (reference config.py:69-96). The NER path runs
# with wildcard allowlists (reference main.py:406-414) — pinned default here.
DEFAULT_ALLOWED_NODES: list[str] = ["*"]
DEFAULT_ALLOWED_RELATIONSHIPS: list[str] = ["*"]

STIX21_NODE_LABELS: list[str] = [
    "threat-actor", "intrusion-set", "campaign", "identity", "malware",
    "tool", "attack-pattern", "course-of-action", "vulnerability",
    "indicator", "observed-data", "location", "infrastructure",
]

STIX21_RELATIONSHIPS: list[str] = [
    "uses", "targets", "attributed-to", "mitigates", "indicates",
    "located-at", "compromises", "delivers", "related-to",
]

# MITRE ATT&CK tactic codes/names (reference stix_mappings.py:102-114);
# carried for the (disabled-by-default) tactic-tagger slot.
CODE_TACTICS = [
    "TA0043", "TA0042", "TA0001", "TA0002", "TA0003", "TA0004",
    "TA0005", "TA0006", "TA0007", "TA0008", "TA0009", "TA0011",
    "TA0010", "TA0040",
]
NAME_TACTICS = [
    "Reconnaissance", "Resource Development", "Initial Access",
    "Execution", "Persistence", "Privilege Escalation",
    "Defense Evasion", "Credential Access", "Discovery",
    "Lateral Movement", "Collection", "Command and Control",
    "Exfiltration", "Impact",
]
