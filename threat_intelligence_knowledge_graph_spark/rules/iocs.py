"""Pinned IOC regex library + defang/refang rules.

The reference delegates IOC detection to ``find_iocs`` /``prepare_text``
from its STIXnet submodule (reference ner_extractor.py:31,447,455), which
is an *empty, un-cloned* submodule in the repo. The operator contract is
therefore derived from the call sites: the consumed IOC-class keys
(reference stix_mappings.py:32-60) and the public ioc-finder package's
documented behavior. This module pins a self-contained regex per class;
both the oracle and the Spark kernel import exactly these, so triple
parity is defined against this pinned library (documented deviation:
SURVEY.md §2.8).

All regexes are also kept RE2-compatible where they back SQL-expressible
queries (no backreferences), so the same pattern strings run under Spark
``regexp_extract_all`` and the DuckDB oracle.
"""

from __future__ import annotations

import re

try:  # The third-party `regex` module (PyPI "regex") is a drop-in
    # re-compatible engine with far better literal/charclass prefix
    # scanning for most of our IOC patterns (measured per-class below).
    # It is optional: absent, everything compiles under stdlib `re`.
    import regex as _rx
except ImportError:  # pragma: no cover - regex is baked into this env
    _rx = re

# ---------------------------------------------------------------------------
# Refang ("fanging") rules — reference ner_extractor.py:447 prepare_text.
# Applied before IOC detection only; relation/location extraction runs on the
# RAW text (reference ner_extractor.py:532,629 pass `text`, not the fanged
# form) — that asymmetry is part of the contract.
# ---------------------------------------------------------------------------
FANG_RULES: list[tuple[str, str]] = [
    (r"(?i)hxxp", "http"),
    (r"(?i)fxp", "ftp"),
    (r"\[\.\]|\(\.\)|\[dot\]|\(dot\)", "."),
    (r"\[:\]", ":"),
    (r"\[@\]|\[at\]|\(at\)", "@"),
    (r"\[/\]", "/"),
]

_FANG_COMPILED = [(re.compile(p), r) for p, r in FANG_RULES]

# Single-pass equivalent of applying FANG_RULES sequentially: the rules'
# match sets are pairwise non-overlapping and no replacement text can
# create a match for a later rule ("http"/"ftp"/"."/":"/"@"/"/" match
# nothing above), so one alternation scan produces the same output as six
# sequential sub() passes (asserted by the parity suite + a dedicated
# equivalence test). Note [dot]/[at] are case-SENSITIVE in the rules;
# only hxxp/fxp are case-insensitive.
_FANG_ONE = _rx.compile(
    r"(?i:hxxp)|(?i:fxp)|\[\.\]|\(\.\)|\[dot\]|\(dot\)|\[:\]|\[@\]|\[at\]|\(at\)|\[/\]"
)
_FANG_EXACT = {
    "[.]": ".", "(.)": ".", "[dot]": ".", "(dot)": ".",
    "[:]": ":", "[@]": "@", "[at]": "@", "(at)": "@", "[/]": "/",
}


def _fang_repl(m: re.Match) -> str:
    t = m.group(0)
    exact = _FANG_EXACT.get(t)
    if exact is not None:
        return exact
    tl = t.lower()
    if tl == "hxxp":
        return "http"
    if tl == "fxp":
        return "ftp"
    return t  # unreachable: every alternative is covered above


def fang_text(text: str) -> str:
    """Refang defanged IOCs (``hxxp``→``http``, ``[.]``→``.`` …)."""
    return _FANG_ONE.sub(_fang_repl, text)


# ---------------------------------------------------------------------------
# Per-class regexes. Class keys match the reference's consumed ioc-finder
# keys (reference stix_mappings.py:32-60). Order is the pinned iteration
# order (reference iterates `iocs.items()` — dict literal order — at
# ner_extractor.py:458,611); entity order feeds order-sensitive relation
# selection, so this list order is part of the contract.
# ---------------------------------------------------------------------------

_OCT = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
IPV4_CORE = rf"(?:{_OCT}\.){{3}}{_OCT}"

# TLD allowlist (ioc-finder validates against the real TLD list; we pin a
# fixed, useful subset — deterministic, offline).
_TLDS = (
    "com|net|org|io|ru|cn|info|biz|gov|edu|mil|co|uk|de|fr|onion|xyz|top|"
    "site|online|tech|me|us|eu|in|jp|br|au|ca|ch|nl|se|no|es|it|pl|ir|kr|ua"
)
DOMAIN_CORE = rf"(?:[A-Za-z0-9](?:[A-Za-z0-9-]{{0,61}}[A-Za-z0-9])?\.)+(?:{_TLDS})"

# (class, pattern, flags) — pattern group 0 (or group 1 if present) is the value.
IOC_PATTERNS: list[tuple[str, str]] = [
    ("domains", rf"(?<![A-Za-z0-9.-])({DOMAIN_CORE})(?![A-Za-z0-9-])"),
    # ipv4: reject continuations of a dotted/numeric run and CIDR masks,
    # but allow a sentence-final period ("… to 10.1.2.3.").
    ("ipv4s", rf"(?<![\d.])({IPV4_CORE})(?!\d)(?!\.\d)(?!/\d)"),
    (
        "ipv6s",
        r"(?<![:.\w])((?:[A-Fa-f0-9]{1,4}:){2,7}:?[A-Fa-f0-9]{1,4})(?![:.\w])",
    ),
    ("urls", r"\b((?:https?|ftp|sftp)://[^\s'\"<>\])]+)"),
    ("email_addresses", r"\b([A-Za-z0-9._%+-]+@(?:[A-Za-z0-9-]+\.)+[A-Za-z]{2,})\b"),
    ("md5s", r"(?<![A-Fa-f0-9])([A-Fa-f0-9]{32})(?![A-Fa-f0-9])"),
    ("sha1s", r"(?<![A-Fa-f0-9])([A-Fa-f0-9]{40})(?![A-Fa-f0-9])"),
    ("sha256s", r"(?<![A-Fa-f0-9])([A-Fa-f0-9]{64})(?![A-Fa-f0-9])"),
    ("sha512s", r"(?<![A-Fa-f0-9])([A-Fa-f0-9]{128})(?![A-Fa-f0-9])"),
    ("ssdeeps", r"\b(\d+:[A-Za-z0-9/+]{3,}:[A-Za-z0-9/+]{3,})\b"),
    ("imphashes", r"(?i)imphash[:=\s]+([a-f0-9]{32})"),
    ("authentihashes", r"(?i)authentihash[:=\s]+([a-f0-9]{64})"),
    ("cves", r"(?i)\b(CVE-\d{4}-\d{4,7})\b"),
    ("file_paths", r"([A-Za-z]:\\(?:[^\\/:*?\"'<>|\r\n ]+\\)*[^\\/:*?\"'<>|\r\n ]+)"),
    (
        "registry_key_paths",
        r"\b((?:HKEY_LOCAL_MACHINE|HKLM|HKEY_CURRENT_USER|HKCU|HKEY_CLASSES_ROOT"
        r"|HKCR|HKEY_USERS|HKU|HKEY_CURRENT_CONFIG)\\[^\s\"']+)",
    ),
    ("asns", r"\b(?:AS|ASN)\s?(\d{1,10})\b"),
    ("bitcoin_addresses", r"\b([13][a-km-zA-HJ-NP-Z1-9]{25,34}|bc1[a-z0-9]{20,})\b"),
    ("monero_addresses", r"\b(4[0-9AB][1-9A-HJ-NP-Za-km-z]{93})\b"),
    ("mac_addresses", r"\b((?:[0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}|(?:[0-9A-Fa-f]{2}-){5}[0-9A-Fa-f]{2})\b"),
    ("ipv4_cidrs", rf"(?<![\d.])({IPV4_CORE}/(?:3[0-2]|[12]?\d))(?!\d)"),
    ("xmpp_addresses", r"\b([A-Za-z0-9._%+-]+@(?:[A-Za-z0-9-]+\.)*(?:jabber|xmpp)\.[A-Za-z]{2,})\b"),
    (
        "user_agents",
        r"(Mozilla/\d\.0 \([^)\n]{0,160}\)[ A-Za-z0-9/.;,:+()_-]{0,160})",
    ),
    ("credit_cards", r"\b((?:4\d{3}|5[1-5]\d{2}|3[47]\d{2}|6011)(?:[ -]?\d{4}){3})\b"),
]

IOC_CLASS_ORDER: list[str] = [c for c, _ in IOC_PATTERNS]

# Engine choice per class. The PATTERN STRINGS above are the contract
# (shared with the DuckDB oracle); only the scanning engine differs, and
# engines are interchangeable for these patterns — asserted by
# tests/test_ioc_engines.py (findall equality, parity corpus + fuzz).
# Membership below = `regex` beat stdlib `re` on the kernel microbench
# (it wins wherever a literal/charclass prefix lets it skip; `re` wins
# on `domains`/`email` whose prefix classes are too dense to skip).
_REGEX_ENGINE_CLASSES = {
    "ipv6s", "urls", "ssdeeps", "imphashes", "authentihashes", "cves",
    "file_paths", "registry_key_paths", "asns", "bitcoin_addresses",
    "monero_addresses", "ipv4_cidrs", "credit_cards", "user_agents",
}

COMPILED_IOC_PATTERNS: list[tuple[str, re.Pattern]] = [
    (c, (_rx if c in _REGEX_ENGINE_CLASSES else re).compile(p))
    for c, p in IOC_PATTERNS
]

_MAC_FULL = re.compile(r"^(?:[0-9A-Fa-f]{2}[:-]){5}[0-9A-Fa-f]{2}$")

# ---------------------------------------------------------------------------
# Fast-path scan plan (semantics identical to scanning IOC_PATTERNS
# one-by-one; asserted by tests/test_kernel.py + the parity suite):
# - one hex-run scan classifies md5/sha1/sha256/sha512 by length,
#   replacing four full-text scans;
# - one ipv4-or-cidr scan classifies by mask presence, replacing two;
# - rare classes are gated by a cheap substring test before their regex.
# ---------------------------------------------------------------------------

_HEX_RUN = re.compile(r"(?<![A-Fa-f0-9])([A-Fa-f0-9]{32,128})(?![A-Fa-f0-9])")
_HEX_LEN_TO_CLASS = {32: "md5s", 40: "sha1s", 64: "sha256s", 128: "sha512s"}
_HASH_CLASSES = set(_HEX_LEN_TO_CLASS.values())

# Branch-specific lookaheads must mirror each per-class pattern exactly:
# the cidr branch only forbids a digit continuation; the ipv4 branch also
# forbids '.d' and '/d' continuations. A shared trailing lookahead would
# reject CIDRs like '1.2.3.4/24.5' that the per-class pattern accepts.
# Compiled under the `regex` engine (~5× on the microbench, identical
# pattern string; equality asserted by tests/test_ioc_engines.py).
_IPV4_OR_CIDR = _rx.compile(
    rf"(?<![\d.])({IPV4_CORE})"
    rf"(?:(/(?:3[0-2]|[12]?\d))(?!\d)|(?!\d)(?!\.\d)(?!/\d))"
)

# MAC fast path: the per-class alternation `(hh:){5}hh|(hh-){5}hh` scans
# both branches at every hex position; the backreference form tries one
# branch and pins the separator — ~2× faster under stdlib `re`, same
# match set (uniform-separator 6-groups either way; fuzz-asserted by
# tests/test_ioc_engines.py). Backrefs are Python-side only — the
# RE2-compatible contract string in IOC_PATTERNS is what SQL oracles use.
_MAC_FAST = re.compile(r"\b([0-9A-Fa-f]{2}([:-])(?:[0-9A-Fa-f]{2}\2){4}[0-9A-Fa-f]{2})\b")

# r5 separator-anchored MAC scan (a further ~2× over _MAC_FAST on the
# kernel microbench): a MAC's first separator sits exactly 2 chars
# after the match start, so only `[:-]` positions (memchr-speed bare
# class scan, ~25/doc on the bench corpus) are candidate anchors —
# probe each sep at p with start s = p-2: two O(1) hex-set lookups plus
# a \b check, then ONE anchored match of the backref form. Equivalence:
# every _MAC_FAST match is produced (its first sep is visited, earlier
# seps can't anchor a different overlapping match because the barrier
# only skips seps inside an ALREADY-ACCEPTED match, mirroring findall's
# continue-after-match), and nothing extra is (the anchored pattern IS
# the contract pattern with \b replaced by the preceding-char check).
# A C-side candidate-narrowing seed scan (`(?<!hex)[hex]{2}(?=[:-])`)
# was tried and LOST — the dense lookbehind re-evaluates per position,
# costing as much as the original scan. Fuzz+corpus equality asserted
# by tests/test_ioc_engines.py.
_SEP_HIT = re.compile(r"[:-]")
_MAC_AT = re.compile(
    r"([0-9A-Fa-f]{2}([:-])(?:[0-9A-Fa-f]{2}\2){4}[0-9A-Fa-f]{2})\b"
)
_HEX_CHARS = frozenset("0123456789abcdefABCDEF")
# `\b` twin for the manual fast paths (MAC, email): Python's \b is
# UNICODE — 'é' or '²' are word chars — so an ASCII-set test alone
# silently diverges from the contract pattern on non-ASCII neighbors
# (r5 review catch, byte-equality fuzz now draws non-ASCII too). The
# ASCII set answers the common case in O(1); anything non-ASCII defers
# to the regex engine's own \w, exact by construction.
_WB_RX = re.compile(r"\w")


def _is_word_char(ch: str) -> bool:
    if ch in _WORD_CHARS:
        return True
    if ord(ch) < 128:
        return False
    return _WB_RX.match(ch) is not None


def _find_macs(text: str) -> list[str]:
    out: list[str] = []
    barrier = 0
    for m in _SEP_HIT.finditer(text):
        s = m.start() - 2
        if s < barrier or s < 0:
            continue
        if text[s] not in _HEX_CHARS or text[s + 1] not in _HEX_CHARS:
            continue
        # text[s] is hex (a word char), so \b at s ⟺ prev not \w.
        if s > 0 and _is_word_char(text[s - 1]):
            continue
        mm = _MAC_AT.match(text, s)
        if mm:
            out.append(mm.group(1))
            barrier = mm.end()
    return out

# Domains fast path (~2.5× on the kernel microbench): the per-class scan
# re-evaluates the dense lookbehind at every text position; instead,
# locate '.<tld>' suffix hits (a literal-dot skip scan), walk back to
# the hit's [A-Za-z0-9.-] run start — the ONLY position where the
# lookbehind can hold — and anchor-match the contract pattern there,
# once per run. Equivalence: a domain match must start at a run start
# (the lookbehind rejects any in-run predecessor), at most one match
# fits per run (any later start is again in-run), and the anchored
# match at the run start is the scanning match at that position. The
# backward walk is barriered at the previous hit (same-run hits reuse
# the discovered start), keeping the whole pass linear even on
# adversarial '.com.com.…' runs. Fuzz+corpus equality with the contract
# pattern is asserted by tests/test_ioc_engines.py.
_TLD_HIT = re.compile(rf"\.(?:{_TLDS})(?![A-Za-z0-9-])")
_DOMAIN_AT = re.compile(rf"({DOMAIN_CORE})(?![A-Za-z0-9-])")
_RUN_CHARS = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789.-"
)


def _find_domains(text: str) -> list[str]:
    out: list[str] = []
    prev_j = -1
    prev_end = 0
    for m in _TLD_HIT.finditer(text):
        j = m.start()
        while j > 0 and text[j - 1] in _RUN_CHARS:
            if j <= prev_end:
                # still inside the previous hit's run — same run start
                j = prev_j
                break
            j -= 1
        if j == prev_j:
            prev_end = m.end()
            continue
        prev_j, prev_end = j, m.end()
        dm = _DOMAIN_AT.match(text, j)
        if dm:
            out.append(dm.group(1))
    return out


# Email fast path (~15× on the kernel microbench): the contract scan
# re-tries `\b[local]+@` at every text position; instead, locate each
# '@' (C-speed str.find), walk back over the local-part charclass to
# the run start, then forward to the FIRST position where `\b` holds
# and anchor-match the contract there. Equivalence: a match's local
# part is a contiguous run of local chars ending at its '@', so the
# scanning engine's leftmost start is exactly the leftmost \b-holding
# position in that run; match success from any such position depends
# only on the domain side (local chars are all in-class by
# construction), so the first \b position decides for the whole run.
# Runs cannot span '@' ('@' is not a local char), so the per-'@'
# walk-back keeps the whole pass linear. Fuzz+corpus byte-equality with
# the contract pattern is asserted by tests/test_ioc_engines.py.
_EMAIL_AT = re.compile(r"[A-Za-z0-9._%+-]+@(?:[A-Za-z0-9-]+\.)+[A-Za-z]{2,}\b")
_LOCAL_CHARS = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789._%+-"
)
_WORD_CHARS = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789_"
)


def _find_emails(text: str) -> list[str]:
    out: list[str] = []
    last_end = 0
    idx = text.find("@")
    while idx != -1:
        if idx >= last_end:
            j = idx
            while j > last_end and text[j - 1] in _LOCAL_CHARS:
                j -= 1
            p = j
            while p < idx:
                # text[p] is ASCII (a _LOCAL_CHARS member), so the
                # in-set test is exact for it; the PRECEDING char can
                # be non-ASCII, where \b is Unicode — _is_word_char
                # defers those to the regex engine (r5 review catch,
                # same divergence as the MAC path).
                prev_word = p > 0 and _is_word_char(text[p - 1])
                if (text[p] in _WORD_CHARS) != prev_word:  # \b holds at p
                    m = _EMAIL_AT.match(text, p)
                    if m:
                        out.append(m.group(0))
                        last_end = m.end()
                    break
                p += 1
        idx = text.find("@", idx + 1)
    return out


# Regex prescan gates: classes whose substring gate is useless (':' is
# everywhere) but whose pattern implies a rarer REGEX-findable shape.
# The gate pattern is a necessary condition of the contract pattern
# (every match contains a gate match), checked with one skip-friendly
# search; docs without it (the overwhelming majority) skip the full
# findall. ssdeep: every match contains ':<base64ish>{3,}:'.
_RX_GATES: dict[str, re.Pattern] = {
    "ssdeeps": re.compile(r":[A-Za-z0-9/+]{3,}:"),
}

# Hash fast path: maximal hex runs via a bare greedy class scan (no
# lookarounds — ~1.8× on the microbench), then a length filter. A
# maximal run is exactly what the lookaround form matches (the
# lookbehind/lookahead only enforce maximality), and runs over 128 are
# rejected by both (every ≤128 window of a longer run has a hex
# neighbor). Equality asserted by tests/test_ioc_engines.py.
_HEX_RUN_SIMPLE = re.compile(r"[A-Fa-f0-9]{32,}")

# class → substring that must be present for the regex to possibly match.
# Gate literals mirror the regex's case sensitivity exactly.
_CLASS_GATES: dict[str, tuple[str, ...]] = {
    "registry_key_paths": ("HK",),       # all alternatives start HK…
    "file_paths": (":\\",),
    "ssdeeps": (":",),
    "xmpp_addresses": ("jabber", "xmpp"),  # lowercase literals in regex
    "urls": ("://",),
    "user_agents": ("Mozilla/",),
    "email_addresses": ("@",),           # regex requires a literal '@'
}
# gates checked against text.lower() — for (?i) regexes.
_CLASS_GATES_LOWER: dict[str, tuple[str, ...]] = {
    "imphashes": ("imphash",),
    "authentihashes": ("authentihash",),
}


def normalize_value(ioc_class: str, value: str) -> str:
    """Per-class value normalization (pinned; mirrors ioc-finder defaults:
    domains/emails lowercased, CVEs uppercased, ASNs ``ASN<digits>``,
    URLs stripped of trailing punctuation)."""
    if ioc_class in ("domains", "email_addresses", "xmpp_addresses"):
        return value.lower()
    if ioc_class == "cves":
        return value.upper()
    if ioc_class == "asns":
        return f"ASN{value}"
    if ioc_class == "urls":
        return value.rstrip(".,;:!?'\"")
    if ioc_class == "user_agents":
        return value.rstrip(" .,;")
    return value


def _dedup_keep_order(values: list[str]) -> list[str]:
    seen: set[str] = set()
    out: list[str] = []
    for v in values:
        if v not in seen:
            seen.add(v)
            out.append(v)
    return out


def find_iocs_doc(fanged_text: str) -> dict[str, list[str]]:
    """Single-document IOC sweep over *fanged* text → ordered dict of
    unique values per class (contract of reference ner_extractor.py:455).

    Cross-class post-filters (pinned):
    - ipv4s inside CIDRs are excluded (negative lookahead on ``/d``);
    - xmpp addresses are removed from ``email_addresses``;
    - MAC-shaped matches are removed from ``ipv6s``.
    """
    # Fused scans (see scan-plan comment above).
    hex_hits: dict[str, list[str]] = {c: [] for c in _HEX_LEN_TO_CLASS.values()}
    for run in _HEX_RUN_SIMPLE.findall(fanged_text):
        cls = _HEX_LEN_TO_CLASS.get(len(run)) if len(run) <= 128 else None
        if cls:
            hex_hits[cls].append(run)
    ip_hits: dict[str, list[str]] = {"ipv4s": [], "ipv4_cidrs": []}
    for core, mask in _IPV4_OR_CIDR.findall(fanged_text):
        if mask:
            ip_hits["ipv4_cidrs"].append(core + mask)
        else:
            ip_hits["ipv4s"].append(core)

    lower_text = fanged_text.lower()
    iocs: dict[str, list[str]] = {}
    for cls, rx in COMPILED_IOC_PATTERNS:
        if cls in _HASH_CLASSES:
            vals = hex_hits[cls]
        elif cls in ip_hits:
            vals = ip_hits[cls]
        elif cls == "mac_addresses":
            vals = _find_macs(fanged_text)
        elif cls == "domains":
            vals = _find_domains(fanged_text)
        elif cls == "email_addresses":
            vals = _find_emails(fanged_text)
        else:
            gates = _CLASS_GATES.get(cls)
            if gates and not any(g in fanged_text for g in gates):
                iocs[cls] = []
                continue
            lgates = _CLASS_GATES_LOWER.get(cls)
            if lgates and not any(g in lower_text for g in lgates):
                iocs[cls] = []
                continue
            rgate = _RX_GATES.get(cls)
            if rgate and rgate.search(fanged_text) is None:
                iocs[cls] = []
                continue
            vals = rx.findall(fanged_text)
        iocs[cls] = _dedup_keep_order([normalize_value(cls, m) for m in vals])
    if iocs.get("xmpp_addresses"):
        xmpp = set(iocs["xmpp_addresses"])
        iocs["email_addresses"] = [v for v in iocs["email_addresses"] if v not in xmpp]
    if iocs.get("ipv6s"):
        iocs["ipv6s"] = [v for v in iocs["ipv6s"] if not _MAC_FULL.match(v)]
    return iocs
