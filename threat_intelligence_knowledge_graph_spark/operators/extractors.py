"""Extractor interface — the polymorphic slot the reference dispatches on.

The reference selects one of four extractors by model string
(reference main.py:358-441): three LLM function-calling extractors
(OpenAI/Claude/Gemini — non-deterministic per-chunk API calls) and the
deterministic NER path. Our engine keeps the same seam as a *batch*
interface: an extractor maps a documents DataFrame to the tagged
EXTRACTION_SCHEMA records; the deterministic NER extractor is the only
productionized implementation (the parity scope), the LLM slot exists,
is typed, and raises until an offline batch-inference backend is wired
in (no per-row external calls — SURVEY.md §2 op 6 drops the rate
limiter by design).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from .chunker import CHUNK_PROFILES, chunk_for_profile
from .extraction import extract_graph_records


class NerExtractor:
    """Deterministic STIXnet-style extractor (the reference's ``--model
    ner`` path, whole-document chunking per main.py:166-172)."""

    chunk_profile = "ner"

    def extract(self, documents: DataFrame) -> DataFrame:
        chunks = chunk_for_profile(documents, self.chunk_profile)
        return extract_graph_records(
            chunks.select("conv_id", chunks.chunk_text.alias("doc_text"))
        )


class LlmExtractor:
    """Slot for the reference's LLM extractors (openai/claude/gemini
    function-calling, reference openai_extractor.py:71-238 et al).

    A Spark-first implementation would batch chunks through an offline
    inference service via ``mapInPandas`` — NOT per-row API calls. No such
    service exists in this environment, so this raises by contract.
    """

    def __init__(self, profile: str):
        if profile not in CHUNK_PROFILES or profile == "ner":
            raise ValueError(f"unknown LLM chunk profile: {profile}")
        self.chunk_profile = profile

    def extract(self, documents: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "LLM extraction requires an offline batch-inference backend; "
            "the deterministic NER extractor is the reproducible parity path"
        )


EXTRACTOR_FACTORY: dict[str, Callable[[], object]] = {
    "ner": NerExtractor,
    "gemini-pro": lambda: LlmExtractor("gemini-pro"),
    "gemini-flash": lambda: LlmExtractor("gemini-flash"),
    "claude-sonnet": lambda: LlmExtractor("claude-sonnet"),
    "claude-haiku": lambda: LlmExtractor("claude-haiku"),
    "default": lambda: LlmExtractor("default"),
}


def make_extractor(model: str):
    """Extractor factory (reference main.py:358-441 if/elif chain)."""
    if model not in EXTRACTOR_FACTORY:
        raise ValueError(
            f"unknown model {model!r}; choose from {sorted(EXTRACTOR_FACTORY)}"
        )
    return EXTRACTOR_FACTORY[model]()


# ---------------------------------------------------------------------------
# rcATT slot (SURVEY.md §2 op 14): the reference returns empty tactic/
# technique lists when model assets are absent (ner_extractor.py:128-135,
# 231-233) — that empty fallback is the parity behavior. This optional
# keyword tagger fills the design slot for users who want coarse ATT&CK
# tactics WITHOUT the un-vendored sklearn models; it is OFF for parity.
# ---------------------------------------------------------------------------

TACTIC_KEYWORDS: dict[str, list[str]] = {
    "TA0001": ["initial access", "phishing", "spearphish", "drive-by"],
    "TA0002": ["execution", "powershell", "command execution"],
    "TA0003": ["persistence", "registry run", "scheduled task", "startup"],
    "TA0004": ["privilege escalation", "escalate"],
    "TA0005": ["defense evasion", "obfuscat", "masquerad"],
    "TA0006": ["credential", "password dump", "keylog"],
    "TA0007": ["discovery", "reconnaissance scan", "enumerat"],
    "TA0008": ["lateral movement", "pass the hash", "remote desktop"],
    "TA0009": ["collection", "screen capture", "clipboard"],
    "TA0010": ["exfiltration", "exfiltrate"],
    "TA0011": ["command and control", "c2 channel", "beacon"],
    "TA0040": ["impact", "ransom", "wiper", "destruct"],
}


def tag_tactics(documents: DataFrame, text_col: str = "doc_text") -> DataFrame:
    """(conv_id, tactic_code) for each keyword-matched tactic — pure
    Catalyst ``contains`` cascade over the broadcast keyword table."""
    from pyspark.sql import functions as F

    low = F.lower(F.col(text_col))
    tactic = F.array(
        *[
            F.when(
                F.greatest(*[low.contains(k).cast("int") for k in kws]) == 1,
                F.lit(code),
            )
            for code, kws in TACTIC_KEYWORDS.items()
        ]
    )
    return documents.select(
        "conv_id",
        F.explode(F.filter(tactic, lambda x: x.isNotNull())).alias("tactic_code"),
    )
