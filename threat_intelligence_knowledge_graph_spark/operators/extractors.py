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

import json
from collections.abc import Callable, Iterator
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame

from ..functions.json_repair import repair_kg_json
from ..kernel.extract import (
    extract_document,
    format_property_key,
    py_title,
    store_label,
    store_rel_type,
)
from ..schemas import EXTRACTION_SCHEMA
from .chunker import CHUNK_PROFILES, chunk_for_profile
from .extraction import extract_graph_records

_EXTRACTION_COLS = [f.name for f in EXTRACTION_SCHEMA.fields]


class NerExtractor:
    """Deterministic STIXnet-style extractor (the reference's ``--model
    ner`` path, whole-document chunking per main.py:166-172)."""

    chunk_profile = "ner"

    def extract(self, documents: DataFrame) -> DataFrame:
        chunks = chunk_for_profile(documents, self.chunk_profile)
        return extract_graph_records(
            chunks.select("conv_id", chunks.chunk_text.alias("doc_text"))
        )


class BatchInferenceBackend(Protocol):
    """An offline batch-inference service: chunk texts in, KnowledgeGraph
    function-call JSON payloads out (one per text, same order). The
    payload shape is the reference's function-call schema (reference
    openai_extractor.py:95-157): ``{"nodes": [{"id","type","properties":
    [{"key","value"}]}], "rels": [{"source":{"id","type"},
    "target":{"id","type"},"type","properties":[...]}]}``.

    Implementations must be picklable — one instance ships to each Spark
    worker and serves whole Arrow batches (never per-row calls; the
    reference's per-chunk rate-limited loop, openai_extractor.py:189-238 +
    its 5-req/min ceiling, is replaced by this batch seam — SURVEY.md §2
    op 6)."""

    def infer(self, texts: list[str]) -> list[str]: ...


class MockKernelBackend:
    """Deterministic stand-in for an LLM service, for tests/CI: emits the
    KnowledgeGraph JSON an ideal LLM would — derived from the
    deterministic kernel — so the full LLM plumbing (chunk dispatch →
    batch inference → JSON repair → record conversion) is exercisable
    end-to-end with an exactly predictable result.

    ``corrupt_every=k`` truncates every k-th payload's final ``}`` —
    a deterministic, losslessly-repairable fault that drives the
    ``repair_kg_json`` path (the reference's repair, helpers.py:109-248).
    """

    def __init__(self, corrupt_every: int = 0):
        self.corrupt_every = corrupt_every

    def infer(self, texts: list[str]) -> list[str]:
        out = []
        for i, text in enumerate(texts):
            graph = extract_document(text)
            payload = json.dumps(
                {
                    "nodes": [
                        {
                            "id": node_id,
                            "type": node_type,
                            "properties": [
                                {"key": k, "value": v} for k, v in props.items()
                            ],
                        }
                        for node_id, node_type, props in graph.nodes
                    ],
                    "rels": [
                        {
                            "source": {"id": src_id, "type": src_t},
                            "target": {"id": dst_id, "type": dst_t},
                            "type": rel,
                        }
                        for src_id, src_t, rel, dst_id, dst_t, _ctx in graph.edges
                    ],
                }
            )
            if self.corrupt_every and i % self.corrupt_every == self.corrupt_every - 1:
                payload = payload[:-1]  # drop final '}' — repair restores it
            out.append(payload)
        return out


def _kg_payload_to_rows(conv_id: str, payload: str) -> list[tuple]:
    """One chunk's JSON payload → stored-form EXTRACTION_SCHEMA rows.

    Mirrors the reference's parse → repair → validate → store path:
    malformed JSON goes through ``repair_kg_json`` (openai_extractor.py:
    189-215); payloads with invalid nodes/rels (empty id/type — the
    pydantic validators, data_models.py:20-36) drop the whole chunk like
    the reference's failed KnowledgeGraph construction does (returns
    None, main.py:306-315); store normalization is neo4j_store.py:109-164
    (title-cased ids, capitalized labels, camelCase property keys).
    """
    try:
        data = json.loads(payload)
    except json.JSONDecodeError:
        data = repair_kg_json(payload)
    if not isinstance(data, dict):
        return []
    rows: list[tuple] = []
    try:
        for node in data.get("nodes") or []:
            node_id, node_type = node["id"], node["type"]
            if not node_id.strip() or not node_type.strip():
                raise ValueError("empty node id/type")
            props = {
                format_property_key(p["key"]): p["value"]
                for p in (node.get("properties") or [])
            }
            stored_id = py_title(node_id)
            props["name"] = stored_id
            rows.append(
                (conv_id, "node", store_label(node_type), stored_id, props,
                 None, None, None, None, None, None)
            )
        for rel in data.get("rels") or []:
            src, dst, rel_type = rel["source"], rel["target"], rel["type"]
            if not rel_type.strip():
                raise ValueError("empty rel type")
            rows.append(
                (conv_id, "edge", None, None, None,
                 store_label(src["type"]), py_title(src["id"]),
                 store_rel_type(rel_type),
                 store_label(dst["type"]), py_title(dst["id"]), "")
            )
    except (KeyError, TypeError, AttributeError, ValueError):
        return []  # invalid graph → whole chunk dropped (reference behavior)
    return rows


# Per-PROCESS pacing state for RateLimitedBackend, keyed by limiter key.
# Backends are re-pickled per Spark task, but the Python worker process
# is reused across tasks — instance state would silently reset on every
# task and never pace anything; this module-level map survives.
_RATE_LIMIT_LAST_CALL: dict[str, float] = {}


class RateLimitedBackend:
    """Min-interval rate limiting for a ``BatchInferenceBackend``
    (SURVEY.md §2 op 6; reference main.py:259-281 enforces a 13 s
    min-interval — 5 RPM + buffer — before each Gemini/Claude call).

    The reference paces per chunk inside its serial loop; here the
    pacing unit is the Spark WORKER PROCESS: last-call state lives in a
    module-level map (keyed by ``key``) so it survives task-boundary
    re-pickling — each reused worker paces all its batch calls across
    tasks. Cross-worker concurrency is NOT throttled here (N workers ⇒
    up to N in-flight calls); a global budget needs a service-side
    limiter or ``spark.executor.cores``-level sizing — documented, not
    hidden. The clock is injectable so tests never sleep.
    """

    def __init__(self, inner: BatchInferenceBackend, min_interval_sec: float = 13.0,
                 key: str = "default", clock=None, sleeper=None):
        import time as _time

        self.inner = inner
        self.min_interval_sec = min_interval_sec
        self.key = key
        self._clock = clock or _time.time
        self._sleep = sleeper or _time.sleep

    def infer(self, texts: list[str]) -> list[str]:
        last = _RATE_LIMIT_LAST_CALL.get(self.key)
        if last is not None:
            elapsed = self._clock() - last
            if elapsed < self.min_interval_sec:
                self._sleep(self.min_interval_sec - elapsed)
        # record BEFORE the call, like the reference (main.py:269,280)
        _RATE_LIMIT_LAST_CALL[self.key] = self._clock()
        return self.inner.infer(texts)

    def __getstate__(self):
        # injected clock/sleeper may be unpicklable; workers re-init with
        # real time functions (pacing state is process-global, not here).
        return {
            "inner": self.inner,
            "min_interval_sec": self.min_interval_sec,
            "key": self.key,
        }

    def __setstate__(self, state):
        self.__init__(state["inner"], state["min_interval_sec"], state["key"])


class LlmExtractor:
    """The reference's LLM extractor seam (openai/claude/gemini
    function-calling, reference openai_extractor.py:71-238 et al),
    re-expressed Spark-first: chunk dispatch per model profile →
    Arrow-batched calls into a pluggable ``BatchInferenceBackend`` →
    JSON repair → stored-form EXTRACTION_SCHEMA records.

    No real inference service exists in this environment; constructing
    without a backend keeps the round-1 contract (raises on use). The
    deterministic NER extractor remains the parity path.
    """

    def __init__(self, profile: str, backend: BatchInferenceBackend | None = None):
        if profile not in CHUNK_PROFILES or profile == "ner":
            raise ValueError(f"unknown LLM chunk profile: {profile}")
        self.chunk_profile = profile
        self.backend = backend

    def extract(self, documents: DataFrame, num_partitions: int | None = None) -> DataFrame:
        if self.backend is None:
            raise NotImplementedError(
                "LLM extraction requires an offline batch-inference backend; "
                "the deterministic NER extractor is the reproducible parity path"
            )
        backend = self.backend
        chunks = chunk_for_profile(documents, self.chunk_profile)

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                payloads = backend.infer(pdf["chunk_text"].tolist())
                rows: list[tuple] = []
                for conv_id, payload in zip(pdf["conv_id"].values, payloads):
                    rows.extend(_kg_payload_to_rows(conv_id, payload))
                yield pd.DataFrame(rows, columns=_EXTRACTION_COLS)

        n = (
            num_partitions
            or documents.sparkSession.sparkContext.defaultParallelism * 2
        )
        return (
            chunks.select("conv_id", "chunk_text")
            .repartition(n, "conv_id")
            .mapInPandas(kernel, schema=EXTRACTION_SCHEMA)
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
