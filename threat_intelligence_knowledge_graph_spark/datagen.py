"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Shape is exactly BASELINE.json's ``input_hint``:
``(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp)``. Text templates embed known IOC surface forms and relation
cue sentences so golden triples are computable by construction; ~5% of
conversations are "hot" (10× turns) to exercise skew salting, and a few
hot CVEs/domains repeat across many conversations to skew the triple
aggregation.

Generation is seeded *per conversation index*, so the corpus is identical
whether generated on the driver (tests) or distributed on executors
(bench) — partitioning cannot change the data.
"""

from __future__ import annotations

import datetime as _dt
import random
from collections.abc import Iterator

import pandas as pd

ROLES = ["user", "assistant", "tool"]
TOOLS = ["web_search", "sandbox", None]

_BASE_TS = _dt.datetime(2025, 1, 1, 0, 0, 0)

# Hot entities repeated across many conversations (skew drivers).
HOT_CVES = ["CVE-2021-44228", "CVE-2017-0144", "CVE-2023-23397"]
HOT_DOMAINS = ["evil-hub.example.net", "c2-master.example.com"]

_MD5_HEX = "0123456789abcdef"


def _md5_like(rng: random.Random) -> str:
    return "".join(rng.choice(_MD5_HEX) for _ in range(32))


def _sha256_like(rng: random.Random) -> str:
    return "".join(rng.choice(_MD5_HEX) for _ in range(64))


def _ip(rng: random.Random) -> str:
    return f"10.{rng.randint(0, 250)}.{rng.randint(0, 250)}.{rng.randint(1, 250)}"


def _domain(rng: random.Random) -> str:
    if rng.random() < 0.2:
        return rng.choice(HOT_DOMAINS)
    return f"evil-{rng.randint(0, 9999)}.example.net"


def _cve(rng: random.Random) -> str:
    if rng.random() < 0.5:
        return rng.choice(HOT_CVES)
    return f"CVE-2021-{rng.randint(1000, 9999)}"


def _sentences_for_turn(rng: random.Random) -> list[str]:
    """1-3 template sentences; ~20% of turns are IOC-free filler."""
    out: list[str] = []
    for _ in range(rng.randint(1, 3)):
        r = rng.random()
        if r < 0.20:
            out.append(
                rng.choice(
                    [
                        "The team reviewed the incident timeline and updated the report.",
                        "No further anomalies were observed during the maintenance window.",
                        "Please summarize the findings for the weekly sync.",
                        "The sandbox run completed without additional detections.",
                    ]
                )
            )
        elif r < 0.34:
            md5 = _md5_like(rng)
            ip = _ip(rng)
            out.append(f"The malware {md5} communicates with {ip} over port 443.")
        elif r < 0.46:
            dom, ip = _domain(rng), _ip(rng)
            out.append(f"The domain {dom} resolves to {ip} since last week.")
        elif r < 0.56:
            dom = _domain(rng)
            n = rng.randint(0, 99)
            out.append(
                f"Payload was fetched from https://{dom}/payload{n} which is hosted on {dom}."
            )
        elif r < 0.64:
            cve = _cve(rng)
            sha = _sha256_like(rng)
            out.append(f"The implant {sha} exploits {cve} on exposed servers.")
        elif r < 0.70:
            dom = _domain(rng)
            defanged = dom.replace(".", "[.]")
            out.append(f"Beacon traffic to hxxps://{defanged}/gate was observed.")
        elif r < 0.76:
            nat = rng.choice(["Russian", "Ukrainian", "Chinese", "Iranian", "North Korean"])
            out.append(f"Analysts attribute the campaign to a {nat} threat group.")
        elif r < 0.82:
            out.append(
                f"Phishing mail from operator{rng.randint(0, 999)}@mail-{rng.randint(0, 99)}.example.com was reported."
            )
        elif r < 0.87:
            out.append(
                f"The dropper wrote C:\\Windows\\Temp\\stage{rng.randint(0, 99)}.dll and set "
                f"HKEY_LOCAL_MACHINE\\Software\\Run\\svc{rng.randint(0, 99)}."
            )
        elif r < 0.92:
            out.append(
                f"Traffic originated from AS{rng.randint(100, 65000)} with MAC "
                f"{':'.join(f'{rng.randint(0, 255):02x}' for _ in range(6))}."
            )
        elif r < 0.96:
            ip = _ip(rng)
            out.append(f"Scanning from {ip} targeted the {rng.choice(['10.0.0.0/24', '10.1.0.0/16'])} range.")
        else:
            md5 = _md5_like(rng)
            dom = _domain(rng)
            out.append(f"Sample {md5} was seen connecting to {dom} repeatedly.")
    return out


def gen_conversation(conv_idx: int, seed: int = 42) -> list[dict]:
    """Deterministic rows for one conversation; hot convs (5%) are 10×."""
    rng = random.Random(seed * 1_000_003 + conv_idx)
    hot = conv_idx % 20 == 7
    n_turns = rng.randint(6, 10) * (10 if hot else 1)
    conv_id = f"conv_{conv_idx:08d}"
    rows = []
    for t in range(n_turns):
        role = ROLES[t % 3]
        tool = rng.choice(TOOLS) if role == "tool" else None
        text = " ".join(_sentences_for_turn(rng))
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": _BASE_TS + _dt.timedelta(seconds=conv_idx * 10_000 + t),
            }
        )
    # Emit shuffled so reassembly must actually order by turn_idx.
    rng.shuffle(rows)
    return rows


def transcripts_rows(n_convs: int, seed: int = 42) -> list[dict]:
    """Driver-side corpus for tests (tiny/small profiles)."""
    rows: list[dict] = []
    for i in range(n_convs):
        rows.extend(gen_conversation(i, seed))
    return rows


def generate_transcripts_df(spark, n_convs: int, seed: int = 42, partitions: int | None = None):
    """Distributed generation: ``spark.range(n_convs)`` → ``mapInPandas``.

    Each executor generates whole conversations from the conv index; no
    driver-side materialization, so this scales to bench-size corpora.
    """
    from .schemas import TRANSCRIPTS_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for conv_idx in pdf["id"]:
                out.extend(gen_conversation(int(conv_idx), seed))
            yield pd.DataFrame(
                out, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            )

    parts = partitions or spark.sparkContext.defaultParallelism
    return (
        spark.range(0, n_convs, numPartitions=parts)
        .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    )
